from snappydata_spark.streaming.sink import SnappySink, EVENT_INSERT, EVENT_UPDATE, EVENT_DELETE
from snappydata_spark.streaming.sources import register_stream_provider, stream_reader

__all__ = [
    "SnappySink",
    "stream_reader",
    "register_stream_provider",
    "EVENT_INSERT",
    "EVENT_UPDATE",
    "EVENT_DELETE",
]

from snappydata_spark.streaming.stateful import (  # noqa: E402
    running_totals,
    sessionize_stream,
    stream_dedup,
)

__all__ += ["running_totals", "sessionize_stream", "stream_dedup"]

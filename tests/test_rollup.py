"""Continuous aggregate (hypertable-rollup shape): a streaming windowed
count maintained incrementally in a managed table through the CDC sink's
put-into path — update-mode emissions upsert on (window_start, key), so
re-emitted windows overwrite instead of duplicate.  This is the
streaming CQ → PUT INTO loop the reference runs with stream tables +
snappysink (SnappySinkCallback putInto path :245-273)."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from snappydata_spark.streaming import SnappySink
from snappydata_spark.streaming.sources import stream_reader, windowed_counts


@pytest.fixture()
def stream_dir():
    yield tempfile.mkdtemp(prefix="snappy_rollup_")


def _write_batch(d, fname, rows, mtime):
    p = os.path.join(d, fname)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (mtime, mtime))


def test_streaming_rollup_table(snappy, stream_dir):
    spark = snappy.spark
    t0 = 1_700_000_000
    _write_batch(stream_dir, "b0.json", [
        {"k": "a", "ts": t0 + 5}, {"k": "a", "ts": t0 + 20},
        {"k": "b", "ts": t0 + 70},
    ], 1_000_000)
    # second batch adds to an EXISTING window (a@win0: t0+25 is still
    # inside [t0-20, t0+40) since t0 is 20 s past the minute) and new ones
    _write_batch(stream_dir, "b1.json", [
        {"k": "a", "ts": t0 + 25}, {"k": "b", "ts": t0 + 130},
    ], 1_000_100)

    snappy.create_table(
        "rollup_1m",
        schema="window_start timestamp, k string, cnt long",
        options={"key_columns": "window_start,k"},
    )
    sink = SnappySink(snappy, "rollup_1m", query_name="rollup_q")

    stream = stream_reader(
        spark, "file_stream", schema="k string, ts long",
        format="json", path=stream_dir, maxFilesPerTrigger=1,
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts")
    agg = windowed_counts(stream, "ts", "1 minute", None, "10 minutes", "k").select(
        F.col("window.start").alias("window_start"), "k", "cnt"
    )
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start.strftime("%s"), r.k): r.cnt
        for r in snappy.table("rollup_1m").collect()
    }
    win0 = str(t0 - t0 % 60)
    win1 = str(t0 - t0 % 60 + 60)
    win2 = str(t0 - t0 % 60 + 120)
    # window re-emitted in batch 1 upserted, not duplicated
    assert got == {
        (win0, "a"): 3,
        (win1, "b"): 1,
        (win2, "b"): 1,
    }


def test_streaming_dedup_within_watermark(spark, stream_dir):
    """Streaming exact dedup (dedup family, streaming flavor):
    dropDuplicatesWithinWatermark removes same-key re-deliveries across
    micro-batches inside the watermark horizon."""
    t0 = 1_700_000_000
    _write_batch(stream_dir, "d0.json", [
        {"id": 1, "ts": t0 + 1}, {"id": 2, "ts": t0 + 2},
    ], 1_000_000)
    _write_batch(stream_dir, "d1.json", [
        {"id": 1, "ts": t0 + 30},   # duplicate id within watermark → dropped
        {"id": 3, "ts": t0 + 31},
    ], 1_000_100)
    stream = stream_reader(
        spark, "file_stream", schema="id long, ts long",
        format="json", path=stream_dir, maxFilesPerTrigger=1,
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts").withWatermark("ts", "1 hour")
    out = stream.dropDuplicatesWithinWatermark(["id"])
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    ids = sorted(r.id for r in spark.sql("SELECT id FROM dedup_out").collect())
    assert ids == [1, 2, 3]

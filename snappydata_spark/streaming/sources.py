"""Stream source registry — the Structured Streaming successor to the
reference's stream tables (SURVEY.md §2.9a: CREATE STREAM TABLE ... USING
kafka_stream/file_stream/socket_stream/..., each with a user
StreamToRowsConverter, StreamToRowsConverter.scala:21).

Mapping: every legacy source becomes `spark.readStream.format(...)` and
the converter becomes a DataFrame transformation (from_json / from_csv /
custom parse expression) applied to the raw stream.  The registry keeps
the reference's "declare a stream table once, query it by name" flow.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

# provider name (reference DDL USING clause) → structured streaming format
PROVIDER_FORMATS = {
    "kafka_stream": "kafka",
    "file_stream": "file",  # resolved per options (format option)
    "socket_stream": "socket",
    "text_socket_stream": "socket",
    "raw_socket_stream": "socket",
    "rate_stream": "rate",
    # twitter_stream / rabbitmq_stream have no Spark 3 built-in source —
    # they need external connector packages; register one with
    # register_stream_provider once its connector jar is deployed.
}

# user-registered providers: name → factory(spark, schema, **options) -> DataFrame
_CUSTOM_PROVIDERS: dict[str, Callable[..., DataFrame]] = {}


def register_stream_provider(
    name: str,
    format: str | None = None,
    factory: Callable[..., DataFrame] | None = None,
) -> None:
    """Register a custom stream provider, the analogue of the reference's
    user StreamPlanProvider + StreamToRowsConverter jars (StreamBaseRelation
    registry; SnappyStreamingContext.getSchemaDStream resolution): after
    registration the provider name works in `stream_reader` AND in
    `CREATE STREAM TABLE ... USING <name>` DDL.

    Either map the name to a Structured Streaming `format` string (for
    connector packages like a deployed kafka/pulsar DSv2 jar) or supply a
    `factory(spark, schema=None, **options) -> streaming DataFrame` for
    full control of the read + conversion."""
    if (format is None) == (factory is None):
        raise ValueError("register_stream_provider needs exactly one of format/factory")
    key = name.lower()
    if factory is not None:
        _CUSTOM_PROVIDERS[key] = factory
        PROVIDER_FORMATS.pop(key, None)
    else:
        PROVIDER_FORMATS[key] = format
        _CUSTOM_PROVIDERS.pop(key, None)


def stream_reader(
    spark: SparkSession,
    provider: str,
    schema: StructType | str | None = None,
    converter: Callable[[DataFrame], DataFrame] | None = None,
    **options,
) -> DataFrame:
    """Create a streaming DataFrame for a reference stream-table provider.

    `converter` plays the StreamToRowsConverter role: it maps the raw
    source frame (e.g. kafka key/value bytes) to typed rows.  For json
    payloads pass schema= and we apply from_json to the value column.
    """
    provider = provider.lower()
    if provider == "jdbc_stream":
        # built-in JDBC CDC landing-zone source (the reference's JDBC
        # streaming connector, docs/connectors/
        # jdbc_streaming_connector.md) — see streaming/jdbc_stream.py
        from snappydata_spark.streaming.jdbc_stream import create_jdbc_stream

        raw = create_jdbc_stream(spark, schema=schema, **options)
        return converter(raw) if converter is not None else raw
    if provider in _CUSTOM_PROVIDERS:
        raw = _CUSTOM_PROVIDERS[provider](spark, schema=schema, **options)
        return converter(raw) if converter is not None else raw
    if provider not in PROVIDER_FORMATS:
        raise ValueError(
            f"stream provider {provider!r} not available (reference providers "
            f"twitter_stream/rabbitmq_stream need external connectors — "
            f"register one with register_stream_provider): "
            f"choose from {sorted(PROVIDER_FORMATS)}"
        )
    fmt = PROVIDER_FORMATS[provider]
    if provider == "file_stream":
        fmt = options.pop("format", "json")
        reader = spark.readStream.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
    else:
        reader = spark.readStream.format(fmt)
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.load()
    if converter is not None:
        return converter(raw)
    if (
        schema is not None
        and dict(raw.dtypes).get("value") in ("string", "binary")
    ):
        # kafka/socket style: parse the STRING/BINARY value payload as
        # json.  Typed value columns (e.g. the rate source's LONG) are
        # NOT payloads — from_json over them would yield all-null rows
        return raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("r")
        ).select("r.*")
    return raw


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    duration: str,
    slide: str | None = None,
    watermark: str = "1 minute",
    *group_cols: str,
) -> DataFrame:
    """`SELECT ... FROM s WINDOW (DURATION d [, SLIDE s])` equivalent
    (streamWindowOptions SnappyParser.scala:552-557) with event-time
    watermarking — the structured-streaming upgrade of the reference's
    processing-time DStream windows (divergence documented in SURVEY.md
    §7 risk 5)."""
    win = F.window(F.col(ts_col), duration, slide or duration)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("window"), *[F.col(c) for c in group_cols])
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

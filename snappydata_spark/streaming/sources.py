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
    # twitter_stream / rabbitmq_stream: no Spark 3 connector exists in
    # this sandbox (no twitter4j, no AMQP broker, no network) — they are
    # built-in FACTORY providers below with two real structured-streaming
    # paths (replay archive / deterministic synthetic feed); a deployed
    # connector jar can replace them via register_stream_provider.
}

# user-registered providers: name → factory(spark, schema, **options) -> DataFrame
_CUSTOM_PROVIDERS: dict[str, Callable[..., DataFrame]] = {}

# the reference's 6-column tweet shape (create-stream-table.md:84,
# TweetToRowsConverter in stream_processing_using_sql.md:108)
TWITTER_SCHEMA = (
    "id long, text string, fullName string, country string, "
    "retweets int, hashtag string"
)

_COUNTRIES = ("US", "IN", "GB", "DE", "JP")


def _pop_ignored(options: dict, keys: tuple) -> None:
    """Connection credentials for the live connector (accepted and
    ignored offline, so reference DDL replays verbatim)."""
    for k in keys:
        options.pop(k, None)


def _twitter_factory(
    spark: SparkSession, schema=None, **options
) -> DataFrame:
    """twitter_stream without the network (TwitterStreamSource.scala:42;
    DDL: create-stream-table.md:84).  The live OAuth/twitter4j path
    cannot run in this sandbox, so the provider offers the two offline
    paths a test/CI environment needs, both REAL streaming sources:

    - ``replay '<dir>'``: a JSON-lines tweet archive read with the file
      source (schema defaults to the reference's 6-column tweet shape).
    - ``synthetic 'true'`` [+ ``rowsPerSecond``]: the rate source mapped
      deterministically onto the tweet shape — id is the rate value,
      text/hashtag/fullName/country/retweets derived from it, so
      downstream assertions are reproducible.

    OAuth options (consumerKey/consumerSecret/accessToken/
    accessTokenSecret) and rowConverter are accepted and ignored —
    reference DDL replays unchanged."""
    _pop_ignored(options, (
        "consumerkey", "consumersecret", "accesstoken",
        "accesstokensecret", "rowconverter",
        "consumerKey", "consumerSecret", "accessToken",
        "accessTokenSecret", "rowConverter",
    ))
    sch = schema or TWITTER_SCHEMA
    replay = options.pop("replay", None)
    synthetic = str(options.pop("synthetic", "")).lower() in ("true", "1")
    if replay:
        reader = spark.readStream.format("json").schema(sch)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load(replay)
    if synthetic:
        rps = options.pop("rowsPerSecond", options.pop("rowspersecond", "50"))
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rps)
            .load()
        )
        v = F.col("value")
        return rate.select(
            v.alias("id"),
            F.concat(
                F.lit("tweet "), v.cast("string"),
                F.lit(" #tag"), (v % 10).cast("string"),
            ).alias("text"),
            F.concat(F.lit("user"), (v % 100).cast("string")).alias("fullName"),
            F.element_at(
                F.array(*[F.lit(c) for c in _COUNTRIES]),
                (v % len(_COUNTRIES)).cast("int") + 1,
            ).alias("country"),
            (v % 1000).cast("int").alias("retweets"),
            F.concat(F.lit("tag"), (v % 10).cast("string")).alias("hashtag"),
        )
    raise ValueError(
        "twitter_stream: no live connector in this environment "
        "(twitter4j/network unavailable) — pass replay '<dir>' for a "
        "JSON-lines tweet archive or synthetic 'true' for a "
        "deterministic rate-backed feed"
    )


def _rabbitmq_factory(
    spark: SparkSession, schema=None, **options
) -> DataFrame:
    """rabbitmq_stream without a broker (RabbitMQStreamSource.scala:40).
    The raw AMQP message stream maps to a text file-source replay
    (``replay '<dir>'``, one message per line, column ``value string``)
    or a synthetic rate-backed feed (``synthetic 'true'``, value =
    ``msg-<n>``).  The reference decodes messages with a user
    StreamToRowsConverter — here that is stream_reader's converter=
    callable, or schema= for JSON payloads (applied by the shared
    payload-parse path).  Broker options (host/port/vhost/username/
    password/queue/exchange) are accepted and ignored."""
    _pop_ignored(options, (
        "host", "port", "vhost", "username", "password", "queue",
        "exchange", "rowconverter", "rowConverter",
    ))
    replay = options.pop("replay", None)
    synthetic = str(options.pop("synthetic", "")).lower() in ("true", "1")
    if replay:
        reader = spark.readStream.format("text")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load(replay)
    if synthetic:
        rps = options.pop("rowsPerSecond", options.pop("rowspersecond", "50"))
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rps)
            .load()
        )
        return rate.select(
            F.concat(F.lit("msg-"), F.col("value").cast("string")).alias("value")
        )
    raise ValueError(
        "rabbitmq_stream: no AMQP broker in this environment — pass "
        "replay '<dir>' for a one-message-per-line archive or "
        "synthetic 'true' for a deterministic rate-backed feed"
    )


# built-in factory providers; register_stream_provider overrides them
_BUILTIN_FACTORIES: dict[str, Callable[..., DataFrame]] = {
    "twitter_stream": _twitter_factory,
    "rabbitmq_stream": _rabbitmq_factory,
}


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
    # a user registration always replaces the offline built-in factory
    # (e.g. a deployed twitter/rabbitmq connector jar)
    _BUILTIN_FACTORIES.pop(key, None)
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
    if provider in _BUILTIN_FACTORIES:
        raw = _BUILTIN_FACTORIES[provider](spark, schema=schema, **options)
        return _parse_payload(raw, schema, converter)
    if provider not in PROVIDER_FORMATS:
        raise ValueError(
            f"stream provider {provider!r} not available — register one "
            f"with register_stream_provider, or choose from "
            f"{sorted(set(PROVIDER_FORMATS) | set(_BUILTIN_FACTORIES))}"
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
    return _parse_payload(raw, schema, converter)


def _parse_payload(
    raw: DataFrame,
    schema: StructType | str | None,
    converter: Callable[[DataFrame], DataFrame] | None,
) -> DataFrame:
    """Shared StreamToRowsConverter step for raw payload sources."""
    if converter is not None:
        return converter(raw)
    if (
        schema is not None
        and dict(raw.dtypes).get("value") in ("string", "binary")
    ):
        # kafka/socket/rabbitmq style: parse the STRING/BINARY value
        # payload as json.  Typed value columns (e.g. the rate source's
        # LONG) are NOT payloads — from_json would yield all-null rows
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

"""Built-in offline twitter_stream / rabbitmq_stream providers (r9).

The reference ships TwitterStreamSource.scala:42 / RabbitMQStreamSource
.scala:40 over twitter4j and an AMQP broker; neither can run in this
sandbox (no connector jars, no network).  The engine's providers keep
the reference DDL (create-stream-table.md:84 — OAuth/broker options
accepted and ignored) while the actual stream is a REAL structured-
streaming source: a replay archive (file source) or a deterministic
rate-backed synthetic feed.  These tests drive both paths end-to-end
through stream_reader AND CREATE STREAM TABLE.
"""

import json

import pytest

from snappydata_spark.streaming.sources import TWITTER_SCHEMA, stream_reader

TWEETS = [
    {"id": 1, "text": "hello #spark", "fullName": "ann", "country": "US",
     "retweets": 3, "hashtag": "spark"},
    {"id": 2, "text": "snappy streams #sql", "fullName": "bo", "country": "IN",
     "retweets": 0, "hashtag": "sql"},
    {"id": 3, "text": "ga #spark", "fullName": "cy", "country": "US",
     "retweets": 7, "hashtag": "spark"},
]


def _drain(stream, name):
    q = (
        stream.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    return q


def test_twitter_replay_archive(spark, tmp_path, snappy):
    arch = tmp_path / "tweets"
    arch.mkdir()
    (arch / "part-0.json").write_text(
        "\n".join(json.dumps(t) for t in TWEETS)
    )
    # the reference's exact DDL shape, OAuth options and all
    snappy.sql(
        f"""CREATE STREAM TABLE tweet_replay (id long, text string,
        fullName string, country string, retweets int, hashtag string)
        USING twitter_stream OPTIONS (consumerKey '', consumerSecret '',
        accessToken '', accessTokenSecret '', replay '{arch}')"""
    )
    t = snappy._streams["tweet_replay"]
    assert t.isStreaming
    try:
        _drain(t, "tweet_replay_sink")
        rows = {
            r.id: (r.fullName, r.retweets, r.hashtag)
            for r in spark.sql("SELECT * FROM tweet_replay_sink").collect()
        }
        assert rows == {
            1: ("ann", 3, "spark"), 2: ("bo", 0, "sql"), 3: ("cy", 7, "spark")
        }
    finally:
        snappy.sql("DROP STREAM TABLE tweet_replay")


def test_twitter_synthetic_feed(spark):
    s = stream_reader(spark, "twitter_stream", synthetic="true",
                      rowsPerSecond="10")
    assert s.isStreaming
    assert [f.name for f in s.schema.fields] == [
        "id", "text", "fullName", "country", "retweets", "hashtag"
    ]
    # default schema constant matches the produced shape
    assert set(TWITTER_SCHEMA.split(", ")[0].split()) == {"id", "long"}


def test_rabbitmq_replay_json_payload(spark, tmp_path):
    arch = tmp_path / "msgs"
    arch.mkdir()
    (arch / "m.txt").write_text(
        "\n".join(json.dumps({"k": i, "v": f"x{i}"}) for i in range(5))
    )
    # schema= plays the StreamToRowsConverter role for JSON payloads
    s = stream_reader(
        spark, "rabbitmq_stream", schema="k int, v string",
        replay=str(arch), queue="ignored", host="ignored",
    )
    assert s.isStreaming and set(s.columns) == {"k", "v"}
    _drain(s, "rmq_sink")
    got = sorted(
        (r.k, r.v) for r in spark.sql("SELECT * FROM rmq_sink").collect()
    )
    assert got == [(i, f"x{i}") for i in range(5)]


def test_rabbitmq_replay_custom_converter(spark, tmp_path):
    from pyspark.sql import functions as F

    arch = tmp_path / "csvmsgs"
    arch.mkdir()
    (arch / "m.txt").write_text("a,1\nb,2\n")

    def conv(raw):
        p = F.split(F.col("value"), ",")
        return raw.select(
            p.getItem(0).alias("name"), p.getItem(1).cast("int").alias("n")
        )

    s = stream_reader(spark, "rabbitmq_stream", replay=str(arch),
                      converter=conv)
    _drain(s, "rmq_conv_sink")
    got = sorted(
        (r.name, r.n)
        for r in spark.sql("SELECT * FROM rmq_conv_sink").collect()
    )
    assert got == [("a", 1), ("b", 2)]


def test_offline_providers_error_without_source(spark):
    with pytest.raises(ValueError, match="no live connector"):
        stream_reader(spark, "twitter_stream", consumerKey="k")
    with pytest.raises(ValueError, match="no AMQP broker"):
        stream_reader(spark, "rabbitmq_stream", host="h", queue="q")


def test_twitter_synthetic_rejects_mismatched_schema(spark):
    """Synthetic mode always emits the fixed tweet shape — a diverging
    declared schema must fail loudly, not register a mismatched view."""
    with pytest.raises(ValueError, match="fixed tweet shape"):
        stream_reader(spark, "twitter_stream", synthetic="true",
                      schema="a int, b string")


def test_custom_registration_shadows_then_restores_builtin(spark):
    """register_stream_provider SHADOWS a builtin instead of destroying
    it: dropping the registration restores the offline provider (r9
    ADVICE — the old pop() removed twitter_stream for the process)."""
    from snappydata_spark.streaming import register_stream_provider
    from snappydata_spark.streaming.sources import _CUSTOM_PROVIDERS

    def fake_twitter(sp, schema=None, **options):
        rate = sp.readStream.format("rate").load()
        return rate.selectExpr("value AS custom_col")

    register_stream_provider("twitter_stream", factory=fake_twitter)
    try:
        s = stream_reader(spark, "twitter_stream")
        assert s.columns == ["custom_col"]
    finally:
        _CUSTOM_PROVIDERS.pop("twitter_stream", None)
    # builtin is back: no-source call raises its documented error again
    with pytest.raises(ValueError, match="no live connector"):
        stream_reader(spark, "twitter_stream", consumerKey="k")


# ----------------------------------------------------------------- kafka

# the reference's exact adtech kafka DDL
# (use_stream_processing_with_snappydata.md:232-246) + a replay archive
KAFKA_DDL = """CREATE STREAM TABLE ad_impression_stream (
     time_stamp timestamp,
     publisher string,
     advertiser string,
     website string,
     geo string,
     bid double,
     cookie string)
   USING kafka_stream OPTIONS (
     rowConverter 'org.apache.spark.examples.snappydata.RowsConverter',
     kafkaParams 'bootstrap.servers->localhost:9092;key.deserializer->org.apache.kafka.common.serialization.StringDeserializer;value.deserializer->org.apache.kafka.common.serialization.StringDeserializer;group.id->g1;auto.offset.reset->earliest',
     startingOffsets 'earliest',
     subscribe 'adImpressionsTopic',
     replay '{arch}')"""


def _kafka_line(partition, offset, value, key=None, topic="adImpressionsTopic"):
    return json.dumps({
        "key": key, "value": value, "topic": topic,
        "partition": partition, "offset": offset,
        "timestamp": "2024-01-01 00:00:00",
    })


def test_kafka_replay_reference_ddl(spark, tmp_path, snappy):
    """The reference's kafka DDL replays VERBATIM (plus replay '<dir>'):
    the rowConverter class name resolves to the offline CSV decode
    (RowsConverter splits comma-separated fields,
    StreamingExample.scala:223), kafkaParams/group/startingOffsets are
    accepted, and the declared 7-column row shape comes out typed."""
    arch = tmp_path / "kafka_ads"
    arch.mkdir()
    (arch / "p0.json").write_text("\n".join([
        _kafka_line(0, 0, "2024-01-01 10:00:00,pub1,adv1,web1,US,0.51,c1"),
        _kafka_line(0, 1, "2024-01-01 10:00:01,pub2,adv2,web2,IN,0.25,c2"),
    ]))
    snappy.sql(KAFKA_DDL.format(arch=arch))
    t = snappy._streams["ad_impression_stream"]
    assert t.isStreaming
    try:
        _drain(t, "ad_sink")
        rows = {
            r.publisher: (r.advertiser, r.geo, r.bid, r.cookie)
            for r in spark.sql("SELECT * FROM ad_sink").collect()
        }
        assert rows == {
            "pub1": ("adv1", "US", 0.51, "c1"),
            "pub2": ("adv2", "IN", 0.25, "c2"),
        }
        assert dict(t.dtypes)["time_stamp"] == "timestamp"
    finally:
        snappy.sql("DROP STREAM TABLE ad_impression_stream")


def test_kafka_replay_contract_columns(spark, tmp_path):
    """Without schema/converter the raw frame carries the exact kafka
    source contract: key/value binary + topic/partition/offset/
    timestamp/timestampType (DirectKafkaStreamSource.scala:52)."""
    arch = tmp_path / "kafka_raw"
    arch.mkdir()
    (arch / "p.json").write_text(_kafka_line(1, 7, "payload", key="k7"))
    s = stream_reader(spark, "kafka_stream", replay=str(arch))
    got = dict(s.dtypes)
    assert got == {
        "key": "binary", "value": "binary", "topic": "string",
        "partition": "int", "offset": "bigint",
        "timestamp": "timestamp", "timestampType": "int",
    }
    _drain(s, "kraw_sink")
    r = spark.sql("SELECT * FROM kraw_sink").collect()[0]
    assert (r.partition, r.offset) == (1, 7)
    assert bytes(r.key) == b"k7" and bytes(r.value) == b"payload"


def test_kafka_synthetic_feed_shape(spark):
    s = stream_reader(spark, "kafka_stream", synthetic="true",
                      rowsPerSecond="10", numPartitions="2",
                      subscribe="synthtopic")
    assert s.isStreaming
    assert [f.name for f in s.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType",
    ]
    # schema= plays the converter role on the JSON payload
    parsed = stream_reader(spark, "kafka_stream", synthetic="true",
                           schema="id long, payload string")
    assert set(parsed.columns) == {"id", "payload"}


def test_kafka_replay_cdc_multi_partition_to_sink(spark, tmp_path, snappy):
    """End-to-end: an offset-ordered multi-partition CDC batch flows
    kafka contract -> converter -> snappysink into a keyed table
    (SnappyStructuredKafkaSuite.scala shape).  Each key lives in one
    partition (Kafka key-hash contract); conflation orders by the
    kafka offset, so the interleaved file order must not matter."""
    from pyspark.sql import functions as F

    from snappydata_spark.streaming import (
        EVENT_DELETE,
        EVENT_INSERT,
        EVENT_UPDATE,
        SnappySink,
    )

    arch = tmp_path / "kafka_cdc"
    arch.mkdir()

    def ev(part, off, etype, k, v):
        return _kafka_line(
            part, off, json.dumps({"_eventType": etype, "k": k, "v": v}),
            key=str(k), topic="cdc",
        )

    # deliberately out-of-order lines; offsets define the truth
    (arch / "p.json").write_text("\n".join([
        ev(0, 3, EVENT_UPDATE, 1, "a2"),
        ev(1, 0, EVENT_INSERT, 2, "b"),
        ev(0, 0, EVENT_INSERT, 1, "a"),
        ev(1, 1, EVENT_DELETE, 2, None),
        ev(0, 1, EVENT_INSERT, 3, "c"),
    ]))

    base = spark.createDataFrame([(0, "seed")], "k int, v string")
    snappy.create_table("kstream_tgt", options={"key_columns": "k"}, df=base)

    def conv(raw):
        r = F.from_json(
            F.col("value").cast("string"), "_eventType int, k int, v string"
        )
        return raw.select(
            F.col("partition"), F.col("offset"),
            r.getField("_eventType").alias("_eventType"),
            r.getField("k").alias("k"), r.getField("v").alias("v"),
        )

    s = stream_reader(spark, "kafka_stream", replay=str(arch), converter=conv)
    sink = SnappySink(
        snappy, "kstream_tgt", query_name="q_kstream", order_col="offset"
    )

    def deliver(df, batch_id):
        # one task per topic partition, like a broker delivery
        sink(df.repartition(2, F.col("partition")).drop("partition"), batch_id)

    q = (
        s.writeStream.foreachBatch(deliver)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(90)
    got = {r.k: r.v for r in snappy.table("kstream_tgt").collect()}
    assert got == {0: "seed", 1: "a2", 3: "c"}


class _FakeReader:
    """DataStreamReader recorder for the LIVE kafka branch: no broker in
    this sandbox, so the dry-run asserts the exact (format, options)
    handed to the reader for reference DDL shapes
    (r10 verdict stretch #10)."""

    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        return ("loaded", self.fmt, dict(self.opts))


class _FakeSpark:
    def __init__(self):
        self.reader = _FakeReader()

    @property
    def readStream(self):
        return self.reader


def test_kafka_live_branch_option_plumbing():
    """Reference DDL (stream_processing_using_sql.md:241-246):
    kafkaParams 'k->v;...' unbundles into kafka.* consumer options with
    broker-list spellings normalized, `topics` maps to the DSv2
    source's `subscribe`, and passthrough options survive verbatim."""
    from snappydata_spark.streaming.sources import _kafka_factory

    fake = _FakeSpark()
    out = _kafka_factory(
        fake,
        topics="adImpressionsTopic",
        kafkaParams=(
            "metadata.broker.list->localhost:9092;"
            "auto.offset.reset->earliest;group.id->cg1"
        ),
        startingOffsets="earliest",
        rowConverter="io.snappydata.app.AdImpressionToRowsConverter",
    )
    tag, fmt, opts = out
    assert tag == "loaded" and fmt == "kafka"
    assert opts["kafka.bootstrap.servers"] == "localhost:9092"
    assert opts["kafka.auto.offset.reset"] == "earliest"
    assert opts["kafka.group.id"] == "cg1"
    assert opts["subscribe"] == "adImpressionsTopic"  # topics -> subscribe
    assert opts["startingOffsets"] == "earliest"  # passthrough verbatim
    assert "rowConverter" not in opts  # engine-side concept, not a kafka opt


def test_kafka_live_branch_explicit_subscribe_wins():
    from snappydata_spark.streaming.sources import _kafka_factory

    fake = _FakeSpark()
    _, fmt, opts = _kafka_factory(
        fake, subscribe="explicit", topics="ignored-when-subscribe-present"
    )
    assert fmt == "kafka" and opts["subscribe"] == "explicit"
    assert "topics" not in opts

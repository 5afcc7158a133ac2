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

"""Custom stateful streaming operators (applyInPandasWithState): state
must carry across micro-batches — driven through a real file-source
stream (one file per batch via maxFilesPerTrigger) into a memory sink."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from snappydata_spark.streaming.stateful import running_totals, sessionize_stream
from snappydata_spark.streaming.sources import stream_reader


def _run_stream(result, name):
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


@pytest.fixture()
def stream_dir():
    d = tempfile.mkdtemp(prefix="snappy_stream_")
    yield d


def _write_batch(d, fname, rows, mtime=None):
    path = os.path.join(d, fname)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)
    if mtime is not None:
        # file source orders batches by modification time — pin it so
        # maxFilesPerTrigger=1 replays files in the intended order
        os.utime(path, (mtime, mtime))


def test_running_totals_state_across_batches(spark, stream_dir):
    _write_batch(stream_dir, "b0.json", [
        {"k": "a", "v": 1.0}, {"k": "a", "v": 2.0}, {"k": "b", "v": 10.0},
    ], mtime=1_000_000)
    _write_batch(stream_dir, "b1.json", [
        {"k": "a", "v": 3.0}, {"k": "b", "v": 5.0}, {"k": "c", "v": 7.0},
    ], mtime=1_000_100)
    stream = stream_reader(
        spark, "file_stream", schema="k string, v double",
        format="json", path=stream_dir, maxFilesPerTrigger=1,
    )
    _run_stream(running_totals(stream, "k", "v"), "rt_out")
    rows = spark.sql(
        "SELECT k, cnt, total FROM rt_out ORDER BY k, cnt"
    ).collect()
    # last emission per key must hold the cross-batch running totals
    final = {r.k: (r.cnt, r.total) for r in rows}
    assert final["a"] == (3, 6.0)
    assert final["b"] == (2, 15.0)
    assert final["c"] == (1, 7.0)


def test_sessionize_stream_gap_splits(spark, stream_dir):
    t0 = 1_700_000_000
    _write_batch(stream_dir, "b0.json", [
        {"u": "u1", "ts": t0}, {"u": "u1", "ts": t0 + 60},
    ], mtime=1_000_000)
    # second batch: u1 returns after a > gap pause → new session
    _write_batch(stream_dir, "b1.json", [
        {"u": "u1", "ts": t0 + 10_000}, {"u": "u2", "ts": t0},
    ], mtime=1_000_100)
    stream = stream_reader(
        spark, "file_stream", schema="u string, ts long",
        format="json", path=stream_dir, maxFilesPerTrigger=1,
    ).selectExpr("u", "CAST(ts AS TIMESTAMP) AS ts")
    _run_stream(sessionize_stream(stream, "u", "ts", gap_seconds=1800), "sess_out")
    rows = spark.sql("SELECT * FROM sess_out").collect()
    u1 = sorted(
        [(r.session_start, r.session_end, r.n_events) for r in rows if r.u == "u1"]
    )
    # closed first session (2 events, 60s span) and open second session
    assert (t0, t0 + 60, 2) in u1
    assert (t0 + 10_000, t0 + 10_000, 1) in u1
    u2 = [(r.session_start, r.n_events) for r in rows if r.u == "u2"]
    assert (t0, 1) in u2


def test_windowed_cq_with_watermark_and_late_data(spark, stream_dir):
    """WINDOW (DURATION ...) CQ equivalent (windowed_counts): tumbling
    event-time windows with a watermark; an event arriving (in a later
    batch) an hour behind the watermark must be dropped.

    NOTE: runs as a live micro-batch stream (processingTime trigger,
    second file written after the first batch commits) — under
    trigger(availableNow) Spark treats files present at start as one
    initial backlog and does not apply the watermark filter to them.
    """
    import time

    from snappydata_spark.streaming.sources import windowed_counts

    t0 = 1_700_000_000
    _write_batch(stream_dir, "b0.json", [
        {"k": "a", "ts": t0 + 5}, {"k": "a", "ts": t0 + 15},
        {"k": "b", "ts": t0 + 65},
    ])
    stream = stream_reader(
        spark, "file_stream", schema="k string, ts long",
        format="json", path=stream_dir,
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts")
    result = windowed_counts(stream, "ts", "1 minute", None, "1 minute", "k")
    q = (
        result.writeStream.format("memory").queryName("cq_out")
        .outputMode("update").trigger(processingTime="250 milliseconds").start()
    )
    win0 = t0 - t0 % 60

    def snapshot():
        rows = spark.sql(
            "SELECT k, CAST(window.start AS LONG) AS ws, cnt FROM cq_out"
        ).collect()
        out = {}
        for r in rows:
            out[(r.k, r.ws)] = r.cnt
        return out

    try:
        # gate on the WATERMARK ITSELF advancing past t0+5 (= t0+65 - 1
        # minute delay), via query progress.  Gating on the sink rows is
        # racy: the memory sink exposes batch0's rows a beat before the
        # watermark tracker commits batch0's event-time stats, so a
        # fast-following b1 could be planned into a micro-batch that
        # still ran at watermark 0 and KEPT the late row (observed
        # ~1/10 runs as a pre-win0 window in the output).
        import datetime

        wm_target = datetime.datetime.fromtimestamp(
            t0 + 5, datetime.timezone.utc
        )
        deadline = time.time() + 90
        got = None
        while time.time() < deadline:
            p = q.lastProgress
            wm = (p or {}).get("eventTime", {}).get("watermark")
            if wm:
                got = datetime.datetime.fromisoformat(
                    wm.replace("Z", "+00:00")
                )
                if got >= wm_target:
                    break
            time.sleep(0.25)
        # fail HERE on a gate timeout — writing b1 against a stale
        # watermark would later fail the late-window assertion with a
        # misleading message (the exact race this gate eliminates)
        assert got is not None and got >= wm_target, (
            f"watermark never reached {wm_target} within 90s "
            f"(last observed: {got})"
        )
        # watermark is now t0+65-60; this event is an hour late → dropped
        _write_batch(stream_dir, "b1.json", [
            {"k": "a", "ts": t0 - 3600}, {"k": "b", "ts": t0 + 70},
        ])
        # b1's on-time event bumping (b, win0+60) to 2 proves b1's batch
        # committed; whether the late row was dropped is then decidable
        # from the update-mode output itself (a dropped row emits
        # nothing; a processed one would emit its pre-win0 window).  The
        # numRowsDroppedByWatermark metric intermittently surfaces late /
        # is evicted from recentProgress, so it is only a soft check.
        deadline = time.time() + 90
        latest = snapshot()
        while time.time() < deadline:
            latest = snapshot()
            if latest.get(("b", win0 + 60)) == 2:
                break
            time.sleep(0.25)
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            if p["stateOperators"]
        )
    finally:
        q.stop()
    assert latest[("a", win0)] == 2
    assert latest[("b", win0 + 60)] == 2, latest
    # the hour-late event must not have produced its (pre-watermark) window
    late_windows = [k for k in latest if k[0] == "a" and k[1] < win0]
    assert late_windows == []
    # soft cross-check: when the metric did surface, it agrees
    assert dropped in (0, 1), dropped


def test_stream_stream_join_time_bounded(spark, stream_dir):
    """Stream-stream inner join with watermarks + time-range condition
    (the structured-streaming capability superseding the reference's
    DStream CQ joins): clicks join views of the same user within the
    preceding 10 minutes."""
    import os

    t0 = 1_700_000_000
    clicks_dir = os.path.join(stream_dir, "clicks"); os.makedirs(clicks_dir)
    views_dir = os.path.join(stream_dir, "views"); os.makedirs(views_dir)
    _write_batch(clicks_dir, "c0.json", [
        {"u": "u1", "cts": t0 + 300, "cid": 1},
        {"u": "u1", "cts": t0 + 5000, "cid": 2},   # no view within 10 min
        {"u": "u2", "cts": t0 + 100, "cid": 3},
    ])
    _write_batch(views_dir, "v0.json", [
        {"u": "u1", "vts": t0 + 100, "vid": 10},
        {"u": "u2", "vts": t0 + 90, "vid": 11},
        {"u": "u2", "vts": t0 + 4000, "vid": 12},  # after the click
    ])
    clicks = stream_reader(
        spark, "file_stream", schema="u string, cts long, cid long",
        format="json", path=clicks_dir,
    ).selectExpr("u", "CAST(cts AS TIMESTAMP) AS cts", "cid") \
     .withWatermark("cts", "1 hour")
    views = stream_reader(
        spark, "file_stream", schema="u string, vts long, vid long",
        format="json", path=views_dir,
    ).selectExpr("u AS vu", "CAST(vts AS TIMESTAMP) AS vts", "vid") \
     .withWatermark("vts", "1 hour")
    joined = clicks.join(
        views,
        (clicks.u == views.vu)
        & (views.vts <= clicks.cts)
        & (views.vts >= clicks.cts - F.expr("INTERVAL 10 MINUTES")),
    ).select("cid", "vid")
    import pyspark.sql.functions as F2
    q = (
        joined.writeStream.format("memory").queryName("ssj_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    pairs = sorted((r.cid, r.vid) for r in spark.sql("SELECT * FROM ssj_out").collect())
    assert pairs == [(1, 10), (3, 11)]


def test_rate_stream_provider(spark):
    """rate_stream provider smoke: the registry maps legacy stream-table
    providers to structured sources; rate generates rows locally."""
    stream = stream_reader(spark, "rate_stream", rowsPerSecond=100)
    q = (
        stream.selectExpr("value % 10 AS k")
        .groupBy("k").count()
        .writeStream.format("memory").queryName("rate_out")
        .outputMode("complete").trigger(processingTime="200 milliseconds").start()
    )
    import time
    deadline = time.time() + 30
    try:
        while time.time() < deadline:
            if spark.sql("SELECT SUM(count) AS n FROM rate_out").collect()[0].n or 0 >= 10:
                break
            time.sleep(0.3)
        total = spark.sql("SELECT COALESCE(SUM(count), 0) AS n FROM rate_out").collect()[0].n
        assert total > 0
    finally:
        q.stop()


def test_unknown_stream_provider_rejected(spark):
    with pytest.raises(ValueError, match="not available"):
        stream_reader(spark, "bogus_stream")
    # twitter_stream is now a built-in OFFLINE provider (r9): without a
    # replay archive or synthetic mode it raises the documented
    # no-live-connector divergence, not "unknown provider"
    with pytest.raises(ValueError, match="no live connector"):
        stream_reader(spark, "twitter_stream")


def test_register_custom_stream_provider(spark, snappy):
    """User-registered provider (the StreamPlanProvider/converter-jar
    analogue): a factory-backed provider works through stream_reader AND
    through CREATE STREAM TABLE DDL, then unknown again after swap to a
    format-backed registration."""
    from snappydata_spark.streaming import register_stream_provider
    from snappydata_spark.streaming.sources import _CUSTOM_FORMATS, _CUSTOM_PROVIDERS

    def fake_feed(sp, schema=None, **options):
        # converter applied inside the factory: rate → typed event rows
        rate = sp.readStream.format("rate").option(
            "rowsPerSecond", options.get("rowsPerSecond", "50")
        ).load()
        return rate.selectExpr("value AS event_id", "value % 5 AS user_id")

    register_stream_provider("fake_feed_stream", factory=fake_feed)
    try:
        s = stream_reader(spark, "fake_feed_stream", rowsPerSecond="100")
        assert s.isStreaming and set(s.columns) == {"event_id", "user_id"}

        snappy.sql(
            "CREATE STREAM TABLE ddl_fake USING fake_feed_stream "
            "OPTIONS (rowsPerSecond '100')"
        )
        t = snappy._streams["ddl_fake"]
        assert t.isStreaming and "user_id" in t.columns

        with pytest.raises(ValueError, match="exactly one"):
            register_stream_provider("x_stream")
        register_stream_provider("fake_feed_stream", format="rate")
        assert "fake_feed_stream" in _CUSTOM_FORMATS
        assert "fake_feed_stream" not in _CUSTOM_PROVIDERS
    finally:
        _CUSTOM_FORMATS.pop("fake_feed_stream", None)
        _CUSTOM_PROVIDERS.pop("fake_feed_stream", None)
        snappy._streams.pop("ddl_fake", None)


def test_native_session_window_streaming(spark, stream_dir):
    """session_window (native Spark session windows) on a stream —
    the event-time upgrade of gap-based sessionization.  Append mode
    (sessions emit once the watermark passes their end); a late
    advancer event pushes the watermark past the sessions under test."""
    t0 = 1_700_000_000
    _write_batch(stream_dir, "s0.json", [
        {"u": "u1", "ts": t0}, {"u": "u1", "ts": t0 + 100},
        {"u": "u1", "ts": t0 + 5000},   # > 10 min gap → second session
        {"u": "u2", "ts": t0 + 50},
        {"u": "u3", "ts": t0 + 10000},  # advances the watermark
    ])
    stream = stream_reader(
        spark, "file_stream", schema="u string, ts long",
        format="json", path=stream_dir,
    ).selectExpr("u", "CAST(ts AS TIMESTAMP) AS ts").withWatermark("ts", "1 hour")
    agg = stream.groupBy(F.session_window("ts", "10 minutes"), "u").count()
    q = (
        agg.writeStream.format("memory").queryName("sw_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT u, CAST(session_window.start AS LONG) AS s, count FROM sw_out"
    ).collect()
    got = {(r.u, r.s): r["count"] for r in rows}
    assert got[("u1", t0)] == 2
    assert got[("u1", t0 + 5000)] == 1
    assert got[("u2", t0 + 50)] == 1


def test_stream_dedup_first_wins_across_batches(spark, stream_dir):
    """Ingest-side exact dedup: the first row per fingerprint survives,
    later duplicates (same batch or later batches) are dropped."""
    from snappydata_spark.streaming.stateful import stream_dedup

    _write_batch(
        stream_dir,
        "b0.json",
        [
            {"fp": "A", "doc": "a1"},
            {"fp": "B", "doc": "b1"},
            {"fp": "A", "doc": "a-dup-same-batch"},
        ],
        mtime=1_000,
    )
    _write_batch(
        stream_dir,
        "b1.json",
        [{"fp": "B", "doc": "b-dup-later-batch"}, {"fp": "C", "doc": "c1"}],
        mtime=2_000,
    )
    stream = stream_reader(
        spark,
        "file_stream",
        format="json",
        path=stream_dir,
        schema="fp string, doc string",
        maxFilesPerTrigger="1",
    )
    q = (
        stream_dedup(stream, ["fp"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.fp, r.doc) for r in spark.table("dedup_out").collect()}
    assert got == {("A", "a1"), ("B", "b1"), ("C", "c1")}


def test_stream_dedup_watermark_bounded_state(spark, stream_dir):
    """Watermark-bounded variant: duplicates inside the watermark window
    are dropped; the state plan uses dropDuplicatesWithinWatermark (the
    only shape whose state is bounded on an unbounded stream)."""
    from snappydata_spark.streaming.stateful import stream_dedup

    _write_batch(
        stream_dir,
        "b0.json",
        [
            {"fp": "X", "ts": "2024-01-01 00:00:00", "doc": "x1"},
            {"fp": "X", "ts": "2024-01-01 00:02:00", "doc": "x-dup-in-window"},
            {"fp": "Y", "ts": "2024-01-01 00:03:00", "doc": "y1"},
        ],
        mtime=1_000,
    )
    stream = stream_reader(
        spark,
        "file_stream",
        format="json",
        path=stream_dir,
        schema="fp string, ts timestamp, doc string",
    )
    deduped = stream_dedup(stream, ["fp"], event_time_col="ts", watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_wm_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.fp, r.doc) for r in spark.table("dedup_wm_out").collect()}
    assert got == {("X", "x1"), ("Y", "y1")}


def test_continuous_aggregate_rollup(snappy, stream_dir):
    """Incrementally-maintained hourly rollup (streaming/rollup.py — the
    hypertable continuous-aggregate shape; reference CQ+put pattern):
    partial count/sum per (bucket, user) merged via PUT INTO across
    batches, late data merging into its old bucket; replay of a recorded
    batch id is a no-op (mergeable partials are not idempotent, the
    ledger is the exactly-once guarantee)."""
    from snappydata_spark.streaming.rollup import ContinuousAggregate

    _write_batch(stream_dir, "b0.json", [
        {"ts": "2024-01-01T00:10:00Z", "user": "a", "v": 1.0},
        {"ts": "2024-01-01T00:20:00Z", "user": "a", "v": 2.0},
        {"ts": "2024-01-01T01:05:00Z", "user": "b", "v": 10.0},
    ], mtime=1_000_000)
    _write_batch(stream_dir, "b1.json", [
        {"ts": "2024-01-01T01:30:00Z", "user": "b", "v": 5.0},
        # late event for the 00:00 bucket arrives in batch 2
        {"ts": "2024-01-01T00:40:00Z", "user": "a", "v": 4.0},
    ], mtime=1_000_100)

    stream = stream_reader(
        snappy.spark, "file_stream", schema="ts timestamp, user string, v double",
        format="json", path=stream_dir, maxFilesPerTrigger=1,
    )
    ca = ContinuousAggregate(
        snappy, "ca_hourly", ts_col="ts", bucket="1 hour",
        keys=["user"], agg_cols=["v"],
    )
    q = stream.writeStream.foreachBatch(ca).trigger(availableNow=True).start()
    q.awaitTermination(120)

    rows = {
        (r.bucket_start.hour, r.user): (r.cnt, r.sum_v)
        for r in snappy.table("ca_hourly").collect()
    }
    assert rows == {
        (0, "a"): (3, 7.0),   # 1+2 from batch0, late 4.0 merged from batch1
        (1, "b"): (2, 15.0),  # 10 from batch0, 5 merged from batch1
    }
    avg = {r.user: r.avg_v for r in ca.readback().collect()}
    assert avg["b"] == 7.5

    # replaying an already-recorded batch must not double-count
    batch = snappy.spark.read.schema("ts timestamp, user string, v double").json(
        stream_dir
    )
    ca(batch, batch_id=0)
    assert {
        (r.bucket_start.hour, r.user): (r.cnt, r.sum_v)
        for r in snappy.table("ca_hourly").collect()
    } == rows

    # crash-window replay: the side-car ledger is lost AFTER the PUT
    # committed (crash between put() and _record_batch()); the in-row
    # last_batch_id column must make the replay a per-key no-op
    os.remove(ca._state_path())
    ca(batch, batch_id=1)
    assert {
        (r.bucket_start.hour, r.user): (r.cnt, r.sum_v)
        for r in snappy.table("ca_hourly").collect()
    } == rows
    snappy.drop_table("ca_hourly")


def test_stream_interval_join(snappy, spark):
    """Watermarked stream-stream interval join (streaming/joins.py): each
    click pairs with views of the same user within the following 10
    minutes; an out-of-interval view must not match."""
    import tempfile

    from snappydata_spark.streaming.joins import stream_interval_join

    d1 = tempfile.mkdtemp(prefix="ssj_clicks_")
    d2 = tempfile.mkdtemp(prefix="ssj_views_")
    _write_batch(d1, "c0.json", [
        {"user": "a", "click_ts": "2024-01-01T00:00:00Z", "click_id": 1},
        {"user": "b", "click_ts": "2024-01-01T00:05:00Z", "click_id": 2},
    ])
    _write_batch(d2, "v0.json", [
        {"user": "a", "view_ts": "2024-01-01T00:04:00Z", "view_id": 10},
        {"user": "a", "view_ts": "2024-01-01T00:20:00Z", "view_id": 11},
        {"user": "b", "view_ts": "2024-01-01T00:06:30Z", "view_id": 12},
    ])
    clicks = stream_reader(
        spark, "file_stream",
        schema="user string, click_ts timestamp, click_id int",
        format="json", path=d1,
    )
    views = stream_reader(
        spark, "file_stream",
        schema="user string, view_ts timestamp, view_id int",
        format="json", path=d2,
    )
    joined = stream_interval_join(
        clicks, views, on=["user"], left_ts="click_ts", right_ts="view_ts",
        lower_seconds=0, upper_seconds=600,
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {(r.click_id, r.view_id) for r in spark.sql("SELECT * FROM ssj_out").collect()}
    assert rows == {(1, 10), (2, 12)}  # view 11 is 20 min out — excluded

    with pytest.raises(ValueError, match="ambiguous"):
        stream_interval_join(
            clicks.withColumnRenamed("click_id", "x"),
            views.withColumnRenamed("view_id", "x"),
            on=["user"], left_ts="click_ts", right_ts="view_ts",
        )


def test_stream_static_enrichment_join(snappy, stream_dir):
    """Stream-to-table join — the reference's marquee CQ pattern: a
    stream joined against a REPLICATED reference table
    (SnappyStreamingSuite stream-table joins; replicated-table local
    join SnappyStrategies.scala:330-343).  The managed dim resolves
    through SnappySession and broadcasts under the stream; enriched
    rows land aggregated per dim attribute."""
    dim = snappy.spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], "uid int, tier string"
    )
    snappy.create_table("enrich_dim", options={"replicate": "true"}, df=dim)

    _write_batch(
        stream_dir,
        "b0.json",
        [
            {"uid": 1, "amount": 10.0},
            {"uid": 2, "amount": 5.0},
            {"uid": 1, "amount": 7.0},
            {"uid": 9, "amount": 99.0},  # no dim row -> dropped by inner join
        ],
    )
    stream = snappy.spark.readStream.schema("uid int, amount double").json(
        stream_dir
    )
    enriched = (
        stream.join(snappy.table("enrich_dim"), "uid")
        .groupBy("tier")
        .agg(F.sum("amount").alias("total"))
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.tier: r.total
        for r in snappy.spark.sql("SELECT * FROM enrich_out").collect()
    }
    assert got == {"gold": 17.0, "silver": 5.0}
    snappy.drop_table("enrich_dim")


def test_streaming_percentile_rollup_matches_batch(snappy, stream_dir):
    """The mergeable percentile histogram (operators/events.py) running
    through the streaming ContinuousAggregate: bin counts PUT-merge
    across micro-batches, and finalizing percentiles from the rollup
    table equals the single-pass batch computation over the same data —
    the partials really are state, not an approximation of one."""
    import math

    from pyspark.sql import functions as F

    from snappydata_spark.operators.events import (
        PCT_W,
        percentile_histogram_partials,
        percentiles_from_partials,
    )
    from snappydata_spark.streaming.rollup import ContinuousAggregate

    rows0 = [
        {"ts": "2024-01-01T00:%02d:00Z" % (i % 60), "et": "click", "v": float(i)}
        for i in range(40)
    ]
    rows1 = [
        {"ts": "2024-01-01T00:%02d:30Z" % (i % 60), "et": "click", "v": float(i * 7 % 100)}
        for i in range(40)
    ] + [{"ts": "2024-01-01T01:05:00Z", "et": "view", "v": 3.0}]
    _write_batch(stream_dir, "b0.json", rows0, mtime=1_000_000)
    _write_batch(stream_dir, "b1.json", rows1, mtime=1_000_100)

    stream = stream_reader(
        snappy.spark, "file_stream", schema="ts timestamp, et string, v double",
        format="json", path=stream_dir, maxFilesPerTrigger=1,
    ).withColumn(
        "bin",
        F.floor(F.log(F.lit(1.0) + F.greatest("v", F.lit(0.0))) / PCT_W).cast(
            "long"
        ),
    )
    ca = ContinuousAggregate(
        snappy, "ca_pct", ts_col="ts", bucket="1 hour", keys=["et", "bin"]
    )
    q = stream.writeStream.foreachBatch(ca).trigger(availableNow=True).start()
    q.awaitTermination(120)

    stored = snappy.table("ca_pct").select(
        F.col("bucket_start").alias("hour_start"), "et", "bin", "cnt"
    )
    streamed = percentiles_from_partials(stored, ("hour_start", "et"))

    batch = snappy.spark.read.schema("ts timestamp, et string, v double").json(
        stream_dir
    ).select(F.date_trunc("hour", "ts").alias("hour_start"), "et", "v")
    direct = percentiles_from_partials(
        percentile_histogram_partials(batch, ("hour_start", "et"), value_col="v"),
        ("hour_start", "et"),
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, direct.collect())
    )
    snappy.drop_table("ca_pct")


def test_streaming_ann_index_maintenance(snappy, stream_dir):
    """Incremental vector-index maintenance: vectors arriving on a
    stream are cell-assigned (IVF coarse quantizer) per micro-batch and
    PUT into a keyed managed index table — re-delivered vectors upsert
    instead of duplicate, and the final index equals the batch
    assignment over all data."""
    import json as _json

    from pyspark.sql import functions as F

    from snappydata_spark import ann

    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
             (2, [0.0, 0.0, 1.0, 0.0])]

    def vec(i):
        base = [0.05, 0.05, 0.05, 0.05]
        base[i % 3] = 1.0
        return [v + (i % 7) * 0.01 for v in base]

    rows0 = [{"vec_id": i, "embedding": vec(i)} for i in range(30)]
    # batch 1 re-delivers 5 vectors (same ids) plus 20 new ones
    rows1 = [{"vec_id": i, "embedding": vec(i)} for i in range(25, 50)]
    _write_batch(stream_dir, "b0.json", rows0, mtime=1_000_000)
    _write_batch(stream_dir, "b1.json", rows1, mtime=1_000_100)

    snappy.create_table(
        "ann_index",
        schema="vec_id long, cell long",
        options={"key_columns": "vec_id"},
    )

    def maintain(batch, batch_id):
        assigned = ann.ivf_assign_vectorized(batch, cents)
        snappy.put("ann_index", assigned)

    stream = stream_reader(
        snappy.spark, "file_stream",
        schema="vec_id long, embedding array<double>",
        format="json", path=stream_dir, maxFilesPerTrigger=1,
    )
    q = stream.writeStream.foreachBatch(maintain).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {r.vec_id: r.cell for r in snappy.table("ann_index").collect()}
    assert len(got) == 50  # re-delivered ids upserted, not duplicated
    full = snappy.spark.read.schema("vec_id long, embedding array<double>").json(
        stream_dir
    )
    expect = {
        r.vec_id: r.cell
        for r in ann.ivf_assign_vectorized(full, cents).collect()
    }
    assert got == expect
    snappy.drop_table("ann_index")


def test_streaming_minhash_index_maintenance(snappy, stream_dir):
    """Incremental near-dup-index maintenance: documents arriving on a
    stream are banded per micro-batch and PUT into the keyed band table
    — re-delivered docs upsert (idempotent), and the final band table
    equals the batch banding over all data (the streaming twin of
    CREATE INDEX ... USING minhash maintenance)."""
    from pyspark.sql import functions as F

    from snappydata_spark.index_minhash import _band_rows

    def text(i):
        core = f"document number {i % 6} shares this long boilerplate "
        return (core * 4) + f"tail {i}"

    rows0 = [{"doc_id": i, "text": text(i)} for i in range(20)]
    # batch 1 re-delivers 5 docs (same ids) plus 15 new ones
    rows1 = [{"doc_id": i, "text": text(i)} for i in range(15, 35)]
    _write_batch(stream_dir, "d0.json", rows0, mtime=2_000_000)
    _write_batch(stream_dir, "d1.json", rows1, mtime=2_000_100)

    snappy.create_table(
        "mh_bands",
        schema="doc_id long, band int, band_hash string, sig_digest string",
        options={"key_columns": "doc_id,band"},
    )

    def maintain(batch, batch_id):
        snappy.put(
            "mh_bands", _band_rows(batch, "text", "doc_id", 16, 4, 3)
        )

    stream = stream_reader(
        snappy.spark, "file_stream",
        schema="doc_id long, text string",
        format="json", path=stream_dir, maxFilesPerTrigger=1,
    )
    q = stream.writeStream.foreachBatch(maintain).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {
        (r.doc_id, r.band): r.band_hash
        for r in snappy.table("mh_bands").collect()
    }
    assert len(got) == 35 * 4  # 4 bands per doc, upserted not duplicated
    full = snappy.spark.read.schema("doc_id long, text string").json(stream_dir)
    expect = {
        (r.doc_id, r.band): r.band_hash
        for r in _band_rows(full, "text", "doc_id", 16, 4, 3).collect()
    }
    assert got == expect
    # the maintained index serves the gate query: same-template docs
    # (i % 6) are candidate pairs via the stored bands
    a = snappy.table("mh_bands").alias("a")
    b = snappy.table("mh_bands").alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id").distinct().count()
    )
    assert pairs > 0
    snappy.drop_table("mh_bands")


def test_streaming_approx_ts_topk_maintenance(snappy, stream_dir):
    """Stream-fed approx TS topk (createApproxTSTopK's real shape in
    the reference: CMS/StreamSummary updated per batch): per-window key
    counts PUT-merge into the panel across micro-batches; the final
    query equals the batch top-k over all streamed events, and replay
    of a delivered batch cannot double-count (in-row ledger)."""
    from pyspark.sql import functions as F

    from snappydata_spark import aqp as aqp_mod

    # empty keyed base: the structure starts empty and is fed by the stream
    snappy.create_table(
        "tk_ev",
        schema="user_id string, ts timestamp",
        options={"key_columns": "user_id"},
    )
    snappy.create_approx_ts_topk(
        "tk_live", "tk_ev", key_col="user_id", ts_col="ts",
        k=3, window="1 hour",
    )

    def ev(i):
        # users u0..u4 with frequencies 15,12,9,6,3 over two hours
        u = 0 if i % 5 < 3 else (1 if i % 5 == 3 else i % 5)
        hour = 10 + (i % 2)
        return {
            "user_id": f"u{u}",
            "ts": f"2024-03-01 {hour}:0{i % 6}:00",
        }

    rows = [ev(i) for i in range(45)]
    _write_batch(stream_dir, "t0.json", rows[:25], mtime=3_000_000)
    _write_batch(stream_dir, "t1.json", rows[25:], mtime=3_000_100)

    updater = snappy.topk_stream_updater("tk_live")
    stream = stream_reader(
        snappy.spark, "file_stream",
        schema="user_id string, ts timestamp",
        format="json", path=stream_dir, maxFilesPerTrigger=1,
    )
    q = stream.writeStream.foreachBatch(updater).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = [
        (r.user_id, r.estimated_count)
        for r in snappy.query_approx_ts_topk("tk_live", k=3).collect()
    ]
    full = snappy.spark.read.schema("user_id string, ts timestamp").json(
        stream_dir
    )
    expect_panel = aqp_mod.approx_topk_time(
        full, "user_id", "ts", k=100, window="1 hour"
    )
    expect = [
        (r.user_id, r.total)
        for r in expect_panel.groupBy("user_id")
        .agg(F.sum("cnt").alias("total"))
        .orderBy(F.desc("total"), "user_id")
        .limit(3)
        .collect()
    ]
    assert got == expect
    # replay the last batch verbatim: ledger must keep counts unchanged
    updater(full, batch_id=1)
    again = [
        (r.user_id, r.estimated_count)
        for r in snappy.query_approx_ts_topk("tk_live", k=3).collect()
    ]
    assert again == expect
    snappy.drop_table("tk_live")
    snappy.drop_table("tk_ev")


def test_streaming_hll_and_cms_sketch_maintenance(snappy, stream_dir):
    """Stream-fed sketch maintenance, the mergeable-partial property
    the verified sketches are built on: per micro-batch HLL register
    partials PUT-merge by MAX and CMS cell partials by ADDITION into
    keyed tables; after the stream drains, both sketch states equal the
    batch computation over all streamed data."""
    from pyspark.sql import functions as F

    def ev(i):
        return {"user_id": 1000 + (i * 7) % 260, "event_type": f"t{i % 3}"}

    rows = [ev(i) for i in range(300)]
    _write_batch(stream_dir, "s0.json", rows[:150], mtime=4_000_000)
    _write_batch(stream_dir, "s1.json", rows[150:], mtime=4_000_100)

    snappy.create_table(
        "hll_regs", schema="bucket long, max_rho int",
        options={"key_columns": "bucket"},
    )
    snappy.create_table(
        "cms_cells", schema="row_idx int, bucket long, cnt long",
        options={"key_columns": "row_idx,bucket"},
    )

    def hll_partial(df):
        h = df.filter(F.col("user_id").isNotNull()).select(
            F.conv(F.substring(F.md5(F.concat(F.lit("hll~"),
                F.col("user_id").cast("string"))), 1, 15), 16, 10)
            .cast("long").alias("hv"))
        parts = h.select(
            F.shiftright("hv", 52).alias("bucket"),
            F.col("hv").bitwiseAND(F.lit((1 << 52) - 1)).alias("rest"))
        return parts.select(
            "bucket",
            F.when(F.col("rest") == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.bin("rest"))).alias("rho")
        ).groupBy("bucket").agg(F.max("rho").cast("int").alias("max_rho"))

    def cms_partial(df):
        cells = df.select(
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("row_idx"),
            "event_type",
        ).select("row_idx", (F.conv(F.substring(F.md5(F.concat(
            F.lit("cms"), F.col("row_idx").cast("string"),
            F.lit("~"), F.col("event_type"))), 1, 8), 16, 10)
            .cast("long") % 64).alias("bucket"))
        return cells.groupBy("row_idx", "bucket").agg(
            F.count(F.lit(1)).alias("cnt"))

    def maintain(batch, batch_id):
        # HLL: register merge is MAX(stored, partial)
        p = hll_partial(batch).alias("p")
        t = snappy.table("hll_regs").alias("t")
        merged = p.join(t, "bucket", "left").select(
            "bucket",
            F.greatest(F.col("p.max_rho"),
                       F.coalesce(F.col("t.max_rho"), F.lit(0)))
            .cast("int").alias("max_rho"))
        snappy.put("hll_regs", merged)
        # CMS: cell merge is ADDITION
        cp = cms_partial(batch).alias("p")
        ct = snappy.table("cms_cells").alias("t")
        cmerged = cp.join(ct, ["row_idx", "bucket"], "left").select(
            "row_idx", "bucket",
            (F.col("p.cnt") + F.coalesce(F.col("t.cnt"), F.lit(0)))
            .alias("cnt"))
        snappy.put("cms_cells", cmerged)

    stream = stream_reader(
        snappy.spark, "file_stream",
        schema="user_id long, event_type string",
        format="json", path=stream_dir, maxFilesPerTrigger=1,
    )
    q = stream.writeStream.foreachBatch(maintain).trigger(availableNow=True).start()
    q.awaitTermination(120)

    full = snappy.spark.read.schema("user_id long, event_type string").json(
        stream_dir)
    want_hll = {(r.bucket, r.max_rho) for r in hll_partial(full).collect()}
    got_hll = {(r.bucket, r.max_rho)
               for r in snappy.table("hll_regs").collect()}
    assert got_hll == want_hll
    want_cms = {(r.row_idx, r.bucket, r.cnt)
                for r in cms_partial(full).collect()}
    got_cms = {(r.row_idx, r.bucket, r.cnt)
               for r in snappy.table("cms_cells").collect()}
    assert got_cms == want_cms
    snappy.drop_table("hll_regs")
    snappy.drop_table("cms_cells")

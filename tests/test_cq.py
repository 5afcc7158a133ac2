"""Continuous-query surface: the reference's CQ window grammar
(`FROM s WINDOW (DURATION n SECONDS [, SLIDE n SECONDS])`,
streamWindowOptions SnappyParser.scala:552-557), registerCQ
(SnappyStreamingContext.scala), and the STREAMING INIT/START/STOP
context DDL (streamContext SnappyDDLParser:875-888) — all mapped onto
Structured Streaming event-time windows."""

import json
import os
import tempfile

import pytest

from snappydata_spark.dialect import rewrite_stream_windows, split_statement


# ------------------------------------------------------------ dialect units

def test_rewrite_stream_window_basic():
    out = rewrite_stream_windows(
        "SELECT window, count(*) FROM s WINDOW (DURATION 10 SECONDS) GROUP BY window",
        lambda n: "ts" if n == "s" else None,
    )
    assert "window(ts, '10 seconds', '10 seconds') AS window" in out
    assert "WINDOW (" not in out


def test_rewrite_stream_window_slide_and_units():
    out = rewrite_stream_windows(
        "SELECT * FROM ev WINDOW (DURATION 1 MIN, SLIDE 30 SECS)",
        lambda n: "event_ts",
    )
    assert "window(event_ts, '1 minutes', '30 seconds')" in out


def test_rewrite_leaves_plain_tables_alone():
    sql = "SELECT * FROM t WINDOW (DURATION 10 SECONDS)"
    assert rewrite_stream_windows(sql, lambda n: None) == sql


def test_rewrite_ignores_named_window_clause():
    # ordinary SQL named-window syntax must not be touched: the WINDOW
    # keyword here is not attached to a FROM/JOIN relation
    sql = (
        "SELECT sum(x) OVER w FROM t WHERE a > 1 "
        "WINDOW w AS (PARTITION BY k ORDER BY ts)"
    )
    assert rewrite_stream_windows(sql, lambda n: "ts") == sql


def test_streaming_ctl_parse():
    s = split_statement("STREAMING INIT 2 SECS")
    assert s.kind == "streaming_ctl"
    assert s.options == {"op": "init", "duration": "2 seconds"}
    assert split_statement("STREAMING START").options["op"] == "start"
    assert split_statement("streaming stop;").options["op"] == "stop"
    with pytest.raises(ValueError):
        split_statement("STREAMING INIT 3 FORTNIGHTS")


# --------------------------------------------------------------- end-to-end

def _write_batch(d, fname, rows):
    path = os.path.join(d, fname)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)


def test_cq_end_to_end(snappy):
    d = tempfile.mkdtemp(prefix="snappy_cq_")
    _write_batch(d, "b0.json", [
        {"ts": "2024-01-01T00:00:01Z", "user": "a"},
        {"ts": "2024-01-01T00:00:05Z", "user": "a"},
        {"ts": "2024-01-01T00:00:05Z", "user": "b"},
        {"ts": "2024-01-01T00:00:12Z", "user": "a"},
    ])
    snappy.sql("STREAMING INIT 1 SECS")
    df = snappy.sql(
        "CREATE STREAM TABLE clicks (ts timestamp, user string) "
        f"USING file_stream OPTIONS (format 'json', path '{d}', "
        "timestampColumn 'ts')"
    )
    assert df.isStreaming
    assert snappy._stream_ts["clicks"] == "ts"

    cq = snappy.register_cq(
        "SELECT window.start AS ws, user, count(*) AS cnt "
        "FROM clicks WINDOW (DURATION 10 SECONDS) GROUP BY window, user",
        name="cq_clicks",
        sink="memory",
    )
    assert cq.isStreaming

    handles = snappy.sql("STREAMING START") or snappy._active_cqs
    q = snappy._active_cqs["cq_clicks"]
    q.processAllAvailable()
    rows = {
        (r["ws"].second, r["user"]): r["cnt"]
        for r in snappy.spark.sql("SELECT * FROM cq_clicks").collect()
    }
    # window [00..10): a×2, b×1; window [10..20): a×1
    assert rows[(0, "a")] == 2
    assert rows[(0, "b")] == 1
    assert rows[(10, "a")] == 1

    snappy.sql("STREAMING STOP")
    assert not snappy._active_cqs
    assert not q.isActive

    snappy.sql("DROP STREAM TABLE clicks")
    assert "clicks" not in snappy._stream_ts


def test_register_cq_rejects_batch_query(snappy, sf_dir):
    with pytest.raises(ValueError, match="stream table"):
        snappy.register_cq(
            f"SELECT * FROM parquet.`{sf_dir}/nation.parquet`"
        )


def test_stream_name_as_column_stays_cached(snappy, tmp_path):
    """A batch query whose SELECT list merely contains a column named like
    a registered stream must stay on the plan cache — only relation
    positions (FROM s / JOIN s / FROM a, s) divert to the stream path."""
    snappy.sql(
        f"CREATE STREAM TABLE clicks (k INT, v STRING) "
        f"USING file_stream OPTIONS (format 'json', path '{tmp_path}')"
    )
    try:
        snappy.spark.createDataFrame(
            [(1, 10), (2, 20)], "user_id int, clicks int"
        ).createOrReplaceTempView("daily_stats")
        df = snappy.sql("SELECT user_id, clicks FROM daily_stats")
        assert not df.isStreaming
        assert df.count() == 2
        # comma-join relation position DOES divert to the stream path
        s = snappy.sql("SELECT * FROM daily_stats, clicks")
        assert s.isStreaming
    finally:
        snappy.sql("DROP STREAM TABLE clicks")

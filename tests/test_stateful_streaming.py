"""Custom stateful streaming operators (applyInPandasWithState): state
must carry across micro-batches — driven through a real file-source
stream (one file per batch via maxFilesPerTrigger) into a memory sink."""

import json
import os
import tempfile

import pytest

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

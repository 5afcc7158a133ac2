"""Reference camelCase Python API (compat.SnappyContext) — the surface of
python/pyspark/sql/snappy/context.py:26-158 must work verbatim: DDL-string
schemas with PRIMARY KEY, tuple-list insert/put, parallel-list update,
count-returning mutations."""

import pytest

from snappydata_spark import SnappyContext


@pytest.fixture()
def ctx(snappy):
    return SnappyContext(snappy)


def test_create_table_ddl_string_primary_key(ctx):
    df = ctx.createTable(
        "compat_t",
        "row",
        "(OrderId INT NOT NULL PRIMARY KEY, ItemRef INT)",
        allowExisting=True,
    )
    assert [f.lower() for f in df.schema.fieldNames()] == ["orderid", "itemref"]
    # PRIMARY KEY surfaced as the engine's key_columns contract
    meta = ctx._sn.catalog.load_meta("compat_t")
    assert meta.key_columns == ["orderid"]
    # allowExisting=True is idempotent; False raises
    ctx.createTable("compat_t", "row", "(OrderId INT, ItemRef INT)")
    with pytest.raises(ValueError, match="exists"):
        ctx.createTable(
            "compat_t", "row", "(OrderId INT, ItemRef INT)", allowExisting=False
        )
    ctx.dropTable("compat_t")


def test_insert_put_update_delete_counts(ctx):
    ctx.createTable(
        "compat_m", "row", "(K INT PRIMARY KEY, V INT)", allowExisting=False
    )
    assert ctx.insert("compat_m", [(1, 10), (2, 20), (3, 30)]) == 3
    assert ctx.insert("compat_m", (4, 40)) == 1  # single tuple form
    assert ctx.put("compat_m", [(2, 99), (5, 50)]) == 2  # 1 update + 1 insert
    assert ctx.table("compat_m").count() == 5

    n = ctx.update("compat_m", "v >= 40", [0], ["v"])
    assert n == 3  # 99, 40, 50 matched
    got = {r["K"]: r["V"] for r in ctx.table("compat_m").collect()}
    assert got == {1: 10, 2: 0, 3: 30, 4: 0, 5: 0}

    with pytest.raises(TypeError):
        ctx.update("compat_m", "v = 0", 7, ["v"])
    with pytest.raises(TypeError):
        ctx.insert("compat_m", "not-rows")

    assert ctx.delete("compat_m", "v = 0") == 3
    assert ctx.table("compat_m").count() == 2

    ctx.truncateTable("compat_m")
    assert ctx.table("compat_m").count() == 0
    ctx.truncateTable("missing_t", ifExists=True)  # no raise
    ctx.dropTable("compat_m")
    ctx.dropTable("compat_m", ifExists=True)  # no raise


def test_sql_passthrough(ctx):
    assert ctx.sql("SELECT 1 AS one").collect()[0].one == 1


def test_snappy_streaming_context(snappy):
    """Reference streaming compat flow (python/pyspark/streaming/snappy/
    context.py:13-171): SnappyStreamingContext(batchDuration) + sql()
    stream DDL + registerCQ + SchemaDStream.foreachDataFrame + start/stop,
    on Structured Streaming."""
    import json
    import os
    import tempfile

    from snappydata_spark import SnappyStreamingContext

    d = tempfile.mkdtemp(prefix="snappy_snsc_")
    with open(os.path.join(d, "b0.json"), "w") as f:
        for r in [
            {"ts": "2024-01-01T00:00:01Z", "user": "a"},
            {"ts": "2024-01-01T00:00:02Z", "user": "b"},
            {"ts": "2024-01-01T00:00:14Z", "user": "a"},
        ]:
            f.write(json.dumps(r) + "\n")

    snsc = SnappyStreamingContext(snappy, batchDuration=1)
    assert snappy._streaming_trigger == "1000 milliseconds"
    snsc.sql(
        "CREATE STREAM TABLE sc_clicks (ts timestamp, user string) "
        f"USING file_stream OPTIONS (format 'json', path '{d}', "
        "timestampColumn 'ts')"
    )
    d_stream = snsc.registerCQ(
        "SELECT window.start AS ws, count(*) AS cnt FROM sc_clicks "
        "WINDOW (DURATION 10 SECONDS) GROUP BY window",
        name="sc_cq",
    )
    assert d_stream.schema.fieldNames() == ["ws", "cnt"]

    batches = []
    d_stream.foreachDataFrame(lambda df: batches.append(df.collect()))
    snsc.start()
    snappy._active_cqs["sc_cq"].processAllAvailable()
    snsc.stop()
    assert snsc.awaitTerminationOrTimeout(5)

    counts = {r.ws.second: r.cnt for rows in batches for r in rows}
    assert counts == {0: 2, 10: 1}
    snsc.sql("DROP STREAM TABLE sc_clicks")


def test_api_reference_guide_surface(ctx, sf_dir):
    """The remaining SnappySession APIs from apireference_guide.md:
    sqlUncached (fresh plan, bypasses the plan cache), getKeyColumns /
    getKeyColumnsAndPositions, createSampleTable, createApproxTSTopK /
    queryApproxTSTopK."""
    ctx.createTable(
        "api_t", schema="k INT NOT NULL PRIMARY KEY, grp STRING, v DOUBLE"
    )
    ctx.insert("api_t", [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)])
    assert ctx.getKeyColumns("api_t") == ["k"]
    assert ctx.getKeyColumnsAndPositions("api_t") == [("k", 1)]
    # sqlUncached returns the same rows but never populates the cache
    before = len(ctx._sn.plan_cache._cache)
    rows = ctx.sqlUncached("SELECT COUNT(*) AS c FROM api_t").collect()
    assert rows[0].c == 3
    assert len(ctx._sn.plan_cache._cache) == before
    ctx.createSampleTable(
        "api_s", "api_t", {"qcs": "grp", "fraction": "0.9"}
    )
    assert ctx._sn.catalog.load_meta("api_s").provider == "sample"
    ctx.createSampleTable(
        "api_s", "api_t", {"qcs": "grp", "fraction": "0.9"},
        allowExisting=True,
    )
    # events.parquet has nanos timestamps; go through the loader
    from snappydata_spark.tables import load_tables

    events = load_tables(ctx.spark, sf_dir, ("events",))["events"]
    ctx._sn.create_table("api_ev", options={"key_columns": "event_id"}, df=events)
    ctx.createApproxTSTopK(
        "api_topk", "api_ev", "event_type",
        {"timeSeriesColumn": "ts", "timeInterval": "1h", "size": "5"},
    )
    top = ctx.queryApproxTSTopK("api_topk", k=3).collect()
    assert len(top) == 3
    for t in ("api_topk", "api_ev", "api_s", "api_t"):
        ctx._sn.drop_table(t)

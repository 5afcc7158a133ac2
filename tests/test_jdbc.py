"""JDBC source/sink (JDBCAppendableRelation; docs README.md:21-24 lists
JDBC among external sources).  Uses embedded Apache Derby — shipped in
Spark's own jars, and the same engine family as the reference's
Derby-derived store — so the round trip is real, not mocked."""

import os

import pytest

from snappydata_spark.sources.jdbc import derby_url, jdbc_read, jdbc_write


@pytest.fixture()
def derby_db(tmp_path):
    return derby_url(os.path.join(tmp_path, "db"))


def test_jdbc_round_trip_append(spark, derby_db):
    df = spark.range(0, 500).selectExpr(
        "id", "CAST(id * 2.5 AS DOUBLE) AS val", "CONCAT('n', id) AS name"
    )
    jdbc_write(df, derby_db, "T_RT", mode="overwrite")
    # append path (the JDBCAppendableRelation contract)
    jdbc_write(df.filter("id < 10"), derby_db, "T_RT", mode="append")
    back = jdbc_read(spark, derby_db, "T_RT")
    assert back.count() == 510
    assert back.filter("id < 10").count() == 20


def test_jdbc_partitioned_read_and_pushdown(spark, derby_db):
    """Partitioned range read (the 100 TB discipline: N parallel
    per-executor range queries, not one connection) + filter/column
    pushdown into the generated SQL."""
    jdbc_write(
        spark.range(0, 1000).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        derby_db,
        "T_PART",
        mode="overwrite",
    )
    part = jdbc_read(
        spark,
        derby_db,
        "T_PART",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.selectExpr("SUM(id) AS s").collect()[0].s == 499500
    plan = (
        part.filter("id < 100")
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "LessThan(id,100)" in plan
    assert "ReadSchema: struct<id:bigint>" in plan


def test_jdbc_external_table_in_sql(snappy, derby_db):
    """create_external_table(fmt='jdbc') registers the JDBC relation for
    sql() queries alongside managed tables."""
    jdbc_write(
        snappy.spark.range(0, 50).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
        derby_db,
        "T_EXT",
        mode="overwrite",
    )
    snappy.create_external_table(
        "jdbc_ext", fmt="jdbc", options={"url": derby_db, "dbtable": "T_EXT"}
    )
    row = snappy.sql(
        "SELECT COUNT(*) AS n, SUM(k) AS s FROM jdbc_ext WHERE k >= 10"
    ).collect()[0]
    assert (row.n, row.s) == (40, sum(range(10, 50)))


def test_create_external_table_ddl(snappy, sf_dir, derby_db):
    """CREATE EXTERNAL TABLE ... USING <provider> OPTIONS (...) DDL
    (createExternalTable SnappySession.scala:1076-1127) for both a
    path provider (parquet) and the path-less jdbc provider."""
    df = snappy.sql(
        f"CREATE EXTERNAL TABLE ext_parq USING parquet "
        f"OPTIONS (path '{sf_dir}/nation.parquet')"
    )
    assert df.count() == 25
    assert snappy.sql("SELECT COUNT(*) AS n FROM ext_parq").collect()[0].n == 25

    jdbc_write(
        snappy.spark.range(7).selectExpr("id AS k"), derby_db, "T_DDL", mode="overwrite"
    )
    snappy.sql(
        f"CREATE EXTERNAL TABLE ext_jdbc USING jdbc "
        f"OPTIONS (url '{derby_db}', dbtable 'T_DDL')"
    )
    assert snappy.sql("SELECT COUNT(*) AS n FROM ext_jdbc").collect()[0].n == 7


def test_jdbc_stream_cdc_polling(snappy, spark, tmp_path, derby_db):
    """The JDBC streaming connector analogue
    (docs/connectors/jdbc_streaming_connector.md): CREATE STREAM TABLE
    USING jdbc_stream polls offset-newer rows from a JDBC table into a
    landing zone and streams them — incremental polls land only the new
    tail, the watermark survives re-registration, and the stream
    composes with ordinary streaming queries."""
    from snappydata_spark.streaming import jdbc_stream

    src = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "evt_id int, payload string"
    )
    jdbc_write(src, derby_db, "CDC_SRC", mode="overwrite")
    staging = str(tmp_path / "landing")
    sn = snappy
    df = sn.sql(
        "CREATE STREAM TABLE jstream (evt_id int, payload string) "
        "USING jdbc_stream OPTIONS ("
        f"url '{derby_db}', dbtable 'CDC_SRC', offsetColumn 'evt_id', "
        f"stagingDir '{staging}')"
    )
    assert df.isStreaming
    q = (
        df.writeStream.format("memory")
        .queryName("jstream_mem")
        .outputMode("append")
        .start()
    )
    try:
        assert jdbc_stream.poll(staging) == 3
        q.processAllAvailable()
        got = {
            r.evt_id for r in spark.sql("SELECT * FROM jstream_mem").collect()
        }
        assert got == {1, 2, 3}
        # new CDC rows: the next poll lands ONLY the tail past the offset
        jdbc_write(
            spark.createDataFrame([(4, "d"), (5, "e")], src.schema),
            derby_db, "CDC_SRC", mode="append",
        )
        assert jdbc_stream.poll(staging) == 2
        assert jdbc_stream.poll(staging) == 0  # nothing new
        q.processAllAvailable()
        got = {
            r.evt_id for r in spark.sql("SELECT * FROM jstream_mem").collect()
        }
        assert got == {1, 2, 3, 4, 5}
    finally:
        q.stop()
    # the persisted watermark survives re-creation (restart contract)
    sn.sql("DROP STREAM TABLE jstream")
    sn.sql(
        "CREATE STREAM TABLE jstream2 (evt_id int, payload string) "
        "USING jdbc_stream OPTIONS ("
        f"url '{derby_db}', dbtable 'CDC_SRC', offsetColumn 'evt_id', "
        f"stagingDir '{staging}')"
    )
    assert jdbc_stream.poll(staging) == 0
    sn.sql("DROP STREAM TABLE jstream2")


def test_jdbc_cdc_to_snappysink_pipeline(snappy, spark, tmp_path, derby_db):
    """The reference's end-to-end CDC pipeline
    (docs/connectors/cdc_connector.md + jdbc_streaming_connector.md):
    a CDC-shaped JDBC table (LSN + _eventType) polls through
    jdbc_stream into a snappysink-maintained keyed table — inserts
    land, updates upsert, deletes remove, all conflated per key in LSN
    order."""
    from snappydata_spark.streaming import jdbc_stream
    from snappydata_spark.streaming.sink import SnappySink

    rows = [(1, 1, "a", 0), (2, 2, "b", 0), (3, 3, "c", 0)]
    jdbc_write(
        spark.createDataFrame(
            rows, "lsn int, k int, v string, _eventType int"
        ),
        derby_db, "CDCP", mode="overwrite",
    )
    staging = str(tmp_path / "cdc_landing")
    stream = snappy.sql(
        "CREATE STREAM TABLE cdcp_stream "
        "(lsn int, k int, v string, _eventType int) "
        "USING jdbc_stream OPTIONS ("
        f"url '{derby_db}', dbtable 'CDCP', offsetColumn 'lsn', "
        f"stagingDir '{staging}')"
    )
    snappy.sql(
        "CREATE TABLE cdc_tgt (k INT NOT NULL, v STRING) "
        "USING row OPTIONS (key_columns 'k')"
    )
    sink = SnappySink(
        snappy, "cdc_tgt", query_name="cdcp", order_col="lsn"
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        assert jdbc_stream.poll(staging) == 3
        q.processAllAvailable()
        got = {r.k: r.v for r in snappy.table("cdc_tgt").collect()}
        assert got == {1: "a", 2: "b", 3: "c"}
        # CDC tail: update k=1, delete k=2 (higher LSNs)
        jdbc_write(
            spark.createDataFrame(
                [(4, 1, "a2", 1), (5, 2, "b", 2)],
                "lsn int, k int, v string, _eventType int",
            ),
            derby_db, "CDCP", mode="append",
        )
        assert jdbc_stream.poll(staging) == 2
        q.processAllAvailable()
        got = {r.k: r.v for r in snappy.table("cdc_tgt").collect()}
        assert got == {1: "a2", 3: "c"}
    finally:
        q.stop()
    snappy.sql("DROP STREAM TABLE cdcp_stream")
    snappy.drop_table("cdc_tgt")

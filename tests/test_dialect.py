"""SQL-dialect DDL: CREATE TABLE USING COLUMN/ROW OPTIONS, CTAS, sample
tables, index registry (SnappyDDLParser statement list, SURVEY.md §2.12)."""

import pytest
from pyspark.sql import functions as F

from snappydata_spark.dialect import split_statement


def test_parse_create_table_options():
    s = split_statement(
        "CREATE TABLE t1 (k INT, v STRING) USING COLUMN "
        "OPTIONS (partition_by 'k', buckets '8', key_columns 'k')"
    )
    assert s.kind == "create_table"
    assert s.table == "t1" and s.provider == "column"
    assert s.options == {"partition_by": "k", "buckets": "8", "key_columns": "k"}
    assert "k INT" in s.schema_sql


def test_parse_create_table_as_select():
    s = split_statement("CREATE TABLE t2 USING COLUMN AS SELECT 1 AS x")
    assert s.kind == "create_table" and s.source_sql == "SELECT 1 AS x"


def test_ddl_lifecycle_via_sql(snappy, sf_dir):
    snappy.spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "nation_src"
    )
    snappy.sql(
        "CREATE TABLE nat USING COLUMN OPTIONS (key_columns 'n_nationkey') "
        "AS SELECT * FROM nation_src"
    )
    assert snappy.table("nat").count() == 25
    assert snappy.key_columns("nat") == ["n_nationkey"]
    snappy.sql("CREATE TABLE IF NOT EXISTS nat USING COLUMN AS SELECT 1 AS x")
    assert snappy.table("nat").count() == 25  # unchanged
    snappy.sql("PUT INTO nat SELECT n_nationkey, 'X' AS n_name, n_regionkey FROM nat WHERE n_nationkey < 3")
    assert snappy.table("nat").filter(F.col("n_name") == "X").count() == 3
    snappy.sql("DROP TABLE nat")
    assert "nat" not in snappy.list_tables()


def test_create_empty_table_with_schema_ddl(snappy):
    snappy.sql("CREATE TABLE sch_t (k INT, v STRING) USING ROW OPTIONS (key_columns 'k')")
    assert snappy.table("sch_t").columns == ["k", "v"]
    assert snappy.table("sch_t").count() == 0
    snappy.insert("sch_t", snappy.spark.createDataFrame([(1, "a")], "k int, v string"))
    assert snappy.table("sch_t").count() == 1


def test_sample_table_and_with_error_path(snappy, sf_dir):
    snappy.create_table(
        "li", df=snappy.spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    )
    snappy.sql(
        "CREATE SAMPLE TABLE li_sample ON li OPTIONS (qcs 'l_returnflag', fraction '0.3')"
    )
    assert "li_sample" in snappy.list_tables()
    n_sample = snappy.table("li_sample").count()
    n_base = snappy.table("li").count()
    assert 0 < n_sample < n_base
    est = {
        r.l_returnflag: r
        for r in snappy.approx_agg("li_sample", ["l_returnflag"], "l_quantity", "avg").collect()
    }
    true = {
        r.l_returnflag: r.a
        for r in snappy.table("li")
        .groupBy("l_returnflag")
        .agg(F.avg("l_quantity").alias("a"))
        .collect()
    }
    for flag, r in est.items():
        assert r.estimate == pytest.approx(true[flag], rel=0.25)


def test_index_registry(snappy):
    snappy.sql("CREATE TABLE idx_t (k INT, v STRING) USING COLUMN")
    snappy.sql("CREATE INDEX idx1 ON idx_t (k)")
    assert snappy.list_indexes() == {"idx1": ("idx_t", ["k"])}
    snappy.sql("DROP INDEX idx1")
    assert snappy.list_indexes() == {}

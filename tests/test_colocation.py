"""End-to-end colocation: managed tables created with partition_by +
buckets + colocate_with must join WITHOUT a shuffle exchange — the
reference's marquee layout feature (TPCHColumnPartitionedTable.scala:
LINEITEM colocate_with ORDERS; CollapseCollocatedPlans)."""

import pytest
from pyspark.sql import functions as F

from snappydata_spark.plans import exchange_count
from snappydata_spark.plans.explainer import physical_plan


@pytest.fixture()
def colocated(snappy, sf_dir):
    spark = snappy.spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    line = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    snappy.create_table(
        "c_orders",
        options={"partition_by": "o_orderkey", "buckets": 4, "key_columns": "o_orderkey"},
        df=orders,
    )
    snappy.create_table(
        "c_lineitem",
        options={
            "partition_by": "l_orderkey",
            "buckets": 4,
            "colocate_with": "c_orders",
            "key_columns": "l_orderkey,l_linenumber",
        },
        df=line,
    )
    yield snappy
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    snappy.drop_table("c_lineitem")
    snappy.drop_table("c_orders")


def test_colocated_join_no_shuffle(colocated):
    sn = colocated
    j = sn.table("c_lineitem").join(
        sn.table("c_orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    assert exchange_count(j) == 0, physical_plan(j)
    assert j.count() > 0


def test_groupby_on_bucket_key_no_extra_shuffle(colocated):
    sn = colocated
    agg = sn.table("c_lineitem").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert exchange_count(agg) == 0, physical_plan(agg)
    assert agg.count() > 0


def test_colocated_join_via_sql_views(colocated):
    sn = colocated
    j = sn.sql(
        """SELECT l_orderkey, o_orderdate, SUM(l_quantity) AS q
           FROM c_lineitem JOIN c_orders ON l_orderkey = o_orderkey
           GROUP BY l_orderkey, o_orderdate"""
    )
    assert exchange_count(j) == 0, physical_plan(j)


def test_mutation_preserves_bucketing(colocated):
    sn = colocated
    src = sn.table("c_orders").limit(5).withColumn("o_totalprice", F.lit(1.0))
    sn.put("c_orders", src)
    j = sn.table("c_lineitem").join(
        sn.table("c_orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    assert exchange_count(j) == 0, physical_plan(j)
    assert sn.table("c_orders").filter(F.col("o_totalprice") == 1.0).count() == 5

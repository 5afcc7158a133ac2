"""NorthWind-style layout matrix (NorthWindTest.scala:41-151): the same
join-shape queries must return identical results whether the tables are
replicated, partitioned(buckets), or colocated — layout changes the PLAN
(broadcast vs shuffle vs zero-exchange), never the rows."""

import pytest
from pyspark.sql import functions as F


QUERIES = {
    # name → SQL over views cust_t / ord_t (outer joins, null probes,
    # semi/anti — the NWQueries join-shape core)
    "left_null_probe": """
        SELECT c_nationkey, COUNT(*) AS n
        FROM cust_t LEFT JOIN (SELECT * FROM ord_t WHERE o_totalprice > 300000) o
          ON c_custkey = o_custkey
        WHERE o_orderkey IS NULL GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "right_join_counts": """
        SELECT c_mktsegment, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_orders
        FROM ord_t RIGHT JOIN cust_t ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "full_outer": """
        SELECT COUNT(*) AS n,
               COUNT(c_custkey) AS n_left,
               COUNT(o_orderkey) AS n_right
        FROM (SELECT * FROM cust_t WHERE c_acctbal > 9000) c
        FULL OUTER JOIN (SELECT * FROM ord_t WHERE o_totalprice > 300000) o
          ON c_custkey = o_custkey
    """,
    "on_clause_filter": """
        SELECT c_mktsegment, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_big
        FROM cust_t LEFT JOIN ord_t
          ON c_custkey = o_custkey AND o_totalprice > 150000
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "anti_join": """
        SELECT COUNT(*) AS n FROM cust_t
        WHERE NOT EXISTS (SELECT 1 FROM ord_t
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
}


@pytest.fixture(scope="module")
def source(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ords = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return cust, ords


def _run_all(sn):
    return {
        name: [tuple(r) for r in sn.sql(q).collect()] for name, q in QUERIES.items()
    }


def test_layouts_agree(snappy, source):
    cust, ords = source

    # baseline: plain column tables
    snappy.create_table("cust_t", df=cust)
    snappy.create_table("ord_t", df=ords)
    baseline = _run_all(snappy)
    # sanity: outer joins actually produced preserved NULL rows
    fo = dict(zip(("n", "n_left", "n_right"), baseline["full_outer"][0]))
    assert fo["n"] > fo["n_right"] or fo["n"] > fo["n_left"]
    snappy.drop_table("cust_t")
    snappy.drop_table("ord_t")

    # layout 2: replicated dim × partitioned fact
    snappy.create_table("cust_t", provider="row", options={"replicate": "true"}, df=cust)
    snappy.create_table(
        "ord_t", options={"partition_by": "o_custkey", "buckets": "8"}, df=ords
    )
    assert _run_all(snappy) == baseline
    snappy.drop_table("cust_t")
    snappy.drop_table("ord_t")

    # layout 3: colocated — both bucketed on the join key
    snappy.create_table(
        "cust_t", options={"partition_by": "c_custkey", "buckets": "8"}, df=cust
    )
    snappy.create_table(
        "ord_t",
        options={
            "partition_by": "o_custkey",
            "buckets": "8",
            "colocate_with": "cust_t",
        },
        df=ords,
    )
    assert _run_all(snappy) == baseline
    snappy.drop_table("cust_t")
    snappy.drop_table("ord_t")

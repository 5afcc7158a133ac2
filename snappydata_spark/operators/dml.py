"""Mutation-operator correctness queries (PUT INTO / UPDATE / DELETE /
deleteFrom — SURVEY.md §2.8).

Each query builds a deterministic target+source from the testdata, applies
the pure mutation rewrite from snappydata_spark.mutate, and returns an
aggregate fingerprint of the mutated table; the oracle states the same
semantics in ANSI SQL.  This puts the reference's distinctive DML surface
(ColumnTableBulkOps.transformPutPlan:46-120, ColumnUpdateExec,
ColumnDeleteExec, SnappyImplicits deleteFrom:209-222) under the driver's
hash-compare gate without needing a mutable store in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from snappydata_spark import mutate
from snappydata_spark.operators.registry import register
from snappydata_spark.tables import load_tables


@register(
    "dml_put_into_upsert",
    oracle="""
WITH source AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
         o_orderdate, '9-RETOUCHED' AS o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 0),
merged AS (
  SELECT * FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = o.o_orderkey)
  UNION ALL
  SELECT * FROM source)
SELECT o_orderpriority, COUNT(*) AS cnt,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
FROM merged GROUP BY o_orderpriority
""",
)
def dml_put_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PUT INTO = update-matched + insert-unmatched on the key columns.

    The fingerprint SUM accumulates in decimal (×2 of a 2-decimal value
    is still an exact 2-decimal value in double, so the cast is
    lossless): double sums drifted a cent at the sf10 differential."""
    t = load_tables(spark, sf_dir, ("orders",))
    target = t["orders"]
    source = (
        target.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderpriority", F.lit("9-RETOUCHED"))
    )
    merged = mutate.put_into_df(target, source, keys=["o_orderkey"])
    return merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.expr(
            "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)"
            " AS DOUBLE) AS total"
        ),
    )


@register(
    "dml_update_where",
    oracle="""
WITH updated AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'O' AND o_totalprice < 5000
              THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders)
SELECT o_orderstatus, COUNT(*) AS cnt,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(15,3))), 2) AS DOUBLE) AS total
FROM updated GROUP BY o_orderstatus
""",
)
def dml_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE orders SET o_totalprice = o_totalprice * 1.1
       WHERE o_orderstatus = 'O' AND o_totalprice < 5000.

    The updated values are doubles approximating exact 3-decimal values
    (2-decimal money × 1.1); the mutation stays in double so each VALUE
    is IEEE-identical to the oracle's CASE expression, while the
    fingerprint SUM casts to DECIMAL(15,3) — both engines recover the
    same 3-decimal value from the same double, and decimal addition is
    order-independent (double sums drifted a cent at sf10)."""
    t = load_tables(spark, sf_dir, ("orders",))
    updated = mutate.update_df(
        t["orders"],
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 5000),
        {"o_totalprice": F.col("o_totalprice") * 1.1},
    )
    return updated.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.expr(
            "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(15,3))), 2)"
            " AS DOUBLE) AS total"
        ),
    )


@register(
    "dml_delete_where",
    oracle="""
SELECT l_returnflag, COUNT(*) AS cnt,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty
FROM lineitem
WHERE NOT (l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05)
GROUP BY l_returnflag
""",
)
def dml_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE FROM lineitem WHERE l_shipdate < '1996-01-01' AND
    l_discount > 0.05 — survivors aggregated."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    kept = mutate.delete_df(
        t["lineitem"],
        (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") > 0.05),
    )
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.expr(
            "CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2)"
            " AS DOUBLE) AS qty"
        ),
    )


@register(
    "dml_delete_from_keys",
    oracle="""
SELECT COUNT(*) AS remaining, COUNT(DISTINCT c_nationkey) AS nations
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_totalprice > 40000 AND o.o_custkey = c.c_custkey)
""",
)
def dml_delete_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.write.deleteFrom(customer): delete customers whose key appears
    in a high-value-orders DataFrame (key-join delete)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big_spenders = (
        t["orders"]
        .filter(F.col("o_totalprice") > 40000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    kept = mutate.delete_from_df(t["customer"], big_spenders, keys=["c_custkey"])
    return kept.agg(
        F.count(F.lit(1)).alias("remaining"),
        F.countDistinct("c_nationkey").alias("nations"),
    )


@register(
    "dml_merge_into",
    oracle="""
WITH src AS (
  SELECT o_orderkey AS k, o_totalprice * 0.5 AS price
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT -o_orderkey, 123.45 FROM orders WHERE o_orderkey % 1000 = 7),
kept AS (
  SELECT o.o_orderstatus,
         CASE WHEN s.k IS NOT NULL THEN s.price
              ELSE o.o_totalprice END AS o_totalprice
  FROM orders o LEFT JOIN src s ON o.o_orderkey = s.k
  WHERE s.k IS NULL OR s.price >= 10000),
merged AS (
  SELECT * FROM kept
  UNION ALL
  SELECT 'NEW', price FROM src s
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = s.k))
SELECT o_orderstatus, COUNT(*) AS cnt,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
           AS total
FROM merged GROUP BY o_orderstatus
""",
)
def dml_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO with all three clause kinds, first-match-wins:
    matched & half-price < 10000 → DELETE; matched else → UPDATE price;
    unmatched source keys → INSERT as status 'NEW'.  One full-outer join
    on the key (mutate.merge_df) — the ANSI composition of the
    reference's PUT INTO + deleteFrom (ColumnTableBulkOps.scala:46-120)."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    src = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") * 0.5).alias("price"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 1000 == 7).select(
                (-F.col("o_orderkey")).alias("k"),
                F.lit(123.45).alias("price"),
            )
        )
    )
    src.createOrReplaceTempView("merge_src_v")
    merged = mutate.merge_df(
        o,
        spark.table("merge_src_v"),
        "t.o_orderkey = s.k",
        matched=[
            ("delete", "s.price < 10000", None),
            ("update", None, {"o_totalprice": "s.price"}),
        ],
        not_matched_insert=(
            None,
            {
                "o_orderkey": "s.k",
                "o_orderstatus": "'NEW'",
                "o_totalprice": "s.price",
            },
        ),
    )
    # money sums through exact DECIMAL (order-independent — the fuzzer's
    # class-1 divergence surfaced here at sf0.1)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total"),
    )

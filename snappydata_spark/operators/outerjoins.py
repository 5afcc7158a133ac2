"""NorthWind-style join-shape corpus (SURVEY.md §2.3, §5).

The reference's main correctness net is the 56-query NorthWind suite run
across 4 table layouts with operator assertions (NWQueries.scala:380-700
join shapes Q40-Q54: inner/left/right/full with and without ON, left semi,
self joins, subqueries; NorthWindTest.scala:41-151 layout matrix).  This
module re-expresses those SHAPES over the driver's TPC-H-ish tables so
every one is DuckDB-hash-checked: outer joins that actually produce NULL
rows, ON-clause-vs-WHERE predicate placement, null-key joins, correlated
subqueries, COUNT(col)-vs-COUNT(*) over preserved nulls.

The layout matrix itself (replicated / partitioned / colocated) is covered
by tests/test_outerjoin_layouts.py through the SnappySession facade —
results here are layout-independent by construction, which is exactly what
that test asserts.

Scale notes: every query aggregates or tightly filters its output (hash
surface stays small at any SF); dims (nation/region) broadcast; the big
joins are equi-joins on the natural keys the tables would be bucketed on,
so at 100 TB they shuffle once on the join key — or not at all under the
colocated layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from snappydata_spark.operators.registry import register
from snappydata_spark.tables import load_tables


@register(
    "nw_left_join_missing",
    oracle="""
SELECT c_nationkey, COUNT(*) AS idle_customers
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
  ON c_custkey = o_custkey
WHERE o_orderkey IS NULL
GROUP BY c_nationkey
""",
)
def nw_left_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join with NULL probe (NWQueries Q51 shape + the classic
    customers-without-orders filter): preserved-side rows survive."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left")
        .filter(F.col("o_orderkey").isNull())
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("idle_customers"))
    )


@register(
    "nw_right_join_count_cols",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       COUNT(o_orderkey) AS n_orders,
       COUNT(*) - COUNT(o_orderkey) AS n_null_rows
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def nw_right_join_count_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right join (NWQueries Q52) + the COUNT(*) vs COUNT(col) null
    distinction over the preserved side."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"), "right")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
            (F.count(F.lit(1)) - F.count("o_orderkey")).alias("n_null_rows"),
        )
    )


@register(
    "nw_full_outer_presence",
    oracle="""
WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
     urgent AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'),
     j AS (SELECT c_custkey, o_custkey
           FROM rich FULL OUTER JOIN urgent ON c_custkey = o_custkey)
SELECT CASE WHEN c_custkey IS NULL THEN 'right_only'
            WHEN o_custkey IS NULL THEN 'left_only'
            ELSE 'both' END AS presence,
       COUNT(*) AS n,
       COUNT(COALESCE(c_custkey, o_custkey)) AS n_keys
FROM j GROUP BY 1
""",
)
def nw_full_outer_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (NWQueries Q53/Q54) between two filtered key sets
    that genuinely produce NULLs on both sides; COALESCE key recovery."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    rich = t["customer"].filter(F.col("c_acctbal") > 9000).select("c_custkey")
    urgent = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    j = rich.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
    presence = (
        F.when(F.col("c_custkey").isNull(), "right_only")
        .when(F.col("o_custkey").isNull(), "left_only")
        .otherwise("both")
    )
    return j.groupBy(presence.alias("presence")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.coalesce("c_custkey", "o_custkey")).alias("n_keys"),
    )


@register(
    "nw_left_semi",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
GROUP BY o_orderpriority
""",
)
def nw_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (NWQueries Q43): existence only, no row duplication
    from multiple matches."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    bulky = t["lineitem"].filter(F.col("l_quantity") >= 49)
    return (
        t["orders"]
        .join(bulky, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "nw_left_anti",
    oracle="""
SELECT c_nationkey, COUNT(*) AS n
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
GROUP BY c_nationkey
""",
)
def nw_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no finished order.  (o_custkey is
    non-null in this schema, so NOT IN and ANTI agree — the NULL-poisoned
    NOT IN variant is covered by nw_null_key_join.)"""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    finished = t["orders"].filter(F.col("o_orderstatus") == "F")
    return (
        t["customer"]
        .join(finished, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "nw_on_clause_vs_where",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       COUNT(o_orderkey) AS n_big_orders
FROM customer LEFT JOIN orders
  ON c_custkey = o_custkey AND o_totalprice > 200000
GROUP BY c_mktsegment
""",
)
def nw_on_clause_vs_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extra predicate in the ON clause of an outer join: customers whose
    orders are all ≤200k still appear (with NULL order) — the
    ON-vs-WHERE placement semantics NWQueries exercises via Q49_1/Q51_1
    post-filters."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_totalprice") > 200000
    )
    return (
        t["customer"]
        .join(t["orders"], cond, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_big_orders"),
        )
    )


@register(
    "nw_multi_outer_chain",
    oracle="""
SELECT n_name,
       COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       COUNT(*) AS n_rows
FROM nation
LEFT JOIN customer ON n_nationkey = c_nationkey
LEFT JOIN orders   ON c_custkey = o_custkey AND o_orderstatus = 'O'
GROUP BY n_name
""",
)
def nw_multi_outer_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained left joins (NWQueries Q38 6-way chain, outer flavor):
    NULLs introduced mid-chain must propagate, not drop rows."""
    t = load_tables(spark, sf_dir, ("nation", "customer", "orders"))
    open_orders = t["orders"].filter(F.col("o_orderstatus") == "O")
    return (
        F.broadcast(t["nation"])
        .join(t["customer"], F.col("n_nationkey") == F.col("c_nationkey"), "left")
        .join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "nw_self_join",
    oracle="""
SELECT a.o_orderpriority AS prio_a, b.o_orderpriority AS prio_b,
       COUNT(*) AS n_pairs
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
GROUP BY 1, 2
""",
)
def nw_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self join on a non-key column (the NW employee-manager shape):
    ordered pairs of same-customer orders by priority transition."""
    t = load_tables(spark, sf_dir, ("orders",))
    a = t["orders"].alias("a")
    b = t["orders"].alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .groupBy(
            F.col("a.o_orderpriority").alias("prio_a"),
            F.col("b.o_orderpriority").alias("prio_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "nw_exists_subquery",
    oracle="""
SELECT s_nationkey, COUNT(*) AS n
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R'
                AND l.l_quantity > 45)
GROUP BY s_nationkey
""",
)
def nw_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (NWQueries Q32-37 family) through the SQL path —
    Catalyst rewrites it to a left-semi join."""
    from snappydata_spark.tables import register_views

    register_views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(
        """
        SELECT s_nationkey, COUNT(*) AS n
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R'
                        AND l.l_quantity > 45)
        GROUP BY s_nationkey
        """
    )


@register(
    "nw_not_exists_subquery",
    oracle="""
SELECT p_brand, COUNT(*) AS n
FROM part p
WHERE p_size = 1
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
GROUP BY p_brand
""",
)
def nw_not_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → left-anti join rewrite."""
    from snappydata_spark.tables import register_views

    register_views(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n
        FROM part p
        WHERE p_size = 1
          AND NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey
                            AND l.l_quantity >= 49)
        GROUP BY p_brand
        """
    )


@register(
    "nw_scalar_subquery",
    oracle="""
SELECT c_nationkey, COUNT(*) AS n_above_avg
FROM customer c
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY c_nationkey
""",
)
def nw_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-nation average) — the NW
    above-average-price shape (NWQueries Q25-31 family)."""
    from snappydata_spark.tables import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS n_above_avg
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c_nationkey
        """
    )


@register(
    "nw_null_key_join",
    oracle="""
WITH c AS (SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END
             AS join_key, c_custkey
           FROM customer)
SELECT CASE WHEN join_key IS NULL THEN -1 ELSE n_nationkey END AS nation_key,
       COUNT(*) AS n,
       COUNT(n_name) AS n_matched
FROM c LEFT JOIN nation ON c.join_key = nation.n_nationkey
GROUP BY 1
""",
)
def nw_null_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL join keys never match (SQL equi-join semantics) but outer-join
    preserved rows keep them — the null-edge NWQueries' 4-layout matrix
    is designed to catch."""
    t = load_tables(spark, sf_dir, ("customer", "nation"))
    c = t["customer"].select(
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("join_key"),
        "c_custkey",
    )
    j = c.join(
        F.broadcast(t["nation"]), F.col("join_key") == F.col("n_nationkey"), "left"
    )
    return j.groupBy(
        F.when(F.col("join_key").isNull(), F.lit(-1))
        .otherwise(F.col("n_nationkey"))
        .alias("nation_key")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("n_name").alias("n_matched"),
    )


@register(
    "nw_case_over_join",
    oracle="""
SELECT CASE WHEN r_name IN ('AMERICA', 'EUROPE') THEN 'west'
            WHEN r_name = 'ASIA' THEN 'asia'
            ELSE 'other' END AS region_bucket,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1
""",
)
def nw_case_over_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-bucketed aggregate over a snowflake join (NWQueries Q55
    units-in-stock-by-continent shape); dims broadcast."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation", "region"))
    bucket = (
        F.when(F.col("r_name").isin("AMERICA", "EUROPE"), "west")
        .when(F.col("r_name") == "ASIA", "asia")
        .otherwise("other")
    )
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(bucket.alias("region_bucket"))
        .agg(
            # 3 buckets absorb the whole scaling orders table → decimal
            # accumulation (double sums drift a cent; sf10 catch class)
            F.expr(
                "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)"
                " AS DOUBLE) AS revenue"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "nw_cross_join",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
)
def nw_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (NWQueries Q44/Q45: join with no ON) —
    bounded to the two replicated dims."""
    t = load_tables(spark, sf_dir, ("region", "nation"))
    return t["region"].select("r_name").crossJoin(t["nation"].select("n_name"))


@register(
    "nw_full_outer_agg_nulls",
    oracle="""
WITH sold AS (SELECT l_partkey, CAST(SUM(l_quantity) AS BIGINT) AS qty_sold
              FROM lineitem WHERE l_quantity = 50 GROUP BY l_partkey),
     stocked AS (SELECT p_partkey, p_retailprice FROM part WHERE p_size > 47)
SELECT CASE WHEN p_partkey IS NULL THEN 'sold_only'
            WHEN l_partkey IS NULL THEN 'stocked_only'
            ELSE 'both' END AS side,
       COUNT(*) AS n,
       CAST(COALESCE(SUM(qty_sold), 0) AS BIGINT) AS total_qty,
       ROUND(COALESCE(SUM(p_retailprice), 0), 2) AS total_price
FROM sold FULL OUTER JOIN stocked ON l_partkey = p_partkey
GROUP BY 1
""",
)
def nw_full_outer_agg_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over a full outer join where SUM sees NULL groups on
    both sides (NWQueries Q48/Q49 + aggregation)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    sold = (
        t["lineitem"]
        .filter(F.col("l_quantity") == 50)
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty_sold"))
    )
    stocked = (
        t["part"].filter(F.col("p_size") > 47).select("p_partkey", "p_retailprice")
    )
    j = sold.join(stocked, F.col("l_partkey") == F.col("p_partkey"), "full_outer")
    side = (
        F.when(F.col("p_partkey").isNull(), "sold_only")
        .when(F.col("l_partkey").isNull(), "stocked_only")
        .otherwise("both")
    )
    return j.groupBy(side.alias("side")).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("qty_sold"), F.lit(0)).cast("long").alias("total_qty"),
        F.round(F.coalesce(F.sum("p_retailprice"), F.lit(0)), 2).alias("total_price"),
    )


@register(
    "nw_right_outer_having",
    oracle="""
SELECT n_name,
       COUNT(o_orderkey) AS big_orders,
       COUNT(*) AS joined_rows
FROM (SELECT * FROM orders WHERE o_totalprice > 250000) o
RIGHT OUTER JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING COUNT(o_orderkey) < 280
""",
)
def nw_right_outer_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER preserving all customers + HAVING over the outer-side
    count (COUNT(col) skips the null-extended rows, COUNT(*) does not —
    NWQueries right-join family with a post-aggregate filter)."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    big = t["orders"].filter(F.col("o_totalprice") > 250000)
    return (
        big.join(t["customer"], F.col("o_custkey") == F.col("c_custkey"), "right_outer")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("o_orderkey").alias("big_orders"),
            F.count(F.lit(1)).alias("joined_rows"),
        )
        .filter(F.col("big_orders") < 280)
    )


@register(
    "nw_outer_join_window",
    oracle="""
WITH rev AS (
  SELECT c_custkey, c_name, c_nationkey,
         ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS revenue
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey, c_name, c_nationkey),
r AS (
  SELECT c_nationkey, c_custkey, c_name, revenue,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY revenue DESC, c_custkey) AS rk
  FROM rev)
SELECT c_nationkey, c_custkey, c_name, revenue, rk
FROM r WHERE rk <= 3
""",
)
def nw_outer_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window over an outer-join aggregate: top-3 customers per nation by
    revenue where customers WITHOUT orders participate at revenue 0
    (outer-preserved rows must flow into the rank, not vanish)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, ("customer", "orders"))
    rev = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias("revenue"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("revenue").desc(), F.col("c_custkey")
    )
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_nationkey", "c_custkey", "c_name", "revenue", "rk")
    )


@register(
    "nw_on_clause_date_range",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS customers_rows,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS no_1997_order
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
  AND o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY c_mktsegment
""",
)
def nw_on_clause_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN date predicate in the ON clause of a left join: it must
    restrict only the null-supplying side, never drop preserved customer
    rows (the ON-vs-WHERE placement trap over a range predicate)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    cond = (F.col("c_custkey") == F.col("o_custkey")) & F.col("o_orderdate").between(
        "1997-01-01", "1997-12-31"
    )
    return (
        t["customer"]
        .join(t["orders"], cond, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customers_rows"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("no_1997_order"),
        )
    )


@register(
    "nw_three_way_null_chain",
    oracle="""
WITH j AS (
  SELECT c.c_nationkey, c.c_custkey, o.o_orderkey, l.l_orderkey AS has_line
  FROM customer c
  LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 350000) o
    ON c.c_custkey = o.o_custkey
  LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 49) l
    ON o.o_orderkey = l.l_orderkey)
SELECT c_nationkey,
       COUNT(DISTINCT c_custkey) AS customers,
       COUNT(o_orderkey) AS pricey_orders,
       COUNT(has_line) AS with_bulk_line
FROM j GROUP BY c_nationkey
""",
)
def nw_three_way_null_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained LEFT JOINs where null-extension cascades (customer without
    pricey order → NULL order → NULL line): COUNT(col) at each depth
    counts only the survivors of that depth (NWQueries multi-join family
    with preserved-null accounting)."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    pricey = t["orders"].filter(F.col("o_totalprice") > 350000)
    bulk = (
        t["lineitem"].filter(F.col("l_quantity") >= 49).select("l_orderkey").distinct()
    )
    j = (
        t["customer"]
        .join(pricey, F.col("c_custkey") == F.col("o_custkey"), "left")
        .join(bulk, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    )
    return j.groupBy("c_nationkey").agg(
        F.count_distinct(F.col("c_custkey")).alias("customers"),
        F.count("o_orderkey").alias("pricey_orders"),
        F.count("l_orderkey").alias("with_bulk_line"),
    )


@register(
    "nw_anti_or_predicate",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS quiet_customers
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND (o.o_totalprice > 400000 OR o.o_orderpriority = '1-URGENT'))
GROUP BY c_mktsegment
""",
)
def nw_anti_or_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS with a disjunctive correlated predicate → anti-join
    whose build side is an OR filter (the rewrite must not split the OR
    across join branches)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    noisy = t["orders"].filter(
        (F.col("o_totalprice") > 400000) | (F.col("o_orderpriority") == "1-URGENT")
    )
    return (
        t["customer"]
        .join(noisy, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("quiet_customers"))
    )


@register(
    "nw_coalesce_group_full",
    oracle="""
WITH a AS (SELECT o_orderpriority AS k, COUNT(*) AS n_open
           FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
     b AS (SELECT o_orderpriority AS k, COUNT(*) AS n_done
           FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
SELECT COALESCE(a.k, b.k) AS priority,
       CAST(COALESCE(n_open, 0) AS BIGINT) AS n_open,
       CAST(COALESCE(n_done, 0) AS BIGINT) AS n_done
FROM a FULL OUTER JOIN b ON a.k = b.k
""",
)
def nw_coalesce_group_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-outer merge-by-key idiom: two aggregates stitched on
    COALESCE(k1, k2) with zero-fill (NWQueries Q51-style two-sided
    comparison) — the grouping key itself may be null-extended on either
    side."""
    t = load_tables(spark, sf_dir, ("orders",))
    a = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_orderpriority").alias("ka"))
        .agg(F.count(F.lit(1)).alias("n_open"))
    )
    b = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_orderpriority").alias("kb"))
        .agg(F.count(F.lit(1)).alias("n_done"))
    )
    return (
        a.join(b, F.col("ka") == F.col("kb"), "full_outer")
        .select(
            F.coalesce(F.col("ka"), F.col("kb")).alias("priority"),
            F.coalesce(F.col("n_open"), F.lit(0)).cast("long").alias("n_open"),
            F.coalesce(F.col("n_done"), F.lit(0)).cast("long").alias("n_done"),
        )
    )


@register(
    "nw_in_subquery_agg",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n,
       ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 5000)
GROUP BY o_orderstatus
""",
)
def nw_in_subquery_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — semi-join rewrite with a selective inner set
    (NWQueries Q15-24 IN family)."""
    from snappydata_spark.tables import register_views

    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n,
               ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'MACHINERY'
                              AND c_acctbal > 5000)
        GROUP BY o_orderstatus
        """
    )

"""TPC-DS-shape query corpus adapted to the driver schema.

The reference runs Spark's full TPC-DS set (TPCDSQuerySnappyBenchmark.scala,
TPCDSSuite.scala:1-120); this module adapts the characteristic TPC-DS
*shapes* — multi-fact rollups, WITH + window + agg stacks, EXISTS chains
over 3+ tables, channel self-joins — to the TPC-H-ish driver schema.
Channels are modelled as lineitem slices (l_returnflag 'R' = the returns
fact, else the sales fact), matching how TPC-DS splits store_sales /
store_returns.

Determinism discipline (cross-engine hash compare):
- every threshold / ratio filter compares EXACT arithmetic — counts and
  sums of whole-number l_quantity doubles (< 2^53, order-independent) —
  so Spark's and DuckDB's different summation orders cannot flip a row in
  or out of the result;
- money sums (inexact doubles) appear only as ROUND(x, 2) output columns;
- every rank/top-k has a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from snappydata_spark.operators.registry import register
from snappydata_spark.tables import load_tables


def _oi(t):  # orders ⋈ lineitem on the fact key
    return t["lineitem"].join(
        t["orders"], F.col("o_orderkey") == F.col("l_orderkey")
    )


# ---------------------------------------------------------------------------
# Q1 shape: per-customer returns vs the nation average (correlated agg).
# ---------------------------------------------------------------------------
@register(
    "ds_returns_above_nation_avg",
    oracle="""
WITH ret AS (
  SELECT o.o_custkey AS custkey, SUM(l.l_quantity) AS ret_qty
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey)
SELECT c.c_custkey, ret.ret_qty
FROM ret
JOIN customer c ON c.c_custkey = ret.custkey
WHERE ret.ret_qty > 1.2 * (
  SELECT AVG(r2.ret_qty) FROM ret r2
  JOIN customer c2 ON c2.c_custkey = r2.custkey
  WHERE c2.c_nationkey = c.c_nationkey)
""",
)
def ds_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q1 shape (TPCDSSuite: 'q1'): customers returning >1.2x their
    nation's average.  The correlated scalar subquery becomes a tiny
    per-nation aggregate broadcast back — one shuffle on custkey, no
    window over the full fact."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    ret = (
        _oi(t)
        .filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum("l_quantity").alias("ret_qty"))
    )
    cust = t["customer"].select("c_custkey", "c_nationkey")
    per_cust = ret.join(F.broadcast(cust), F.col("c_custkey") == F.col("custkey"))
    nation_avg = per_cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("ret_qty").alias("nation_avg")
    )
    return (
        per_cust.join(F.broadcast(nation_avg), F.col("nk") == F.col("c_nationkey"))
        .filter(F.col("ret_qty") > 1.2 * F.col("nation_avg"))
        .select("c_custkey", "ret_qty")
    )


# ---------------------------------------------------------------------------
# Q2 shape: week-over-week ratio across two years (WITH + self-join).
# ---------------------------------------------------------------------------
@register(
    "ds_weekly_sales_yoy_ratio",
    oracle="""
WITH wk AS (
  SELECT YEAR(l_shipdate) AS yr, WEEK(l_shipdate) AS wk, SUM(l_quantity) AS qty
  FROM lineitem WHERE YEAR(l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2)
SELECT w1.wk AS wk, w1.qty AS qty_1995, w2.qty AS qty_1996,
       ROUND(w2.qty / w1.qty, 4) AS yoy_ratio
FROM wk w1 JOIN wk w2 ON w1.wk = w2.wk
WHERE w1.yr = 1995 AND w2.yr = 1996 AND w1.wk BETWEEN 2 AND 51
""",
)
def ds_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q2 shape: weekly volume CTE self-joined across years.
    Weeks 2-51 only — ISO weeks 52/53/1 straddle year boundaries.  The
    weekly aggregate is tiny (≤52 rows/yr at any SF) so the self-join
    broadcasts."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    wk = (
        t["lineitem"]
        .filter(F.year("l_shipdate").isin(1995, 1996))
        .groupBy(
            F.year("l_shipdate").alias("yr"),
            F.weekofyear("l_shipdate").alias("wk"),
        )
        .agg(F.sum("l_quantity").alias("qty"))
        .persist()
    )
    w1 = wk.filter(F.col("yr") == 1995).select(
        F.col("wk").alias("wk1"), F.col("qty").alias("qty_1995")
    )
    w2 = wk.filter(F.col("yr") == 1996).select(
        F.col("wk").alias("wk2"), F.col("qty").alias("qty_1996")
    )
    return (
        w1.join(F.broadcast(w2), F.col("wk1") == F.col("wk2"))
        .filter(F.col("wk1").between(2, 51))
        .select(
            F.col("wk1").alias("wk"),
            "qty_1995",
            "qty_1996",
            F.round(F.col("qty_1996") / F.col("qty_1995"), 4).alias("yoy_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Q4/Q11 shape: year-over-year growth compared across two channels
# (4-way self-join of one channel CTE).
# ---------------------------------------------------------------------------
@register(
    "ds_yoy_channel_growth",
    oracle="""
WITH ch AS (
  SELECT o.o_custkey AS custkey,
         CASE WHEN l.l_returnflag = 'R' THEN 'ret' ELSE 'sale' END AS channel,
         YEAR(o.o_orderdate) AS yr, SUM(l.l_quantity) AS qty
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE YEAR(o.o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3)
SELECT s96.custkey AS custkey,
       ROUND(s96.qty / s95.qty, 4) AS sale_growth,
       ROUND(r96.qty / r95.qty, 4) AS ret_growth
FROM ch s95
JOIN ch s96 ON s96.custkey = s95.custkey
JOIN ch r95 ON r95.custkey = s95.custkey
JOIN ch r96 ON r96.custkey = s95.custkey
WHERE s95.channel = 'sale' AND s95.yr = 1995
  AND s96.channel = 'sale' AND s96.yr = 1996
  AND r95.channel = 'ret'  AND r95.yr = 1995
  AND r96.channel = 'ret'  AND r96.yr = 1996
  AND s96.qty / s95.qty > r96.qty / r95.qty
""",
)
def ds_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q4/Q11 shape: customers whose sales-channel growth beats
    their returns-channel growth.  Instead of a 4-way shuffle self-join
    the per-(customer, channel, year) aggregate is pivoted with
    conditional sums — one shuffle on custkey total."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    # r13b (guide §2.3): channel is line-level but year is order-level,
    # so the per-(customer, channel, year) slices decompose into
    # per-ORDER channel sums sliced by the order's year.  Pre-aggregating
    # lineitem on l_orderkey (a) shrinks the join probe side ~4× and the
    # custkey exchange likewise, and (b) the groupBy(l_orderkey) exchange
    # already partitions by the join key, so the orderkey join reuses it.
    # Exact: integral quantities ⇒ exact double sums; a NULL per-order
    # channel sum (no lines in that channel) is skipped by the outer SUM
    # exactly as the absent rows were before.
    channel = F.when(F.col("l_returnflag") == "R", "ret").otherwise("sale")
    per_order = t["lineitem"].groupBy("l_orderkey").agg(
        F.sum(F.when(channel == "sale", F.col("l_quantity"))).alias("sale_q"),
        F.sum(F.when(channel == "ret", F.col("l_quantity"))).alias("ret_q"),
    )
    base = per_order.join(
        t["orders"].filter(F.year("o_orderdate").isin(1995, 1996)),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.year("o_orderdate").alias("yr"),
        "sale_q",
        "ret_q",
    )

    def _slice(col, yr):
        return F.sum(F.when(F.col("yr") == yr, F.col(col)))

    agg = base.groupBy("custkey").agg(
        _slice("sale_q", 1995).alias("s95"),
        _slice("sale_q", 1996).alias("s96"),
        _slice("ret_q", 1995).alias("r95"),
        _slice("ret_q", 1996).alias("r96"),
    )
    return (
        agg.filter(
            F.col("s95").isNotNull()
            & F.col("s96").isNotNull()
            & F.col("r95").isNotNull()
            & F.col("r96").isNotNull()
            & (F.col("s96") / F.col("s95") > F.col("r96") / F.col("r95"))
        )
        .select(
            "custkey",
            F.round(F.col("s96") / F.col("s95"), 4).alias("sale_growth"),
            F.round(F.col("r96") / F.col("r95"), 4).alias("ret_growth"),
        )
    )


# ---------------------------------------------------------------------------
# Q14/Q77 shape: multi-fact UNION ALL rolled up across channels.
# ---------------------------------------------------------------------------
@register(
    "ds_multi_fact_rollup",
    oracle="""
WITH facts AS (
  SELECT CASE WHEN l.l_returnflag = 'R' THEN 'return' ELSE 'sale' END AS channel,
         n.n_name AS nation, l.l_quantity AS qty
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE YEAR(o.o_orderdate) = 1995)
SELECT channel, nation, SUM(qty) AS qty, COUNT(*) AS cnt
FROM facts GROUP BY ROLLUP (channel, nation)
""",
)
def ds_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q14/Q77 shape: channel facts unified then ROLLUP'd to
    (channel, nation), (channel), and grand-total grains.  Dims broadcast;
    ROLLUP runs as Spark's native Expand + partial agg."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "nation"))
    facts = (
        _oi(t)
        .filter(F.year("o_orderdate") == 1995)
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.when(F.col("l_returnflag") == "R", "return")
            .otherwise("sale")
            .alias("channel"),
            F.col("n_name").alias("nation"),
            F.col("l_quantity").alias("qty"),
        )
    )
    # r13b (guide §2.3): pre-aggregate per (channel, nation) before the
    # ROLLUP so the ×3 Expand runs over the ~|2 × nations| cell frame
    # instead of the year-filtered fact (same proof as
    # ds_rollup_share_of_nation: integral quantities ⇒ exact double
    # sums, COUNT decomposes into SUM of partial counts, NULL-valued
    # keys group identically in both shapes).
    cells = facts.groupBy("channel", "nation").agg(
        F.sum("qty").alias("qty"), F.count(F.lit(1)).alias("cnt")
    )
    return cells.rollup("channel", "nation").agg(
        F.sum("qty").alias("qty"), F.sum("cnt").alias("cnt")
    )


# ---------------------------------------------------------------------------
# Q23 shape: frequent items x best customers (two HAVING CTEs -> semi joins).
# ---------------------------------------------------------------------------
@register(
    "ds_frequent_best_customer_sales",
    oracle="""
WITH freq AS (
  SELECT l_partkey FROM lineitem
  WHERE YEAR(l_shipdate) IN (1995, 1996)
  GROUP BY 1 HAVING COUNT(DISTINCT l_orderkey) > 10),
best AS (
  SELECT o.o_custkey FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1 HAVING SUM(l.l_quantity) > 1200)
SELECT YEAR(o.o_orderdate) AS yr, MONTH(o.o_orderdate) AS mo,
       SUM(l.l_quantity) AS qty
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_partkey IN (SELECT l_partkey FROM freq)
  AND o.o_custkey IN (SELECT o_custkey FROM best)
GROUP BY 1, 2
""",
)
def ds_q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q23 shape: monthly volume restricted to frequently-sold
    parts AND highest-volume customers.  Both qualifier sets are HAVING
    aggregates far smaller than the fact — broadcast left-semi joins, so
    the fact is scanned once per qualifier build and once for the final
    aggregate, never shuffled on a qualifier key."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    freq = (
        t["lineitem"]
        .filter(F.year("l_shipdate").isin(1995, 1996))
        .groupBy("l_partkey")
        .agg(F.count_distinct("l_orderkey").alias("n_ord"))
        .filter(F.col("n_ord") > 10)
        .select("l_partkey")
    )
    # r13b (guide §2.3): per-order pre-aggregation before the custkey
    # roll-up, exactly as in ds_net_sales_after_returns (integral
    # quantities ⇒ exact double sums ⇒ regrouping is bit-identical);
    # the qualifier join and custkey exchange carry one row per order.
    best = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("oqty"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("oqty").alias("tot_qty"))
        .filter(F.col("tot_qty") > 1200)
        .select("o_custkey")
    )
    return (
        _oi(t)
        .join(F.broadcast(freq), "l_partkey", "left_semi")
        .join(F.broadcast(best), "o_custkey", "left_semi")
        .groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )


# ---------------------------------------------------------------------------
# Q33/Q56 shape: per-brand volume across three date-range "channels".
# ---------------------------------------------------------------------------
@register(
    "ds_cross_channel_part_sum",
    oracle="""
WITH a AS (
  SELECT l_partkey, SUM(l_quantity) AS qty FROM lineitem
  WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1995-07-01' GROUP BY 1),
b AS (
  SELECT l_partkey, SUM(l_quantity) AS qty FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-07-01' GROUP BY 1),
c AS (
  SELECT l_partkey, SUM(l_quantity) AS qty FROM lineitem
  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-07-01' GROUP BY 1)
SELECT p.p_brand, SUM(u.qty) AS total_qty
FROM (SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c) u
JOIN part p ON p.p_partkey = u.l_partkey
GROUP BY 1
""",
)
def ds_q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q33/Q56 shape: three channel CTEs (disjoint date slices)
    unioned, re-aggregated by brand.  Spark plans one scan per slice with
    the shipdate predicate pushed to parquet row-groups; the brand dim
    broadcasts."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))

    def _slice(lo, hi):
        return (
            t["lineitem"]
            .filter(
                (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
            )
            .groupBy("l_partkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )

    u = (
        _slice("1995-01-01", "1995-07-01")
        .unionAll(_slice("1996-01-01", "1996-07-01"))
        .unionAll(_slice("1997-01-01", "1997-07-01"))
    )
    part = t["part"].select("p_partkey", "p_brand")
    return (
        u.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(F.sum("qty").alias("total_qty"))
    )


# ---------------------------------------------------------------------------
# Q38 shape: customers present in all three periods (INTERSECT chain).
# ---------------------------------------------------------------------------
@register(
    "ds_customers_in_all_periods",
    oracle="""
SELECT COUNT(*) AS n_customers FROM (
  SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
  INTERSECT
  SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
  INTERSECT
  SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1997) t
""",
)
def ds_q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q38 shape: INTERSECT across period slices, counted.  Spark
    plans INTERSECT as aggregate + left-semi — each slice reduces to its
    distinct custkeys before joining."""
    t = load_tables(spark, sf_dir, ("orders",))

    def _yr(y):
        return (
            t["orders"].filter(F.year("o_orderdate") == y).select("o_custkey")
        )

    common = _yr(1995).intersect(_yr(1996)).intersect(_yr(1997))
    return common.agg(F.count(F.lit(1)).alias("n_customers"))


# ---------------------------------------------------------------------------
# Q44 shape: best/worst performers aligned by rank (double window + join).
# ---------------------------------------------------------------------------
@register(
    "ds_top_bottom_parts",
    oracle="""
WITH perf AS (
  SELECT l_partkey, SUM(l_quantity) AS qty FROM lineitem GROUP BY 1),
ranked AS (
  SELECT l_partkey, qty,
         ROW_NUMBER() OVER (ORDER BY qty ASC,  l_partkey ASC) AS rnk_asc,
         ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey ASC) AS rnk_desc
  FROM perf)
SELECT b.rnk_desc AS rnk, pb.p_name AS best_part, pw.p_name AS worst_part
FROM ranked b
JOIN ranked w ON w.rnk_asc = b.rnk_desc
JOIN part pb ON pb.p_partkey = b.l_partkey
JOIN part pw ON pw.p_partkey = w.l_partkey
WHERE b.rnk_desc <= 10
""",
)
def ds_q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q44 shape: rank parts best-to-worst and worst-to-best,
    align rank i with rank i from the other end.  Each end is a
    distributed top-k first (TakeOrderedAndProject: per-partition top-10
    merged on the driver — never a global single-partition window over
    all parts); ROW_NUMBER then runs on the 10 surviving rows.
    Tie-broken by partkey so the hash is stable."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    perf = t["lineitem"].groupBy("l_partkey").agg(F.sum("l_quantity").alias("qty"))

    def _topk(*order):
        return (
            perf.orderBy(*order)
            .limit(10)
            .select(
                "l_partkey", F.row_number().over(W.orderBy(*order)).alias("rnk")
            )
        )

    best = _topk(F.col("qty").desc(), F.col("l_partkey").asc()).select(
        "rnk", F.col("l_partkey").alias("best_key")
    )
    worst = _topk(F.col("qty").asc(), F.col("l_partkey").asc()).select(
        F.col("rnk").alias("w_rnk"), F.col("l_partkey").alias("worst_key")
    )
    pname = t["part"].select("p_partkey", "p_name")
    return (
        best.join(F.broadcast(worst), F.col("rnk") == F.col("w_rnk"))
        .join(
            F.broadcast(pname.withColumnRenamed("p_name", "best_part")),
            F.col("p_partkey") == F.col("best_key"),
        )
        .drop("p_partkey")
        .join(
            F.broadcast(pname.withColumnRenamed("p_name", "worst_part")),
            F.col("p_partkey") == F.col("worst_key"),
        )
        .select("rnk", "best_part", "worst_part")
    )


# ---------------------------------------------------------------------------
# Q47/Q57 shape: monthly volume vs the brand-year average (WITH+window+agg).
# ---------------------------------------------------------------------------
@register(
    "ds_monthly_deviation",
    oracle="""
WITH m AS (
  SELECT p.p_brand AS brand, YEAR(l.l_shipdate) AS yr, MONTH(l.l_shipdate) AS mo,
         SUM(l.l_quantity) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE YEAR(l.l_shipdate) BETWEEN 1995 AND 1997
  GROUP BY 1, 2, 3),
w AS (
  SELECT brand, yr, mo, qty, AVG(qty) OVER (PARTITION BY brand, yr) AS avg_qty
  FROM m)
SELECT brand, yr, mo, qty, ROUND(avg_qty, 2) AS avg_qty,
       ROUND(qty / avg_qty, 4) AS ratio
FROM w WHERE qty > 1.3 * avg_qty
""",
)
def ds_q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47/Q57 shape: aggregate CTE, window average over a coarser
    grain, deviation filter.  The window partitions by (brand, yr) over
    the monthly panel (25 brands x 3 yrs x 12 mo — bounded at any SF)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    m = (
        t["lineitem"]
        .filter(F.year("l_shipdate").between(1995, 1997))
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mo"),
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = m.withColumn("avg_qty", F.avg("qty").over(W.partitionBy("brand", "yr")))
    return w.filter(F.col("qty") > 1.3 * F.col("avg_qty")).select(
        "brand",
        "yr",
        "mo",
        "qty",
        F.round("avg_qty", 2).alias("avg_qty"),
        F.round(F.col("qty") / F.col("avg_qty"), 4).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# Q51 shape: cumulative channel totals full-outer-joined by month.
# ---------------------------------------------------------------------------
@register(
    "ds_cumulative_channel_compare",
    oracle="""
WITH s AS (
  SELECT DATE_TRUNC('month', l_shipdate) AS mo, SUM(l_quantity) AS qty
  FROM lineitem WHERE l_returnflag <> 'R' GROUP BY 1),
r AS (
  SELECT DATE_TRUNC('month', l_shipdate) AS mo, SUM(l_quantity) AS qty
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
cs AS (SELECT mo, SUM(qty) OVER (ORDER BY mo) AS cum FROM s),
cr AS (SELECT mo, SUM(qty) OVER (ORDER BY mo) AS cum FROM r)
SELECT COALESCE(cs.mo, cr.mo) AS mo, cs.cum AS sales_cum, cr.cum AS returns_cum
FROM cs FULL OUTER JOIN cr ON cs.mo = cr.mo
WHERE cr.cum * 3 > cs.cum
""",
)
def ds_q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 shape: per-channel cumulative sums full-outer-joined on
    the time grain.  The running sum windows over the monthly panel
    (calendar-bounded ~83 rows, the documented panel-window pattern), not
    the raw fact."""
    t = load_tables(spark, sf_dir, ("lineitem",))

    def _chan(pred):
        return (
            t["lineitem"]
            .filter(pred)
            .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("mo"))
            .agg(F.sum("l_quantity").alias("qty"))
            .withColumn(
                "cum",
                F.sum("qty").over(
                    W.orderBy("mo").rowsBetween(W.unboundedPreceding, 0)
                ),
            )
            .drop("qty")
        )

    cs = _chan(F.col("l_returnflag") != "R").withColumnsRenamed(
        {"mo": "s_mo", "cum": "sales_cum"}
    )
    cr = _chan(F.col("l_returnflag") == "R").withColumnsRenamed(
        {"mo": "r_mo", "cum": "returns_cum"}
    )
    return (
        cs.join(cr, F.col("s_mo") == F.col("r_mo"), "full_outer")
        .filter(F.col("returns_cum") * 3 > F.col("sales_cum"))
        .select(
            F.coalesce("s_mo", "r_mo").alias("mo"), "sales_cum", "returns_cum"
        )
    )


# ---------------------------------------------------------------------------
# Q10/Q35 shape: EXISTS chain over 3+ tables, demographic rollup.
# ---------------------------------------------------------------------------
@register(
    "ds_exists_chain_customers",
    oracle="""
SELECT n.n_name AS nation, COUNT(*) AS n_customers
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND YEAR(o.o_orderdate) = 1995)
  AND EXISTS (
    SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_custkey = c.c_custkey AND l.l_quantity >= 45)
  AND NOT EXISTS (
    SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
      AND l.l_quantity >= 48)
GROUP BY 1
""",
)
def ds_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q10/Q35 shape: EXISTS + EXISTS + NOT EXISTS chained over
    customer->orders->lineitem, rolled up by nation.  Each qualifier is a
    distinct-custkey set (<= |customer|) built from a pushed-down fact
    slice, applied as broadcast semi/anti joins."""
    t = load_tables(spark, sf_dir, ("customer", "nation", "orders", "lineitem"))
    oi = _oi(t)
    q1 = (
        t["orders"]
        .filter(F.year("o_orderdate") == 1995)
        .select("o_custkey")
        .distinct()
    )
    q2 = oi.filter(F.col("l_quantity") >= 45).select("o_custkey").distinct()
    q3 = (
        oi.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 48))
        .select("o_custkey")
        .distinct()
    )
    return (
        t["customer"]
        .join(F.broadcast(q1), F.col("c_custkey") == q1["o_custkey"], "left_semi")
        .join(F.broadcast(q2), F.col("c_custkey") == q2["o_custkey"], "left_semi")
        .join(F.broadcast(q3), F.col("c_custkey") == q3["o_custkey"], "left_anti")
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Q54 shape: customers bucketed by lifetime volume (CASE histogram).
# ---------------------------------------------------------------------------
@register(
    "ds_spend_bucket_histogram",
    oracle="""
WITH spend AS (
  SELECT o.o_custkey, COUNT(DISTINCT o.o_orderkey) AS n_orders,
         SUM(l.l_quantity) AS qty
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1)
SELECT CASE WHEN qty < 800 THEN 'low' WHEN qty < 1200 THEN 'mid'
            ELSE 'high' END AS bucket,
       COUNT(*) AS n_customers, CAST(SUM(n_orders) AS BIGINT) AS n_orders
FROM spend GROUP BY 1
""",
)
def ds_q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q54 shape: per-customer lifetime aggregate re-bucketed into
    a histogram.  Two aggregates, the second over |customer| rows."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    # r13b (guide §2.3): same per-order pre-aggregation as
    # ds_net_sales_after_returns — COUNT(DISTINCT o_orderkey) per
    # customer is exactly the number of per-order rows surviving the
    # inner join (orderkey → custkey is functional and TPC-H keys are
    # non-null), and the qty sum decomposes exactly (integral
    # quantities, all partials « 2^53).  The expensive distinct-expand
    # over the joined fact disappears; the join and the custkey
    # exchange carry one row per ORDER instead of per line.
    per_order = (
        t["lineitem"].groupBy("l_orderkey").agg(F.sum("l_quantity").alias("oqty"))
    )
    spend = (
        per_order.join(
            t["orders"], F.col("o_orderkey") == F.col("l_orderkey")
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("oqty").alias("qty"),
        )
    )
    bucket = (
        F.when(F.col("qty") < 800, "low")
        .when(F.col("qty") < 1200, "mid")
        .otherwise("high")
    )
    return spend.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("n_orders").alias("n_orders")
    )


# ---------------------------------------------------------------------------
# Q59 shape: weekday activity matrix year-over-year per nation.
# ---------------------------------------------------------------------------
@register(
    "ds_weekday_yoy_matrix",
    oracle="""
WITH d AS (
  SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS yr,
         COUNT(CASE WHEN ISODOW(o.o_orderdate) IN (1,2,3,4,5) THEN 1 END) AS wkday,
         COUNT(CASE WHEN ISODOW(o.o_orderdate) IN (6,7) THEN 1 END) AS wkend
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE YEAR(o.o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2)
SELECT a.nation AS nation,
       ROUND(CAST(b.wkday AS DOUBLE) / a.wkday, 4) AS wkday_ratio,
       ROUND(CAST(b.wkend AS DOUBLE) / a.wkend, 4) AS wkend_ratio
FROM d a JOIN d b ON a.nation = b.nation
WHERE a.yr = 1995 AND b.yr = 1996 AND a.wkday > 0 AND a.wkend > 0
""",
)
def ds_q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q59 shape: day-of-week conditional-count matrix self-joined
    across years.  Spark's weekday() is Mon=0, so weekday()+1 == DuckDB's
    ISODOW; the per-(nation, yr) matrix is tiny so the self-join
    broadcasts."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    isodow = F.weekday("o_orderdate") + 1
    d = (
        t["orders"]
        .filter(F.year("o_orderdate").isin(1995, 1996))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.when(isodow.isin(1, 2, 3, 4, 5), 1)).alias("wkday"),
            F.count(F.when(isodow.isin(6, 7), 1)).alias("wkend"),
        )
        .persist()
    )
    a = d.filter(F.col("yr") == 1995).select(
        "nation", F.col("wkday").alias("wkday95"), F.col("wkend").alias("wkend95")
    )
    b = d.filter(F.col("yr") == 1996).select(
        F.col("nation").alias("nation_b"),
        F.col("wkday").alias("wkday96"),
        F.col("wkend").alias("wkend96"),
    )
    return (
        a.join(F.broadcast(b), F.col("nation") == F.col("nation_b"))
        .filter((F.col("wkday95") > 0) & (F.col("wkend95") > 0))
        .select(
            "nation",
            F.round(F.col("wkday96").cast("double") / F.col("wkday95"), 4).alias(
                "wkday_ratio"
            ),
            F.round(F.col("wkend96").cast("double") / F.col("wkend95"), 4).alias(
                "wkend_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q75 shape: year-over-year declining brands across unified channels.
# ---------------------------------------------------------------------------
@register(
    "ds_declining_brands",
    oracle="""
WITH y AS (
  SELECT p.p_brand AS brand, YEAR(l.l_shipdate) AS yr,
         SUM(l.l_quantity) AS qty, COUNT(*) AS cnt
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE YEAR(l.l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2)
SELECT c.brand AS brand, p.qty AS qty_prev, c.qty AS qty_curr,
       ROUND(c.qty / p.qty, 4) AS ratio
FROM y p JOIN y c ON p.brand = c.brand
WHERE p.yr = 1995 AND c.yr = 1996 AND c.qty < p.qty
""",
)
def ds_q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q75 shape: prev-year/curr-year self-join on the brand
    aggregate, keeping declining brands.  The per-(brand, yr) aggregate is
    25x2 rows — broadcast self-join."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    y = (
        t["lineitem"]
        .filter(F.year("l_shipdate").isin(1995, 1996))
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"), F.year("l_shipdate").alias("yr"))
        .agg(F.sum("l_quantity").alias("qty"))
        .persist()
    )
    prev = y.filter(F.col("yr") == 1995).select(
        F.col("brand").alias("brand_p"), F.col("qty").alias("qty_prev")
    )
    curr = y.filter(F.col("yr") == 1996).select(
        F.col("brand"), F.col("qty").alias("qty_curr")
    )
    return (
        curr.join(F.broadcast(prev), F.col("brand") == F.col("brand_p"))
        .filter(F.col("qty_curr") < F.col("qty_prev"))
        .select(
            "brand",
            "qty_prev",
            "qty_curr",
            F.round(F.col("qty_curr") / F.col("qty_prev"), 4).alias("ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Q93 shape: net volume after returns per customer.
# ---------------------------------------------------------------------------
@register(
    "ds_net_sales_after_returns",
    oracle="""
SELECT o.o_custkey AS custkey,
       SUM(CASE WHEN l.l_returnflag = 'R' THEN -l.l_quantity
                ELSE l.l_quantity END) AS net_qty
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
HAVING SUM(CASE WHEN l.l_returnflag = 'R' THEN -l.l_quantity
                ELSE l.l_quantity END) > 500
""",
)
def ds_q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q93 shape: sales net of returns folded into one conditional
    sum (instead of joining a separate returns fact), HAVING-filtered.
    One shuffle on custkey."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    net = F.sum(
        F.when(F.col("l_returnflag") == "R", -F.col("l_quantity")).otherwise(
            F.col("l_quantity")
        )
    )
    # r13b (guide §2.3 — aggregate before you shuffle): each orderkey
    # belongs to exactly one custkey, so the custkey sum decomposes into
    # per-ORDER nets summed per customer.  Pre-aggregating lineitem on
    # its own key shrinks the join's probe side ~4× (one row per order
    # instead of per line) and the custkey exchange likewise.  Exact:
    # l_quantity is integral (TPC-H quantity ∈ 1..50) and every partial
    # stays far below 2^53, so all double additions are exact integer
    # arithmetic — regrouping cannot change a bit.
    per_order = (
        t["lineitem"].groupBy("l_orderkey").agg(net.alias("order_net"))
    )
    return (
        per_order.join(
            t["orders"], F.col("o_orderkey") == F.col("l_orderkey")
        )
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum("order_net").alias("net_qty"))
        .filter(F.col("net_qty") > 500)
    )


# ---------------------------------------------------------------------------
# Q88 shape: one-row multi-band activity matrix (8 conditional counts).
# ---------------------------------------------------------------------------
@register(
    "ds_time_slot_counts",
    oracle="""
SELECT COUNT(CASE WHEN HOUR(ts) BETWEEN 0 AND 2 THEN 1 END) AS h0,
       COUNT(CASE WHEN HOUR(ts) BETWEEN 3 AND 5 THEN 1 END) AS h3,
       COUNT(CASE WHEN HOUR(ts) BETWEEN 6 AND 8 THEN 1 END) AS h6,
       COUNT(CASE WHEN HOUR(ts) BETWEEN 9 AND 11 THEN 1 END) AS h9,
       COUNT(CASE WHEN HOUR(ts) BETWEEN 12 AND 14 THEN 1 END) AS h12,
       COUNT(CASE WHEN HOUR(ts) BETWEEN 15 AND 17 THEN 1 END) AS h15,
       COUNT(CASE WHEN HOUR(ts) BETWEEN 18 AND 20 THEN 1 END) AS h18,
       COUNT(CASE WHEN HOUR(ts) BETWEEN 21 AND 23 THEN 1 END) AS h21
FROM events WHERE event_type = 'click'
""",
)
def ds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape: the reference SQL runs 8 scalar subqueries (one
    scan each); folded here into ONE conditional-count pass — 1 scan + a
    single global aggregate instead of 8."""
    t = load_tables(spark, sf_dir, ("events",))

    def slot(lo):
        return F.count(
            F.when(F.hour("ts").between(lo, lo + 2), 1)
        ).alias(f"h{lo}")

    return (
        t["events"]
        .filter(F.col("event_type") == "click")
        .agg(*[slot(lo) for lo in range(0, 24, 3)])
    )


# ---------------------------------------------------------------------------
# Q66 shape: per-nation 12-month volume matrix (conditional agg columns).
# ---------------------------------------------------------------------------
_MONTH_COLS_SQL = ",\n       ".join(
    f"SUM(CASE WHEN MONTH(o.o_orderdate) = {m} THEN l.l_quantity END) AS m{m:02d}"
    for m in range(1, 13)
)


@register(
    "ds_month_channel_matrix",
    oracle=f"""
SELECT n.n_name AS nation,
       {_MONTH_COLS_SQL}
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE YEAR(o.o_orderdate) = 1995
GROUP BY 1
""",
)
def ds_q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q66 shape: wide month-matrix rollup — 12 conditional sums
    in one aggregate pass over the fact, dims broadcast."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "nation"))
    return (
        _oi(t)
        .filter(F.year("o_orderdate") == 1995)
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            *[
                F.sum(
                    F.when(F.month("o_orderdate") == m, F.col("l_quantity"))
                ).alias(f"m{m:02d}")
                for m in range(1, 13)
            ]
        )
    )


# ---------------------------------------------------------------------------
# Q49 shape: top return-ratio parts ranked within each period, unioned.
# ---------------------------------------------------------------------------
@register(
    "ds_ranked_returns_ratio",
    oracle="""
WITH r AS (
  SELECT YEAR(l_shipdate) AS yr, l_partkey,
         SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS ret,
         SUM(l_quantity) AS tot
  FROM lineitem WHERE YEAR(l_shipdate) IN (1995, 1996, 1997)
  GROUP BY 1, 2 HAVING SUM(l_quantity) > 0),
rk AS (
  SELECT yr, l_partkey, ROUND(ret / tot, 4) AS ratio,
         ROW_NUMBER() OVER (PARTITION BY yr
                            ORDER BY ret / tot DESC, l_partkey) AS rnk
  FROM r)
SELECT yr, l_partkey, ratio, rnk FROM rk WHERE rnk <= 10
""",
)
def ds_q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q49 shape: per-channel (year) return-ratio ranking, top-10
    each, unioned.  The window runs on the per-(year, part) aggregate
    partitioned by year; ret/tot are exact whole-double sums so the rank
    order is engine-stable, partkey tie-broken."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    r = (
        t["lineitem"]
        .filter(F.year("l_shipdate").isin(1995, 1996, 1997))
        .groupBy(F.year("l_shipdate").alias("yr"), F.col("l_partkey"))
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(
                    F.lit(0.0)
                )
            ).alias("ret"),
            F.sum("l_quantity").alias("tot"),
        )
        .filter(F.col("tot") > 0)
    )
    w = W.partitionBy("yr").orderBy(
        (F.col("ret") / F.col("tot")).desc(), F.col("l_partkey").asc()
    )
    return (
        r.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "yr",
            "l_partkey",
            F.round(F.col("ret") / F.col("tot"), 4).alias("ratio"),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# Q34/Q73 shape: customers inside an order-frequency band.
# ---------------------------------------------------------------------------
@register(
    "ds_frequency_band_customers",
    oracle="""
WITH freq AS (
  SELECT o_custkey, COUNT(*) AS n_orders
  FROM orders WHERE YEAR(o_orderdate) BETWEEN 1995 AND 1997
  GROUP BY 1 HAVING COUNT(*) BETWEEN 8 AND 12)
SELECT n.n_name AS nation, COUNT(*) AS n_customers,
       CAST(SUM(f.n_orders) AS BIGINT) AS n_orders
FROM freq f
JOIN customer c ON c.c_custkey = f.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1
""",
)
def ds_q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34/Q73 shape: frequency-band qualifier (HAVING BETWEEN)
    joined back to the customer dim and rolled up by nation."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    freq = (
        t["orders"]
        .filter(F.year("o_orderdate").between(1995, 1997))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders").between(8, 12))
    )
    return (
        freq.join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Q38/Q87 shape: INTERSECT of per-channel customer sets.
# ---------------------------------------------------------------------------
@register(
    "ds_intersect_channel_customers",
    oracle="""
WITH ret AS (
  SELECT DISTINCT o.o_custkey FROM orders o
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R' AND l.l_quantity >= 30),
sal AS (
  SELECT DISTINCT o.o_custkey FROM orders o
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag <> 'R' AND l.l_quantity >= 30),
both_ch AS (SELECT o_custkey FROM ret INTERSECT SELECT o_custkey FROM sal)
SELECT n.n_name, COUNT(*) AS n_customers
FROM both_ch b JOIN customer c ON c.c_custkey = b.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
""",
)
def ds_intersect_channel_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q38/q87 shape: customers present in BOTH channels (returns
    fact INTERSECT sales fact, high-quantity lines only), rolled up per
    nation.  INTERSECT plans as a distinct + left-semi pair; both inputs
    are already distinct projections of the same join, so the set op
    shuffles only (custkey) — the dimension joins broadcast."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem", "customer", "nation"))
    base = _oi(t).filter(F.col("l_quantity") >= 30)
    ret = base.filter(F.col("l_returnflag") == "R").select("o_custkey").distinct()
    sal = base.filter(F.col("l_returnflag") != "R").select("o_custkey").distinct()
    both = ret.intersect(sal)
    return (
        both.join(
            F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey")
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Q36 shape: ROLLUP with share-of-parent via NULL-level self-join.
# ---------------------------------------------------------------------------
@register(
    "ds_rollup_share_of_nation",
    oracle="""
WITH rev AS (
  SELECT n.n_name, EXTRACT(YEAR FROM o.o_orderdate) AS y,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY ROLLUP(n.n_name, EXTRACT(YEAR FROM o.o_orderdate)))
SELECT d.n_name, CAST(d.y AS BIGINT) AS y, d.qty,
       ROUND(d.qty::DOUBLE / p.qty, 6) AS share_of_nation
FROM rev d JOIN rev p
  ON d.n_name = p.n_name AND p.y IS NULL AND d.y IS NOT NULL
WHERE d.n_name IS NOT NULL
""",
)
def ds_rollup_share_of_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q36 shape: ROLLUP(nation, year) with each leaf row's share
    of its parent level, computed by self-joining the rollup on the
    NULL-marked parent rows (portable across engines without GROUPING_ID
    semantics differences).  Shares are ratios of exact integer quantity
    sums — order-independent, so ROUND(.,6) hashes identically.  The
    rollup is one pass (Spark expands grouping sets map-side); the
    parent join is |nations|-sized and broadcasts."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem", "customer", "nation"))
    # r13b (guide §2.3/§2.4): two fixes to one pipeline.
    # (a) ROLLUP physically Expands every input row ×3 (one copy per
    #     grouping set) before the partial aggregate; SUM of longs is
    #     associative, so pre-aggregate per (nation, year) first — the
    #     Expand then runs over the ~|nations × years| cell frame, not
    #     the full joined fact (NULL-valued keys group identically in
    #     both shapes, so the rollup's cells are unchanged).
    # (b) rev is consumed by BOTH branches of the returned plan (d leaf
    #     rows and p parent rows) — unpersisted, each branch re-ran the
    #     whole join+rollup pipeline.  Persist the ~200-row rollup
    #     (repo persist rule: consumed-by-returned-plan, see
    #     OPTIMIZATION_r13.md §8): the fact pipeline now runs once.
    rev = (
        _oi(t)
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            "n_name",
            F.year("o_orderdate").alias("y"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("n_name", "y")
        .agg(F.sum("q").alias("q"))
        .rollup("n_name", "y")
        .agg(F.sum("q").alias("qty"))
        .persist()
    )
    d = rev.filter(F.col("n_name").isNotNull() & F.col("y").isNotNull()).select(
        "n_name", F.col("y").cast("long").alias("y"), "qty"
    )
    p = rev.filter(F.col("n_name").isNotNull() & F.col("y").isNull()).select(
        F.col("n_name").alias("p_name"), F.col("qty").alias("p_qty")
    )
    return d.join(F.broadcast(p), F.col("n_name") == F.col("p_name")).select(
        "n_name",
        "y",
        "qty",
        F.round(F.col("qty").cast("double") / F.col("p_qty"), 6).alias(
            "share_of_nation"
        ),
    )


# ---------------------------------------------------------------------------
# "Mover" shape: customers with strictly increasing consecutive quarters.
# ---------------------------------------------------------------------------
@register(
    "ds_consecutive_growth_customers",
    oracle="""
WITH q AS (
  SELECT o_custkey,
         CAST(EXTRACT(YEAR FROM o_orderdate) * 4
              + (EXTRACT(MONTH FROM o_orderdate) - 1) // 3 AS BIGINT) AS idx,
         COUNT(*) AS c
  FROM orders GROUP BY o_custkey, idx),
w AS (
  SELECT o_custkey, idx, c,
         LAG(idx, 1) OVER (PARTITION BY o_custkey ORDER BY idx) AS i1,
         LAG(c, 1)  OVER (PARTITION BY o_custkey ORDER BY idx) AS c1,
         LAG(idx, 2) OVER (PARTITION BY o_custkey ORDER BY idx) AS i2,
         LAG(c, 2)  OVER (PARTITION BY o_custkey ORDER BY idx) AS c2
  FROM q)
SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM w
WHERE i1 = idx - 1 AND i2 = idx - 2 AND c > c1 AND c1 > c2
GROUP BY o_custkey
""",
)
def ds_consecutive_growth_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS 'mover' shape: customers whose per-quarter order count
    strictly grew across 3 CONSECUTIVE quarters (gaps disqualify — the
    lag row must be exactly the previous quarter index), with the number
    of such streaks per customer.  One shuffle for the (customer,
    quarter) aggregate; the lag window rides the same key.  All
    comparisons are exact integer counts — no float in the filter."""
    t = load_tables(spark, sf_dir, ("orders",))
    q = (
        t["orders"]
        .groupBy(
            "o_custkey",
            (
                F.year("o_orderdate") * 4
                + F.floor((F.month("o_orderdate") - 1) / 3)
            )
            .cast("long")
            .alias("idx"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.partitionBy("o_custkey").orderBy("idx")
    lagged = q.select(
        "o_custkey",
        "idx",
        "c",
        F.lag("idx", 1).over(w).alias("i1"),
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("idx", 2).over(w).alias("i2"),
        F.lag("c", 2).over(w).alias("c2"),
    )
    return (
        lagged.filter(
            (F.col("i1") == F.col("idx") - 1)
            & (F.col("i2") == F.col("idx") - 2)
            & (F.col("c") > F.col("c1"))
            & (F.col("c1") > F.col("c2"))
        )
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_streaks"))
    )

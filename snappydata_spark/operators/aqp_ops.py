"""AQP operator queries (SURVEY.md §1.1 sample tables / TopK rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from snappydata_spark import aqp
from snappydata_spark.operators.registry import register
from snappydata_spark.tables import load_tables


@register(
    "aqp_topk_time_window",
    oracle="""
WITH bucketed AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS cnt
  FROM events GROUP BY window_start, event_type),
ranked AS (
  SELECT window_start, event_type, cnt,
         ROW_NUMBER() OVER (PARTITION BY window_start
                            ORDER BY cnt DESC, event_type) AS rank
  FROM bucketed)
SELECT window_start, event_type, cnt, rank FROM ranked WHERE rank <= 3
""",
)
def aqp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queryApproxTSTopK shape (SnappySession:2162-2167): top-3 event
    types per hourly window."""
    t = load_tables(spark, sf_dir, ("events",))
    return aqp.approx_topk_time(t["events"], "event_type", "ts", k=3, window="1 hour")


@register("aqp_sample_estimate_with_error")
def aqp_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH ERROR estimate: revenue per returnflag from a 10% stratified
    sample, with closed-form 95% bounds.  Rows-only check (sampling RNG is
    engine-specific); the statistical contract is pytest-verified
    (tests/test_aqp.py: true value within bounds)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    st = aqp.create_sample_table(t["lineitem"], ["l_returnflag"], 0.1)
    return aqp.approx_agg(st, ["l_returnflag"], "l_extendedprice", "sum")


@register("aqp_hll_union_daily")
def aqp_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (the scale path for the
    reference's approx-distinct surface): build one Datasketches HLL
    sketch of user_id per (day, event_type) partial, then hll_union_agg
    the partials up to per-day totals — the re-aggregation is
    sketch-merge only, never touching raw rows again.  At 100 TB this is
    the difference between one pass and N passes for rollup hierarchies.
    Rows-only check (sketch estimates are engine-specific); accuracy vs
    exact distinct is pytest-asserted within 5% (tests/test_aqp.py)."""
    t = load_tables(spark, sf_dir, ("events",))
    partials = (
        t["events"]
        .groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            "event_type",
        )
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    return (
        partials.groupBy("day")
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_union_agg("sk")), 0)
            .cast("long")
            .alias("approx_users")
        )
        .orderBy("day")
    )

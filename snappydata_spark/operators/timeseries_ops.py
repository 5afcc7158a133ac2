"""As-of / range join queries over the events table (snappydata_spark.
timeseries).  The reference lacks these operators (SURVEY.md §2.3 "Range/
as-of joins: not implemented"); its TAQ trades/quotes benchmark
(TAQTest.scala) is the shape asof_join serves.

DuckDB oracles use native ASOF JOIN / inequality joins, so the hash
compare proves the union+window and bucket-refine plans implement the
exact textbook semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from snappydata_spark import timeseries
from snappydata_spark.operators.registry import register
from snappydata_spark.tables import load_tables


@register(
    "ts_asof_click_to_view",
    oracle="""
WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
     views AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
SELECT c.event_id AS click_id, c.user_id,
       v.event_id AS view_id,
       CAST(date_diff('second', v.ts, c.ts) AS BIGINT) AS lag_sec
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts
""",
)
def ts_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click attaches the latest view of the
    same user at-or-before it (the trades→quotes TAQ shape).  One
    shuffle on user_id, window scan, no candidate-pair blow-up."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    joined = timeseries.asof_join(
        clicks, views, on="ts", by=("user_id",),
        right_cols={"event_id": "view_id", "ts": "view_ts"},
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "view_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("view_ts")).alias("lag_sec"),
    )


@register(
    "ts_range_join_error_clicks",
    oracle="""
WITH errs AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT e.event_id, e.user_id, COUNT(c.ts) AS n_clicks_10m
FROM errs e
LEFT JOIN clicks c
  ON c.user_id = e.user_id
 AND epoch(c.ts) >= epoch(e.ts)
 AND epoch(c.ts) < epoch(e.ts) + 600
GROUP BY e.event_id, e.user_id
""",
)
def ts_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within 10 minutes after each error, per user —
    bucket-refined equi-join (fan-out bounded by bucket width), then a
    group-count.  Left join semantics recovered by re-joining the error
    spine so zero-click errors keep a row."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    errs = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    pairs = timeseries.range_join(
        errs, clicks, by=("user_id",), left_ts="ts", right_ts="ts",
        lower_seconds=0, upper_seconds=600,
    )
    counts = pairs.groupBy(
        F.col("l.event_id").alias("event_id"), F.col("l.user_id").alias("user_id")
    ).agg(F.count(F.lit(1)).alias("n_clicks_10m"))
    return (
        errs.select("event_id", "user_id")
        .join(counts, ["event_id", "user_id"], "left_outer")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_clicks_10m", F.lit(0)).alias("n_clicks_10m"),
        )
    )


@register(
    "ts_asof_forward_tolerance",
    oracle="""
WITH errs AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     purchases AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase')
SELECT e.event_id, e.user_id,
       CASE WHEN p.ts IS NOT NULL
                 AND epoch(p.ts) - epoch(e.ts) <= 3600
            THEN p.event_id END AS next_purchase_id
FROM errs e ASOF LEFT JOIN purchases p
  ON e.user_id = p.user_id AND e.ts <= p.ts
""",
)
def ts_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: the next purchase of the same user
    at-or-after each error, nulled when more than an hour out — the
    "did the user recover" funnel shape.  Same single-shuffle
    union+window plan, scanned in descending time order."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    errs = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = timeseries.asof_join(
        errs, purchases, on="ts", by=("user_id",), direction="forward",
        tolerance=3600, right_cols={"event_id": "next_purchase_id"},
    )
    return joined.select("event_id", "user_id", "next_purchase_id")


@register(
    "ts_ohlc_hourly",
    oracle="""
SELECT user_id % 20 AS grp,
       date_trunc('hour', ts) AS bucket,
       ROUND(arg_min(value, event_id), 4) AS open,
       ROUND(MAX(value), 4) AS high,
       ROUND(MIN(value), 4) AS low,
       ROUND(arg_max(value, event_id), 4) AS close,
       COUNT(*) AS n_ticks,
       ROUND(SUM(value), 2) AS volume
FROM events
GROUP BY 1, 2
""",
)
def ts_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (the TAQ quote/trade rollup shape, TAQTest
    reference harness): per (group, hour) open/high/low/close/volume in a
    single partial-aggregated shuffle — min_by/max_by carry open/close so
    there is no sort and no window.  Tie-break on the unique event_id
    keeps open/close deterministic on both engines.  At 100 TB this is
    one map-side-combined agg keyed by (group, hour) — the panel is
    bounded by groups × hours, not by tick count."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(
            (F.col("user_id") % 20).alias("grp"),
            F.date_trunc("hour", "ts").alias("bucket"),
        )
        .agg(
            F.round(F.min_by("value", "event_id"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", "event_id"), 4).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.round(F.sum("value"), 2).alias("volume"),
        )
    )


@register(
    "ts_gap_fill",
    oracle="""
WITH daily AS (
  SELECT user_id % 50 AS grp, date_trunc('day', ts) AS day,
         COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_val
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT grp, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY grp
), spine AS (
  SELECT b.grp, gs.g AS day
  FROM bounds b, LATERAL (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS g) gs
)
SELECT s.grp, s.day,
       COALESCE(d.n_events, 0) AS n_events,
       LAST_VALUE(d.sum_val IGNORE NULLS)
           OVER (PARTITION BY s.grp ORDER BY s.day) AS sum_val_ffill
FROM spine s LEFT JOIN daily d ON s.grp = d.grp AND s.day = d.day
""",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (beyond the reference — hypertable-rollup
    style regularization a training pipeline needs): build each group's
    daily date spine with sequence()+explode, left-join the observed
    daily aggregates, zero-fill counts and forward-fill the daily value totals with a
    last-non-null window.  Scale: the spine is generated per-group from
    min/max (no driver loop); one shuffle for the daily agg, the spine
    join is on (grp, day) — co-partitioned with the agg output."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        # day stays TIMESTAMP (not DATE): Spark DATE collects as
        # datetime.date vs DuckDB DATE as datetime64 — type drift the
        # driver's pandas canonicalizer hashes differently
        ev.groupBy(
            (F.col("user_id") % 50).alias("grp"),
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_val"),
        )
    )
    spine = (
        daily.groupBy("grp")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "grp",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    w = W.partitionBy("grp").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (
        spine.join(daily, ["grp", "day"], "left")
        .select(
            "grp",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("sum_val", ignorenulls=True).over(w).alias("sum_val_ffill"),
        )
    )

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


@register(
    "ts_interpolate_linear",
    oracle="""
WITH daily AS (
  SELECT user_id % 50 AS grp, date_trunc('day', ts) AS day,
         ROUND(SUM(value), 2) AS sum_val
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT grp, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY grp
), spine AS (
  SELECT b.grp, gs.g AS day
  FROM bounds b, LATERAL (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS g) gs
), joined AS (
  SELECT s.grp, s.day, d.sum_val FROM spine s
  LEFT JOIN daily d ON s.grp = d.grp AND s.day = d.day
), bracketed AS (
  SELECT grp, day, sum_val,
         LAST_VALUE(sum_val IGNORE NULLS) OVER
           (PARTITION BY grp ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
         LAST_VALUE(CASE WHEN sum_val IS NOT NULL THEN day END IGNORE NULLS) OVER
           (PARTITION BY grp ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
         FIRST_VALUE(sum_val IGNORE NULLS) OVER
           (PARTITION BY grp ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
         FIRST_VALUE(CASE WHEN sum_val IS NOT NULL THEN day END IGNORE NULLS) OVER
           (PARTITION BY grp ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
  FROM joined
)
SELECT grp, day,
       ROUND(CASE
         WHEN prev_val IS NOT NULL AND next_val IS NOT NULL
              AND epoch(next_day) <> epoch(prev_day)
         THEN prev_val + (next_val - prev_val)
              * ((epoch(day) - epoch(prev_day))
                 / (epoch(next_day) - epoch(prev_day)))
         ELSE COALESCE(prev_val, next_val)
       END, 4) AS sum_val_interp
FROM bracketed
""",
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a regular per-group day spine (gap
    regularization a feature/training pipeline needs before windowed
    models; the reference's TAQ rollup stops at OHLC).  Same spine as
    ts_gap_fill; missing days get prev + (next-prev)*(t-t_prev)/(t_next-
    t_prev) bracketed by IGNORE-NULLS windows — two window passes over a
    (grp, day) panel bounded by groups × days, never by raw event count.
    The interpolation arithmetic is written identically on both engines so
    the value hash, not just row counts, proves the semantics."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(
        (F.col("user_id") % 50).alias("grp"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.round(F.sum("value"), 2).alias("sum_val"))
    spine = (
        daily.groupBy("grp")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "grp",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    w_prev = W.partitionBy("grp").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    w_next = W.partitionBy("grp").orderBy("day").rowsBetween(0, W.unboundedFollowing)
    obs_day = F.when(F.col("sum_val").isNotNull(), F.col("day"))
    j = (
        spine.join(daily, ["grp", "day"], "left")
        .select(
            "grp",
            "day",
            "sum_val",
            F.last("sum_val", ignorenulls=True).over(w_prev).alias("prev_val"),
            F.last(obs_day, ignorenulls=True).over(w_prev).alias("prev_day"),
            F.first("sum_val", ignorenulls=True).over(w_next).alias("next_val"),
            F.first(obs_day, ignorenulls=True).over(w_next).alias("next_day"),
        )
    )
    ratio = (
        (F.unix_timestamp("day") - F.unix_timestamp("prev_day"))
        / (F.unix_timestamp("next_day") - F.unix_timestamp("prev_day"))
    )
    interp = F.when(
        F.col("prev_val").isNotNull()
        & F.col("next_val").isNotNull()
        & (F.unix_timestamp("next_day") != F.unix_timestamp("prev_day")),
        F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * ratio,
    ).otherwise(F.coalesce("prev_val", "next_val"))
    return j.select("grp", "day", F.round(interp, 4).alias("sum_val_interp"))


@register(
    "ts_ema_daily",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT user_id % 50 AS grp, date_trunc('day', ts) AS day,
         ROUND(AVG(value), 6) AS x
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT grp, day, x,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY day) AS rn
  FROM daily
), ema AS (
  SELECT grp, day, rn, x, x AS ema FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.grp, s.day, s.rn, s.x, 0.2 * s.x + 0.8 * e.ema
  FROM seq s JOIN ema e ON s.grp = e.grp AND s.rn = e.rn + 1
)
SELECT grp, day, ROUND(ema, 4) AS ema
FROM ema
""",
)
def ts_ema_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average (alpha=0.2) of the per-group daily mean
    — an inherently ITERATIVE operator (ema_t = a*x_t + (1-a)*ema_{t-1})
    no window frame can express, implemented as applyInPandas over the
    pre-aggregated daily panel.  Scale: the recurrence runs on (grp, day)
    rows — bounded by groups × days regardless of raw event volume — after
    one map-side-combined aggregation shuffle; groups distribute across
    executors and each group's scan is a tight numpy loop.  The DuckDB
    oracle is a recursive CTE with the exact same float64 recurrence, so
    the value hash proves the semantics bit-for-bit (inputs pre-rounded
    to 6 decimals on both sides)."""
    import pandas as pd

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(
        (F.col("user_id") % 50).alias("grp"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.round(F.avg("value"), 6).alias("x"))

    def _ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        vals = pdf["x"].to_numpy()
        out = vals.copy()
        for i in range(1, len(out)):
            # same literal recurrence as the oracle CTE: float64 + is
            # commutative, * has identical operands — bitwise equal
            out[i] = 0.2 * vals[i] + 0.8 * out[i - 1]
        pdf["ema"] = out
        return pdf[["grp", "day", "ema"]]

    res = daily.groupBy("grp").applyInPandas(
        _ema, schema="grp bigint, day timestamp, ema double"
    )
    return res.select("grp", "day", F.round("ema", 4).alias("ema"))

"""Event-analytics operators: funnel, retention cohort, journey paths.

The reference positions itself as an "analytics + streaming" engine; its
continuous queries over event feeds (SURVEY.md §2.9, registerCQ over
stream tables) are exactly the funnel/retention shapes below, expressed
here as batch-equivalent plans (the same plan a Structured Streaming
micro-batch compiles to).

Scale design: every query here shuffles ONCE on user_id and reuses that
partitioning across all subsequent window passes — a funnel over 100 TB
of events is a single hash-exchange followed by map-side windows, not a
chain of self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from snappydata_spark.operators.registry import register
from snappydata_spark.tables import load_tables


@register(
    "ev_funnel_steps",
    oracle="""
WITH f1 AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS vts
  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
f2 AS (
  SELECT user_id, ts, event_type, vts,
         MIN(CASE WHEN event_type = 'click' AND ts > vts THEN ts END)
             OVER (PARTITION BY user_id) AS cts
  FROM f1),
f3 AS (
  SELECT user_id, vts, cts,
         MIN(CASE WHEN event_type = 'purchase' AND ts > cts THEN ts END)
             OVER (PARTITION BY user_id) AS pts
  FROM f2),
agg AS (
  SELECT user_id, MIN(vts) AS vts, MIN(cts) AS cts, MIN(pts) AS pts
  FROM f3 GROUP BY user_id)
SELECT 'step1_view' AS step, COUNT(vts) AS users FROM agg
UNION ALL
SELECT 'step2_click_after_view' AS step, COUNT(cts) AS users FROM agg
UNION ALL
SELECT 'step3_purchase_after_click' AS step, COUNT(pts) AS users FROM agg
ORDER BY step
""",
)
def ev_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step ordered funnel (view → later click → later purchase).

    Mirrors the reference's CQ-over-stream analytics (SnappyParser
    windowed stream relations, SURVEY §2.9): each step's first-qualifying
    timestamp is a window min over the SAME user_id partitioning, so the
    whole funnel is one exchange + three map-side window passes — no
    self-joins, no per-step shuffles.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id")
    f1 = ev.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).withColumn(
        "vts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    f2 = f1.withColumn(
        "cts",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("vts")),
                F.col("ts"),
            )
        ).over(w),
    )
    f3 = f2.withColumn(
        "pts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("cts")),
                F.col("ts"),
            )
        ).over(w),
    )
    agg = f3.groupBy("user_id").agg(
        F.min("vts").alias("vts"),
        F.min("cts").alias("cts"),
        F.min("pts").alias("pts"),
    )
    out = agg.agg(
        F.count("vts").alias("step1"),
        F.count("cts").alias("step2"),
        F.count("pts").alias("step3"),
    )
    return out.selectExpr(
        "stack(3, 'step1_view', step1, 'step2_click_after_view', step2, "
        "'step3_purchase_after_click', step3) AS (step, users)"
    ).orderBy("step")


@register(
    "ev_retention_cohort",
    oracle="""
WITH cohort AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events)
SELECT c.cohort_week,
       CAST(date_diff('day', c.cohort_week, a.active_week) / 7 AS BIGINT)
           AS week_offset,
       COUNT(DISTINCT a.user_id) AS active_users
FROM cohort c JOIN activity a ON c.user_id = a.user_id
GROUP BY c.cohort_week, week_offset
ORDER BY c.cohort_week, week_offset
""",
)
def ev_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    in each later week they return.

    Scale: cohort and activity are both keyed on user_id — the join
    reuses one hash partitioning (no second exchange of the fact side);
    the output is bounded by |weeks|² regardless of event volume.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    wk = F.date_trunc("week", F.col("ts"))
    cohort = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    activity = ev.select("user_id", wk.alias("active_week")).distinct()
    return (
        cohort.join(activity, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "ev_journey_paths",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
paths AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 3 GROUP BY user_id)
SELECT path, COUNT(*) AS users
FROM paths GROUP BY path
ORDER BY users DESC, path
LIMIT 20
""",
)
def ev_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey prefixes: each user's first 3 events as a '>'
    delimited path, counted across users (classic clickstream rollup).

    Scale: row_number + filter keeps ≤3 rows/user before the path
    aggregation, so the second shuffle moves 3 rows per user, not the
    full event stream; final rollup is bounded by |event_type|³ paths.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    paths = ranked.groupBy("user_id").agg(
        F.concat_ws(
            ">", F.array_sort(F.collect_list(F.struct("rn", "event_type")))
            .getField("event_type")
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy(F.desc("users"), "path")
        .limit(20)
    )

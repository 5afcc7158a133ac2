"""Time-series / event-stream operators over the `events` table.

The reference's streaming SQL (SURVEY.md §2.9) runs windowed aggregates
over event feeds; these are the batch-equivalent shapes (the same plans a
Structured Streaming query compiles to per micro-batch), plus the CDC
conflation semantics of the snappysink (SnappySinkCallback.scala:286-309)
expressed as a pure query so the correctness gate covers it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from snappydata_spark.operators.registry import register
from snappydata_spark import timeseries
from snappydata_spark.tables import load_tables


@register(
    "ev_tumbling_window",
    oracle="""
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS cnt,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY hour_start, event_type
""",
)
def ev_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling processing-window aggregate (WINDOW (DURATION n SECONDS)
    grammar SnappyParser.scala:552-557 → date_trunc/event-time window)."""
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(
            F.expr("date_trunc('hour', ts) AS hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.expr("COUNT(1) AS cnt"),
            # decimal accumulation — events.value is an exact 2-decimal
            # amount; per-(hour, type) row counts scale with sf, where
            # double sums drift a cent with partition order (sf10 catch)
            F.expr(
                "CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2)"
                " AS DOUBLE) AS total_value"
            ),
        )
    )


@register(
    "ev_sliding_window",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS cnt
  FROM events GROUP BY h)
SELECT h, cnt,
       CAST(SUM(cnt) OVER (ORDER BY h ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cnt_3h_window
FROM hourly
""",
)
def ev_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (WINDOW (DURATION d, SLIDE s) — WindowPhysicalPlan
    applies DStream.window; batch equivalent = frame over pre-aggregated
    panels, which keeps the shuffle on the tiny hourly rollup)."""
    t = load_tables(spark, sf_dir, ("events",))
    hourly = (
        t["events"]
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.orderBy("h").rowsBetween(-2, 0)
    return hourly.select(
        "h", "cnt", F.sum("cnt").over(w).alias("cnt_3h_window")
    )


@register(
    "ev_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_no
  FROM flagged)
SELECT user_id, session_no, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_no
""",
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the batch shape of session_window /
    applyInPandasWithState custom stateful ops): lag → session-start flag →
    cumulative sum → per-session rollup.  Single shuffle on user_id; all
    window passes reuse that partitioning."""
    t = load_tables(spark, sf_dir, ("events",))
    # microsecond-precision gap: ts.cast("long") truncates to whole seconds,
    # which flips boundary sessions on sub-second event streams; interval
    # comparison keeps full precision and works for TIMESTAMP and
    # TIMESTAMP_NTZ alike (unix_micros rejects NTZ).  SQL-string build:
    # the Column-API window tree cost ~40 Py4J round-trips per call,
    # most of this anchor's engine-vs-vanilla residual.
    _over = "OVER (PARTITION BY user_id ORDER BY ts, event_id"
    flagged = t["events"].selectExpr(
        "*",
        f"CASE WHEN LAG(ts) {_over}) IS NULL"
        f" OR ts - LAG(ts) {_over}) > INTERVAL '30' MINUTE"
        " THEN 1 ELSE 0 END AS new_session",
    )
    sessions = flagged.selectExpr(
        "*",
        f"SUM(new_session) {_over}"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no",
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.expr("COUNT(1) AS n_events"),
        F.expr("MIN(ts) AS session_start"),
        F.expr("MAX(ts) AS session_end"),
    )


@register(
    "ev_top_users",
    oracle="""
SELECT user_id, COUNT(*) AS purchases,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_spend
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY total_spend DESC, user_id
LIMIT 10
""",
)
def ev_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """total_spend is also the top-10 SORT key, so the SUM must be
    order-independent (decimal) — a cent of double drift could flip
    which user holds rank 10."""
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.expr(
                "CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2)"
                " AS DOUBLE) AS total_spend"
            ),
        )
        .orderBy(F.col("total_spend").desc(), F.col("user_id"))
        .limit(10)
    )


@register(
    "ev_cdc_conflate",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
             AS rn
  FROM events)
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       ROUND(value, 2) AS last_value
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
""",
)
def ev_cdc_conflate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC conflation: keep the LAST event per key, and drop keys whose
    last event is a delete — the per-batch dedup/conflate semantics of the
    snappysink (SnappySinkCallback.scala:286-309, 'error' standing in for
    the DELETE _eventType).  The streaming sink (streaming/sink.py) reuses
    this exact shape per micro-batch."""
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.round("value", 2).alias("last_value"),
        )
    )


def _approx_distinct_oracle() -> str:
    from snappydata_spark.operators.aqp_ops import _hll_grouped_sql

    return _hll_grouped_sql("event_type", "event_type", "user_id", "events")


@register("ev_approx_distinct_users", oracle=_approx_distinct_oracle())
def ev_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct surface (HLL — the reference's inherited
    approximate aggregate, SURVEY.md §2.4): approximate distinct users per
    event type.

    r6: served from the verified-HLL sketch (aqp_ops.hll_registers_grouped,
    4096 registers — the same accuracy class as Spark's default rsd) so
    the estimate is hash-exact against the DuckDB oracle instead of
    rows-only: both engines build identical md5-derived registers and fold
    them in pinned order.  Engine-native approx_count_distinct remains
    available (and exactness is covered by agg_distinct); accuracy of this
    sketch vs the exact count is pytest-asserted in tests/test_aqp.py."""
    from snappydata_spark.operators.aqp_ops import (
        hll_estimate_from_registers,
        hll_registers_grouped,
    )

    t = load_tables(spark, sf_dir, ("events",))
    regs = hll_registers_grouped(t["events"], [F.col("event_type")], "user_id")
    return hll_estimate_from_registers(regs, ["event_type"])


@register(
    "ev_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*)::DOUBLE AS cnt
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT user_id, AVG(cnt) AS mu, STDDEV_SAMP(cnt) AS sigma,
         COUNT(*) AS n_days
  FROM daily GROUP BY user_id
)
SELECT d.user_id, d.day, CAST(d.cnt AS BIGINT) AS cnt,
       ROUND((d.cnt - s.mu) / s.sigma, 4) AS z
FROM daily d JOIN stats s USING (user_id)
WHERE s.n_days >= 3 AND s.sigma > 0
  AND abs((d.cnt - s.mu) / s.sigma) > 2
""",
)
def ev_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity anomaly detection: per-user daily event counts, z-scored
    against that user's own mean/stddev, flagging |z| > 2 days — the
    bot/abuse/outage triage scan.  One shuffle to the (user, day) panel,
    one partial-aggregated rollup to per-user stats, broadcast-or-shuffle
    join back; every stage is bounded by users × days, not raw events."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    stats = daily.groupBy("user_id").agg(
        F.avg("cnt").alias("mu"),
        F.stddev_samp("cnt").alias("sigma"),
        F.count(F.lit(1)).alias("n_days"),
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(stats, "user_id")
        .filter((F.col("n_days") >= 3) & (F.col("sigma") > 0) & (F.abs(z) > 2))
        .select(
            "user_id",
            "day",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(z, 4).alias("z"),
        )
    )


@register(
    "ev_conversion_attribution",
    oracle="""
WITH conv AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type IN ('click', 'view')
)
SELECT c.event_id, c.user_id,
       arg_min(t.event_id, epoch_ms(t.ts) * 1000000 + t.event_id) AS first_touch_id,
       arg_max(t.event_id, epoch_ms(t.ts) * 1000000 + t.event_id) AS last_touch_id,
       COUNT(*)::BIGINT AS n_touches,
       ROUND(ANY_VALUE(c.value) / COUNT(*), 4) AS linear_credit
FROM conv c JOIN touch t
  ON t.user_id = c.user_id
 AND epoch(t.ts) >= epoch(c.ts) - 86400
 AND epoch(t.ts) < epoch(c.ts)
GROUP BY c.event_id, c.user_id
""",
)
def ev_conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution: each purchase credits the
    click/view touches of the same user in the preceding 24 h —
    first-touch, last-touch, and linear (value / n_touches) in one pass.
    The touch window is a bucket-refined range join (fan-out bounded by
    bucket width, one shuffle on user), then a single partial-aggregated
    groupBy(conversion); the (ms-epoch, event_id) composite ordering key
    makes the first/last picks deterministic on both engines at equal
    timestamps (event_id tie-break; fits BIGINT for event_id < 1e6 at
    registry scales)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", "event_id"
    )
    pairs = timeseries.range_join(
        conv, touch, by=("user_id",), left_ts="ts", right_ts="ts",
        lower_seconds=-86400, upper_seconds=0,
    )
    # NTZ-safe: cast to (LTZ) timestamp first — session TZ is UTC, so the
    # wall-clock epoch matches DuckDB's epoch_ms on naive timestamps
    order = (
        F.unix_millis(F.col("r.ts").cast("timestamp")) * 1000000
    ) + F.col("r.event_id")
    return pairs.groupBy(
        F.col("l.event_id").alias("event_id"),
        F.col("l.user_id").alias("user_id"),
    ).agg(
        F.min_by(F.col("r.event_id"), order).alias("first_touch_id"),
        F.max_by(F.col("r.event_id"), order).alias("last_touch_id"),
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.any_value(F.col("l.value")) / F.count(F.lit(1)), 4).alias(
            "linear_credit"
        ),
    )


@register(
    "ev_session_window_agg",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), ids AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*)::BIGINT AS n_events
FROM ids GROUP BY user_id, sid
""",
)
def ev_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session-window aggregation (F.session_window — Spark's
    gap-based session operator, usable identically in batch and
    streaming): per (user, 30-min-gap session) event counts.  The oracle
    states the same sessions via lag/island detection, proving Spark's
    session_window semantics (window end = last event + gap) against
    first principles.  One shuffle on user_id; in streaming the same
    expression runs stateful with watermark-bounded session state —
    which the DStream reference never supported (SURVEY §7 risk 5)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------- mergeable percentile rollup

PCT_W = 0.25  # log-domain bin width
PCT_QS = ((50, "p50"), (95, "p95"), (99, "p99"))


def percentile_histogram_partials(
    ev: DataFrame, keys: tuple[str, ...], value_col: str = "value"
) -> DataFrame:
    """(keys..., bin, cnt) log-width histogram partials — the MERGEABLE
    percentile state: partials from any split of the data merge by
    summing cnt per (keys, bin), which is exactly what a streaming
    rollup (ContinuousAggregate PUT-merge) or a partition-parallel
    two-phase aggregate needs.  bin = floor(ln(1+max(v,0)) / PCT_W):
    log-width bins give ~2.5% relative error at any magnitude with a
    few hundred bins of bounded state per key."""
    b = F.floor(
        F.log(F.lit(1.0) + F.greatest(F.col(value_col), F.lit(0.0))) / PCT_W
    ).cast("long")
    return ev.groupBy(*keys, b.alias("bin")).agg(F.count(F.lit(1)).alias("cnt"))


def percentiles_from_partials(partials: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    """Finalize: per key group, the q-th percentile estimate is the UPPER
    edge exp((bin+1)*W)-1 of the first bin whose cumulative count
    reaches ceil(q/100 * n) — deterministic (no interpolation), so the
    estimate is reproducible bit-for-bit across engines and across any
    partial/merge split of the input."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy("bin")
    cum = partials.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(W.partitionBy(*keys))
    )
    aggs = [F.max("n").alias("n")]
    for q, name in PCT_QS:
        hit = F.when(
            F.col("cum") >= F.ceil(F.col("n") * q / 100.0), F.col("bin")
        )
        aggs.append(
            F.round(
                F.exp((F.min(hit) + 1) * PCT_W) - 1.0, 4
            ).alias(name)
        )
    return cum.groupBy(*keys).agg(*aggs)


@register(
    "ev_percentile_rollup",
    oracle=f"""
WITH part AS (
  SELECT date_trunc('hour', ts) AS hour_start, event_type,
         CAST(FLOOR(LN(1.0 + GREATEST(value, 0.0)) / {PCT_W}) AS BIGINT) AS bin,
         COUNT(*) AS cnt
  FROM events GROUP BY hour_start, event_type, bin),
cum AS (
  SELECT hour_start, event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY hour_start, event_type ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY hour_start, event_type) AS n
  FROM part)
SELECT hour_start, event_type, CAST(MAX(n) AS BIGINT) AS n,
  {", ".join(
    f"ROUND(EXP((MIN(CASE WHEN cum >= CEIL(n * {q} / 100.0) THEN bin END) + 1)"
    f" * {PCT_W}) - 1.0, 4) AS {name}" for q, name in PCT_QS)}
FROM cum GROUP BY hour_start, event_type
""",
)
def ev_percentile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile rollup from MERGEABLE log-histogram partials (the
    fixed-state alternative to exact percentile_disc, which needs a full
    sort): phase 1 folds events to (hour, type, bin) counts — partial
    state is a few hundred rows per key, merges by addition, so the same
    partials serve a streaming ContinuousAggregate PUT-merge or any
    partition split; phase 2 walks the cumulative histogram to the
    p50/p95/p99 bin edges.  ~2.5% relative error by construction
    (PCT_W=0.25 log bins), deterministic output (upper bin edge, no
    interpolation).  At 100 TB: one partial-aggregated shuffle bounded
    by |keys|·|bins| — never a per-key sort of raw values.  A pytest
    asserts partial-merge equality (full data vs merged disjoint-half
    partials)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    keyed = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
        "value",
    )
    partials = percentile_histogram_partials(
        keyed, ("hour_start", "event_type")
    )
    return percentiles_from_partials(partials, ("hour_start", "event_type"))

"""AQP statistical contracts: stratified sampling preserves strata, the
95% CI covers the true value, top-k matches exact computation."""

import pytest
from pyspark.sql import functions as F

from snappydata_spark import aqp


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_stratified_sample_covers_all_strata(lineitem):
    st = aqp.create_sample_table(lineitem, ["l_returnflag"], 0.2)
    strata = {r[0] for r in lineitem.select("l_returnflag").distinct().collect()}
    sampled = {r[0] for r in st.sample.select("l_returnflag").distinct().collect()}
    assert sampled == strata


def test_sum_estimate_within_bounds(lineitem):
    st = aqp.create_sample_table(lineitem, ["l_returnflag"], 0.3)
    est = {
        r.l_returnflag: r
        for r in aqp.approx_agg(
            st, ["l_returnflag"], "l_extendedprice", "sum"
        ).collect()
    }
    true = {
        r.l_returnflag: r.s
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.sum("l_extendedprice").alias("s"))
        .collect()
    }
    covered = sum(
        1
        for flag, r in est.items()
        if r.lower_bound <= true[flag] <= r.upper_bound
    )
    # 95% CI over 3 strata: allow one miss
    assert covered >= len(est) - 1
    for flag, r in est.items():
        assert r.relative_error < 0.2


def test_avg_estimate_close(lineitem):
    st = aqp.create_sample_table(lineitem, ["l_returnflag"], 0.3)
    est = {
        r.l_returnflag: r.estimate
        for r in aqp.approx_agg(st, ["l_returnflag"], "l_quantity", "avg").collect()
    }
    true = {
        r.l_returnflag: r.a
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.avg("l_quantity").alias("a"))
        .collect()
    }
    for flag in true:
        assert est[flag] == pytest.approx(true[flag], rel=0.1)


def test_count_estimate(lineitem):
    st = aqp.create_sample_table(lineitem, ["l_linestatus"], 0.3)
    est = aqp.approx_agg(st, ["l_linestatus"], "l_quantity", "count").collect()
    true = {
        r.l_linestatus: r.c
        for r in lineitem.groupBy("l_linestatus").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for r in est:
        assert r.estimate == pytest.approx(true[r.l_linestatus], rel=0.15)


def test_topk_matches_exact(spark, sf_dir):
    from snappydata_spark.tables import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"]
    topk = aqp.approx_topk_time(events, "event_type", "ts", k=1, window="1 hour")
    # rank-1 rows must be the true per-hour max
    exact = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("h")
        .agg(F.max("cnt").alias("max_cnt"))
    )
    j = topk.join(exact, topk.window_start == exact.h)
    assert j.filter(F.col("cnt") != F.col("max_cnt")).count() == 0


def test_multi_column_qcs(lineitem):
    st = aqp.create_sample_table(lineitem, ["l_returnflag", "l_linestatus"], 0.2)
    assert "__stratum" not in st.sample.columns
    combos_base = lineitem.select("l_returnflag", "l_linestatus").distinct().count()
    combos_sample = st.sample.select("l_returnflag", "l_linestatus").distinct().count()
    assert combos_sample == combos_base


def test_strata_reservoir_floor(spark, sf_dir):
    """strataReservoirSize: rare strata must keep at least the reservoir
    rows even when fraction alone would drop them entirely."""
    from snappydata_spark import aqp

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    st = aqp.create_sample_table(
        lineitem, ["l_returnflag"], fraction=0.001, min_stratum_rows=5
    )
    per_stratum = {
        r.l_returnflag: r.n
        for r in st.sample.groupBy("l_returnflag").count().withColumnRenamed("count", "n").collect()
    }
    base_strata = {r.l_returnflag for r in lineitem.select("l_returnflag").distinct().collect()}
    assert set(per_stratum) == base_strata          # no stratum lost
    assert all(n >= 5 for n in per_stratum.values())
    # weights make the count estimate exact per stratum
    est = {
        r.l_returnflag: r.estimate
        for r in aqp.approx_agg(st, ["l_returnflag"], "l_quantity", "count").collect()
    }
    true = {
        r.l_returnflag: r.n
        for r in lineitem.groupBy("l_returnflag").count().withColumnRenamed("count", "n").collect()
    }
    for k in true:
        assert est[k] == pytest.approx(true[k], rel=1e-6)


def test_verified_hll_grouped_within_5pct(spark, sf_dir):
    """ev_approx_distinct_users (verified-HLL, 4096 registers): per-type
    estimate within 5% of the exact distinct count."""
    from pyspark.sql import functions as F

    from snappydata_spark.operators import QUERIES

    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["ev_approx_distinct_users"](spark, sf_dir).collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r.n
        for r in events.filter(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.05 * n)


def test_hll_union_within_5pct_of_exact(spark, sf_dir):
    """aqp_hll_union_daily: per-day sketch-merged distinct estimate must
    land within 5% of the exact distinct count (verified HLL, 4096
    registers → ~1.6% relative standard error; small ranges use linear
    counting which is tighter still)."""
    from pyspark.sql import functions as F

    from snappydata_spark.operators import QUERIES

    approx = {
        r.day: r.approx_users for r in QUERIES["aqp_hll_union_daily"](spark, sf_dir).collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(events.dtypes).get("ts") == "bigint":
        events = events.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    exact = {
        r.day: r.n
        for r in events.filter(F.col("user_id").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.05 * n)


def test_percentile_approx_within_tolerance(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna sketch, mergeable across
    partitions) must land within the sketch's rank-error bound of the
    exact percentile — the AQP contract for quantile queries at scale."""
    from pyspark.sql import functions as F

    line = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    acc = 1000  # rank error <= n / acc
    row = line.select(
        F.expr(f"percentile_approx(l_extendedprice, 0.5, {acc})").alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr(f"percentile_approx(l_extendedprice, 0.99, {acc})").alias("approx99"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("exact99"),
    ).collect()[0]
    # translate rank error to a generous value tolerance: 1% of the range
    lo, hi = [
        r[0]
        for r in line.select(F.min("l_extendedprice")).collect()
        + line.select(F.max("l_extendedprice")).collect()
    ]
    tol = (hi - lo) * 0.01
    assert abs(row.approx - row.exact) <= tol
    assert abs(row.approx99 - row.exact99) <= tol


def test_with_error_sql_routing(snappy, sf_dir):
    """`SELECT ... WITH ERROR` (docs/sde/running_queries.md) must route to
    the registered sample table and bracket the true value."""
    lineitem = snappy.spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    snappy.create_table("li_base", df=lineitem)
    snappy.sql(
        "CREATE SAMPLE TABLE li_sample ON li_base "
        "OPTIONS (qcs 'l_returnflag', fraction '0.2')"
    )
    out = snappy.sql(
        "SELECT l_returnflag, SUM(l_extendedprice) AS rev FROM li_base "
        "GROUP BY l_returnflag WITH ERROR 0.1"
    )
    assert {"l_returnflag", "rev", "absolute_error", "relative_error",
            "lower_bound", "upper_bound"} <= set(out.columns)
    est = {r.l_returnflag: r for r in out.collect()}
    true = {
        r.l_returnflag: r.s
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("s"))
        .collect()
    }
    assert set(est) == set(true)
    # default BEHAVIOR is run_on_full_table: rows whose estimate violated
    # the 0.1 bound come back exact (zero-width CI), so the bracket check
    # holds either way (truth rounded like the engine's output)
    for k, row in est.items():
        assert row.lower_bound <= true[k] <= row.upper_bound
    # WHERE is applied to the sample before estimation
    flt = snappy.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM li_base "
        "WHERE l_quantity > 10 GROUP BY l_returnflag WITH ERROR"
    )
    assert flt.count() > 0

    # multi-aggregate select list: one sample scan, per-aggregate CIs
    multi = snappy.sql(
        "SELECT l_returnflag, SUM(l_extendedprice) AS rev, COUNT(*) AS n, "
        "AVG(l_quantity) AS aq FROM li_base GROUP BY l_returnflag WITH ERROR 0.1"
    )
    for alias in ("rev", "n", "aq"):
        assert {alias, f"{alias}_lower_bound", f"{alias}_upper_bound"} <= set(
            multi.columns
        )
    truth = {
        r.l_returnflag: r
        for r in lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("rev"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_quantity"), 4).alias("aq"),
        )
        .collect()
    }
    rows = {r.l_returnflag: r for r in multi.collect()}
    assert set(rows) == set(truth)
    # truth rounded like the engine's 4-decimal output: exact re-run rows
    # (default run_on_full_table) have zero-width CIs at the rounded value
    for k, r in rows.items():
        assert r.rev_lower_bound <= truth[k].rev <= r.rev_upper_bound
        assert r.n_lower_bound <= truth[k].n <= r.n_upper_bound
        assert round(r.aq_lower_bound, 3) <= round(truth[k].aq, 3) <= round(r.aq_upper_bound, 3)
    snappy.drop_table("li_sample")
    snappy.drop_table("li_base")


def test_with_error_join_to_non_sample(snappy, sf_dir):
    """SDE joins: the sampled fact joins NON-sample dimensions
    (docs/sde/index.md:43 'Joins are only supported to non-samples') —
    the estimate runs on sample JOIN dim, WHERE may reference dim
    columns, and joining TO a sample table is rejected."""
    lineitem = snappy.spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = snappy.spark.read.parquet(f"{sf_dir}/orders.parquet")
    snappy.create_table("lij_base", df=lineitem)
    snappy.create_table("ordj_dim", df=orders)
    snappy.sql(
        "CREATE SAMPLE TABLE lij_sample ON lij_base "
        "OPTIONS (qcs 'l_returnflag', fraction '0.25')"
    )
    try:
        out = snappy.sql(
            "SELECT o_orderpriority, SUM(l_extendedprice) AS rev "
            "FROM lij_base JOIN ordj_dim ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority WITH ERROR 0.2"
        )
        est = {r.o_orderpriority: r for r in out.collect()}
        true = {
            r.o_orderpriority: r.s
            for r in lineitem.join(
                orders, lineitem.l_orderkey == orders.o_orderkey
            )
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 4).alias("s"))
            .collect()
        }
        assert set(est) == set(true)
        # default run_on_full_table: violating rows come back exact, so
        # the bracket holds either way
        for k, row in est.items():
            assert row.lower_bound <= true[k] <= row.upper_bound
        # WHERE on a DIM column applies after the join
        flt = snappy.sql(
            "SELECT o_orderpriority, COUNT(*) AS n "
            "FROM lij_base JOIN ordj_dim ON l_orderkey = o_orderkey "
            "WHERE o_orderpriority = '1-URGENT' "
            "GROUP BY o_orderpriority WITH ERROR"
        )
        rows = flt.collect()
        assert len(rows) == 1 and rows[0].o_orderpriority == "1-URGENT"
        with pytest.raises(ValueError, match="non-samples"):
            snappy.sql(
                "SELECT COUNT(*) AS n FROM lij_base "
                "JOIN lij_sample ON l_orderkey = l_orderkey WITH ERROR"
            )
    finally:
        snappy.drop_table("lij_sample")
        snappy.drop_table("ordj_dim")
        snappy.drop_table("lij_base")


def test_topk_table_sql_surface(snappy, spark, sf_dir):
    """The sketching.md SQL surface: CREATE TOPK TABLE ... OPTIONS(key,
    frequencyCol, timeSeriesColumn, timeInterval, size) and SELECT with
    startTime/endTime predicates returning (key, EstimatedValue,
    ErrorBoundsInfo)."""
    from snappydata_spark.tables import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"]
    snappy.create_table("tk_base", df=events)
    snappy.sql(
        "CREATE TOPK TABLE tk ON tk_base OPTIONS "
        "(key 'event_type', timeSeriesColumn 'ts', timeInterval '1h', "
        "size '5')"
    )
    try:
        out = snappy.sql("SELECT * FROM tk ORDER BY EstimatedValue DESC LIMIT 3")
        assert out.columns == ["event_type", "EstimatedValue", "ErrorBoundsInfo"]
        rows = out.collect()
        assert len(rows) == 3
        true = {
            r.event_type: r.c
            for r in events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        top3 = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert [(r.event_type, r.EstimatedValue) for r in rows] == top3
        # time-ranged query merges only the windows in range
        lo, hi = events.agg(
            F.min("ts").cast("string"), F.max("ts").cast("string")
        ).collect()[0]
        ranged = snappy.sql(
            f"SELECT event_type, EstimatedValue FROM tk WHERE "
            f"startTime='{lo}' AND endTime='{hi}'"
        ).collect()
        assert len(ranged) > 0
        # frequencyCol ranks by SUM(value), not row count
        snappy.sql(
            "CREATE TOPK TABLE tkf ON tk_base OPTIONS "
            "(key 'event_type', frequencyCol 'value', "
            "timeSeriesColumn 'ts', timeInterval '1h', size '5')"
        )
        by_val = {
            r.event_type: r.v
            for r in events.groupBy("event_type")
            .agg(F.sum("value").alias("v"))
            .collect()
        }
        want = sorted(by_val.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        got = snappy.sql(
            "SELECT * FROM tkf ORDER BY EstimatedValue DESC LIMIT 2"
        ).collect()
        assert [r.event_type for r in got] == [k for k, _ in want]
        for r, (_, v) in zip(got, want):
            assert r.EstimatedValue == pytest.approx(v, rel=1e-9)
        # omitting timeInterval disables the time dimension
        snappy.sql(
            "CREATE TOPK TABLE tkg ON tk_base OPTIONS (key 'event_type', size '4')"
        )
        glob = snappy.sql("SELECT * FROM tkg").collect()
        assert [(r.event_type, r.EstimatedValue) for r in glob[:3]] == top3
        # only startTime/endTime predicates are legal on a topk table
        with pytest.raises(ValueError, match="startTime/endTime"):
            snappy.sql("SELECT * FROM tk WHERE event_type = 'click'")
    finally:
        for t in ("tk", "tkf", "tkg", "tk_base"):
            if snappy.catalog.exists(t):
                snappy.drop_table(t)


def test_expression_qcs_sample(snappy, sf_dir):
    """QCS built from an SQL expression
    (working_with_stratified_samples.md Example 3: qcs
    'hour(pickup_datetime)'): strata partition by the expression value,
    GROUP BY the same expression estimates per stratum — COUNT per
    stratum is then EXACT (per-stratum weights sum to the stratum
    total), and the selection ladder matches the expression."""
    lineitem = snappy.spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    snappy.create_table("xq_base", df=lineitem)
    snappy.sql(
        "CREATE SAMPLE TABLE xq_s ON xq_base "
        "OPTIONS (qcs 'year(l_shipdate)', fraction '0.2')"
    )
    snappy.sql(
        "CREATE SAMPLE TABLE xq_s_rf ON xq_base "
        "OPTIONS (qcs 'l_returnflag', fraction '0.2')"
    )
    try:
        out = snappy.sql(
            "SELECT year(l_shipdate) AS yr, COUNT(*) AS n FROM xq_base "
            "GROUP BY year(l_shipdate) ORDER BY yr WITH ERROR"
        ).collect()
        assert snappy._last_sample_choice.endswith("xq_s")
        true = {
            r.yr: r.c
            for r in lineitem.groupBy(F.year("l_shipdate").alias("yr"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        got = {r.yr: r.n for r in out}
        assert set(got) == set(true)
        # group == stratum: HT count per stratum is exact by construction
        for yr, n in got.items():
            assert n == pytest.approx(true[yr], abs=0.6)
        yrs = [r.yr for r in out]
        assert yrs == sorted(yrs)
    finally:
        snappy.drop_table("xq_s")
        snappy.drop_table("xq_s_rf")
        snappy.drop_table("xq_base")


def test_with_error_errfns_order_limit(snappy, sf_dir):
    """The full more_examples.md:13-18 SQL shape: error-function
    projections (absolute_error/relative_error/lower_bound/upper_bound
    on an aggregate alias), ORDER BY ... DESC and LIMIT inside a WITH
    ERROR query."""
    lineitem = snappy.spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    snappy.create_table("ef_base", df=lineitem)
    snappy.sql(
        "CREATE SAMPLE TABLE ef_sample ON ef_base "
        "OPTIONS (qcs 'l_returnflag', fraction '0.3')"
    )
    try:
        out = snappy.sql(
            "SELECT l_returnflag, AVG(l_quantity) AS avgq, "
            "absolute_error(avgq), relative_error(avgq), "
            "lower_bound(avgq), upper_bound(avgq) "
            "FROM ef_base GROUP BY l_returnflag "
            "ORDER BY l_returnflag DESC LIMIT 2 WITH ERROR"
        )
        assert out.columns == [
            "l_returnflag", "avgq", "avgq_absolute_error",
            "avgq_relative_error", "avgq_lower_bound", "avgq_upper_bound",
        ]
        rows = out.collect()
        assert len(rows) == 2
        flags = [r.l_returnflag for r in rows]
        assert flags == sorted(flags, reverse=True)
        for r in rows:
            assert r.avgq_lower_bound <= r.avgq <= r.avgq_upper_bound
            assert r.avgq_absolute_error >= 0
        # unknown alias in an error function is a clear error
        with pytest.raises(ValueError, match="no aggregate aliased"):
            snappy.sql(
                "SELECT l_returnflag, AVG(l_quantity) AS avgq, "
                "lower_bound(nope) FROM ef_base "
                "GROUP BY l_returnflag WITH ERROR"
            )
        # ORDER BY an aggregate alias + LIMIT (more_examples.md Example 2)
        top = snappy.sql(
            "SELECT l_returnflag, COUNT(*) AS cnt FROM ef_base "
            "GROUP BY l_returnflag ORDER BY cnt DESC LIMIT 1 WITH ERROR"
        ).collect()
        assert len(top) == 1
        true_top = (
            lineitem.groupBy("l_returnflag").count()
            .orderBy(F.desc("count")).limit(1).collect()[0]
        )
        assert top[0].l_returnflag == true_top.l_returnflag
    finally:
        snappy.drop_table("ef_sample")
        snappy.drop_table("ef_base")


def test_sample_selection_ladder(snappy, sf_dir):
    """Reference sample-selection logic (docs/sde/sample_selection.md):
    exact QCS match wins, else smallest superset, else the subset with
    most matching columns (ties -> largest fraction)."""
    lineitem = snappy.spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    snappy.create_table("sel_base", df=lineitem)
    snappy.sql(
        "CREATE SAMPLE TABLE sel_s_rf ON sel_base "
        "OPTIONS (qcs 'l_returnflag', fraction '0.2')"
    )
    snappy.sql(
        "CREATE SAMPLE TABLE sel_s_ls ON sel_base "
        "OPTIONS (qcs 'l_linestatus', fraction '0.3')"
    )
    snappy.sql(
        "CREATE SAMPLE TABLE sel_s_both ON sel_base "
        "OPTIONS (qcs 'l_returnflag,l_linestatus', fraction '0.1')"
    )
    try:
        # exact match on the GROUP BY column
        snappy.sql(
            "SELECT l_returnflag, COUNT(*) AS n FROM sel_base "
            "GROUP BY l_returnflag WITH ERROR"
        ).collect()
        assert snappy._last_sample_choice.endswith("sel_s_rf")
        # exact match on a WHERE column
        snappy.sql(
            "SELECT COUNT(*) AS n, l_linestatus FROM sel_base "
            "WHERE l_linestatus = 'O' GROUP BY l_linestatus WITH ERROR"
        ).collect()
        assert snappy._last_sample_choice.endswith("sel_s_ls")
        # exact two-column match beats both single-column subsets
        snappy.sql(
            "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM sel_base "
            "GROUP BY l_returnflag, l_linestatus WITH ERROR"
        ).collect()
        assert snappy._last_sample_choice.endswith("sel_s_both")
        # no exact/superset: subset with most matching columns
        snappy.sql(
            "SELECT l_returnflag, l_shipdate, COUNT(*) AS n FROM sel_base "
            "GROUP BY l_returnflag, l_shipdate WITH ERROR"
        ).collect()
        assert snappy._last_sample_choice.endswith("sel_s_rf")
    finally:
        for t in ("sel_s_rf", "sel_s_ls", "sel_s_both", "sel_base"):
            snappy.drop_table(t)


def test_with_error_confidence_and_behavior(snappy, sf_dir):
    """Full SDE grammar (docs/sde/running_queries.md:10-15): CONFIDENCE
    scales the CI width (99% wider than 80%), BEHAVIOR governs rows whose
    relative error exceeds the fraction — local_omit drops them, strict
    raises, run_on_full_table returns exact values with zero-width CIs."""
    lineitem = snappy.spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    snappy.create_table("beh_base", df=lineitem)
    snappy.sql(
        "CREATE SAMPLE TABLE beh_sample ON beh_base "
        "OPTIONS (qcs 'l_returnflag', fraction '0.2')"
    )
    q = (
        "SELECT l_returnflag, SUM(l_extendedprice) AS rev FROM beh_base "
        "GROUP BY l_returnflag WITH ERROR 0.5 CONFIDENCE {c} BEHAVIOR 'do_nothing'"
    )
    w99 = {
        r.l_returnflag: r.upper_bound - r.lower_bound
        for r in snappy.sql(q.format(c="0.99")).collect()
    }
    w80 = {
        r.l_returnflag: r.upper_bound - r.lower_bound
        for r in snappy.sql(q.format(c="0.80")).collect()
    }
    assert all(w99[k] > w80[k] for k in w99)

    # an impossibly tight error bound forces every behavior branch
    tight = ("SELECT l_returnflag, SUM(l_extendedprice) AS rev FROM beh_base "
             "GROUP BY l_returnflag WITH ERROR 0.0000000001 BEHAVIOR '{b}'")
    assert snappy.sql(tight.format(b="local_omit")).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="strict"):
        snappy.sql(tight.format(b="strict")).count()
    exact = {r.l_returnflag: r for r in snappy.sql(
        tight.format(b="run_on_full_table")).collect()}
    true = {
        r.l_returnflag: r.s
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("s"))
        .collect()
    }
    for k, row in exact.items():
        assert row.rev == true[k]
        assert row.relative_error == 0.0
        assert row.lower_bound == row.rev == row.upper_bound
    partial = snappy.sql(tight.format(b="partial_run_on_base_table"))
    got = {r.l_returnflag: r.rev for r in partial.collect()}
    assert got == {k: r.rev for k, r in exact.items()}
    snappy.drop_table("beh_sample")
    snappy.drop_table("beh_base")


def test_create_and_query_approx_ts_topk(snappy, sf_dir):
    """createApproxTSTopK / queryApproxTSTopK (SnappySession.scala:
    958-1026, 2162-2167): materialized per-window top-k panel, range
    queries merge window partials without touching base rows."""
    ev = snappy.spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", (F.col("ts") / 1_000_000_000).cast("timestamp")
    ) if dict(snappy.spark.read.parquet(f"{sf_dir}/events.parquet").dtypes).get("ts") == "bigint" else snappy.spark.read.parquet(f"{sf_dir}/events.parquet")
    snappy.create_table("tk_events", df=ev)
    snappy.create_approx_ts_topk(
        "tk_types", "tk_events", "event_type", "ts", k=3, window="1 hour"
    )
    top = snappy.query_approx_ts_topk("tk_types")
    rows = top.collect()
    assert 0 < len(rows) <= 3
    # merged range counts must equal exact counts for the top keys
    exact = {
        r.event_type: r.n
        for r in snappy.table("tk_events").groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert r.estimated_count == exact[r.event_type]
    # bounded range query
    lo = snappy.table("tk_events").agg(F.min("ts")).first()[0]
    some = snappy.query_approx_ts_topk(
        "tk_types", start_time=str(lo), k=2
    ).collect()
    assert len(some) <= 2
    with pytest.raises(ValueError, match="topk"):
        snappy.query_approx_ts_topk("tk_events")
    snappy.drop_table("tk_types")
    snappy.drop_table("tk_events")


def test_ht_estimate_exact_under_mixed_stratum_weights(spark):
    """Per-row Horvitz-Thompson: with a reservoir-floored rare stratum
    (weight 1, fully kept) aggregated together with a heavily-sampled
    common stratum, SUM/COUNT estimates must weight each ROW by its own
    stratum weight — averaging the weights first inflates the rare
    stratum's contribution by orders of magnitude."""
    from snappydata_spark import aqp
    from snappydata_spark.aqp import WEIGHT_COL, SampleTable

    # rare stratum: 3 rows fully kept (w=1, y=1000 each)
    # common stratum: 5 sampled rows representing 100 each (w=100, y=1)
    rows = [("rare", 1000.0, 1.0)] * 3 + [("common", 1.0, 100.0)] * 5
    sample = spark.createDataFrame(
        rows, f"grp string, y double, {WEIGHT_COL} double"
    )
    st = SampleTable(sample, ["grp"], {"*": 0.01}, -1)
    got = aqp.approx_agg(st, [], "y", agg="sum").collect()[0]
    # exact HT: 3*1*1000 + 5*100*1 = 3500
    assert got.estimate == 3500.0
    got = aqp.approx_agg(st, [], "y", agg="count").collect()[0]
    assert got.estimate == 503.0  # 3*1 + 5*100
    got = aqp.approx_agg(st, [], "y", agg="avg").collect()[0]
    assert abs(got.estimate - 3500.0 / 503.0) < 1e-4  # output rounds to 4dp
    # fully-kept sample (all weights 1): zero sampling variance
    full = spark.createDataFrame(
        [("a", 5.0, 1.0)] * 4, f"grp string, y double, {WEIGHT_COL} double"
    )
    st_full = SampleTable(full, ["grp"], {"*": 1.0}, -1)
    got = aqp.approx_agg(st_full, [], "y", agg="sum").collect()[0]
    assert got.estimate == 20.0 and got.absolute_error == 0.0


def test_hll_differential_registers_accuracy(spark, sf_dir):
    """The differentially-verified HLL (ev_hll_registers /
    ev_hll_estimate_exact): estimate within the ~1.04/sqrt(m) HLL error
    regime of the exact distinct count (m=256 -> ~6.5%; assert 15% for
    slack), and the register frame is bounded by m rows."""
    from snappydata_spark.operators import QUERIES

    regs = QUERIES["ev_hll_registers"](spark, sf_dir).collect()
    assert 0 < len(regs) <= 256
    assert all(1 <= r.max_rho <= 53 for r in regs)
    row = QUERIES["ev_hll_estimate_exact"](spark, sf_dir).collect()[0]
    assert row.rel_err <= 0.15
    assert row.present + row.zeros == row.m == 256


def test_cms_overcount_never_negative(spark, sf_dir):
    """Count-min property on the verified sketch: estimates never
    undercount (min over rows >= true count), and with 5 event types in
    64 buckets collisions are rare enough that most estimates are exact."""
    from snappydata_spark.operators import QUERIES

    rows = QUERIES["ev_cms_topk_estimate"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.overcount >= 0 for r in rows)
    assert sum(1 for r in rows if r.overcount == 0) >= len(rows) // 2


def test_hashed_sample_bounds_cover_truth(spark, sf_dir):
    """The deterministic hash sample's 95% CI covers the true revenue
    for (at least most of) the strata — the statistical contract of the
    WITH ERROR surface, here on a fully differentially-verified path."""
    from pyspark.sql import functions as F

    from snappydata_spark.operators import QUERIES

    est = {
        r.l_returnflag: r
        for r in QUERIES["aqp_sample_hashed_estimate"](spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    true = {
        r.l_returnflag: float(r.rev)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_extendedprice").alias("rev"))
        .collect()
    }
    covered = sum(
        1
        for flag, r in est.items()
        if float(r.lower_bound) <= true[flag] <= float(r.upper_bound)
    )
    assert covered >= len(est) - 1  # 95% CI: allow one miss


def test_kmv_estimates_within_bound(spark, sf_dir):
    """KMV accuracy contract: relative error within ~2.5/sqrt(k) of the
    exact distinct count (k=64 -> ~31% worst-case; typical much
    tighter), exact regime when fewer than k hashes were kept, and the
    merged-union estimate >= each side's exact count monotonicity."""
    from snappydata_spark.operators import QUERIES

    per = {r.event_type: r for r in
           QUERIES["ev_kmv_distinct_by_type"](spark, sf_dir).collect()}
    for r in per.values():
        if r.n_kept < 64:
            assert r.est == float(r.exact_distinct)
        else:
            assert r.rel_err <= 0.31
    uni = QUERIES["ev_kmv_union_pairs"](spark, sf_dir).collect()
    assert len(uni) > 0
    for r in uni:
        assert r.rel_err <= 0.31
        assert r.exact_union >= max(
            per[r.ta].exact_distinct, per[r.tb].exact_distinct
        )


def test_sample_table_maintained_through_mutations(spark, snappy):
    """Sample tables stay fresh through base mutations (the reference's
    AQP maintains samples as data arrives): inserted rows get the same
    deterministic per-row draw, deleted rows leave the sample, and HT
    weights re-realize."""
    from pyspark.sql import functions as F

    base = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    snappy.create_table("smp_base", options={"key_columns": "k"}, df=base)
    snappy.sql(
        "CREATE SAMPLE TABLE smp_s ON smp_base OPTIONS (qcs 'grp', fraction '0.2')"
    )
    n0 = snappy.table("smp_s").count()
    assert 0 < n0 < 4000
    # insert a new slab: the maintained sample must include ~fraction of it
    extra = spark.range(4000, 8000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    snappy.insert("smp_base", extra)
    s_after = snappy.table("smp_s")
    n1 = s_after.count()
    assert n1 > n0
    assert s_after.filter("k >= 4000").count() > 0
    # weights stay HT-consistent: estimated total rows ~= 8000
    est = s_after.agg(
        F.sum("snappy_sampler_weightage").alias("e")
    ).collect()[0].e
    assert abs(est - 8000) / 8000 < 0.05
    # delete a key range: its sampled rows leave the sample
    snappy.sql("DELETE FROM smp_base WHERE k < 1000")
    assert snappy.table("smp_s").filter("k < 1000").count() == 0
    snappy.drop_table("smp_s")
    snappy.drop_table("smp_base")


def test_topk_table_order_by_asc_and_commas_in_select(snappy, spark, sf_dir):
    """Review fixes: (a) TOPK TABLE ORDER BY EstimatedValue ASC ranks
    over ALL merged keys (bottom-k, not the reversed top-k); (b) WITH
    ERROR select lists split on top-level commas only, so
    comma-bearing expressions keep their aliases."""
    from snappydata_spark.tables import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"]
    snappy.create_table("tko_base", df=events, options={"key_columns": "event_id"})
    snappy.sql(
        "CREATE TOPK TABLE tko ON tko_base OPTIONS "
        "(key 'event_type', timeSeriesColumn 'ts', timeInterval '1h', "
        "size '50')"
    )
    try:
        true = {
            r.event_type: r.c
            for r in events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        bottom2 = sorted(true.items(), key=lambda kv: (kv[1], kv[0]))[:2]
        got = snappy.sql(
            "SELECT * FROM tko ORDER BY EstimatedValue ASC LIMIT 2"
        ).collect()
        assert [(r.event_type, r.EstimatedValue) for r in got] == bottom2
    finally:
        snappy.drop_table("tko")
        snappy.drop_table("tko_base")
    # (b) comma-bearing select expression in WITH ERROR
    lineitem = snappy.spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    snappy.create_table("wec_base", df=lineitem)
    snappy.sql(
        "CREATE SAMPLE TABLE wec_s ON wec_base "
        "OPTIONS (qcs 'l_returnflag', fraction '0.3')"
    )
    try:
        out = snappy.sql(
            "SELECT substr(l_returnflag, 1, 1) AS f, COUNT(*) AS n "
            "FROM wec_base GROUP BY substr(l_returnflag, 1, 1) WITH ERROR"
        )
        assert "f" in out.columns
        assert out.count() == lineitem.select("l_returnflag").distinct().count()
    finally:
        snappy.drop_table("wec_s")
        snappy.drop_table("wec_base")


def test_topk_table_maintained_through_base_mutations(snappy, spark, sf_dir):
    """sketching.md: synopses update as data arrives — batch mutations
    of the base re-derive the TOPK panel (inserts raise counts, deletes
    lower them), preserving frequencyCol semantics."""
    from snappydata_spark.tables import load_tables

    events = load_tables(spark, sf_dir, ("events",))["events"].limit(200)
    snappy.create_table(
        "tkm_base", options={"key_columns": "event_id"}, df=events
    )
    snappy.sql(
        "CREATE TOPK TABLE tkm ON tkm_base OPTIONS "
        "(key 'event_type', timeSeriesColumn 'ts', timeInterval '1h', "
        "size '50')"
    )
    try:
        before = {
            r.event_type: r.EstimatedValue
            for r in snappy.sql("SELECT * FROM tkm").collect()
        }
        # insert a burst of a brand-new type
        ts = events.select("ts").limit(1).collect()[0].ts
        burst = spark.createDataFrame(
            [(10_000_000 + i, ts, 1, "zz_new", 1.0, None) for i in range(25)],
            snappy.table("tkm_base").schema,
        )
        snappy.insert("tkm_base", burst)
        after = {
            r.event_type: r.EstimatedValue
            for r in snappy.sql("SELECT * FROM tkm").collect()
        }
        assert after.get("zz_new") == 25
        for k, v in before.items():
            assert after.get(k) == v
        # deletes lower the counts
        snappy.sql("DELETE FROM tkm_base WHERE event_type = 'zz_new'")
        final = {
            r.event_type: r.EstimatedValue
            for r in snappy.sql("SELECT * FROM tkm").collect()
        }
        assert "zz_new" not in final
    finally:
        snappy.drop_table("tkm")
        snappy.drop_table("tkm_base")


class TestSketchTopK:
    def _mk(self, snappy, spark, n_keys, name):
        rows = [
            (i, f"2024-01-01 0{i % 3}:10:00", f"k{i % n_keys}")
            for i in range(3000)
        ]
        df = spark.createDataFrame(
            rows, "id long, ts_s string, key string"
        ).select("id", F.col("ts_s").cast("timestamp").alias("ts"), "key")
        snappy.create_table(f"{name}_base", options={"key_columns": "id"}, df=df)
        snappy.sql(
            f"CREATE TOPK TABLE {name} ON {name}_base OPTIONS "
            "(key 'key', timeSeriesColumn 'ts', timeInterval '1h', "
            "size '5', sketch 'true')"
        )

    def test_state_bounded_under_cardinality_blowup(self, snappy, spark):
        """100x more distinct keys must NOT grow the stored state: the
        candidate panel stays <= size*4 rows/window and the CMS stays
        <= D*W cells/window (the clearspring contract the exact panel
        cannot make)."""
        self._mk(snappy, spark, 10, "tks_small")
        self._mk(snappy, spark, 1000, "tks_big")
        windows = 3
        for name in ("tks_small", "tks_big"):
            panel_rows = snappy.table(name).count()
            cms_rows = snappy.table(f"{name}__cms").count()
            assert panel_rows <= 20 * windows, (name, panel_rows)
            assert cms_rows <= 4 * 64 * windows, (name, cms_rows)

    def test_estimates_overcount_never_under(self, snappy, spark):
        """CMS property: EstimatedValue >= exact count for every
        reported key, and ErrorBoundsInfo is a REAL nonzero bound that
        covers the overcount."""
        self._mk(snappy, spark, 200, "tks_cms")
        got = snappy.sql(
            "SELECT * FROM tks_cms ORDER BY EstimatedValue DESC LIMIT 5"
        ).collect()
        assert len(got) == 5
        exact = {
            r.key: r.c
            for r in snappy.table("tks_cms_base")
            .groupBy("key").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        for r in got:
            assert r.EstimatedValue >= exact[r.key]
            assert r.ErrorBoundsInfo > 0
            assert r.EstimatedValue - exact[r.key] <= r.ErrorBoundsInfo

    def test_time_range_reads_merge_cells(self, snappy, spark):
        """startTime/endTime reads merge only the range's cells — a
        1-window range estimates that window's counts, not the total."""
        self._mk(snappy, spark, 10, "tks_rng")
        one = snappy.sql(
            "SELECT * FROM tks_rng WHERE startTime='2024-01-01 00:00:00' "
            "AND endTime='2024-01-01 01:00:00' "
            "ORDER BY EstimatedValue DESC LIMIT 3"
        ).collect()
        all_w = snappy.sql(
            "SELECT * FROM tks_rng ORDER BY EstimatedValue DESC LIMIT 3"
        ).collect()
        assert one and all_w
        assert max(r.EstimatedValue for r in one) < max(
            r.EstimatedValue for r in all_w
        )

    def test_base_mutation_rederives_sketch(self, snappy, spark):
        """Batch mutations of the base re-derive the sketch structure
        (the r6 panel-maintenance contract, now for sketch mode): new
        rows shift the estimates; the companion CMS table follows."""
        self._mk(snappy, spark, 10, "tks_mut")
        before = snappy.sql(
            "SELECT * FROM tks_mut ORDER BY EstimatedValue DESC LIMIT 1"
        ).collect()[0]
        add = spark.createDataFrame(
            [(100000 + i, "2024-01-01 00:20:00", "hotkey") for i in range(500)],
            "id long, ts_s string, key string",
        ).select("id", F.col("ts_s").cast("timestamp").alias("ts"), "key")
        snappy.insert("tks_mut_base", add)
        after = snappy.sql(
            "SELECT * FROM tks_mut ORDER BY EstimatedValue DESC LIMIT 1"
        ).collect()[0]
        assert after.key == "hotkey" and after.EstimatedValue >= 500
        assert before.key != "hotkey"
        # drop cascades to the CMS companion
        snappy.drop_table("tks_mut")
        assert not snappy.catalog.exists("tks_mut__cms")

    def test_stream_updater_rejects_sketch_mode(self, snappy, spark):
        """topk_stream_updater PUT-merges additive exact partials — on a
        sketch panel (CMS estimates + companion cells) that merge would
        corrupt state silently; it must refuse with a clear error."""
        self._mk(snappy, spark, 10, "tks_stream")
        with pytest.raises(ValueError, match="sketch-backed"):
            snappy.topk_stream_updater("tks_stream")


@pytest.mark.parametrize("width", [64, 1024, 8192])
def test_cms_width_geometry_tradeoff(spark, width):
    """The W knob (r8): at every width the CMS state is EXACTLY D*W
    rows once all buckets are touched, and every key's overcount obeys
    the clearspring guarantee est - true <= eps*N = 2N/W — wider sketch,
    tighter estimates, linearly more (still bounded) state."""
    from snappydata_spark import aqp

    n_keys, reps = 3000, 4  # high cardinality >> W for W=64/1024
    rows = [(f"k{i % n_keys}",) for i in range(n_keys * reps)]
    df = spark.createDataFrame(rows, "key string").withColumn(
        "window_start", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    cells = aqp.topk_cms_cells(df, "key", width=width)
    got = cells.collect()
    # zero cells are omitted (sparse storage), so state is AT MOST D*W
    # rows; at W=64 with 3000 keys every bucket is hit — exactly D*W
    assert len(got) <= aqp.TOPK_CMS_D * width
    if width == 64:
        assert len(got) == aqp.TOPK_CMS_D * width
    n = n_keys * reps
    eps_n = 2.0 * n / width
    keys = df.select("key").distinct()
    est = {
        r.key: r.est
        for r in aqp.topk_cms_probe(cells, keys, "key", width=width).collect()
    }
    # the clearspring guarantee is probabilistic: P(over > eps*N) <=
    # delta = 2^-D per key — assert the realized violation RATE, not the
    # max (at W=8192 eps*N is ~3, so a single 4-row collision may exceed
    # it; what the knob buys is the rate and magnitude shrinking)
    violators = sum(1 for k in est if est[k] - reps > eps_n)
    assert violators / n_keys <= 2.0 ** -aqp.TOPK_CMS_D, (width, violators)
    assert all(est[k] >= reps for k in est)  # never undercounts
    if width == 8192:
        # wide sketch at this load: collisions nearly vanish
        assert max(est[k] - reps for k in est) <= reps * 4


def test_stream_summary_eviction_contract(spark):
    """aqp.stream_summary_state implements the clearspring
    offerReturnAll rule (StreamSummary.java): capacity-bounded counters,
    min-count eviction, evicted-then-readmitted keys inherit
    count = min + inc and error = min; cnt - err never exceeds the true
    count; a key hot enough to stay monitored ends at err 0."""
    from snappydata_spark import aqp

    # stream: 'hot' every other event, cold keys c0..c9 cycling — with
    # capacity 4 the cold keys perpetually evict each other
    seq = []
    for i in range(200):
        seq.append((i * 2, "hot"))
        seq.append((i * 2 + 1, f"c{i % 10}"))
    df = spark.createDataFrame(seq, "pos long, key string")
    out = aqp.stream_summary_state(
        df, "key", capacity=4, order_cols=["pos"]
    ).collect()
    assert len(out) == 4  # capacity-bounded despite 11 distinct keys
    state = {r.key: r for r in out}
    assert state["hot"].cnt == 200 and state["hot"].err == 0
    true = {f"c{j}": 20 for j in range(10)}
    for r in out:
        if r.key == "hot":
            continue
        assert r.err > 0          # inherited an evicted slot
        assert r.cnt - r.err <= true[r.key]  # guaranteed min is sound
        assert r.cnt >= true[r.key] - 0      # space-saving never drops below... 
    # determinism: same input, same state, any partitioning
    out2 = aqp.stream_summary_state(
        df.repartition(7), "key", capacity=4, order_cols=["pos"]
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_query_topk_with_guarantees(snappy, sf_dir):
    """with_guarantees merged-range read (clearspring StreamSummary
    merge contract): guaranteed_min = sum of per-window (cnt - err)
    floors.  Invariants: floor <= CMS estimate always; with a key
    universe under the counter capacity (no evictions possible),
    floor == true count == estimate."""
    ev = snappy.spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    snappy.create_table(
        "tkg_events", df=ev.filter(F.col("user_id").isNotNull())
    )
    snappy.sql(
        "CREATE TOPK TABLE tkg ON tkg_events OPTIONS (key 'event_type', "
        "timeSeriesColumn 'ts', timeInterval '24h', size '8', "
        "sketch 'true')"
    )
    out = snappy.query_approx_ts_topk(
        "tkg", k=-1, with_guarantees=True
    ).collect()
    assert out, "no candidates returned"
    exact = {
        r.event_type: r.n
        for r in snappy.table("tkg_events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in out:
        assert r.guaranteed_min <= r.estimated_count
        # event_type cardinality (~6) < capacity 32: exact everywhere
        assert r.guaranteed_min == exact[r.event_type]
        assert r.estimated_count >= exact[r.event_type]  # CMS never under
    # exact-panel mode: the floor IS the estimate
    snappy.create_approx_ts_topk(
        "tkg_exact", "tkg_events", "event_type", "ts", k=3, window="24 hours"
    )
    for r in snappy.query_approx_ts_topk(
        "tkg_exact", with_guarantees=True
    ).collect():
        assert r.guaranteed_min == r.estimated_count
    snappy.drop_table("tkg_exact")
    snappy.drop_table("tkg")
    snappy.drop_table("tkg_events")


def test_cms_sketch_from_type_counts_matches_per_event_explode(spark):
    """r13 aggregate-before-explode rewrite: the sketch built from
    per-type counts must equal the per-event-row explode cell-for-cell
    (CMS cells are additive over the event types hashing into them)."""
    from pyspark.sql import functions as F

    from snappydata_spark.operators import aqp_ops

    rows = [(f"type{i % 7}",) for i in range(500)] + [("rare",)] * 3
    ev = spark.createDataFrame(rows, "event_type string")
    # old shape: explode every event row into D cells, count per cell
    cells = ev.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(aqp_ops.CMS_D - 1))
        ).alias("row_idx"),
        "event_type",
    ).select(
        "row_idx",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cms"),
                            F.col("row_idx").cast("string"),
                            F.lit("~"),
                            F.col("event_type"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % aqp_ops.CMS_W
        ).alias("bucket"),
    )
    old = {
        (r.row_idx, r.bucket): r.cnt
        for r in cells.groupBy("row_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    per_type = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    new = {
        (r.row_idx, r.bucket): r.cnt
        for r in aqp_ops._cms_sketch_from_type_counts(per_type).collect()
    }
    assert new == old

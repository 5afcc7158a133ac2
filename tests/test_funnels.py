"""Event-analytics (funnel/retention/journey) and corpus-hygiene ops."""

from pyspark.sql import functions as F

from snappydata_spark.operators.funnels import (
    ev_funnel_steps,
    ev_journey_paths,
    ev_retention_cohort,
)
from snappydata_spark.operators.privacy import txt_pii_redact, txt_url_normalize


def test_funnel_steps_monotone(spark, sf_dir):
    rows = {r["step"]: r["users"] for r in ev_funnel_steps(spark, sf_dir).collect()}
    assert set(rows) == {
        "step1_view",
        "step2_click_after_view",
        "step3_purchase_after_click",
    }
    # an ordered funnel can only narrow at each step
    assert rows["step1_view"] >= rows["step2_click_after_view"]
    assert rows["step2_click_after_view"] >= rows["step3_purchase_after_click"]
    assert rows["step1_view"] > 0


def test_retention_cohort_week0_covers_users(spark, sf_dir):
    from snappydata_spark.tables import load_tables

    df = ev_retention_cohort(spark, sf_dir)
    n_users = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .select("user_id")
        .distinct()
        .count()
    )
    # every user is active in their own cohort week, so offset-0 counts
    # across cohorts must sum to the full user population
    week0 = (
        df.filter(F.col("week_offset") == 0)
        .agg(F.sum("active_users"))
        .collect()[0][0]
    )
    assert week0 == n_users
    assert df.filter(F.col("week_offset") < 0).count() == 0


def test_journey_paths_bounded_and_positive(spark, sf_dir):
    rows = ev_journey_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["users"] > 0
        assert 1 <= len(r["path"].split(">")) <= 3


def test_pii_redact_counts_follow_plant_rule(spark, sf_dir):
    rows = txt_pii_redact(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["emails_found"] == (1 if r["doc_id"] % 3 == 0 else 0)
        assert r["phones_found"] == (1 if r["doc_id"] % 5 == 0 else 0)
        assert r["ips_found"] == (1 if r["doc_id"] % 4 == 0 else 0)


def test_url_normalize_hosts_canonical(spark, sf_dir):
    rows = txt_url_normalize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        host = r["host"]
        assert host == host.lower()
        assert not host.startswith("www.")
        assert host.endswith(".example.com")
        assert r["n_urls"] >= r["n_paths"] > 0

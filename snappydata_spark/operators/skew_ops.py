"""Skew-remedy joins as registry queries (SURVEY.md §8.2): the salted
and hot-key-split plans from snappydata_spark.skew, each hash-checked
against the PLAIN join's SQL oracle — the remedies must be invisible in
the result, which is exactly what the differential proves.

The reference leans on its hash-partitioned store + per-bucket joins for
skew (PartitionedPhysicalScan); on vanilla shuffle joins the equivalent
defenses are AQE skew splitting (on in get_spark) plus these two
rewrites for the planned-ahead case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from snappydata_spark.operators.registry import register
from snappydata_spark.skew import hot_key_split, salted_join
from snappydata_spark.tables import load_tables

_PLAIN_ORACLE = """
SELECT c.c_nationkey AS nation,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_nationkey
"""


def _events_customer(spark: SparkSession, sf_dir: str):
    t = load_tables(spark, sf_dir, ("events", "customer"))
    cust = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    return t["events"], cust


def _rollup(joined: DataFrame) -> DataFrame:
    # decimal accumulation: 25 nation groups absorb the whole scaling
    # events table, where double sums drift a cent with partition order
    return joined.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2)"
            " AS DOUBLE) AS total_value"
        ),
    )


@register("join_skew_salted", oracle=_PLAIN_ORACLE)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join (skew.salted_join): big side salted by a deterministic
    hash of event_id into 8 sub-keys, small side exploded 8×.  A hot
    user_id's rows spread over 8 shuffle partitions instead of pinning
    one straggler task; the oracle is the PLAIN join — salting must not
    change a single row."""
    events, cust = _events_customer(spark, sf_dir)
    return _rollup(salted_join(events, cust, ["user_id"], salt=8))


@register("join_skew_hot_split", oracle=_PLAIN_ORACLE)
def join_skew_hot_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-path skew join (skew.hot_key_split): the measured hottest keys
    (here: users with > 80 events — the cheap pre-count a real pipeline
    runs) take a broadcast join, the long tail takes the shuffle join,
    results union.  Same plain-join oracle: the split is invisible."""
    events, cust = _events_customer(spark, sf_dir)
    hot = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 80)
        .select("user_id")
    )
    return _rollup(hot_key_split(events, cust, ["user_id"], hot_keys=hot))

"""asof_join / range_join unit semantics (backward/forward/tolerance,
range bounds) on a hand-computable fixture."""

import pytest
from pyspark.sql import functions as F

from snappydata_spark import timeseries


@pytest.fixture(scope="module")
def fixture(spark):
    left = spark.createDataFrame(
        [("u1", 100, "l1"), ("u1", 205, "l2"), ("u2", 50, "l3")],
        "k string, sec int, lid string",
    ).select("k", F.col("sec").cast("timestamp").alias("ts"), "lid")
    right = spark.createDataFrame(
        [("u1", 90, "r1"), ("u1", 100, "r2"), ("u1", 300, "r3"), ("u3", 1, "r4")],
        "k string, sec int, rid string",
    ).select("k", F.col("sec").cast("timestamp").alias("ts"), "rid")
    return left, right


def _m(df):
    return {r.lid: r.rid_r for r in df.collect()}


def test_asof_backward(fixture):
    left, right = fixture
    out = timeseries.asof_join(left, right, on="ts", by=("k",))
    # l1@100: r2@100 matches on tie (>=); l2@205: last before is r2;
    # l3 (u2): no right rows → null
    assert _m(out) == {"l1": "r2", "l2": "r2", "l3": None}


def test_asof_forward(fixture):
    left, right = fixture
    out = timeseries.asof_join(left, right, on="ts", by=("k",), direction="forward")
    assert _m(out) == {"l1": "r2", "l2": "r3", "l3": None}


def test_asof_tolerance(fixture):
    left, right = fixture
    out = timeseries.asof_join(left, right, on="ts", by=("k",), tolerance=30)
    # l2@205 ← r2@100 is 105s away → nulled by tolerance
    assert _m(out) == {"l1": "r2", "l2": None, "l3": None}


def test_range_join_bounds(spark):
    left = spark.createDataFrame([("u1", 100, "e1")], "k string, sec int, eid string")
    left = left.select("k", F.col("sec").cast("timestamp").alias("ts"), "eid")
    right = spark.createDataFrame(
        [("u1", 99, "a"), ("u1", 100, "b"), ("u1", 699, "c"), ("u1", 700, "d")],
        "k string, sec int, rid string",
    ).select("k", F.col("sec").cast("timestamp").alias("ts"), "rid")
    out = timeseries.range_join(
        left, right, by=("k",), left_ts="ts", right_ts="ts",
        lower_seconds=0, upper_seconds=600,
    )
    # [100, 700): includes b@100 and c@699; excludes a@99 and d@700
    assert sorted(r["rid"] for r in out.select(F.col("r.rid")).collect()) == ["b", "c"]


def test_asof_join_null_right_field_stays_null(spark):
    """A NULL column in the matched right row must come through as NULL —
    not spliced with the previous row's value for that column (every
    carried field must originate from the SAME matched row)."""
    from snappydata_spark.timeseries import asof_join

    right = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5.0, 6.0),
            (1, "2024-01-01 10:05:00", None, 7.0),
        ],
        "user_id int, ts string, bid double, ask double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:06:00", "q")], "user_id int, ts string, tag string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    row = asof_join(left, right, on="ts", by=("user_id",)).collect()[0]
    assert row.ask_r == 7.0
    assert row.bid_r is None  # NOT 5.0 from the older row

    # with tolerance: both fields must match-or-null together
    row = asof_join(
        left, right, on="ts", by=("user_id",), tolerance=30
    ).collect()[0]
    assert row.ask_r is None and row.bid_r is None  # 10:00 row is 6 min away

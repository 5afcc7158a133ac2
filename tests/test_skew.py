"""Salted and hot-key-split joins must be result-equivalent to the plain
join while spreading hot keys across partitions."""

import pytest
from pyspark.sql import functions as F

from snappydata_spark import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on key 7
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    return big, small


def _canon(df):
    return sorted((r.k, r.payload, r.dim) for r in df.collect())


def test_salted_join_equivalent(skewed):
    big, small = skewed
    plain = big.join(small, ["k"])
    salted = skew.salted_join(big, small, ["k"], salt=8, salt_on="payload")
    assert _canon(salted) == _canon(plain)


def test_salted_join_spreads_hot_key(skewed, spark):
    big, small = skewed
    salted = skew.salted_join(big, small, ["k"], salt=8, salt_on="payload")
    # the hot key's rows must land in >1 shuffle partition: check the
    # salt derivation directly (pmod(xxhash64(payload), 8) has >1 value
    # among hot-key rows)
    n_salts = (
        big.filter(F.col("k") == 7)
        .select(F.pmod(F.xxhash64("payload"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n_salts > 1
    assert salted.filter(F.col("k") == 7).count() == big.filter(F.col("k") == 7).count()


def test_hot_key_split_equivalent(skewed, spark):
    big, small = skewed
    hot = spark.createDataFrame([(7,)], "k bigint")
    out = skew.hot_key_split(big, small, ["k"], hot)
    assert _canon(out) == _canon(big.join(small, ["k"]))


def test_salted_join_default_salt_varies_within_hot_key(skewed, spark):
    """The DEFAULT salt source must vary WITHIN a key: a per-key-constant
    salt (e.g. hashing the join key itself) puts every hot-key row in one
    partition and mitigates nothing."""
    big, small = skewed
    plain = big.join(small, ["k"])
    salted = skew.salted_join(big, small, ["k"], salt=8)  # no salt_on
    assert _canon(salted) == _canon(plain)
    hot = big.filter(F.col("k") == 7)
    n_salts = (
        hot.select(
            F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)).alias("s")
        )
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_salted_join_rejects_right_outer(skewed):
    big, small = skewed
    with pytest.raises(ValueError, match="inner/left"):
        skew.salted_join(big, small, ["k"], how="right")


def test_hot_key_split_right_outer_no_duplicates(spark):
    """Right/full outer through the two-path plan: hot `other` rows must
    not reappear as unmatched cold rows (the cold path excludes the hot
    key set from BOTH sides)."""
    big = spark.createDataFrame(
        [(7, "b1"), (7, "b2"), (1, "b3")], "k int, bval string"
    )
    other = spark.createDataFrame(
        [(7, "o_hot"), (1, "o1"), (2, "o_unmatched")], "k int, oval string"
    )
    hot = spark.createDataFrame([(7,)], "k int")
    for how in ("right", "full"):
        got = skew.hot_key_split(big, other, ["k"], hot, how=how)
        plain = big.join(other, ["k"], how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, plain.collect())
        ), how

"""Skew-aware join helpers.

At 100 TB a handful of hot keys (the null key, a default user, a viral
document) can pin one shuffle partition at hours while the rest finish in
seconds.  Two remedies, composable with AQE's skew-join splitting
(spark.sql.adaptive.skewJoin.enabled, on by default in get_spark):

- ``salted_join``: explode the *small* side S ways and salt the big side
  randomly-but-deterministically (hash of a stable column, not rand(), so
  retries/speculative tasks stay consistent).  The hot key's rows spread
  over S partitions; join cost grows by |small| × S, usually trivial.
- ``hot_key_split``: the reference-style two-path plan — broadcast-join
  the hot keys, shuffle-join the long tail, union.  Best when the hot-key
  set is tiny and known (or measured with a cheap count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt: int = 8,
    how: str = "inner",
    salt_on: str | None = None,
) -> DataFrame:
    """Equi-join with the big side salted into `salt` sub-keys.

    `salt_on`: a stable big-side column to derive the salt from (defaults
    to the first join key — any column with per-row variety works; using
    a hash instead of rand() keeps task retries deterministic).
    """
    salt_src = salt_on or big.columns[0]
    b = big.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt)))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = b.join(s, keys + ["__salt"], how)
    return out.drop("__salt")


def hot_key_split(
    big: DataFrame,
    other: DataFrame,
    keys: list[str],
    hot_keys: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """Two-path skew join: rows whose key is in `hot_keys` (a small
    DataFrame of the join-key columns) go through a broadcast join; the
    long tail goes through the normal shuffle join; results union.
    Works because the hot slice × other-side-per-key is small enough to
    broadcast precisely when keys are few and hot."""
    hot = F.broadcast(hot_keys.select(*keys).distinct())
    big_hot = big.join(hot, keys, "left_semi")
    big_cold = big.join(hot, keys, "left_anti")
    other_hot = other.join(hot, keys, "left_semi")
    hot_joined = big_hot.join(F.broadcast(other_hot), keys, how)
    cold_joined = big_cold.join(other, keys, how)
    return hot_joined.unionByName(cold_joined)

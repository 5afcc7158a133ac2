"""Skew-aware join helpers.

At 100 TB a handful of hot keys (the null key, a default user, a viral
document) can pin one shuffle partition at hours while the rest finish in
seconds.  Two remedies, composable with AQE's skew-join splitting
(spark.sql.adaptive.skewJoin.enabled, on by default in get_spark):

- ``salted_join``: explode the *small* side S ways and salt the big side
  randomly-but-deterministically (hash of the whole row, not rand(), so
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

    `salt_on`: a big-side column to derive the salt from.  It must VARY
    WITHIN a join key (a per-event id, a timestamp) or the hot key's rows
    all hash to one salt and nothing spreads; the default hashes the
    ENTIRE row, which varies within a key unless rows are full
    duplicates.  A hash instead of rand() keeps task retries
    deterministic.

    Only inner and left joins are supported: salting explodes the small
    side `salt`-fold, so join types where unmatched small-side rows
    surface (right/full outer) would emit each of them `salt` times.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: the "
            "exploded small side would duplicate its unmatched rows "
            f"{salt}x under right/full outer (swap the sides instead)"
        )
    if salt_on is not None:
        salt_expr = F.xxhash64(F.col(salt_on))
    else:
        salt_expr = F.xxhash64(*[F.col(c) for c in big.columns])
    b = big.withColumn("__salt", F.pmod(salt_expr, F.lit(salt)))
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
    broadcast precisely when keys are few and hot.

    BOTH sides split on the hot set — the cold path must exclude the hot
    keys from `other` too, or right/full outer joins would surface each
    hot `other` row a second time as an unmatched cold row."""
    hot = F.broadcast(hot_keys.select(*keys).distinct())
    big_hot = big.join(hot, keys, "left_semi")
    big_cold = big.join(hot, keys, "left_anti")
    other_hot = other.join(hot, keys, "left_semi")
    other_cold = other.join(hot, keys, "left_anti")
    hot_joined = big_hot.join(F.broadcast(other_hot), keys, how)
    cold_joined = big_cold.join(other_cold, keys, how)
    return hot_joined.unionByName(cold_joined)

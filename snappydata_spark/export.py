"""Training-data export: deterministic shuffled shard writer.

The last stage of a corpus pipeline: a *global shuffle* of the training
rows (SGD wants neighboring rows decorrelated) split into a fixed number
of shard files consumable by a data loader.

Scale design: the shuffle is a HASH, not a sort — shard id and
within-shard order both derive from md5(seed || key), so the layout is
(a) deterministic for a given (seed, key set) regardless of input
partitioning or cluster size, (b) reproducible across engines, and
(c) one single shuffle (repartition on shard) with no global sort
barrier.  Each executor writes only its shards; nothing funnels through
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from snappydata_spark.functions.text import hash32


def shard_assignment(
    df: DataFrame, key_col: str, n_shards: int, seed: str = "shard~"
) -> DataFrame:
    """Attach `shard` (0..n_shards-1) and `shuffle_rank` columns — the
    deterministic shuffled layout, exposed as a transformation so it can
    be inspected/tested without writing."""
    h = hash32(F.col(key_col).cast("string"), seed)
    return df.withColumn("shard", (h % n_shards).cast("int")).withColumn(
        "shuffle_rank", h
    )


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: str = "shard~",
    fmt: str = "parquet",
) -> None:
    """Write `df` as `path/shard=K/` partitions, rows shuffled
    deterministically by md5(seed || key).  Re-running with the same seed
    and keys reproduces byte-identical shard membership."""
    out = shard_assignment(df, key_col, n_shards, seed)
    # key_col tie-break: shuffle_rank is a 32-bit hash (collisions are
    # certain beyond ~100k rows) and duplicate keys share a rank — tied
    # rows would otherwise emit in input-partition order, which varies
    # across runs and breaks the byte-identical contract
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_rank", key_col)
        .write.format(fmt)
        .partitionBy("shard")
        .mode("overwrite")
        .save(path)
    )

"""A/B for the r13 containment-verify restructure (r12 verdict item 6):
current shape (two array-attach joins + array_intersect) vs an exploded
slim intersection-count (no arrays ever attached to pairs).

Checks result equality (sorted rows) and noop walls for the registry
query dedup_containment's underlying operator at sf0.1.

Usage: python tools/ab_containment.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def current(spark):
    from snappydata_spark import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return dedup.containment_pairs(docs)


def exploded(spark, threshold=0.6, index_shingles=5, max_df=100):
    """Same candidate pipeline; verification = slim intersection count:
    explode each doc's shingle set once (persisted), count (src, dst)
    key matches — no shingle ARRAY ever crosses a pair-keyed exchange."""
    from pyspark.sql import Window as W

    from snappydata_spark.dedup import _shingle_hash_sets

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = _shingle_hash_sets(df, "text", "doc_id", 3).persist()
    probe = docs.select(
        F.col("doc_id"),
        F.size("sh").alias("sz"),
        F.explode(F.slice("sh", 1, index_shingles)).alias("key"),
    )
    index = docs.select(
        F.col("doc_id"),
        F.size("sh").alias("sz"),
        F.explode("sh").alias("key"),
    )
    index = (
        index.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("key")))
        .filter(F.col("df") <= max_df)
        .drop("df")
    )
    cand = (
        probe.alias("a")
        .join(index.alias("b"), "key")
        .filter(
            (F.col("a.doc_id") != F.col("b.doc_id"))
            & (F.col("b.sz") >= threshold * F.col("a.sz"))
        )
        .select(
            F.col("a.doc_id").alias("src"),
            F.col("b.doc_id").alias("dst"),
            F.col("a.sz").alias("sz_a"),
        )
        .distinct()
    )
    ex = docs.select("doc_id", F.explode("sh").alias("key")).persist()
    inter = (
        cand.join(ex.select(F.col("doc_id").alias("src"), "key"), "src")
        .join(
            ex.select(F.col("doc_id").alias("dst"), "key"),
            ["dst", "key"],
        )
        .groupBy("src", "dst", "sz_a")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    cont = F.col("i").cast("double") / F.col("sz_a")
    return (
        inter.withColumn("__cont", cont)
        .filter(F.col("__cont") >= threshold)
        .select("src", "dst", F.round("__cont", 4).alias("containment"))
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from snappydata_spark import get_spark

    spark = get_spark("ab-containment")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    a = sorted(map(tuple, current(spark).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, exploded(spark).collect()))
    spark.catalog.clearCache()
    print(f"rows: current={len(a)} exploded={len(b)} equal={a == b}")

    for name, fn in (("current", current), ("exploded", exploded)):
        noop(fn(spark))
        spark.catalog.clearCache()
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            noop(fn(spark))
            spark.catalog.clearCache()
            runs.append(round(time.time() - t0, 3))
        print(
            f"{name}: median {statistics.median(runs)}s of {runs} "
            f"(load1={os.getloadavg()[0]:.2f})"
        )


if __name__ == "__main__":
    main()

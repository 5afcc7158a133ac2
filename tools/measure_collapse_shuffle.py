"""Measure the exact-dup collapse stage's shuffle-write bytes: array-key
groupBy (the r9 shape — the d-dimensional embedding IS the hash key, so
the shuffle carries 8*d-byte keys) vs the r10 digest-keyed collapse
(md5 of the vector -> 32-byte keys, representative vector rejoined by
id).  Evidence row for BENCH_SF100.md's successor (r9 verdict Wrong#1:
"the collapse shuffle carries vector payloads as keys").

Uses the Spark UI REST API (own session, ui enabled) and attributes
stages to each variant via job groups.

Usage: python tools/measure_collapse_shuffle.py [sf_dir]
Prints one JSON line with wall + shuffle-write bytes per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from snappydata_spark import get_spark

    spark = get_spark(
        "collapse-shuffle-measure", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()  # warm IO

    def run(group, fn):
        sc.setJobGroup(group, group)
        t0 = time.time()
        n = fn().count()
        wall = round(time.time() - t0, 2)
        sc.setJobGroup("idle", "idle")
        return n, wall

    def array_key():
        # r9 shape: the embedding array is the shuffle key
        return (
            emb.groupBy("embedding")
            .agg(F.min("vec_id").alias("vec_id"), F.count(F.lit(1)).alias("n"))
            .select("vec_id", "n", "embedding")
        )

    def digest_key():
        # r10 shape: 32-byte digest keys; representative vector rejoins by id
        grp = (
            emb.select(
                "vec_id", F.md5(F.col("embedding").cast("string")).alias("dg")
            )
            .groupBy("dg")
            .agg(F.min("vec_id").alias("vec_id"), F.count(F.lit(1)).alias("n"))
            .drop("dg")
        )
        return grp.join(emb, "vec_id").select("vec_id", "n", "embedding")

    n_a, wall_a = run("array_key", array_key)
    n_d, wall_d = run("digest_key", digest_key)
    assert n_a == n_d, (n_a, n_d)

    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    stages = {
        s["stageId"]: s
        for s in json.load(urllib.request.urlopen(f"{base}/stages"))
    }
    bytes_by_group: dict[str, int] = {}
    for j in jobs:
        g = j.get("jobGroup")
        if g not in ("array_key", "digest_key"):
            continue
        for sid in j["stageIds"]:
            s = stages.get(sid)
            if s is not None:
                bytes_by_group[g] = bytes_by_group.get(g, 0) + s.get(
                    "shuffleWriteBytes", 0
                )
    print(json.dumps({
        "sf_dir": sf_dir, "groups": int(n_a),
        "array_key": {"wall": wall_a,
                      "shuffle_write_bytes": bytes_by_group.get("array_key")},
        "digest_key": {"wall": wall_d,
                       "shuffle_write_bytes": bytes_by_group.get("digest_key")},
    }))


if __name__ == "__main__":
    main()

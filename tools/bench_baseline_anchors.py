"""Vanilla-PySpark baseline anchors under bench.py's median-of-3
discipline (r9 verdict stretch #9: BASELINE.md's per-query anchors were
round-1 SINGLE-SHOT numbers, so gate-ratio comparisons mixed
methodologies).

What "vanilla" means per query — each anchor is an INDEPENDENT plain
formulation of the same task, not the engine path:

- For 10 of the 16 headline queries the registry's DuckDB oracle text is
  ANSI SQL that Spark parses directly: the anchor runs that SQL through
  `spark.sql` over plain parquet temp views — a formulation written
  independently of the engine's DataFrame code.
- ts_asof_click_to_view / ts_gap_fill / txt_quality_score /
  sim_ivf_topk_vectorized: the registry implementation is itself plain
  DataFrame / pandas-UDF code with no engine machinery (no index, no
  plan cache, no managed store) — it IS the vanilla formulation, the
  same rationale BASELINE.md's round-1 table recorded.
- dedup_minhash_lsh: the r8 addendum pinned the like-for-like anchor as
  the ROUND-1 SHAPE on the current verbatim-dup corpus (plain band
  self-join, quadratic output, no verbatim pre-collapse) — re-measured
  here from the banding substrate directly.
- quickstart_groupby_avg: plain groupBy/avg (the reference's 16-20x
  shape) — vanilla by construction.

Methodology = bench.py's: one warmup run, then median of 3 timed runs,
load1 recorded per query.  Run in a quiet window.  Output: one JSON line
+ BASELINE_ANCHORS.json.

Usage: python tools/bench_baseline_anchors.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3

# headline queries whose DuckDB oracle text is Spark-parsable ANSI SQL
SQL_ANCHORS = [
    "tpch_q01_pricing_summary",
    "tpch_q03_shipping_priority",
    "tpch_q05_local_supplier",
    "tpch_q06_forecast_revenue",
    "tpch_q09_product_profit",
    "tpch_q18_large_orders",
    "win_topk_per_group",
    "ev_sessionize",
    "ev_tumbling_window",
    "agg_cube",
]

# registry implementations that are already plain DataFrame/pandas-UDF
# code with no engine machinery — vanilla by the round-1 rationale
PLAIN_IMPL_ANCHORS = [
    "ts_asof_click_to_view",
    "ts_gap_fill",
    "txt_quality_score",
    "sim_ivf_topk_vectorized",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def naive_minhash_pairs(spark, sf_dir):
    """The round-1 dedup_minhash_lsh shape on the current corpus
    (BASELINE.md r8 addendum): band every doc (verbatim mirrors
    included), plain band-bucket self-join, quadratic DISTINCT pair
    output — no pre-collapse, no signature-digest partials."""
    from pyspark.sql import functions as F

    from snappydata_spark.index_minhash import _band_rows
    from snappydata_spark.operators.dedup_ops import _corpus_dup

    corpus = _corpus_dup(spark, sf_dir)
    b = _band_rows(corpus, "text", "doc_id", 16, 4, 3)
    left = b.select(
        F.col("doc_id").alias("doc1"), "band", "band_hash"
    )
    right = b.select(
        F.col("doc_id").alias("doc2"), "band", "band_hash"
    )
    return (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )


def quickstart_groupby_avg(spark, sf_dir):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.groupBy((F.col("o_custkey") % 100).alias("sym")).agg(
        F.avg("o_totalprice").alias("avg_price")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_ANCHORS.json"

    from pyspark.sql import SparkSession

    from snappydata_spark.operators import ORACLES, QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # PLAIN session: default configs + the two read necessities
    # (events TIMESTAMP(NANOS) + UTC comparison) — no engine confs
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("baseline-anchors")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)

    def anchor_fn(name):
        if name in SQL_ANCHORS:
            sql = ORACLES[name]
            return lambda sp, sd: sp.sql(sql)
        if name in PLAIN_IMPL_ANCHORS:
            return QUERIES[name]
        if name == "dedup_minhash_lsh":
            return naive_minhash_pairs
        if name == "quickstart_groupby_avg":
            return quickstart_groupby_avg
        raise KeyError(name)

    names = (
        SQL_ANCHORS
        + PLAIN_IMPL_ANCHORS
        + ["dedup_minhash_lsh", "quickstart_groupby_avg"]
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm JVM/IO
    anchors: dict[str, dict] = {}
    for name in names:
        fn = anchor_fn(name)
        load1 = round(os.getloadavg()[0], 1)
        fn(spark, sf_dir).count()  # warmup: codegen/classloading
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        anchors[name] = {
            "median": round(statistics.median(runs), 3),
            "min": min(runs),
            "max": max(runs),
            "load1": load1,
        }
        print(f"# {name}: {anchors[name]['median']}s of {runs}", file=sys.stderr)
        spark.catalog.clearCache()

    out = {
        "sf_dir": sf_dir,
        "reps": REPS,
        "method": "1 warmup + median of 3, plain SparkSession",
        "anchors": anchors,
        "total_median": round(sum(v["median"] for v in anchors.values()), 3),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({
        "metric": "vanilla_anchor_total_wall",
        "value": out["total_median"], "unit": "sec",
        "queries": {k: v["median"] for k, v in anchors.items()},
    }))


if __name__ == "__main__":
    main()

"""Quiet-window A/B of individual bench rows between two checkouts
(r12 verdict item 2: re-measure dedup_minhash_lsh /
sim_ivf_topk_vectorized at 32c, HEAD vs the r11 shapes).

Runs bench.py's exact warm methodology (1 warmup + REPS timed .count()
runs, median, clearCache between queries) for the named queries against
the repo rooted at `repo_dir`, printing one JSON line.  Interleave
invocations of this script across checkouts (A B A B) so both sides see
the same weather.

Usage: python tools/ab_rows.py <repo_dir> <q1,q2,...> [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

repo = os.path.abspath(sys.argv[1])
names = sys.argv[2].split(",")
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))

sys.path.insert(0, repo)

from snappydata_spark import get_spark  # noqa: E402
from snappydata_spark.operators import QUERIES  # noqa: E402


def main():
    spark = get_spark("ab-rows")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    out = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, SF_DIR).count()  # warmup
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            runs.append(round(time.time() - t0, 3))
        out[name] = {
            "median": round(statistics.median(runs), 3),
            "runs": runs,
            "load1": round(os.getloadavg()[0], 2),
        }
        spark.catalog.clearCache()
    print(json.dumps({"repo": repo, "rows": out}))


if __name__ == "__main__":
    main()

"""Round-12 optimization measurement harness (guide §1).

Times individual registry queries with the noop sink (computes every
column of every row, discards output — §1.4), REPS timed runs after one
warmup, labels jobs (§1.5), and optionally dumps `.explain("formatted")`
to plans/r12/<name>_<tag>.txt so plan claims are checkable offline.

Usage:
  python tools/opt_measure.py q1,q2,...      # time with noop sink
  python tools/opt_measure.py q1,... --plans before|after   # also dump plans
  python tools/opt_measure.py --all-plans before            # plans only, all queries

Honors $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
PLANS_DIR = os.environ.get(
    "SPARK_GRAFT_PLANS_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    ),
)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from snappydata_spark import get_spark
    from snappydata_spark.operators import QUERIES

    plans_tag = None
    skip_idx = set()
    if "--plans" in sys.argv:
        i = sys.argv.index("--plans")
        plans_tag = sys.argv[i + 1]
        skip_idx.add(i + 1)
    all_plans = None
    if "--all-plans" in sys.argv:
        i = sys.argv.index("--all-plans")
        all_plans = sys.argv[i + 1]
        skip_idx.add(i + 1)
    args = [
        a
        for i, a in enumerate(sys.argv)
        if i > 0 and i not in skip_idx and not a.startswith("--")
    ]
    plans_only = "--plans-only" in sys.argv or all_plans is not None

    names = (
        sorted(QUERIES)
        if all_plans
        else [n for a in args for n in a.split(",") if n]
    )
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("opt-measure")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()  # JVM warm

    tag = plans_tag or all_plans
    if tag:
        os.makedirs(PLANS_DIR, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        if tag:
            try:
                df = fn(spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception as e:  # plan capture must not kill the sweep
                plan = f"EXPLAIN FAILED: {e}"
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
            if plans_only:
                print(f"# plan {name}_{tag}.txt", file=sys.stderr)
                continue
        spark.sparkContext.setJobDescription(f"opt_measure: {name}")
        noop(fn(spark, SF_DIR))  # warmup
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            noop(fn(spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = round(statistics.median(runs), 3)
        print(f"# {name}: {out[name]}s median of {runs}", file=sys.stderr)
        spark.catalog.clearCache()
    if out:
        print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "noop_wall": out}))


if __name__ == "__main__":
    main()

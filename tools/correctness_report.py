"""Full-registry correctness artifact in the driver's exact JSON schema.

The driver's per-round CORRECTNESS_r{N}.json samples a fixed 50-query
subset, so most registry queries never get a driver-side row.  This tool
runs the SAME comparison (row count, lower-cased column-name set,
order-insensitive value hash against the DuckDB oracle) over EVERY
registered query and writes CORRECTNESS_FULL.json at the repo root with
one entry per query:

    {"rows_match": bool|null, "schema_match": bool|null,
     "hash_match": bool|null, "spark_rows": int|null,
     "oracle_rows": int|null, "err": str|null}

No-oracle (approximate-by-design) queries record the driver's weaker
rows-only form: nulls + err="no_oracle".  Reference bar: full-corpus
validation, NorthWindTest.scala:41-151.

Usage: python tools/correctness_report.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import canon, duck_connect  # noqa: E402


def run(sf_dir: str) -> dict[str, dict]:
    from snappydata_spark import get_spark
    from snappydata_spark.operators import QUERIES, ORACLES

    spark = get_spark("correctness-report")
    con = duck_connect(sf_dir)
    report: dict[str, dict] = {}

    for name, fn in sorted(QUERIES.items()):
        entry = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        report[name] = entry
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            entry["spark_rows"] = len(spdf)
        except Exception as e:
            entry["err"] = f"spark:{type(e).__name__}: {e}"[:300]
            print(f"FAIL  {name}: {entry['err']}", file=sys.stderr)
            continue
        finally:
            spark.catalog.clearCache()
        if name not in ORACLES:
            entry["err"] = "no_oracle"
            print(f"ok?   {name}: rows={len(spdf)} (no oracle)", file=sys.stderr)
            continue
        try:
            dpdf = con.execute(ORACLES[name]).df()
            entry["oracle_rows"] = len(dpdf)
        except Exception as e:
            entry["err"] = f"duckdb:{e}"[:300]
            print(f"FAIL  {name}: {entry['err']}", file=sys.stderr)
            continue
        entry["rows_match"] = len(spdf) == len(dpdf)
        entry["schema_match"] = sorted(c.lower() for c in spdf.columns) == sorted(
            c.lower() for c in dpdf.columns
        )
        if entry["rows_match"] and entry["schema_match"]:
            try:
                entry["hash_match"] = canon(spdf) == canon(dpdf)
            except Exception as e:
                entry["err"] = f"canon:{type(e).__name__}: {e}"[:300]
                entry["hash_match"] = False
        else:
            entry["hash_match"] = False
        status = "PASS" if entry["hash_match"] else "FAIL"
        print(
            f"{status}  {name}: rows={len(spdf)} ({time.time() - t0:.1f}s)",
            file=sys.stderr,
        )
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_FULL.json",
        )
    )
    report = run(sf_dir)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    bad = [
        n
        for n, e in report.items()
        if e["err"] not in (None, "no_oracle") or e["hash_match"] is False
    ]
    no_oracle = [n for n, e in report.items() if e["err"] == "no_oracle"]
    print(
        json.dumps(
            {
                "queries": len(report),
                "hash_checked_green": len(report) - len(bad) - len(no_oracle),
                "no_oracle": len(no_oracle),
                "failures": bad,
                "out": out,
            }
        )
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

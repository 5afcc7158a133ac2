"""Local differential check: run every registered query on Spark AND its
DuckDB oracle on the same parquet, compare row count, column names, and an
order-insensitive value hash — a faithful stand-in for the driver's
CORRECTNESS gate so mismatches are caught before a round ends.

Usage: python tools/check_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # synthesized scale dirs (tools/gen_sf.py) write each table as
            # a directory of part files, like a Spark write would
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(pdf):
    """Order-insensitive canonical form, faithful to the driver's pandas
    canonicalizer: results arrive as pandas DataFrames (Spark toPandas /
    DuckDB .df(), so DuckDB HUGEINT shows up as float64 — exposing
    int-vs-float output-type drift a plain fetchall() would mask), columns
    sort by name, rows sort last.  Integer and float columns canonicalize
    DIFFERENTLY (5 vs 5.000000) on purpose: that is the drift the driver's
    value hash sees.  Unhashable cells (lists/arrays) raise in sort_values —
    exactly as the driver does."""
    import pandas as pd

    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    # driver-equivalent: sort_values over every column (this is what throws
    # TypeError: unhashable type on array columns)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns))

    def cell(v):
        if v is None or v is pd.NaT:
            return "NULL"
        if isinstance(v, float):
            if v != v:
                return "NULL"
            return f"{round(v, 6):.6f}"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    return sorted(
        "|".join(cell(v) for v in row) for row in pdf.itertuples(index=False)
    )


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    name_filter = argv[1] if len(argv) > 1 else ""

    from snappydata_spark import get_spark
    from snappydata_spark.operators import QUERIES, ORACLES

    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)

    failures = []
    report: dict[str, dict] = {}

    def record(name, rows_match, schema_match, hash_match, s_rows, o_rows, err,
               secs=None):
        report[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": s_rows,
            "oracle_rows": o_rows,
            "err": err,
        }
        if secs is not None:
            report[name]["secs"] = round(secs, 2)
        if json_out:
            import json

            with open(json_out, "w") as f:
                json.dump(report, f, indent=2)

    # a comma in the filter makes it an exact-name allowlist (used by the
    # sfN subset sweeps that pick queries data-driven from a prior
    # decade's measured walls); otherwise substring match as before
    names = set(name_filter.split(",")) if "," in name_filter else None
    if names is not None:
        unmatched = sorted(names - set(QUERIES))
        if unmatched:
            raise SystemExit(
                "allowlist names not in QUERIES (typo or renamed query): "
                + ", ".join(unmatched)
            )
    for name, fn in sorted(QUERIES.items()):
        if names is not None:
            if name not in names:
                continue
        elif name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            record(name, False, False, False, None, None,
                   f"spark {type(e).__name__}: {e}"[:500])
            continue
        finally:
            # some operators persist() intermediates for their own multi-
            # action pipelines with no handle to unpersist — release them
            # so a 170-query sweep doesn't accumulate cached blocks
            spark.catalog.clearCache()
        if name not in ORACLES:
            print(f"ok?   {name}: rows={len(spdf)} (no oracle — rows-only)")
            record(name, True, True, None, len(spdf), None, None,
                   time.time() - t0)
            continue
        try:
            dpdf = con.execute(ORACLES[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            record(name, False, False, False, len(spdf), None,
                   f"duckdb: {e}"[:500])
            continue
        dt = time.time() - t0
        scols, dcols = list(spdf.columns), list(dpdf.columns)
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            failures.append(name)
            print(f"FAIL  {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            record(name, len(spdf) == len(dpdf), False, False, len(spdf),
                   len(dpdf), None, dt)
            continue
        if len(spdf) != len(dpdf):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(spdf)} duck={len(dpdf)}")
            record(name, False, True, False, len(spdf), len(dpdf), None, dt)
            continue
        try:
            sc = canon(spdf)
            dc = canon(dpdf)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: canonicalizer error {type(e).__name__}: {e}")
            record(name, True, True, False, len(spdf), len(dpdf),
                   f"canon {type(e).__name__}: {e}"[:500], dt)
            continue
        if sc != dc:
            failures.append(name)
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sc, dc)) if a != b
            )
            print(f"FAIL  {name}: value mismatch at sorted-row {diff[0]}:")
            print(f"      spark: {diff[1][:200]}")
            print(f"      duck : {diff[2][:200]}")
            record(name, True, True, False, len(spdf), len(dpdf), None, dt)
            continue
        print(f"PASS  {name}: rows={len(spdf)} ({dt:.1f}s)")
        record(name, True, True, True, len(spdf), len(dpdf), None, dt)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

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
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, stringify
    values with float rounding, sort rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if v != v:
                return "NaN"
            return f"{round(v, 6):.6f}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    return sorted("|".join(cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from snappydata_spark import get_spark
    from snappydata_spark.operators import QUERIES, ORACLES

    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)

    failures = []
    for name, fn in sorted(QUERIES.items()):
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in ORACLES:
            print(f"ok?   {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        dt = time.time() - t0
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            failures.append(name)
            print(f"FAIL  {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        sc = canon(srows, [c.lower() for c in scols])
        dc = canon(drows, [c.lower() for c in dcols])
        if sc != dc:
            failures.append(name)
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sc, dc)) if a != b
            )
            print(f"FAIL  {name}: value mismatch at sorted-row {diff[0]}:")
            print(f"      spark: {diff[1][:200]}")
            print(f"      duck : {diff[2][:200]}")
            continue
        print(f"PASS  {name}: rows={len(srows)} ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

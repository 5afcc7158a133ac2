"""Quiet-window A/B for exact money-sum encodings (r11 verdict item 4).

Times TPC-H Q1's aggregate shape (the heaviest money-sum row) at a
given sf dir under three encodings, noop-sinked (guide §1.4):

  A. decimal(12,2) accumulation — the shipping exact path;
  B. bigint *cents* accumulation (qty/price ×100, revenue terms in
     1e-4/1e-6 dollar units) divided once at the end;
  C. plain double sums — the vanilla/reference floor (NOT exact).

B is lossless for 2-decimal money and stays in longs, but its unscaled
revenue units overflow int64 for group sums beyond ~1e18 units
(≈ sf 100k single-group sums), so it is only adoptable with a salted
two-level aggregate; this script quantifies whether the CPU delta is
worth that complexity.

Usage: python tools/ab_money_sums.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    from pyspark.sql import functions as F

    from snappydata_spark import get_spark

    spark = get_spark("ab-money")
    line = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    line.count()  # warm

    filt = "l_shipdate <= TIMESTAMP '1998-09-02'"
    grp = ("l_returnflag", "l_linestatus")

    def variant_a(df):
        return df.filter(filt).groupBy(*grp).agg(
            F.expr(
                "CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty"
            ),
            F.expr(
                "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price"
            ),
            F.expr(
                "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
                " * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price"
            ),
            F.expr(
                "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
                " * CAST(1 - l_discount AS DECIMAL(4,2))"
                " * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge"
            ),
        )

    def variant_b(df):
        # cents as bigint: lossless for 2-decimal money; revenue in 1e-4
        # units, charge in 1e-6 units
        return df.filter(filt).groupBy(*grp).agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty"
            ),
            F.expr(
                "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price"
            ),
            F.expr(
                "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
                " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE)"
                " / 10000 AS sum_disc_price"
            ),
            F.expr(
                "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
                " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
                " * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS DOUBLE)"
                " / 1000000 AS sum_charge"
            ),
        )

    def variant_c(df):
        return df.filter(filt).groupBy(*grp).agg(
            F.expr("SUM(l_quantity) AS sum_qty"),
            F.expr("SUM(l_extendedprice) AS sum_base_price"),
            F.expr("SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price"),
            F.expr(
                "SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge"
            ),
        )

    out = {}
    for name, fn in (("A_decimal", variant_a), ("B_cents", variant_b), ("C_double", variant_c)):
        fn(line).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            fn(line).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"median": statistics.median(runs), "runs": runs}
        print(f"# {name}: {out[name]['median']}s of {runs}", file=sys.stderr)
    a, c = out["A_decimal"]["median"], out["C_double"]["median"]
    b = out["B_cents"]["median"]
    out["ratios"] = {
        "decimal_vs_double": round(a / c, 3) if c else None,
        "cents_vs_double": round(b / c, 3) if c else None,
        "decimal_vs_cents": round(a / b, 3) if b else None,
    }
    print(json.dumps({"sf_dir": SF_DIR, **out}))


if __name__ == "__main__":
    main()

"""A/B + exact-equality harness for the r13 bigint-cents money sums
(r12 verdict item 4, guide §2.2/§2.5 two-level aggregation).

Compares the decimal q01 aggregate against the cents rewrite
(per-(keys, partition-id) BIGINT partials, decimal outer sum) for
1) bit-exact output equality (collect both, compare repr of every cell),
2) noop-sink wall time (guide §1.4), REPS reps after warmup.

Usage: python tools/ab_money_cents.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))

QTY_C = "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
PRICE_C = "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
DISC_H = "CAST(CAST(1 - l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)"
TAX_H = "CAST(CAST(1 + l_tax AS DECIMAL(4,2)) * 100 AS BIGINT)"


def q01_decimal(spark):
    from pyspark.sql import functions as F

    line = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    rev = (
        "CAST(l_extendedprice AS DECIMAL(12,2))"
        " * CAST(1 - l_discount AS DECIMAL(4,2))"
    )
    return (
        line.filter("l_shipdate <= TIMESTAMP '1998-09-02'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty"),
            F.expr("CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price"),
            F.expr(f"CAST(ROUND(SUM({rev}), 2) AS DOUBLE) AS sum_disc_price"),
            F.expr(f"CAST(ROUND(SUM({rev} * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge"),
            F.expr("ROUND(AVG(l_quantity), 4) AS avg_qty"),
            F.expr("ROUND(AVG(l_extendedprice), 4) AS avg_price"),
            F.expr("ROUND(AVG(l_discount), 4) AS avg_disc"),
            F.expr("COUNT(1) AS count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q01_cents(spark):
    from pyspark.sql import functions as F

    line = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    inner = (
        line.filter("l_shipdate <= TIMESTAMP '1998-09-02'")
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("l_returnflag", "l_linestatus", "__pid")
        .agg(
            F.expr(f"SUM({QTY_C}) AS qty_c"),
            F.expr(f"SUM({PRICE_C}) AS price_c"),
            F.expr(f"SUM({PRICE_C} * {DISC_H}) AS rev_u"),
            F.expr(f"SUM({PRICE_C} * {DISC_H} * {TAX_H}) AS charge_u"),
            F.expr("SUM(l_quantity) AS qty_s"),
            F.expr("COUNT(l_quantity) AS qty_n"),
            F.expr("SUM(l_extendedprice) AS price_s"),
            F.expr("COUNT(l_extendedprice) AS price_n"),
            F.expr("SUM(l_discount) AS disc_s"),
            F.expr("COUNT(l_discount) AS disc_n"),
            F.expr("COUNT(1) AS n"),
        )
    )
    return (
        inner.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("CAST(ROUND(SUM(CAST(qty_c AS DECIMAL(38,0))) / 100, 2) AS DOUBLE) AS sum_qty"),
            F.expr("CAST(ROUND(SUM(CAST(price_c AS DECIMAL(38,0))) / 100, 2) AS DOUBLE) AS sum_base_price"),
            F.expr("CAST(ROUND(SUM(CAST(rev_u AS DECIMAL(38,0))) / 10000, 2) AS DOUBLE) AS sum_disc_price"),
            F.expr("CAST(ROUND(SUM(CAST(charge_u AS DECIMAL(38,0))) / 1000000, 2) AS DOUBLE) AS sum_charge"),
            F.expr("ROUND(SUM(qty_s) / CAST(SUM(qty_n) AS DOUBLE), 4) AS avg_qty"),
            F.expr("ROUND(SUM(price_s) / CAST(SUM(price_n) AS DOUBLE), 4) AS avg_price"),
            F.expr("ROUND(SUM(disc_s) / CAST(SUM(disc_n) AS DOUBLE), 4) AS avg_disc"),
            F.expr("SUM(n) AS count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from snappydata_spark import get_spark

    spark = get_spark("ab-money-cents")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    a = q01_decimal(spark).collect()
    b = q01_cents(spark).collect()
    assert len(a) == len(b), (len(a), len(b))
    mismatch = 0
    for ra, rb in zip(a, b):
        for k in ra.asDict():
            va, vb = ra[k], rb[k]
            if repr(va) != repr(vb):
                print(f"MISMATCH {k}: {va!r} vs {vb!r}")
                mismatch += 1
    print(f"rows={len(a)} cell_mismatches={mismatch}")

    sa = [f.dataType.simpleString() for f in q01_decimal(spark).schema.fields]
    sb = [f.dataType.simpleString() for f in q01_cents(spark).schema.fields]
    print("schema_equal:", sa == sb, sb if sa != sb else "")

    for name, fn in (("decimal", q01_decimal), ("cents", q01_cents)):
        noop(fn(spark))  # warm
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            noop(fn(spark))
            runs.append(round(time.time() - t0, 3))
        print(
            f"{name}: median {statistics.median(runs)}s of {runs} "
            f"(load1={os.getloadavg()[0]:.2f})"
        )


if __name__ == "__main__":
    main()

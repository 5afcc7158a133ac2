"""Test-data table loading & view registration.

The driver generates a TPC-H-ish star schema (TESTDATA.md) at
/root/testdata/sf{0.001,0.01,0.1}/<table>.parquet.  The reference's TPC-H
layout (TPCHColumnPartitionedTable.scala:165-536) partitions the fact tables
on their join keys and replicates the small dims; our Spark-first equivalent
is: let parquet scans feed Catalyst (pushdown + pruning are native) and
broadcast the small dims at join sites (see operators/).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions the reference declares REPLICATE on
# (TPCHColumnPartitionedTable.scala — NATION/REGION/SUPPLIER replicated):
# at join sites we broadcast these.
REPLICATED = frozenset({"region", "nation", "supplier"})


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables as DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events":
            # events.ts is parquet TIMESTAMP(NANOS) which Spark's reader
            # rejects; with spark.sql.legacy.parquet.nanosAsLong=true (set
            # in get_spark) it arrives as int64 nanos — convert to a real
            # timestamp with the same ns→µs truncation DuckDB applies.
            if dict(df.dtypes).get("ts") == "bigint":
                # integer division: ns values exceed double's 53-bit mantissa
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out[name] = df
    return out


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL entry path)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs

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


# (applicationId, abspath) → resolved DataFrame.  spark.read.parquet
# does driver-side file listing + footer schema resolution EVERY call
# (~150-250 ms per query at sf0.1 — same-plan queries measured 1.5-2×
# the latency of their SQL-over-registered-view twins purely from this);
# the testdata tables are immutable, so the resolved frame is reusable.
# Keyed by applicationId so a restarted context never serves a frame
# whose file index belongs to a dead session, and by the path's
# mtime_ns (r10 advice) so a parquet dir REWRITTEN IN PLACE within one
# SparkContext (e.g. a tool regenerating a scale dir) misses the cache
# instead of serving stale or deleted file references.
_TABLE_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def _mtime_or_none(path: str) -> int | None:
    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return None


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables as DataFrames (resolved
    once per (SparkContext, path, mtime) — these inputs are immutable)."""
    out: dict[str, DataFrame] = {}
    app_id = spark.sparkContext.applicationId
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        try:
            mtime = os.stat(path).st_mtime_ns
        except OSError:
            continue
        key = (app_id, os.path.abspath(path), mtime)
        df = _TABLE_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(path)
            if name == "events":
                # events.ts is parquet TIMESTAMP(NANOS) which Spark's reader
                # rejects; with spark.sql.legacy.parquet.nanosAsLong=true (set
                # in get_spark) it arrives as int64 nanos — convert to a real
                # timestamp with the same ns→µs truncation DuckDB applies.
                if dict(df.dtypes).get("ts") == "bigint":
                    # integer division: ns values exceed double's 53-bit
                    # mantissa
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
            if len(_TABLE_CACHE) > 512:
                # evict dead-context and superseded-mtime entries first;
                # only if the table set for THIS context genuinely
                # exceeds the bound does the whole cache reset
                live = {
                    k: v
                    for k, v in _TABLE_CACHE.items()
                    if k[0] == app_id
                    and _mtime_or_none(k[1]) == k[2]
                }
                _TABLE_CACHE.clear()
                if len(live) <= 512:
                    _TABLE_CACHE.update(live)
            _TABLE_CACHE[key] = df
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

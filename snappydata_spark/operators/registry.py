"""Query/oracle registry.

Every operator we claim in SURVEY.md §2 registers here as a named query
(spark, sf_dir) -> DataFrame plus (where SQL-expressible) a DuckDB oracle
SQL string over the same parquet tables.  The driver runs both sides and
hash-compares — this registry IS the correctness surface.

Cross-engine precision policy: every float aggregate is wrapped in
round(x, N) on BOTH sides (N=2 for money sums, 4-6 for ratios) so that
double-summation order differences between Spark and DuckDB cannot flip
the value hash; every top-k is ordered with a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco

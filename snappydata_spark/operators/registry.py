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


def _cleanup_at_exit(path: str) -> None:
    """Register a build-once session's temp store directory for removal
    at PROCESS exit.  Scale sweeps build multi-GB index stores per
    process (minhash bands over 5M docs ≈ 4.8 GB at sf100); without
    this, repeated sweep/test processes leak them until the disk fills
    (observed: sf100 containment failing with 'No space left on
    device' after a day of rehearsals)."""
    import atexit
    import shutil

    atexit.register(shutil.rmtree, path, ignore_errors=True)

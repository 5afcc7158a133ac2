"""snappydata.query-timeout / query-cancellation-interval
(reference: docs/reference/configuration_parameters/
gemfirexd.query-timeout.md, gemfirexd.query-cancellation-interval.md):
a query running longer than the budget is cancelled via Spark job-group
cancellation (interruptOnCancel), the session stays usable, and fast
queries under the same property are unaffected."""

import time

import pytest

from snappydata_spark import QueryCancelled

# r13: excluded from the default (driver) test lane — see pytest.ini
pytestmark = pytest.mark.slow


def _slow_sql(sn, sf_dir):
    """A deliberately runaway statement: triple cross join of lineitem
    (sf0.001 ~6k rows → ~2e11 joined rows) — hours of work uncancelled."""
    sn.spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey"
    ).createOrReplaceTempView("qt_line")
    return sn.sql(
        "SELECT COUNT(*) AS n FROM qt_line a "
        "CROSS JOIN qt_line b CROSS JOIN qt_line c"
    )


def test_timeout_cancels_runaway_query(snappy, sf_dir):
    sn = snappy
    sn.sql("SET snappydata.query-timeout = 2")
    df = _slow_sql(sn, sf_dir)
    t0 = time.time()
    with pytest.raises(QueryCancelled, match="query-timeout=2"):
        df.count()
    wall = time.time() - t0
    # budget 2s + generous cancellation/teardown slack — the point is
    # "seconds, not the hours the cross join would take"
    assert wall < 30, f"cancellation took {wall:.1f}s"
    # the session survives: a fast query under the SAME property succeeds
    assert sn.sql("SELECT COUNT(*) AS n FROM qt_line").collect()[0].n > 0


def test_timeout_zero_disables_and_roundtrips(snappy, sf_dir):
    sn = snappy
    # gemfirexd. spelling accepted, normalized to the snappydata. key
    sn.sql("SET gemfirexd.query-timeout = 7")
    assert sn.get_conf("snappydata.query-timeout") == "7"
    sn.sql("SET snappydata.query-cancellation-interval = 50")
    assert sn.get_conf("snappydata.query-cancellation-interval") == "50"
    sn.sql("SET snappydata.query-timeout = 0")
    df = sn.sql("SELECT 1 AS one")
    # timeout 0 = disabled: plain DataFrame, no watchdog wrapper
    assert type(df).__name__ == "DataFrame"
    assert df.collect()[0].one == 1


def test_timeout_wraps_table_reads(snappy, sf_dir):
    sn = snappy
    src = sn.spark.read.parquet(f"{sf_dir}/region.parquet")
    sn.create_table("qt_region", df=src)
    sn.sql("SET snappydata.query-timeout = 60")
    df = sn.table("qt_region")
    assert type(df).__name__ == "_CancellableDataFrame"
    assert df.count() == src.count()  # far under budget: runs normally
    sn.sql("DROP TABLE qt_region")


def test_timeout_rejects_non_numeric(snappy):
    with pytest.raises(ValueError):
        snappy.sql("SET snappydata.query-timeout = soon")

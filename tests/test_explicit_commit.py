"""allow-explicit-commit connection property (reference:
docs/reference/configuration_parameters/allow-explicit-commit.md):
SQL-client tools set autocommit(false) and issue COMMIT/ROLLBACK; with
the property set, all of those are documented no-ops — autocommit stays
effectively true — so column-table operations keep working.  Without
it, autocommit(false) opens the real chained row-table transaction path
and column-table operations raise the documented routing error."""

import glob
import os
import shutil
import tempfile

import pytest


def test_commit_outside_tx_errors_without_property(snappy):
    with pytest.raises(ValueError, match="no transaction"):
        snappy.sql("COMMIT")
    with pytest.raises(ValueError, match="no transaction"):
        snappy.sql("ROLLBACK")


def test_sql_client_script_shape_with_property(snappy):
    """The doc's target scenario end-to-end via run_script: SET property
    → autocommit(false) → column-table DML → COMMIT, all accepted, with
    the DML applied (no-op autocommit, not a buffered transaction)."""
    sn = snappy
    sn.sql("CREATE TABLE aec_col (k INT, v STRING) USING column")
    sn.run_script(
        """
        SET allow-explicit-commit = true;
        AUTOCOMMIT OFF;
        INSERT INTO aec_col VALUES (1, 'a'), (2, 'b');
        COMMIT;
        UPDATE aec_col SET v = 'z' WHERE k = 2;
        ROLLBACK;  -- documented no-op: the UPDATE already applied
        """
    )
    rows = {r.k: r.v for r in sn.table("aec_col").collect()}
    assert rows == {1: "a", 2: "z"}
    sn.sql("DROP TABLE aec_col")


def test_autocommit_off_without_property_blocks_column_tables(snappy):
    sn = snappy
    sn.sql("CREATE TABLE aec_blocked (k INT, v STRING) USING column")
    sn.sql("AUTOCOMMIT OFF")
    with pytest.raises(ValueError, match="autocommit is false"):
        sn.sql("INSERT INTO aec_blocked VALUES (1, 'a')")
    sn.sql("AUTOCOMMIT ON")  # commits the (empty) implicit transaction
    sn.sql("INSERT INTO aec_blocked VALUES (1, 'a')")
    assert sn.table("aec_blocked").count() == 1
    sn.sql("DROP TABLE aec_blocked")


def test_autocommit_off_row_table_chained_transactions(snappy):
    """Without the property, AUTOCOMMIT OFF preserves the REAL row-table
    transaction path: chained implicit transactions, read-your-writes,
    rollback discards, commit applies."""
    sn = snappy
    sn.sql(
        "CREATE TABLE aec_row (k INT NOT NULL PRIMARY KEY, v STRING) "
        "USING row"
    )
    sn.sql("AUTOCOMMIT OFF")
    sn.sql("INSERT INTO aec_row VALUES (1, 'a')")
    assert sn.sql("SELECT * FROM aec_row").count() == 1  # read-your-writes
    sn.sql("COMMIT")
    # chained: the next statement is already inside a fresh transaction
    sn.sql("INSERT INTO aec_row VALUES (2, 'b')")
    sn.sql("ROLLBACK")
    sn.sql("AUTOCOMMIT ON")
    assert [r.k for r in sn.table("aec_row").collect()] == [1]
    sn.sql("DROP TABLE aec_row")


def test_property_roundtrips_through_export_ddls(snappy, spark):
    """EXPORT_DDLS carries the property as a SET statement; replaying
    the script into a FRESH session restores no-op commit behavior."""
    from snappydata_spark import SnappySession

    sn = snappy
    sn.sql("SET allow-explicit-commit = true")
    sn.sql("COMMIT")  # no-op, proves it's live in the exporting session
    out = tempfile.mkdtemp(prefix="aec_export_")
    try:
        path = sn.sql(
            f"CALL SYS.EXPORT_DDLS('{out}/ddl')"
        ).collect()[0].path
        script = open(path).read()
        assert "SET snappydata.allow-explicit-commit = true;" in script
        store2 = tempfile.mkdtemp(prefix="aec_replay_")
        try:
            sn2 = SnappySession(spark, store_dir=store2)
            with pytest.raises(ValueError, match="no transaction"):
                sn2.sql("COMMIT")
            sn2.run_script(script)
            sn2.sql("COMMIT")  # restored: accepted as the documented no-op
        finally:
            shutil.rmtree(store2, ignore_errors=True)
    finally:
        for d in glob.glob(f"{out}*"):
            shutil.rmtree(d, ignore_errors=True)
        if os.path.isdir(out):
            shutil.rmtree(out, ignore_errors=True)

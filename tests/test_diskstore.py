"""CREATE/DROP DISKSTORE + SYSDISKSTORES/SYSDISKSTOREIDS +
SYS.DISKSTORE_FSYNC (reference create-diskstore.md:6-20,
drop-diskstore.md, system_tables/sysdiskstores.md, sysdiskstoreids.md).

Disk stores are GemFire oplog configuration — a documented metadata
no-op in this engine (parquet + atomic manifests have no oplogs): the
tests pin the SQL surface, the catalog persistence, the in-use DROP
guard, and the EXPORT_DDLS round-trip."""

import os

import pytest


def test_create_diskstore_full_grammar_and_sysdiskstores(snappy):
    snappy.sql(
        "CREATE DISKSTORE store1 MAXLOGSIZE 456 AUTOCOMPACT true "
        "ALLOWFORCECOMPACTION false COMPACTIONTHRESHOLD 80 "
        "TIMEINTERVAL 223344 WRITEBUFFERSIZE 19292393 QUEUESIZE 17374 "
        "('dir1' 500, 'dir2')"
    )
    rows = {
        r.name: r
        for r in snappy.sql("SELECT * FROM SYS.SYSDISKSTORES").collect()
    }
    # built-ins present like the reference's example output
    assert "GFXD-DEFAULT-DISKSTORE" in rows and "GFXD-DD-DISKSTORE" in rows
    s1 = rows["STORE1"]
    assert s1.maxlogsize == 456 and s1.compactionthreshold == 80
    assert s1.timeinterval == 223344 and s1.writebuffersize == 19292393
    assert s1.queuesize == 17374 and s1.autocompact == "true"
    assert "dir1 500" in s1.dir_path_size and "dir2" in s1.dir_path_size
    # the store's directories exist on disk
    for part in s1.dir_path_size.split(","):
        assert os.path.isdir(part.split(" ")[0])
    # defaults (create-diskstore.md): bare CREATE DISKSTORE
    snappy.sql("CREATE DISKSTORE d_plain")
    p = {
        r.name: r
        for r in snappy.sql("SELECT * FROM SYS.SYSDISKSTORES").collect()
    }["D_PLAIN"]
    assert (p.maxlogsize, p.autocompact, p.allowforcecompaction) == (
        1024, "true", "false",
    )
    assert (p.compactionthreshold, p.timeinterval) == (50, 1000)
    assert (p.writebuffersize, p.queuesize) == (32768, 0)
    # filterable like any table (sysdiskstores.md example)
    assert (
        snappy.sql(
            "SELECT name FROM SYS.SYSDISKSTORES WHERE NAME = 'STORE1'"
        ).count()
        == 1
    )
    snappy.sql("DROP DISKSTORE store1")
    snappy.sql("DROP DISKSTORE d_plain")


def test_diskstoreids_both_spellings(snappy):
    snappy.sql("CREATE DISKSTORE d1 ('D1')")
    # sysdiskstoreids.md's own example uses sys.diskstoreids
    short = snappy.sql("SELECT * FROM sys.diskstoreids").collect()
    full = snappy.sql("SELECT * FROM SYS.SYSDISKSTOREIDS").collect()
    assert sorted(r.name for r in short) == sorted(r.name for r in full)
    d1 = [r for r in full if r.name == "D1"]
    assert len(d1) == 1 and d1[0].id and d1[0].memberid
    assert d1[0].dirs.endswith("D1")
    snappy.sql("DROP DISKSTORE d1")


def test_drop_diskstore_guards(snappy):
    with pytest.raises(ValueError, match="does not exist"):
        snappy.sql("DROP DISKSTORE nope")
    snappy.sql("DROP DISKSTORE IF EXISTS nope")  # no error
    with pytest.raises(ValueError, match="built-in"):
        snappy.sql("DROP DISKSTORE GFXD-DEFAULT-DISKSTORE")
    snappy.sql("CREATE DISKSTORE busy")
    with pytest.raises(ValueError, match="already exists"):
        snappy.sql("CREATE DISKSTORE busy")
    # a table targeting the store blocks the drop (drop-diskstore.md)
    snappy.sql(
        "CREATE TABLE dst (k INT, v INT) USING column "
        "OPTIONS (diskstore 'busy')"
    )
    with pytest.raises(ValueError, match="in use"):
        snappy.sql("DROP DISKSTORE busy")
    snappy.sql("DROP TABLE dst")
    snappy.sql("DROP DISKSTORE busy")
    # a table naming an uncreated store is rejected at CREATE TABLE
    with pytest.raises(ValueError, match="diskstore"):
        snappy.sql(
            "CREATE TABLE dst2 (k INT) USING column "
            "OPTIONS (diskstore 'ghost')"
        )


def test_diskstore_fsync_and_unknown_clause(snappy):
    snappy.sql("CREATE DISKSTORE fs1")
    out = snappy.sql("CALL SYS.DISKSTORE_FSYNC('fs1')").collect()
    assert out[0].diskstore == "FS1" and out[0].status == "synced"
    # built-ins fsync too
    snappy.sql("CALL SYS.DISKSTORE_FSYNC('GFXD-DEFAULT-DISKSTORE')")
    with pytest.raises(ValueError, match="does not exist"):
        snappy.sql("CALL SYS.DISKSTORE_FSYNC('ghost')")
    with pytest.raises(ValueError, match="unrecognized"):
        snappy.sql("CREATE DISKSTORE bad MAXLOG 5")
    snappy.sql("DROP DISKSTORE fs1")


def test_diskstore_export_ddls_roundtrip(snappy, tmp_path):
    """A reference DDL script containing diskstore statements replays via
    run_script, and EXPORT_DDLS emits the diskstore before the tables
    that target it so the export replays clean."""
    snappy.run_script(
        "CREATE DISKSTORE exp_store MAXLOGSIZE 50 COMPACTIONTHRESHOLD 70 "
        "('oplogs' 100);\n"
        "CREATE TABLE expt (k INT NOT NULL PRIMARY KEY, v INT) USING row "
        "OPTIONS (diskstore 'exp_store');\n"
        "INSERT INTO expt VALUES (1, 10);\n"
        "CALL SYS.DISKSTORE_FSYNC('exp_store');"
    )
    out = snappy.sql(
        f"CALL SYS.EXPORT_DDLS('{tmp_path}/ddls')"
    )
    ddl_text = out.collect()[0][0] if out.columns else ""
    # read the exported file
    import glob

    files = glob.glob(f"{tmp_path}/ddls_*/part-00000")
    assert files, "EXPORT_DDLS wrote no part file"
    text = open(files[0]).read()
    assert "CREATE DISKSTORE exp_store MAXLOGSIZE 50" in text
    assert "COMPACTIONTHRESHOLD 70" in text
    assert text.index("CREATE DISKSTORE") < text.index("CREATE TABLE")
    # the persisted registry survives a fresh session over the same store
    from snappydata_spark import SnappySession

    sn2 = SnappySession(snappy.spark, store_dir=snappy.catalog.base_dir)
    assert "exp_store" in sn2._diskstores
    assert (
        sn2.sql(
            "SELECT * FROM SYS.SYSDISKSTORES WHERE name = 'EXP_STORE'"
        ).count()
        == 1
    )
    sn2.sql("DROP TABLE expt")
    sn2.sql("DROP DISKSTORE exp_store")

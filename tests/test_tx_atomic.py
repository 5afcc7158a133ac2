"""Cross-table transaction crash atomicity (r6): a multi-table commit
stages every manifest, lands ONE intent record (the commit point), then
publishes.  Crash before the intent → nothing visible; crash during
publish → the next session rolls forward.  Manifest-level analogue of
the reference's store tx commit (SnapshotConnectionListener.scala:395)."""

import os

import pytest


def _mk(snappy, spark):
    a = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    b = spark.createDataFrame([(1, 100), (2, 200)], "k long, v long")
    snappy.create_table("tx_a", provider="row", options={"key_columns": "k"}, df=a)
    snappy.create_table("tx_b", provider="row", options={"key_columns": "k"}, df=b)


def _vals(sn, t):
    return {r.k: r.v for r in sn.table(t).collect()}


def test_multi_table_commit_is_atomic_happy_path(snappy, spark):
    _mk(snappy, spark)
    snappy.begin_transaction()
    snappy.put("tx_a", spark.createDataFrame([(1, 11)], "k long, v long"))
    snappy.put("tx_b", spark.createDataFrame([(1, 101)], "k long, v long"))
    snappy.commit()
    assert _vals(snappy, "tx_a")[1] == 11
    assert _vals(snappy, "tx_b")[1] == 101
    # no intent records or staged manifests left behind
    txdir = os.path.join(snappy.catalog.base_dir, "_tx")
    assert not os.path.isdir(txdir) or os.listdir(txdir) == []


def test_crash_before_commit_point_leaves_nothing(snappy, spark, monkeypatch):
    """Simulated crash AFTER ops applied (data files + staged manifests
    on disk) but BEFORE the intent record: both tables must still read
    their old state in a fresh session — the staged generation is
    invisible garbage."""
    from snappydata_spark import SnappySession

    _mk(snappy, spark)
    snappy.begin_transaction()
    snappy.put("tx_a", spark.createDataFrame([(1, 11)], "k long, v long"))
    snappy.put("tx_b", spark.createDataFrame([(1, 101)], "k long, v long"))

    real_replace = os.replace

    def crash_on_intent(src, dst):
        if os.sep + "_tx" + os.sep in dst:
            raise RuntimeError("simulated crash before commit point")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crash_on_intent)
    with pytest.raises(RuntimeError):
        snappy.commit()
    monkeypatch.undo()
    fresh = SnappySession(spark, store_dir=snappy.catalog.base_dir)
    assert _vals(fresh, "tx_a") == {1: 10, 2: 20}
    assert _vals(fresh, "tx_b") == {1: 100, 2: 200}


def test_crash_mid_publish_rolls_forward(snappy, spark, monkeypatch):
    """Simulated crash after the intent record with only ONE of two
    staged manifests published: a fresh session over the store must roll
    the other forward — never a half-committed transaction."""
    from snappydata_spark import SnappySession

    _mk(snappy, spark)
    snappy.begin_transaction()
    snappy.put("tx_a", spark.createDataFrame([(1, 11)], "k long, v long"))
    snappy.put("tx_b", spark.createDataFrame([(1, 101)], "k long, v long"))

    calls = {"n": 0}
    real_publish = type(snappy)._publish_staged

    def crash_after_first(self, name, staged_path, payload):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash mid-publish")
        return real_publish(self, name, staged_path, payload)

    monkeypatch.setattr(type(snappy), "_publish_staged", crash_after_first)
    with pytest.raises(RuntimeError):
        snappy.commit()
    monkeypatch.undo()
    # intent record survives the crash
    txdir = os.path.join(snappy.catalog.base_dir, "_tx")
    assert os.path.isdir(txdir) and len(os.listdir(txdir)) == 1
    # recovery on the next session publishes the remaining table
    fresh = SnappySession(spark, store_dir=snappy.catalog.base_dir)
    assert _vals(fresh, "tx_a")[1] == 11
    assert _vals(fresh, "tx_b")[1] == 101
    assert os.listdir(txdir) == []


def test_tx_with_indexed_table_commits_index_atomically(snappy, spark):
    """Index tables maintained by a transactional op join the same
    atomic group: after commit, postings reflect the new text."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")], "doc_id long, text string"
    )
    snappy.create_table(
        "tx_docs", provider="row", options={"key_columns": "doc_id"}, df=docs
    )
    snappy.sql("CREATE INDEX txd_inv ON tx_docs(text) USING inverted")
    snappy.begin_transaction()
    snappy.put(
        "tx_docs",
        spark.createDataFrame([(1, "omega beta")], "doc_id long, text string"),
    )
    snappy.commit()
    terms = {
        r.term for r in snappy.table("txd_inv__ann").filter("doc_id = 1").collect()
    }
    assert terms == {"omega", "beta"}

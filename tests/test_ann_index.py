"""Materialized IVF-SQ8 index (CREATE INDEX ... USING ivf_sq8):
build-once/query-many, mutation maintenance with the stored model, and
registry persistence across sessions.

Reference contract: CREATE INDEX materializes a maintained structure
(SnappyDDLParser.scala:519; IndexColumnFormatRelation — an index is a
column table updated alongside its base table)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from snappydata_spark import index_ann
from snappydata_spark.operators import QUERIES

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _query_df(spark, vec_id=0):
    return (
        _emb(spark)
        .filter(F.col("vec_id") == vec_id)
        .select(F.col("embedding").alias("qe"))
    )


@pytest.fixture()
def indexed(spark, snappy):
    snappy.create_table(
        "vecs", options={"key_columns": "vec_id"}, df=_emb(spark)
    )
    snappy.sql("CREATE INDEX vec_ivf ON vecs(embedding) USING ivf_sq8")
    return snappy


def _no_train(monkeypatch):
    """Arm a tripwire: any k-means training after this point fails."""
    from snappydata_spark.operators import ml_ops

    def boom(*a, **k):
        raise AssertionError("kmeans_train ran — index retrained!")

    monkeypatch.setattr(ml_ops, "kmeans_train", boom)


def test_index_matches_composed_query(spark):
    """The registry query over the materialized index returns exactly
    the composed (train-per-query) result — same rows, same scores."""
    a = sorted(
        (r.vec_id, r.cos, r.approx_cos)
        for r in QUERIES["sim_ivf_sq8_topk"](spark, SF).collect()
    )
    b = sorted(
        (r.vec_id, r.cos, r.approx_cos)
        for r in QUERIES["sim_ivf_sq8_index_topk"](spark, SF).collect()
    )
    assert a == b


def test_second_query_runs_no_training(indexed, spark, monkeypatch):
    _no_train(monkeypatch)
    out = index_ann.search_ivf_sq8(
        indexed, "vec_ivf", _query_df(spark), topk=5, exclude_ids=[0]
    ).collect()
    assert len(out) == 5
    out2 = index_ann.search_ivf_sq8(
        indexed, "vec_ivf", _query_df(spark, vec_id=3), topk=5, exclude_ids=[3]
    ).collect()
    assert len(out2) == 5


def test_put_maintains_index_without_retraining(indexed, spark, monkeypatch):
    _no_train(monkeypatch)
    # insert a near-duplicate of the query vector under a fresh id: the
    # maintained index must surface it as the TOP neighbour
    q = _emb(spark).filter(F.col("vec_id") == 0).collect()[0]
    near = [float(x) * 1.001 for x in q.embedding]
    new_id = 999_999
    src = spark.createDataFrame(
        [(new_id, near)], "vec_id long, embedding array<double>"
    )
    # align to the base schema (extra columns null-filled)
    base_cols = indexed.table("vecs").columns
    for c in base_cols:
        if c not in ("vec_id", "embedding"):
            src = src.withColumn(c, F.lit(None))
    indexed.put("vecs", src.select(*base_cols))
    idx_rows = indexed.table("vec_ivf__ann").filter(
        F.col("vec_id") == new_id
    ).collect()
    assert len(idx_rows) == 1 and idx_rows[0].cell is not None
    top = index_ann.search_ivf_sq8(
        indexed, "vec_ivf", _query_df(spark), topk=3, exclude_ids=[0]
    ).collect()
    assert top[0].vec_id == new_id


def test_delete_prunes_index(indexed, spark, monkeypatch):
    _no_train(monkeypatch)
    victim = spark.createDataFrame([(7,)], "vec_id long")
    indexed.delete_from("vecs", victim)
    assert (
        indexed.table("vec_ivf__ann").filter(F.col("vec_id") == 7).count() == 0
    )
    got = index_ann.search_ivf_sq8(
        indexed, "vec_ivf", _query_df(spark), topk=50, exclude_ids=[0]
    ).collect()
    assert all(r.vec_id != 7 for r in got)


def test_index_rebinds_across_sessions(spark, monkeypatch):
    from snappydata_spark import SnappySession

    store = tempfile.mkdtemp(prefix="ann_rebind_")
    sn1 = SnappySession(spark, store_dir=store)
    sn1.create_table("vecs", options={"key_columns": "vec_id"}, df=_emb(spark))
    sn1.sql("CREATE INDEX vec_ivf ON vecs(embedding) USING ivf_sq8")
    _no_train(monkeypatch)
    sn2 = SnappySession(spark, store_dir=store)
    out = index_ann.search_ivf_sq8(
        sn2, "vec_ivf", _query_df(spark), topk=5, exclude_ids=[0]
    ).collect()
    assert len(out) == 5


def test_drop_index_drops_table(indexed):
    assert "vec_ivf" in indexed._ann_indexes
    indexed.sql("DROP INDEX vec_ivf")
    assert "vec_ivf" not in indexed._ann_indexes
    assert not indexed.catalog.exists("vec_ivf__ann")


def test_update_reencodes_only_matched_rows(indexed, spark, monkeypatch):
    """UPDATE narrows maintenance to the predicate-matched rows: the
    updated vector's index row changes, every other row stays
    byte-identical, and no training runs."""
    _no_train(monkeypatch)
    before = {
        r.vec_id: (r.cell, list(r.code))
        for r in indexed.table("vec_ivf__ann").collect()
    }
    # flip vector 5 to (a scaled copy of) vector 11's embedding: its
    # cell/code must move to vector 11's
    target = _emb(spark).filter(F.col("vec_id") == 11).collect()[0]
    arr = "array(" + ", ".join(repr(float(x)) + "D" for x in target.embedding) + ")"
    indexed.sql(f"UPDATE vecs SET embedding = {arr} WHERE vec_id = 5")
    after = {
        r.vec_id: (r.cell, list(r.code))
        for r in indexed.table("vec_ivf__ann").collect()
    }
    assert after[5] == after[11]
    assert all(after[k] == v for k, v in before.items() if k != 5)


def test_delete_where_prunes_without_reencode(indexed, monkeypatch):
    _no_train(monkeypatch)
    before = {
        r.vec_id: (r.cell, list(r.code))
        for r in indexed.table("vec_ivf__ann").collect()
    }
    indexed.sql("DELETE FROM vecs WHERE vec_id IN (4, 6)")
    after = {
        r.vec_id: (r.cell, list(r.code))
        for r in indexed.table("vec_ivf__ann").collect()
    }
    assert set(before) - set(after) == {4, 6}
    assert all(after[k] == v for k, v in before.items() if k not in (4, 6))


def test_rls_hidden_vectors_never_leak_through_index(indexed, spark):
    """RLS on the base table filters the index scan BEFORE the candidate
    limit: a hidden vector neither appears in results nor consumes a
    candidate slot."""
    sn = indexed
    sn.sql("CREATE POLICY p_vec ON vecs FOR SELECT USING (vec_id <> 7)")
    sn.sql("ALTER TABLE vecs ENABLE ROW LEVEL SECURITY")
    try:
        got = index_ann.search_ivf_sq8(
            sn, "vec_ivf", _query_df(spark), topk=50, exclude_ids=[0]
        ).collect()
        assert len(got) > 0
        assert all(r.vec_id != 7 for r in got)
    finally:
        sn.sql("ALTER TABLE vecs DISABLE ROW LEVEL SECURITY")


def _query_set(spark, n=3):
    return (
        _emb(spark)
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    )


def test_batch_matches_per_query_single_search(indexed, spark, monkeypatch):
    """One batch plan over a query TABLE returns, per qid, exactly the
    rows the single-vector serve returns for that query — and runs no
    training."""
    _no_train(monkeypatch)
    batch = index_ann.search_ivf_sq8_batch(
        indexed,
        "vec_ivf",
        _query_set(spark),
        topk=5,
        cand=10,
        nprobe=2,
        exclude_same_id=True,
        widen_to_full_recall=False,
    ).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r.qid, []).append((r.vec_id, r.cos, r.approx_cos))
    assert set(by_qid) == {0, 1, 2}
    for qid in (0, 1, 2):
        single = [
            (r.vec_id, r.cos, r.approx_cos)
            for r in index_ann.search_ivf_sq8(
                indexed,
                "vec_ivf",
                _query_df(spark, vec_id=qid),
                topk=5,
                cand=10,
                nprobe=2,
                exclude_ids=[qid],
            ).collect()
        ]
        assert by_qid[qid] == single


def test_batch_never_returns_self(indexed, spark):
    got = index_ann.search_ivf_sq8_batch(
        indexed, "vec_ivf", _query_set(spark, n=5), topk=10,
        exclude_same_id=True,
    ).collect()
    assert got and all(r.vec_id != r.qid for r in got)


def test_batch_full_recall_widening_is_exact(indexed, spark):
    """When the candidate budget covers the corpus, the widened batch
    serve returns the EXACT brute-force top-k per query."""
    from snappydata_spark.functions import vector as V

    emb = _emb(spark)
    n = emb.count()
    got = index_ann.search_ivf_sq8_batch(
        indexed, "vec_ivf", _query_set(spark, n=2), topk=4, cand=n,
        nprobe=1, exclude_same_id=True,
    ).collect()
    by_qid = {}
    for r in got:
        by_qid.setdefault(r.qid, []).append(r.vec_id)
    for qid in (0, 1):
        q = emb.filter(F.col("vec_id") == qid).collect()[0]
        arr = F.array(*[F.lit(float(x)) for x in q.embedding])
        brute = [
            r.vec_id
            for r in emb.filter(F.col("vec_id") != qid)
            .select(
                "vec_id", V.cosine(F.col("embedding"), arr).alias("c")
            )
            .orderBy(F.desc("c"), "vec_id")
            .limit(4)
            .collect()
        ]
        assert by_qid[qid] == brute


def test_batch_rls_hidden_rows_never_leak(indexed, spark):
    sn = indexed
    sn.sql("CREATE POLICY p_vecb ON vecs FOR SELECT USING (vec_id <> 9)")
    sn.sql("ALTER TABLE vecs ENABLE ROW LEVEL SECURITY")
    try:
        got = index_ann.search_ivf_sq8_batch(
            sn, "vec_ivf", _query_set(spark), topk=50,
            exclude_same_id=True,
        ).collect()
        assert got and all(r.vec_id != 9 for r in got)
    finally:
        sn.sql("ALTER TABLE vecs DISABLE ROW LEVEL SECURITY")


def test_drop_base_table_cascades_to_index(indexed):
    """Dropping the base table drops its ANN indexes too (the reference
    drops dependent indexes with their table) — no dangling registry
    entry, no orphaned index table."""
    assert "vec_ivf" in indexed._ann_indexes
    indexed.drop_table("vecs")
    assert "vec_ivf" not in indexed._ann_indexes
    assert not indexed.catalog.exists("vec_ivf__ann")
    assert "vec_ivf__cell" not in indexed.list_indexes()

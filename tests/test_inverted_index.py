"""Materialized inverted index (CREATE INDEX ... USING inverted):
postings equal fresh tokenization, BM25 from the index matches the
composed scorer, mutations maintain postings per-doc (stale terms
deleted, fresh upserted, departed docs pruned)."""

import pytest
from pyspark.sql import Row, functions as F

from snappydata_spark import index_inverted


@pytest.fixture()
def corpus(spark):
    rows = [
        Row(doc_id=1, text="spark joins vector columns fast"),
        Row(doc_id=2, text="vector search and vector joins"),
        Row(doc_id=3, text="plain text about nothing special"),
        Row(doc_id=4, text="query joins query plans query"),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture()
def indexed(snappy, corpus):
    snappy.create_table("inv_docs", options={"key_columns": "doc_id"}, df=corpus)
    snappy.sql("CREATE INDEX inv_idx ON inv_docs(text) USING inverted")
    return snappy


def test_postings_match_fresh_tokenization(indexed, corpus):
    got = {
        (r.doc_id, r.term): (r.tf, r.dl)
        for r in indexed.table("inv_idx__ann").collect()
    }
    want = {
        (r.doc_id, r.term): (r.tf, r.dl)
        for r in index_inverted._postings(corpus, "text", "doc_id").collect()
    }
    assert got == want
    assert got[(2, "vector")] == (2, 5)


def test_bm25_from_index(indexed):
    top = index_inverted.bm25_topk(
        indexed, "inv_idx", ["vector", "joins"], k=4
    ).collect()
    assert top[0].doc_id == 2  # two 'vector' hits + one 'joins'
    ids = [r.doc_id for r in top]
    assert 3 not in ids  # no query term -> no posting -> absent


def test_update_replaces_stale_postings(indexed):
    """UPDATE rewrites a doc's text: terms it no longer contains leave
    the postings, new terms appear, untouched docs' rows unchanged."""
    before_other = {
        (r.doc_id, r.term)
        for r in indexed.table("inv_idx__ann").filter("doc_id <> 1").collect()
    }
    indexed.sql("UPDATE inv_docs SET text = 'entirely new words' WHERE doc_id = 1")
    rows1 = {
        r.term: r.tf
        for r in indexed.table("inv_idx__ann").filter("doc_id = 1").collect()
    }
    assert set(rows1) == {"entirely", "new", "words"}
    after_other = {
        (r.doc_id, r.term)
        for r in indexed.table("inv_idx__ann").filter("doc_id <> 1").collect()
    }
    assert after_other == before_other


def test_delete_prunes_postings(indexed, spark):
    indexed.delete_from("inv_docs", spark.createDataFrame([Row(doc_id=4)]))
    assert indexed.table("inv_idx__ann").filter("doc_id = 4").count() == 0
    top = index_inverted.bm25_topk(indexed, "inv_idx", ["query"], k=5).collect()
    assert all(r.doc_id != 4 for r in top)


def _batch_queries(spark):
    return spark.createDataFrame(
        [
            Row(qid=0, terms=["vector", "joins"]),
            Row(qid=1, terms=["query"]),
            Row(qid=2, terms=["nothing", "special"]),
        ]
    )


def test_batch_matches_per_query_single(indexed, spark):
    """One batch plan returns, per qid, the same docs and scores as the
    single-query serve (scores fold in term-sorted order in the batch
    path — compare at the rounded-6 output precision)."""
    batch = index_inverted.bm25_topk_batch(
        indexed, "inv_idx", _batch_queries(spark), k=4
    ).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r.qid, []).append((r.doc_id, r.bm25))
    assert set(by_qid) == {0, 1, 2}
    for qid, terms in [(0, ["vector", "joins"]), (1, ["query"]),
                       (2, ["nothing", "special"])]:
        single = [
            (r.doc_id, r.bm25)
            for r in index_inverted.bm25_topk(
                indexed, "inv_idx", terms, k=4
            ).collect()
        ]
        assert [d for d, _ in by_qid[qid]] == [d for d, _ in single]
        for (_, a), (_, b) in zip(by_qid[qid], single):
            assert abs(a - b) < 1e-9


def test_batch_repeated_terms_dedupe(indexed, spark):
    """A repeated query term contributes once (qtf=1 variant), matching
    the single path's dict.fromkeys dedupe."""
    q = spark.createDataFrame([Row(qid=0, terms=["query", "query", "joins"])])
    batch = index_inverted.bm25_topk_batch(indexed, "inv_idx", q, k=4).collect()
    single = index_inverted.bm25_topk(
        indexed, "inv_idx", ["query", "joins"], k=4
    ).collect()
    assert [(r.doc_id, r.bm25) for r in batch] == [
        (r.doc_id, r.bm25) for r in single
    ]


def test_batch_rls_hidden_docs_absent(indexed, spark):
    indexed.sql("CREATE POLICY p_invb ON inv_docs FOR SELECT USING (doc_id <> 2)")
    indexed.sql("ALTER TABLE inv_docs ENABLE ROW LEVEL SECURITY")
    try:
        got = index_inverted.bm25_topk_batch(
            indexed, "inv_idx", _batch_queries(spark), k=5
        ).collect()
        assert got and all(r.doc_id != 2 for r in got)
    finally:
        indexed.sql("ALTER TABLE inv_docs DISABLE ROW LEVEL SECURITY")


def test_rls_hidden_docs_absent_from_bm25(indexed):
    indexed.sql("CREATE POLICY p_inv ON inv_docs FOR SELECT USING (doc_id <> 2)")
    indexed.sql("ALTER TABLE inv_docs ENABLE ROW LEVEL SECURITY")
    try:
        top = index_inverted.bm25_topk(
            indexed, "inv_idx", ["vector", "joins"], k=5
        ).collect()
        assert all(r.doc_id != 2 for r in top)
        assert len(top) > 0
    finally:
        indexed.sql("ALTER TABLE inv_docs DISABLE ROW LEVEL SECURITY")

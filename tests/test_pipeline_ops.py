"""Training-pipeline operators (operators/pipeline_ops.py): invariants
beyond the DuckDB hash check — packing conservation, split determinism,
quantization error bounds."""

import pytest
from pyspark.sql import functions as F

from snappydata_spark.operators import QUERIES


def test_pack_sequences_conservation(spark, sf_dir):
    """Packing must lose no tokens: offsets are contiguous (each doc
    starts where the previous ended) and the pack ids cover exactly
    total_tokens / budget bins."""
    from snappydata_spark.operators.pipeline_ops import PACK_BUDGET

    df = QUERIES["txt_pack_sequences"](spark, sf_dir).orderBy("doc_id").collect()
    expected_start = 0
    for r in df:
        assert r.start_tok == expected_start, f"gap at doc {r.doc_id}"
        assert r.first_pack == r.start_tok // PACK_BUDGET
        assert r.last_pack == (r.start_tok + r.token_count - 1) // PACK_BUDGET
        assert r.first_pack <= r.last_pack
        expected_start += r.token_count
    total = expected_start
    n_packs = max(r.last_pack for r in df) + 1
    assert n_packs == -(-total // PACK_BUDGET)  # ceil


def test_train_val_split_deterministic_and_sized(spark, sf_dir):
    """Same input → identical split on every run; ratio near 90/10."""
    a = {
        (r.lang, r.split): r.n_docs
        for r in QUERIES["txt_train_val_split"](spark, sf_dir).collect()
    }
    b = {
        (r.lang, r.split): r.n_docs
        for r in QUERIES["txt_train_val_split"](spark, sf_dir).collect()
    }
    assert a == b
    train = sum(v for (_, s), v in a.items() if s == "train")
    val = sum(v for (_, s), v in a.items() if s == "val")
    frac = train / (train + val)
    assert 0.80 < frac < 0.97, frac


def test_embed_quantize_error_bound(spark, sf_dir):
    """int8 symmetric quantization: reconstruction error per element is
    bounded by half a quantization step (0.5/scale)."""
    rows = QUERIES["sim_embed_quantize_int8"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.scale > 0
        assert r.mean_abs_err <= 0.5 / r.scale + 1e-9


def test_corpus_clean_monotone(spark, sf_dir):
    """The cleaned corpus is a subset: fewer (or equal) docs than raw,
    and every surviving fingerprint is unique."""
    cleaned = QUERIES["pipeline_corpus_clean"](spark, sf_dir)
    n_clean = cleaned.agg(F.sum("n_docs")).collect()[0][0]
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert n_clean <= raw.count()
    assert n_clean > 0


def test_decontaminate_counts_consistent(spark, sf_dir):
    """Contamination is a subset property per source, and the train
    universe matches the split: n_contaminated ≤ n_train, and summing
    n_train over sources equals the split's train doc count."""
    rows = QUERIES["txt_decontaminate"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_train
    split = {
        (r.lang, r.split): r.n_docs
        for r in QUERIES["txt_train_val_split"](spark, sf_dir).collect()
    }
    train_total = sum(v for (_, s), v in split.items() if s == "train")
    assert sum(r.n_train for r in rows) == train_total


def test_domain_mix_thresholds_and_budgets(spark, sf_dir):
    """The smallest source keeps everything (threshold == 1e6); every
    threshold is ≤ 1e6; kept tokens never exceed the source's raw total;
    and the mix is deterministic across runs."""
    mix = QUERIES["pipeline_domain_mix"](spark, sf_dir)
    rows = {r.source: r for r in mix.collect()}
    assert rows
    raw = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", F.size(F.split(F.trim("text"), r"\s+")).alias("tc"))
        .groupBy("source")
        .agg(F.sum("tc").alias("tot"))
    )
    totals = {r.source: r.tot for r in raw.collect()}
    min_source = min(totals, key=lambda s: totals[s])
    assert rows[min_source].thresh == 1_000_000
    for s, r in rows.items():
        assert r.thresh <= 1_000_000
        assert r.tokens_kept <= totals[s]
    again = {r.source: r.n_docs_kept for r in mix.collect()}
    assert again == {s: r.n_docs_kept for s, r in rows.items()}


def test_repetition_filter_bounds(spark, sf_dir):
    """Fractions live in [0,1] and flag counts are bounded by doc counts."""
    for r in QUERIES["txt_repetition_filter"](spark, sf_dir).collect():
        assert 0 <= r.n_flagged <= r.n_docs
        assert 0.0 <= r.avg_dup_frac <= 1.0
        assert 0.0 <= r.avg_distinct_ratio <= 1.0


def test_export_shards_deterministic(spark, sf_dir, tmp_path):
    """Shard membership is a pure function of (seed, keys): re-export
    with different input partitioning produces identical shard contents,
    and every row lands in exactly one shard."""
    from snappydata_spark.export import export_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    export_shards(docs.repartition(3), p1, "doc_id", n_shards=8)
    export_shards(docs.repartition(17), p2, "doc_id", n_shards=8)

    a = spark.read.parquet(p1)
    b = spark.read.parquet(p2)
    assert a.count() == docs.count() == b.count()
    da = {(r.shard, r.doc_id) for r in a.select("shard", "doc_id").collect()}
    db = {(r.shard, r.doc_id) for r in b.select("shard", "doc_id").collect()}
    assert da == db
    assert {r.shard for r in a.select("shard").distinct().collect()} == set(range(8))


def test_priority_sample_weight_proportionality(spark, sf_dir):
    """Efraimidis-Spirakis contract: the deterministic weighted sample
    leans toward heavy documents — mean weight of selected docs exceeds
    the corpus mean — and re-running yields the identical id signature."""
    from pyspark.sql import functions as F

    from snappydata_spark.operators import QUERIES

    out1 = {r.source: (r.n_selected, r.id_sig)
            for r in QUERIES["pipeline_priority_sample"](spark, sf_dir).collect()}
    out2 = {r.source: (r.n_selected, r.id_sig)
            for r in QUERIES["pipeline_priority_sample"](spark, sf_dir).collect()}
    assert out1 == out2  # reproducible by construction
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_avg = docs.filter("n_chars > 0").agg(
        F.avg("n_chars")
    ).collect()[0][0]
    sel_rows = QUERIES["pipeline_priority_sample"](spark, sf_dir).collect()
    sel_avg = (
        sum(r.avg_weight * r.n_selected for r in sel_rows)
        / sum(r.n_selected for r in sel_rows)
    )
    assert sel_avg > corpus_avg


def test_bm25_and_hybrid_ranking_contracts(spark, sf_dir):
    """BM25: every returned doc contains at least one query term and
    scores are positive-descending.  Hybrid RRF: a doc ranked #1 by
    both systems must fuse above a doc ranked low by both; rrf is
    bounded by 2/(60+1)."""
    from snappydata_spark.operators import QUERIES

    top = QUERIES["txt_bm25_topk"](spark, sf_dir).collect()
    assert len(top) > 0
    scores = [r.bm25 for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    from snappydata_spark.operators.pipeline_ops import BM25_TERMS
    for r in top:
        toks = docs[r.doc_id].split()
        assert any(t in toks for t in BM25_TERMS)

    fused = QUERIES["sim_hybrid_rrf_topk"](spark, sf_dir).collect()
    assert len(fused) > 0
    assert all(0 < r.rrf <= 2.0 / 61 + 1e-9 for r in fused)
    assert [round(r.rrf, 9) for r in fused] == sorted(
        (round(r.rrf, 9) for r in fused), reverse=True
    )

"""Round-4 corpus operators: exact substring dedup, SemDeDup, SQ8 ANN.

Correctness of each against its DuckDB oracle is covered by the
registry differential (tools/check_oracle.py); these tests pin the
operator-level semantics and the scale bounds on adversarial fixtures,
mirroring tests/test_dedup_scale.py's discipline.
"""

import pytest
from pyspark.sql import Row, functions as F

from snappydata_spark.operators import QUERIES
from snappydata_spark.operators.corpus_ops import (
    GRAM_LEN,
    SQ_TOPK,
    semdedup_candidate_pairs,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ substring dedup


def test_substring_dedup_detects_shared_span(spark):
    """Two docs sharing one long verbatim span are both flagged with a
    merged interval covering (at least) the shared span; a doc whose
    only repetition is INTERNAL (df=1 grams) is not flagged."""
    shared = "x" * 5 + " the quick brown fox jumps over the lazy dog " * 3
    rows = [
        Row(doc_id=1, text="aaa " + shared + " unique tail one"),
        Row(doc_id=2, text="bbb bbb " + shared + " other tail"),
        # internal repetition only — grams repeat within the doc, df=1
        Row(doc_id=3, text=("internal repeat segment " * 10) + "zzz"),
        Row(doc_id=4, text="totally unrelated text " + "y" * 80),
    ]
    import snappydata_spark.operators.corpus_ops as C

    docs = spark.createDataFrame(rows)
    out = {
        r.doc_id: r
        for r in _run_substring_dedup(spark, docs).collect()
    }
    # the two docs share the span at DIFFERENT byte offsets (4 vs 8):
    # content-defined anchor sampling still detects it (a fixed-stride
    # gram sampler provably does not — that defect motivated the design)
    assert 1 in out and 2 in out
    assert 3 not in out and 4 not in out
    # the merged span covers most of the shared text (sampling-resolution)
    assert out[1].dup_chars >= len(shared) // 2
    assert 0 < out[1].dup_frac <= 1.0


def _run_substring_dedup(spark, docs):
    """Run the registered query body against an in-memory documents df
    by monkey-patching load_tables' input (the operator reads only
    doc_id/text)."""
    import snappydata_spark.operators.corpus_ops as C

    orig = C.load_tables
    try:
        C.load_tables = lambda s, d, names: {"documents": docs}
        return C.txt_substring_dedup(spark, "ignored")
    finally:
        C.load_tables = orig


def test_substring_dedup_merges_overlapping_spans(spark):
    """Overlapping duplicated grams merge into few spans — far fewer
    than the number of sampled duplicate grams (~320/16 = 20 here)."""
    shared = "shared boilerplate sentence repeated verbatim across documents! " * 5
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared + " tail-a " + "a" * 40),
            Row(doc_id=2, text=shared + " tail-b " + "b" * 40),
        ]
    )
    out = {r.doc_id: r for r in _run_substring_dedup(spark, docs).collect()}
    # deterministic given the fixture text: 5 merged spans covering 200
    # of the 320 shared chars (the loose bounds survive constant tweaks)
    assert out[1].n_dup_spans <= 8
    assert out[1].dup_chars >= len(shared) // 2
    assert out[2].n_dup_spans == out[1].n_dup_spans


# ------------------------------------------------------- SemDeDup


def test_semdedup_invariants_on_testdata(spark):
    rows = QUERIES["dedup_semdedup"](spark, SF).collect()
    emb_n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_members for r in rows) == emb_n
    for r in rows:
        assert r.n_removed + r.n_kept == r.n_members
        assert r.n_kept >= 1  # greedy keep-lowest-id always keeps one


def test_semdedup_hot_cluster_sub_cap(spark):
    """400 identical vectors in one cluster: pair count must be bounded
    by n*sub_cap, not n^2 — and every member except sub-bucket heads is
    still marked duplicate."""
    n, dims = 400, 8
    vec = [1.0] * dims
    mem = spark.createDataFrame(
        [Row(vec_id=i, cluster=0, embedding=vec) for i in range(n)]
    )
    sub_cap = 32
    pairs = semdedup_candidate_pairs(mem, sub_cap=sub_cap)
    cnt = pairs.count()
    assert cnt <= n * sub_cap
    assert cnt < n * (n - 1) / 4
    # identical vectors: all pairs sim≈1, every non-head is a dupe
    dupes = pairs.filter(F.col("sim") >= 0.99).select("src").distinct().count()
    assert dupes == n - -(n // -sub_cap)  # one kept head per sub-bucket (ceil)


def test_semdedup_pairs_cluster_bounded(spark):
    """Vectors in different clusters never pair."""
    mem = spark.createDataFrame(
        [
            Row(vec_id=1, cluster=0, embedding=[1.0, 0.0]),
            Row(vec_id=2, cluster=1, embedding=[1.0, 0.0]),
        ]
    )
    assert semdedup_candidate_pairs(mem).count() == 0


# ------------------------------------------------------- DSIR


def test_dsir_prefers_target_language_docs(spark):
    """The top-scored docs skew toward the target (en) distribution:
    the en fraction among selected docs exceeds the corpus fraction."""
    out = QUERIES["pipeline_dsir_sample"](spark, SF).collect()
    assert len(out) > 0
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus_en = docs.filter("lang = 'en'").count() / docs.count()
    sel_en = sum(1 for r in out if r.lang == "en") / len(out)
    assert sel_en > corpus_en
    # scores arrive sorted descending, ties impossible at double width
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


# ------------------------------------------------------- BPE


def test_bpe_merges_are_monotone_and_applied(spark):
    """Merge frequencies never increase across steps (each merge removes
    the argmax pair), and each merged symbol is the concatenation of its
    pair."""
    out = QUERIES["txt_bpe_train"](spark, SF).collect()
    assert [r.step for r in out] == [1, 2, 3]
    freqs = [r.freq for r in out]
    assert freqs == sorted(freqs, reverse=True)
    for r in out:
        assert r.merged == r.pair.replace(" ", "")
        assert r.freq > 0


# ------------------------------------------------------- SQ8 ANN


def test_sq8_topk_reranks_exactly(spark):
    out = QUERIES["sim_sq8_topk"](spark, SF).collect()
    assert len(out) == SQ_TOPK
    # exact rerank: rows arrive in descending exact-cosine order
    cos = [r.cos for r in out]
    assert cos == sorted(cos, reverse=True)
    # quantization error is small but nonzero by design
    for r in out:
        assert abs(r.cos - r.approx_cos) < 0.05
    # query vector itself excluded
    assert all(r.vec_id != 0 for r in out)


# --------------------------------------------- percentile rollup


def test_percentile_partials_merge_equals_full(spark):
    """The histogram partials are truly mergeable: computing partials on
    two disjoint halves and summing them yields bit-identical
    percentiles to the single-pass computation."""
    from pyspark.sql import functions as F

    from snappydata_spark.operators.events import (
        percentile_histogram_partials,
        percentiles_from_partials,
    )
    from snappydata_spark.tables import load_tables

    ev = load_tables(spark, SF, ("events",))["events"].select(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
        "value",
        "event_id",
    )
    keys = ("hour_start", "event_type")
    full = percentiles_from_partials(
        percentile_histogram_partials(ev, keys), keys
    )
    h1 = percentile_histogram_partials(ev.filter("event_id % 2 = 0"), keys)
    h2 = percentile_histogram_partials(ev.filter("event_id % 2 = 1"), keys)
    merged_hist = (
        h1.unionByName(h2)
        .groupBy(*keys, "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    merged = percentiles_from_partials(merged_hist, keys)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # monotone: p50 <= p95 <= p99 everywhere
    for r in full.collect():
        assert r.p50 <= r.p95 <= r.p99


# ------------------------------------------- property: interval merge


from hypothesis import HealthCheck, given, settings, strategies as st


def _merge_ref(intervals):
    """Pure-Python reference: sort, sweep, merge touching/overlapping
    half-open intervals."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [tuple(x) for x in out]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    groups=st.dictionaries(
        st.integers(min_value=0, max_value=3),
        st.lists(
            st.tuples(
                st.integers(min_value=-50, max_value=200),
                st.integers(min_value=1, max_value=60),
            ),
            min_size=1,
            max_size=25,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_merge_intervals_matches_reference(spark, groups):
    from snappydata_spark.operators.corpus_ops import merge_intervals

    rows = [
        (gid, s, s + ln) for gid, ivs in groups.items() for s, ln in ivs
    ]
    df = spark.createDataFrame(rows, "gid long, s long, e long")
    got = {}
    for r in merge_intervals(df, group_cols=("gid",)).collect():
        got.setdefault(r.gid, []).append((r.st, r.en))
    for gid, ivs in groups.items():
        expect = _merge_ref([(s, s + ln) for s, ln in ivs])
        assert sorted(got[gid]) == expect, gid


# --------------------------------- property: percentile error bound


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.floats(
            min_value=0.0, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=300,
    )
)
def test_percentile_rollup_error_bound(spark, values):
    """The bin-edge estimate is always an OVERestimate of the exact
    percentile, within one log bin: 1+exact <= 1+est <= (1+exact)*e^W."""
    import math

    from pyspark.sql import functions as F

    from snappydata_spark.operators.events import (
        PCT_W,
        PCT_QS,
        percentile_histogram_partials,
        percentiles_from_partials,
    )

    df = spark.createDataFrame(
        [(v,) for v in values], "value double"
    ).withColumn("g", F.lit(1))
    out = percentiles_from_partials(
        percentile_histogram_partials(df, ("g",)), ("g",)
    ).collect()[0]
    n = len(values)
    sv = sorted(values)
    for q, name in PCT_QS:
        exact = sv[max(0, math.ceil(n * q / 100.0) - 1)]
        est = getattr(out, name)
        assert 1 + est >= (1 + exact) * (1 - 1e-9)
        assert 1 + est <= (1 + exact) * math.exp(PCT_W) * (1 + 1e-6)


# ------------------------------------------- substring removal


def test_substring_clean_removes_only_non_owner_copies(spark):
    """The owner (lowest doc_id) keeps its copy; every other doc loses
    the span; untouched docs don't appear in the stats."""
    import snappydata_spark.operators.corpus_ops as C

    shared = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="xx " + shared + " owner tail"),
            Row(doc_id=2, source="a", text="yyyy " + shared + " copy tail"),
            Row(doc_id=3, source="b", text="completely unrelated text " + "z" * 60),
        ]
    )
    orig = C.load_tables
    try:
        C.load_tables = lambda s, d, n: {"documents": docs}
        out = {r.source: r for r in C.txt_substring_dedup_clean(spark, "x").collect()}
    finally:
        C.load_tables = orig
    # only source 'a' is affected, and only ONE doc in it (the non-owner)
    assert set(out) == {"a"}
    assert out["a"].n_docs_affected == 1
    assert out["a"].chars_removed >= len(shared) // 2

"""Edge cases for the text/vector expression builders (the oracle queries
cover the happy path at corpus scale; these cover the corners)."""

import math

import pytest
from pyspark.sql import functions as F

from snappydata_spark.functions import text as T
from snappydata_spark.functions import vector as V


def _one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_short_doc_has_empty_shingles(spark):
    r = _one(spark, "a b").select(T.shingles(F.col("text"), 3).alias("sh")).collect()[0]
    assert r.sh == []


def test_shingles_overlap(spark):
    r = _one(spark, "a b c d").select(T.shingles(F.col("text"), 3).alias("sh")).collect()[0]
    assert r.sh == ["a b c", "b c d"]


def test_minhash_stable_under_duplication(spark):
    # minhash is a set signature: duplicated shingles don't change it
    a = _one(spark, "x y z x y z x y z")
    b = _one(spark, "x y z")
    sig_a = a.select(T.minhash_signature(F.col("text"), 8).alias("s")).collect()[0].s
    sig_b = b.select(T.minhash_signature(F.col("text"), 8).alias("s")).collect()[0].s
    # a has shingles {x y z, y z x, z x y}; b only {x y z} — min over a
    # superset is ≤ min over the subset, elementwise
    assert all(sa <= sb for sa, sb in zip(sig_a, sig_b))


def test_simhash_near_for_near_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame([(1, base), (2, base + " zzz")], "id int, text string")
    out = df.select("id", T.simhash32(F.col("text")).alias("sh")).collect()
    sh = {r.id: r.sh for r in out}
    ham = bin(sh[1] ^ sh[2]).count("1")
    assert ham <= 8  # one extra token flips few bits


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world ")], "id int, text string"
    )
    fps = [r.fp for r in df.select(T.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [("the cat and the dog",), ("le chat et la souris",), ("der hund und die katze",)],
        "text string",
    )
    out = [r.g for r in df.select(T.lang_id(F.col("text")).alias("g")).collect()]
    assert out == ["en", "fr", "de"]


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], "a array<float>, b array<float>"
    )
    out = [r.c for r in df.select(V.cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(0.0)


def test_l2_distance(spark):
    df = spark.createDataFrame([([0.0, 3.0], [4.0, 0.0])], "a array<float>, b array<float>")
    r = df.select(V.l2_distance(F.col("a"), F.col("b")).alias("d")).collect()[0]
    assert r.d == pytest.approx(5.0)


def test_quality_score_bounded(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(T.quality_score(F.col("text")).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


def test_connected_components_chain(spark):
    """A long chain has diameter >> 1: min-label must propagate end to
    end, not just one hop."""
    from snappydata_spark import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 20)],
        "doc1 bigint, doc2 bigint",
    )
    labels = {r.node: r.cluster for r in dedup.connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_keep_one_per_cluster(spark):
    from snappydata_spark import dedup

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(1, 7)], "doc_id bigint, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "doc1 bigint, doc2 bigint")
    clusters = dedup.connected_components(pairs)
    kept = sorted(r.doc_id for r in dedup.keep_one_per_cluster(docs, clusters).collect())
    # clusters {1,2,3} keep 1; {5,6} keep 5; 4 untouched
    assert kept == [1, 4, 5]


def test_empty_text_zero_tokens_zero_quality(spark):
    """Empty / whitespace-only text must score 0 tokens (a bare split
    yields [''] = 1 token, letting junk rows out-score real short docs)."""
    from snappydata_spark.functions import text as T
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("",), ("   ",), ("one two",)], "text string"
    ).select(
        T.token_count(F.col("text")).alias("n"),
    )
    assert [r.n for r in df.collect()] == [0, 0, 2]

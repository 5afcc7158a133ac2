"""IVF ANN: the vectorized (mapInPandas/numpy) assignment must agree with
the DataFrame argmax path, and probed search must recall most of the
exact brute-force top-k."""

import pytest
from pyspark.sql import functions as F

from snappydata_spark import ann
from snappydata_spark.functions import vector as V

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def cent(emb):
    return emb.filter(F.col("vec_id") % 13 == 1).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )


def test_vectorized_assignment_matches_dataframe_path(emb, cent):
    a1 = {r.vec_id: r.cell for r in ann.ivf_assign(emb, cent).collect()}
    rows = [(r.cid, r.ce) for r in cent.collect()]
    a2 = {r.vec_id: r.cell for r in ann.ivf_assign_vectorized(emb, rows).collect()}
    # ties can differ only when two centroids are exactly equidistant —
    # with random float vectors that never happens
    assert a1 == a2


def test_ivf_recall_vs_bruteforce(emb, cent):
    query = emb.filter(F.col("vec_id") == 7).select(F.col("embedding").alias("qe"))
    base = emb.filter(F.col("vec_id") != 7)
    exact = [
        r.vec_id
        for r in base.join(F.broadcast(query))
        .select("vec_id", V.cosine(F.col("embedding"), F.col("qe")).alias("c"))
        .orderBy(F.col("c").desc(), "vec_id")
        .limit(10)
        .collect()
    ]
    assign = ann.ivf_assign(emb, cent)
    approx = [
        r.vec_id
        for r in ann.ivf_search(base, assign, cent, query, k=10, nprobe=4).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (exact, approx)
    # probing every cell must be exhaustive → exact recall
    full = [
        r.vec_id
        for r in ann.ivf_search(base, assign, cent, query, k=10, nprobe=1000).collect()
    ]
    assert set(full) == set(exact)

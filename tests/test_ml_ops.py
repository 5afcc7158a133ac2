"""kmeans_train vs a numpy Lloyd's reference (same deterministic init,
same tie-break) — the engine's iterative-algorithm pattern must produce
the exact assignment the textbook algorithm does."""

import numpy as np
import pytest

from snappydata_spark.operators.ml_ops import kmeans_train


def _numpy_lloyd(X, k, iters):
    cents = X[:k].astype(float).copy()
    live = list(range(k))
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)  # first index on ties = smallest cid
        new_cents, new_live = [], []
        for j, cid in enumerate(live):
            members = X[assign == j]
            if len(members):
                # the engine rounds centroids to 9 decimals per iteration
                # (cross-engine determinism) — mirror it
                new_cents.append(np.round(members.mean(axis=0), 9))
                new_live.append(cid)
        cents = np.array(new_cents)
        live = new_live
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = np.argmin(d, axis=1)
    return [live[a] for a in assign], cents, live


def test_kmeans_matches_numpy(spark):
    rng = np.random.RandomState(7)
    X = np.round(rng.randn(60, 6), 3)
    rows = [(i, [float(x) for x in X[i]]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigned = kmeans_train(emb, k=4, iters=3)

    ref_assign, ref_cents, live = _numpy_lloyd(X, 4, 3)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    assert [got[i] for i in range(60)] == ref_assign
    for j, cid in enumerate(live):
        assert cents[cid] == pytest.approx(list(ref_cents[j]), rel=1e-9)


def test_kmeans_fused_step_partition_invariant(spark):
    # r13 fused assign+partial-update pass: per-partition (cluster, pos,
    # s, n) cells must aggregate to the same ROUND(...,9) centroids no
    # matter how the rows are split across partitions — the exactness
    # claim behind replacing the JVM partial-avg with python partials
    rng = np.random.RandomState(11)
    X = np.round(rng.randn(80, 5), 3)
    rows = [(i, [float(x) for x in X[i]]) for i in range(80)]
    outs = []
    for nparts in (1, 7):
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(nparts)
        cents, _ = kmeans_train(emb, k=4, iters=3)
        outs.append({c: tuple(v) for c, v in cents.items()})
    assert outs[0] == outs[1]


def test_kmeans_empty_cluster_dropped(spark):
    # two tight groups, k=3 seeded from the first 3 points: one seed
    # loses all members after the first update — the engine must carry
    # only surviving clusters, exactly like the numpy reference
    pts = [[0.0, 0.0], [0.1, 0.0], [0.05, 0.02], [10.0, 10.0], [10.1, 9.9]]
    emb = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], "vec_id long, embedding array<double>"
    )
    cents, assigned = kmeans_train(emb, k=3, iters=2)
    clusters = {r.cluster for r in assigned.collect()}
    assert len(clusters) == len(cents) <= 3

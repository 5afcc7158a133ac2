"""Iterative ML operators over the embeddings table.

The reference exposes no ML training surface itself (it defers to Spark
MLlib via its session, SnappySessionState passthrough); what a
training-data pipeline at 100 TB needs from the ENGINE is the iterative
dataflow pattern: k-means coarse quantizer training for IVF indexes
(ann.py consumes the centroids), diversity sampling, cluster-balanced
mixes.

Scale discipline (the generic recipe for iterative algorithms on Spark):
per iteration the DATA is touched in one distributed pass (assignment =
map over broadcast centroid literals; update = one shuffle on (cluster,
dim)); only the MODEL (k x dims doubles) is collected to the driver and
re-broadcast as literals for the next pass.  No lineage growth across
iterations (each pass reads the parquet scan fresh with literal
centroids), so 100 iterations plan exactly like 1.

Determinism for the cross-engine hash: init = first k vectors by vec_id;
distances fold in element order on both engines; argmin tie-breaks by
cluster id; float aggregates are rounded on output only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from snappydata_spark.operators.registry import register
from snappydata_spark.tables import load_tables

K = 8
ITERS = 3
DIMS = 64


def _assign(emb: DataFrame, centroids: dict[int, list[float]]) -> DataFrame:
    """(vec_id, embedding, cluster, dist): vectorized numpy argmin via
    mapInPandas, FLOAT-EXACT to the previous Catalyst fold and to the
    DuckDB oracle: per-centroid distance is the LEFT-TO-RIGHT sequential
    sum of (x-y)^2 — np.cumsum's last column, whose prefix semantics
    force the same sequential double accumulation as
    list_aggregate('sum') / F.aggregate — and np.argmin returns the
    FIRST index achieving the min, i.e. ties break to the smallest
    cluster id, same as the oracle's ORDER BY dist, cid.  (The previous
    implementation evaluated k x dims interpreted HOF lambdas per row —
    the dominant cost of every kmeans consumer; this pass is ~4x
    faster at sf0.1 with bit-identical output.)"""
    import numpy as np

    cids = sorted(centroids)
    cmat = np.array([centroids[c] for c in cids], dtype=np.float64)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"vec_id": [], "embedding": [], "cluster": [], "dist": []}
                )
                continue
            vecs = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            n = len(pdf)
            dists = np.empty((n, len(cids)), dtype=np.float64)
            for j in range(len(cids)):
                diff = vecs - cmat[j]
                # cumsum = sequential left-to-right fold (exactness
                # contract above); plain .sum() is pairwise and drifts
                # in the last ulps
                dists[:, j] = np.cumsum(diff * diff, axis=1)[:, -1]
            best = np.argmin(dists, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "embedding": pdf["embedding"],
                    "cluster": [int(cids[b]) for b in best],
                    "dist": dists[np.arange(n), best],
                }
            )

    types = dict(emb.dtypes)
    return emb.select("vec_id", "embedding").mapInPandas(
        run,
        f"vec_id {types['vec_id']}, embedding {types['embedding']}, "
        "cluster int, dist double",
    )


def _step_cells(emb: DataFrame, centroids: dict[int, list[float]]) -> DataFrame:
    """One Lloyd iteration's assignment AND per-partition partial-mean
    cells in a SINGLE python pass (r13, guide §4.2/§2.3 — the r12 "Not
    yet optimized" #1): returns k×dims (cluster, pos, s, n) cells per
    partition instead of shipping every (vec_id, embedding, cluster)
    row back across Arrow and posexploding n×dims rows through the JVM
    hash aggregate.  The shuffle still happens once per iteration, but
    it now carries k×dims×partitions cells, and the dominant costs —
    the n×dims Arrow return payload and the n×dims-row partial
    aggregate — disappear.

    FLOAT-EXACT to the _assign → posexplode → partial-avg path it
    replaces: distances use the same cumsum sequential fold and
    first-index argmin (ties to the lowest cid) as _assign; the partial
    sum folds member rows INTO the running buffer row-by-row in batch
    order — np.cumsum over [running, v1, v2, ...] — which is exactly
    the JVM hash aggregate's buffer(group) += v per-row recurrence
    starting from 0.0, so each partition emits bit-identical partials.
    The merge of partials across partitions (SUM below) happens in
    shuffle-fetch order, the same nondeterminism class Spark's own
    partial-avg merge always had — absorbed by ROUND(mean, 9) exactly
    as before."""
    import numpy as np

    cids = sorted(centroids)
    cmat = np.array([centroids[c] for c in cids], dtype=np.float64)
    k, d = cmat.shape

    def run(batches):
        import pandas as pd

        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            n = len(pdf)
            dists = np.empty((n, k), dtype=np.float64)
            for j in range(k):
                diff = vecs - cmat[j]
                dists[:, j] = np.cumsum(diff * diff, axis=1)[:, -1]
            best = np.argmin(dists, axis=1)
            for j in range(k):
                m = vecs[best == j]
                if len(m):
                    sums[j] = np.cumsum(
                        np.vstack([sums[j][None, :], m]), axis=0
                    )[-1]
                    counts[j] += len(m)
        live = counts > 0
        if not live.any():
            yield pd.DataFrame(
                {"cluster": [], "pos": [], "s": [], "n": []}
            ).astype(
                {"cluster": "int32", "pos": "int32", "s": "float64",
                 "n": "int64"}
            )
            return
        idx = np.nonzero(live)[0]
        yield pd.DataFrame(
            {
                "cluster": np.repeat(
                    np.array([int(cids[i]) for i in idx]), d
                ).astype("int32"),
                "pos": np.tile(np.arange(d, dtype="int32"), len(idx)),
                "s": sums[idx].reshape(-1),
                "n": np.repeat(counts[idx], d),
            }
        )

    return emb.select("embedding").mapInPandas(
        run, "cluster int, pos int, s double, n long"
    )


def _update(emb: DataFrame, centroids: dict[int, list[float]]) -> dict[int, list[float]]:
    """New centroids = elementwise member mean — one shuffle on
    (cluster, pos) over the k×dims×partitions partial cells, then a
    bounded k*dims-row collect (the model, not the data)."""
    # ROUND(mean, 9): the mean of arbitrary doubles is summation-order
    # dependent in the last ulps (Spark merges partials in shuffle order,
    # DuckDB sums sequentially); rounding far below data scale makes the
    # next iteration's centroids bit-identical across engines instead of
    # letting a 1-ulp drift flip a near-tie assignment.  SUM(s)/SUM(n)
    # is Average.evaluateExpression's own sum / cast(count as double).
    rows = (
        _step_cells(emb, centroids)
        .groupBy("cluster", "pos")
        .agg(
            F.round(
                F.sum("s") / F.sum("n").cast("double"), 9
            ).alias("m")
        )
        .collect()
    )
    out: dict[int, list[float]] = {}
    for r in sorted(rows, key=lambda r: (r.cluster, r.pos)):
        out.setdefault(r.cluster, []).append(r.m)
    return out


def kmeans_train(
    emb: DataFrame, k: int = K, iters: int = ITERS
) -> tuple[dict[int, list[float]], DataFrame]:
    """Lloyd's k-means: deterministic init (first k by vec_id), `iters`
    assignment/update passes.  Returns (centroids, final assignment)."""
    seeds = emb.orderBy("vec_id").limit(k).collect()
    centroids = {
        i: [float(x) for x in r.embedding] for i, r in enumerate(seeds)
    }
    for _ in range(iters):
        centroids = _update(emb, centroids)
    return centroids, _assign(emb, centroids)


def _kmeans_cte_blocks() -> tuple[list[str], str]:
    """The unrolled Lloyd-iteration CTE blocks and the name of the final
    centroid CTE — shared by the kmeans oracle and the composed
    kmeans→IVF oracle (operators/dedup_ops-style composition)."""
    init = f"""
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         [x::DOUBLE for x in embedding] AS ce
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {K}))"""
    blocks = [init]
    prev = "c0"
    for i in range(1, ITERS + 1):
        blocks.append(f"""
d{i} AS (
  SELECT e.vec_id, c.cid,
         list_aggregate([ (e.embedding[j]::DOUBLE - c.ce[j]) ^ 2
                          for j in range(1, len(c.ce) + 1) ], 'sum') AS dist,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY list_aggregate(
                              [ (e.embedding[j]::DOUBLE - c.ce[j]) ^ 2
                                for j in range(1, len(c.ce) + 1) ], 'sum'),
                            c.cid) AS rn
  FROM embeddings e CROSS JOIN {prev} c),
a{i} AS (SELECT vec_id, cid AS cluster FROM d{i} WHERE rn = 1),
c{i} AS (
  SELECT cluster AS cid, array_agg(m ORDER BY pos) AS ce FROM (
    SELECT a.cluster, t.j AS pos, ROUND(AVG(e.embedding[t.j]::DOUBLE), 9) AS m
    FROM a{i} a JOIN embeddings e ON e.vec_id = a.vec_id
    CROSS JOIN unnest(range(1, len(e.embedding) + 1)) AS t(j)
    GROUP BY a.cluster, t.j)
  GROUP BY cluster)""")
        prev = f"c{i}"
    return blocks, prev


def _kmeans_oracle() -> str:
    blocks, prev = _kmeans_cte_blocks()
    final = f"""
df AS (
  SELECT e.vec_id, c.cid,
         list_aggregate([ (e.embedding[j]::DOUBLE - c.ce[j]) ^ 2
                          for j in range(1, len(c.ce) + 1) ], 'sum') AS dist,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY list_aggregate(
                              [ (e.embedding[j]::DOUBLE - c.ce[j]) ^ 2
                                for j in range(1, len(c.ce) + 1) ], 'sum'),
                            c.cid) AS rn
  FROM embeddings e CROSS JOIN {prev} c),
af AS (SELECT vec_id, cid AS cluster, dist FROM df WHERE rn = 1),
nrm AS (
  SELECT cid, sqrt(list_aggregate([x * x for x in ce], 'sum')) AS cnorm
  FROM {prev})
SELECT a.cluster, COUNT(*) AS n_members,
       ROUND(SUM(a.dist), 2) AS inertia,
       ROUND(ANY_VALUE(n.cnorm), 4) AS centroid_norm
FROM af a JOIN nrm n ON n.cid = a.cluster
GROUP BY a.cluster"""
    blocks.append(final)
    return "WITH " + ",".join(blocks)


@register("emb_kmeans_train", oracle=_kmeans_oracle())
def emb_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means coarse-quantizer training (k=8, 3 Lloyd iterations) over
    the embeddings table, reported as per-cluster (size, inertia,
    centroid norm).  The iterative dataflow collects only the k x dims
    model per pass — the data is never collected, and each pass is an
    independent scan+shuffle (no lineage growth), which is what keeps
    iteration viable at 100 TB."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    centroids, assigned = kmeans_train(emb)
    norms = {
        cid: round(math.sqrt(sum(x * x for x in ce)), 4)
        for cid, ce in centroids.items()
    }
    norm_expr = None
    for cid in sorted(norms):
        cond = F.col("cluster") == cid
        norm_expr = (
            F.when(cond, norms[cid])
            if norm_expr is None
            else norm_expr.when(cond, norms[cid])
        )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.sum("dist"), 2).alias("inertia"),
        )
        .withColumn("centroid_norm", norm_expr)
    )


def _kmeans_ivf_oracle() -> str:
    """kmeans-trained coarse quantizer feeding the IVF search — the
    composed oracle reuses the Lloyd CTE blocks as the centroid table."""
    from snappydata_spark.operators.dedup_ops import _cos_sql

    blocks, prev = _kmeans_cte_blocks()
    search = f"""
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
cc AS (SELECT e.vec_id, c.cid, {_cos_sql('e.embedding', 'c.ce')} AS cc
       FROM embeddings e, {prev} c),
assign AS (SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid) AS rn
    FROM cc) WHERE rn = 1),
probe AS (SELECT cid AS cell FROM
    (SELECT c.cid, {_cos_sql('c.ce', 'q.qe')} AS qc FROM {prev} c, q)
    ORDER BY qc DESC, cid LIMIT 4)
SELECT e.vec_id, ROUND({_cos_sql('e.embedding', 'q.qe')}, 4) AS cos
FROM embeddings e
JOIN assign a ON a.vec_id = e.vec_id
JOIN probe p ON p.cell = a.cell
CROSS JOIN q
WHERE e.vec_id <> 0
ORDER BY cos DESC, e.vec_id
LIMIT 10"""
    return "WITH " + ",".join(blocks) + "," + search


@register("sim_ivf_kmeans_topk", oracle=_kmeans_ivf_oracle())
def sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ANN pipeline: TRAIN the coarse quantizer (kmeans_train,
    3 Lloyd iterations) → INDEX (vectorized numpy cell assignment, the
    zero-shuffle scale path) → SEARCH (probe the 4 nearest cells,
    brute-force cosine only inside them).  Replaces sim_ivf_topk's
    deterministic-sample centroids with trained ones — the full
    train/index/search composition a 100 TB vector pipeline runs, every
    stage hash-checked by one composed oracle."""
    from snappydata_spark import ann

    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    centroids, _ = kmeans_train(emb)
    cent = spark.createDataFrame(
        sorted((int(cid), ce) for cid, ce in centroids.items()),
        "cid long, ce array<double>",
    )
    assign = ann.ivf_assign_vectorized(emb, ann.collect_centroids(cent))
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return ann.ivf_search(
        emb.filter(F.col("vec_id") != 0), assign, cent, query, k=10, nprobe=4
    )


def _cluster_sample_oracle(m: int = 10) -> str:
    blocks, prev = _kmeans_cte_blocks()
    final = f"""
dfin AS (
  SELECT e.vec_id, c.cid,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY list_aggregate(
                              [ (e.embedding[j]::DOUBLE - c.ce[j]) ^ 2
                                for j in range(1, len(c.ce) + 1) ], 'sum'),
                            c.cid) AS rn
  FROM embeddings e CROSS JOIN {prev} c),
afin AS (SELECT vec_id, cid AS cluster FROM dfin WHERE rn = 1)
SELECT cluster, vec_id, rank FROM (
  SELECT cluster, vec_id,
         ROW_NUMBER() OVER (PARTITION BY cluster
                            ORDER BY md5(vec_id::VARCHAR), vec_id) AS rank
  FROM afin) WHERE rank <= {m}"""
    blocks.append(final)
    return "WITH " + ",".join(blocks)


@register("pipeline_cluster_balanced_sample", oracle=_cluster_sample_oracle())
def pipeline_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling for training mixes: take an EQUAL number of
    examples from every learned kmeans cluster (vs pipeline_domain_mix,
    which stratifies on a metadata column).  Per-cluster selection orders
    by md5(vec_id) — a deterministic pseudo-random draw reproducible in
    the oracle.  Scale: the rank window partitions by cluster over the
    (id, cluster) assignment — n rows, k partitions, one shuffle; the
    embedding payload never rides through the window."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    from pyspark.sql import Window as W

    _, assigned = kmeans_train(t["embeddings"])
    w = W.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        assigned.select("cluster", "vec_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )


# ------------------------------------------------- PCA via power iteration

PCA_ITERS = 3


def _pca_oracle() -> str:
    """Unrolled power-iteration oracle: covariance from an exploded
    position self-join, then PCA_ITERS matrix-vector CTE steps."""
    blocks = [
        """
x AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
nn AS (SELECT COUNT(*) AS n FROM embeddings),
mu AS (SELECT i, SUM(v) / (SELECT n FROM nn) AS m FROM x GROUP BY i),
g AS (
  SELECT a.i AS i, b.i AS j, SUM(a.v * b.v) AS s
  FROM x a JOIN x b USING (vec_id) GROUP BY a.i, b.i
),
c AS (
  SELECT g.i, g.j, g.s / (SELECT n FROM nn) - ma.m * mb.m AS c
  FROM g JOIN mu ma ON g.i = ma.i JOIN mu mb ON g.j = mb.i
),
v0 AS (SELECT i, 1.0 AS val FROM mu)"""
    ]
    prev = "v0"
    for it in range(1, PCA_ITERS + 1):
        blocks.append(
            f"""
w{it} AS (
  SELECT c.i, SUM(c.c * {prev}.val) AS val
  FROM c JOIN {prev} ON c.j = {prev}.i GROUP BY c.i
),
v{it} AS (
  SELECT i, val / (SELECT SQRT(SUM(val * val)) FROM w{it}) AS val FROM w{it}
)"""
        )
        prev = f"v{it}"
    blocks.append(
        f"""
lam AS (
  SELECT SUM(va.val * c.c * vb.val) AS l
  FROM c JOIN {prev} va ON c.i = va.i JOIN {prev} vb ON c.j = vb.i
),
tr AS (SELECT SUM(c) AS t FROM c WHERE i = j)"""
    )
    return (
        "WITH "
        + ",".join(blocks)
        + f"""
SELECT {prev}.i AS dim, ROUND({prev}.val, 4) AS comp,
       ROUND((SELECT l FROM lam), 3) AS eigval,
       ROUND((SELECT l FROM lam) / (SELECT t FROM tr), 4) AS var_ratio
FROM {prev}"""
    )


@register("emb_pca_power_iteration", oracle=_pca_oracle())
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA building block: the covariance (Gram) matrix is
    computed as PER-PARTITION numpy partials (each Arrow batch folds to
    one d x d matrix + d sums + a count) merged by one d^2-key shuffle —
    the classic tree-aggregate shape, O(n*d^2) flops but only
    O(partitions * d^2) rows ever shuffled and a bounded d^2-cell driver
    collect (d=64 here).  The dominant eigenvector then comes from
    PCA_ITERS fixed power-iteration steps on the driver-side d x d
    matrix (model-sized, like the k-means centroid update above).  At
    100 TB nothing about this plan changes: the data pass is one
    mapInPandas scan, state is d^2 doubles.  The oracle reproduces the
    identical math with an exploded self-join + unrolled CTE steps, so
    the whole pipeline (moments -> covariance -> iteration -> eigval/
    trace) is hash-checked, not just row-counted."""
    import numpy as np
    import pandas as pd

    t = load_tables(spark, sf_dir, ("embeddings",))

    def partial_moments(batches):
        n = 0
        s = np.zeros(DIMS, dtype=np.float64)
        g = np.zeros((DIMS, DIMS), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        if n == 0:
            return
        ii, jj = np.meshgrid(np.arange(DIMS), np.arange(DIMS), indexing="ij")
        yield pd.DataFrame(
            {
                "i": np.concatenate([ii.ravel(), np.arange(DIMS), [-1]]),
                "j": np.concatenate([jj.ravel(), np.full(DIMS, -1), [-1]]),
                "val": np.concatenate([g.ravel(), s, [float(n)]]),
            }
        )

    parts = (
        t["embeddings"]
        .select("embedding")
        .mapInPandas(partial_moments, "i long, j long, val double")
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
        .collect()  # bounded: d^2 + d + 1 rows of merged partials
    )
    g = np.zeros((DIMS, DIMS))
    s = np.zeros(DIMS)
    n = 0.0
    for r in parts:
        if r.i == -1:
            n = r.val
        elif r.j == -1:
            s[r.i] = r.val
        else:
            g[r.i, r.j] = r.val
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    v = np.ones(DIMS)
    for _ in range(PCA_ITERS):
        w = cov @ v
        v = w / math.sqrt(float(w @ w))
    lam = float(v @ cov @ v)
    ratio = lam / float(np.trace(cov))
    rows = [
        (int(i) + 1, round(float(v[i]), 4), round(lam, 3), round(ratio, 4))
        for i in range(DIMS)
    ]
    return spark.createDataFrame(
        rows, "dim long, comp double, eigval double, var_ratio double"
    )


# ------------------------------------------- logistic regression (GD)

LR_STEPS = 3
LR_RATE = 0.5
LR_DIMS = 8  # first 8 embedding dims as features


def _logreg_cte_blocks() -> tuple[list[str], str]:
    """The unrolled gradient-descent CTE blocks and the final weight CTE
    name — shared by the train oracle and the composed train→eval
    oracle (the kmeans-blocks pattern above)."""
    head = f"""
x AS (
  SELECT vec_id, CAST(label = 0 AS DOUBLE) AS y,
         list_prepend(1.0, [CAST(v AS DOUBLE) FOR v IN embedding[1:{LR_DIMS}]]) AS f
  FROM embeddings
),
xp AS (
  SELECT vec_id, y, unnest(f) AS xv, generate_subscripts(f, 1) - 1 AS j
  FROM x
),
nn AS (SELECT COUNT(*) AS n FROM x),
w0 AS (SELECT j, 0.0 AS val FROM (SELECT unnest(range(0, {LR_DIMS + 1})) AS j))"""
    blocks = [head]
    prev = "w0"
    for t in range(1, LR_STEPS + 1):
        blocks.append(f"""
z{t} AS (
  SELECT xp.vec_id, MIN(xp.y) AS y,
         1.0 / (1.0 + EXP(-SUM({prev}.val * xp.xv))) AS p
  FROM xp JOIN {prev} ON xp.j = {prev}.j GROUP BY xp.vec_id
),
g{t} AS (
  SELECT xp.j, SUM((z{t}.p - z{t}.y) * xp.xv) / (SELECT n FROM nn) AS val
  FROM xp JOIN z{t} ON xp.vec_id = z{t}.vec_id GROUP BY xp.j
),
w{t} AS (
  SELECT {prev}.j, {prev}.val - {LR_RATE} * g{t}.val AS val
  FROM {prev} JOIN g{t} ON {prev}.j = g{t}.j
)""")
        prev = f"w{t}"
    blocks.append(f"""
zf AS (
  SELECT xp.vec_id, MIN(xp.y) AS y,
         1.0 / (1.0 + EXP(-SUM({prev}.val * xp.xv))) AS p
  FROM xp JOIN {prev} ON xp.j = {prev}.j GROUP BY xp.vec_id
)""")
    return blocks, prev


def _logreg_oracle() -> str:
    """Unrolled full-batch gradient-descent oracle: features exploded by
    position, each step = z/p per vector -> gradient sums -> weight
    update, expressed as chained CTEs.  j=0 is the bias (x_0 = 1)."""
    blocks, prev = _logreg_cte_blocks()
    blocks = blocks + [f"""
loss AS (
  SELECT -SUM(y * LN(p) + (1 - y) * LN(1 - p)) / (SELECT n FROM nn) AS l
  FROM zf
)"""]
    return (
        "WITH " + ",".join(blocks) + f"""
SELECT {prev}.j AS j, ROUND({prev}.val, 6) AS weight,
       ROUND((SELECT l FROM loss), 6) AS final_loss
FROM {prev}"""
    )


@register("emb_logreg_train", oracle=_logreg_oracle())
def emb_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training (binary: cluster label 0
    vs rest over the first LR_DIMS embedding dims + bias) by full-batch
    gradient descent — the third iterative-operator pattern next to
    k-means and PCA: each step is ONE distributed pass where the model
    enters as literal weights folded into a Catalyst expression (no
    Python, no shuffle beyond the d+1-cell aggregate), and only the
    (d+1)-double model returns to the driver.  At 100 TB each pass is a
    map + tree-aggregate of 9 sums; 100 steps plan exactly like 1 (no
    lineage growth — each pass re-reads the scan with new literals).
    The oracle unrolls the identical math as chained CTEs, so weights
    AND final log-loss are hash-checked across engines."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    w, loss = logreg_fit(t["embeddings"], with_loss=True)
    rows = [(j, round(w[j], 6), loss) for j in range(LR_DIMS + 1)]
    return spark.createDataFrame(rows, "j long, weight double, final_loss double")


def _logreg_base(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        F.when(F.col("label") == 0, 1.0).otherwise(0.0).alias("y"),
        *[
            F.element_at(F.col("embedding"), j).cast("double").alias(f"x{j}")
            for j in range(1, LR_DIMS + 1)
        ],
    )


def _logreg_z(w: list[float]):
    z = F.lit(w[0])
    for j in range(1, LR_DIMS + 1):
        z = z + F.lit(w[j]) * F.col(f"x{j}")
    return z


def logreg_fit(emb: DataFrame, with_loss: bool = False):
    """Full-batch GD fit; returns (weights, final_loss | None).  One
    distributed pass per step (model as literals, d+1-cell aggregate);
    only the model returns to the driver."""
    base = _logreg_base(emb).persist()
    try:
        # r12 (guide §1.2): n rides the FIRST gradient aggregate as one
        # extra count cell instead of a separate count() job — one
        # distributed pass per step, exactly LR_STEPS (+1 for loss)
        # passes total.  The first agg also materializes the persist.
        n = None
        w = [0.0] * (LR_DIMS + 1)  # w[0] = bias
        for _ in range(LR_STEPS):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logreg_z(w)))
            err = p - F.col("y")
            extra = [] if n is not None else [F.count(F.lit(1)).alias("nn")]
            sums = base.agg(
                F.sum(err).alias("g0"),
                *[
                    F.sum(err * F.col(f"x{j}")).alias(f"g{j}")
                    for j in range(1, LR_DIMS + 1)
                ],
                *extra,
            ).collect()[0]
            if n is None:
                n = int(sums["nn"])
            w = [
                w[j] - LR_RATE * float(sums[f"g{j}"]) / n
                for j in range(LR_DIMS + 1)
            ]
        loss = None
        if with_loss:
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logreg_z(w)))
            loss_row = base.agg(
                (
                    -F.sum(
                        F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1 - p)
                    )
                    / n
                ).alias("l")
            ).collect()[0]
            loss = round(float(loss_row["l"]), 6)
    finally:
        base.unpersist()
    return w, loss


def _logreg_eval_oracle() -> str:
    blocks, prev = _logreg_cte_blocks()
    return (
        "WITH " + ",".join(blocks) + """
SELECT CAST(SUM(CASE WHEN ROUND(p, 6) >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN ROUND(p, 6) >= 0.5 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN ROUND(p, 6) < 0.5 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       CAST(SUM(CASE WHEN ROUND(p, 6) < 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       ROUND(SUM(CASE WHEN (ROUND(p, 6) >= 0.5) = (y = 1) THEN 1 ELSE 0 END)
             ::DOUBLE / COUNT(*), 4) AS accuracy
FROM zf"""
    )


@register("emb_logreg_eval", oracle=_logreg_eval_oracle())
def emb_logreg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→infer→evaluate in one dataflow: fit the logistic model
    (logreg_fit — model-sized collects only), score every vector with
    the trained weights as a literal expression (map-only pass), and
    report the confusion matrix + accuracy of the 0.5-threshold
    classifier against the cluster-0 label.  The composed oracle
    re-derives the weights with the shared unrolled-GD CTE blocks, so
    training AND inference are hash-checked together.  Probabilities
    round to 6 before thresholding on both engines (the sigmoid's last
    ulp differs with summation order; the rounded compare is exact)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    w, _ = logreg_fit(t["embeddings"])
    base = _logreg_base(t["embeddings"])
    p = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-_logreg_z(w))), 6
    )
    pred = (p >= 0.5).cast("int")
    y = F.col("y").cast("int")
    return base.select(pred.alias("pred"), y.alias("yy")).agg(
        F.sum(((F.col("pred") == 1) & (F.col("yy") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("pred") == 1) & (F.col("yy") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("pred") == 0) & (F.col("yy") == 0)).cast("long")).alias("tn"),
        F.sum(((F.col("pred") == 0) & (F.col("yy") == 1)).cast("long")).alias("fn"),
        F.round(
            F.sum((F.col("pred") == F.col("yy")).cast("long")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("accuracy"),
    )

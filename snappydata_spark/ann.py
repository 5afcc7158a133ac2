"""IVF-style approximate nearest neighbor search over embedding columns.

The reference has no vector search (SURVEY.md §2 marks range/as-of/vector
ops "not implemented"); this is part of the training-data-pipeline surface
this engine adds as first-class.  Design:

- **Coarse quantizer**: a small set of centroid vectors (trained offline
  with KMeans, or any deterministic sample).  Centroids are broadcast —
  they are tiny (C × dims floats) even when the base table is 100 TB.
- **Assignment (index build)**: every vector gets the cell of its nearest
  centroid.  Two paths: a pure-DataFrame path (explode over broadcast
  centroids + max_by argmax — one shuffle on vec_id, oracle-checkable)
  and a vectorized `mapInPandas` path (numpy matmul per Arrow batch —
  zero shuffle, the path you run at scale).
- **Search**: rank centroids by similarity to the query, probe the top
  `nprobe` cells, brute-force cosine only within the probed cells.  Cell
  membership is a semi-join against a broadcast probe list, so the scan
  prunes to ~nprobe/C of the data before any expensive math.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from snappydata_spark.functions import vector as V


#: centroid lists beyond this are almost certainly a bug (a real IVF uses
#: C ≈ sqrt(N) cells, e.g. 10k-100k for billions of vectors); the collect
#: guard refuses rather than OOM-ing the driver
MAX_CENTROIDS = 65536


def collect_centroids(
    centroids: DataFrame, max_centroids: int = MAX_CENTROIDS
) -> list:
    """Safely collect the centroid table to the driver for the vectorized
    assignment path.  Centroids are bounded by design (coarse quantizer);
    this guard turns an accidental full-table centroid frame into a clear
    error instead of a driver OOM."""
    # ONE bounded job: collecting max+1 rows both fetches the centroids
    # and proves the bound (a separate count() re-ran the centroid plan)
    rows = centroids.orderBy(centroids.columns[0]).limit(max_centroids + 1).collect()
    if len(rows) > max_centroids:
        raise ValueError(
            f"centroid table has > max_centroids={max_centroids} rows; "
            "IVF coarse quantizers are small by construction — check the "
            "centroid selection, or raise max_centroids explicitly"
        )
    return [(r[0], list(r[1])) for r in rows]


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell) via DataFrame argmax over broadcast centroids.

    NOTE: this is the oracle/cross-check path — it explodes |emb| × C rows
    before the argmax.  The default for real workloads is
    `ivf_assign_vectorized` (numpy matmul per Arrow batch, zero shuffle,
    no row explosion); this variant exists because it is expressible in
    ANSI SQL and therefore differential-testable.

    centroids: DataFrame[cid: long, ce: array<float>].  Ties break to the
    lowest cid (max_by on (cos, -cid)) so results are deterministic and
    reproducible in ANSI SQL.
    """
    # r13b (guide §1.2 per-task work): cosine(a, b) factors as
    # dot(a, b) / (norm(a) * norm(b)) — norm(a) depends only on the row
    # and norm(b) only on the centroid, yet V.cosine inside the exploded
    # join recomputed BOTH per (row × centroid) pair, plus a float→double
    # transform of each array per pair.  Hoist the double-cast and the
    # norm below the join: one cast + one norm per row (and per
    # centroid), leaving exactly one zip_with/fold (the dot) per pair —
    # ~4 array passes per pair become 1.  Float-exact: the same three
    # sub-expressions combine with the same ops, so cc is bit-identical
    # (the oracle's argmax sees the identical doubles).
    left = emb.select(
        F.col(id_col),
        V._as_double(F.col(vec_col)).alias("__va"),
    ).withColumn("__vn", V.norm_of_double(F.col("__va")))
    cent = centroids.select(
        "cid",
        V._as_double(F.col("ce")).alias("__ca"),
    ).withColumn("__cn", V.norm_of_double(F.col("__ca")))
    cc = left.join(F.broadcast(cent)).select(
        F.col(id_col),
        F.col("cid"),
        (
            V.dot_of_double(F.col("__va"), F.col("__ca"))
            / (F.col("__vn") * F.col("__cn"))
        ).alias("cc"),
    )
    return cc.groupBy(id_col).agg(
        F.max_by("cid", F.struct(F.col("cc"), (-F.col("cid")).alias("neg"))).alias(
            "cell"
        )
    )


def ivf_assign_vectorized(
    emb: DataFrame,
    centroid_rows: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """DEFAULT assignment path: per-batch numpy matmul against the
    centroid matrix — no shuffle, no per-centroid row explosion.
    `centroid_rows` is the collected [(cid, vector), ...] list (tiny;
    ships in the task closure exactly like a broadcast) — obtain it via
    `collect_centroids(df)`, which guards the driver against oversized
    centroid frames."""
    import numpy as np

    cids = [int(c) for c, _ in centroid_rows]
    mat = np.array([v for _, v in centroid_rows], dtype="float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.array(pdf[vec_col].tolist(), dtype="float64")
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (vecs / norms) @ mat.T
            best = sims.argmax(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "cell": [cids[i] for i in best]}
            )

    # preserve the caller's actual id type (string/int32 ids would fail
    # or miscast under a hardcoded long)
    id_type = dict(emb.dtypes)[id_col]
    return emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} {id_type}, cell long"
    )


def ivf_search(
    emb: DataFrame,
    assign: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine within the `nprobe` cells nearest the query.

    query: single-row DataFrame[qe: array<float>].  The probe list and
    the query vector are broadcast; the only large-side work is a
    semi-join prune followed by map-side cosine + TakeOrderedAndProject.
    """
    probe = (
        centroids.join(F.broadcast(query))
        .select("cid", V.cosine(F.col("ce"), F.col("qe")).alias("qc"))
        .orderBy(F.col("qc").desc(), F.col("cid"))
        .limit(nprobe)
        .select(F.col("cid").alias("cell"))
    )
    # r12 (guide §2.3): prune the assignment by the probe cells BEFORE
    # attaching embeddings — the emb⋈assign join's build side shrinks to
    # ~nprobe/C of the corpus (and broadcasts at bench scale) instead of
    # joining the full assignment and discarding 1-nprobe/C of it after
    pruned = assign.join(F.broadcast(probe), "cell", "left_semi")
    candidates = emb.join(pruned, id_col)
    return (
        candidates.join(F.broadcast(query))
        .select(
            id_col,
            F.round(V.cosine(F.col(vec_col), F.col("qe")), 4).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )

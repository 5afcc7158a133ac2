"""Scale rehearsal for the retrieval/index/sketch surface (round 6).

BENCH_SF1.md's earlier rehearsals predate the materialized index triad,
the retrieval stack, and the verified sketches.  This tool measures, at
one sf_dir:

- index BUILD wall (once) for ivf_sq8 / inverted / minhash over managed
  copies of embeddings/documents;
- index SERVE wall for N successive DISTINCT probes per index — serve
  must be flat across probes (no hidden per-probe rebuild) and, compared
  across sf_dirs, ~independent of corpus size after build (the
  build-once/query-many contract);
- the retrieval / sketch / dedup-substrate registry queries, timed with
  the bench.py method (one warmup + one timed run).

Run at two scale factors and compare:
    python tools/bench_index_scale.py /root/testdata/sf0.1 /tmp/ixs_01.json
    python tools/bench_index_scale.py /tmp/sfgen/sf1     /tmp/ixs_1.json
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROBES = 5

REGISTRY_QUERIES = [
    # retrieval stack
    "txt_bm25_topk",
    "txt_bm25_index_topk",
    "txt_bm25_sql_routed",
    "sim_hybrid_rrf_topk",
    "pipeline_rag_topk",
    "sim_ivf_sq8_index_topk",
    "sim_ann_sql_routed",
    "dedup_minhash_lsh_index",
    "dedup_incoming_batch_gate",
    # verified sketches
    "ev_hll_registers",
    "ev_hll_estimate_exact",
    "ev_cms_counters",
    "ev_cms_topk_estimate",
    "ev_kmv_distinct_by_type",
    "aqp_hll_union_daily",
    "ev_approx_distinct_users",
    "aqp_sample_hashed_estimate",
    "aqp_sample_estimate_with_error",
    # vectorized dedup substrates
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "txt_substring_dedup",
    "txt_substring_dedup_clean",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import functions as F

    from snappydata_spark import SnappySession, get_spark, index_inverted, index_minhash
    from snappydata_spark.operators import QUERIES

    spark = get_spark("bench-index-scale")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm JVM/IO

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_vec, n_doc = emb.count(), docs.count()
    sn = SnappySession(spark, store_dir=tempfile.mkdtemp(prefix="ixscale_"))

    build: dict[str, float] = {}
    t0 = time.time()
    sn.create_table("ix_emb", options={"key_columns": "vec_id"}, df=emb)
    sn.sql("CREATE INDEX ix_ivf ON ix_emb(embedding) USING ivf_sq8")
    build["ivf_sq8"] = round(time.time() - t0, 3)
    t0 = time.time()
    sn.create_table("ix_docs", options={"key_columns": "doc_id"}, df=docs)
    sn.sql("CREATE INDEX ix_inv ON ix_docs(text) USING inverted")
    build["inverted"] = round(time.time() - t0, 3)
    t0 = time.time()
    sn.sql("CREATE INDEX ix_mh ON ix_docs(text) USING minhash")
    build["minhash"] = round(time.time() - t0, 3)
    print(f"# build: {build} (n_vec={n_vec}, n_doc={n_doc})", file=sys.stderr)

    serve: dict[str, list[float]] = {"ann_routed_sql": [], "bm25": [], "minhash_gate": []}
    qvecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < N_PROBES).collect()
    }
    for i in range(N_PROBES):
        arr = ", ".join(repr(v) for v in qvecs[i])
        t0 = time.time()
        sn.sql(
            f"SELECT vec_id, ROUND(cosine_sim(embedding, array({arr})), 4) AS c "
            f"FROM ix_emb ORDER BY cosine_sim(embedding, array({arr})) DESC, "
            "vec_id LIMIT 10"
        ).count()
        serve["ann_routed_sql"].append(round(time.time() - t0, 3))
    term_sets = [
        ["vector", "query", "join"],
        ["science", "data"],
        ["model", "training", "scale"],
        ["index", "scan"],
        ["stream", "window", "state"],
    ]
    for terms in term_sets[:N_PROBES]:
        t0 = time.time()
        index_inverted.bm25_topk(sn, "ix_inv", terms, k=15).count()
        serve["bm25"].append(round(time.time() - t0, 3))
    for i in range(N_PROBES):
        probe = docs.filter(
            (F.col("doc_id") % 97 == i) & (F.col("doc_id") < 2000)
        ).limit(20)
        t0 = time.time()
        index_minhash.near_dup_lookup(sn, "ix_mh", probe).count()
        serve["minhash_gate"].append(round(time.time() - t0, 3))
    print(f"# serve: {serve}", file=sys.stderr)

    # batch vs sequential: ONE distributed plan serving all N probes —
    # the point of batch serving is that it beats N sequential serves
    # (shared probe pass, shared df/idf, one candidate shuffle)
    from snappydata_spark import index_ann

    batch: dict[str, float] = {}
    qdf = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    t0 = time.time()
    index_ann.search_ivf_sq8_batch(
        sn, "ix_ivf", qdf, topk=10, cand=50, nprobe=4,
        exclude_same_id=True, widen_to_full_recall=False,
    ).count()
    batch[f"ann_batch_of_{N_PROBES}"] = round(time.time() - t0, 3)
    bq = spark.createDataFrame(
        [(i, ts) for i, ts in enumerate(term_sets[:N_PROBES])],
        "qid int, terms array<string>",
    )
    t0 = time.time()
    index_inverted.bm25_topk_batch(sn, "ix_inv", bq, k=15).count()
    batch[f"bm25_batch_of_{N_PROBES}"] = round(time.time() - t0, 3)
    print(f"# batch: {batch}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in REGISTRY_QUERIES:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warmup (and index-session build)
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    result = {
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "n_docs": n_doc,
        "build": build,
        "serve_probes": serve,
        "serve_batch": batch,
        "queries": timings,
    }
    line = json.dumps(result)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line)
    print(line)


if __name__ == "__main__":
    main()

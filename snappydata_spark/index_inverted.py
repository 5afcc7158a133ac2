"""Materialized inverted index: postings stored once, BM25 served many.

`CREATE INDEX idx ON t(text) USING inverted` tokenizes every document
ONCE and stores the postings in a managed keyed table `idx__ann`:

    (<id_col>, term string, tf bigint, dl int)   -- key = (<id_col>, term)

range-clustered on `term` so a query's postings scan prunes row groups
by footer min/max (the lexical twin of index_ann's cell clustering; the
reference materializes CREATE INDEX structures as maintained tables —
IndexColumnFormatRelation, ColumnFormatRelation.scala:633).  Per-doc
length (dl) is denormalized onto each posting so scoring needs no join
back to the base table; corpus stats (N, avgdl) derive from the
postings at query time with one tiny aggregate.

- `bm25_topk(sn, idx, terms, k)` — BM25 over the STORED postings for an
  ad-hoc term list: tokenization of the corpus never re-runs; the scan
  reads only the query terms' postings.  Scoring follows the
  txt_bm25_topk float discipline (idf/avgdl/per-term scores rounded,
  fixed-order term sum via a pivot).
- Mutations maintain the postings through the session's `_ann_maintain`
  hook: touched docs re-tokenize, their STALE postings (terms no longer
  present) delete by key, fresh ones PUT; deleted docs' postings prune.

Completes the materialized retrieval triad: dense (ivf_sq8), near-dup
(minhash), lexical (inverted) — all maintained indexes over managed
tables, all serving oracle-checkable queries.

Scale: postings are (term, id, two ints) — the classic search-engine
layout; per-term posting lists shard naturally by the (id, term) key,
and query cost is bounded by the query terms' document frequency, not
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from snappydata_spark.functions import text as T


def _postings(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    tok = df.select(
        F.col(id_col), T.tokens(F.col(text_col)).alias("__t")
    )
    return (
        tok.select(
            id_col,
            F.size("__t").alias("dl"),
            F.explode("__t").alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )


def build_inverted(
    sn, index_name: str, table: str, text_col: str, id_col: str | None = None
) -> dict:
    meta = sn.catalog.load_meta(sn._canon(table))
    if id_col is None:
        if not meta.key_columns:
            raise ValueError(
                f"inverted index on {table} needs KEY_COLUMNS (or an "
                "explicit id column) to key the postings table"
            )
        id_col = meta.key_columns[0]
    idx_table = f"{index_name}__ann"
    rows = _postings(sn.table(table), text_col, id_col)
    sn.create_table(
        idx_table, options={"key_columns": f"{id_col},term"}, df=rows
    )
    # cluster postings by term for pruned per-term scans
    sn.sql(f"CREATE INDEX {index_name}__term ON {idx_table} (term)")
    info = {
        "method": "inverted",
        "table": sn._canon(table),
        "column": text_col,
        "id_col": id_col,
        "index_table": idx_table,
    }
    sn._ann_indexes[index_name.lower()] = info
    _store_corpus_stats(sn, info)
    sn._save_registry()
    return info


def _store_corpus_stats(sn, info: dict) -> None:
    """Compute and persist the BM25 corpus stats (N, avgdl) into the
    index registry so SERVING never re-aggregates the whole postings
    table — query cost stays O(query-term df) regardless of corpus size
    (the r6 sf1 rehearsal showed the per-serve stats aggregate dragging
    the serve slope to ~2x for 10x data).  Recomputed on every
    maintenance pass, so the stored values always equal what a
    from-scratch aggregate would produce (avgdl rounded 9, the scoring
    discipline's literal form)."""
    row = (
        sn.table(info["index_table"])
        .select(info["id_col"], "dl")
        .groupBy(info["id_col"])
        .agg(F.min("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dl"), 9).alias("avgdl"),
        )
        .collect()[0]
    )
    info["n_docs"] = int(row.n_docs)
    info["avgdl"] = float(row.avgdl) if row.avgdl is not None else 0.0


def bm25_topk(
    sn,
    index_name: str,
    terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 over the stored postings for `terms` — zero tokenization,
    postings scan bounded by the query terms' document frequency.
    Rows hidden from the base by RLS/grants never surface (visibility
    semi-join, skipped when nothing can filter)."""
    info = sn._ann_indexes[index_name.lower()]
    id_col = info["id_col"]
    post = sn.table(info["index_table"])
    filtered = sn._read_is_filtered(info["table"])
    if filtered:
        post = post.join(
            sn.table(info["table"]).select(id_col), id_col, "left_semi"
        )
    if not filtered and "n_docs" in info:
        # stored corpus stats (maintained through mutations): serving
        # never re-aggregates the postings table.  Under RLS/grants the
        # visible corpus differs per user, so stats compute per query.
        return bm25_from_postings(
            post, id_col, terms, k=k, k1=k1, b=b,
            n_docs=info["n_docs"], avgdl=info["avgdl"],
        )
    return bm25_from_postings(post, id_col, terms, k=k, k1=k1, b=b)


def bm25_from_postings(
    post: DataFrame,
    id_col: str,
    terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """BM25 scoring over a postings frame (<id>, term, tf, dl) — shared
    by the stored-index serve path (bm25_topk) and resolve_index's
    no-index fallback (postings derived inline from the base table), so
    both paths score identically.  Pass n_docs/avgdl to skip the corpus
    stats aggregate (the stored-stats serve path).

    Query terms dedupe to first occurrence: each distinct term
    contributes once (the qtf=1 BM25 variant) — and the pivot below
    would otherwise create duplicate columns and fail on a repeated
    term."""
    terms = list(dict.fromkeys(terms))
    if n_docs is None or avgdl is None:
        # corpus stats from the postings: N = distinct docs, avgdl = mean
        # dl over one row per doc (model-sized collect, rounded like the
        # composed query)
        stats = (
            post.select(id_col, "dl")
            .groupBy(id_col)
            .agg(F.min("dl").alias("dl"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.round(F.avg("dl"), 9).alias("avgdl"),
            )
            .collect()[0]
        )
        n_docs, avgdl = stats.n_docs, stats.avgdl
    hits = post.filter(F.col("term").isin(*terms))
    df_ = hits.groupBy("term").agg(F.count_distinct(id_col).alias("df"))
    idf = df_.select(
        "term",
        F.round(
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
            9,
        ).alias("idf"),
    )
    partial = hits.join(F.broadcast(idf), "term").select(
        id_col,
        "term",
        F.round(
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
            ),
            9,
        ).alias("s"),
    )
    pv = partial.groupBy(id_col).pivot("term", list(terms)).sum("s")
    score = None
    for t in terms:  # fixed-order addition (txt_bm25_topk discipline)
        term_s = F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
        score = term_s if score is None else score + term_s
    return (
        pv.select(id_col, F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


def bm25_topk_batch(
    sn,
    index_name: str,
    queries: DataFrame,
    qid_col: str = "qid",
    terms_col: str = "terms",
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BATCH BM25 from the stored postings: a query TABLE of
    (qid, array<string> terms) rows, each retrieving its own top-k in
    ONE distributed plan — the production many-queries shape (offline
    relevance eval, query-log replay, RAG batch retrieval), the lexical
    twin of index_ann.search_ivf_sq8_batch.

    Plan shape, scale-first: the query set explodes to distinct
    (qid, term) pairs; ONE postings scan covers the union of all query
    vocabularies (pushed as a literal IN when the vocabulary is small
    enough to prune files; the per-term df/idf computes once per term,
    shared across queries); per-(qid, doc) scores fold in TERM-SORTED
    sequential order (the cross-engine float discipline — an unordered
    SUM aggregate would drift in the last ulp); the final cut is a
    window PARTITIONED BY qid, parallel across queries.

    Per query, repeated terms dedupe to one occurrence (the qtf=1 BM25
    variant, same as bm25_topk).  Output: (qid, <id>, bm25), k rows per
    query.  RLS/grant-hidden base rows never surface."""
    info = sn._ann_indexes[index_name.lower()]
    id_col = info["id_col"]
    post = sn.table(info["index_table"])
    filtered = sn._read_is_filtered(info["table"])
    if filtered:
        post = post.join(
            sn.table(info["table"]).select(id_col), id_col, "left_semi"
        )
    if not filtered and "n_docs" in info:
        n_docs, avgdl = info["n_docs"], info["avgdl"]
    else:
        stats = (
            post.select(id_col, "dl")
            .groupBy(id_col)
            .agg(F.min("dl").alias("dl"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.round(F.avg("dl"), 9).alias("avgdl"),
            )
            .collect()[0]
        )
        n_docs, avgdl = stats.n_docs, stats.avgdl
    # r12 (guide §1.2/§5): ONE bounded collect of the exploded query
    # terms replaces persist + vocabulary-collect + join-side reads (the
    # former path ran a persist-materialization job AND a distinct
    # collect job before the scoring plan even started).  The (qid,
    # term) set is bounded by the query batch, not the corpus; when it
    # is small it re-enters as a LOCAL relation (broadcast join side
    # with no job) and the union vocabulary pushes as a literal IN so
    # the term-clustered file layout prunes the postings scan.  At huge
    # Q (> cap) the distributed join path carries instead, unchanged.
    qterms = queries.select(
        F.col(qid_col), F.explode(terms_col).alias("term")
    ).distinct()
    qt_rows = qterms.limit(4097).collect()
    if len(qt_rows) <= 4096:
        spark = queries.sparkSession
        qterms = spark.createDataFrame(
            qt_rows, schema=qterms.schema
        )
        vocab = sorted({r.term for r in qt_rows})
    else:
        qterms = qterms.persist()
        vocab = [
            r.term
            for r in qterms.select("term").distinct().limit(257).collect()
        ]
    if len(vocab) <= 256:
        hits = post.filter(F.col("term").isin(vocab))
    else:
        hits = post.join(F.broadcast(qterms.select("term").distinct()), "term")
    # df/idf are per-TERM corpus facts — computed once, shared by every
    # query that mentions the term
    df_ = hits.groupBy("term").agg(F.count_distinct(id_col).alias("df"))
    idf = df_.select(
        "term",
        F.round(
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
            9,
        ).alias("idf"),
    )
    partial = hits.join(F.broadcast(idf), "term").select(
        id_col,
        "term",
        F.round(
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
            ),
            9,
        ).alias("s"),
    )
    per_query = partial.join(F.broadcast(qterms), "term")
    # term-sorted sequential fold: array_sort on struct(term, s) orders
    # by term, F.aggregate folds left-to-right — both engines add the
    # same rounded doubles in the same order (the _cos_sql discipline)
    scored = (
        per_query.groupBy(qid_col, id_col)
        .agg(F.collect_list(F.struct("term", "s")).alias("__ts"))
        .select(
            qid_col,
            id_col,
            F.round(
                F.aggregate(
                    F.transform(F.array_sort("__ts"), lambda x: x.s),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("bm25"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(qid_col).orderBy(F.desc("bm25"), id_col)
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def refresh_inverted(
    sn,
    index_name: str,
    source: DataFrame | None = None,
    delete_only: bool = False,
) -> None:
    """Maintain postings after a base mutation: touched docs
    re-tokenize; a touched doc's STALE postings (terms it no longer
    contains) delete by (id, term) key before the fresh ones PUT;
    postings of departed docs prune.  Per-doc work only when `source`
    names the mutated rows."""
    info = sn._ann_indexes[index_name.lower()]
    id_col = info["id_col"]
    base = sn.table(info["table"])
    idx = info["index_table"]
    if not delete_only:
        rows_src = base if source is None else base.join(
            source.select(id_col).distinct(), id_col, "left_semi"
        )
        fresh = _postings(rows_src, info["column"], id_col)
        touched_ids = rows_src.select(id_col).distinct()
        stale_terms = (
            sn.table(idx)
            .join(touched_ids, id_col, "left_semi")
            .select(id_col, "term")
            .join(fresh.select(id_col, "term"), [id_col, "term"], "left_anti")
        )
        if not stale_terms.isEmpty():
            sn.delete_from(idx, stale_terms)
        if not fresh.isEmpty():
            sn.put(idx, fresh)
    departed = sn.table(idx).select(id_col, "term").join(
        base.select(id_col), id_col, "left_anti"
    )
    if not departed.isEmpty():
        sn.delete_from(idx, departed)
    # stored corpus stats must track every mutation (bm25_topk serves
    # from them without re-aggregating the postings)
    _store_corpus_stats(sn, info)
    sn._save_registry()

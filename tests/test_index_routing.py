"""Automatic index routing (resolve_index.py — the ResolveIndex analogue,
SnappyOptimizations.scala:110-250): plain top-k SQL serves from the
materialized ivf_sq8 / inverted index tables, with plan-provenance
assertions, opt-outs, and exact-path parity."""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def ann_session(snappy, spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    snappy.create_table("emb_base", options={"key_columns": "vec_id"}, df=emb)
    snappy.sql("CREATE INDEX emb_ivf ON emb_base(embedding) USING ivf_sq8")
    q = [float(x) for x in emb.filter("vec_id = 0").collect()[0].embedding]
    arr = ", ".join(repr(v) for v in q)
    sql = (
        f"SELECT vec_id, ROUND(cosine_sim(embedding, array({arr})), 4) AS cos "
        f"FROM emb_base ORDER BY cosine_sim(embedding, array({arr})) DESC, "
        "vec_id LIMIT 5"
    )
    return snappy, sql


def test_ann_routing_reads_index_table(ann_session):
    sn, sql = ann_session
    routed = sn.sql(sql)
    assert "emb_ivf__ann" in _plan(routed)
    rows = routed.collect()
    assert len(rows) == 5 and rows[0].vec_id == 0 and rows[0].cos == 1.0


def test_ann_routing_matches_exact_scan(ann_session):
    sn, sql = ann_session
    routed = sn.sql(sql).collect()
    # --+ noIndex: the exact full-scan HOF cosine (cosine_sim expansion)
    hinted = sn.sql("--+ noIndex\n" + sql)
    assert "emb_ivf__ann" not in _plan(hinted)
    assert hinted.collect() == routed
    # conf master switch
    sn.set_conf("snappydata.sql.useIndexes", "false")
    try:
        off = sn.sql(sql)
        assert "emb_ivf__ann" not in _plan(off)
        assert off.collect() == routed
    finally:
        sn.set_conf("snappydata.sql.useIndexes", "true")


def test_ann_sq8_rerank_never_touches_base(ann_session):
    sn, sql = ann_session
    sn.set_conf("snappydata.index.ann.rerank", "sq8")
    try:
        served = sn.sql(sql)
        plan = _plan(served)
        assert "emb_ivf__ann" in plan and "emb_base" not in plan
        # approximate scores, but the self-match is still exact
        assert served.collect()[0].vec_id == 0
    finally:
        sn.set_conf("snappydata.index.ann.rerank", "exact")


def test_ann_recall_knob(ann_session):
    sn, sql = ann_session
    exact = {r.vec_id for r in sn.sql("--+ noIndex\n" + sql).collect()}
    sn.set_conf("snappydata.index.ann.cand", "500")
    sn.set_conf("snappydata.index.ann.nprobe", "64")
    try:
        wide = {r.vec_id for r in sn.sql(sql).collect()}
        assert wide == exact  # full-recall configuration reproduces exact
    finally:
        sn.set_conf("snappydata.index.ann.cand", "50")
        sn.set_conf("snappydata.index.ann.nprobe", "4")


def test_ann_unroutable_shapes_fall_through(ann_session):
    sn, sql = ann_session
    # WHERE clause → not the routed shape → exact scan, still correct
    filtered = sn.sql(sql.replace("ORDER BY", "WHERE vec_id > 0 ORDER BY"))
    assert "emb_ivf__ann" not in _plan(filtered)
    assert all(r.vec_id > 0 for r in filtered.collect())
    # column-vs-column cosine (no literal query vector) → exact scan
    pair = sn.sql(
        "SELECT vec_id, ROUND(cosine_sim(embedding, embedding), 4) AS c "
        "FROM emb_base ORDER BY vec_id LIMIT 3"
    )
    assert all(r.c == 1.0 for r in pair.collect())


@pytest.fixture()
def bm25_session(snappy, spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    snappy.create_table("docs_base", options={"key_columns": "doc_id"}, df=docs)
    sql = (
        "SELECT doc_id, bm25_score(text, 'science exploration data') AS s "
        "FROM docs_base ORDER BY "
        "bm25_score(text, 'science exploration data') DESC, doc_id LIMIT 8"
    )
    return snappy, sql


def test_bm25_fallback_then_index_parity(bm25_session):
    sn, sql = bm25_session
    inline = sn.sql(sql).collect()  # no index yet: inline postings
    assert len(inline) == 8
    sn.sql("CREATE INDEX docs_bm25 ON docs_base(text) USING inverted")
    routed = sn.sql(sql)
    plan = _plan(routed)
    assert "docs_bm25__ann" in plan and "docs_base" not in plan
    assert routed.collect() == inline
    hinted = sn.sql("--+ noIndex\n" + sql)
    assert "docs_bm25__ann" not in _plan(hinted)
    assert hinted.collect() == inline


def test_bm25_respects_rls(bm25_session):
    sn, sql = bm25_session
    sn.sql("CREATE INDEX docs_bm25 ON docs_base(text) USING inverted")
    top_ids = [r.doc_id for r in sn.sql(sql).collect()]
    sn.sql(
        "CREATE POLICY hide_top ON docs_base FOR SELECT "
        f"USING (doc_id <> {top_ids[0]})"
    )
    sn.sql("ALTER TABLE docs_base ENABLE ROW LEVEL SECURITY")
    visible = [r.doc_id for r in sn.sql(sql).collect()]
    assert top_ids[0] not in visible


def test_bm25_bad_shape_raises(bm25_session):
    sn, sql = bm25_session
    with pytest.raises(Exception):
        sn.sql(
            "SELECT doc_id, bm25_score(text, 'x') AS s, length(text) AS l "
            "FROM docs_base ORDER BY bm25_score(text, 'x') DESC LIMIT 3"
        )


def test_explain_shows_routed_plan(ann_session):
    """EXPLAIN must surface the plan that would actually run — the index
    serve, not the full scan the SQL text resembles (the reference's
    explain shows ResolveIndex's injected index relations the same way)."""
    sn, sql = ann_session
    plan = sn.sql("EXPLAIN " + sql).collect()[0].plan
    assert "Routed by ResolveIndex" in plan and "emb_ivf__ann" in plan
    # opted-out explain falls through to Spark's own (scan plan)
    off = sn.sql("EXPLAIN --+ noIndex\n" + sql).collect()[0].plan
    assert "emb_ivf__ann" not in off


def test_cosine_sim_macro_matches_dataframe_cosine(spark, sf_dir):
    from snappydata_spark.dialect import expand_scalar_macros
    from snappydata_spark.functions import vector as V

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    emb.createOrReplaceTempView("emb_macro_t")
    via_sql = spark.sql(
        expand_scalar_macros(
            "SELECT vec_id, cosine_sim(embedding, embedding) AS c "
            "FROM emb_macro_t"
        )
    )
    via_df = emb.select(
        "vec_id", V.cosine(F.col("embedding"), F.col("embedding")).alias("c")
    )
    a = {r.vec_id: r.c for r in via_sql.collect()}
    b = {r.vec_id: r.c for r in via_df.collect()}
    assert a == b  # bit-identical expression trees


def test_ann_knob_abuse_never_shrinks_results(ann_session):
    """The recall knobs trade accuracy, never result cardinality: a
    candidate budget below k and nprobe=0 both clamp (k rows come back,
    ranked by whatever recall the clamped budget buys)."""
    sn, sql = ann_session
    sn.set_conf("snappydata.index.ann.cand", "3")
    sn.set_conf("snappydata.index.ann.nprobe", "0")
    try:
        rows = sn.sql(sql).collect()
        assert len(rows) == 5
        assert rows[0].vec_id == 0 and rows[0].cos == 1.0
    finally:
        sn.set_conf("snappydata.index.ann.cand", "50")
        sn.set_conf("snappydata.index.ann.nprobe", "4")


def test_bm25_duplicate_query_terms(snappy, spark, sf_dir):
    """A repeated query term dedupes to one contribution (qtf=1 BM25) on
    BOTH serve paths — previously the postings pivot raised
    AMBIGUOUS_REFERENCE on the duplicate column."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    snappy.create_table("d_dupterm", options={"key_columns": "doc_id"}, df=docs)
    snappy.sql("CREATE INDEX d_dupterm_i ON d_dupterm(text) USING inverted")
    dup = (
        "SELECT doc_id, bm25_score(text, 'data data') AS s FROM d_dupterm "
        "ORDER BY bm25_score(text, 'data data') DESC, doc_id LIMIT 5"
    )
    single = dup.replace("'data data'", "'data'")
    routed_dup = [(r.doc_id, r.s) for r in snappy.sql(dup).collect()]
    routed_single = [(r.doc_id, r.s) for r in snappy.sql(single).collect()]
    assert routed_dup == routed_single
    snappy.set_conf("snappydata.sql.useIndexes", "false")
    try:
        inline_dup = [(r.doc_id, r.s) for r in snappy.sql(dup).collect()]
    finally:
        snappy.set_conf("snappydata.sql.useIndexes", "true")
    assert inline_dup == routed_dup


# ------------------------------------------------- --+ index() force hints
# (Literals.scala:433 QueryHint.Index; applyIndexHint/ResolveIndex
# SnappyOptimizations.scala:110-250)


def test_force_hint_overrides_conf_off(ann_session):
    sn, sql = ann_session
    sn.set_conf("snappydata.sql.useIndexes", "false")
    try:
        off = sn.sql(sql)
        assert "emb_ivf__ann" not in _plan(off)
        forced = sn.sql("--+ index(emb_base, emb_ivf)\n" + sql)
        assert "emb_ivf__ann" in _plan(forced)
        assert forced.collect() == off.collect()  # same rows, routed plan
    finally:
        sn.set_conf("snappydata.sql.useIndexes", "true")


def test_force_hint_withindex_spelling(ann_session):
    sn, sql = ann_session
    forced = sn.sql("--+ withIndex(emb_base, emb_ivf)\n" + sql)
    assert "emb_ivf__ann" in _plan(forced)


def test_force_hint_unknown_index_errors(ann_session):
    sn, sql = ann_session
    with pytest.raises(ValueError, match="unknown index"):
        sn.sql("--+ index(emb_base, no_such_idx)\n" + sql)


def test_force_hint_wrong_table_errors(ann_session):
    sn, sql = ann_session
    with pytest.raises(ValueError, match="is on"):
        sn.sql("--+ index(other_table, emb_ivf)\n" + sql)


def test_force_hint_unroutable_shape_errors(ann_session):
    sn, _ = ann_session
    with pytest.raises(ValueError, match="no routable|cannot be served"):
        sn.sql("--+ index(emb_base, emb_ivf)\nSELECT COUNT(*) FROM emb_base")


def test_force_hint_conflicts_with_noindex(ann_session):
    sn, sql = ann_session
    with pytest.raises(ValueError, match="conflict"):
        sn.sql("--+ index(emb_base, emb_ivf) --+ noIndex\n" + sql)


def test_force_hint_selects_named_index_among_several(snappy, spark, sf_dir):
    """Two ivf_sq8 indexes on the same (table, column): auto-routing
    picks one, the hint forces the OTHER by name."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    snappy.create_table("emb2_base", options={"key_columns": "vec_id"}, df=emb)
    snappy.sql("CREATE INDEX emb2_a ON emb2_base(embedding) USING ivf_sq8")
    snappy.sql("CREATE INDEX emb2_b ON emb2_base(embedding) USING ivf_sq8")
    q = [float(x) for x in emb.filter("vec_id = 0").collect()[0].embedding]
    arr = ", ".join(repr(v) for v in q)
    sql = (
        f"SELECT vec_id FROM emb2_base ORDER BY "
        f"cosine_sim(embedding, array({arr})) DESC, vec_id LIMIT 3"
    )
    forced_b = sn_sql = snappy.sql("--+ index(emb2_base, emb2_b)\n" + sql)
    assert "emb2_b__ann" in _plan(forced_b)
    forced_a = snappy.sql("--+ index(emb2_base, emb2_a)\n" + sql)
    assert "emb2_a__ann" in _plan(forced_a)
    assert forced_a.collect() == forced_b.collect()


def test_routing_through_synonym_and_view(ann_session):
    """FROM a synonym of the indexed table, or a trivial SELECT * view,
    routes like the table itself (ResolveIndex runs after view
    expansion); a non-trivial view (projection/filter) falls through."""
    sn, sql = ann_session
    sn.sql("CREATE SYNONYM emb_syn FOR emb_base")
    routed = sn.sql(sql.replace("FROM emb_base", "FROM emb_syn"))
    assert "emb_ivf__ann" in _plan(routed)
    assert routed.collect() == sn.sql(sql).collect()
    sn.sql("CREATE VIEW emb_view AS SELECT * FROM emb_base")
    routed_v = sn.sql(sql.replace("FROM emb_base", "FROM emb_view"))
    assert "emb_ivf__ann" in _plan(routed_v)
    # filtered view: result semantics differ -> must NOT route
    sn.sql("CREATE VIEW emb_half AS SELECT * FROM emb_base WHERE vec_id > 10")
    scan = sn.sql(sql.replace("FROM emb_base", "FROM emb_half"))
    assert "emb_ivf__ann" not in _plan(scan)


# -------------------------------------------- threshold + batch routed shapes


def test_threshold_form_routes_and_matches_exact(ann_session):
    """WHERE cosine_sim(col, vec) > tau (no LIMIT) serves from the index
    via residual-radius cell pruning; the result set is EXACTLY the full
    scan's (the final filter is the exact cosine)."""
    sn, sql = ann_session
    # rebuild the threshold text from the fixture's array literal
    arr = sql.split("array(")[1].split(")")[0]
    tsql = (
        f"SELECT vec_id, ROUND(cosine_sim(embedding, array({arr})), 4) AS cos "
        f"FROM emb_base WHERE cosine_sim(embedding, array({arr})) > 0.2"
    )
    routed = sn.sql(tsql)
    assert "emb_ivf__ann" in _plan(routed)
    exact = sn.sql("--+ noIndex\n" + tsql)
    assert "emb_ivf__ann" not in _plan(exact)
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_threshold_radius_pruning_fires_and_stays_exact(snappy, spark):
    """Tightly clustered vectors -> small cell radii -> a high threshold
    prunes far cells (the scan reads fewer index rows), while the result
    still equals the exact filter; after PUT of an outlier the radius
    grows and the new row is still found."""
    import math
    import random

    random.seed(7)

    def jitter(base, eps):
        v = [b + random.uniform(-eps, eps) for b in base]
        return v

    a = [1.0] + [0.0] * 7
    b = [0.0] * 7 + [1.0]
    rows = [(i, jitter(a, 0.01)) for i in range(40)] + [
        (100 + i, jitter(b, 0.01)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    snappy.create_table("cl_base", options={"key_columns": "vec_id"}, df=df)
    snappy.sql("CREATE INDEX cl_ivf ON cl_base(embedding) USING ivf_sq8")
    info = snappy._ann_indexes["cl_ivf"]
    assert max(info["cell_radius"]) < 0.5  # tight clusters -> small radii
    arr = ", ".join(repr(float(x)) for x in a)
    tsql = (
        f"SELECT vec_id, ROUND(cosine_sim(embedding, array({arr})), 4) AS cos "
        f"FROM cl_base WHERE cosine_sim(embedding, array({arr})) > 0.9"
    )
    routed = sorted(r.vec_id for r in snappy.sql(tsql).collect())
    exact = sorted(
        r.vec_id for r in snappy.sql("--+ noIndex\n" + tsql).collect()
    )
    assert routed == exact and len(routed) == 40
    # pruning evidence: kept cells cover only the a-cluster
    from snappydata_spark import index_ann

    _, frame = index_ann.threshold_scan_ivf(snappy, "cl_ivf", a, 0.9)
    assert frame.count() == 40
    # an outlier PUT near cluster a but at a wide angle must RAISE the
    # radius and still be retrieved when it qualifies
    mid = [x / math.sqrt(2.0) for x in
           [a[i] + b[i] for i in range(8)]]
    snappy.put("cl_base", spark.createDataFrame(
        [(999, mid)], "vec_id long, embedding array<double>"))
    tsql_lo = tsql.replace("> 0.9", "> 0.6")
    routed2 = sorted(r.vec_id for r in snappy.sql(tsql_lo).collect())
    exact2 = sorted(
        r.vec_id for r in snappy.sql("--+ noIndex\n" + tsql_lo).collect()
    )
    assert routed2 == exact2 and 999 in routed2


def test_force_hint_wrong_relation_batch_and_threshold(ann_session, spark):
    """A --+ index(T2, idx2) hint whose index does NOT cover the query's
    FROM relation must error on the BATCH and THRESHOLD shapes exactly
    like the single top-k _apply_force path — not silently serve T2's
    rows into a query scanning T1."""
    sn, sql = ann_session
    # a second indexed table the hint will (wrongly) point at
    emb = sn.table("emb_base")
    sn.create_table("emb_other", options={"key_columns": "vec_id"}, df=emb)
    sn.sql("CREATE INDEX other_ivf ON emb_other(embedding) USING ivf_sq8")
    arr = sql.split("array(")[1].split(")")[0]
    tsql = (
        f"SELECT vec_id, ROUND(cosine_sim(embedding, array({arr})), 4) AS cos "
        f"FROM emb_base WHERE cosine_sim(embedding, array({arr})) > 0.2"
    )
    with pytest.raises(ValueError, match="FROM relation"):
        sn.sql("--+ index(emb_other, other_ivf)\n" + tsql)
    qdf = emb.filter("vec_id < 2").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    sn.create_table("annq_f", options={"key_columns": "qid"}, df=qdf)
    bsql = """SELECT qid, vec_id, cos FROM (
  SELECT q.qid AS qid, t.vec_id, ROUND(cosine_sim(t.embedding, q.qe), 4) AS cos,
         ROW_NUMBER() OVER (PARTITION BY q.qid
                            ORDER BY cosine_sim(t.embedding, q.qe) DESC,
                                     t.vec_id) AS rn
  FROM annq_f q CROSS JOIN emb_base t) WHERE rn <= 3"""
    with pytest.raises(ValueError, match="FROM relation"):
        sn.sql("--+ index(emb_other, other_ivf)\n" + bsql)
    # the correctly-targeted force hint still routes both shapes
    assert "emb_ivf__ann" in _plan(
        sn.sql("--+ index(emb_base, emb_ivf)\n" + tsql)
    )
    assert "emb_ivf__ann" in _plan(
        sn.sql("--+ index(emb_base, emb_ivf)\n" + bsql)
    )


def test_batch_window_form_routes_to_batch_serve(ann_session, spark):
    """The per-query top-k window idiom over a query table lands on
    search_ivf_sq8_batch — one plan, no cross-join of the base."""
    sn, _ = ann_session
    emb = sn.table("emb_base")
    qdf = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    sn.create_table("annq_t", options={"key_columns": "qid"}, df=qdf)
    bsql = """SELECT qid, vec_id, cos FROM (
  SELECT q.qid AS qid, t.vec_id, ROUND(cosine_sim(t.embedding, q.qe), 4) AS cos,
         ROW_NUMBER() OVER (PARTITION BY q.qid
                            ORDER BY cosine_sim(t.embedding, q.qe) DESC,
                                     t.vec_id) AS rn
  FROM annq_t q CROSS JOIN emb_base t) WHERE rn <= 4"""
    routed = sn.sql(bsql)
    plan = _plan(routed)
    assert "emb_ivf__ann" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    rows = routed.collect()
    assert sorted({r.qid for r in rows}) == [0, 1, 2]
    assert all(len([r for r in rows if r.qid == q]) == 4 for q in (0, 1, 2))
    # each query's self-match ranks first at cos 1.0
    for q in (0, 1, 2):
        best = max((r for r in rows if r.qid == q), key=lambda r: r.cos)
        assert best.vec_id == q and best.cos == 1.0

"""Automatic index routing — the ResolveIndex analogue.

The reference rewrites logical plans to read index relations whenever a
query's shape matches a registered index (ResolveIndex,
SnappyOptimizations.scala:110-250; RuleUtils.scala:623 picks the best
matching IndexColumnFormatRelation).  This module does the same for the
materialized retrieval indexes over the SnappySession SQL path: a plain
top-k SQL query whose score function matches an index's column is
rewritten to serve from the index tables instead of scanning the base
table.

Recognized shapes (whitespace/case tolerant; anything that does not
match simply falls through to the full scan, which stays correct):

    SELECT <id> [, [ROUND(] cosine_sim(<col>, array(<floats>)) [, d)] AS a]
    FROM <table>
    ORDER BY cosine_sim(<col>, array(<floats>)) DESC [, <id>] LIMIT <k>

        → ivf_sq8 index serve (index_ann.search_ivf_sq8): probe the
          stored centroids, scan only the probed cells' stored int8
          codes, exact-rerank the survivors.  Unrouted, cosine_sim
          expands to the exact HOF cosine (dialect.expand_scalar_macros)
          and the query full-scans — same rows when recall is complete.

    SELECT <id> [, [ROUND(] bm25_score(<col>, '<query>') [, 6)] AS a]
    FROM <table>
    ORDER BY bm25_score(<col>, '<query>') DESC [, <id>] LIMIT <k>

        → inverted index serve (index_inverted.bm25_topk): read only the
          query terms' stored postings.  bm25_score depends on corpus
          stats so it has no scalar expansion; without an index the SAME
          scoring runs over postings derived inline from the base table
          (one tokenization pass — the slow path).

Knobs (SET via SnappySession.set_conf, all snappydata.*-registry confs):

    snappydata.sql.useIndexes      true|false  master switch (default true)
    snappydata.index.ann.nprobe    int         cells probed (default 4)
    snappydata.index.ann.cand      int         rerank candidates (default
                                               max(50, 5k)) — the recall
                                               knob: more candidates, higher
                                               recall, more rerank work
    snappydata.index.ann.rerank    exact|sq8   'sq8' ranks by the dequantized
                                               int8 score and never touches
                                               the base table (index-only
                                               plan; scores are approximate)

Per-query opt-out: the `--+ noIndex` comment hint (the inverse of the
reference's `--+ index()` force-hint, Literals.scala:405-511).

Scale: routing turns an O(corpus) scan + sort into an O(nprobe/k_cells)
pruned code scan (ANN) or an O(query-term df) postings scan (BM25) — the
build-once/query-many contract of CREATE INDEX.  Routed plans bypass the
plan cache (they are assembled DataFrames, not SQL text).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from snappydata_spark.dialect import _split_top_commas

_TOPK = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+(?P<table>[A-Za-z_][\w.]*)\s+"
    r"ORDER\s+BY\s+(?P<score>.+?)\s+DESC\s*(?:,\s*(?P<tie>[A-Za-z_]\w*))?"
    r"\s+LIMIT\s+(?P<k>\d+)\s*;?\s*$",
    re.I | re.S,
)
_CALL = re.compile(
    r"^(?P<round>ROUND\s*\(\s*)?(?P<fn>cosine_sim|bm25_score)\s*\("
    r"(?P<args>(?:[^()]|\([^()]*\))*)\)(?(round)\s*,\s*(?P<digits>\d+)\s*\))$",
    re.I | re.S,
)
_NOINDEX = re.compile(r"--\+\s*noindex(?:\s*\(\s*\))?", re.I)
# --+ index(table, indexName) / --+ withIndex(table, indexName) — the
# reference's FORCE hint (Literals.scala:433 QueryHint.Index;
# applyIndexHint in SnappyOptimizations): route through the NAMED index
# even when snappydata.sql.useIndexes=false, and error on an unknown or
# inapplicable index name instead of silently scanning.
_FORCEINDEX = re.compile(
    r"--\+\s*(?:with)?index\s*\(\s*([\w.]+)\s*,\s*([\w.]+)\s*\)", re.I
)
_IDENT = re.compile(r"^[A-Za-z_]\w*$")


def _norm(s: str) -> str:
    return re.sub(r"\s+", "", s).lower()


def _parse_score_select(select: str, sc: re.Match):
    """Shared select-list parser for the routed shapes: `<id>[, <score
    call> AS alias]` where the projected call must be the scoring
    function (modulo ROUND).  Returns (id, alias, round_digits) or
    None."""
    items = [s.strip() for s in _split_top_commas(select)]
    if not items or not _IDENT.match(items[0]) or len(items) > 2:
        return None
    alias = round_digits = None
    if len(items) == 2:
        am = re.match(
            r"^(?P<call>.+?)\s+AS\s+(?P<alias>[A-Za-z_]\w*)$",
            items[1],
            re.I | re.S,
        )
        if not am:
            return None
        cm = _CALL.match(am.group("call").strip())
        if (
            not cm
            or cm.group("fn").lower() != sc.group("fn").lower()
            or _norm(cm.group("args")) != _norm(sc.group("args"))
        ):
            return None
        alias = am.group("alias")
        round_digits = int(cm.group("digits")) if cm.group("digits") else None
    return items[0], alias, round_digits


def _parse_shape(text: str):
    """Parse the routed top-k shape; None when the text doesn't match."""
    m = _TOPK.match(text)
    if not m:
        return None
    sc = _CALL.match(m.group("score").strip())
    if not sc or sc.group("round"):
        return None  # ORDER BY must use the bare score function
    parsed = _parse_score_select(m.group("select"), sc)
    if parsed is None:
        return None
    ident, alias, round_digits = parsed
    tie = m.group("tie")
    if tie is not None and tie.lower() != ident.lower():
        return None  # only the id column is a valid tie-break
    return {
        "id": ident,
        "alias": alias,
        "round": round_digits,
        "table": m.group("table"),
        "fn": sc.group("fn").lower(),
        "args": _split_top_commas(sc.group("args")),
        "k": int(m.group("k")),
    }


_THRESH = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+(?P<table>[A-Za-z_][\w.]*)\s+"
    r"WHERE\s+(?P<score>.+?)\s*>\s*(?P<tau>-?\d+(?:\.\d+)?)\s*;?\s*$",
    re.I | re.S,
)


def _parse_threshold_shape(text: str):
    """`SELECT <id>[, score AS a] FROM t WHERE cosine_sim(col, array(..))
    > tau` (no LIMIT) — the similarity-threshold retrieval form."""
    m = _THRESH.match(text)
    if not m:
        return None
    sc = _CALL.match(m.group("score").strip())
    if not sc or sc.group("round") or sc.group("fn").lower() != "cosine_sim":
        return None
    parsed = _parse_score_select(m.group("select"), sc)
    if parsed is None:
        return None
    ident, alias, round_digits = parsed
    return {
        "id": ident,
        "alias": alias,
        "round": round_digits,
        "table": m.group("table"),
        "fn": "cosine_sim",
        "args": _split_top_commas(sc.group("args")),
        "tau": float(m.group("tau")),
    }


def _resolve_relation(sn, table: str) -> str:
    """Resolve the FROM relation through synonyms and trivial views to
    the underlying indexed table (the reference routes through both:
    create-synonym.md usable-everywhere + ResolveIndex running after
    view expansion).  A view counts as trivial when its body is exactly
    `SELECT * FROM <t>` — anything else (projection, filter) changes
    result semantics and falls through to the scan path."""
    cn = sn._canon(table)
    seen = set()
    while cn not in seen:
        seen.add(cn)
        if cn in sn._synonyms:
            cn = sn._resolve_synonym(cn)
            continue
        vsql = sn._views.get(cn)
        if vsql:
            vm = re.match(
                r"^\s*SELECT\s+\*\s+FROM\s+([A-Za-z_][\w.]*)\s*;?\s*$",
                vsql,
                re.I,
            )
            if vm:
                cn = sn._canon(vm.group(1))
                continue
        break
    return cn


_BATCH_OUTER = re.compile(
    r"^\s*SELECT\s+(?P<osel>[\w\s,.]+?)\s+FROM\s*\(\s*SELECT\s+(?P<isel>.+?)\s+"
    r"FROM\s+(?P<qt>[A-Za-z_][\w.]*)\s+(?P<qa>[A-Za-z_]\w*)\s*"
    r"(?:,|CROSS\s+JOIN)\s*(?P<t>[A-Za-z_][\w.]*)\s+(?P<ta>[A-Za-z_]\w*)\s*\)"
    r"\s*(?:AS\s+)?(?:[A-Za-z_]\w*)?\s*WHERE\s+(?P<rn>[A-Za-z_]\w*)\s*<=\s*"
    r"(?P<k>\d+)\s*;?\s*$",
    re.I | re.S,
)
_ROWNUM = re.compile(
    r"^ROW_NUMBER\s*\(\s*\)\s+OVER\s*\(\s*PARTITION\s+BY\s+"
    r"(?P<part>[\w.]+)\s+ORDER\s+BY\s+(?P<score>.+?)\s+DESC\s*,\s*"
    r"(?P<tie>[\w.]+)\s*\)\s+AS\s+(?P<alias>[A-Za-z_]\w*)$",
    re.I | re.S,
)
_AS_ITEM = re.compile(
    r"^(?P<expr>.+?)(?:\s+AS\s+(?P<alias>[A-Za-z_]\w*))?$", re.I | re.S
)


def _parse_batch_shape(text: str):
    """The routed BATCH retrieval form — per-query top-k over a query
    TABLE stated as the standard window idiom:

        SELECT <qa>, <id>[, <sa>] FROM (
          SELECT q.<qid> AS <qa>, t.<id>,
                 [ROUND(]fn(t.<col>, q.<qcol>)[, d)] AS <sa>,
                 ROW_NUMBER() OVER (PARTITION BY q.<qid>
                                    ORDER BY fn(t.<col>, q.<qcol>) DESC,
                                             t.<id>) AS <rn>
          FROM <qtable> q CROSS JOIN <table> t) WHERE <rn> <= <k>

    fn is cosine_sim or bm25_score with the query-side argument a COLUMN
    of the query table (vs the literal of the single-query shapes).
    Returns the parsed dict or None."""
    m = _BATCH_OUTER.match(text)
    if not m:
        return None
    qa_t, ta_t = m.group("qa").lower(), m.group("ta").lower()
    items = [s.strip() for s in _split_top_commas(m.group("isel"))]
    if len(items) not in (3, 4):
        return None
    rn = _ROWNUM.match(items[-1])
    if not rn or rn.group("alias").lower() != m.group("rn").lower():
        return None
    sc = _CALL.match(rn.group("score").strip())
    if not sc or sc.group("round"):
        return None
    args = [a.strip() for a in _split_top_commas(sc.group("args"))]
    if len(args) != 2:
        return None

    def _split_qual(expr: str, owner: str):
        em = re.match(rf"^{owner}\.([A-Za-z_]\w*)$", expr.strip(), re.I)
        return em.group(1) if em else None

    col = _split_qual(args[0], ta_t)
    qcol = _split_qual(args[1], qa_t)
    if not col or not qcol:
        return None
    # item 1: q.<qid> [AS alias]
    i1 = _AS_ITEM.match(items[0])
    qid = _split_qual(i1.group("expr"), qa_t)
    if not qid:
        return None
    qalias = i1.group("alias") or qid
    # partition key must be the projected qid
    if _split_qual(rn.group("part"), qa_t) != qid:
        return None
    # item 2: t.<id> [AS alias]; the window tie-break must be this id
    i2 = _AS_ITEM.match(items[1])
    tid = _split_qual(i2.group("expr"), ta_t)
    if not tid or _split_qual(rn.group("tie"), ta_t) != tid:
        return None
    id_alias = i2.group("alias") or tid
    salias = round_digits = None
    if len(items) == 4:
        i3 = _AS_ITEM.match(items[2])
        if not i3.group("alias"):
            return None
        cm = _CALL.match(i3.group("expr").strip())
        if (
            not cm
            or cm.group("fn").lower() != sc.group("fn").lower()
            or _norm(cm.group("args")) != _norm(sc.group("args"))
        ):
            return None
        salias = i3.group("alias")
        round_digits = int(cm.group("digits")) if cm.group("digits") else None
    osel = [s.strip().lower() for s in _split_top_commas(m.group("osel"))]
    want = [qalias.lower(), id_alias.lower()] + (
        [salias.lower()] if salias else []
    )
    if osel != want:
        return None
    return {
        "fn": sc.group("fn").lower(),
        "qtable": m.group("qt"),
        "table": m.group("t"),
        "qid": qid,
        "qalias": qalias,
        "id": tid,
        "id_alias": id_alias,
        "col": col,
        "qcol": qcol,
        "salias": salias,
        "round": round_digits,
        "k": int(m.group("k")),
    }


def _find_index(sn, table: str, col: str, method: str):
    cn = _resolve_relation(sn, table)
    for name, info in sn._ann_indexes.items():
        if (
            info.get("method") == method
            and info["table"] == cn
            and info["column"].lower() == col.lower()
        ):
            return name, info
    return None, None


def _routing_enabled(sn, hinted: bool) -> bool:
    if hinted:
        return False
    return str(sn.get_conf("snappydata.sql.useindexes", "true")).lower() != "false"


def _parse_array_literal(expr: str) -> list[float] | None:
    m = re.match(r"^array\s*\((?P<vals>.*)\)$", expr.strip(), re.I | re.S)
    if not m:
        return None
    try:
        return [float(v) for v in _split_top_commas(m.group("vals"))]
    except ValueError:
        return None


def _route_batch(sn, bs: dict, hinted: bool, forced_name: str | None):
    """Serve the parsed batch shape from the batch index paths — ONE
    distributed plan per query table (search_ivf_sq8_batch /
    bm25_topk_batch) instead of a per-query loop or the cross-join +
    window full scan.  Returns None to fall through (no matching index
    or routing off): cosine then runs as the expanded exact cross-join;
    bm25 has no scalar form and raises in try_route's tail."""
    method = "ivf_sq8" if bs["fn"] == "cosine_sim" else "inverted"
    name, info = _find_index(sn, bs["table"], bs["col"], method)
    if forced_name:
        fi = sn._ann_indexes[forced_name]
        if fi.get("method") != method:
            raise ValueError(
                f"index '{forced_name}' is a {fi.get('method')} index — "
                f"this batch query needs {method}"
            )
        if fi["column"].lower() != bs["col"].lower():
            raise ValueError(
                f"index '{forced_name}' covers column {fi['column']}, "
                "not the scored column"
            )
        # the forced index must serve the query's FROM relation — the
        # hint's own (table, index) pairing was validated in try_route,
        # but forcing idx-on-T2 into a query scanning T1 would silently
        # serve T2's rows
        if fi["table"] != _resolve_relation(sn, bs["table"]):
            raise ValueError(
                f"index '{forced_name}' is on {fi['table']}, not "
                f"{_resolve_relation(sn, bs['table'])} — the hinted index "
                "must cover the query's FROM relation"
            )
        name, info = forced_name, fi
    enabled = _routing_enabled(sn, hinted) or forced_name is not None
    if not enabled or name is None:
        return None
    if bs["id"].lower() != info["id_col"].lower():
        if forced_name:
            raise ValueError(
                f"--+ index({forced_name}): the projected id column must "
                f"be the index key {info['id_col']}"
            )
        return None
    queries = sn.table(bs["qtable"])
    k = bs["k"]
    if bs["fn"] == "cosine_sim":
        from snappydata_spark import index_ann

        nprobe = int(sn.get_conf("snappydata.index.ann.nprobe", 4))
        cand = int(sn.get_conf("snappydata.index.ann.cand", max(50, 5 * k)))
        res = index_ann.search_ivf_sq8_batch(
            sn,
            name,
            queries.select(bs["qid"], bs["qcol"]),
            qid_col=bs["qid"],
            qvec_col=bs["qcol"],
            topk=k,
            cand=cand,
            nprobe=nprobe,
        )
        score_col = "cos"
    else:
        from snappydata_spark import index_inverted

        terms = F.split(F.trim(F.col(bs["qcol"])), r"\s+")
        res = index_inverted.bm25_topk_batch(
            sn,
            name,
            queries.select(bs["qid"], terms.alias("__terms")),
            qid_col=bs["qid"],
            terms_col="__terms",
            k=k,
        )
        score_col = "bm25"
    out = [
        F.col(bs["qid"]).alias(bs["qalias"]),
        F.col(info["id_col"]).alias(bs["id_alias"]),
    ]
    if bs["salias"]:
        score = F.col(score_col)
        if bs["round"] is not None:
            score = F.round(score, bs["round"])
        out.append(score.alias(bs["salias"]))
    return res.select(*out)


def try_route(sn, text: str) -> DataFrame | None:
    """Route `text` to a materialized index when its shape matches one.
    Returns None to fall through to the normal SQL path (cosine_sim then
    expands to the exact full-scan HOF; grammar misses stay plain SQL).
    bm25_score is always handled here — served from stored postings when
    an inverted index matches, else scored over inline postings."""
    forced = _FORCEINDEX.search(text)
    forced_name = None
    if forced:
        forced_table, forced_name = forced.group(1), forced.group(2).lower()
        if forced_name not in sn._ann_indexes:
            raise ValueError(
                f"index hint names unknown index '{forced_name}' "
                f"(--+ index({forced_table}, {forced.group(2)}))"
            )
        finfo = sn._ann_indexes[forced_name]
        if finfo["table"] != sn._canon(forced_table):
            raise ValueError(
                f"index '{forced_name}' is on {finfo['table']}, not "
                f"{sn._canon(forced_table)} — the hint's table and index "
                "must match"
            )
        text = _FORCEINDEX.sub(" ", text)
    if "cosine_sim" not in text.lower() and "bm25_score" not in text.lower():
        if forced_name:
            raise ValueError(
                f"--+ index({forced_name}) hint on a query that has no "
                "routable score function (cosine_sim/bm25_score top-k)"
            )
        return None
    hinted = _NOINDEX.search(text) is not None
    if hinted:
        if forced_name:
            raise ValueError("--+ index(...) and --+ noIndex conflict")
        text = _NOINDEX.sub(" ", text)
    if "row_number" in text.lower():
        bs = _parse_batch_shape(text)
        if bs is not None:
            routed = _route_batch(sn, bs, hinted, forced_name)
            if routed is not None:
                return routed
    shape = _parse_shape(text)
    if shape is None:
        th = _parse_threshold_shape(text)
        if th is not None and len(th["args"]) == 2:
            col, arr = th["args"][0].strip(), th["args"][1]
            q_vec = _parse_array_literal(arr)
            if _IDENT.match(col) and q_vec is not None:
                name, info = _find_index(sn, th["table"], col, "ivf_sq8")
                th_enabled = _routing_enabled(sn, hinted) or forced_name
                if forced_name:
                    fi = sn._ann_indexes[forced_name]
                    if fi.get("method") != "ivf_sq8":
                        raise ValueError(
                            f"index '{forced_name}' is a "
                            f"{fi.get('method')} index — threshold "
                            "cosine needs ivf_sq8"
                        )
                    if fi["column"].lower() != col.lower():
                        raise ValueError(
                            f"index '{forced_name}' covers column "
                            f"{fi['column']}, not the scored column"
                        )
                    if fi["table"] != _resolve_relation(sn, th["table"]):
                        raise ValueError(
                            f"index '{forced_name}' is on {fi['table']}, "
                            f"not {_resolve_relation(sn, th['table'])} — "
                            "the hinted index must cover the query's "
                            "FROM relation"
                        )
                    name, info = forced_name, fi
                if (
                    th_enabled
                    and name is not None
                    and th["id"].lower() == info["id_col"].lower()
                ):
                    from snappydata_spark import index_ann

                    served = index_ann.threshold_scan_ivf(
                        sn, name, q_vec, th["tau"]
                    )
                    if served is not None:
                        id_col, frame = served
                        out = [F.col(id_col).alias(th["id"])]
                        if th["alias"] is not None:
                            score = F.col("__cos")
                            if th["round"] is not None:
                                score = F.round(score, th["round"])
                            out.append(score.alias(th["alias"]))
                        return frame.select(*out)
        if re.search(r"\bbm25_score\s*\(", text, re.I) and _TOPK.match(text):
            raise ValueError(
                "bm25_score(col, 'query') is only supported in the routed "
                "top-k shape: SELECT <id>[, bm25_score(...) AS a] FROM t "
                "ORDER BY bm25_score(...) DESC [, <id>] LIMIT k"
            )
        if forced_name:
            raise ValueError(
                f"--+ index({forced_name}) hint on a query whose shape "
                "cannot be served from the index (see resolve_index "
                "docstring for the routable top-k forms)"
            )
        return None
    enabled = _routing_enabled(sn, hinted) or forced_name is not None

    def _apply_force(found_name, found_info, method):
        """Swap in the NAMED index under a force hint, erroring when it
        cannot serve this query (wrong method/table/column)."""
        if forced_name is None:
            return found_name, found_info
        fi = sn._ann_indexes[forced_name]
        if fi.get("method") != method:
            raise ValueError(
                f"index '{forced_name}' is a {fi.get('method')} index — "
                f"this query needs {method}"
            )
        if fi["table"] != _resolve_relation(sn, shape["table"]):
            raise ValueError(
                f"index '{forced_name}' is on {fi['table']}, not "
                f"{_resolve_relation(sn, shape['table'])}"
            )
        if fi["column"].lower() != (shape["args"][0].strip().lower()):
            raise ValueError(
                f"index '{forced_name}' covers column {fi['column']}, "
                "not the scored column"
            )
        return forced_name, fi
    if shape["fn"] == "cosine_sim":
        if len(shape["args"]) != 2:
            return None
        col, arr = shape["args"][0].strip(), shape["args"][1]
        q_vec = _parse_array_literal(arr)
        if not _IDENT.match(col) or q_vec is None:
            return None  # not the literal-query shape — exact scan path
        name, info = _find_index(sn, shape["table"], col, "ivf_sq8")
        name, info = _apply_force(name, info, "ivf_sq8")
        if (
            not enabled
            or name is None
            or shape["id"].lower() != info["id_col"].lower()
        ):
            if forced_name:
                raise ValueError(
                    f"--+ index({forced_name}): the projected id column "
                    f"must be the index key {info['id_col']}"
                )
            return None  # exact full scan via expand_scalar_macros
        from snappydata_spark import index_ann

        k = shape["k"]
        nprobe = int(sn.get_conf("snappydata.index.ann.nprobe", 4))
        cand = int(sn.get_conf("snappydata.index.ann.cand", max(50, 5 * k)))
        rerank = str(sn.get_conf("snappydata.index.ann.rerank", "exact"))
        n_rows = info.get("n_rows")
        if n_rows is not None and cand >= n_rows:
            # the candidate budget covers the whole corpus: probe every
            # cell — full recall at no extra cost (top-500 of a 20-row
            # table must return all 20, not the 4 probed cells' share)
            nprobe = max(nprobe, len(info["centroids"]))
        res = index_ann.search_ivf_sq8(
            sn,
            name,
            q_vec,
            topk=k,
            cand=cand,
            nprobe=nprobe,
            rerank=rerank,
            keep_exact=True,
        )
        id_out = F.col(info["id_col"]).alias(shape["id"])
        if shape["alias"] is None:
            return res.select(id_out)
        score = F.col("cos" if rerank == "sq8" else "exact_cos")
        if shape["round"] is not None:
            score = F.round(score, shape["round"])
        return res.select(id_out, score.alias(shape["alias"]))
    # bm25_score(col, 'query string')
    if len(shape["args"]) != 2:
        return None
    col = shape["args"][0].strip()
    qm = re.match(r"^'(?P<q>[^']*)'$", shape["args"][1].strip())
    if not _IDENT.match(col) or not qm:
        return None
    terms = qm.group("q").split()
    if not terms:
        raise ValueError("bm25_score needs a non-empty query string")
    from snappydata_spark import index_inverted

    k = shape["k"]
    name, info = _find_index(sn, shape["table"], col, "inverted")
    name, info = _apply_force(name, info, "inverted")
    if name is not None and shape["id"].lower() != info["id_col"].lower():
        if forced_name:
            raise ValueError(
                f"--+ index({forced_name}): the projected id column must "
                f"be the index key {info['id_col']}"
            )
        name = None  # projected id isn't the postings key — inline path
    if enabled and name is not None:
        res = index_inverted.bm25_topk(sn, name, terms, k=k)
        id_col = info["id_col"]
    else:
        # no index (or routing off): same scoring over postings derived
        # inline from the base table — one tokenization pass, the
        # documented slow path
        try:
            base = sn.table(sn._canon(shape["table"]))
        except Exception:
            base = sn.spark.table(shape["table"])
        id_col = shape["id"]
        post = index_inverted._postings(base, col, id_col)
        res = index_inverted.bm25_from_postings(post, id_col, terms, k=k)
    out = [F.col(id_col).alias(shape["id"])]
    if shape["alias"] is not None:
        score = F.col("bm25")
        if shape["round"] is not None:
            score = F.round(score, shape["round"])
        out.append(score.alias(shape["alias"]))
    return res.select(*out)

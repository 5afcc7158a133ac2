"""Randomized SQL differential fuzzer: the SAME generated SQL text runs
on Spark and DuckDB over the same parquet, results canonicalized and
compared (check_oracle's canon).  This probes the ANSI subset both
engines share — grouped aggregation, joins, predicates, CASE, string and
date expressions, HAVING, ORDER BY+LIMIT — with seeded-random shapes the
hand-written registry doesn't enumerate.

The grammar is restricted to the cross-engine-DETERMINISTIC subset (see
the divergence-class notes at AGG_EXPRS — two of which this fuzzer
itself discovered): money aggregates sum in exact DECIMAL and round in
decimal space, integer SUMs are CAST to BIGINT (DuckDB widens to
HUGEINT), LIMIT queries carry a full unique tie-break, and no expression
depends on engine-specific null ordering or collation.

Usage: python tools/fuzz_differential.py [sf_dir] [n_queries] [seed]
Exit 0 = every generated query matched.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import canon, duck_connect  # noqa: E402

TABLES = ("orders", "lineitem", "customer", "nation")

# (table, group-key expressions, numeric agg targets, predicates)
GROUP_EXPRS = {
    "orders": [
        "o_orderstatus",
        "o_orderpriority",
        "(o_custkey % {m})",
        "EXTRACT(YEAR FROM o_orderdate)",
        "EXTRACT(MONTH FROM o_orderdate)",
        "CASE WHEN o_totalprice > {price} THEN 'big' ELSE 'small' END",
        "substr(o_orderpriority, 1, 1)",
    ],
    "lineitem": [
        "l_returnflag",
        "l_linestatus",
        "(l_suppkey % {m})",
        "CAST(l_quantity AS BIGINT)",
        "EXTRACT(YEAR FROM l_shipdate)",
        "CASE WHEN l_discount >= {disc} THEN 'hi' ELSE 'lo' END",
    ],
    "customer": [
        "c_mktsegment",
        "(c_nationkey % {m})",
        "substr(c_name, 1, 8)",
        "CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END",
    ],
    "nation": ["n_regionkey", "substr(n_name, 1, 1)"],
}

# Two cross-engine divergence classes this fuzzer ITSELF found, and the
# deterministic formulations it therefore generates:
#
# 1. double-SUM order dependence: with different partition/merge orders
#    Spark and DuckDB can land on opposite sides of a .xx5 rounding
#    boundary (seed 2 produced a revenue sum of 345139.15500000...1 that
#    rounded to .15 on Spark and .16 on DuckDB).  Fix: cast each term to
#    DECIMAL(18,4) — decimal addition is exact and associative, so the
#    sum is identical under ANY execution order.
# 2. ROUND(double) half-way disagreement: when a quotient is EXACTLY
#    x.xxxx5 in decimal (common with .01-quantized money over small
#    counts: seeds 6/8 hit 4233.01125 and 183112.82875), Spark rounds
#    the shortest decimal repr HALF_UP while DuckDB rounds the binary
#    value — one engine says .0112, the other .0113.  No rounding of a
#    double quotient is cross-engine-safe, so averages are emitted as
#    the exact (decimal sum, count) pair — the mergeable-partials
#    discipline — rather than a rounded quotient.
_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE)"
# rounding must ALSO happen in decimal space: ROUND(decimal, 2) is
# half-away-from-zero on both engines (verified incl. 1.005 / 2.675 /
# -1.005), whereas decimal->decimal CAST is HALF_UP on Spark but
# HALF_EVEN on DuckDB, and ROUND(double, 2) diverges on half-way points
_DSUM_R2 = "CAST(ROUND(SUM(CAST({x} AS DECIMAL(18,4))), 2) AS DOUBLE)"

AGG_EXPRS = {
    "orders": [
        "COUNT(*) AS cnt",
        f"{_DSUM_R2.format(x='o_totalprice')} AS s_price",
        f"{_DSUM.format(x='o_totalprice')} AS s_price2, COUNT(o_totalprice)"
        " AS n_price",
        "CAST(SUM(o_orderkey % 97) AS BIGINT) AS s_key",
        "CAST(MIN(o_orderkey) AS BIGINT) AS min_key",
        "CAST(MAX(o_custkey) AS BIGINT) AS max_cust",
        "COUNT(DISTINCT o_custkey) AS d_cust",
        "MIN(o_orderdate) AS min_date",
    ],
    "lineitem": [
        "COUNT(*) AS cnt",
        f"{_DSUM_R2.format(x='l_extendedprice * (1 - l_discount)')}"
        " AS revenue",
        f"{_DSUM.format(x='l_quantity')} AS s_qty, COUNT(l_quantity) AS n_qty",
        "CAST(MAX(l_linenumber) AS BIGINT) AS max_ln",
        "COUNT(DISTINCT l_suppkey) AS d_supp",
        "MAX(l_shipdate) AS max_ship",
    ],
    "customer": [
        "COUNT(*) AS cnt",
        f"{_DSUM_R2.format(x='c_acctbal')} AS s_bal",
        f"{_DSUM.format(x='c_acctbal')} AS s_bal2, COUNT(c_acctbal) AS n_bal",
        "COUNT(DISTINCT c_nationkey) AS d_nat",
        "CAST(MIN(c_custkey) AS BIGINT) AS min_cust",
    ],
    "nation": ["COUNT(*) AS cnt", "CAST(MAX(n_nationkey) AS BIGINT) AS max_nk"],
}

PREDICATES = {
    "orders": [
        "o_totalprice > {price}",
        "o_totalprice BETWEEN {price} AND {price2}",
        "o_orderstatus IN ('F', 'O')",
        "o_orderpriority LIKE '{d}-%'",
        "o_custkey % {m} = 0",
        "EXTRACT(YEAR FROM o_orderdate) >= {year}",
    ],
    "lineitem": [
        "l_quantity >= {qty}",
        "l_discount BETWEEN {disc} AND {disc2}",
        "l_returnflag <> 'A'",
        "l_suppkey % {m} <> 1",
        "l_shipdate >= TIMESTAMP '{year}-03-01 00:00:00'",
    ],
    "customer": [
        "c_acctbal > {bal}",
        "c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')",
        "c_nationkey % {m} <> 2",
        "c_custkey <= {key}",
    ],
    "nation": ["n_regionkey <> {m5}", "n_nationkey < {key25}"],
}

JOINS = [
    # (left, right, condition, prefix for group/agg/pred pools)
    ("orders", "customer", "o_custkey = c_custkey", ("orders", "customer")),
    ("lineitem", "orders", "l_orderkey = o_orderkey", ("lineitem", "orders")),
    ("customer", "nation", "c_nationkey = n_nationkey", ("customer", "nation")),
]

# LEFT JOIN shapes: group/agg/pred pools restricted to the LEFT side so
# right-side NULLs never become group keys (pandas null-vs-NaN canon
# hazard); the preserved-row semantics is still exercised through
# COUNT(<right key>), which counts only matched rows
OUTER_JOINS = [
    ("orders", "customer", "o_custkey = c_custkey", "c_custkey"),
    ("customer", "nation", "c_nationkey = n_nationkey", "n_nationkey"),
    ("orders", "lineitem", "o_orderkey = l_orderkey", "l_suppkey"),
    ("nation", "customer", "n_nationkey = c_nationkey", "c_custkey"),
]

# subquery predicates (r9): IN / EXISTS / NOT EXISTS / scalar compare;
# NOT IN null-aware anti-join shapes added r11.
# Always appended as a TOP-LEVEL AND conjunct — Spark plans correlated
# and IN-subqueries only as conjunctive filters, and that restriction is
# itself part of the shared subset being fuzzed.  Correlation uses bare
# table names (the generated FROM never aliases), relying on standard
# inner-shadowing scope rules on both engines.
SUB_PREDICATES = {
    "orders": [
        "o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > {bal})",
        "EXISTS (SELECT 1 FROM lineitem WHERE lineitem.l_orderkey ="
        " orders.o_orderkey AND lineitem.l_quantity >= {qty})",
        "NOT EXISTS (SELECT 1 FROM lineitem WHERE lineitem.l_orderkey ="
        " orders.o_orderkey AND lineitem.l_returnflag = 'R')",
        "o_totalprice > (SELECT CAST(MAX(c_acctbal) AS DOUBLE)"
        " FROM customer WHERE c_nationkey % {m} = 0)",
        # NOT IN = null-aware anti join (Spark's BroadcastNestedLoopJoin
        # null-aware path — the allowlisted sql_in_subquery shape):
        # non-null inner on the first, an explicitly NULLABLE inner on
        # the second (NULLIF) so the all-rows-rejected ANSI semantics is
        # exercised whenever the sampled key collides
        "o_custkey NOT IN (SELECT c_custkey FROM customer WHERE"
        " c_acctbal < {bal})",
        "o_custkey NOT IN (SELECT NULLIF(c_custkey, {key}) FROM customer"
        " WHERE c_acctbal > {bal})",
    ],
    "customer": [
        "c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice"
        " > {price})",
        "NOT EXISTS (SELECT 1 FROM orders WHERE orders.o_custkey ="
        " customer.c_custkey)",
        "c_nationkey IN (SELECT n_nationkey FROM nation WHERE"
        " n_regionkey <> {m5})",
        "c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE"
        " n_regionkey = {m5})",
    ],
    "lineitem": [
        "l_orderkey IN (SELECT o_orderkey FROM orders WHERE"
        " o_orderstatus = 'F' AND o_totalprice > {price})",
        "EXISTS (SELECT 1 FROM orders WHERE orders.o_orderkey ="
        " lineitem.l_orderkey AND orders.o_orderpriority LIKE '{d}-%')",
        "l_suppkey NOT IN (SELECT c_nationkey FROM customer WHERE"
        " c_acctbal < {bal})",
    ],
    "nation": [],
}


def _fill(rng: random.Random, template: str) -> str:
    return template.format(
        m=rng.choice([2, 3, 5, 7, 13]),
        m5=rng.randrange(5),
        price=rng.randrange(1000, 200000),
        price2=rng.randrange(200000, 400000),
        disc=round(rng.uniform(0.0, 0.05), 2),
        disc2=round(rng.uniform(0.05, 0.1), 2),
        qty=rng.randrange(1, 40),
        bal=rng.randrange(-500, 5000),
        key=rng.randrange(10, 1500),
        key25=rng.randrange(3, 25),
        year=rng.randrange(1993, 1998),
        d=rng.randrange(1, 6),
        seg=rng.choice(
            ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
        ),
    )


# window-function shapes: partition key + UNIQUE order key make ranking
# deterministic; frame SUMs go through DECIMAL because DuckDB evaluates
# windowed aggregates with a segment tree (different addition order than
# Spark's running accumulation — the same class-1 divergence as GROUP BY)
_WINDOW_TEMPLATES = [
    (
        "orders",
        "SELECT o_orderkey, o_orderstatus,"
        " ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn,"
        " RANK() OVER (ORDER BY o_orderpriority, o_orderkey) AS rk,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER"
        "   (PARTITION BY o_orderstatus ORDER BY o_orderkey"
        "    ROWS BETWEEN {frame} PRECEDING AND CURRENT ROW) AS DOUBLE) AS wsum,"
        " CAST(LAG(o_custkey, 1, -1) OVER"
        "   (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS BIGINT) AS prev_cust"
        " FROM orders WHERE o_orderkey <= {key}",
    ),
    (
        "customer",
        "SELECT c_custkey, c_mktsegment,"
        " ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn,"
        " CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS nat_n,"
        " CAST(MIN(c_custkey) OVER"
        "   (PARTITION BY c_mktsegment ORDER BY c_custkey"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_min"
        " FROM customer WHERE c_custkey <= {key}",
    ),
]


# compositional window generation (r11): partition keys come from the
# deterministic GROUP_EXPRS-style pools, every ORDER BY ends in the
# table's unique pk (no ties → ranking/navigation deterministic), ROWS
# and RANGE frames randomize their bounds (RANGE only over the unique
# INTEGER pk — a deterministic peer set), windowed SUM goes through
# DECIMAL (DuckDB's segment-tree evaluation adds in a different order
# than Spark's running accumulation — divergence class 1), and named
# windows exercise the WINDOW clause on both engines.
_WIN_TABLES = {
    "orders": {
        "pk": "o_orderkey",
        "pkeys": ["o_orderstatus", "o_orderpriority", "(o_custkey % {m})"],
        "money": "o_totalprice",
        "num": "o_custkey",
        "ranks": ["o_orderpriority", "o_totalprice", "o_orderdate"],
        "filter": "o_orderkey <= {key}",
    },
    "customer": {
        "pk": "c_custkey",
        "pkeys": [
            "c_mktsegment",
            "(c_nationkey % {m})",
            "CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END",
        ],
        "money": "c_acctbal",
        "num": "c_nationkey",
        "ranks": ["c_mktsegment", "c_acctbal"],
        "filter": "c_custkey <= {key}",
    },
}

_WIN_FRAMES = [
    "ROWS BETWEEN {a} PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN {a} PRECEDING AND {b} FOLLOWING",
    "ROWS BETWEEN CURRENT ROW AND {b} FOLLOWING",
]


def _gen_window_compositional(rng: random.Random) -> str:
    tbl, cfg = rng.choice(sorted(_WIN_TABLES.items()))
    pk, money, num = cfg["pk"], cfg["money"], cfg["num"]
    pkey = _fill(rng, rng.choice(cfg["pkeys"]))
    rk = rng.choice(cfg["ranks"])
    frame = rng.choice(_WIN_FRAMES).format(
        a=rng.randrange(1, 8), b=rng.randrange(1, 8)
    )
    r = rng.randrange(1, 50)
    pool = [
        ("rn", "ROW_NUMBER() OVER w AS rn"),
        ("ntl", f"NTILE({rng.randrange(2, 7)}) OVER w AS ntl"),
        ("rk", f"RANK() OVER (ORDER BY {rk}, {pk}) AS rk"),
        (
            "drk",
            f"DENSE_RANK() OVER (PARTITION BY {pkey} ORDER BY {rk}, {pk})"
            " AS drk",
        ),
        (
            "lag_v",
            f"CAST(LAG({num}, {rng.randrange(1, 4)}, -1) OVER w AS BIGINT)"
            " AS lag_v",
        ),
        (
            "lead_v",
            f"CAST(LEAD({num}, {rng.randrange(1, 4)}, -1) OVER w AS BIGINT)"
            " AS lead_v",
        ),
        ("fv", f"CAST(FIRST_VALUE({num}) OVER w AS BIGINT) AS fv"),
        (
            "lv",
            f"CAST(LAST_VALUE({num}) OVER (PARTITION BY {pkey} ORDER BY {pk}"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
            " AS BIGINT) AS lv",
        ),
        (
            "wsum",
            f"CAST(SUM(CAST({money} AS DECIMAL(18,4))) OVER"
            f" (PARTITION BY {pkey} ORDER BY {pk} {frame}) AS DOUBLE)"
            " AS wsum",
        ),
        (
            "wcnt",
            f"CAST(COUNT(*) OVER (PARTITION BY {pkey} ORDER BY {pk} {frame})"
            " AS BIGINT) AS wcnt",
        ),
        (
            "rmin",
            f"CAST(MIN({pk}) OVER (PARTITION BY {pkey} ORDER BY {pk}"
            f" RANGE BETWEEN {r} PRECEDING AND CURRENT ROW) AS BIGINT)"
            " AS rmin",
        ),
        (
            "rmax",
            f"CAST(MAX({pk}) OVER (PARTITION BY {pkey} ORDER BY {pk}"
            f" RANGE BETWEEN CURRENT ROW AND {r} FOLLOWING) AS BIGINT)"
            " AS rmax",
        ),
    ]
    chosen = rng.sample(pool, rng.randrange(3, 6))
    exprs = [e for _, e in chosen]
    sql = (
        f"SELECT {pk}, " + ", ".join(exprs)
        + f" FROM {tbl} WHERE "
        + cfg["filter"].format(key=rng.randrange(200, 1500))
    )
    if any(" OVER w " in e or e.endswith("OVER w AS rn") for _, e in chosen):
        sql += f" WINDOW w AS (PARTITION BY {pkey} ORDER BY {pk})"
    return sql


def gen_window_query(rng: random.Random) -> str:
    if rng.random() < 0.75:
        return _gen_window_compositional(rng)
    _, tpl = rng.choice(_WINDOW_TEMPLATES)
    return tpl.format(frame=rng.randrange(1, 6), key=rng.randrange(200, 1500))


def gen_grouping_sets_query(rng: random.Random) -> str:
    """GROUPING SETS / CUBE / ROLLUP over one table (r10 — the §2.22
    family the fuzzer didn't reach).  NULL-canon discipline: the
    super-aggregate rows' NULL keys are projected through
    COALESCE(CAST(k AS STRING), '~all~') — every grouping expression in
    the pools is non-null on TPC-H data, so the sentinel marks exactly
    the rollup levels and the comparison never sorts raw NULL keys
    (the pandas object-column hazard that kept this family out of the
    grammar); aggregates reuse the decimal-exact pool."""
    tbl = rng.choice(TABLES)
    keys = [
        _fill(rng, e)
        for e in rng.sample(GROUP_EXPRS[tbl], min(2, len(GROUP_EXPRS[tbl])))
    ]
    aggs = [_fill(rng, e) for e in rng.sample(AGG_EXPRS[tbl], rng.randrange(1, 3))]
    seen, uniq = set(), []
    for a in aggs:
        alias = a.rsplit(" AS ", 1)[1]
        if alias not in seen:
            seen.add(alias)
            uniq.append(a)
    proj = ", ".join(
        [
            f"COALESCE(CAST({k} AS STRING), '~all~') AS k{i}"
            for i, k in enumerate(keys)
        ]
        + uniq
    )
    kl = ", ".join(keys)
    grouping = rng.choice([
        f"GROUPING SETS (({kl}), ({keys[0]}), ())",
        f"ROLLUP({kl})",
        f"CUBE({kl})",
    ])
    sql = f"SELECT {proj} FROM {tbl}"
    preds = [_fill(rng, e) for e in rng.sample(
        PREDICATES[tbl], rng.randrange(0, 2)
    )]
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    return sql + f" GROUP BY {grouping}"


# correlated-scalar-subquery-in-SELECT shapes (r11): outer table,
# correlated inner aggregate per SELECT item.  Spark rewrites these to
# an aggregate + left outer join; DuckDB decorrelates them the same way
# — the fuzz checks the rewrite is semantically transparent.  Inner
# aggregates stick to the decimal-exact discipline (no AVG: a binary
# quotient can land on opposite sides of the 6-dp canon rounding) and
# COUNT/MIN/MAX of integer keys; empty-group NULLs flow through as
# NULL on both engines (COUNT gives 0).
_SCALAR_SUB = [
    (
        "nation",
        "n_nationkey",
        [
            "(SELECT COUNT(*) FROM customer WHERE customer.c_nationkey ="
            " nation.n_nationkey AND c_acctbal > {bal}) AS s_cnt",
            "(SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)"
            " FROM customer WHERE customer.c_nationkey = nation.n_nationkey"
            " AND c_mktsegment = '{seg}') AS s_bal",
            "(SELECT MAX(c_custkey) FROM customer WHERE"
            " customer.c_nationkey = nation.n_nationkey) AS s_maxc",
            # COUNT(*), not COUNT(DISTINCT): Spark cannot decorrelate a
            # DISTINCT aggregate scalar subquery (AnalysisException)
            "(SELECT COUNT(*) FROM supplier WHERE"
            " supplier.s_nationkey = nation.n_nationkey) AS s_supp",
        ],
        "n_regionkey <> {m5}",
    ),
    (
        "customer",
        "c_custkey",
        [
            "(SELECT COUNT(*) FROM orders WHERE orders.o_custkey ="
            " customer.c_custkey AND o_totalprice > {price}) AS s_cnt",
            "(SELECT MIN(o_orderdate) FROM orders WHERE orders.o_custkey ="
            " customer.c_custkey) AS s_first",
            "(SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))"
            " AS DOUBLE) FROM orders WHERE orders.o_custkey ="
            " customer.c_custkey AND o_orderstatus = 'F') AS s_spend",
        ],
        "c_custkey % {m} = 0",
    ),
    (
        "supplier",
        "s_suppkey",
        [
            "(SELECT COUNT(*) FROM lineitem WHERE lineitem.l_suppkey ="
            " supplier.s_suppkey AND l_quantity >= {qty}) AS s_cnt",
            "(SELECT MAX(l_orderkey) FROM lineitem WHERE"
            " lineitem.l_suppkey = supplier.s_suppkey) AS s_maxo",
            "(SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))"
            " AS DOUBLE) FROM lineitem WHERE lineitem.l_suppkey ="
            " supplier.s_suppkey AND l_returnflag = 'R') AS s_ret",
        ],
        "s_suppkey % {m} = 0",
    ),
]


def gen_scalar_subquery_query(rng: random.Random) -> str:
    tbl, pk, subs, filt = rng.choice(_SCALAR_SUB)
    chosen = rng.sample(subs, rng.randrange(1, min(3, len(subs)) + 1))
    proj = ", ".join([f"{pk} AS k0"] + [_fill(rng, s) for s in chosen])
    sql = f"SELECT {proj} FROM {tbl} WHERE " + _fill(rng, filt)
    if rng.random() < 0.3:
        # requalify through a derived table: re-filter on a subquery
        # output (forces the decorrelated join under an outer Filter)
        alias = chosen[0].rsplit(" AS ", 1)[1]
        cmp_ = "IS NOT NULL" if alias != "s_cnt" else f"> {rng.randrange(0, 2)}"
        sql = f"SELECT * FROM ({sql}) d WHERE {alias} {cmp_}"
    return sql


def gen_query(rng: random.Random) -> str:
    """One random query in the shared ANSI subset: grouped aggregation
    (possibly joined / HAVING / LIMIT), a window-function scan, a
    correlated-scalar-subquery SELECT, or a derived-table
    requalification of an aggregate."""
    roll = rng.random()
    if roll < 0.15:
        return gen_window_query(rng)
    if roll < 0.27:
        return gen_grouping_sets_query(rng)
    if roll < 0.35:
        return gen_scalar_subquery_query(rng)
    if roll < 0.45:
        # derived table: aggregate inside, re-filter + re-project outside
        inner = _gen_agg_query(rng, allow_order=False, require_cnt=True)
        return (
            f"SELECT k0, cnt FROM ({inner}) d WHERE cnt > {rng.randrange(0, 3)}"
        )
    return _gen_agg_query(rng, allow_order=True)


def _gen_agg_query(
    rng: random.Random, allow_order: bool = True, require_cnt: bool = False
) -> str:
    extra_aggs: list[str] = []
    roll = rng.random()
    if roll < 0.15:
        left, right, cond, rkey = rng.choice(OUTER_JOINS)
        frm, pools = f"{left} LEFT JOIN {right} ON {cond}", (left,)
        extra_aggs.append(f"COUNT({rkey}) AS r_matched")
    elif roll < 0.45:
        left, right, cond, pools = rng.choice(JOINS)
        frm = f"{left} JOIN {right} ON {cond}"
    else:
        tbl = rng.choice(TABLES)
        frm, pools = tbl, (tbl,)

    def pick(pool_dict, k):
        pool = [e for t in pools for e in pool_dict[t]]
        return [_fill(rng, e) for e in rng.sample(pool, min(k, len(pool)))]

    keys = pick(GROUP_EXPRS, rng.randrange(1, 3))
    key_aliases = [f"k{i}" for i in range(len(keys))]
    aggs = pick(AGG_EXPRS, rng.randrange(1, 4)) + extra_aggs
    # dedupe agg aliases (sampling across pools can repeat a name)
    seen, uniq = set(), []
    for a in aggs:
        alias = a.rsplit(" AS ", 1)[1]
        if alias not in seen:
            seen.add(alias)
            uniq.append(a)
    aggs = uniq
    if require_cnt and not any(a.endswith(" AS cnt") for a in aggs):
        aggs.append("COUNT(*) AS cnt")

    select = ", ".join(
        [f"{k} AS {a}" for k, a in zip(keys, key_aliases)] + aggs
    )
    sql = f"SELECT {select} FROM {frm}"

    preds = pick(PREDICATES, rng.randrange(0, 3))
    conjuncts = []
    if preds:
        conjuncts.append(
            "(" + f" {rng.choice(['AND', 'OR'])} ".join(preds) + ")"
        )
    if rng.random() < 0.35:
        spool = [e for t in pools for e in SUB_PREDICATES.get(t, ())]
        if spool:
            conjuncts.append(_fill(rng, rng.choice(spool)))
    if conjuncts:
        sql += " WHERE " + " AND ".join(conjuncts)
    sql += " GROUP BY " + ", ".join(key_aliases)
    if rng.random() < 0.3:
        sql += f" HAVING COUNT(*) > {rng.randrange(0, 4)}"
    if allow_order and rng.random() < 0.25:
        # LIMIT needs a total order: rounded agg desc + every key asc
        first_agg = aggs[0].rsplit(" AS ", 1)[1]
        sql += (
            f" ORDER BY {first_agg} DESC, "
            + ", ".join(key_aliases)
            + f" LIMIT {rng.randrange(3, 12)}"
        )
    return sql


def run(
    sf_dir: str,
    n: int,
    seed: int,
    spark=None,
    through_session: bool = False,
    family: str | None = None,
) -> list[tuple[str, str]]:
    """Generate n queries, run both engines, return [(sql, reason)] for
    every mismatch (empty list = all matched).  through_session=True
    routes the Spark side through SnappySession.sql — plan cache,
    literal tokenization, qualified-name/builtin rewrites — so the
    dialect layer itself is fuzzed for semantic transparency on
    arbitrary SELECTs."""
    if spark is None:
        from snappydata_spark import get_spark

        spark = get_spark("fuzz")
    # supplier is only consumed by the scalar_sub family; mirror
    # duck_connect's existence check so an sf dir without it degrades to
    # a scoped per-query failure instead of breaking every family at
    # registration (supplier stays out of TABLES proper to keep pinned
    # fuzz seeds reproducing the same query streams)
    for t in TABLES + ("supplier",):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
    con = duck_connect(sf_dir)
    if through_session:
        from snappydata_spark import SnappySession

        sn = SnappySession(spark)
        run_sql = sn.sql
    else:
        run_sql = spark.sql

    gen = {
        None: gen_query,
        "window": gen_window_query,
        "grouping": gen_grouping_sets_query,
        "scalar_sub": gen_scalar_subquery_query,
    }[family]
    rng = random.Random(seed)
    failures: list[tuple[str, str]] = []
    for i in range(n):
        sql = gen(rng)
        try:
            sp = canon(run_sql(sql).toPandas())
        except Exception as ex:  # noqa: BLE001 — report, keep fuzzing
            failures.append((sql, f"spark error: {ex}"))
            continue
        try:
            du = canon(con.execute(sql).df())
        except Exception as ex:  # noqa: BLE001
            failures.append((sql, f"duckdb error: {ex}"))
            continue
        if sp != du:
            detail = "row count" if len(sp) != len(du) else "values"
            for a, b in zip(sp, du):
                if a != b:
                    detail = f"first diff: spark={a!r} duck={b!r}"
                    break
            failures.append((sql, detail))
        else:
            print(f"ok    [{i}] {sql[:100]}")
    return failures


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    family = sys.argv[4] if len(sys.argv) > 4 else None
    failures = run(sf_dir, n, seed, family=family)
    if failures:
        print(f"\n{len(failures)} MISMATCHES:")
        for sql, why in failures:
            print(f"--- {why}\n    {sql}")
        sys.exit(1)
    print(f"\nall {n} fuzzed queries matched (seed={seed})")


if __name__ == "__main__":
    main()

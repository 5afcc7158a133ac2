"""Property test for plan-cache literal handling (hypothesis): any
string literal a user can legally write — quotes, backslash escapes,
parameter-marker look-alikes (?, :p1), comment markers, unicode,
whitespace — must survive the tokenize→template→rebind cycle with
unchanged semantics, on both the cold path and the cache-hit rebind
path.  The round-3 review campaign fixed specific instances (:pN inside
double-quoted literals, escape-sequence mis-binding, '?' inside string
literals); this generalizes those regressions into one property."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

# r13: excluded from the default (driver) test lane — see pytest.ini
pytestmark = pytest.mark.slow

# literal pool: every entry is a distinct equivalence class of nastiness
POOL = [
    "plain",
    "",
    "a'b",
    'x"y',
    "back\\slash",
    "?",
    "a ? b",
    ":p1",
    "sel :p2 x",
    "100%",
    "new\nline",
    "tab\tsep",
    "uni€é",
    " leading",
    "trail ",
    "--comment",
    "/*block*/",
    "it''s",
]


def _sql_quote(s: str) -> str:
    # standard Spark SQL string literal: double the quotes, double the
    # backslashes (backslash is an escape character in Spark literals)
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


@pytest.fixture()
def pc_table(snappy):
    rows = [(s, i) for i, s in enumerate(POOL) for _ in range(i % 3 + 1)]
    snappy.spark.createDataFrame(rows, "s string, i long").createOrReplaceTempView(
        "pc_prop"
    )
    return {s: i % 3 + 1 for i, s in enumerate(POOL)}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    i=st.integers(min_value=0, max_value=len(POOL) - 1),
    j=st.integers(min_value=0, max_value=len(POOL) - 1),
)
def test_string_literals_survive_cache_rebind(snappy, pc_table, i, j):
    expected = pc_table
    # cold (or cached-template) path
    n1 = snappy.sql(
        f"SELECT COUNT(*) AS n FROM pc_prop WHERE s = {_sql_quote(POOL[i])}"
    ).collect()[0].n
    assert n1 == expected[POOL[i]], f"literal {POOL[i]!r} (first run)"
    # same template, different literal — the rebind path
    n2 = snappy.sql(
        f"SELECT COUNT(*) AS n FROM pc_prop WHERE s = {_sql_quote(POOL[j])}"
    ).collect()[0].n
    assert n2 == expected[POOL[j]], f"literal {POOL[j]!r} (rebind run)"
    # identical repeat — the pure hit path
    n3 = snappy.sql(
        f"SELECT COUNT(*) AS n FROM pc_prop WHERE s = {_sql_quote(POOL[i])}"
    ).collect()[0].n
    assert n3 == n1


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    i=st.integers(min_value=0, max_value=len(POOL) - 1),
    k=st.integers(min_value=0, max_value=len(POOL) - 1),
)
def test_mixed_string_and_numeric_literals(snappy, pc_table, i, k):
    # a string literal AND a numeric literal in one template: both must
    # tokenize independently and rebind in position
    row = snappy.sql(
        f"SELECT COUNT(*) AS n, {k} AS lit FROM pc_prop "
        f"WHERE s = {_sql_quote(POOL[i])} AND i >= 0"
    ).collect()[0]
    assert row.n == pc_table[POOL[i]]
    assert row.lit == k

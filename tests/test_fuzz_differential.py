"""Seeded-random SQL differential fuzzing against DuckDB (the
generator's grammar and the divergence classes it guards against are
documented in tools/fuzz_differential.py).  The fixed seeds make this a
regression corpus: any engine-config or dialect change that breaks
cross-engine agreement on the shared ANSI subset fails here before the
driver's correctness gate can see it."""

import pytest

from tools.fuzz_differential import gen_query, run

# r13: excluded from the default (driver) test lane — see pytest.ini
pytestmark = pytest.mark.slow


def test_fuzzed_queries_match_duckdb(spark, sf_dir):
    failures = run(sf_dir, n=40, seed=7, spark=spark)
    assert failures == [], "\n".join(f"{why}\n  {sql}" for sql, why in failures)


def test_generator_is_deterministic():
    import random

    a = [gen_query(random.Random(123)) for _ in range(5)]
    b = [gen_query(random.Random(123)) for _ in range(5)]
    assert a == b


def test_fuzzed_queries_through_snappy_session(spark, sf_dir):
    """The dialect layer (plan cache, literal tokenization,
    qualified-name and builtin rewrites) must be semantically
    transparent for arbitrary SELECTs: the same fuzzed SQL through
    SnappySession.sql still matches DuckDB."""
    failures = run(sf_dir, n=25, seed=99, spark=spark, through_session=True)
    assert failures == [], "\n".join(f"{why}\n  {sql}" for sql, why in failures)


def test_fuzzed_window_family_matches_duckdb(spark, sf_dir):
    """Dedicated window-function family (r10 verdict stretch #9):
    compositional rank/navigation/frame shapes with unique-pk
    tie-breaks and decimal-exact windowed sums.  The round-11 sweep ran
    600 of these green across seeds 11/12; this pinned subset keeps the
    family in every test run."""
    failures = run(sf_dir, n=30, seed=11, spark=spark, family="window")
    assert failures == [], "\n".join(f"{why}\n  {sql}" for sql, why in failures)


def test_fuzzed_scalar_subquery_family_matches_duckdb(spark, sf_dir):
    """Correlated-scalar-subquery-in-SELECT family (r11): Spark's
    decorrelation (aggregate + left outer join rewrite) must agree with
    DuckDB's on COUNT/MIN/MAX/decimal-SUM inner aggregates, including
    the empty-group NULL (vs COUNT's 0) and the derived-table
    requalification over a subquery output.  The round-11 sweep ran 280
    of these green across seeds 201-204 (both direct and
    through-session); this pinned subset keeps the family in every
    test run."""
    failures = run(sf_dir, n=25, seed=201, spark=spark, family="scalar_sub")
    assert failures == [], "\n".join(f"{why}\n  {sql}" for sql, why in failures)

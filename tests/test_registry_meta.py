"""Driver-contract registry invariants: every oracle belongs to a
registered query, names are sane, and the entry module exposes the
exact contract surfaces the driver imports."""


def test_registry_consistency():
    from snappydata_spark.operators import ORACLES, QUERIES

    assert len(QUERIES) >= 190
    # every oracle key is a registered query
    assert set(ORACLES) <= set(QUERIES)
    # no empty oracle text, no duplicate registrations lost
    for name, sql in ORACLES.items():
        assert sql.strip(), name
    # r6: EVERY registered query has a DuckDB oracle — the former four
    # approximate-by-design rows were re-pointed at deterministic
    # hash-exact constructions (verified HLL, hashed stratified sample,
    # bucket TABLESAMPLE)
    no_oracle = sorted(set(QUERIES) - set(ORACLES))
    assert no_oracle == []


def test_entry_module_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert callable(e.entry)

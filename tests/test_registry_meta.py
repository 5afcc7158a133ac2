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
    # the four approximate-by-design queries are the ONLY no-oracle rows
    no_oracle = sorted(set(QUERIES) - set(ORACLES))
    assert no_oracle == [
        "aqp_hll_union_daily",
        "aqp_sample_estimate_with_error",
        "ev_approx_distinct_users",
        "sample_tablesample",
    ]


def test_entry_module_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert callable(e.entry)

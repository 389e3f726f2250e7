"""Driver-contract consistency: the registry, bench list, and entry module
must stay mutually coherent (static checks, no Spark session)."""

from __future__ import annotations


def test_registry_consistency():
    import bench
    from clj_nlp_parse_spark import queries as Q
    import __spark_entry__ as E

    assert set(Q.ORACLES) <= set(Q.QUERIES)
    # every bench headline query exists
    assert set(bench.HEADLINE) <= set(Q.QUERIES)
    # entry module exposes exactly the registry
    assert set(E.queries()) == set(Q.QUERIES)
    assert set(E.oracle_sql()) == set(Q.ORACLES)
    # every callable takes (spark, sf_dir)
    import inspect
    for name, fn in Q.QUERIES.items():
        assert len(inspect.signature(fn).parameters) == 2, name
    # oracle SQL strings are non-trivial and reference a known table
    tables = ("documents", "events", "embeddings", "lineitem", "orders")
    for name, sql in Q.ORACLES.items():
        assert len(sql) > 40, name
        assert any(t in sql for t in tables), name

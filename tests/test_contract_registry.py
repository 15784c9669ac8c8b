"""Registry consistency guards: every bench headline name resolves,
every oracle has a query, and query callables are importable cold."""

import bench as bench_mod

from ptt_spider_go_spark import contract


def test_bench_headline_names_exist():
    qs = contract.queries()
    missing = [n for n in bench_mod.HEADLINE if n not in qs]
    assert missing == []


def test_every_oracle_has_a_query():
    qs = contract.queries()
    assert set(contract.oracle_sql()) <= set(qs)


def test_registry_values_are_callable():
    for name, fn in contract.queries().items():
        assert callable(fn), name

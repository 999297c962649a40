"""Driver-contract hygiene (no Spark session needed): every oracle key has a
query, names are unique, and the callables have the (spark, sf_dir) arity the
driver invokes."""

import inspect

import __spark_entry__ as em


def test_every_oracle_key_has_a_query():
    qs, oracles = em.queries(), em.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {sorted(missing)}"


def test_query_callables_take_spark_and_sf_dir():
    for name, fn in em.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir), got {params}"


def test_contract_size_monotonic():
    # The r5 contract is 90 queries; shrinking it silently would hide
    # regressions from the driver's gate.
    assert len(em.queries()) >= 90
    assert len(em.oracle_sql()) >= 90

"""Driver-contract invariants: the all-value-checked property is load-
bearing (the judge reads CORRECTNESS_r{N} row by row) — pin it so a new
query cannot silently ship without its oracle."""

import __spark_entry__ as E


def test_every_query_has_an_oracle():
    qs = set(E.queries())
    os_ = set(E.oracle_sql())
    assert os_ <= qs, f"oracles without queries: {sorted(os_ - qs)}"
    assert qs <= os_, (
        f"queries without oracles (rows-only rows need an explicit "
        f"exemption note here): {sorted(qs - os_)}"
    )


def test_oracle_sql_is_all_strings_and_nonempty():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name


def test_queries_are_callables():
    for name, fn in E.queries().items():
        assert callable(fn), name

"""Driver-contract integrity: the registry IS the correctness gate, so
shape errors here (name collisions between registries, oracle entries
without a query, stale _CHECK_FIRST names) must fail fast in CI, not
silently shadow a probe out of the driver's checked window."""

from __future__ import annotations

import __spark_entry__ as entry


def test_no_name_collisions_across_registries():
    seen: dict[str, str] = {}
    for reg in entry._REGISTRIES:
        for name in reg:
            assert name not in seen, f"duplicate query name: {name}"
            seen[name] = "x"


def test_oracles_are_a_subset_of_queries_with_matching_order():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
    # every entry is (callable, sql-or-None)
    for reg in entry._REGISTRIES:
        for name, (fn, sql) in reg.items():
            assert callable(fn), name
            assert sql is None or isinstance(sql, str), name


def test_check_first_names_exist_and_lead_the_window():
    q = entry.queries()
    missing = [n for n in entry._CHECK_FIRST if n not in q]
    assert not missing, f"_CHECK_FIRST references unknown queries: {missing}"
    head = list(q)[: len(entry._CHECK_FIRST)]
    assert head == [n for n in entry._CHECK_FIRST if n in q]


def test_entry_returns_flagship_dataframe(spark):
    df = entry.entry(spark)
    assert df.columns[:2] == ["ID_Event", "ID_type_ID"]
    assert df.count() > 0

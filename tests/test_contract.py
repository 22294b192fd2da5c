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
    assert df.columns[:2] == ["id_event", "id_type_id"]
    assert df.count() > 0


def test_type_parity_gate_flags_cross_engine_render_divergence():
    """tools/check_correctness.py must red-flag columns whose engine-
    native types differ (Decimal vs float, int vs float) even when the
    normalized values are equal — the exact class of hash-red that cost
    rounds 1-3 (star_schema_fact et al.)."""
    import decimal

    import pandas as pd

    import tools.check_correctness as cc

    spark_df = pd.DataFrame(
        {
            "d": [decimal.Decimal("1.500000")],  # Spark DECIMAL emission
            "i": [3],                            # Spark bigint
            "ok": [7],
        }
    )
    oracle_df = pd.DataFrame(
        {
            "d": [1.5],    # DuckDB returns DECIMAL as float64
            "i": [3.0],    # DuckDB HUGEINT sum arrives as float64
            "ok": [7],
        }
    )
    problems = cc.type_parity(spark_df, oracle_df)
    flagged = {p.split()[2].rstrip(":") for p in problems}
    assert flagged == {"d", "i"}, problems
    # value-normalized compare alone would NOT catch these
    assert all("type parity" in p for p in problems)
    # clean int column on both sides stays silent
    assert not cc.type_parity(
        pd.DataFrame({"x": [1]}), pd.DataFrame({"x": [2]})
    )

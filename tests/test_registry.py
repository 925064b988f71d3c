"""Registry invariants: the driver contract must stay internally
consistent as modules are added."""

from __future__ import annotations

from lance_duckdb_spark.registry import ORACLE_REGISTRY, QUERY_REGISTRY
from lance_duckdb_spark.tables import TABLES


def test_every_oracle_has_a_query():
    missing = set(ORACLE_REGISTRY) - set(QUERY_REGISTRY)
    assert not missing, f"oracles without queries: {missing}"


def test_rows_only_queries_are_the_documented_ones():
    # r5: every registered query has a hash oracle — the formerly
    # rows-only approximate queries hash their deterministic
    # sub-results (exact top-k / exact distinct / exact pair set)
    # plus a literal-TRUE accuracy flag the Spark side computes.
    rows_only = set(QUERY_REGISTRY) - set(ORACLE_REGISTRY)
    assert rows_only == set(), f"undocumented rows-only queries: {rows_only}"


def test_oracle_sql_references_known_tables_only():
    import re

    known = set(TABLES)
    for name, sql in ORACLE_REGISTRY.items():
        for m in re.finditer(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", sql):
            tbl = m.group(1)
            # CTE names and subquery aliases are lowercase too — only
            # flag identifiers that look like base tables but aren't
            # registered views or declared CTEs/aliases in this SQL
            if tbl in known:
                continue
            assert (
                re.search(
                    rf"\b{tbl}\b\s+AS\s+(?:(?:NOT\s+)?MATERIALIZED\s+)?\(",
                    sql,
                    re.IGNORECASE,
                )
                or re.search(rf"WITH\s+{tbl}\b", sql, re.IGNORECASE)
                or re.search(rf"\)\s*(AS\s+)?{tbl}\b", sql, re.IGNORECASE)
                or re.search(rf"{tbl}\s*\(", sql)  # function call
                or tbl in ("unnest",)
            ), f"{name}: unknown table reference '{tbl}'"


def test_query_callables_have_docstrings_or_module_docs():
    import inspect

    for name, fn in QUERY_REGISTRY.items():
        mod = inspect.getmodule(fn)
        assert fn.__doc__ or mod.__doc__, f"{name} lacks documentation"


def test_r14_window_composition():
    """The rotation contract, pinned (r14): the driver checks the
    FIRST 50 registry entries. This round's window must lead with
    hybrid_search_filtered (the only never-driver-checked entry,
    slot 1 per the r13 verdict), then the two r14-new queries, then
    the r11-stale tier; the three deliberately-slipped entries
    (tpch_q11/q12/q15 — documented in SURVEY §2's coverage note)
    sit at positions 51-53 so they lead r15's stale tier. A registry
    edit that silently reshuffles this breaks the staleness
    contract — fail here first."""
    order = list(QUERY_REGISTRY)
    assert order[0] == "hybrid_search_filtered"
    assert set(order[1:3]) == {"ann_ivf_after_delete", "lance_sql_ann"}
    assert order[50:53] == ["tpch_q11", "tpch_q12", "tpch_q15"]
    window = set(order[:50])
    assert not (window & {"tpch_q11", "tpch_q12", "tpch_q15"})
    # every entry still has exactly one slot
    assert len(order) == len(set(order)) == 152

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


def test_r15_window_composition():
    """The rotation contract, pinned (r15): the driver checks the
    FIRST 50 registry entries. This round's window must LEAD with
    the 17 _RECHECK_R15 entries (the 14 query paths the r14
    optimizer restructured but the r14 driver sample missed —
    VERDICT r14 item 1 — plus the three documented r14 slips
    tpch_q11/q12/q15) and the r15-new lance_sql_fts (A22's owed
    match_bm25 debut); the rest of the window is the stalest
    (r12-green) tier. The eight r12 entries that do not fit sit at
    positions 51-58 so they lead r16's stale tier. A registry edit
    that silently reshuffles this breaks the staleness contract —
    fail here first."""
    from lance_duckdb_spark.registry import _RECHECK_R15

    order = list(QUERY_REGISTRY)
    lead = _RECHECK_R15 | {"lance_sql_fts"}
    assert set(order[: len(lead)]) == lead
    window = set(order[:50])
    slipped = {
        "sql_api_priority_matrix", "string_agg_ordered",
        "stream_windowed_counts", "session_window_native",
        "stream_sessionization", "stream_sink_roundtrip",
        "stream_dedup", "stream_stream_join",
    }
    assert not (window & slipped)
    assert set(order[50:58]) == slipped
    # every entry still has exactly one slot
    assert len(order) == len(set(order)) == 153

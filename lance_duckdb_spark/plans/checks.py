"""Explain-plan inspection helpers (SURVEY.md §5): used by
tests/test_plans.py and available for ad-hoc plan audits — the
"is this the plan I'd want on 1000 executors?" checklist.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The FINAL physical plan. After an AQE plan diverges (the
    DataFrame was executed and adaptive re-planning changed it),
    toString prints BOTH '== Final Plan ==' and '== Initial Plan =='
    trees — keeping the initial tree would double-count exchanges
    and report joins from the superseded plan (r8 review), so it is
    sliced off."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    cut = plan.find("== Initial Plan ==")
    return plan if cut < 0 else plan[:cut]


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters list of the first scan in the plan ('' if
    none)."""
    plan = executed_plan(df)
    if "PushedFilters:" not in plan:
        return ""
    return plan.split("PushedFilters:")[1].splitlines()[0].strip()


def read_schema(df: DataFrame) -> str:
    """The ReadSchema of the first scan — verifies column pruning."""
    plan = executed_plan(df)
    if "ReadSchema:" not in plan:
        return ""
    return plan.split("ReadSchema:")[1].splitlines()[0].strip()


def has_filter_node(df: DataFrame) -> bool:
    """True if a post-scan Filter node remains (i.e. some predicate
    was NOT consumed by the source)."""
    return bool(re.search(r"\bFilter \(", executed_plan(df)))


def join_kinds(df: DataFrame) -> list[str]:
    plan = executed_plan(df)
    kinds = []
    for k in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        if k in plan:
            kinds.append(k)
    return kinds


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators — the scale budget."""
    return len(re.findall(r"\bExchange\b", executed_plan(df)))


def assert_no_quadratic_join(df: DataFrame) -> None:
    kinds = join_kinds(df)
    # explicit raise, not a bare assert: python -O strips asserts
    # and would turn this guard into a silent no-op (r8 review)
    if "CartesianProduct" in kinds or "BroadcastNestedLoopJoin" in kinds:
        raise AssertionError(f"quadratic join in plan: {kinds}")

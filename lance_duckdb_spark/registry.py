"""Central registry: merges every operator module's QUERIES/ORACLE.

Import failures in optional modules are not tolerated — every module
listed here is part of the declared SURVEY.md §2 surface.
"""

from __future__ import annotations

from .operators import (
    analytics,
    behavior,
    clustering,
    dedup,
    joins,
    lance_ops,
    multimodal,
    pipeline,
    retrieval,
    similarity,
    sql_surface,
    text,
    tpch,
    tpch2,
    window_funcs,
)
from .streaming import jobs as streaming_jobs

_MODULES = [
    tpch,
    tpch2,
    analytics,
    behavior,
    joins,
    text,
    similarity,
    dedup,
    clustering,
    lance_ops,
    multimodal,
    pipeline,
    retrieval,
    sql_surface,
    window_funcs,
    streaming_jobs,
]


def _merge(attr: str) -> dict:
    merged: dict = {}
    for mod in _MODULES:
        entries = getattr(mod, attr, {})
        overlap = merged.keys() & entries.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(entries)
    return merged


QUERY_REGISTRY = _merge("QUERIES")
ORACLE_REGISTRY = _merge("ORACLE")

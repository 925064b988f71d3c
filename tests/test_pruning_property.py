"""Property test: fragment pruning (zone maps + blooms) must be
invisible in results. For ANY random dataset layout and ANY random
pushed predicate, scanning only the fragments _fragment_may_match
keeps must return exactly the rows a full scan returns.

Runs at the pyarrow layer (no Spark session) so hypothesis can sweep
hundreds of layouts/predicates quickly — the Spark scan path calls
the same _fragment_may_match/_to_arrow_filter pair (datasource.py
partitions()/read())."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.dataset as pads
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources.datasource import (
    EqualTo,
    GreaterThan,
    In,
    LessThanOrEqual,
    _fragment_may_match,
    _to_arrow_filter,
)

_VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]


@st.composite
def layouts(draw):
    """A dataset as 1-4 fragments of (k int64, s string) rows."""
    frags = draw(
        st.lists(
            st.lists(
                st.tuples(
                    st.integers(-50, 50), st.sampled_from(_VOCAB)
                ),
                min_size=1,
                max_size=20,
            ),
            min_size=1,
            max_size=4,
        )
    )
    return frags


@st.composite
def predicates(draw):
    col = draw(st.sampled_from(["k", "s"]))
    if col == "k":
        kind = draw(st.sampled_from(["eq", "gt", "le", "in"]))
        v = draw(st.integers(-60, 60))
        if kind == "eq":
            return EqualTo(("k",), v)
        if kind == "gt":
            return GreaterThan(("k",), v)
        if kind == "le":
            return LessThanOrEqual(("k",), v)
        vs = tuple(draw(st.lists(st.integers(-60, 60), min_size=1, max_size=4)))
        return In(("k",), vs)
    return EqualTo(("s",), draw(st.sampled_from(_VOCAB + ["zz"])))


@given(frags=layouts(), pred=predicates())
@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_pruned_scan_equals_full_scan(frags, pred, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prune") / "ds")
    os.makedirs(root, exist_ok=True)
    written = []
    for rows in frags:
        t = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "s": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        written.append(
            lf.write_fragment(root, t, bloom_columns=["s", "k"])
        )
    expr = _to_arrow_filter([pred])

    def rows_of(frag_list):
        out = []
        for f in frag_list:
            t = lf.read_fragment(root, f)
            t = pads.dataset(t).to_table(filter=expr)
            out.extend(
                zip(t.column("k").to_pylist(), t.column("s").to_pylist())
            )
        return sorted(out)

    kept = [f for f in written if _fragment_may_match(f, [pred], root)]
    assert rows_of(kept) == rows_of(written)

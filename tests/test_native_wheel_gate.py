"""Wheel-gated readiness test for modern Lance encodings
(SURVEY.md §7 / r5 VERDICT gap #1).

The native reader (sources/lance_native.py) decodes plain v2.0
pages and FAILS LOUDLY (LanceNativeUnsupported) on compressed /
miniblock v2.1+ pages — in this offline environment no `lance`
wheel, crate sources, or >=2.1 fixture exists to author or verify a
spec-faithful decoder against. This module self-verifies the gap
the moment an environment provides the wheel: it writes datasets
WITH the real wheel and round-trips them through the native reader.
Skipped (not silently passed) while the wheel is absent.
"""

from __future__ import annotations

import pytest

lance = pytest.importorskip(
    "lance", reason="`lance` wheel not installed in this environment"
)
import pyarrow as pa  # noqa: E402

from lance_duckdb_spark.sources import lance_native as ln  # noqa: E402


def _roundtrip(tmp_path, table, name, **write_kwargs):
    root = str(tmp_path / name)
    lance.write_dataset(table, root, **write_kwargs)
    got = ln.read_dataset(root)
    assert got.combine_chunks().sort_by("id").equals(
        table.combine_chunks().sort_by("id")
    )


def test_wheel_written_default_encoding_roundtrips(tmp_path):
    """Whatever the installed wheel writes by default (>=2.1 wheels
    default to miniblock/compressed encodings) must decode natively
    bit-exact — this is the test that flips the documented gap to
    'closed' when a wheel appears."""
    table = pa.table(
        {
            "id": pa.array(range(10_000), pa.int64()),
            "name": pa.array([f"row-{i}" for i in range(10_000)]),
            "score": pa.array([i * 0.5 for i in range(10_000)]),
        }
    )
    _roundtrip(tmp_path, table, "default.lance")


def test_wheel_written_21_storage_roundtrips(tmp_path):
    """Explicit 2.1 storage format (miniblock pages for narrow
    columns) through the native reader."""
    table = pa.table(
        {
            "id": pa.array(range(50_000), pa.int64()),
            "flag": pa.array([i % 3 == 0 for i in range(50_000)]),
        }
    )
    _roundtrip(
        tmp_path,
        table,
        "v21.lance",
        data_storage_version="2.1",
    )

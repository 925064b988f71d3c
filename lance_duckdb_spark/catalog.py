"""SQL-surface helpers for the lance data source: view-based catalog
registration and replacement-scan path sugar.

Reference parity:

- DuckDB gets ``SELECT * FROM 'file.lance'`` for free via a
  replacement scan (reference cpp/lance_replacement.cpp:11-31 —
  any table name ending in ``.lance`` is rewritten to
  ``lance_scan('<path>')``). :func:`lance_sql` is the Spark twin:
  it rewrites quoted ``.lance`` path literals in a SQL string into
  registered temp views backed by the lance data source, then runs
  ``spark.sql``.

- DuckDB also gets persistent DDL (``CREATE VIEW``/``ATTACH``) for
  free. Spark 4.1's Python DataSource API cannot back a *catalog*
  table (``CREATE TABLE ... USING lance`` hands the Python source
  empty options — no path reaches the reader; verified and
  documented in README "SQL over lance datasets"). Until the
  Python DS API grows catalog support, the supported SQL surface is
  TEMP VIEWS: :func:`register_lance_views` scans a directory tree
  for lance datasets and registers one view per dataset — the
  operational equivalent of attaching a database of lance tables.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from .sources import datasource as ds
from .sources import lance_format as lf


def _is_lance_dataset(path: str) -> bool:
    return os.path.isdir(os.path.join(path, lf.MANIFEST_DIR))


def _view_name(path: str) -> str:
    """Stable SQL identifier for a dataset path: basename (sans
    ``.lance``) sanitized; non-leading-alnum chars become ``_``."""
    base = os.path.basename(path.rstrip("/"))
    if base.endswith(".lance"):
        base = base[: -len(".lance")]
    name = re.sub(r"[^0-9A-Za-z_]", "_", base)
    if not name or name[0].isdigit():
        name = "ds_" + name
    return name


def register_lance_views(
    spark: SparkSession,
    root_dir: str,
    version: int | dict[str, int] | None = None,
) -> dict[str, str]:
    """Register every lance dataset under ``root_dir`` (one level of
    nesting, like a database directory of tables) as a temp view
    named after its directory. Returns {view_name: dataset_path}.

    This is the catalog stand-in for ``CREATE TABLE ... USING
    lance`` (unsupported by Spark's Python DataSource API — see
    module docstring). Views are session-scoped; call once per
    session, after which the full ``spark.sql`` surface works over
    the datasets.

    ``version`` pins views to manifest versions. Datasets version
    INDEPENDENTLY (each append advances only its own history), so a
    single int is only meaningful when every table's history is
    aligned — passing one raises if any dataset lacks that version,
    rather than serving a mismatched snapshot. For the general case
    pass a mapping ``{view_name: version}``; unlisted views read
    latest (r4 ADVICE)."""
    ds.register(spark)
    out: dict[str, str] = {}
    candidates = []
    if _is_lance_dataset(root_dir):
        candidates.append(root_dir)
    else:
        for entry in sorted(os.listdir(root_dir)):
            p = os.path.join(root_dir, entry)
            if os.path.isdir(p) and _is_lance_dataset(p):
                candidates.append(p)
    for path in candidates:
        name = _view_name(path)
        if name in out:
            raise ValueError(
                f"view name collision: {path} and {out[name]} both "
                f"map to '{name}'"
            )
        if isinstance(version, dict):
            pin = version.get(name)
            if pin is not None and pin not in lf.list_versions(path):
                raise lf.LanceDatasetError(
                    f"dataset {path!r} has no version {pin} "
                    f"(versions: {lf.list_versions(path)})"
                )
        else:
            pin = version
            if pin is not None and pin not in lf.list_versions(path):
                raise lf.LanceDatasetError(
                    f"dataset {path!r} has no version {pin} "
                    f"(versions: {lf.list_versions(path)}); dataset "
                    "histories are independent — pass a per-view "
                    "mapping {view_name: version} instead of one "
                    "number for unaligned directories"
                )
        reader = spark.read.format("lance")
        if pin is not None:
            reader = reader.option("version", str(pin))
        reader.load(path).createOrReplaceTempView(name)
        out[name] = path
    if isinstance(version, dict):
        unknown = set(version) - set(out)
        if unknown:
            # a typo'd view name would otherwise leave the intended
            # view silently unpinned on latest — the exact mismatch
            # hazard the mapping exists to prevent
            raise lf.LanceDatasetError(
                f"version mapping names unknown views {sorted(unknown)}; "
                f"registered views: {sorted(out)}"
            )
    return out


# quoted path literal ending in .lance in TABLE position (after
# FROM or JOIN) — string literals elsewhere (WHERE clauses, SELECT
# values) are data, not table refs, and are left untouched; the
# reference's replacement scan gets the same positional context from
# DuckDB's parser
_PATH_RE = re.compile(
    r"""((?:FROM|JOIN)\s+)(['"`])([^'"`]+\.lance)\2""", re.IGNORECASE
)


def _narrowed_schema(path: str, sql: str):
    """Auto-narrow projection (the Python DS API has no automatic
    projection pushdown — SURVEY §2.A4): the dataset columns the SQL
    can possibly reference are exactly the identifiers that appear in
    its text (column references are always literal in SQL — there is
    no dynamic column naming), so intersecting the dataset schema
    with the query's word set is a sound over-approximation. A
    ``*`` anywhere disables narrowing (SELECT * needs everything);
    string literals can only ADD columns to the kept set, never drop
    one. Returns a StructType to scan, or None for the full schema.
    """
    from pyspark.sql.types import StructType

    from .sources import lance_native as ln

    # COUNT(*) references no columns — only a bare projection/qualified
    # star must disable narrowing
    starless = re.sub(r"(?i)count\s*\(\s*\*\s*\)", "", sql)
    if "*" in starless:
        return None
    # NATURAL JOIN references every common column WITHOUT naming it —
    # narrowing would drop unnamed join keys from the scan schema and
    # silently change the join. Same conservative gate as '*'.
    if re.search(r"(?i)\bnatural\b", sql):
        return None
    try:
        if ln.is_native_dataset(path):
            return None  # native reader manages its own schema map
        manifest = lf.read_manifest(path)
        full = StructType.fromJson(json.loads(manifest.schema_json))
    except Exception:
        return None
    # identifiers can be backtick-quoted and non-ASCII (`größe`) or
    # digit-led (`2024_rev`) — collect quoted segments verbatim plus
    # unicode word tokens, so a referenced column can never be
    # dropped from the narrowed schema
    words = {w.lower() for w in re.findall(r"`([^`]+)`", sql)}
    words |= {w.lower() for w in re.findall(r"\w+", sql, re.UNICODE)}
    kept = [f for f in full.fields if f.name.lower() in words]
    if not kept or len(kept) == len(full.fields):
        return None
    return StructType(kept)


def lance_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run SQL where quoted ``'path.lance'`` literals are table
    references — DuckDB replacement-scan parity
    (cpp/lance_replacement.cpp: any table name ending ``.lance``
    becomes a scan of that dataset).

    Each distinct quoted ``.lance`` path that exists on disk is
    registered as a deterministic temp view and the literal is
    replaced by the view name; literals that do NOT name an existing
    dataset are left untouched (so string data containing
    ``.lance`` never breaks — slightly stricter than the reference,
    which rewrites any FROM-position name unconditionally).

    Scans are AUTO-NARROWED to the columns the query text can
    reference (see ``_narrowed_schema``): a single-column SELECT over
    a wide dataset reads one column, closing most of the Python DS
    API's missing projection pushdown. The view name encodes the
    kept-column set so narrowing can never leak stale between
    queries sharing a session."""
    ds.register(spark)

    def _sub(m: re.Match) -> str:
        path = m.group(3)
        if not _is_lance_dataset(path):
            return m.group(0)
        narrowed = _narrowed_schema(path, sql)
        cols_key = ",".join(f.name for f in narrowed.fields) if narrowed else "*"
        digest = hashlib.md5(
            (os.path.abspath(path) + "\0" + cols_key).encode()
        ).hexdigest()[:10]
        name = f"lance_ds_{digest}"
        # idempotent per session: re-registering the same path+cols
        # is a no-op
        reader = spark.read.format("lance")
        if narrowed is not None:
            reader = reader.schema(narrowed)
        reader.load(path).createOrReplaceTempView(name)
        return m.group(1) + name

    return spark.sql(_PATH_RE.sub(_sub, sql))

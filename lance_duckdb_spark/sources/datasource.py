"""Spark Python DataSource exposing the Lance dataset model
(SURVEY.md §2.A): ``spark.read.format("lance")``, batch writes with
append/overwrite + atomic manifest commit, ``version`` time travel,
and a micro-batch stream reader/writer over fragments.

Reference parity map:
- lance_scan table function (src/lance_scan.cpp, rust/scanner.rs) →
  ``LanceScanReader``: one Spark InputPartition per fragment, arrow
  RecordBatch output, column pruning + predicate pushdown into the
  fragment read.
- lance_open_dataset / schema introspection (rust/lib.rs:26-144,
  rust/types.rs) → manifest-backed ``LanceDataSource.schema()``.
- writer (rust/writer.rs, rust/lib.rs:341-393) →
  ``LanceArrowWriter``: fragments written per-task from arrow
  batches, version committed atomically on the driver.
- stream scan (rust/lib.rs:148-188) → ``LanceStreamReader``: each
  micro-batch covers fragments appended since the last offset.

Scale: partitions() returns fragment-granular splits (100 TB table
= ~200k fragments of ~512 MB), so scan parallelism == cluster
width; pushed filters and pruned columns reach pyarrow's parquet
reader (row-group skipping + column selection), the same plan shape
a native connector would produce.
"""

from __future__ import annotations

import functools
import json
import os
import dataclasses
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from . import iolayer as io
from . import lance_format as lf
from . import lance_native as ln

if TYPE_CHECKING:
    import pyarrow as pa


@dataclass
class FragmentPartition(InputPartition):
    root: str
    file: str
    num_rows: int
    deletion_file: str | None = None
    # the filters THIS planning pushed, bound into the partition at
    # partitions() time: read() must never consult the reader
    # object's mutable pushed-filter state, because Spark keeps ONE
    # python reader per relation while the optimizer can clone the
    # relation into several scan positions with DIFFERENT derived
    # filters (e.g. a semi join pushed through a UNION turns one
    # branch's constant key into `col = 777` on one clone only) —
    # last-writer-wins on shared state silently over-filtered the
    # other clone (r9 MERGE finding). Partition-bound filters make
    # each scan's executors see exactly the filters of the planning
    # that produced their partition list.
    pushed: tuple = ()
    # stable-field-id resolution (r13): tuple of (current name,
    # physical name) pairs for fields PRESENT in this fragment, in
    # schema order — fields not listed are absent (typed-NULL fill)
    # even when a same-named physical column exists (dead id).
    # None = resolve by name (legacy fragments, and the identity
    # fast path which keeps parquet-level filter pushdown).
    colmap: tuple | None = None


@dataclass
class LanceCommitMessage(WriterCommitMessage):
    file: str
    num_rows: int
    stats: dict | None = None
    bloom_file: str | None = None


def _to_arrow_filter(filters: list[Filter]):
    """Convert pushed Spark filters to a pyarrow compute expression.
    Only single-segment column paths; caller keeps unsupported ones."""
    import pyarrow.compute as pc
    import pyarrow.dataset  # noqa: F401  (registers field/scalar exprs)

    expr = None
    for f in filters:
        col = pc.field(f.attribute[0])
        if isinstance(f, EqualTo):
            e = col == f.value
        elif isinstance(f, GreaterThan):
            e = col > f.value
        elif isinstance(f, GreaterThanOrEqual):
            e = col >= f.value
        elif isinstance(f, LessThan):
            e = col < f.value
        elif isinstance(f, LessThanOrEqual):
            e = col <= f.value
        elif isinstance(f, In):
            # Spark SQL: `x IN (..., NULL)` is NULL (row filtered) for
            # non-matching x — NULL never satisfies the predicate. A
            # pyarrow set lookup may match null column values, so strip
            # None from the pushed value list; matches are unaffected.
            e = col.isin([v for v in f.value if v is not None])
        elif isinstance(f, IsNull):
            e = col.is_null()
        elif isinstance(f, IsNotNull):
            e = ~col.is_null()
        else:  # pragma: no cover
            continue
        expr = e if expr is None else expr & e
    return expr


_SUPPORTED = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    In,
    IsNull,
    IsNotNull,
)


def _float_cols(schema: StructType) -> frozenset:
    return frozenset(
        fld.name
        for fld in schema.fields
        if fld.dataType.typeName() in ("float", "double")
    )


def _pushable(f: Filter, float_cols: frozenset = frozenset()) -> bool:
    """True when the source may FULLY consume the filter. Two Spark
    NaN-semantics divergences are never pushable (r8 review):

    - NaN OPERANDS: Spark's EqualTo treats NaN = NaN as TRUE (and
      orders NaN above everything) while pyarrow compares IEEE
      (always false) — consuming such a filter silently drops the
      matching NaN rows.
    - GreaterThan/GreaterThanOrEqual on FLOATING columns: Spark says
      a NaN DATA row matches col > x for every x; pyarrow says it
      never does, and the NaN-skipping zone maps would prune the
      whole fragment on top. (LT/LTE/EqualTo with non-NaN operands
      agree between the engines: NaN matches neither.)

    Yielded-back filters are evaluated by Spark with its own
    semantics — correctness is preserved, only pushdown is lost on
    these rare shapes."""
    if not (isinstance(f, _SUPPORTED) and len(f.attribute) == 1):
        return False

    def _is_nan(v) -> bool:
        return isinstance(v, float) and v != v

    if isinstance(f, In):
        return not any(_is_nan(v) for v in f.value)
    if (
        isinstance(f, (GreaterThan, GreaterThanOrEqual))
        and f.attribute[0] in float_cols
    ):
        return False
    return not _is_nan(getattr(f, "value", None))


@functools.lru_cache(maxsize=4096)
def _load_bloom_file(path: str) -> dict:
    """Parse a bloom side file ONCE per process: fragments are
    immutable, so the parsed blooms never change for a given path.
    Uncached, a single point-lookup over a ~200k-fragment dataset
    would open+json.load 200k files synchronously on the driver per
    PLAN — the same planning-I/O bottleneck class the r5 manifest
    fix removed (r8 review finding). Missing/corrupt side files keep
    the fragment (conservative, as before)."""
    try:
        return json.loads(io.read_text(path))
    except (OSError, ValueError):
        return {}


def _fragment_may_match(
    fragment, pushed: list[Filter], root: str | None = None
) -> bool:
    """Zone-map (+ bloom) check: False only when a pushed filter
    provably excludes every row of the fragment. Conservative:
    unknown columns/stats/types keep the fragment. When the fragment
    carries a bloom side file and an EqualTo is pushed on a bloomed
    column, a negative membership test also prunes — equality
    pruning on columns zone maps can't help with (values
    uncorrelated with layout)."""
    if root is not None and fragment.bloom_file:
        # probe only with plain-literal types; numeric literals are
        # float-canonicalized inside _bloom_hashes (both write and
        # probe paths), so an int literal against a float/decimal
        # column cannot wrongly prune — anything fancier must not
        # consult the bloom
        eqs = [
            f
            for f in pushed
            if isinstance(f, EqualTo)
            and f.attribute
            and isinstance(f.value, (str, int, float, bool))
        ]
        if eqs:
            blooms = _load_bloom_file(os.path.join(root, fragment.bloom_file))
            for f in eqs:
                b = blooms.get(f.attribute[0])
                if b and not lf.bloom_may_contain(b, f.value):
                    return False
    stats = fragment.stats or {}
    for f in pushed:
        rng = stats.get(f.attribute[0]) if f.attribute else None
        if not rng:
            continue
        mn, mx = rng
        try:
            if isinstance(f, EqualTo) and (f.value < mn or f.value > mx):
                return False
            if isinstance(f, GreaterThan) and mx <= f.value:
                return False
            if isinstance(f, GreaterThanOrEqual) and mx < f.value:
                return False
            if isinstance(f, LessThan) and mn >= f.value:
                return False
            if isinstance(f, LessThanOrEqual) and mn > f.value:
                return False
            if isinstance(f, In) and all(v < mn or v > mx for v in f.value):
                return False
        except TypeError:
            continue  # incomparable types (e.g. timestamp vs str): keep
    return True


def _partition_colmap(manifest: "lf.Manifest", f: "lf.Fragment") -> tuple | None:
    """Per-fragment field-id resolution map for a scan partition
    (r13). None = by-name fast path: legacy fragments, and the
    identity case (every physically-present current field sits
    under its own name AND no dead same-named column shadows a
    current field) — which keeps parquet-level filter pushdown on
    the overwhelmingly common un-renamed dataset."""
    cm = manifest.colmap(f)
    if cm is None:
        return None
    identity = all(k == v for k, v in cm.items()) and all(
        (n in cm) == (n in f.field_ids) for n in manifest.field_ids
    )
    return None if identity else tuple(cm.items())


def _read_fragment_by_id(
    root: str,
    frag: "lf.Fragment",
    schema: StructType,
    pushed: list[Filter],
    cm: dict,
):
    """The stable-field-id spelling of ``_read_fragment_evolved``
    (r13, RENAME COLUMN support): ``cm`` maps current field names to
    this fragment's PHYSICAL column names; current fields absent
    from ``cm`` are typed-NULL-filled even if the file carries a
    same-named column (its id is dead — the re-add case). Columns
    are read pruned by physical name, renamed to current names, and
    pushed filters are evaluated post-rename in current-name space —
    row-group-level pushdown is traded away only for the rare
    renamed fragment (the identity fast path keeps it)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from pyspark.sql.pandas.types import to_arrow_schema

    want = schema.fieldNames()
    target = to_arrow_schema(schema)
    # DEFENSIVE (r13 advice): with today's one caller, pushed filter
    # attributes always name reader-schema columns, so absent_only is
    # always empty and `extra` below never fires — Spark prunes the
    # read schema to (projection ∪ filter columns) before handing us
    # the plan. The branches guard a future caller that pushes
    # filters outside the projected schema (the evolved-read path
    # below genuinely needs them); mirroring it keeps the two
    # resolution paths drop-in equivalent.
    absent_only = [
        f
        for f in pushed
        if f.attribute
        and f.attribute[0] not in cm
        and f.attribute[0] not in want
    ]
    if any(not isinstance(f, IsNull) for f in absent_only):
        return target.empty_table()
    eff_pushed = [f for f in pushed if f not in absent_only]
    extra = [
        c
        for c in dict.fromkeys(
            f.attribute[0] for f in eff_pushed if f.attribute
        )
        if c not in want and c in cm
    ]
    read_want = want + extra
    phys = [cm[c] for c in read_want if c in cm]
    # ALWAYS an explicit (possibly empty) projection — `phys or
    # None` would read the FULL physical row width when no wanted
    # field is present in this fragment (pyarrow keeps num_rows for
    # columns=[]), and a dead physical column outside cm would then
    # KeyError the rename below (r13 review finding)
    table = lf.read_fragment(root, frag, columns=phys)
    rev = {v: k for k, v in cm.items()}
    table = table.rename_columns([rev[c] for c in table.column_names])
    for name in want:
        if name not in table.column_names:
            fld = target.field(target.get_field_index(name))
            table = table.append_column(
                fld, pa.nulls(table.num_rows, fld.type)
            )
    filter_expr = _to_arrow_filter(eff_pushed)
    if filter_expr is not None:
        table = pads.dataset(table).to_table(filter=filter_expr)
    return table.select(want)


def _read_fragment_evolved(
    root: str,
    frag: "lf.Fragment",
    schema: StructType,
    pushed: list[Filter],
    colmap: tuple | None = None,
):
    """Deletion-aware fragment read that also honors schema
    evolution: columns added after this fragment was written (or
    omitted by a mergeSchema append) are filled with typed NULLs,
    and pushed filters are then applied over the filled table so
    their NULL semantics stay exact (a value predicate on an absent
    column keeps nothing; IS NULL keeps everything). With ``colmap``
    set, resolution runs by stable field id instead of by name (see
    ``_read_fragment_by_id``)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    if colmap is not None:
        return _read_fragment_by_id(
            root, frag, schema, pushed, dict(colmap)
        )

    want = schema.fieldNames()
    file_names = set(
        io.read_parquet_schema(os.path.join(root, frag.file)).names
    )
    # a FULLY-CONSUMED filter may reference a column Spark pruned
    # from the projection (r8 review finding — the deletion-aware
    # and null-fill paths filtered AFTER projecting and crashed on
    # the absent field). Three cases:
    #  - filter column in the file: decode it too, filter, project
    #    back to `want`;
    #  - filter column absent from the file AND from `want`: its
    #    value is NULL on every row of this fragment, so any value
    #    predicate / IS NOT NULL matches nothing (return empty) and
    #    IS NULL matches everything (drop the filter);
    #  - filter column absent but in `want`: the existing null-fill
    #    path already evaluates it with exact NULL semantics.
    absent_only = [
        f
        for f in pushed
        if f.attribute
        and f.attribute[0] not in file_names
        and f.attribute[0] not in want
    ]
    if any(not isinstance(f, IsNull) for f in absent_only):
        return to_arrow_schema(schema).empty_table()
    eff_pushed = [f for f in pushed if f not in absent_only]
    extra = [
        c
        for c in dict.fromkeys(
            f.attribute[0] for f in eff_pushed if f.attribute
        )
        if c not in want and c in file_names
    ]
    read_want = want + extra
    present = [c for c in read_want if c in file_names]
    missing = [c for c in read_want if c not in file_names]  # subset of want
    filter_expr = _to_arrow_filter(eff_pushed)
    if not missing:
        table = lf.read_fragment(
            root, frag, columns=present or None, filter_expr=filter_expr
        )
        return table.select(want) if extra else table
    table = lf.read_fragment(root, frag, columns=present or None)
    target = to_arrow_schema(schema)
    for name in missing:
        fld = target.field(target.get_field_index(name))
        table = table.append_column(
            fld, pa.nulls(table.num_rows, fld.type)
        )
    if filter_expr is not None:
        import pyarrow.dataset as pads

        table = pads.dataset(table).to_table(filter=filter_expr)
    return table.select(want)


class LanceScanReader(DataSourceReader):
    """NOTE (Spark 4.1 Python-DS limitation): Spark plans a python
    data source scan lazily ONCE per relation node and caches the
    resulting partitions+read function — so a single ``load()``ed
    DataFrame reused across actions with *different* filters will
    replay the first action's pushed filters. Always take a fresh
    ``spark.read.format("lance").load(path)`` per logical query (all
    our operators do; regression-tested in
    tests/test_lance_source.py::test_fresh_load_per_query_pattern).
    """

    def __init__(
        self,
        root: str,
        schema: StructType,
        version: int | None,
        begin_version: int | None = None,
        fragment_files: set[str] | None = None,
        accept_filters: bool = True,
    ):
        self.root = root
        self.schema = schema
        self.accept_filters = accept_filters
        self.manifest = lf.read_manifest(root, version)
        if fragment_files is not None:
            # explicit fragment allowlist (scalar-index scans): the
            # caller asserts only these fragments can match. Unknown
            # names mean the allowlist came from a different dataset
            # version — fail instead of scanning the wrong subset.
            known = {f.file for f in self.manifest.fragments}
            bad = sorted(fragment_files - known)
            if bad:
                raise lf.LanceDatasetError(
                    f"fragment_files not in manifest: {bad[:3]} "
                    "(stale index? rebuild against the current version)"
                )
            self.manifest = dataclasses.replace(
                self.manifest,
                fragments=[
                    f
                    for f in self.manifest.fragments
                    if f.file in fragment_files
                ],
            )
        if begin_version is not None:
            # CDC / incremental read: scan only fragments ADDED after
            # ``begin_version`` (fragments are immutable, appends only
            # add — so the file-name diff IS the row diff). A rewrite
            # in between (delete/upsert/compact) breaks append-only
            # lineage and the diff would be wrong — fail loudly.
            begin = lf.read_manifest(root, begin_version)
            # the (file, deletion_file, num_deleted) identity rule
            # lives in ONE shared helper (lance_format) — see its
            # docstring for why name-only survival is not enough
            gone = lf.append_only_violations(begin, self.manifest)
            if gone:
                raise ValueError(
                    "begin_version diff requires append-only history: "
                    f"fragments {gone[:3]} from version {begin_version} "
                    "were rewritten or had rows deleted (delete/upsert/"
                    "compact ran in between); full-scan the end "
                    "version instead"
                )
            old_files = {f.file for f in begin.fragments}
            self.manifest = dataclasses.replace(
                self.manifest,
                fragments=[
                    f
                    for f in self.manifest.fragments
                    if f.file not in old_files
                ],
            )
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        if not self.accept_filters:
            # multi-reference-safe mode (see DataSource.reader): keep
            # every filter on Spark's side; nothing in partitions()
            # or read() may then depend on any one position's filters
            yield from filters
            return
        # assign, never append: Spark may reuse this reader across
        # plannings of DataFrames derived from one load(); appending
        # would accumulate filters from earlier queries
        fc = _float_cols(self.schema)
        self.pushed = [f for f in filters if _pushable(f, fc)]
        for f in filters:
            if not _pushable(f, fc):
                yield f  # Spark keeps evaluating these

    def _colmap_for(self, f) -> tuple | None:
        return _partition_colmap(self.manifest, f)

    def partitions(self):
        # fragment-level data skipping: drop fragments whose zone map
        # ([min,max] per column, recorded at write time) proves the
        # pushed filters can never match — at 100 TB this turns a
        # range query over a sorted/partitioned table into a scan of
        # only the overlapping fragments, before any IO is issued.
        import dataclasses as _dc

        kept = []
        for f in self.manifest.fragments:
            cm = self._colmap_for(f)
            prune = self.pushed
            if cm is not None:
                # zone-map/bloom keys are PHYSICAL names: translate
                # the pushed attributes per fragment; filters on
                # fields absent from the fragment are skipped for
                # pruning (conservative — the read path produces the
                # exact empty/null-filled result anyway)
                cmd = dict(cm)
                prune = [
                    _dc.replace(flt, attribute=(cmd[flt.attribute[0]],))
                    for flt in self.pushed
                    if flt.attribute and flt.attribute[0] in cmd
                ]
            if _fragment_may_match(f, prune, self.root):
                kept.append((f, cm))
        if not kept:
            # everything pruned: one sentinel empty partition (Spark
            # calls read(None) if the partition list is empty)
            return [FragmentPartition(self.root, "", 0)]
        return [
            FragmentPartition(
                self.root,
                f.file,
                f.num_rows,
                f.deletion_file,
                tuple(self.pushed),
                cm,
            )
            for f, cm in kept
        ]

    def __getstate__(self):
        # the reader is pickled into the executor-side read command;
        # read() needs only schema + pushed filters, while the
        # manifest (every fragment + zone-map stats — tens of MB at
        # the 100k-fragment scale) is driver-only state. Exclude it
        # (r5 review finding).
        state = dict(self.__dict__)
        state["manifest"] = None
        return state

    def read(self, partition: FragmentPartition) -> Iterator["pa.RecordBatch"]:
        if not partition.file:  # sentinel: all fragments pruned
            return
        table = _read_fragment_evolved(
            partition.root,
            lf.Fragment(
                -1,
                partition.file,
                partition.num_rows,
                deletion_file=partition.deletion_file,
            ),
            self.schema,
            # partition-bound, NEVER self.pushed — see FragmentPartition
            list(partition.pushed),
            partition.colmap,
        )
        yield from table.to_batches()


@dataclass
class NativeFragmentPartition(InputPartition):
    root: str
    files: tuple  # data-file relative paths for one fragment
    version: int
    # planning-time filters, partition-bound for the same shared-
    # reader-state reason as FragmentPartition.pushed
    pushed: tuple = ()


class NativeScanReader(DataSourceReader):
    """Fragment-parallel scan of a *genuine* Lance dataset (protobuf
    manifests + v2 ``.lance`` files), decoded by
    ``lance_native.read_data_file`` — the reference's
    ``Dataset::open`` + scanner surface (rust/lib.rs:26-51,
    rust/scanner.rs:1-38) without requiring the ``lance`` wheel.
    Column pruning reaches the page decoder (only requested columns'
    pages are decoded); pushed filters are applied per-batch with the
    same pyarrow expressions as the JSON-store reader."""

    def __init__(
        self,
        root: str,
        schema: StructType,
        version: int | None,
        accept_filters: bool = True,
    ):
        self.root = root
        self.schema = schema
        self.accept_filters = accept_filters
        self.manifest = ln.open_dataset(root, version)
        # refuse datasets with Lance deletion files up front: this
        # decoder has no deletion-mask support, and scanning the data
        # files alone would silently resurrect deleted rows (r5
        # review finding)
        ln._refuse_deletions(self.manifest, root)
        # column-split fragments would be concatenated vertically by
        # the per-file loop below — refuse with the accurate reason
        ln._refuse_multi_file_fragments(self.manifest, root)
        # computed once driver-side and pickled to executors: every
        # partition shares one manifest version, so tasks must not
        # re-open and re-parse the protobuf manifest per fragment
        # (r5 review finding — 100k redundant manifest reads per
        # query at the stated scale)
        self._arrow_schema = self.manifest.arrow_schema()
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        if not self.accept_filters:
            # multi-reference-safe mode — see DataSource.reader
            yield from filters
            return
        fc = _float_cols(self.schema)
        self.pushed = [f for f in filters if _pushable(f, fc)]
        for f in filters:
            if not _pushable(f, fc):
                yield f

    def partitions(self):
        parts = [
            NativeFragmentPartition(
                self.root,
                tuple(df.path for df in frag.files),
                self.manifest.version,
                tuple(self.pushed),
            )
            for frag in self.manifest.fragments
        ]
        return parts or [NativeFragmentPartition(self.root, (), 0)]

    def __getstate__(self):
        # executor tasks need only the precomputed arrow schema +
        # pushed filters; the parsed manifest stays driver-only
        state = dict(self.__dict__)
        state["manifest"] = None
        return state

    def read(
        self, partition: NativeFragmentPartition
    ) -> Iterator["pa.RecordBatch"]:
        if not partition.files:
            return
        arrow_schema = self._arrow_schema
        # partition-bound, NEVER self.pushed — see FragmentPartition
        pushed = list(partition.pushed)
        columns = [
            c for c in self.schema.fieldNames() if c in arrow_schema.names
        ]
        # a fully-consumed filter may reference a column Spark pruned
        # from the projection — decode it too, filter, then project
        # back to the requested columns (r8 review: table.filter on
        # the pruned table raised field-not-found)
        filter_cols = [
            f.attribute[0]
            for f in pushed
            if f.attribute
            and f.attribute[0] in arrow_schema.names
            and f.attribute[0] not in columns
        ]
        read_cols = (columns + filter_cols) if columns else None
        filter_expr = _to_arrow_filter(pushed)
        for rel in partition.files:
            table = ln.read_data_file(
                os.path.join(partition.root, "data", rel),
                arrow_schema,
                columns=read_cols,
            )
            if filter_expr is not None:
                table = table.filter(filter_expr)
            if filter_cols and columns:
                table = table.select(columns)
            yield from table.to_batches()


class LanceArrowWriter(DataSourceArrowWriter):
    """Per-task fragment writes + driver-side atomic version commit
    (the reference's create_writer/write_batch/finish protocol,
    rust/writer.rs)."""

    def __init__(
        self,
        root: str,
        schema: StructType,
        overwrite: bool,
        compression: str = "snappy",
        merge_schema: bool = False,
        bloom_columns: list[str] | None = None,
        expected_version: int | None = None,
    ):
        self.root = root
        self.schema = schema
        self.overwrite = overwrite
        self.compression = compression
        self.merge_schema = merge_schema
        self.bloom_columns = bloom_columns
        # .option("expectedVersion", N): optimistic-concurrency gate
        # for read-modify-write maintenance jobs (OPTIMIZE) — the
        # commit refuses if another writer advanced the head since
        # the maintenance read it, instead of silently dropping the
        # concurrent writer's rows from the overwrite
        self.expected_version = expected_version
        io.makedirs(root)

    def write(self, iterator: Iterator["pa.RecordBatch"]) -> LanceCommitMessage:
        import pyarrow as pa

        batches = list(iterator)
        if not batches:
            return LanceCommitMessage(file="", num_rows=0)
        table = pa.Table.from_batches(batches)
        frag = lf.write_fragment(
            self.root,
            table,
            compression=self.compression,
            bloom_columns=self.bloom_columns,
        )
        return LanceCommitMessage(
            file=frag.file,
            num_rows=frag.num_rows,
            stats=frag.stats,
            bloom_file=frag.bloom_file,
        )

    def commit(self, messages):
        frags = [
            lf.Fragment(
                -1,
                m.file,
                m.num_rows,
                getattr(m, "stats", None),
                bloom_file=getattr(m, "bloom_file", None),
            )
            for m in messages
            if m is not None and m.file
        ]
        lf.commit(
            self.root,
            self.schema.json(),
            frags,
            mode="overwrite" if self.overwrite else "append",
            merge_schema=self.merge_schema,
            expected_version=self.expected_version,
        )

    def abort(self, messages):
        for m in messages:
            if m is not None and m.file:
                for rel in (m.file, getattr(m, "bloom_file", None)):
                    if not rel:
                        continue
                    try:
                        io.remove(os.path.join(self.root, rel))
                    except OSError:
                        pass


class LanceStreamReader(DataSourceStreamReader):
    """Micro-batch scan: each batch covers fragments appended since
    the last committed offset (reference's stream scan,
    rust/lib.rs:148-188, generalized to a resumable offset)."""

    def __init__(
        self,
        root: str,
        schema: StructType,
        max_fragments_per_trigger: int | None = None,
        cap_first_batch: bool = False,
    ):
        self.root = root
        self.schema = schema
        # Rate control (.option("maxFragmentsPerTrigger", N)): a
        # backlog of appended fragments drains in ceil(backlog/N)
        # micro-batches instead of one giant batch — at scale a
        # restart after hours of appends must not plan a batch whose
        # state update dwarfs executor memory. Advisory cap, never
        # correctness: the offset sequence is the same append-only
        # fragment-position log, just advanced in smaller steps, so
        # watermarks/exactly-once behave identically (asserted in
        # tests/test_streaming.py).
        self.max_fragments_per_trigger = max_fragments_per_trigger
        # Highest fragment position this reader KNOWS is already
        # planned/committed. The Python DS API's latestOffset() does
        # not receive the start offset, so after a restart with a
        # fully-committed checkpoint the first trigger has no floor
        # knowledge and returns the FULL backlog uncapped (capping
        # blind would regress below the checkpoint and replay);
        # every subsequent trigger is capped. None = no knowledge.
        self._floor: int | None = None
        # Whether latestOffset has been called this run. The FIRST
        # call is uncapped BY DEFAULT — a deliberate trade-off:
        # under trigger(availableNow=True) Spark pins the run's end
        # target from that single snapshot and terminates there, so
        # a capped first answer would strand backlog beyond the cap
        # when the query stops (r5 ADVICE). The cost is that a
        # processing-time stream started fresh over a large backlog
        # plans the whole backlog in batch one — the giant-batch
        # scenario the cap exists to prevent. The Python DS API
        # cannot see the trigger type, so the escape hatch is the
        # explicit .option("capFirstBatch", true): processing-time
        # users opt in to a capped cold start (and must NOT combine
        # it with availableNow, which would strand backlog).
        self._latest_called = cap_first_batch

    def _frags(self) -> list[lf.Fragment]:
        try:
            return lf.read_manifest(self.root).fragments
        except lf.LanceDatasetError:
            return []

    @staticmethod
    def _prefix_sha(frags: list[lf.Fragment], n: int) -> str:
        import hashlib

        h = hashlib.sha256()
        for f in frags[:n]:
            h.update(f.file.encode())
            h.update(b"\n")
        return h.hexdigest()

    def initialOffset(self) -> dict:
        self._floor = 0
        return {"frag_count": 0, "prefix_sha": self._prefix_sha([], 0)}

    def latestOffset(self) -> dict:
        frags = self._frags()
        n = len(frags)
        if (
            self.max_fragments_per_trigger is not None
            and self._floor is not None
            and self._latest_called
        ):
            n = min(n, self._floor + self.max_fragments_per_trigger)
        self._latest_called = True
        return {
            "frag_count": n,
            "prefix_sha": self._prefix_sha(frags, n),
        }

    def partitions(self, start: dict, end: dict):
        # offsets are positions into an APPEND-ONLY fragment list —
        # the same contract as Spark's file-stream source — and carry
        # a hash of the ENTIRE consumed fragment-file prefix. If the
        # dataset was compacted/overwritten/upserted under a running
        # stream (fragment list shrank, OR any position in the
        # already-consumed prefix now names a different file — even
        # with count and last file unchanged), fail loudly rather
        # than silently skipping or replaying wrong fragments.
        # ONE manifest read serves both the offset check and the
        # per-fragment colmap: a second read could land on a version
        # committed in between (e.g. a RENAME), whose colmap would
        # resolve against names this stream's pinned schema predates
        try:
            man = lf.read_manifest(self.root)
        except lf.LanceDatasetError:
            man = None
        frags = man.fragments if man is not None else []
        if man is not None:
            # a RENAME/DROP committed under the running stream makes
            # a pinned column name vanish from the current schema —
            # the colmap below is keyed by CURRENT names, so the
            # stream would silently emit NULLs for the pinned name
            # (r13 review finding); fail loudly like the
            # compaction/overwrite case instead. ADDed columns are
            # fine: the pinned names remain a subset.
            current = set(man._field_names)
            gone = sorted(
                set(self.schema.fieldNames()) - current
            )
            if gone:
                raise lf.LanceDatasetError(
                    f"lance stream source: columns {gone} were "
                    "renamed or dropped under a running stream; "
                    "restart the query with a fresh checkpoint "
                    "against the current schema"
                )
        rewrite_msg = (
            "lance stream source: dataset was compacted/overwritten "
            "under a running stream; restart the query with a fresh "
            "checkpoint against the current version"
        )
        for off in (start, end):
            n = off["frag_count"]
            if n > len(frags):
                raise lf.LanceDatasetError(rewrite_msg)
            expected = off.get("prefix_sha")
            if expected is not None and self._prefix_sha(frags, n) != expected:
                raise lf.LanceDatasetError(rewrite_msg)
            # pre-r2 checkpoints carry last_file instead of prefix_sha
            legacy = off.get("last_file")
            if n > 0 and legacy is not None and frags[n - 1].file != legacy:
                raise lf.LanceDatasetError(rewrite_msg)
        window = frags[start["frag_count"] : end["frag_count"]]
        self._floor = max(
            self._floor or 0, start["frag_count"], end["frag_count"]
        )
        return [
            FragmentPartition(
                self.root,
                f.file,
                f.num_rows,
                f.deletion_file,
                (),
                _partition_colmap(man, f) if man is not None else None,
            )
            for f in window
        ]

    def read(self, partition: FragmentPartition) -> Iterator["pa.RecordBatch"]:
        table = _read_fragment_evolved(
            partition.root,
            lf.Fragment(
                -1,
                partition.file,
                partition.num_rows,
                deletion_file=partition.deletion_file,
            ),
            self.schema,
            [],
            partition.colmap,
        )
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        self._floor = max(self._floor or 0, end["frag_count"])

    def stop(self) -> None:
        pass


class LanceStreamWriter(DataSourceStreamWriter):
    """writeStream sink: one fragment per task per epoch, one
    dataset version committed per epoch.

    Exactly-once: epoch replay detection is keyed on (txn_id,
    batchId). Pass a stable ``.option("txnAppId", ...)`` to get
    dedup across query restarts from the same checkpoint (the Delta
    txnAppId pattern); without it each started query gets a fresh
    txn id — replays within the run are deduped, and a NEW query
    writing to the same dataset can never have its data silently
    discarded."""

    def __init__(
        self,
        root: str,
        schema: StructType,
        txn_id: str | None = None,
        compression: str = "snappy",
        overwrite: bool = False,
    ):
        import uuid as _uuid

        self.root = root
        self.schema = schema
        self.txn_id = txn_id or _uuid.uuid4().hex
        self.compression = compression
        # Spark passes overwrite=True for truncate-style output modes
        # (outputMode('complete')): each epoch must REPLACE the
        # previous result, not append to it — dropping the flag would
        # silently accumulate one full copy of the aggregate per
        # micro-batch (r5 review finding). Honored as one OVERWRITE
        # commit per epoch; a replayed complete epoch rewrites the
        # same recomputed content, so replays stay correct.
        self.overwrite = overwrite
        io.makedirs(root)

    def write(self, iterator) -> LanceCommitMessage:
        import pyarrow as pa

        rows = list(iterator)
        if not rows:
            return LanceCommitMessage(file="", num_rows=0)
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        cols = {
            f.name: [r[i] for r in rows]
            for i, f in enumerate(self.schema.fields)
        }
        table = pa.Table.from_pydict(cols, schema=arrow_schema)
        frag = lf.write_fragment(self.root, table, compression=self.compression)
        return LanceCommitMessage(
            file=frag.file, num_rows=frag.num_rows, stats=frag.stats
        )

    def commit(self, messages, batchId: int) -> None:
        frags = [
            lf.Fragment(-1, m.file, m.num_rows, getattr(m, "stats", None))
            for m in messages
            if m is not None and m.file
        ]
        # idempotent under checkpoint replay: a re-committed APPEND
        # epoch of THIS transaction is dropped, so restarts cannot
        # double-append; complete-mode epochs overwrite, which is
        # idempotent by construction
        lf.commit(
            self.root,
            self.schema.json(),
            frags,
            mode="overwrite" if self.overwrite else "append",
            stream_batch_id=batchId,
            stream_txn_id=self.txn_id,
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.file:
                try:
                    io.remove(os.path.join(self.root, m.file))
                except OSError:
                    pass


class LanceDataSource(DataSource):
    """``spark.read.format("lance").option("version", N).load(path)``"""

    @classmethod
    def name(cls) -> str:
        return "lance"

    def _root(self) -> str:
        path = self.options.get("path")
        if not path:
            raise lf.LanceDatasetError(
                f"lance: 'path' is required (options: "
                f"{sorted(self.options.keys())})"
            )
        # SQL DDL (CREATE TABLE ... USING lance OPTIONS (path ...))
        # hands the path back as a resolved file: URI — normalize to
        # a local filesystem path
        if path.startswith("file://"):
            path = path[len("file://") :]
        elif path.startswith("file:"):
            path = path[len("file:") :]
        return path

    def _version(self) -> int | None:
        v = self.options.get("version")
        return int(v) if v is not None else None

    def schema(self) -> StructType:
        root = self._root()
        if ln.is_native_dataset(root):
            from pyspark.sql.pandas.types import from_arrow_schema

            man = ln.open_dataset(root, self._version())
            return self._project(from_arrow_schema(man.arrow_schema()))
        manifest = lf.read_manifest(root, self._version())
        import json

        return self._project(
            StructType.fromJson(json.loads(manifest.schema_json))
        )

    def _project(self, full: StructType) -> StructType:
        """``.option("columns", "a,b")`` — EXPLICIT projection
        pushdown (r13). Spark 4.1 plans Python data sources without
        handing the reader its column pruning, so by default every
        scan decodes the full row width even under a narrow
        ``select``; this option narrows the reader's schema itself,
        and the fragment read paths (which read exactly
        ``schema.fieldNames()`` plus pushed-filter columns) then skip
        the unlisted columns' bytes entirely — the difference between
        reading ids+labels and dragging a 64-float embedding column
        through a filter-ids scan. Unknown names are refused loudly;
        listed order is the output order (projection semantics)."""
        cols = self.options.get("columns")
        if cols is None:
            return full
        want = [c.strip() for c in cols.split(",") if c.strip()]
        by_name = {f.name: f for f in full.fields}
        unknown = [c for c in want if c not in by_name]
        if unknown:
            raise lf.LanceDatasetError(
                f"columns option names unknown columns {unknown}; "
                f"dataset columns: {list(by_name)}"
            )
        if not want:
            raise lf.LanceDatasetError("columns option is empty")
        return StructType([by_name[c] for c in want])

    def _begin_version(self) -> int | None:
        v = self.options.get("begin_version", self.options.get("beginversion"))
        return None if v is None else int(v)

    def reader(self, schema: StructType) -> DataSourceReader:
        root = self._root()
        # .option("filterPushdown", "false"): decline every offered
        # filter so Spark keeps its own Filter nodes. REQUIRED for
        # any relation that can appear at multiple plan positions
        # with different derived filters (a long-lived temp view, or
        # any frame the optimizer may clone — constant-key semi
        # joins, semi joins pushed through unions): Spark 4.1 plans
        # a Python-DS relation ONCE per relation instance and serves
        # every position from that single scan, so an accepted
        # filter from one position silently over-filters the others
        # (observed r9). catalog.register_lance_views / lance_sql
        # set this; direct load() keeps pushdown (fresh relation per
        # load, single-position use — the documented DataFrame rule).
        accept = str(
            self.options.get(
                "filterPushdown",
                self.options.get("filterpushdown", "true"),
            )
        ).lower() != "false"
        if ln.is_native_dataset(root):
            if self._begin_version() is not None:
                raise lf.LanceDatasetError(
                    "begin_version incremental reads are not supported "
                    "on native-encoded lance datasets"
                )
            return NativeScanReader(
                root, schema, self._version(), accept_filters=accept
            )
        ff = self.options.get("fragment_files", self.options.get("fragmentfiles"))
        return LanceScanReader(
            root,
            schema,
            self._version(),
            self._begin_version(),
            set(ff.split(",")) if ff else None,
            accept_filters=accept,
        )

    def writer(self, schema: StructType, overwrite: bool) -> LanceArrowWriter:
        if self.options.get("columns"):
            raise lf.LanceDatasetError(
                "'columns' is a read-side projection option; a write "
                "through a narrowed schema would silently drop the "
                "unlisted columns — remove the option"
            )
        if ln.is_native_dataset(self._root()):
            raise lf.LanceDatasetError(
                "writing into a dataset created by Lance proper is not "
                "supported (this connector writes its own JSON-manifest "
                "store); copy into a new path or use the lance wheel"
            )
        # .option("compression", "zstd"|"snappy"|"gzip"|"none")
        # .option("mergeSchema", "true") for schema-evolving appends
        bloom = self.options.get(
            "bloom_columns", self.options.get("bloomcolumns")
        )
        ev = self.options.get(
            "expectedVersion", self.options.get("expectedversion")
        )
        return LanceArrowWriter(
            self._root(),
            schema,
            overwrite,
            bloom_columns=bloom.split(",") if bloom else None,
            expected_version=int(ev) if ev is not None else None,
            compression=self.options.get("compression", "snappy"),
            merge_schema=str(
                self.options.get("mergeschema", "false")
            ).lower()
            == "true",
        )

    def streamReader(self, schema: StructType) -> LanceStreamReader:
        if ln.is_native_dataset(self._root()):
            raise lf.LanceDatasetError(
                "streaming reads of a Lance-proper dataset are not "
                "supported without the lance wheel; batch reads are"
            )
        mfpt = self.options.get(
            "maxFragmentsPerTrigger",
            self.options.get("maxfragmentspertrigger"),
        )
        cap_first = str(
            self.options.get(
                "capFirstBatch", self.options.get("capfirstbatch", "false")
            )
        ).lower() == "true"
        if cap_first and mfpt is None:
            # refuse loudly: with no per-trigger cap there is nothing
            # to cap the first batch WITH — silently ignoring the
            # option would hand the user the exact giant cold-start
            # batch they asked to avoid
            raise lf.LanceDatasetError(
                "capFirstBatch requires maxFragmentsPerTrigger"
            )
        return LanceStreamReader(
            self._root(),
            schema,
            max_fragments_per_trigger=int(mfpt) if mfpt is not None else None,
            cap_first_batch=cap_first,
        )

    def streamWriter(self, schema: StructType, overwrite: bool) -> LanceStreamWriter:
        return LanceStreamWriter(
            self._root(),
            schema,
            txn_id=self.options.get("txnappid"),
            compression=self.options.get("compression", "snappy"),
            overwrite=overwrite,
        )


def register(spark) -> None:
    """Idempotent registration of the 'lance' format on a session."""
    registered = getattr(spark, "_lance_duckdb_spark_registered", False)
    if not registered:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        spark.dataSource.register(LanceDataSource)
        spark._lance_duckdb_spark_registered = True

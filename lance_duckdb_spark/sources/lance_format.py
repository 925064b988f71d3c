"""Lance dataset model: versioned manifests over immutable fragments.

Parity with the reference's on-disk model (test/test_data.lance):
``_versions/{N}.manifest`` carries the table state at version N;
``data/`` holds immutable fragment files; a write commits by
publishing the next manifest (reference: rust/lib.rs:26-51 open via
manifest, rust/writer.rs finish() commits a version). We keep that
exact commit protocol — fragments first, then an atomic
rename-into-place of the manifest, so readers never observe a
partial version — with two deliberate differences:

- Fragment payload encoding is parquet (Arrow-native, splittable,
  column-pruned + predicate-pushed by pyarrow) instead of the
  proprietary ``.lance`` v2 page encoding. Reading genuine ``.lance``
  fragments would require the `lance` wheel (not in this
  environment); see `read_fragment` which tries it first.
- Manifests are JSON (schema stored as Spark DDL + Arrow schema
  JSON) instead of protobuf.

At 100 TB: fragments target ~512 MB, so a table is O(100k)
fragments; the manifest lists them once and every scan plans one
Spark input partition per fragment — embarrassingly parallel on a
1000-executor cluster, with per-fragment row counts enabling
size-based coalescing.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from . import iolayer as io

MANIFEST_DIR = "_versions"
DATA_DIR = "data"
DELETION_DIR = "_deletions"


class LanceDatasetError(Exception):
    pass


@dataclass
class Fragment:
    id: int
    file: str  # relative path under the dataset root
    num_rows: int  # PHYSICAL rows in the file (before deletions)
    # zone map: {col: [min, max]} for primitive columns, computed at
    # write time from the arrow data — lets the scan planner drop
    # whole fragments against pushed range/equality filters before
    # any IO. JSON-safe values only (numbers/strings/bools).
    stats: dict | None = None
    # deletion vector (Lance format's deletion files, _deletions/):
    # relative path of a file listing deleted row POSITIONS within
    # this fragment. The fragment file itself is untouched — a
    # delete is O(matching rows) metadata, not an O(fragment bytes)
    # rewrite. None = no deletions. Zone maps stay valid (deletion
    # only removes rows, min/max remain conservative bounds).
    deletion_file: str | None = None
    num_deleted: int = 0
    # bloom side file (_blooms/<fragment>.json): per-column bloom
    # filters recorded at WRITE time — equality pruning for columns
    # whose values are uncorrelated with layout (zone maps only help
    # clustered columns). Written with the fragment, so unlike an
    # external index it can never go stale.
    bloom_file: str | None = None
    # stable-field-id map (r13 — the rust/types.rs field model that
    # makes RENAME COLUMN metadata-only): {physical column name in
    # THIS file -> stable field id}, stamped by commit() from the
    # write schema. Readers resolve the CURRENT schema's fields to
    # physical columns BY ID (Manifest.colmap), so a renamed field
    # still reads its old bytes and a re-added name can never
    # surface a dead column's bytes. None = legacy fragment
    # (pre-r13): resolved by name, protected by the tombstone
    # lifecycle.
    field_ids: dict | None = None

    @property
    def live_rows(self) -> int:
        return self.num_rows - self.num_deleted

    def to_json(self) -> dict:
        d = {
            "id": self.id,
            "file": self.file,
            "num_rows": self.num_rows,
            "stats": self.stats,
        }
        if self.deletion_file is not None:
            d["deletion_file"] = self.deletion_file
            d["num_deleted"] = self.num_deleted
        if self.bloom_file is not None:
            d["bloom_file"] = self.bloom_file
        if self.field_ids is not None:
            d["field_ids"] = self.field_ids
        return d

    @staticmethod
    def from_json(d: dict) -> "Fragment":
        return Fragment(
            d["id"],
            d["file"],
            d["num_rows"],
            d.get("stats"),
            d.get("deletion_file"),
            d.get("num_deleted", 0),
            d.get("bloom_file"),
            d.get("field_ids"),
        )


@dataclass
class Manifest:
    version: int
    schema_json: str  # Spark StructType JSON
    fragments: list[Fragment] = field(default_factory=list)
    # streaming-sink transaction watermarks: {txn_id: max committed
    # batch_id} — one slot PER transaction id (the Delta `txn` action
    # pattern), so two streaming queries interleaving appends to one
    # dataset each dedupe replays against their OWN watermark. Replay
    # of an epoch <= the txn's watermark is a no-op (exactly-once
    # under checkpoint recovery when the sink has a stable txnAppId);
    # an unknown txn id always commits.
    stream_txns: dict = field(default_factory=dict)
    # tombstones for DROPPED column names (ALTER TABLE DROP COLUMN —
    # a metadata-only drop): pre-drop fragments still physically
    # carry the column, and the null-filling scan path reads by
    # NAME, so re-adding a tombstoned name would silently surface
    # the OLD bytes (possibly the wrong type) for pre-drop rows.
    # Each entry is {"name": <col>, "at_version": <drop version>};
    # commit() clears an entry exactly when the new fragment set
    # shares NO file with the drop-time manifest (every pre-drop
    # file rewritten under the committed schema — the bytes are
    # provably gone; all rewrite paths conform to it). A vacuumed
    # drop-time manifest keeps the tombstone (conservative).
    dropped_columns: list = field(default_factory=list)
    # stable field ids (r13): {current field name -> id}. Ids are
    # assigned once per name lineage and never reused
    # (next_field_id is monotonic), so RENAME is a key change here
    # and a re-added name gets a FRESH id — by-id fragments then
    # provably null-fill it. None = dataset predates field ids
    # (bootstrapped on its next commit; its old fragments stay
    # name-resolved).
    field_ids: dict | None = None
    next_field_id: int = 0

    @property
    def dropped_names(self) -> set:
        return {
            e["name"] if isinstance(e, dict) else e
            for e in self.dropped_columns
        }

    @property
    def _field_names(self) -> list:
        """Top-level field names, parsed once per Manifest object —
        colmap runs per FRAGMENT at scan planning, and re-parsing
        schema_json 100k times for a 100k-fragment dataset would be
        a planning-time bottleneck of this module's own making."""
        cached = getattr(self, "_field_names_cache", None)
        if cached is None:
            cached = [
                f["name"] for f in json.loads(self.schema_json)["fields"]
            ]
            object.__setattr__(self, "_field_names_cache", cached)
        return cached

    def colmap(self, frag: Fragment) -> dict | None:
        """{current field name -> physical column name in ``frag``},
        resolved by stable field id, in current-schema order; fields
        absent from the dict are NOT in the fragment (typed-NULL
        fill) even when a same-named physical column exists (that
        column's id is dead — the re-add case). None when either
        side predates field ids: the caller must fall back to
        by-name resolution (today's behavior, tombstone-guarded)."""
        if self.field_ids is None or frag.field_ids is None:
            return None
        by_id = {v: k for k, v in frag.field_ids.items()}
        out = {}
        for name in self._field_names:
            phys = by_id.get(self.field_ids.get(name))
            if phys is not None:
                out[name] = phys
        return out

    def physical_mismatches(self) -> list[str]:
        """Fragment files whose PHYSICAL column names no longer
        line up with the current schema names (a rename happened, or
        a name was re-added over a dead column): any reader that
        resolves by name — ``spark.read.schema(committed).parquet``,
        take-by-position fetches — would silently read NULLs or the
        WRONG column's bytes from these. Such paths must refuse
        until a rewrite (OPTIMIZE/compact) re-materializes the
        fragments under current names. Legacy (id-less) fragments
        are by-name by definition and never mismatch."""
        if self.field_ids is None:
            return []
        bad = []
        for fr in self.fragments:
            if fr.field_ids is None:
                continue
            rev = {v: k for k, v in fr.field_ids.items()}
            for name, fid in self.field_ids.items():
                phys = rev.get(fid)
                if (phys is not None and phys != name) or (
                    phys != name and name in fr.field_ids
                ):
                    bad.append(fr.file)
                    break
        return bad

    # convenience views used by tests/inspection
    @property
    def stream_txn_id(self) -> str | None:
        if not self.stream_txns:
            return None
        return max(self.stream_txns, key=lambda k: self.stream_txns[k])

    @property
    def stream_batch_id(self) -> int | None:
        if not self.stream_txns:
            return None
        return max(self.stream_txns.values())

    def to_json(self) -> dict:
        d = {
            "version": self.version,
            "schema_json": self.schema_json,
            "fragments": [f.to_json() for f in self.fragments],
            "stream_txns": self.stream_txns,
        }
        if self.dropped_columns:
            d["dropped_columns"] = sorted(
                self.dropped_columns, key=lambda e: e["name"]
            )
        if self.field_ids is not None:
            d["field_ids"] = self.field_ids
            d["next_field_id"] = self.next_field_id
        return d

    @staticmethod
    def from_json(d: dict) -> "Manifest":
        txns = d.get("stream_txns")
        if txns is None:
            # migrate the pre-r2 single-slot watermark
            txns = (
                {d["stream_txn_id"]: d["stream_batch_id"]}
                if d.get("stream_txn_id") is not None
                and d.get("stream_batch_id") is not None
                else {}
            )
        return Manifest(
            d["version"],
            d["schema_json"],
            [Fragment.from_json(f) for f in d["fragments"]],
            dict(txns),
            # normalize to ONE representation at the parse boundary
            # (r12 advice): a bare-string entry (hand-edited or
            # legacy manifest) becomes {"name", "at_version": None},
            # so to_json's sort key, dropped_names, and commit's
            # carry-forward all see dicts
            [
                e if isinstance(e, dict) else {"name": e, "at_version": None}
                for e in d.get("dropped_columns", [])
            ],
            d.get("field_ids"),
            d.get("next_field_id", 0),
        )


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"{version}.manifest")


def list_versions(root: str) -> list[int]:
    vdir = os.path.join(root, MANIFEST_DIR)
    if not io.isdir(vdir):
        return []
    out = []
    for name in io.listdir(vdir):
        if name.endswith(".manifest"):
            try:
                out.append(int(name[: -len(".manifest")]))
            except ValueError:
                continue
    return sorted(out)


def read_manifest(root: str, version: int | None = None) -> Manifest:
    versions = list_versions(root)
    if not versions:
        raise LanceDatasetError(f"not a lance dataset (no manifests): {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise LanceDatasetError(
            f"version {version} not found in {root}; have {versions}"
        )
    return Manifest.from_json(
        json.loads(io.read_text(_manifest_path(root, version)))
    )


def _json_safe(v):
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return None  # timestamps/decimals etc: skip from zone map


def footer_stats(path: str) -> tuple[int, dict]:
    """Row count + per-column ``[min, max]`` zone map of one parquet
    file, derived from its FOOTER statistics — a metadata-only read,
    no data pages touched. Same column policy as ``_column_stats``
    (int/float/string/bool; all-null columns skipped): parquet
    row-group stats are exact for these types, and where a writer
    truncates long string bounds the truncated values are still
    CONSERVATIVE (min' <= min, max' >= max per the parquet spec) —
    all zone-map pruning needs. Columns missing stats in any
    non-empty row group are skipped entirely (conservative: the
    fragment is never pruned on them). Used by the DML staging path
    (maintenance._stage_and_commit), where fragments are written by
    Spark's native parquet writer instead of the Python lance
    writer — the footer walk replaces the in-worker _column_stats
    pass."""
    import pyarrow.types as pat

    md = io.parquet_metadata(path)
    schema = md.schema.to_arrow_schema()
    eligible = {
        f.name
        for f in schema
        if pat.is_integer(f.type)
        or pat.is_floating(f.type)
        or pat.is_string(f.type)
        or pat.is_large_string(f.type)
        or pat.is_boolean(f.type)
    }
    mins: dict = {}
    maxs: dict = {}
    ok = dict.fromkeys(eligible, True)
    seen = dict.fromkeys(eligible, False)
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if not ok.get(name, False):
                continue
            st = col.statistics
            if st is None:
                ok[name] = False
                continue
            if st.null_count is not None and (
                g.num_rows - st.null_count
            ) == 0:
                continue  # all-null row group: contributes nothing
            if not st.has_min_max:
                ok[name] = False
                continue
            mn, mx = st.min, st.max
            mins[name] = mn if not seen[name] else min(mins[name], mn)
            maxs[name] = mx if not seen[name] else max(maxs[name], mx)
            seen[name] = True
    stats: dict = {}
    for c in eligible:
        if ok[c] and seen[c]:
            mn, mx = _json_safe(mins[c]), _json_safe(maxs[c])
            if mn is not None and mx is not None:
                stats[c] = [mn, mx]
    return md.num_rows, stats


def _column_stats(table: pa.Table) -> dict:
    """Per-column [min, max] zone map for primitive columns."""
    import pyarrow.compute as pc
    import pyarrow.types as pat

    stats: dict = {}
    for field in table.schema:
        t = field.type
        if not (
            pat.is_integer(t)
            or pat.is_floating(t)
            or pat.is_string(t)
            or pat.is_boolean(t)
        ):
            continue
        col = table.column(field.name)
        if col.null_count == len(col):
            continue
        mn = _json_safe(pc.min(col).as_py())
        mx = _json_safe(pc.max(col).as_py())
        if mn is not None and mx is not None:
            stats[field.name] = [mn, mx]
    return stats


def _arrow_schema(schema_json: str) -> pa.Schema:
    """Committed Spark StructType JSON → arrow schema (no active
    SparkSession needed; the converter is a pure function)."""
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    return to_arrow_schema(StructType.fromJson(json.loads(schema_json)))


BLOOM_DIR = "_blooms"
_BLOOM_BITS_PER_VALUE = 10  # ~1% false-positive rate
_BLOOM_K = 7
# Canonicalization format version, stamped into every bloom at write
# time. The hash-input canonicalization is PART of the side-file
# format: a probe computed under a different canonicalization than the
# writer used yields false NEGATIVES — the anti-conservative failure
# blooms must never have. v2 = repr(float(v)) for numerics (int 5 and
# float 5.0 hash identically); blooms written before the stamp existed
# (str(v) numerics) carry no "canon" key and are never probed.
_BLOOM_CANON_VERSION = 2


def _bloom_hashes(value) -> tuple[int, int]:
    """Two independent 64-bit hashes (double hashing) from the md5
    of the value's canonical string form.

    Canonicalization is part of the side-file format: NUMERICS
    (bool/int/float/Decimal) hash their repr(float(v)) so SQL's
    value-based equality survives type drift between the stored
    column and the pushed literal (int 5 probing a double column
    storing 5.0 must hit — str() agreement alone is
    anti-conservative the moment Catalyst stops folding the cast
    into the literal). Precision loss past 2^53 only MERGES hash
    inputs — conservative, never a wrong prune. Non-numerics keep
    str(); cross-type collisions there ("5" vs date) likewise only
    add false positives."""
    import decimal
    import hashlib

    if isinstance(value, (bool, int, float, decimal.Decimal)):
        canon = repr(float(value))
    else:
        canon = str(value)
    d = hashlib.md5(canon.encode()).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1


def build_bloom(values) -> dict:
    """{m, k, bits(base64)} over the distinct values (None skipped:
    IsNull is not an equality probe)."""
    import base64

    vals = {v for v in values if v is not None}
    m = max(64, _BLOOM_BITS_PER_VALUE * len(vals))
    bits = bytearray((m + 7) // 8)
    for v in vals:
        h1, h2 = _bloom_hashes(v)
        for i in range(_BLOOM_K):
            j = (h1 + i * h2) % m
            bits[j >> 3] |= 1 << (j & 7)
    return {
        "m": m,
        "k": _BLOOM_K,
        "canon": _BLOOM_CANON_VERSION,
        "bits": base64.b64encode(bytes(bits)).decode(),
    }


def bloom_may_contain(bloom: dict, value) -> bool:
    import base64

    if bloom.get("canon") != _BLOOM_CANON_VERSION:
        # written under a different (or pre-stamp) canonicalization:
        # probing it could false-negative, so never prune on it
        return True
    bits = base64.b64decode(bloom["bits"])
    m = bloom["m"]
    h1, h2 = _bloom_hashes(value)
    for i in range(bloom["k"]):
        j = (h1 + i * h2) % m
        if not bits[j >> 3] & (1 << (j & 7)):
            return False
    return True


def write_fragment(
    root: str,
    table: pa.Table,
    compression: str = "snappy",
    bloom_columns: list[str] | None = None,
) -> Fragment:
    """Write one immutable fragment file; the fragment is invisible
    until a manifest referencing it is committed. ``bloom_columns``
    additionally records a per-column bloom side file for equality
    pruning (see Fragment.bloom_file)."""
    name = f"{uuid.uuid4().hex}.parquet"
    rel = os.path.join(DATA_DIR, name)
    io.write_parquet(
        table, os.path.join(root, rel), compression=compression
    )
    bloom_rel = None
    # restrict blooms to types whose _bloom_hashes canonicalization
    # (repr(float) for numerics, str otherwise) is guaranteed
    # identical between the write path (pyarrow to_pylist values)
    # and the probe path (a Spark-pushed EqualTo literal): strings,
    # ints, floats, bools. Temporal values can render differently
    # (tz-aware vs naive datetimes), which would make a negative
    # bloom test ANTI-conservative — pruning a fragment that holds
    # matches. Skipped silently: blooms are an optimization, never
    # required for correctness.
    safe = (pa.types.is_string, pa.types.is_large_string,
            pa.types.is_integer, pa.types.is_floating,
            pa.types.is_boolean)
    wanted = [
        c
        for c in (bloom_columns or [])
        if c in table.column_names
        and any(ok(table.schema.field(c).type) for ok in safe)
    ]
    if wanted:
        import pyarrow.compute as pc

        # dedup in native code first: to_pylist() on the raw column
        # allocated one Python object per ROW before build_bloom's
        # set() collapsed them — O(rows) interpreter churn per write
        # task on low-cardinality columns (r8 review finding)
        blooms = {
            c: build_bloom(pc.unique(table.column(c)).to_pylist())
            for c in wanted
        }
        bloom_rel = os.path.join(BLOOM_DIR, name.replace(".parquet", ".json"))
        io.write_text(os.path.join(root, bloom_rel), json.dumps(blooms))
    return Fragment(
        id=-1,
        file=rel,
        num_rows=table.num_rows,
        stats=_column_stats(table),
        bloom_file=bloom_rel,
    )


def _merge_schemas(prev_json: str, new_json: str) -> str:
    """Schema evolution on append (Lance's add-column capability):
    fields present in both must match exactly (name, type, metadata);
    brand-new fields are appended to the dataset schema and read as
    NULL from pre-evolution fragments. Dropping or retyping a field
    is rejected — that would silently corrupt old fragments."""
    prev = json.loads(prev_json)
    new = json.loads(new_json)
    prev_by_name = {f["name"]: f for f in prev["fields"]}
    new_by_name = {f["name"]: f for f in new["fields"]}

    def _shape(f: dict) -> dict:  # nullability-insensitive identity
        return {k: v for k, v in f.items() if k != "nullable"}

    for name, f in new_by_name.items():
        old = prev_by_name.get(name)
        if old is not None and _shape(old) != _shape(f):
            raise LanceDatasetError(
                f"mergeSchema cannot change existing field {name!r}: "
                f"dataset has {old!r}, append has {f!r}"
            )
    # columns the append omits stay in the dataset schema and read
    # as NULL from the new fragments (Delta mergeSchema semantics) —
    # every fragment is read through the null-filling scan path.
    # Every evolved/omitted field must be nullable: some fragment
    # will surface NULLs for it.
    merged = dict(prev)
    merged["fields"] = [
        (
            dict(f, nullable=True)
            if f["name"] not in new_by_name
            or f.get("nullable") != new_by_name[f["name"]].get("nullable")
            else f
        )
        for f in prev["fields"]
    ] + [
        dict(f, nullable=True)
        for f in new["fields"]
        if f["name"] not in prev_by_name
    ]
    return json.dumps(merged)


def commit(
    root: str,
    schema_json: str,
    fragments: list[Fragment],
    mode: str,
    stream_batch_id: int | None = None,
    stream_txn_id: str | None = None,
    expected_version: int | None = None,
    merge_schema: bool = False,
    drop_columns: list[str] | None = None,
    rename_columns: dict | None = None,
) -> Manifest:
    """Publish the next version. Atomic: manifest is written to a
    temp name and renamed into place (POSIX rename atomicity), the
    same reader-never-sees-partial-state contract as the reference's
    transaction files (_transactions/*.txn).

    ``stream_batch_id``/``stream_txn_id``: for streaming-sink commits
    — if this txn id already committed this epoch (checkpoint replay
    after restart), the commit is a no-op and the replayed fragments
    are dropped, so the sink is effectively exactly-once.

    Publication uses an exclusive-create primitive
    (``iolayer.put_if_absent`` of the manifest — tmp+``os.link``
    locally, conditional PUT on an object-store root — which fails
    if a concurrent committer won the version): losing a race means
    we recompute against the new head and retry, so no commit — or
    the fragments it references — is ever silently overwritten. With
    ``expected_version`` set (maintenance ops), losing the race raises
    instead of retrying, making the optimistic-concurrency check
    genuinely atomic rather than check-then-act."""
    io.makedirs(os.path.join(root, MANIFEST_DIR))
    # physical columns of any NEW fragment files in this commit: the
    # schema as the WRITER sent it, captured before merge/append
    # branches may replace schema_json with the committed one
    write_fields = [f["name"] for f in json.loads(schema_json)["fields"]]
    while True:
        versions = list_versions(root)
        head = versions[-1] if versions else None
        prev = read_manifest(root, head) if versions else None
        if expected_version is not None and head != expected_version:
            # optimistic concurrency for maintenance ops: somebody
            # else (e.g. a stream-sink epoch) committed since we read
            # the manifest — fail rather than dropping their version
            raise LanceDatasetError(
                f"concurrent commit detected: expected version "
                f"{expected_version}, found {head}; "
                "re-run the maintenance operation"
            )
        # per-txn replay watermarks carry forward through EVERY
        # commit (appends and maintenance rewrites alike)
        txns = dict(prev.stream_txns) if prev is not None else {}
        if (
            mode == "append"  # replay detection: stream sink epochs
            and stream_txn_id is not None
            and stream_batch_id is not None
            and stream_txn_id in txns
            and stream_batch_id <= txns[stream_txn_id]
        ):
            for f in fragments:  # drop the replayed duplicates
                for rel in (f.file, f.bloom_file):
                    if not rel:
                        continue
                    try:
                        io.remove(os.path.join(root, rel))
                    except OSError:
                        pass
            return prev
        if stream_txn_id is not None and stream_batch_id is not None:
            txns[stream_txn_id] = max(
                stream_batch_id, txns.get(stream_txn_id, stream_batch_id)
            )
        revived_safe: set = set()
        if mode == "append" and prev is not None and rename_columns:
            # ALTER TABLE RENAME COLUMN (r13): metadata-only — the
            # schema's field names change, every fragment is carried
            # by reference, and the stable field ids keep pointing
            # readers at the old physical columns. Requires every
            # fragment to carry field ids: a legacy fragment is read
            # BY NAME, so the renamed field would silently null-fill
            # from it.
            if fragments:
                raise LanceDatasetError(
                    "rename_columns commits are metadata-only; got "
                    f"{len(fragments)} fragments"
                )
            if drop_columns:
                raise LanceDatasetError(
                    "rename_columns and drop_columns cannot share a "
                    "commit"
                )
            prev_fields = json.loads(prev.schema_json)["fields"]
            names = [f["name"] for f in prev_fields]
            unknown = sorted(set(rename_columns) - set(names))
            if unknown:
                raise LanceDatasetError(
                    f"RENAME COLUMN names unknown columns {unknown}; "
                    f"dataset columns: {names}"
                )
            surviving = [rename_columns.get(n, n) for n in names]
            if len(set(surviving)) != len(surviving):
                raise LanceDatasetError(
                    f"RENAME COLUMN targets collide with surviving "
                    f"columns: {sorted(set(rename_columns.values()))}"
                )
            legacy = [
                f.file
                for f in prev.fragments
                if f.field_ids is None
            ]
            if prev.field_ids is None or legacy:
                raise LanceDatasetError(
                    f"RENAME COLUMN requires stable field ids on "
                    f"every fragment, but {len(legacy) or 'all'} "
                    "fragments predate them and are read by name — "
                    "rewrite the dataset (OPTIMIZE or CREATE OR "
                    "REPLACE TABLE ... AS SELECT) first"
                )
            want = [
                dict(f, name=rename_columns.get(f["name"], f["name"]))
                for f in prev_fields
            ]
            if json.loads(schema_json)["fields"] != want:
                raise LanceDatasetError(
                    "rename_columns schema must equal the committed "
                    "schema with exactly the renamed names replaced"
                )
            # a rename target landing on a tombstoned name is safe
            # here (all fragments id-mapped) — retire its tombstone
            revived_safe = set(rename_columns.values()) & prev.dropped_names
            base = list(prev.fragments)
        elif mode == "append" and prev is not None and drop_columns:
            # ALTER TABLE DROP COLUMN: a metadata-only commit — zero
            # fragments, schema narrowed to exactly (prev fields -
            # drop set), every fragment carried by reference. The
            # caller derives the narrowed schema; validate it here so
            # no other caller can smuggle an arbitrary retype through
            # the drop path.
            if fragments:
                raise LanceDatasetError(
                    "drop_columns commits are metadata-only; got "
                    f"{len(fragments)} fragments"
                )
            want = [
                f
                for f in json.loads(prev.schema_json)["fields"]
                if f["name"] not in set(drop_columns)
            ]
            got = json.loads(schema_json)["fields"]
            if got != want:
                raise LanceDatasetError(
                    "drop_columns schema must equal the committed "
                    "schema minus exactly the dropped fields"
                )
            base = list(prev.fragments)
        elif mode == "append" and prev is not None:
            if prev.schema_json != schema_json:
                if merge_schema:
                    # a tombstoned name may only come back when every
                    # surviving fragment carries field ids: the
                    # re-added field then gets a FRESH id and by-id
                    # resolution provably null-fills it from pre-drop
                    # files (r13 — tombstone retirement). With any
                    # LEGACY fragment in the set, the null-filling
                    # scan reads by name and would surface the old
                    # bytes — refuse as before.
                    revived = sorted(
                        {
                            f["name"]
                            for f in json.loads(schema_json)["fields"]
                        }
                        & prev.dropped_names
                    )
                    if revived:
                        legacy = [
                            f.file
                            for f in prev.fragments
                            if f.field_ids is None
                        ]
                        if legacy or prev.field_ids is None:
                            raise LanceDatasetError(
                                f"cannot re-add dropped columns "
                                f"{revived}: fragments written before "
                                "the drop lack stable field ids and "
                                "still carry the old bytes under this "
                                "name — rewrite the dataset (CREATE "
                                "OR REPLACE TABLE ... AS SELECT) to "
                                "reclaim it"
                            )
                        revived_safe = set(revived)
                    schema_json = _merge_schemas(
                        prev.schema_json, schema_json
                    )
                elif _append_compatible(prev.schema_json, schema_json):
                    # same names + types; only nullability flags or
                    # column metadata differ (literal-derived frames
                    # arrive non-nullable) — the COMMITTED schema
                    # stays authoritative
                    schema_json = prev.schema_json
                else:
                    raise LanceDatasetError(
                        "append schema mismatch: "
                        f"dataset has {prev.schema_json!r}, "
                        f"write has {schema_json!r} "
                        "(pass .option('mergeSchema','true') to add "
                        "new columns)"
                    )
            base = list(prev.fragments)
        else:
            base = []
        next_version = (head + 1) if versions else 1
        all_frags = base + fragments
        for i, f in enumerate(all_frags):
            f.id = i
        # stable field ids (r13): carry the previous map (rename
        # re-keys it — same ids, new names), assign monotonically
        # fresh ids to new names, and drop removed names WITHOUT
        # reusing their ids — the whole point: a re-added name is a
        # NEW field to every by-id reader. A dataset without a map
        # bootstraps one here; its pre-existing fragments stay
        # id-less (legacy, by-name).
        if prev is not None and prev.field_ids is not None:
            id_map = dict(prev.field_ids)
            next_id = prev.next_field_id
        else:
            id_map, next_id = {}, 0
        if rename_columns:
            id_map = {
                rename_columns.get(k, k): v for k, v in id_map.items()
            }
        final_fields = [
            f["name"] for f in json.loads(schema_json)["fields"]
        ]
        for n in final_fields:
            if n not in id_map:
                id_map[n] = next_id
                next_id += 1
        id_map = {n: id_map[n] for n in final_fields}
        # stamp fragments: a NEW file's physical columns are the
        # write schema's names; a file carried from the previous
        # version keeps its recorded map (deletion-vector copies and
        # maintenance reconstructions may arrive as bare Fragment
        # objects — inherit, never restamp, or a renamed file would
        # be mislabeled with current names)
        prev_by_file = (
            {f.file: f.field_ids for f in prev.fragments}
            if prev is not None
            else {}
        )
        for f in all_frags:
            if f.field_ids is None:
                if f.file in prev_by_file:
                    f.field_ids = prev_by_file[f.file]  # may stay None
                else:
                    f.field_ids = {
                        n: id_map[n] for n in write_fields if n in id_map
                    }
        # tombstone lifecycle (see Manifest.dropped_columns): carry
        # each live entry forward unless NO file of the drop-time
        # manifest survives into this commit's fragment set, or the
        # name was safely revived this commit (all-id-mapped re-add
        # or rename-onto — the id indirection retires the tombstone)
        tombstones = []
        if prev is not None and prev.dropped_columns:
            files_now = {f.file for f in all_frags}
            for e in prev.dropped_columns:
                if not isinstance(e, dict):
                    e = {"name": e, "at_version": None}
                if e["name"] in revived_safe:
                    continue
                v = e.get("at_version")
                keep = True
                if v is not None:
                    try:
                        pre = {
                            f.file
                            for f in read_manifest(root, v).fragments
                        }
                        keep = bool(files_now & pre)
                    except LanceDatasetError:
                        keep = True  # drop-time manifest vacuumed
                if keep:
                    tombstones.append(e)
        for n in drop_columns or []:
            tombstones.append({"name": n, "at_version": next_version})
        manifest = Manifest(
            next_version,
            schema_json,
            all_frags,
            txns,
            tombstones,
            id_map,
            next_id,
        )
        final = _manifest_path(root, next_version)
        if not io.put_if_absent(
            final, json.dumps(manifest.to_json()).encode()
        ):
            if expected_version is not None:
                raise LanceDatasetError(
                    f"concurrent commit detected: version {next_version} "
                    "was published while committing; re-run the "
                    "maintenance operation"
                )
            continue  # lost an append race: recompute against new head
        return manifest


# every key in Spark's schema JSON that declares "may hold NULLs":
# struct fields carry "nullable", arrays "containsNull", maps
# "valueContainsNull" (map keys can never be null in Spark)
_NULLABILITY_KEYS = ("nullable", "containsNull", "valueContainsNull")


def _norm_schema_node(node):
    """Schema JSON with nullability flags and column metadata
    stripped recursively — the shape ``_append_compatible`` compares
    on (names + types only); nullability is checked separately by
    ``_nullability_narrows`` with the narrow-only rule."""
    if isinstance(node, dict):
        return {
            k: _norm_schema_node(v)
            for k, v in node.items()
            if k not in _NULLABILITY_KEYS and k != "metadata"
        }
    if isinstance(node, list):
        return [_norm_schema_node(x) for x in node]
    return node


def _nullability_narrows(prev, new) -> bool:
    """Recursive narrow-only nullability check over two schema-JSON
    trees already known shape-identical (``_norm_schema_node``
    equality): at EVERY level — struct fields, array elements, map
    values — the append may drop nullability (non-null data into a
    nullable slot is always safe) but never add it (nullable data
    into a slot the committed schema declares non-null could plant
    NULLs the schema forbids). Top-level-only was the r11 contract;
    nested widening slipped through it (r11 advice)."""
    if isinstance(prev, dict):
        for k in _NULLABILITY_KEYS:
            if new.get(k, True) and not prev.get(k, True):
                return False
        return all(
            _nullability_narrows(pv, new[k])
            for k, pv in prev.items()
            if k not in _NULLABILITY_KEYS
            and k != "metadata"
            and isinstance(pv, (dict, list))
        )
    if isinstance(prev, list):
        return all(
            _nullability_narrows(pv, nv) for pv, nv in zip(prev, new)
        )
    return True


def _append_compatible(prev_json: str, new_json: str) -> bool:
    """True when an append's schema differs from the committed one
    only REPRESENTATIONALLY: identical field names, order, and types
    all the way down, with nullability allowed to NARROW at every
    nesting level (writing provably non-null values into a nullable
    slot is always safe — literal/cast-derived Spark frames arrive
    non-nullable) but never to WIDEN anywhere (nullable data into a
    slot the committed schema declares non-nullable could plant NULLs
    the schema forbids — checked recursively through array elements,
    struct members, and map values since r12). Exact-JSON equality
    was the old contract and it refused e.g. ``INSERT INTO ...
    VALUES`` / literal COPY appends for nothing (r11)."""
    import json as _json

    p, n = _json.loads(prev_json), _json.loads(new_json)
    if _norm_schema_node(p) != _norm_schema_node(n):
        return False
    return _nullability_narrows(p, n)


def write_deletion_file(root: str, positions: list[int]) -> str:
    """Persist a deletion vector (sorted row positions) for one
    fragment. JSON here; a production store would use a roaring
    bitmap (Lance proper's _deletions/*.arrow), but the contract —
    immutable side-file, fragment untouched — is identical."""
    rel = os.path.join(DELETION_DIR, f"{uuid.uuid4().hex}.json")
    io.write_text(
        os.path.join(root, rel),
        json.dumps({"positions": sorted(positions)}),
    )
    return rel


def read_deletion_positions(root: str, fragment: Fragment) -> list[int]:
    if fragment.deletion_file is None:
        return []
    return json.loads(
        io.read_text(os.path.join(root, fragment.deletion_file))
    )["positions"]


def _apply_deletions(
    table: pa.Table, positions: list[int]
) -> pa.Table:
    import numpy as np

    if not positions:
        return table
    mask = np.ones(table.num_rows, dtype=bool)
    mask[np.asarray(positions, dtype=np.int64)] = False
    return table.filter(pa.array(mask))


def read_fragment(
    root: str,
    fragment: Fragment,
    columns: list[str] | None = None,
    filter_expr=None,
) -> pa.Table:
    """Read one fragment with column pruning + predicate pushdown,
    applying its deletion vector (positional mask over the physical
    row order, so it must run BEFORE any value filter).

    Tries the real `lance` reader first for genuine .lance fragment
    files (wheel not present in this environment), else parquet.
    """
    path = os.path.join(root, fragment.file)
    if fragment.file.endswith(".lance"):  # pragma: no cover
        # a JSON manifest referencing .lance binary fragments is a
        # hybrid this reader cannot serve PER FRAGMENT: the lance
        # wheel's dataset API has no by-manifest-entry read, and the
        # previous ds.to_table() fallback returned the WHOLE dataset
        # for every fragment — N fragments yielded N copies, deletion
        # vectors ignored (r8 review finding). Refuse accurately.
        raise LanceDatasetError(
            f"fragment {fragment.file!r} is a .lance binary file "
            "inside a JSON-manifest dataset; per-fragment reads of "
            "this hybrid are not supported — read the dataset with "
            "sources.lance_native (plain v2 encodings) or the lance "
            "wheel's dataset API"
        )
    if fragment.deletion_file is not None:
        # positions index PHYSICAL rows: read unfiltered (columns
        # pruning keeps row order), mask, then value-filter
        table = io.read_parquet(path, columns=columns)
        table = _apply_deletions(
            table, read_deletion_positions(root, fragment)
        )
        if filter_expr is not None:
            table = table.filter(filter_expr)
        return table
    return io.read_parquet(path, columns=columns, filters=filter_expr)


def require_physical_identity(manifest: Manifest, op: str) -> None:
    """Loud guard for read paths that resolve fragment columns BY
    NAME against the current schema (``spark.read.schema(committed)
    .parquet(...)``, take-by-position fetches): after a RENAME (or a
    re-add over an id-mapped drop) those reads would silently
    null-fill the renamed field — or worse, surface a dead column's
    bytes. Refuse until a rewrite re-materializes the fragments
    under current names."""
    bad = manifest.physical_mismatches()
    if bad:
        raise LanceDatasetError(
            f"{op}: {len(bad)} fragment(s) (e.g. {bad[:2]}) carry "
            "physical column names that differ from the current "
            "schema (RENAME COLUMN is metadata-only) — run OPTIMIZE "
            "/ compact to materialize the rename before this "
            "operation"
        )


def resolve_to_current(
    table: pa.Table, manifest: Manifest, frag: Fragment
) -> pa.Table:
    """Rename a freshly-read fragment table from PHYSICAL column
    names into the manifest's CURRENT names by stable field id
    (r13): renamed fields keep their bytes under the new name, and
    physical columns whose id is dead in the current schema (dropped
    or superseded by a re-add) are removed so downstream null-fill
    treats them as absent. Identity (and legacy by-name fragments)
    pass through untouched."""
    cm = manifest.colmap(frag)
    if cm is None:
        return table
    # ALWAYS project when the fragment is id-mapped — even under an
    # identity name map: a physical column whose id is dead in the
    # current schema (dropped, then the NAME re-added with a fresh
    # id) is absent from cm but present in the table, and passing it
    # through would let _conform_to pick it up BY NAME — compaction
    # would then permanently materialize the dead bytes as the
    # re-added column's values (r13 review finding; the scan path's
    # _partition_colmap catches this shadow case, this path must
    # too)
    if all(k == v for k, v in cm.items()) and set(
        table.column_names
    ) <= set(cm.values()):
        return table  # true identity, nothing shadowed
    cols, names = [], []
    for cur, phys in cm.items():  # current-schema order
        if phys in table.column_names:
            cols.append(table.column(phys))
            names.append(cur)
    return pa.table(cols, names=names)


def _bloom_columns_of(
    root: str,
    frags: list["Fragment"],
    manifest: "Manifest | None" = None,
) -> list[str]:
    """Union of columns any of these fragments carries blooms for —
    maintenance rewrites (compact, delete_where) must re-record the
    same bloom columns on the fragments they produce, or point-probe
    pruning silently regresses after every rewrite. Bloom keys are
    PHYSICAL names; pass ``manifest`` to translate them to current
    names by field id (rewritten fragments carry current names)."""
    cols: set[str] = set()
    for f in frags:
        if f.bloom_file:
            try:
                keys = json.loads(
                    io.read_text(os.path.join(root, f.bloom_file))
                ).keys()
            except OSError:
                continue
            cm = manifest.colmap(f) if manifest is not None else None
            if cm:
                rev = {v: k for k, v in cm.items()}
                cols.update(rev[k] for k in keys if k in rev)
            else:
                cols.update(keys)
    return sorted(cols)


def _conform_to(table: "pa.Table", target: "pa.Schema") -> "pa.Table":
    """Fill columns the physical file lacks (schema evolution) with
    typed NULLs and cast to the committed schema — the same
    null-fill semantics as the evolved scan path. Shared by
    compact() and delete_where(): both must work on datasets whose
    fragments have heterogeneous physical schemas."""
    for name in target.names:
        if name not in table.column_names:
            fld = target.field(name)
            table = table.append_column(
                fld, pa.nulls(table.num_rows, fld.type)
            )
    # cast unifies nullability flags too (a fragment written from
    # a non-null expression carries `not null` fields that
    # concat_tables treats as a different schema)
    return table.select(target.names).cast(target)


def compact(root: str, target_rows: int = 1_000_000) -> Manifest:
    """Fragment compaction: rewrite small fragments into ~target_rows
    fragments and commit the result as a NEW version — data is
    unchanged, old versions still time-travelable (the maintenance
    operation Lance calls optimize/compact_files). At 100 TB this
    runs as a distributed job per fragment group; here the driver
    loop is fine for the manifest sizes tests use."""
    manifest = read_manifest(root)
    # rewrite small fragments, fragments carrying deletion vectors
    # (materialize_deletions — Lance compact_files does the same),
    # AND fragments whose physical column names drifted from the
    # current schema (metadata-only RENAME; compaction is where the
    # rename pays its IO and by-name readers become safe again)
    mismatched = set(manifest.physical_mismatches())
    small = [
        f
        for f in manifest.fragments
        if f.num_rows < target_rows
        or f.deletion_file is not None
        or f.file in mismatched
    ]
    if (
        len(small) <= 1
        and not any(f.deletion_file for f in small)
        and not any(f.file in mismatched for f in small)
    ):
        return manifest
    keep = [f for f in manifest.fragments if f not in small]

    # after a mergeSchema append the small fragments have
    # heterogeneous physical schemas (old files lack evolved
    # columns); conform every table to the COMMITTED schema before
    # concatenation, matching the null-fill semantics of the evolved
    # scan path — otherwise pa.concat_tables raises on any evolved
    # dataset and compaction is impossible.
    target = _arrow_schema(manifest.schema_json)

    blooms = _bloom_columns_of(root, small, manifest)
    tables, new_frags, batch_rows = [], [], 0
    for f in small:
        tables.append(
            _conform_to(
                resolve_to_current(read_fragment(root, f), manifest, f),
                target,
            )
        )
        batch_rows += f.live_rows
        if batch_rows >= target_rows:
            new_frags.append(
                write_fragment(
                    root, pa.concat_tables(tables), bloom_columns=blooms
                )
            )
            tables, batch_rows = [], 0
    if tables and sum(t.num_rows for t in tables) > 0:
        new_frags.append(
            write_fragment(
                root, pa.concat_tables(tables), bloom_columns=blooms
            )
        )
    return commit(
        root,
        manifest.schema_json,
        keep + new_frags,
        mode="overwrite",
        expected_version=manifest.version,
    )


def delete_where(
    root: str, predicate, use_deletion_vectors: bool = False
) -> Manifest:
    """Row deletion, committing a new version either way (old
    versions remain time-travelable); ``predicate`` is a
    pyarrow.compute expression. SQL DELETE NULL semantics: a NULL
    predicate result KEEPS the row.

    Two physical strategies (both in Lance proper):
    - rewrite (default): each affected fragment is rewritten without
      the matching rows — one distributed task per affected fragment,
      untouched fragments carried by reference.
    - deletion vectors (``use_deletion_vectors=True``): the matching
      row POSITIONS are recorded in an immutable ``_deletions/`` side
      file and the fragment file is untouched — O(matching rows) of
      metadata instead of O(fragment bytes) of IO, the only delete
      that stays cheap at 100 TB. Scans apply the mask before value
      filters; repeated deletes merge positions; ``compact``
      materializes them. Note (streaming): like Delta without CDF,
      deletes are not change-streamed — a running stream over this
      dataset keeps its append-only view.
    """
    import pyarrow.compute as pc

    manifest = read_manifest(root)
    # pre-evolution fragments lack evolved columns: conform each
    # table to the committed schema BEFORE predicate evaluation so a
    # predicate on an evolved column sees typed NULLs (and keeps the
    # row, per SQL DELETE's keep-on-NULL) instead of crashing with
    # a missing-field error (r5 review finding)
    target = _arrow_schema(manifest.schema_json)
    new_frags: list[Fragment] = []
    for f in manifest.fragments:
        if use_deletion_vectors:
            import numpy as np
            import pyarrow.dataset as pads

            # evaluate the predicate positionally: tag physical row
            # positions, filter (dataset filter keeps rows where the
            # predicate is definitely TRUE — NULL excluded, which IS
            # SQL DELETE's keep-on-NULL), collect hit positions
            table = _conform_to(
                resolve_to_current(
                    io.read_parquet(os.path.join(root, f.file)),
                    manifest,
                    f,
                ),
                target,
            )
            table = table.append_column(
                "__pos", pa.array(np.arange(table.num_rows), pa.int64())
            )
            hits = (
                pads.dataset(table)
                .to_table(columns=["__pos"], filter=predicate)
                .column("__pos")
                .to_pylist()
            )
            old = read_deletion_positions(root, f)
            new_hits = sorted(set(hits) - set(old))
            if not new_hits:
                new_frags.append(f)  # nothing new deleted: carry
                continue
            positions = sorted(set(old) | set(new_hits))
            rel = write_deletion_file(root, positions)
            # a fully-deleted fragment STAYS in the manifest
            # (deletion file covering every row, live_rows == 0): the
            # stream source keys its offsets on fragment-list prefix
            # position, so dropping the entry would shift frag_count
            # and trip the prefix_sha guard on any running stream —
            # exactly the append-only-view guarantee the docstring
            # makes. compact() materializes and drops it later.
            new_frags.append(
                Fragment(
                    -1,
                    f.file,
                    f.num_rows,
                    f.stats,
                    rel,
                    len(positions),
                    # the data file is untouched, so its bloom stays a
                    # valid (conservative) filter — deletes only remove
                    bloom_file=f.bloom_file,
                )
            )
            continue
        table = _conform_to(  # deletion-aware
            resolve_to_current(read_fragment(root, f), manifest, f), target
        )
        keep_mask = pc.coalesce(~predicate, pa.scalar(True))
        kept = table.filter(keep_mask)
        if kept.num_rows == f.live_rows and f.deletion_file is None:
            new_frags.append(f)  # untouched: carry over by reference
        elif kept.num_rows > 0:
            new_frags.append(
                write_fragment(
                    root, kept,
                    bloom_columns=_bloom_columns_of(root, [f], manifest),
                )
            )
    return commit(
        root,
        manifest.schema_json,
        new_frags,
        mode="overwrite",
        expected_version=manifest.version,
    )


def cleanup_old_versions(
    root: str, keep_last: int = 2, older_than_seconds: float = 3600.0
) -> dict:
    """Version retention (Lance proper's cleanup_old_versions):
    drop all but the newest ``keep_last`` manifest versions and
    delete every data / deletion / bloom file no kept version
    references. Time travel within the retention window is
    untouched; reads of vacuumed versions fail loudly (missing
    manifest). Index directories (``_indexes/``) are never touched —
    they carry their own staleness contract.

    Safe under the immutable-fragment model: a file referenced by
    ANY kept manifest is kept, so concurrent readers of retained
    versions never lose files; the manifest unlink is atomic per
    version. ``older_than_seconds`` protects IN-FLIGHT writers: the
    commit protocol stages fragment files BEFORE publishing the
    manifest that references them, so an unreferenced-but-recent
    file may belong to a write in progress — only files older than
    the grace window are reclaimed (Lance proper's cleanup has the
    same older_than contract). Pass 0 only when no concurrent
    writer can exist. Returns {versions_removed, files_removed,
    bytes_reclaimed}."""
    import time as _time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(root)
    kept_versions = versions[-keep_last:]
    drop_versions = [v for v in versions if v not in kept_versions]
    referenced: set = set()
    for v in kept_versions:
        m = read_manifest(root, v)
        for f in m.fragments:
            referenced.add(f.file)
            if f.deletion_file:
                referenced.add(f.deletion_file)
            if f.bloom_file:
                referenced.add(f.bloom_file)
    files_removed = 0
    bytes_reclaimed = 0
    for sub in (DATA_DIR, DELETION_DIR, BLOOM_DIR):
        d = os.path.join(root, sub)
        if not io.isdir(d):
            continue
        now = _time.time()
        for name in sorted(io.listdir(d)):
            rel = os.path.join(sub, name)
            if rel in referenced:
                continue
            p = os.path.join(root, rel)
            try:
                if now - io.getmtime(p) < older_than_seconds:
                    continue  # possibly staged by an in-flight write
                bytes_reclaimed += io.getsize(p)
                io.remove(p)
            except OSError:
                continue  # raced with a concurrent cleanup
            files_removed += 1
    for v in drop_versions:
        io.remove(_manifest_path(root, v))
    # a LOCAL writer killed between staging '<N>.manifest.tmp.<hex>'
    # and os.link leaks the tmp forever (nothing else ever deletes it
    # — r8 review finding); reclaim stale ones under the same
    # older_than grace that protects in-flight commits. Object-store
    # roots stage commits OUTSIDE the dataset prefix (iolayer), so
    # this loop finds nothing there by construction.
    mdir = os.path.join(root, MANIFEST_DIR)
    if io.isdir(mdir):
        now = _time.time()
        for name in io.listdir(mdir):
            if ".manifest.tmp." not in name:
                continue
            p = os.path.join(mdir, name)
            try:
                if now - io.getmtime(p) < older_than_seconds:
                    continue
                bytes_reclaimed += io.getsize(p)
                io.remove(p)
                files_removed += 1
            except OSError:
                continue
    return {
        "versions_removed": len(drop_versions),
        "files_removed": files_removed,
        "bytes_reclaimed": bytes_reclaimed,
    }


def head_divergence(base: Manifest, head: Manifest) -> tuple[str, list[str]]:
    """Classify how ``head`` diverges from ``base`` for INDEX-SERVING
    decisions (r14, the deletion-aware serving ladder; Lance proper
    serves indexes across deletes by masking deleted rows at scan
    time — rust/scanner.rs — instead of invalidating the index):

    - ``("none", [])`` — same data files, same deletion state (a
      metadata-only commit: rename, watermark, stats). Index output
      is untouched.
    - ``("rewritten", files)`` — at least one base data file is gone
      (UPDATE / upsert / compaction rewrote rows). Postings may hold
      stale VALUES; only a rebuild is safe.
    - ``("appended", files)`` — base files intact but head grew new
      fragments the index never saw; serving would silently
      under-recall. An index DELTA (extend_*) covers this.
    - ``("deletion_only", files)`` — every base data file survives
      byte-identical and only deletion state changed. Postings hold
      no wrong values, just superfluous ids: anti-joining candidates
      against the newly-masked rows' ids serves EXACT results over
      the survivors at O(deleted rows), no rebuild.

    Distinct from ``append_only_violations`` below, which answers a
    stricter question (may base postings be EXTENDED in place?) where
    deletion changes are violations too."""
    head_by_file = {f.file: f for f in head.fragments}
    base_files = {f.file for f in base.fragments}
    rewritten = [f.file for f in base.fragments if f.file not in head_by_file]
    if rewritten:
        return "rewritten", rewritten
    appended = [f.file for f in head.fragments if f.file not in base_files]
    if appended:
        return "appended", appended
    masked = [
        f.file
        for f in base.fragments
        if (
            head_by_file[f.file].deletion_file,
            head_by_file[f.file].num_deleted,
        )
        != (f.deletion_file, f.num_deleted)
    ]
    if masked:
        return "deletion_only", masked
    return "none", []


def append_only_violations(base: Manifest, head: Manifest) -> list[str]:
    """Files present at ``base`` that were rewritten — or had their
    DELETION STATE changed — by ``head``. Append-only means more than
    the same file names surviving: a deletion-vector delete keeps
    f.file but changes (deletion_file, num_deleted), and a name-only
    check would silently serve/deliver deleted rows (the r5 review
    finding). ONE definition of the fragment identity rule, shared by
    the CDC begin_version diff (datasource.LanceScanReader) and the
    vector-index CDC guard (vector_index historically shared it; the
    r14 extends use the laxer _require_extendable instead) so
    the rule cannot drift between them (r8 review finding)."""
    head_by_file = {f.file: f for f in head.fragments}
    return [
        f.file
        for f in base.fragments
        if f.file not in head_by_file
        or (
            head_by_file[f.file].deletion_file,
            head_by_file[f.file].num_deleted,
        )
        != (f.deletion_file, f.num_deleted)
    ]

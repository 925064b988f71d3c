"""Native WRITER for genuine Lance v2 datasets — no ``lance`` wheel.

The inverse of ``lance_native.py``: emits real ``.lance`` v2 data
files (plain encodings) and protobuf manifests with the exact byte
layout observed in the reference's own fixture
(test/test_data.lance, written by lance 0.32.1) — matching what the
reference's COPY TO produces via the lance crate
(cpp/lance_copy.cpp:72-249 → rust/writer.rs:1-54,
rust/lib.rs:341-393).

Layout facts mirrored from the fixture (byte-verified in
tests/test_lance_native.py):

* data file: page buffers first, each 64-byte aligned, starting at
  offset 0; then one global buffer holding the file descriptor
  (schema + row count); then per-column metadata protos (packed
  back-to-back); then the column-meta offsets table (u64 off/size
  pairs); then the global-buffer offsets table; then the 40-byte
  footer ``<QQQIIHH4s`` ending in ``LANC`` (file version 0.3 — the
  on-disk numbering Lance uses for format 2.0).
* column metadata: field 1 = Any-wrapped
  ``/lance.encodings.ColumnEncoding``; field 2 = pages, each with
  packed buffer_offsets (f1), packed buffer_sizes (f2), row count
  (f3) and an Any-wrapped ``/lance.encodings.ArrayEncoding`` (f4)
  whose value for flat data nests down to a bits-per-value leaf and
  for var-width strings pairs a 64-bit-offsets encoding with a byte
  encoding.
* manifest: fields (f1), fragments (f2), version (f3), timestamp
  (f7), max_fragment_id (f11), writer_version (f13), data storage
  format {"lance","2.0"} (f15); trailer = u64(0) + u16 major/minor +
  ``LANC``.

Nullable columns carry an Arrow-style validity bitmap as an extra
leading page buffer — the natural plain-encoding extension, decoded
symmetrically by ``lance_native.py``. (Real Lance 2.x encodes nulls
inside miniblock/zip encodings, which have no public byte-level
fixture here; the symmetric convention keeps round-trips honest and
loud — disclosed, not hidden.)

Scale: fragment data files are written EXECUTOR-side (one per input
partition via ``mapInArrow``); only (path, row-count) pairs return
to the driver, which then commits one manifest — the same
one-commit-many-fragments shape as the repo's parquet-backed store
and Lance proper's append transaction.
"""

from __future__ import annotations

import os
import struct
import uuid

import pyarrow as pa

from .lance_native import MAGIC, _FOOTER, LanceNativeUnsupported

ALIGN = 64


# --------------------------------------------------------------- #
# protobuf wire-format emitters (inverse of lance_native.pb_fields) #
# --------------------------------------------------------------- #


def pb_varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # protobuf stores negatives as 2^64 complements
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def pb_field_varint(no: int, v: int) -> bytes:
    return pb_varint(no << 3) + pb_varint(v)


def pb_field_len(no: int, payload: bytes) -> bytes:
    return pb_varint((no << 3) | 2) + pb_varint(len(payload)) + payload


def pb_packed_varints(no: int, vals: list[int]) -> bytes:
    return pb_field_len(no, b"".join(pb_varint(v) for v in vals))


def _any(type_url: str, value: bytes) -> bytes:
    return pb_field_len(1, type_url.encode()) + pb_field_len(2, value)


def _wrapped_any(type_url: str, value: bytes) -> bytes:
    """The Encoding wrapper shape the fixture uses everywhere:
    msg{ f2: msg{ f1: Any{url, value} } }."""
    return pb_field_len(2, pb_field_len(1, _any(type_url, value)))


_COLUMN_ENCODING = _wrapped_any(
    "/lance.encodings.ColumnEncoding", pb_field_len(1, b"")
)


def _flat_encoding_value(bits: int) -> bytes:
    """ArrayEncoding value for flat fixed-width data: nests to a
    bits-per-value leaf (fixture: 12 bytes for bits=64)."""
    leaf = pb_field_varint(1, bits) + pb_field_len(2, b"")
    return pb_field_len(2, pb_field_len(1, pb_field_len(1, pb_field_len(1, leaf))))


# fixture constants for var-width binary pages: a 64-bit offsets
# encoding + the byte-stream encoding + trailing f3=24
_BINARY_BYTES_ENC = pb_field_len(
    1, pb_field_varint(1, 8) + pb_field_len(2, pb_field_varint(1, 1))
)


def _binary_encoding_value() -> bytes:
    inner = (
        pb_field_len(1, _flat_encoding_value(64))
        + pb_field_len(2, _BINARY_BYTES_ENC)
        + pb_field_varint(3, 24)
    )
    return pb_field_len(6, inner)


# --------------------------------------------------------------- #
# arrow type <-> lance logical type (inverse of LOGICAL_TO_ARROW)  #
# --------------------------------------------------------------- #

_FIXED_BITS = {
    pa.int8(): 8,
    pa.int16(): 16,
    pa.int32(): 32,
    pa.int64(): 64,
    pa.float32(): 32,
    pa.float64(): 64,
}

_LOGICAL = {
    pa.bool_(): "bool",
    pa.int8(): "int8",
    pa.int16(): "int16",
    pa.int32(): "int32",
    pa.int64(): "int64",
    pa.float32(): "float",
    pa.float64(): "double",
    pa.string(): "string",
    pa.large_string(): "string",
    pa.binary(): "binary",
    pa.date32(): "date32:day",
}


def arrow_to_logical(typ: pa.DataType) -> str:
    if typ in _LOGICAL:
        return _LOGICAL[typ]
    if pa.types.is_timestamp(typ):
        return f"timestamp:{typ.unit}:{typ.tz or '-'}"
    if pa.types.is_fixed_size_list(typ):
        return (
            f"fixed_size_list:{arrow_to_logical(typ.value_type)}"
            f":{typ.list_size}"
        )
    raise LanceNativeUnsupported(
        f"native writer: no plain encoding for arrow type {typ}"
    )


def _field_encoding_enum(typ: pa.DataType) -> int:
    # fixture: 1 (plain) for fixed-width, 2 (var binary) for strings
    if typ in (pa.string(), pa.large_string(), pa.binary()):
        return 2
    return 1


# --------------------------------------------------------------- #
# column -> page buffers                                           #
# --------------------------------------------------------------- #


def _validity_bitmap(arr: pa.Array) -> bytes:
    """LSB-first Arrow validity bitmap, rebuilt explicitly so slices
    and offset-carrying arrays serialize correctly. Vectorized:
    is_valid() honors the array's offset/validity, and packbits with
    little bit order IS the Arrow bitmap layout — the old per-row
    ``arr[i].is_valid`` loop allocated one pyarrow scalar per row
    (minutes of interpreter time per 50M-row fragment; r5 review
    finding)."""
    import numpy as np

    valid = arr.is_valid().to_numpy(zero_copy_only=False)
    return np.packbits(valid, bitorder="little").tobytes()


def _encode_column(arr: pa.Array) -> tuple[list[bytes], bytes]:
    """→ (page buffers, ArrayEncoding Any value). Nullable arrays
    prepend a validity bitmap buffer (see module docstring)."""
    import numpy as np

    typ = arr.type
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    has_nulls = arr.null_count > 0
    validity = [_validity_bitmap(arr)] if has_nulls else []

    if typ in _FIXED_BITS:
        np_arr = arr.fill_null(0).to_numpy(zero_copy_only=False)
        want = {8: "i1", 16: "i2", 32: "i4", 64: "i8"}
        if pa.types.is_floating(typ):
            want = {32: "f4", 64: "f8"}
        buf = np.ascontiguousarray(
            np_arr.astype("<" + want[_FIXED_BITS[typ]], copy=False)
        ).tobytes()
        return validity + [buf], _flat_encoding_value(_FIXED_BITS[typ])
    if typ == pa.bool_():
        bits = bytearray((len(arr) + 7) // 8)
        for i, v in enumerate(arr.fill_null(False).to_pylist()):
            if v:
                bits[i >> 3] |= 1 << (i & 7)
        return validity + [bytes(bits)], _flat_encoding_value(1)
    if typ in (pa.string(), pa.large_string(), pa.binary()):
        raw = [
            (b"" if v is None else (v.encode() if isinstance(v, str) else v))
            for v in arr.to_pylist()
        ]
        ends, acc = [], 0
        for b in raw:
            acc += len(b)
            ends.append(acc)
        off_buf = struct.pack(f"<{len(ends)}q", *ends)
        return (
            validity + [off_buf, b"".join(raw)],
            _binary_encoding_value(),
        )
    if pa.types.is_date32(typ):
        inner, _ = _encode_column(arr.cast(pa.int32()))
        return inner, _flat_encoding_value(32)
    if pa.types.is_timestamp(typ):
        inner, _ = _encode_column(arr.cast(pa.int64()))
        return inner, _flat_encoding_value(64)
    if pa.types.is_fixed_size_list(typ):
        if arr.null_count > 0:
            raise LanceNativeUnsupported(
                "nullable fixed_size_list has no plain encoding"
            )
        flat = arr.flatten()
        if flat.type not in _FIXED_BITS:
            # a variable-width or bool value type has offsets/bitmap
            # buffers — stamping the flat fixed-width encoding we
            # would otherwise declare corrupts the layout for any
            # real Lance reader (r5 review finding: byte-compat means
            # the DECLARED encoding must match the buffers)
            raise LanceNativeUnsupported(
                f"fixed_size_list<{flat.type}> has no plain "
                "fixed-width encoding; only numeric value types are "
                "supported by the native writer"
            )
        bufs, _ = _encode_column(flat)
        return bufs, _flat_encoding_value(_FIXED_BITS[flat.type])
    raise LanceNativeUnsupported(
        f"native writer: no plain encoding for arrow type {typ}"
    )


# --------------------------------------------------------------- #
# schema / manifest protos                                         #
# --------------------------------------------------------------- #


def _field_proto(name: str, fid: int, typ: pa.DataType, nullable: bool) -> bytes:
    out = pb_field_len(2, name.encode())
    if fid:  # proto3 default omission, as the fixture does
        out += pb_field_varint(3, fid)
    out += pb_field_varint(4, -1)  # parent_id: top-level
    out += pb_field_len(5, arrow_to_logical(typ).encode())
    if nullable:
        out += pb_field_varint(6, 1)
    out += pb_field_varint(7, _field_encoding_enum(typ))
    out += pb_field_len(11, b"default")  # storage class
    return out


def _schema_fields_proto(schema: pa.Schema) -> bytes:
    return b"".join(
        pb_field_len(
            1, _field_proto(f.name, i, f.type, f.nullable)
        )
        for i, f in enumerate(schema)
    )


def _file_descriptor_proto(schema: pa.Schema, num_rows: int) -> bytes:
    return pb_field_len(1, _schema_fields_proto(schema)) + pb_field_varint(
        2, num_rows
    )


def _align(buf: bytearray) -> None:
    # 0x48 pad bytes, byte-for-byte what lance 0.32.1 emits between
    # aligned buffers (verified against the reference fixture)
    pad = (-len(buf)) % ALIGN
    buf.extend(b"\x48" * pad)


def write_data_file(table: pa.Table, path: str) -> int:
    """Emit one v2 ``.lance`` data file; returns bytes written."""
    table = table.combine_chunks()
    body = bytearray()
    col_metas: list[bytes] = []
    for name in table.schema.names:
        col = table.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = (
                col.chunk(0)
                if col.num_chunks
                else pa.array([], type=col.type)
            )
        bufs, enc_value = _encode_column(col)
        offsets, sizes = [], []
        for b in bufs:
            _align(body)
            offsets.append(len(body))
            sizes.append(len(b))
            body.extend(b)
        page = (
            pb_packed_varints(1, offsets)
            + pb_packed_varints(2, sizes)
            + pb_field_varint(3, table.num_rows)
            + pb_field_len(
                4,
                _wrapped_any("/lance.encodings.ArrayEncoding", enc_value),
            )
        )
        col_metas.append(
            pb_field_len(1, _COLUMN_ENCODING) + pb_field_len(2, page)
        )

    _align(body)
    gbuf_off = len(body)
    gbuf = _file_descriptor_proto(table.schema, table.num_rows)
    body.extend(gbuf)

    col_meta_start = len(body)
    meta_offsets = []
    for m in col_metas:
        meta_offsets.append((len(body), len(m)))
        body.extend(m)
    cmo_start = len(body)
    for off, sz in meta_offsets:
        body.extend(struct.pack("<QQ", off, sz))
    gbo_start = len(body)
    body.extend(struct.pack("<QQ", gbuf_off, len(gbuf)))
    body.extend(
        _FOOTER.pack(
            col_meta_start,
            cmo_start,
            gbo_start,
            1,
            len(col_metas),
            0,
            3,  # on-disk file version 0.3 == format 2.0
            MAGIC,
        )
    )
    with open(path, "wb") as fh:
        fh.write(bytes(body))
    return len(body)


def _manifest_proto(
    schema: pa.Schema,
    fragments: list[tuple[int, str, int, int]],
    version: int,
    timestamp_s: int = 0,
) -> bytes:
    """fragments: (id, data-file name, physical_rows, file_size)."""
    out = _schema_fields_proto(schema)
    n_fields = len(schema)
    for fid, fname, rows, fsize in fragments:
        data_file = (
            pb_field_len(1, fname.encode())
            + pb_packed_varints(2, list(range(n_fields)))
            + pb_packed_varints(3, list(range(n_fields)))
            + pb_field_varint(4, 2)  # file major: format 2.x
            + pb_field_varint(6, fsize)
        )
        frag = b""
        if fid:
            frag += pb_field_varint(1, fid)
        frag += pb_field_len(2, data_file) + pb_field_varint(4, rows)
        out += pb_field_len(2, frag)
    out += pb_field_varint(3, version)
    out += pb_field_len(7, pb_field_varint(1, timestamp_s))
    out += pb_field_varint(
        11, max((f[0] for f in fragments), default=0)
    )  # max_fragment_id (explicit, as the fixture writes it)
    out += pb_field_len(
        13,
        pb_field_len(1, b"lance_duckdb_spark")
        + pb_field_len(2, b"0.4.0"),
    )
    out += pb_field_len(
        15, pb_field_len(1, b"lance") + pb_field_len(2, b"2.0")
    )
    return out


def write_manifest(
    root: str,
    schema: pa.Schema,
    fragments: list[tuple[int, str, int, int]],
    version: int,
    timestamp_s: int = 0,
) -> str:
    proto = _manifest_proto(schema, fragments, version, timestamp_s)
    vdir = os.path.join(root, "_versions")
    os.makedirs(vdir, exist_ok=True)
    path = os.path.join(vdir, f"{version}.manifest")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(struct.pack("<I", len(proto)))
        fh.write(proto)
        # trailer observed in the fixture: u64(0) + u16/u16 (0,1) + magic
        fh.write(struct.pack("<QHH", 0, 0, 1))
        fh.write(MAGIC)
    os.replace(tmp, path)
    return path


def _refuse_existing_dataset(root: str) -> None:
    """These writers create version 1 of a NEW dataset. Writing into
    a root whose _versions/ already holds manifests would replace
    1.manifest while a higher version stays the head — the new data
    silently invisible to every reader (r5 review finding). Native
    appends are not implemented; fail loudly."""
    vdir = os.path.join(root, "_versions")
    if os.path.isdir(vdir) and any(
        n.endswith(".manifest") for n in os.listdir(vdir)
    ):
        raise LanceNativeUnsupported(
            f"{root} already contains a Lance dataset "
            "(_versions/ is non-empty); the native writer only "
            "creates new datasets — choose an empty root or remove "
            "the existing dataset first"
        )


def write_dataset(table: pa.Table, root: str) -> dict:
    """Single-process convenience writer: one fragment, version 1.
    (`write_native_dataset` below is the distributed entry point.)"""
    _refuse_existing_dataset(root)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    name = f"{uuid.uuid4().hex}.lance"
    size = write_data_file(table, os.path.join(root, "data", name))
    write_manifest(
        root, table.schema, [(0, name, table.num_rows, size)], version=1
    )
    return {"fragments": 1, "rows": table.num_rows, "version": 1}


def write_native_dataset(df, root: str) -> dict:
    """Distributed write of a Spark DataFrame as a GENUINE Lance v2
    dataset: each input partition writes its own ``.lance`` data file
    executor-side (mapInArrow — media-scale payload bytes never visit
    the driver); the driver then commits one manifest over all
    fragments. Empty partitions produce no fragment."""
    from pyspark.sql.pandas.types import to_arrow_schema

    _refuse_existing_dataset(root)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    # pure schema conversion — nothing is collected for this
    schema = to_arrow_schema(df.schema)

    def write_partition(batches):
        tables = [pa.Table.from_batches([b]) for b in batches]
        if not tables:
            return
        table = pa.concat_tables(tables)
        if table.num_rows == 0:
            return
        name = f"{uuid.uuid4().hex}.lance"
        size = write_data_file(table, os.path.join(root, "data", name))
        yield pa.RecordBatch.from_pydict(
            {
                "name": [name],
                "rows": [table.num_rows],
                "size": [size],
            }
        )

    results = (
        df.mapInArrow(
            write_partition, schema="name string, rows long, size long"
        )
        .collect()  # one row per fragment, bounded by partition count
    )
    fragments = [
        (i, r["name"], r["rows"], r["size"])
        for i, r in enumerate(sorted(results, key=lambda r: r["name"]))
    ]
    write_manifest(root, schema, fragments, version=1)
    return {
        "fragments": len(fragments),
        "rows": sum(f[2] for f in fragments),
        "version": 1,
    }

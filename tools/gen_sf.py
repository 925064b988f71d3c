"""Scale-factor amplifier: derive sf{N} testdata from the driver's
sf0.1 tables by deterministic K-fold replication with key offsets.

Purpose (VERDICT r1, next-round item 9): validate correctness and
benchmark at sf1 — 10x beyond the largest driver-provided scale — to
catch size-dependent issues the sf0.1 runs cannot. The derived data
is used ONLY for this repo's own scale validation
(tests/test_sf1_validation.py, tools/run_sf1.py); the driver contract
keeps reading the provided /root/testdata directories.

Replication semantics: replica i offsets every key/FK column by
i*(max_key+1), so referential integrity holds within and across
replicas (each replica is a disjoint, internally-consistent copy).
Timestamps, money columns and text/embedding payloads are unchanged
— replicated documents/embeddings form exact duplicate groups of
size K, a realistic (and stressful) shape for the dedup operators.
pyarrow is used end-to-end so the physical parquet types (including
events.ts TIMESTAMP[ns]) survive bit-identically.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key columns to offset per table; every other column is copied
KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# FK columns share the offset of the table they reference
OFFSET_OF: dict[str, str] = {
    "c_custkey": "c_custkey",
    "s_suppkey": "s_suppkey",
    "p_partkey": "p_partkey",
    "o_orderkey": "o_orderkey",
    "o_custkey": "c_custkey",
    "l_orderkey": "o_orderkey",
    "l_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}


def _decorrelate_documents(t: pa.Table, i: int) -> pa.Table:
    """Replica i of documents with cross-replica near-dup structure
    REMOVED while within-replica structure is preserved exactly:
    every word gets a per-replica suffix (a bijection on the shingle
    vocabulary — Jaccard/minhash relations between same-replica docs
    are unchanged; cross-replica word-shingle sets become disjoint),
    and source gets a replica suffix (ngram_jaccard blocks on
    source, so its pair space is per-replica by construction).
    Replica 0 is the untouched original."""
    if i == 0:
        return t
    tag = f"_r{i}"
    # empty tokens (leading/trailing/consecutive spaces) must stay
    # empty: suffixing them would mint phantom words and change the
    # replica's token count / shingle set vs replica 0
    texts = [
        None
        if v is None
        else " ".join((w + tag if w else w) for w in v.split(" "))
        for v in t["text"].to_pylist()
    ]
    srcs = [
        None if v is None else v + tag for v in t["source"].to_pylist()
    ]
    cols = {name: t[name] for name in t.column_names}
    cols["text"] = pa.array(texts, type=t.schema.field("text").type)
    cols["source"] = pa.array(srcs, type=t.schema.field("source").type)
    return pa.Table.from_arrays(
        [cols[n] for n in t.column_names], schema=t.schema
    )


def _decorrelate_embeddings(t: pa.Table, i: int) -> pa.Table:
    """Replica i of embeddings under a per-replica diagonal ±1 sign
    matrix S_i: cos(S_i a, S_i b) == cos(a, b) — within-replica
    near-dup geometry is bit-preserved — while cross-replica dots
    become random-sign sums ~0, so replicas are not near-dups of
    each other. Deterministic signs from (replica, dim)."""
    import hashlib

    import numpy as np

    if i == 0:
        return t
    embs = t["embedding"].combine_chunks()
    # flatten() drops null slots and from_arrays() below discards the
    # validity bitmap — a null embedding would silently corrupt every
    # later row's values via a miscomputed dim. Fail loudly instead.
    if embs.null_count:
        raise ValueError(
            f"embeddings table has {embs.null_count} null embedding(s); "
            "_decorrelate_embeddings requires a fully non-null column"
        )
    # per-row length uniqueness, not mere divisibility: lengths that
    # AVERAGE to an integer (half 126, half 130) would pass a
    # divisibility check and still misalign every row after the
    # first short one
    lens = embs.value_lengths().unique().to_pylist()
    if len(lens) != 1:
        raise ValueError(
            f"ragged embedding column (row lengths {sorted(lens)[:5]}...); "
            "sign-flip decorrelation needs one fixed dimension"
        )
    flat = np.asarray(embs.flatten(), dtype=np.float32)
    dim = lens[0]
    seed = int.from_bytes(
        hashlib.md5(f"signflip:{i}".encode()).digest()[:8], "big"
    )
    rng = np.random.default_rng(seed)
    signs = rng.choice(np.array([1.0, -1.0], dtype=np.float32), size=dim)
    flipped = (flat.reshape(-1, dim) * signs).reshape(-1)
    emb_type = t.schema.field("embedding").type
    new = pa.ListArray.from_arrays(
        embs.offsets, pa.array(flipped, type=emb_type.value_type)
    ).cast(emb_type)
    cols = [
        new if n == "embedding" else t[n] for n in t.column_names
    ]
    return pa.Table.from_arrays(cols, schema=t.schema)


_DECORRELATE = {
    "documents": _decorrelate_documents,
    "embeddings": _decorrelate_embeddings,
}

# --plant-neardups: one perturbed near-copy per PLANT_EVERY embeddings
# rows, at exactly cos = PLANT_COS to its base. The synthetic
# embeddings are ~isotropic noise with no high-similarity structure
# (measured r7: zero pairs above cos 0.7 even at sfd1), so a
# near-dup-at-scale smoke needs TRUE duplicates planted — at a
# threshold of 0.8 the planted pairs are the entire ground truth
# (random 64-dim cosines are ~N(0, 1/8); 0.8 is 6.4 sigma) and the
# truth grows linearly with replica count by construction.
PLANT_EVERY = 20
PLANT_COS = 0.95


def _plant_neardups(t: pa.Table) -> pa.Table:
    import hashlib

    import numpy as np

    embs = t["embedding"].combine_chunks()
    if embs.null_count:
        raise ValueError("planting requires non-null embeddings")
    lens = embs.value_lengths().unique().to_pylist()
    if len(lens) != 1:
        raise ValueError("planting requires one fixed dimension")
    dim = lens[0]
    X = np.asarray(embs.flatten(), dtype=np.float64).reshape(-1, dim)
    ids = np.asarray(t["vec_id"].combine_chunks(), dtype=np.int64)
    labels = t["label"].combine_chunks().to_numpy(zero_copy_only=False)
    base_idx = np.arange(0, len(X), PLANT_EVERY)
    seed = int.from_bytes(hashlib.md5(b"plant-neardups").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    V = X[base_idx]
    G = rng.standard_normal(V.shape)
    # orthogonalize the noise to each base vector, then rotate by
    # theta = acos(PLANT_COS) in the (v, g_perp) plane: the copy's
    # cosine to its base is EXACTLY PLANT_COS (up to fp rounding)
    vn = np.linalg.norm(V, axis=1, keepdims=True)
    Gp = G - (np.sum(G * V, axis=1, keepdims=True) / (vn**2)) * V
    Gp *= vn / np.linalg.norm(Gp, axis=1, keepdims=True)
    theta = np.arccos(PLANT_COS)
    copies = (V * np.cos(theta) + Gp * np.sin(theta)).astype(np.float32)
    new_ids = ids.max() + 1 + np.arange(len(base_idx), dtype=np.int64)
    emb_type = t.schema.field("embedding").type
    planted = pa.Table.from_arrays(
        [
            pa.array(new_ids, type=t.schema.field("vec_id").type),
            pa.array(list(copies), type=emb_type),
            pa.array(labels[base_idx], type=t.schema.field("label").type),
        ],
        schema=t.schema,
    )
    return pa.concat_tables([t, planted])


def amplify(
    src_dir: str,
    dst_dir: str,
    k: int,
    tables: list[str] | None = None,
    decorrelate: bool = False,
    plant_neardups: bool = False,
) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    wanted = {t: KEYS[t] for t in (tables or KEYS)}
    # pass 1: max of every offsettable key, per its OWNING column —
    # over the FULL table universe, not the --tables subset: a kept
    # table's FK (e.g. orders.o_custkey) may be owned by an excluded
    # table (customer), and its offset must still resolve
    maxes: dict[str, int] = {}
    for table, keys in KEYS.items():
        if not keys:
            continue
        t = pq.read_table(os.path.join(src_dir, f"{table}.parquet"))
        for col in keys:
            owner = OFFSET_OF[col]
            if owner == col:
                maxes[col] = pc.max(t[col]).as_py()
    # pass 2: replicate
    for table, keys in wanted.items():
        path = os.path.join(src_dir, f"{table}.parquet")
        t = pq.read_table(path)
        decor = _DECORRELATE.get(table) if decorrelate else None
        if not keys or k == 1:
            reps = [t] * (1 if not keys else k)
            out = pa.concat_tables(reps if keys else [t])
        else:
            reps = []
            for i in range(k):
                cols = []
                for name in t.column_names:
                    col = t[name]
                    if name in keys:
                        off = i * (maxes[OFFSET_OF[name]] + 1)
                        col = pc.add(col, pa.scalar(off, type=col.type))
                    cols.append(col)
                rep = pa.Table.from_arrays(cols, schema=t.schema)
                if decor is not None:
                    rep = decor(rep, i)
                reps.append(rep)
            out = pa.concat_tables(reps)
        if table == "embeddings" and plant_neardups:
            out = _plant_neardups(out)
        pq.write_table(
            out,
            os.path.join(dst_dir, f"{table}.parquet"),
            compression="snappy",
        )
        print(f"{table}: {t.num_rows} -> {out.num_rows}", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = (
        args[1]
        if len(args) > 1
        else os.path.join(os.path.dirname(os.path.dirname(__file__)), ".data", "sf1")
    )
    k = int(args[2]) if len(args) > 2 else 10
    tables = None
    for f in list(flags):
        if f.startswith("--tables="):
            tables = f.split("=", 1)[1].split(",")
            flags.discard(f)
    decorrelate = "--decorrelate" in flags
    flags.discard("--decorrelate")
    plant = "--plant-neardups" in flags
    flags.discard("--plant-neardups")
    if flags:  # a typo'd flag silently dropped would mis-generate data
        raise SystemExit(f"unknown flags: {sorted(flags)}")
    amplify(
        src, dst, k, tables=tables, decorrelate=decorrelate,
        plant_neardups=plant,
    )

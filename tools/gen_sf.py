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


def amplify(src_dir: str, dst_dir: str, k: int) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    # pass 1: max of every offsettable key, per its OWNING column
    maxes: dict[str, int] = {}
    for table, keys in KEYS.items():
        t = pq.read_table(os.path.join(src_dir, f"{table}.parquet"))
        for col in keys:
            owner = OFFSET_OF[col]
            if owner == col:
                maxes[col] = pc.max(t[col]).as_py()
    # pass 2: replicate
    for table, keys in KEYS.items():
        path = os.path.join(src_dir, f"{table}.parquet")
        t = pq.read_table(path)
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
                reps.append(pa.Table.from_arrays(cols, schema=t.schema))
            out = pa.concat_tables(reps)
        pq.write_table(
            out,
            os.path.join(dst_dir, f"{table}.parquet"),
            compression="snappy",
        )
        print(f"{table}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(__file__)), ".data", "sf1")
    )
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    amplify(src, dst, k)

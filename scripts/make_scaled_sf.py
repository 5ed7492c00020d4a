#!/usr/bin/env python
"""Generate a scaled-up copy of a testdata sf directory for LOCAL A/B
measurement only (the driver generates its own data at measurement
time; this script exists so optimization A/Bs can run at the driver's
measurement scale after a sandbox reset wiped the generated sf1.0).

Scheme (distribution-preserving, deterministic under --seed):
- nation/region: copied verbatim (fixed-size dimension tables).
- customer/orders/lineitem/part/supplier/events: original rows kept as
  replica 0; replicas 1..k-1 are copies with every primary AND foreign
  key offset by ``replica * key_range`` so join fanout/selectivity per
  key is exactly preserved while keys stay unique.
- documents: original rows kept; new docs drawn fresh from the
  empirical marginals (uniform 31-word vocab, uniform 10..100 words,
  empirical lang/source mix) so content-hash operators (dedup, minhash,
  ngram) see fresh text, not 10x exact duplicates.
- embeddings: original rows kept; new vectors are unit-normalized
  64-dim gaussians with uniform labels (matches the source stats).

Usage: python scripts/make_scaled_sf.py [--factor 10] \
    [--src /root/testdata/sf0.1] [--dst /root/bigdata/sf1.0] [--seed 9]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

# (table, [(col, key_range)]) — every key column offset by replica*range
KEYED = {
    "customer.parquet": [("c_custkey", 15000)],
    "orders.parquet": [("o_orderkey", 150000), ("o_custkey", 15000)],
    "lineitem.parquet": [
        ("l_orderkey", 150000), ("l_partkey", 20000), ("l_suppkey", 1000),
    ],
    "part.parquet": [("p_partkey", 20000)],
    "supplier.parquet": [("s_suppkey", 1000)],
    "events.parquet": [("event_id", 100000), ("user_id", 1500)],
}


def scale_keyed(src: str, dst: str, fn: str, factor: int) -> None:
    tab = pq.read_table(os.path.join(src, fn))
    reps = [tab]
    for r in range(1, factor):
        cols = {}
        for name in tab.column_names:
            col = tab.column(name)
            off = dict(KEYED[fn]).get(name)
            if off is not None:
                arr = col.to_numpy(zero_copy_only=False) + r * off
                col = pa.array(arr, type=tab.schema.field(name).type)
            cols[name] = col
        reps.append(pa.table(cols, schema=tab.schema))
    out = pa.concat_tables(reps)
    pq.write_table(out, os.path.join(dst, fn))


def scale_documents(src: str, dst: str, factor: int, rng) -> None:
    tab = pq.read_table(os.path.join(src, "documents.parquet"))
    n = tab.num_rows
    langs = tab.column("lang").to_pylist()
    sources = tab.column("source").to_pylist()
    new_n = n * (factor - 1)
    texts, nchars = [], []
    counts = rng.integers(10, 101, size=new_n)
    for c in counts:
        words = rng.choice(VOCAB, size=c)
        t = " ".join(words) + " "
        texts.append(t)
        nchars.append(len(t))
    new = pa.table(
        {
            "doc_id": pa.array(np.arange(n, n + new_n), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([langs[i % n] for i in range(new_n)]),
            "source": pa.array([sources[i % n] for i in range(new_n)]),
            "n_chars": pa.array(nchars, type=pa.int64()),
        },
        schema=tab.schema,
    )
    pq.write_table(pa.concat_tables([tab, new]), os.path.join(dst, "documents.parquet"))


def scale_embeddings(src: str, dst: str, factor: int, rng) -> None:
    tab = pq.read_table(os.path.join(src, "embeddings.parquet"))
    n = tab.num_rows
    dim = len(tab.column("embedding")[0])
    new_n = n * (factor - 1)
    vecs = rng.standard_normal((new_n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    new = pa.table(
        {
            "vec_id": pa.array(np.arange(n, n + new_n), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=tab.schema.field("embedding").type),
            "label": pa.array(rng.integers(0, 10, size=new_n), type=pa.int32()),
        },
        schema=tab.schema,
    )
    pq.write_table(pa.concat_tables([tab, new]), os.path.join(dst, "embeddings.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/bigdata/sf1.0")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--seed", type=int, default=9)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for fn in ("nation.parquet", "region.parquet"):
        shutil.copy(os.path.join(args.src, fn), os.path.join(args.dst, fn))
    for fn in KEYED:
        scale_keyed(args.src, args.dst, fn, args.factor)
    scale_documents(args.src, args.dst, args.factor, rng)
    scale_embeddings(args.src, args.dst, args.factor, rng)
    with open(os.path.join(args.dst, "_DONE"), "w") as fh:
        fh.write("ok\n")
    print("wrote", args.dst)


if __name__ == "__main__":
    main()

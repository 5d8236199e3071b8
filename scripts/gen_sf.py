#!/usr/bin/env python3
"""Deterministic sf1 synthesis from the sf0.1 fixture (dev tooling —
NOT part of the library; the library never reads this output except
when bench is pointed at it).

Scale story: 10 key-shifted replicas of every scaling table, so row
counts and join fan-outs grow 10x while region/nation stay fixed
(TPC-H semantics). Two tables need more than a key shift to keep
their SIMILARITY structure linear instead of quadratic:

- documents: each replica's texts are rewritten through a seeded
  PERMUTATION of the global vocabulary. Within a replica, word
  equality (hence shingles, near-dup pairs, TF) is preserved exactly;
  across replicas, texts look like unrelated docs drawn from the same
  vocabulary. Near-dup pair counts therefore grow ~10x (per-replica
  structure), not ~100x (as naive text copies would).
- embeddings: each replica permutes the vector DIMENSIONS (seeded).
  Norms and within-replica cosines are exact; cross-replica cosines
  scramble to background level, so ANN neighbor structure grows
  linearly too.

Usage: python3 scripts/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys
import random
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC, DST, N = sys.argv[1], sys.argv[2], int(sys.argv[3] if len(sys.argv) > 3 else 10)
SEED = 42

import os
os.makedirs(DST, exist_ok=True)

def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")

def write(name, table):
    pq.write_table(table, f"{DST}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")

def shift(table, col, amount):
    i = table.schema.get_field_index(col)
    return table.set_column(i, table.schema.field(i),
                            pc.add(table.column(col), amount))

def replicate(name, keyshifts):
    """keyshifts: {col: stride}; replica r shifts col by r*stride."""
    base = read(name)
    parts = []
    for r in range(N):
        t = base
        for col, stride in keyshifts.items():
            t = shift(t, col, r * stride)
        parts.append(t)
    write(name, pa.concat_tables(parts))

# strides: one power-of-ten above each table's max key so replica id
# is readable in the key and ranges can never collide
def stride_of(name, col):
    t = read(name)
    m = pc.max(t.column(col)).as_py()
    s = 1
    while s <= m:
        s *= 10
    return s

CK = stride_of("customer", "c_custkey")
OK = stride_of("orders", "o_orderkey")
PK = stride_of("part", "p_partkey")
SK = stride_of("supplier", "s_suppkey")
EK = stride_of("events", "event_id")
UK = stride_of("events", "user_id")
DK = stride_of("documents", "doc_id")
VK = stride_of("embeddings", "vec_id")

# fixed dims
for t in ("region", "nation"):
    write(t, read(t))

replicate("customer", {"c_custkey": CK})
replicate("supplier", {"s_suppkey": SK})
replicate("part", {"p_partkey": PK})
replicate("orders", {"o_orderkey": OK, "o_custkey": CK})
replicate("lineitem", {"l_orderkey": OK, "l_partkey": PK, "l_suppkey": SK})
replicate("events", {"event_id": EK, "user_id": UK})

# documents: vocab-permuted replicas
docs = read("documents")
texts = docs.column("text").to_pylist()
vocab = sorted({w for t in texts for w in t.split(" ") if w})
doc_parts = []
for r in range(N):
    rng = random.Random(SEED + r)
    perm = vocab[:]
    if r > 0:
        rng.shuffle(perm)
    mapping = dict(zip(vocab, perm))
    new_texts = [" ".join(mapping.get(w, w) for w in t.split(" ")) for t in texts]
    t = docs
    t = shift(t, "doc_id", r * DK)
    ti = t.schema.get_field_index("text")
    t = t.set_column(ti, t.schema.field(ti), pa.array(new_texts, pa.string()))
    ni = t.schema.get_field_index("n_chars")
    t = t.set_column(ni, t.schema.field(ni),
                     pa.array([len(x) for x in new_texts], pa.int64()))
    doc_parts.append(t)
write("documents", pa.concat_tables(doc_parts))

# embeddings: dimension-permuted replicas
emb = read("embeddings")
vecs = emb.column("embedding").to_pylist()
dim = len(vecs[0])
emb_parts = []
for r in range(N):
    rng = random.Random(SEED * 1000 + r)
    perm = list(range(dim))
    if r > 0:
        rng.shuffle(perm)
    new_vecs = [[v[p] for p in perm] for v in vecs]
    t = shift(emb, "vec_id", r * VK)
    ei = t.schema.get_field_index("embedding")
    t = t.set_column(ei, t.schema.field(ei),
                     pa.array(new_vecs, pa.list_(pa.float32())))
    emb_parts.append(t)
write("embeddings", pa.concat_tables(emb_parts))
print("done:", DST)

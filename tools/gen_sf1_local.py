"""Generate a LOCAL sf1-scale measurement corpus (NOT driver data).

The driver's round-end bench runs at sf=1.0 with tables ~10x sf0.1
(documents 50k, embeddings 20k, TPC-H-ish tables 10x).  The driver's
generator is not in-repo, so this synthesizes a distribution-matched
stand-in from the sf0.1 tables: documents are fresh word-salad drawn
from the empirical sf0.1 vocabulary/length distribution (same shared-
vocab shape that makes LSH buckets fat), embeddings are fresh vectors
from the sf0.1 per-dimension ranges, and the relational tables are
sf0.1 rows replicated with shifted keys.  Deterministic (seed 42).

Output: /root/sf1_local/<table>.parquet — used ONLY by bench_extra.py
for before/after measurement at driver scale; never read by declared
queries, never committed.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1_local"
SCALE = 10


def docs() -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = t["text"].to_pylist()
    vocab = sorted({w for s in texts for w in s.split()})
    lens = [len(s.split()) for s in texts]
    langs = t["lang"].to_pylist()
    sources = sorted(set(t["source"].to_pylist()))
    rng = random.Random(42)
    n = t.num_rows * SCALE
    out_text, out_lang, out_src, out_n = [], [], [], []
    for i in range(n):
        L = lens[rng.randrange(len(lens))]
        s = " ".join(rng.choice(vocab) for _ in range(L))
        out_text.append(s)
        out_lang.append(langs[rng.randrange(len(langs))])
        out_src.append(sources[rng.randrange(len(sources))])
        out_n.append(len(s))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=t.schema.field("doc_id").type),
            "text": out_text,
            "lang": out_lang,
            "source": out_src,
            "n_chars": pa.array(out_n, type=t.schema.field("n_chars").type),
        }
    )
    pq.write_table(tbl, os.path.join(OUT, "documents.parquet"))
    print("documents", n)


def embeddings() -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    emb = np.array(t["embedding"].to_pylist())
    rng = np.random.default_rng(42)
    n = t.num_rows * SCALE
    lo, hi = emb.min(axis=0), emb.max(axis=0)
    fresh = rng.uniform(lo, hi, size=(n, emb.shape[1])).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=t.schema.field("vec_id").type),
            "embedding": pa.array(
                [list(map(float, r)) for r in fresh],
                type=t.schema.field("embedding").type,
            ),
            "label": pa.array(
                [t["label"][i % t.num_rows].as_py() for i in range(n)],
                type=t.schema.field("label").type,
            ),
        }
    )
    pq.write_table(tbl, os.path.join(OUT, "embeddings.parquet"))
    print("embeddings", n)


def relational() -> None:
    key_cols = {
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
        "part": ["p_partkey"],
        "events": [],
        "nation": None,  # fixed-size dims: copy as-is
        "region": None,
    }
    for name, keys in key_cols.items():
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        if keys is None:
            pq.write_table(t, os.path.join(OUT, f"{name}.parquet"))
            print(name, t.num_rows, "(copied)")
            continue
        parts = []
        for rep in range(SCALE):
            cols = {}
            for f in t.schema.names:
                col = t[f]
                if f in keys:
                    base = pa.compute.max(col).as_py() + 1
                    col = pa.compute.add(col, rep * base)
                cols[f] = col
            parts.append(pa.table(cols))
        big = pa.concat_tables(parts)
        pq.write_table(big, os.path.join(OUT, f"{name}.parquet"))
        print(name, big.num_rows)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    docs()
    embeddings()
    relational()

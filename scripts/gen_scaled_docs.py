#!/usr/bin/env python3
"""Deterministic documents/embeddings generator for scale validation.

The driver ships sf0.001/0.01/0.1 only; the 10x-beyond-bench scale run
(SCALING.md / BASELINE.md "sf1 validation") needs a bigger corpus of the
SAME shape. This mirrors the driver tables' observed distributions
(seed-fixed, no external data):

  documents: 31-word vocabulary, uniform 10..100 words/doc,
             langs en 40% / zh,es,fr,de 15% each, source = src{i%20},
             ~0.16% exact-duplicate rate (copy of an earlier doc)
  embeddings: 64-dim float32, 10 labels, vec ~ N(center_label, 0.125),
             centers ~ N(0, 0.008); 0.4 vectors per doc

Usage: gen_scaled_docs.py N_DOCS OUT_DIR [SEED]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en"] * 8 + ["zh"] * 3 + ["es"] * 3 + ["fr"] * 3 + ["de"] * 3


def main():
    n_docs = int(sys.argv[1])
    out = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rng = np.random.default_rng(seed)

    texts = []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.0016:
            texts.append(texts[int(rng.integers(0, i))])
        else:
            length = int(rng.integers(10, 101))
            words = rng.choice(VOCAB, size=length)
            texts.append(" ".join(words))
    docs = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[int(rng.integers(0, len(LANGS)))]
                          for _ in range(n_docs)]),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })

    n_vec = int(n_docs * 0.4)
    centers = rng.normal(0.0, 0.008, (10, 64))
    labels = rng.integers(0, 10, n_vec)
    vecs = (centers[labels] +
            rng.normal(0.0, 0.125, (n_vec, 64))).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })

    import os
    os.makedirs(out, exist_ok=True)
    # 8k-row groups: a single monolithic row group makes every Spark scan
    # of the file ONE task (a row group is the parquet split atom) — the
    # cluster-representative layout is many groups/files per table
    pq.write_table(docs, f"{out}/documents.parquet", row_group_size=8192)
    pq.write_table(emb, f"{out}/embeddings.parquet", row_group_size=8192)
    print(f"wrote {n_docs} docs, {n_vec} vecs -> {out}")


if __name__ == "__main__":
    main()

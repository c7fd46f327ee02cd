"""Deterministic sf-shaped table synthesizer (VERDICT r4 #4).

The driver ships parquet at sf{0.001,0.01,0.1}; the scale-step
evidence needs an sf1 (10x sf0.1). /root/testdata is read-only, so
this job regenerates the same SHAPE — column-for-column schemas and
the sf0.1 marginals measured from the real tables — at any sf, into a
writable dir:

  documents  sf*50,000 rows: the 31-word vocab, uniform 20 sources,
             lang mix {en .43, de/es/fr/zh ~.14}, n_chars 44-577
             (mean ~297), ~0.5% planted near-dup pairs (sf0.1 has a
             single jaccard pair at sf0.01 — dups are rare there too)
  embeddings sf*20,000 rows: 64-dim float32, 10 cluster labels
             (center + noise, so kmeans/ANN structure is real)
  events     sf*1,000,000 rows: 30-day ts span, 5 event types
             uniform, sf*15,000 users, value >= 0, props json

Pure numpy + pyarrow (no Spark session): 50k docs + 1M events in
seconds. Determinism: one fixed PCG64 seed per table.

Usage:  python jobs/synth_sf.py --sf 1 --out /dev/shm/sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "the query row stream line small group spark fast customer batch "
    "data sort value hash filter big dup column order a vector part "
    "scan slow agg key window table merge join"
).split()

LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.43, 0.1425, 0.1425, 0.1425, 0.1425]
ETYPES = ["view", "click", "error", "purchase", "signup"]


def gen_documents(n: int, out: str) -> None:
    rng = np.random.default_rng(520_001)
    n_words = rng.integers(8, 105, size=n)  # ~44..577 chars at ~5.5/word
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    texts: list[str] = []
    for i in range(n):
        w = rng.integers(0, len(VOCAB), size=n_words[i])
        texts.append(" ".join(VOCAB[j] for j in w))
    # planted near-dups: ~0.5% of docs copy the previous doc with one
    # word substituted — exercised by the jaccard/minhash family
    for i in range(199, n, 200):
        toks = texts[i - 1].split()
        if toks:
            toks[int(rng.integers(0, len(toks)))] = VOCAB[
                int(rng.integers(0, len(VOCAB)))
            ]
        texts[i] = " ".join(toks)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[k] for k in langs], pa.string()),
            "source": pa.array(
                [f"src{i % 20}" for i in range(n)], pa.string()
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_embeddings(n: int, out: str) -> None:
    rng = np.random.default_rng(520_002)
    dim, k = 64, 10
    centers = rng.normal(0.0, 0.09, size=(k, dim)).astype(np.float32)
    labels = rng.integers(0, k, size=n)
    vecs = centers[labels] + rng.normal(0.0, 0.075, size=(n, dim)).astype(
        np.float32
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                list(vecs.astype(np.float32)), pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def gen_events(n: int, n_users: int, out: str) -> None:
    rng = np.random.default_rng(520_003)
    span_us = 30 * 86400 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, size=n)) + np.int64(
        1_704_067_200_000_000  # 2024-01-01 UTC in epoch micros
    )
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n).astype(np.int64)
            ),
            "event_type": pa.array(
                [ETYPES[i] for i in rng.integers(0, len(ETYPES), size=n)],
                pa.string(),
            ),
            "value": pa.array(
                np.round(np.abs(rng.normal(90.0, 90.0, size=n)), 2)
            ),
            "props": pa.array(
                [
                    '{"k": %d}' % v
                    for v in rng.integers(0, 100, size=n)
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    n_docs = int(args.sf * 50_000)
    n_emb = int(args.sf * 20_000)
    n_ev = int(args.sf * 1_000_000)
    gen_documents(n_docs, args.out)
    gen_embeddings(n_emb, args.out)
    gen_events(n_ev, int(args.sf * 15_000), args.out)
    print(
        json.dumps(
            {"sf": args.sf, "out": args.out, "documents": n_docs,
             "embeddings": n_emb, "events": n_ev}
        )
    )


if __name__ == "__main__":
    main()

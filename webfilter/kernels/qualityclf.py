"""fastText-style quality classifier: logistic regression on hashed
character 4-grams, wiki-like (natural prose, any language) vs
spam-like (keyword stuffing, symbol/digit noise).

Web-curation pipelines gate or weight documents with exactly this
shape of model (a linear classifier over hashed n-gram features —
CCNet / LLaMA-style "looks like a reference page" scorers); here the
model is trained deterministically on first scoring call (lazily,
cached per process — ADVICE r3) from the embedded
corpora (positives: the per-language natural-prose training texts;
negatives: the keyword-stuffed spam text) with full-batch gradient
descent from a zero init — no external model files, no randomness.

Scoring follows the `langid.py` whole-batch discipline: one uint32
codepoint array for the entire Arrow batch, one hashing pass, one
bincount per doc, one mat-vec — zero per-document Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .corpora import LANGS, lang_training_text, spam_training_text

DIM = 1 << 12
_MASK = DIM - 1
NGRAM = 4

_FNV_PRIME = np.uint32(16777619)
_FNV_OFFSET = np.uint32(2166136261)


def _gram_ids(text: str) -> np.ndarray:
    """Hashed char-4gram ids for one training snippet (int64)."""
    cp = np.frombuffer(text.lower().encode("utf-32-le"), dtype=np.uint32)
    if cp.shape[0] < NGRAM:
        return np.empty(0, dtype=np.int64)
    h = np.full(cp.shape[0] - NGRAM + 1, _FNV_OFFSET, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for k in range(NGRAM):
            h = (h ^ cp[k : cp.shape[0] - NGRAM + 1 + k]) * _FNV_PRIME
    return (h & np.uint32(_MASK)).astype(np.int64)


def _featurize(ids: np.ndarray) -> np.ndarray:
    """L2-normalized hashed-count vector for one snippet."""
    v = np.zeros(DIM, dtype=np.float64)
    np.add.at(v, ids, 1.0)
    norm = np.linalg.norm(v)
    return v / norm if norm > 0 else v


def _training_set() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic windows over the embedded corpora: positives are
    overlapping slices of each language's prose text, negatives are
    slices of the spam text (cycled so every slice index exists)."""
    xs: list[np.ndarray] = []
    ys: list[float] = []
    win, step = 160, 40
    for lang in LANGS:
        t = lang_training_text(lang)
        for s in range(0, max(len(t) - win, 1), step):
            xs.append(_featurize(_gram_ids(t[s : s + win])))
            ys.append(1.0)
    spam = spam_training_text()
    spam = spam * (1 + (len(xs) * win) // max(len(spam), 1))
    n_neg = len(xs)  # balanced classes
    for i in range(n_neg):
        s = (i * step) % max(len(spam) - win, 1)
        xs.append(_featurize(_gram_ids(spam[s : s + win])))
        ys.append(0.0)
    return np.vstack(xs), np.array(ys, dtype=np.float64)


def _train(iters: int = 300, lr: float = 4.0, l2: float = 1e-4) -> tuple[np.ndarray, float]:
    """Full-batch logistic regression GD from a zero init —
    deterministic given the corpora (no shuffling, no RNG)."""
    X, y = _training_set()
    w = np.zeros(DIM, dtype=np.float64)
    b = 0.0
    m = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = p - y
        w -= lr * ((X.T @ g) / m + l2 * w)
        b -= lr * float(g.mean())
    return w.astype(np.float32), float(b)


_MODEL: tuple[np.ndarray, float] | None = None


def _weights() -> tuple[np.ndarray, float]:
    """Train lazily on first scoring call, cached per process
    (ADVICE r3: import-time training added ~fixed startup latency to
    every executor Python worker even when the quality gate is off).
    Still deterministic — same corpora, same zero init, no RNG."""
    global _MODEL
    if _MODEL is None:
        w, b = _train()
        # upcast once (bit-identical to the old per-batch
        # `_W[ids].astype(float64)`, minus the per-batch copy)
        _MODEL = (w.astype(np.float64), b)
    return _MODEL


def quality_prob_batch(texts: pd.Series) -> pd.Series:
    """P(wiki-like) per document, whole-batch vectorized (float64).

    Empty/too-short docs (< NGRAM chars) score 0.5 — no evidence
    either way; the heuristic rules handle degenerate docs upstream.
    """
    n = len(texts)
    out = np.full(n, 0.5, dtype=np.float64)
    if n == 0:
        return pd.Series(out)
    _W, _B = _weights()
    # ONE C-level encode of the whole batch (see langid.predict_batch:
    # utf-32-le has no BOM and len(str) == codepoint count, so the
    # per-doc offsets need no per-doc encode); doc_of via repeat is
    # O(total) vs searchsorted's O(total log n)
    texts_list = [t.lower() for t in texts.fillna("")]
    joined = "\x00".join(texts_list)
    doc_lens = np.fromiter(map(len, texts_list), dtype=np.int64, count=n)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    total = len(cp)
    if total < NGRAM:
        return pd.Series(out)
    widths = doc_lens + 1
    widths[-1] -= 1
    doc_of = np.repeat(np.arange(n, dtype=np.int64), widths)

    h = np.full(total - NGRAM + 1, _FNV_OFFSET, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for k in range(NGRAM):
            h = (h ^ cp[k : total - NGRAM + 1 + k]) * _FNV_PRIME
    ids = (h & np.uint32(_MASK)).astype(np.int64)
    valid = doc_of[: total - NGRAM + 1] == doc_of[NGRAM - 1 :]
    nul = cp == 0
    if nul.any():
        bad = nul[: total - NGRAM + 1].copy()
        for k in range(1, NGRAM):
            bad |= nul[k : total - NGRAM + 1 + k]
        valid &= ~bad
    ids = ids[valid]
    gram_doc = doc_of[: total - NGRAM + 1][valid]

    # per-doc dot(w, counts) / ||counts|| == w . x  in one pass:
    # bincount(doc, w[ids]) gives dot with UNnormalized counts; the
    # L2 norm needs per-doc gram counts per id — get it from a sparse
    # (doc, id) pair count
    dot = np.bincount(gram_doc, weights=_W[ids], minlength=n)
    pair = gram_doc * DIM + ids
    uniq, cnt = np.unique(pair, return_counts=True)
    sq = np.bincount(
        (uniq // DIM).astype(np.int64), weights=(cnt.astype(np.float64)) ** 2,
        minlength=n,
    )
    norm = np.sqrt(sq)
    has = norm > 0
    z = np.zeros(n, dtype=np.float64)
    z[has] = dot[has] / norm[has] + _B
    out[has] = 1.0 / (1.0 + np.exp(-z[has]))
    return pd.Series(out)

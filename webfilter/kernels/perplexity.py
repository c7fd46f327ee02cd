"""KenLM-style n-gram perplexity on hashed word bigrams.

Model: interpolated bigram/unigram LM over a 2**16-dim hashed word
space, trained deterministically at import from the embedded English
corpus. ppl(doc) = exp(-mean log P(w_i | w_{i-1})) with
P = lam * P_bigram + (1-lam) * P_unigram_smoothed, so unseen words /
incoherent sequences score high.

Vectorization contract: one numpy pass per Arrow batch (hash all
tokens of the batch at once), no per-row python in the hot loop
beyond tokenization — the north rule's "batched hashed n-gram
counts".
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .corpora import lang_training_text

DIM = 1 << 16
_MASK = np.uint64(DIM - 1)
_TOKEN = re.compile(r"[^\W\d_]+", re.UNICODE)

# splitmix64 finalizer — stable scalar word hash, vectorizable.
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _hash_words_fast(words: list[str]) -> np.ndarray:
    """Vectorized FNV-1a per word using a padded 2-D byte matrix."""
    if not words:
        return np.empty(0, dtype=np.int64)
    bs = [w.encode("utf-8")[:32] for w in words]
    maxlen = max(len(b) for b in bs)
    mat = np.zeros((len(bs), maxlen), dtype=np.uint64)
    lens = np.array([len(b) for b in bs])
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    idx = np.repeat(np.arange(len(bs)), lens)
    col = np.concatenate([np.arange(l) for l in lens]) if len(bs) else np.empty(0, int)
    mat[idx, col] = flat
    h = np.full(len(bs), 1469598103934665603, dtype=np.uint64)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for k in range(maxlen):
            active = k < lens
            h = np.where(active, (h ^ mat[:, k]) * prime, h)
        h = (h ^ (h >> np.uint64(30))) * _C1
        h = (h ^ (h >> np.uint64(27))) * _C2
        h = h ^ (h >> np.uint64(31))
    return (h & _MASK).astype(np.int64)


def tokenize(text: str) -> list[str]:
    return _TOKEN.findall(text.lower())


def _train() -> tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    words = tokenize(lang_training_text("en"))
    ids = _hash_words_fast(words)
    uni = np.zeros(DIM, dtype=np.float64)
    np.add.at(uni, ids, 1.0)
    k = 0.1
    log_uni = np.log((uni + k) / (uni.sum() + k * DIM))
    # bigram table as sorted key array (a<<16|b) + prob array, so
    # batch lookup is one vectorized searchsorted instead of a dict.
    keys = (ids[:-1].astype(np.int64) << 16) | ids[1:].astype(np.int64)
    uk, counts = np.unique(keys, return_counts=True)
    probs = counts / np.maximum(uni[(uk >> 16)], 1.0)
    floor = float(np.log(k / (uni.sum() + k * DIM)))
    return log_uni.astype(np.float64), uk, probs.astype(np.float64), floor


_LOG_UNI, _BI_KEYS, _BI_PROBS, _FLOOR = _train()
_LAM = 0.7


def _lookup_bigram(keys: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(_BI_KEYS, keys)
    pos = np.minimum(pos, len(_BI_KEYS) - 1)
    hit = _BI_KEYS[pos] == keys
    return np.where(hit, _BI_PROBS[pos], 0.0)


def score_batch(texts: pd.Series) -> pd.Series:
    """Batch perplexity -> float64 Series. Empty/token-free docs get
    the max penalty exp(-floor).

    Hashing and bigram lookup run over one flat token array for the
    whole batch; per-document means come from a segmented reduce.
    """
    texts = texts.fillna("")
    tok_lists = [tokenize(t) for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    out = np.full(len(texts), float(np.exp(-_FLOOR)), dtype=np.float64)
    ok = lens >= 2
    if ok.any():
        flat = [w for tl in tok_lists for w in tl]
        ids = _hash_words_fast(flat)
        doc_of = np.repeat(np.arange(len(texts)), lens)
        # bigram pairs exist where consecutive tokens share a doc
        left = np.arange(len(flat) - 1) if len(flat) > 1 else np.empty(0, int)
        same_doc = doc_of[:-1] == doc_of[1:] if len(flat) > 1 else np.empty(0, bool)
        li = left[same_doc]
        keys = (ids[li] << 16) | ids[li + 1]
        p_bi = _lookup_bigram(keys)
        p_uni = np.exp(_LOG_UNI[ids[li + 1]])
        logp = np.log(np.maximum(_LAM * p_bi + (1.0 - _LAM) * p_uni, np.exp(_FLOOR)))
        sums = np.zeros(len(texts), dtype=np.float64)
        np.add.at(sums, doc_of[li], logp)
        npairs = np.maximum(lens - 1, 1)
        out[ok] = np.exp(-(sums[ok] / npairs[ok]))
    return pd.Series(out)

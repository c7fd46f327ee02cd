"""fastText-style language identification on hashed character n-grams.

Model = one log-probability profile vector per language over a
2**14-dim hashed char-trigram space (multinomial Naive Bayes with
add-k smoothing), trained deterministically at import time from the
embedded corpora — no external model files, no randomness.

Scoring is fully vectorized: a batch of documents becomes one sparse
count pass in numpy; per-language scores are a dense mat-vec. This is
the "batched hashed n-gram counts, no per-row Python" stage demanded
by the north rule, replacing the reference's server-side ``ai_query``
scoring expression (databricks/model/bc_chat_ift/04_ift.py:193-194)
with a local deterministic model, delivered through the pandas-UDF
idiom of _setup/utils.py:61-63.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .corpora import LANGS, lang_training_text

DIM = 1 << 14
_MASK = DIM - 1
NGRAM = 3

# FNV-1a over uint32 lanes — stable across platforms/python versions
# (never use python hash(): PYTHONHASHSEED would break determinism).
_FNV_PRIME = np.uint32(16777619)
_FNV_OFFSET = np.uint32(2166136261)


def _normalize(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.lower()


def _trigram_hash_counts(text: str) -> np.ndarray:
    """Return hashed trigram ids for one document (uint32 array)."""
    if len(text) < NGRAM:
        return np.empty(0, dtype=np.int64)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    h = np.full(cp.shape[0] - NGRAM + 1, _FNV_OFFSET, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for k in range(NGRAM):
            h = (h ^ cp[k : cp.shape[0] - NGRAM + 1 + k]) * _FNV_PRIME
    return (h & np.uint32(_MASK)).astype(np.int64)


def _train() -> tuple[np.ndarray, list[str]]:
    profiles = np.zeros((len(LANGS), DIM), dtype=np.float64)
    for i, lang in enumerate(LANGS):
        ids = _trigram_hash_counts(lang_training_text(lang).lower())
        np.add.at(profiles[i], ids, 1.0)
    k = 0.5  # add-k smoothing
    counts = profiles + k
    logp = np.log(counts / counts.sum(axis=1, keepdims=True))
    return logp.astype(np.float32), list(LANGS)


_LOGP, _LABELS = _train()
_PRIOR = np.zeros(len(_LABELS), dtype=np.float32)  # uniform prior


def predict_batch(texts: pd.Series) -> pd.DataFrame:
    """Batch predict -> DataFrame(langid: str, langid_conf: float64).

    conf is the softmax posterior of the winning language over the
    per-ngram-normalized class log-likelihoods.
    """
    texts = _normalize(texts)
    n = len(texts)
    langs = np.empty(n, dtype=object)
    confs = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        # script-unique shortcut (standard langid practice): a
        # CJK-dominated document is zh regardless of n-gram noise
        # from spacing/segmentation.
        if t:
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            cjk = ((cp >= 0x4E00) & (cp <= 0x9FFF)).mean()
            if cjk >= 0.30:
                langs[i] = "zh"
                confs[i] = 0.5 + cjk / 2.0
                continue
        ids = _trigram_hash_counts(t)
        if ids.size == 0:
            langs[i] = "und"
            confs[i] = 0.0
            continue
        # sum of profile log-probs at observed ngrams, normalized by
        # ngram count so conf is length-invariant
        scores = _LOGP[:, ids].sum(axis=1) / ids.size + _PRIOR
        scores = scores - scores.max()
        p = np.exp(scores * 8.0)  # temperature sharpening
        p /= p.sum()
        j = int(np.argmax(p))
        langs[i] = _LABELS[j]
        confs[i] = float(p[j])
    return pd.DataFrame({"langid": langs, "langid_conf": confs})

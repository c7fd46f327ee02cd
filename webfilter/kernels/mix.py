"""splitmix64 finalizer — THE deterministic numpy hash mix shared by
every kernel that derives pseudo-randomness from integer streams
(minhash seed family, LSH hyperplanes, IVF init ranking, synthetic
corpus, perplexity feature hashing).  One definition: a typo in any
inline copy silently changes that consumer's "deterministic" output
(code-review r4c4 finding #9 — five identical copies existed).

Constants are splitmix64's published finalizer (Steele et al. 2014,
as in Vigna's public-domain reference implementation)."""

from __future__ import annotations

import numpy as np

GOLDEN_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 FINALIZER over uint64 (no increment —
    callers that need the sequence form add GOLDEN_GAMMA first)."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _C1
        x = (x ^ (x >> np.uint64(27))) * _C2
        return x ^ (x >> np.uint64(31))

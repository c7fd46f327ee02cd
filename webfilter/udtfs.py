"""Python UDTF surface (SURVEY §2.8 completeness): a table function
usable in LATERAL position.

DELIBERATE slow-path demo: a UDTF's eval() is a per-row Python
generator, which this repo bans from hot paths (the pipeline's
Python crossings are all whole-batch pandas/Arrow kernels). The
production form of this exact computation is JVM
`posexplode(split(...))` + groupBy — see `top_terms_per_lang` /
`frequent_terms`. This module exists so a user porting a UDTF-based
workload has the pattern, wired and oracle-tested, with the scale
caveat in one place. `useArrow=True` keeps transfer Arrow-batched
even though eval stays row-wise.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql.functions import udtf

# the repo-wide ASCII tokenizer class (rules.tokens_col / _WS):
# Python's bare str.split() splits on UNICODE whitespace (NBSP,
# U+3000, U+2028, ...) and silently diverges from the JVM/DuckDB
# sides on exotic-space text — found by the random differential fuzz
_ASCII_WS = re.compile(r"[ \t\n\v\f\r]+")


@udtf(returnType="term: string, tf: int", useArrow=True)
class TermCountsUDTF:
    """text -> one (term, tf) row per distinct whitespace token,
    terms in byte order (deterministic output order per doc)."""

    def eval(self, text: str | None):  # noqa: D102
        toks = [t for t in _ASCII_WS.split(text or "") if t]
        for term, tf in sorted(Counter(toks).items()):
            yield term, tf


def register_all(spark) -> None:
    spark.udtf.register("term_counts", TermCountsUDTF)

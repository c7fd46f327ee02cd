"""html(bytes) -> text extraction kernel.

The byte-identical-per-url invariant (BASELINE.json input_hint) lives
here: this module is a pure deterministic function of the input bytes
— no locale, no wall clock, no library-version-dependent parsing.
It is regex-based by design (the container has no bs4/lxml guarantee,
and a frozen kernel is easier to keep byte-stable than a parser
dependency).

Reference parity: this replaces the reference's row-UDF XML parse
(python/biomed_genai/retriever/pubmed_wf/pmc.py:90-117 and its
duplicate databricks/retriever/pubmed_wf/03_Curate_Articles.py:38-60),
with two deliberate changes (SURVEY.md §2.8 U2):

* vectorized: called on pandas batches from ``mapInPandas``, never
  per-row through the pickling UDF path;
* no silent ``None`` on failure — errors surface in an ``err`` column
  (the reference swallows exceptions at pmc.py:115-117, which makes
  downstream quality accounting untrustworthy).
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd

# --- charset sniffing ------------------------------------------------
# Deterministic policy: ASCII-scan the first 2048 bytes for a meta
# charset declaration; otherwise utf-8. Decode errors='replace'
# (U+FFFD), which is deterministic and Arrow-safe.
_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)
# utf-16 variants are EXCLUDED deliberately: a meta charset can only
# be ASCII-scanned out of an ASCII-compatible byte stream (real
# UTF-16 interleaves NULs, so `<meta` never matches), which means a
# matched utf-16 label is always a mislabeled 8-bit page — and
# strict-decoding it as utf-16 "succeeds" on any even-length input,
# producing CJK-range mojibake that langid then confidently labels
# zh (code-review r4c8 finding #2, reproduced). HTML5 §4.2.5.5
# mandates treating a declared utf-16 meta charset as utf-8 for
# exactly this reason.
_KNOWN_CHARSETS = {
    "utf-8", "utf8", "latin-1", "latin1", "iso-8859-1", "windows-1252",
    "cp1252", "ascii", "us-ascii",
}

_SCRIPT_STYLE = re.compile(
    # explicit per-tag alternation, NOT <(script|style|...)>.*?</\1>:
    # the backreference form disables sre's literal-prefix scan and
    # measured ~30% slower on the same corpus (round-3 kernel
    # experiment); the alternation is match-identical because the
    # four tag names are distinct literals
    r"<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>"
    r"|<noscript\b[^>]*>.*?</noscript\s*>|<template\b[^>]*>.*?</template\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_TITLE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
# tags whose close (or self) implies a line break in the text flow
_BLOCK_BREAK = re.compile(
    r"(?:</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article|"
    r"header|footer|pre|figure)\s*>|<br\s*/?>|<hr\s*/?>)",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]*>")
# horizontal-whitespace normalization, two C-speed steps instead of
# one "[ \t\r\f\v\u00a0]+" -> " " regex: that pattern matches EVERY
# single inter-word space (a no-op replacement per word gap) and was
# the hottest regex in the whole kernel \u2014 0.95 s of a 1.45 s regex
# budget per 21k docs (round-3 profile). translate() maps the exotic
# hspace chars to ' ' in one C pass, then only genuine runs match.
# Byte-identical to the old pattern (fuzz-verified over whitespace
# mixes); _HSPACE kept as the semantic reference.
_HSPACE = re.compile("[ \\t\\r\\f\\v\u00a0]+")
_HSPACE_TR = str.maketrans({"\t": " ", "\r": " ", "\f": " ", "\v": " ", "\u00a0": " "})
_SP_RUN = re.compile(" {2,}")
_MULTI_NL = re.compile(r"\n{3,}")


def sniff_charset(raw: bytes) -> str:
    m = _META_CHARSET.search(raw[:2048])
    if m:
        enc = m.group(1).decode("ascii", "replace").lower()
        if enc in _KNOWN_CHARSETS:
            return enc
    return "utf-8"


def extract_one(raw: bytes | None) -> tuple[str, str, str]:
    """bytes -> (text, title, err). err is '' when clean."""
    if raw is None:
        return "", "", "null_html"
    if not raw:
        return "", "", "empty_html"
    err = ""
    enc = sniff_charset(raw)
    try:
        doc = raw.decode(enc, errors="strict")
    except (UnicodeDecodeError, LookupError):
        doc = raw.decode("utf-8", errors="replace")
        err = f"decode_replace:{enc}"

    # comments/scripts strip BEFORE the title search: a commented-out
    # or script-embedded <title> must not shadow the real one
    # (code-review r4c8 finding #3, reproduced)
    stripped = _SCRIPT_STYLE.sub(" ", _COMMENT.sub("", doc))
    title_m = _TITLE.search(stripped)
    title = ""
    if title_m:
        title = _htmllib.unescape(_ANY_TAG.sub("", title_m.group(1))).strip()

    body = stripped
    body = _TITLE.sub(" ", body)
    body = _BLOCK_BREAK.sub("\n", body)
    body = _ANY_TAG.sub(" ", body)
    body = _htmllib.unescape(body)
    # whitespace normalization: horizontal runs -> single space,
    # strip line edges, >=3 newlines -> exactly 2, strip document.
    body = _SP_RUN.sub(" ", body.translate(_HSPACE_TR))
    lines = [ln.strip() for ln in body.split("\n")]
    body = "\n".join(lines)
    body = _MULTI_NL.sub("\n\n", body).strip("\n ").strip()
    return body, title, err


def extract_batch(html: pd.Series) -> pd.DataFrame:
    """Vectorized wrapper over a pandas Series of bytes objects.

    The per-row loop is deliberate: regex HTML parsing has no numpy
    form, and Arrow batching already amortizes the JVM<->Python hop.
    It is still the hottest Python loop at 100 TB — the deploy-time
    swap is a C-backed extractor (selectolax/lxml-class) behind this
    same batch signature, mirroring the multimodal-kernel stub
    convention (multimodal.py); the byte-identity tests pin whatever
    kernel ships."""
    out = [extract_one(v) for v in html]
    return pd.DataFrame(out, columns=["text", "title", "err"])

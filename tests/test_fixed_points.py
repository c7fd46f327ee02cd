"""Fixed-point (idempotence) properties of the canonicalization
surfaces, checked in ONE Spark job each over the adversarial corpus:
applying the operator twice must equal applying it once. These are
the operations whose whole purpose is a canonical form — a
non-idempotent canonicalizer silently splits equivalence classes
between a first-pass corpus and a re-processed one (re-crawls,
backfills), which no per-value unit test catches."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_differential_fuzz import ADVERSARIAL_TEXTS

URLS = [
    "HTTPS://WWW.Example.COM:443/Path/A?utm_source=x&b=2&a=1#frag",
    "http://a.com:80/x?fbclid=1",
    "http://a.com/x?a=1&a=1&b=2",
    "http://h0.example.com/p/123",
    "relative/path?b=2&a=1#f",
    "",
    "no scheme at all",
    "http://host.com/%7Euser/путь?q=значение",
    "ftp://odd.scheme/x",
    "http://trailing.slash.com/dir/",
]


def _fixed_point(spark, values, expr_fn, colname="v"):
    df = spark.createDataFrame([(v,) for v in values], f"{colname} string")
    once = expr_fn(F.col(colname))
    out = df.select(
        once.alias("one"), expr_fn(once).alias("two")
    ).collect()
    bad = [(r["one"], r["two"]) for r in out if r["one"] != r["two"]]
    assert not bad, f"not idempotent on {len(bad)} inputs: {bad[:3]}"


def test_canonical_url_is_idempotent(spark):
    from webfilter.urls import canonical_url_col

    _fixed_point(spark, URLS, canonical_url_col)


def test_scrub_is_idempotent(spark):
    """Scrub placeholders must not themselves match any PII pattern —
    otherwise a re-scrubbed corpus diverges from the first pass."""
    from webfilter.scrub import scrubbed_col

    pii = [
        "mail bob@example.com twice bob@example.com",
        "ssn 123-45-6789 phone (555) 123-4567 and +1 555 123 4567",
        "mixed: a@b.co 999-99-9999 555-000-1111 end",
    ]
    _fixed_point(spark, ADVERSARIAL_TEXTS + pii, scrubbed_col)


def test_nfc_canon_is_idempotent_pure():
    """textstats.nfc_canon (the text_normalize canonical form) is a
    fixed point. The trap this pins: NFC-then-lower alone is NOT
    idempotent because lowercasing can DE-normalize — 'J̌'
    (no precomposed uppercase exists, NFC-stable) lowers to
    'ǰ' whose precomposed U+01F0 does exist; without the
    second NFC a re-processed corpus would hash differently from the
    first pass and 'J̌' would never collide with 'ǰ'."""
    from webfilter.textstats import nfc_canon

    cases = ADVERSARIAL_TEXTS + [
        "J\u030cab",  # the de-normalizing lowercase
        "\u01f0ab",  # its precomposed lowercase twin
        "İstanbul İ",
        "ﬁne ﬆop",
        None,
        "café café",
    ]
    for t in cases:
        once = nfc_canon(t)
        assert nfc_canon(once) == once, f"not idempotent on {t!r}"


def test_nfc_canon_collides_equivalent_forms():
    from webfilter.textstats import nfc_canon

    # decomposed uppercase == precomposed lowercase (the second-NFC fix)
    assert nfc_canon("J\u030cab") == nfc_canon("\u01f0ab")
    # composed vs decomposed accents
    assert nfc_canon("café") == nfc_canon("café")
    # case + whitespace shape
    assert nfc_canon("  A\t\tB  ") == nfc_canon("a b")

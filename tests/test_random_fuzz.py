"""Seeded-RANDOM differential fuzzing: a second corpus, drawn from
mixed unicode pools by a fixed-seed generator, replayed through every
documents-only oracle pair. The hand-picked adversarial corpus
(test_differential_fuzz.py) encodes the divergences we know about;
this one hunts the ones we don't — different lengths, pool mixes and
interleavings every char. Deterministic (seed pinned), so a failure
here is a reproducible dialect divergence, not flake.

Exclusions mirror the pinned-knowledge tests: U+0130 (the one known
lower() divergence, test_known_lowercase_dialect_divergence) is never
drawn.
"""

from __future__ import annotations

import random

import duckdb
import pytest

import __spark_entry__ as entry_mod
from test_differential_fuzz import FUZZ_QUERIES
from test_entry_contract import _value_multiset

_POOLS = [
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "0123456789",
    " \t\n\v\f\r",
    ".,;:!?()[]{}<>#$%^&*|~=+_\\/'\"-",
    "àâäéèêëïîôöùûüçñÀÉÈÇŠžŸ",
    "абвгдежзиклмнопрстуфхцчшщэюяАБВГД",
    "中文漢字日本語ひらがなカタカナ한국어",
    "مرحباشلوم עבריתαβγδεζηθ",
    "🙂🚀🎉𝕊𝕡𝕒𝕣𝕜𝓤𝓷𝓲",
    "́̇̌­​‍⁠",  # combining/invisible
    "    　",  # exotic whitespace
    "\x00\x1f\x01",  # control bytes
]


def _random_texts(n: int = 48, seed: int = 0xF00D) -> list[str]:
    rng = random.Random(seed)
    out = []
    for i in range(n):
        ln = rng.choice([0, 1, 2, 5, 20, 80, 300, 800])
        # 1-3 pools per doc: realistic docs are NOT uniform soup, and
        # narrow pool mixes stress per-script paths harder
        pools = rng.sample(_POOLS, rng.randint(1, 3))
        s = "".join(rng.choice(rng.choice(pools)) for _ in range(ln))
        if rng.random() < 0.3:
            s = s + " " + s  # planted internal duplication
        out.append(s.replace("İ", "i"))  # known-divergent İ out
    return out


@pytest.fixture(scope="module")
def rand_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("randfuzz")
    texts = _random_texts()
    rows = [
        (i, t, ["en", "de", "ru", "zh"][i % 4], f"src{i % 5}", len(t))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def rand_duck(rand_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{rand_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_random_fuzz_oracle_match(spark, rand_duck, rand_dir, name):
    spark_pdf = entry_mod.queries()[name](spark, rand_dir).toPandas()
    duck_pdf = rand_duck.execute(entry_mod.oracle_sql()[name]).df()
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), f"{name}: columns"
    ms, md = _value_multiset(spark_pdf), _value_multiset(duck_pdf)
    if ms != md:
        only_s = [k for k in ms if ms[k] != md.get(k, 0)][:3]
        only_d = [k for k in md if md[k] != ms.get(k, 0)][:3]
        pytest.fail(
            f"{name}: value mismatch on random corpus (seed 0xF00D)\n"
            f" spark-only: {only_s}\n duck-only: {only_d}"
        )

"""Differential fuzzing of the EMBEDDING-family oracle pairs on
adversarial vectors — the companion to test_differential_fuzz.py's
text corpus.

A real embedding pipeline at crawl scale emits degenerate vectors:
all-zero rows (failed encoder calls), exact duplicates (dup docs),
negated pairs, near-zero magnitudes, values parked exactly on the
quantizer's rounding boundary (x*scale landing on .5 exercises
HALF_UP-vs-half-even dialect risk), float32 subnormals, and extreme
but in-domain magnitudes. Every vector-family oracle must agree
cross-engine on all of them; a disagreement is a portability bug in
the operator (rounding dialect, div-by-zero propagation, tie-break
instability), the exact class the text fuzz pass caught six of.

NaN/Inf embeddings are deliberately OUT of the corpus: the quantize
device is documented for finite inputs, and the pipeline's scoring
stage drops undecodable rows before vectors exist. A dedicated test
pins what each engine does with NaN so the boundary is explicit."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod
from test_entry_contract import _value_multiset

FUZZ_QUERIES = [
    "kmeans_assign",
    "semdedup_kmeans",
    "semdedup_drops",
    "simsearch_cosine_topk",
    "simsearch_lsh_md5",
    "dedup_embedding_md5",
    "simsearch_ivf_md5",
    "simsearch_pq_adc",
    "simsearch_ivfpq_adc",
]

DIM = 64


def _adversarial_vectors() -> list[list[float]]:
    rng = np.random.default_rng(0xFACE)
    base = rng.normal(0, 0.2, size=(8, DIM)).astype(np.float32)
    vs: list[np.ndarray] = [v for v in base]  # normal-ish inits (ids 0-7)
    zero = np.zeros(DIM, dtype=np.float32)
    vs.append(zero)  # all-zero (failed encoder)
    vs.append(zero.copy())  # duplicate zero
    vs.append(base[0].copy())  # exact duplicate of an init/centroid
    vs.append(-base[0])  # exact negation
    vs.append(base[1] * 1e-6)  # near-zero magnitude
    vs.append(np.full(DIM, 0.005, dtype=np.float32))  # x*100 ~ .5 boundary
    vs.append(np.full(DIM, -0.005, dtype=np.float32))  # negative boundary
    vs.append(np.full(DIM, 0.015, dtype=np.float32))  # 1.5 boundary
    vs.append(np.full(DIM, 0.9999, dtype=np.float32))  # near unit cap
    vs.append(np.full(DIM, -0.9999, dtype=np.float32))
    vs.append(np.array([1e-40] * DIM, dtype=np.float32))  # subnormal f32
    one_hot = np.zeros(DIM, dtype=np.float32)
    one_hot[0] = 1.0
    vs.append(one_hot)  # axis-aligned
    vs.append(np.roll(one_hot, 1))  # orthogonal axis
    alt = np.tile(np.array([0.5, -0.5], dtype=np.float32), DIM // 2)
    vs.append(alt)  # alternating signs, exact .5 components
    vs.append(alt.copy())  # and its duplicate
    vs += [v for v in rng.normal(0, 0.2, size=(8, DIM)).astype(np.float32)]
    return [[float(x) for x in v] for v in vs]


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("embfuzz")
    vecs = _adversarial_vectors()
    rows = [(i, v, f"lab{i % 3}") for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label string"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def fuzz_duck(fuzz_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{fuzz_dir}/embeddings.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_embedding_fuzz_oracle_match(spark, fuzz_duck, fuzz_dir, name):
    spark_pdf = entry_mod.queries()[name](spark, fuzz_dir).toPandas()
    duck_pdf = fuzz_duck.execute(entry_mod.oracle_sql()[name]).df()
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), f"{name}: columns"
    ms, md = _value_multiset(spark_pdf), _value_multiset(duck_pdf)
    if ms != md:
        only_s = [k for k in ms if ms[k] != md.get(k, 0)][:3]
        only_d = [k for k in md if md[k] != ms.get(k, 0)][:3]
        pytest.fail(
            f"{name}: value mismatch on adversarial vectors\n"
            f" spark-only: {only_s}\n duck-only: {only_d}"
        )


def test_quantize_rounding_dialects_agree_on_fuzz_corpus(spark, fuzz_dir):
    """The quantize device (round(x*scale)::BIGINT) is the root of
    every exact-integer vector oracle. Spark's F.round is HALF_UP
    (away from zero at .5); DuckDB's round() is also half-away for
    DOUBLE. Assert they agree component-wise on the whole adversarial
    corpus, including the engineered .5-boundary rows — if either
    engine changes dialect, this pinpoints the root cause instead of
    an opaque hash mismatch downstream."""
    from pyspark.sql import functions as F

    from webfilter.simsearch import quantized_vec

    got = {
        r["vec_id"]: list(r["q"])
        for r in spark.read.parquet(f"{fuzz_dir}/embeddings.parquet")
        .select("vec_id", quantized_vec(F.col("embedding"), 100).alias("q"))
        .collect()
    }
    con = duckdb.connect()
    want = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT vec_id, list_transform(embedding::DOUBLE[], "
            "x -> round(x * 100)::BIGINT) FROM read_parquet("
            f"'{fuzz_dir}/embeddings.parquet/*.parquet')"
        ).fetchall()
    }
    assert got == want


def test_nan_inf_quantize_boundary_pinned(spark):
    """Documents the out-of-domain boundary explicitly: BOTH engines
    REJECT quantizing non-finite doubles (Spark ANSI raises
    CAST_OVERFLOW on NaN/Inf -> BIGINT; DuckDB raises a
    ConversionException), so a crawl pipeline must scrub non-finite
    embeddings BEFORE any vector operator — neither engine silently
    produces a value the other could disagree with. If either engine
    ever starts returning values here, this pin fails and the domain
    exclusion must be re-evaluated."""
    from pyspark.sql import functions as F
    from pyspark.errors import PySparkException

    from webfilter.simsearch import quantized_vec

    df = spark.createDataFrame(
        [(0, [float("nan"), float("inf"), -float("inf"), 1.0])],
        "vec_id bigint, embedding array<double>",
    ).select(quantized_vec(F.col("embedding"), 100).alias("q"))
    with pytest.raises(PySparkException, match="CAST_OVERFLOW"):
        df.collect()
    con = duckdb.connect()
    with pytest.raises(duckdb.Error, match="[Cc]onversion"):
        con.execute(
            "SELECT list_transform([ 'NaN'::DOUBLE, 'Infinity'::DOUBLE,"
            " '-Infinity'::DOUBLE, 1.0::DOUBLE ],"
            " x -> round(x * 100)::BIGINT)"
        ).fetchone()

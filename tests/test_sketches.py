"""Property tests for the cross-engine sketch algebra (HLL, CMS).

These run against the DuckDB replica of the relational formulation:
tests/test_entry_contract.py proves the Spark plans hash-equal the
same SQL, so a property of the SQL algebra is a property of the
Spark operator — and DuckDB examples are ~100x cheaper than a
SparkSession per hypothesis case."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    yield c
    c.close()


def test_cms_never_underestimates_any_term(con):
    """CMS guarantee: estimate >= exact for EVERY element (not just
    the query's top-10), even at an adversarially narrow width (8
    columns -> every cell collides heavily)."""
    from webfilter.entry_queries import SQL_CMS_TERM_COUNTS

    sql = SQL_CMS_TERM_COUNTS.replace("% 512", "% 8").replace("LIMIT 10", "LIMIT 100000")
    df = con.execute(sql).df()
    assert len(df) > 1000  # every distinct shingle is a probe now
    assert (df["cms_n"] >= df["exact_n"]).all()
    assert (df["over"] >= 0).all()
    # the narrow sketch MUST collide somewhere on thousands of keys
    assert (df["over"] > 0).any()


def test_cms_estimate_is_min_over_rows(con):
    """Removing a row from the sketch can only raise estimates:
    d=4's estimate <= any single row's cell count (monotonicity of
    min); checked by comparing the d=4 sketch against d=1."""
    from webfilter.entry_queries import SQL_CMS_TERM_COUNTS

    d4 = con.execute(SQL_CMS_TERM_COUNTS).df().set_index("tok")
    d1 = con.execute(
        SQL_CMS_TERM_COUNTS.replace("range(4)", "range(1)")
    ).df().set_index("tok")
    joined = d4.join(d1, rsuffix="_d1", how="inner")
    assert (joined["cms_n"] <= joined["cms_n_d1"]).all()


def test_hll_registers_merge_associatively(con):
    """The HLL state is mergeable: per-register max over two corpus
    halves == register over the union (the property that lets 100 TB
    daily partitions keep sketches instead of re-scanning). Checked
    at the register level, not the estimate level."""
    reg_sql = """
    WITH tt AS (
      SELECT doc_id, lang,
        regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\v\\f\\r]+') AS toks
      FROM documents WHERE length(trim(text)) > 0 {half}),
    e AS (
      SELECT lang, unnest(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        ELSE list_transform(range(1, len(toks) - 1),
            i -> array_to_string(toks[i:i+2], ' ')) END) AS tok
      FROM tt),
    t AS (SELECT lang, h & 255 AS reg, h >> 8 AS w
          FROM (SELECT lang, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM e))
    SELECT lang, reg, max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS m_j
    FROM t GROUP BY lang, reg
    """
    full = con.execute(reg_sql.format(half="")).df()
    h0 = con.execute(reg_sql.format(half="AND doc_id % 2 = 0")).df()
    h1 = con.execute(reg_sql.format(half="AND doc_id % 2 = 1")).df()
    import pandas as pd

    merged = (
        pd.concat([h0, h1])
        .groupby(["lang", "reg"], as_index=False)["m_j"]
        .max()
    )
    f = full.sort_values(["lang", "reg"]).reset_index(drop=True)
    m = merged.sort_values(["lang", "reg"]).reset_index(drop=True)
    assert f.equals(m)


def test_hll_estimate_within_documented_bound(con):
    """|rel_err| stays within ~3 sigma of HLL's 1.04/sqrt(256) at the
    shingle cardinalities of the test corpus."""
    from webfilter.entry_queries import SQL_HLL_DISTINCT_TERMS

    df = con.execute(SQL_HLL_DISTINCT_TERMS).df()
    assert len(df) == 5
    assert (df["rel_err"].abs() < 3 * 1.04 / 16).all()


def test_bpe_merge_semantics_nonoverlap(tmp_path):
    """'aaa' + pair (a,a) must merge to (aa, a) — left-to-right
    non-overlapping, the classic BPE edge the doubled-separator
    encoding exists for — and once a word is a single symbol the
    remaining rounds emit nothing on BOTH engines (empty argmax)."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webfilter.entry_queries import SQL_BPE_MERGES

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": [0], "text": ["aaa aaa"], "lang": ["en"],
                  "source": ["s"], "n_chars": [7]}),
        d / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    rows = con.execute(SQL_BPE_MERGES + " ORDER BY round").fetchall()
    # vocab {aaa: 2}; round 0: (a,a) weight 2 positions x freq 2 = 4;
    # round 1: (aa, a) x freq 2; rounds 2-3: nothing left to merge
    assert rows == [(0, "a", "a", 4), (1, "aa", "a", 2)]
    # exhaustion must NOT empty the state (review finding): tokenize
    # still sees the whole corpus after the dry rounds
    from webfilter.entry_queries import SQL_BPE_TOKENIZE

    tok = con.execute(SQL_BPE_TOKENIZE).fetchall()
    assert tok == [(0, 2, 2, 6, 3.0)]


def test_bpe_spark_equals_oracle_on_crafted_corpus(spark, tmp_path):
    """Same crafted corpus through the SPARK implementation — the
    engines must agree including the merge-exhaustion behavior."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webfilter.entry_queries import q_bpe_merges

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": [0, 1], "text": ["aaa aaa", "abab ab"],
                  "lang": ["en", "en"], "source": ["s", "s"],
                  "n_chars": [7, 7]}),
        d / "documents.parquet",
    )
    got = [tuple(r) for r in q_bpe_merges(spark, str(d)).orderBy("round").collect()]
    # vocab {aaa:2, abab:1, ab:1}; r0 pairs: (a,a)=4, (a,b)=3, (b,a)=1
    # -> merge (a,a); r1: (aa,a)=2,(a,b)=3,(b,a)=1 -> (a,b);
    # r2: (aa,a)=2,(ab,ab)=1,(ab,)... 'abab'->(ab,ab); 'ab'->single
    # -> (aa,a)=2 wins; r3: 'aaa' single, (ab,ab)=1 wins
    assert got == [
        (0, "a", "a", 4),
        (1, "a", "b", 3),
        (2, "aa", "a", 2),
        (3, "ab", "ab", 1),
    ]


def test_bpe_tokenize_survives_merge_exhaustion_spark(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webfilter.entry_queries import q_bpe_tokenize

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": [0], "text": ["aaa aaa"], "lang": ["en"],
                  "source": ["s"], "n_chars": [7]}),
        d / "documents.parquet",
    )
    got = [tuple(r) for r in q_bpe_tokenize(spark, str(d)).collect()]
    assert got == [(0, 2, 2, 6, 3.0)]

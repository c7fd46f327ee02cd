"""Chunking-stage semantics (reference 04_Chunk parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webfilter import chunking


def test_fixed_chunks(spark):
    df = spark.createDataFrame([(1, "x" * 1200), (2, "y" * 50), (3, None)],
                               "doc_id long, text string")
    out = chunking.explode_chunks(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc1: 500+500+200 -> 3 chunks all >=110
    assert [len(r["chunk"]) for r in sorted(by_doc[1], key=lambda r: r["pos"])] == [500, 500, 200]
    assert by_doc[1][0]["chunk_id"] == "1-0"
    # doc2: 50 chars < 110 -> dropped entirely
    assert 2 not in by_doc and 3 not in by_doc


def test_paragraph_chunks_pack_and_gate(spark):
    text = "\n".join(["para " + "a" * 120] * 4 + ["tiny"])  # 4 x ~125 chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunking.explode_paragraph_chunks(df).collect()
    chunks = [r["chunk"] for r in sorted(rows, key=lambda r: r["pos"])]
    assert all(len(c) >= chunking.MIN_CHUNK_CHARS for c in chunks)
    assert all(len(c) <= chunking.MAX_CHARS for c in chunks)
    # all paragraph content preserved in order (modulo the dropped tail)
    joined = "\n".join(chunks)
    assert joined.startswith("para ")
    assert joined.count("para ") == 4


def test_paragraph_chunks_hard_split_long_para(spark):
    df = spark.createDataFrame([(1, "z" * 9000)], "doc_id long, text string")
    rows = chunking.explode_paragraph_chunks(df).collect()
    lens = sorted(len(r["chunk"]) for r in rows)
    assert sum(lens) == 9000
    assert max(lens) <= chunking.MAX_CHARS


def test_chunks_cover_text(spark, synth_dir):
    golden = spark.read.parquet(f"{synth_dir}/golden.parquet").limit(100)
    df = golden.select(F.xxhash64("url").alias("doc_id"), F.col("expected_text").alias("text"))
    out = chunking.explode_chunks(df)
    # reconstruction: concatenating fixed chunks in order gives a
    # prefix of the original (tail may be gated away)
    joined = (
        out.groupBy("doc_id")
        .agg(F.concat_ws("", F.array_sort(F.collect_list(F.struct("pos", "chunk"))).getField("chunk")).alias("recon"))
    )
    j = df.join(joined, "doc_id")
    bad = j.filter(~F.col("text").startswith(F.col("recon"))).count()
    assert bad == 0

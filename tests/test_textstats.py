"""Crafted-row semantics for textstats.gopher_repetition_signals —
the oracle checks cross-engine agreement at sf0.01; this pins the
hand-computed values (tie-break, overlap > 1.0, short/empty docs)."""


def test_gopher_repetition_signals_golden(spark):
    from webfilter.textstats import gopher_repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a b a b a b x"),  # 13 chars, "a b" x3, 4-gram overlap > 1
            (2, "all tokens here are unique okay friend"),
            (3, ""),
            (4, "one two"),  # shorter than every dup-n
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in gopher_repetition_signals(df).collect()}
    r1 = out[1]
    # top 2-gram "a b" x3 -> 3*3 chars / 13
    assert abs(r1.top_2gram_char_frac - 9 / 13) < 1e-12
    # 3-gram tie ("a b a" vs "b a b", both x2) breaks by gram DESC
    assert abs(r1.top_3gram_char_frac - 10 / 13) < 1e-12
    # "a b a b" x2 -> 14/13: occurrence-counted form may exceed 1.0
    assert r1.top_4gram_char_frac > 1.0
    assert r1.dup_5gram_char_frac == 0.0
    # unique-gram doc: top fraction counts the freq-1 top gram (Gopher
    # semantics), dup fractions are 0
    assert out[2].top_2gram_char_frac > 0 and out[2].dup_10gram_char_frac == 0.0
    # empty + too-short docs survive with all-zero signals
    assert out[3].top_2gram_char_frac == 0.0
    assert out[4].dup_5gram_char_frac == 0.0 and out[4].top_2gram_char_frac > 0


def test_quality_score_null_text_is_null(spark):
    from pyspark.sql import functions as F

    from webfilter.textstats import quality_score_col

    df = spark.createDataFrame([(None,), ("hello world.",)], "text string")
    got = [r[0] for r in df.select(quality_score_col(F.col("text"))).collect()]
    assert got[0] is None and got[1] is not None

"""Vectorized model-scoring stage: langid + perplexity in ONE
Arrow-batched pandas UDF.

One UDF (not two) so each text batch crosses the JVM<->Python Arrow
boundary exactly once; the struct return + single projection apart is
the reference's nested-struct UDF pattern
(python/biomed_genai/retriever/pubmed_wf/pmc.py:90-96 projected at
databricks/retriever/pubmed_wf/03_Curate_Articles.py:67-78), done
vectorized per the pandas_udf template at
databricks/model/bc_chat_ift/_setup/utils.py:61-63.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("langid", T.StringType()),
        T.StructField("langid_conf", T.DoubleType()),
        T.StructField("perplexity", T.DoubleType()),
        T.StructField("quality_prob", T.DoubleType()),
    ]
)


@F.pandas_udf(SCORE_SCHEMA)
def score_udf(text: pd.Series) -> pd.DataFrame:
    # imports inside the UDF so executors train the model once per
    # python worker (module import is cached), never per batch
    from webfilter.kernels import langid as _langid
    from webfilter.kernels import perplexity as _ppl
    from webfilter.kernels import qualityclf as _qclf

    out = _langid.predict_batch(text)
    # low-confidence predictions are unreliable -> 'und' (fastText
    # convention); threshold matches RuleConfig.min_langid_conf
    mask = out["langid_conf"] < 0.5
    out.loc[mask, "langid"] = "und"
    out["perplexity"] = _ppl.score_batch(text)
    out["quality_prob"] = _qclf.quality_prob_batch(text)
    return out


def with_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds langid, langid_conf, perplexity via one Arrow round-trip."""
    return df.withColumn("_score", score_udf(F.col(text_col))).select(
        "*", "_score.langid", "_score.langid_conf", "_score.perplexity",
        "_score.quality_prob",
    ).drop("_score")


EXTRACT_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("extract_err", T.StringType()),
        T.StructField("langid", T.StringType()),
        T.StructField("langid_conf", T.DoubleType()),
        T.StructField("perplexity", T.DoubleType()),
        T.StructField("quality_prob", T.DoubleType()),
    ]
)


@F.pandas_udf(EXTRACT_SCORE_SCHEMA)
def extract_score_udf(html: pd.Series) -> pd.DataFrame:
    """Fused extract+score: the html bytes cross the Arrow boundary
    once and the extracted text never round-trips back to the JVM for
    a second UDF — one Python hop for the whole model stage (the hot
    path at 100 TB is Arrow serialization, not the kernels)."""
    from webfilter.kernels import langid as _langid
    from webfilter.kernels import perplexity as _ppl
    from webfilter.kernels import qualityclf as _qclf
    from webfilter.kernels.extract import extract_batch

    out = extract_batch(html).rename(columns={"err": "extract_err"})
    scores = _langid.predict_batch(out["text"])
    mask = scores["langid_conf"] < 0.5
    scores.loc[mask, "langid"] = "und"
    out["langid"] = scores["langid"]
    out["langid_conf"] = scores["langid_conf"]
    out["perplexity"] = _ppl.score_batch(out["text"])
    out["quality_prob"] = _qclf.quality_prob_batch(out["text"])
    return out


def with_extract_and_scores(df: DataFrame, html_col: str = "html") -> DataFrame:
    """html -> text/title/err/langid/conf/ppl in ONE pandas-UDF pass.
    Replaces with_extracted_text + with_scores in the pipeline."""
    cols = [
        c
        for c in df.columns
        if c not in ("text", "title", "extract_err", "langid", "langid_conf",
                     "perplexity", "quality_prob")
    ]
    return df.withColumn("_es", extract_score_udf(F.col(html_col))).select(
        *cols,
        "_es.text", "_es.title", "_es.extract_err",
        "_es.langid", "_es.langid_conf", "_es.perplexity", "_es.quality_prob",
    )

"""Spark stage: html BINARY -> (text, title, extract_err) via one
Arrow-batched pandas UDF around the frozen kernel
(webfilter/kernels/extract.py).

Replaces the reference's row-pickled parse UDF
(python/biomed_genai/retriever/pubmed_wf/pmc.py:90-117 /
databricks/retriever/pubmed_wf/03_Curate_Articles.py:38-60); errors
surface in a column instead of a silent None (pmc.py:115-117).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("extract_err", T.StringType()),
    ]
)


@F.pandas_udf(EXTRACT_SCHEMA)
def extract_udf(html: pd.Series) -> pd.DataFrame:
    from webfilter.kernels.extract import extract_batch

    out = extract_batch(html)
    return out.rename(columns={"err": "extract_err"})


def with_extracted_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds text/title/extract_err. The html column is the source of
    truth (SURVEY.md §7 hard parts): any pre-existing `text` column is
    replaced, never trusted."""
    cols = [c for c in df.columns if c not in ("text", "title", "extract_err")]
    return (
        df.withColumn("_ex", extract_udf(F.col(html_col)))
        .select(*cols, "_ex.text", "_ex.title", "_ex.extract_err")
    )

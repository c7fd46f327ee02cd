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


def xml_title_col(xml: "F.Column") -> "F.Column":
    """JVM-side title pull for WELL-FORMED XML/XHTML documents via the
    built-in xpath_string — reference P12 parity
    (databricks/retriever/pubmed_wf/04_Chunk_Articles_Content.py:96-99
    uses xpath_string on curated article XML). Real web HTML is rarely
    well-formed XML, so the robust path stays the regex kernel
    (kernels/extract.py); this is the fast path when the corpus is
    known-XML (e.g. re-chunking a curated table)."""
    return F.xpath_string(xml, F.lit("//title"))


def with_xml_title(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Adds xml_title from a well-formed-XML string column (see
    xml_title_col; whole-stage-codegen'd, zero Python)."""
    return df.withColumn("xml_title", xml_title_col(F.col(xml_col)))


def with_extracted_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds text/title/extract_err. The html column is the source of
    truth (SURVEY.md §7 hard parts): any pre-existing `text` column is
    replaced, never trusted."""
    cols = [c for c in df.columns if c not in ("text", "title", "extract_err")]
    return (
        df.withColumn("_ex", extract_udf(F.col(html_col)))
        .select(*cols, "_ex.text", "_ex.title", "_ex.extract_err")
    )

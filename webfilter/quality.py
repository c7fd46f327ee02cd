"""Model-based quality scoring stage: the hashed-ngram logistic
classifier (`kernels/qualityclf.py`) delivered as an Arrow pandas
UDF — the model-scorer counterpart of the heuristic
`textstats.quality_score_col` (which stays pure Column).

Same pipeline posture as langid/perplexity: a narrow mapInArrow-class
stage, one Python crossing per batch, whole-batch numpy inside.
Pipelines combine it with the heuristic rules as
``quality_prob >= threshold`` — a drop-in additional gate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def quality_prob_udf(texts: pd.Series) -> pd.Series:
    from .kernels.qualityclf import quality_prob_batch

    return quality_prob_batch(texts)


def with_quality_prob(
    df: DataFrame, text_col: str = "text", out_col: str = "quality_prob"
) -> DataFrame:
    return df.withColumn(out_col, quality_prob_udf(F.col(text_col)))

"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship quality-filter pipeline on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data ops); see webfilter/entry_queries.py.
oracle_sql()  — DuckDB-equivalent SQL for every SQL-expressible op;
                model/hash-based ops are rows-only by design.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from webfilter.entry_queries import REGISTRY, q_filter_full  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_filter_full(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}

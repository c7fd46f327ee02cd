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

_REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO))

from webfilter.entry_queries import REGISTRY, q_filter_full  # noqa: E402

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Executor python workers don't inherit the driver's sys.path —
    ship webfilter as a py-file zip once per SparkContext so
    pandas-UDF/mapInPandas stages can unpickle their kernels when the
    driver process runs outside the repo root."""
    sc = spark.sparkContext
    # applicationId, not id(sc): CPython reuses freed object ids, so
    # a new context could silently skip shipping (code-review r4c10
    # finding #6)
    key = sc.applicationId
    if key in _SHIPPED:
        return
    # ONE packager: session.ship_package builds a deterministic
    # *.py-only zip, so a session that already shipped (get_spark
    # does) and this entry path can never race or disagree on
    # contents (r4c10 findings #5/#9)
    from webfilter.session import ship_package

    ship_package(spark)
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    return q_filter_full(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}

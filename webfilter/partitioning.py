"""url-hash bucketing + explicit skew salting.

The reference's only physical hint is a blind ``repartition(64)``
before its expensive per-row stage
(python/biomed_genai/retriever/pubmed_wf/pmc.py:152). We replace it
with:

* deterministic url-hash buckets (``pmod(xxhash64(url), N)``) — the
  unit of checkpointing, lineage and idempotent overwrite; at 10^12
  docs N is sized so one bucket ~ a few hundred GB of input
  (N=4096-16384), while tests use N=16-64;
* a salt column for skewed keys: host-level aggregations use
  two-phase (salted partial -> final) aggregation so one hot host
  (FIXTURES.md demands ~35% of rows on 3 hosts) cannot pin a single
  reducer. AQE skew-join handles join-side skew; salting handles
  groupBy/UDF-stage skew, which AQE does not rebalance when the cost
  is in Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOST_REGEX = r"https?://([^/]+)"


def host_col(url: Column) -> Column:
    return F.regexp_extract(url, HOST_REGEX, 1)


def bucket_col(url: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")


def with_bucket(df: DataFrame, n_buckets: int, url_col: str = "url") -> DataFrame:
    return df.withColumn("bucket_id", bucket_col(F.col(url_col), n_buckets))


def salt_col(key: Column, n_salts: int) -> Column:
    # salt from a *different* hash of the same row key so (key, salt)
    # spreads a hot key across n_salts reducers deterministically
    return F.pmod(F.xxhash64(key, F.lit(0x5A17)), F.lit(n_salts)).cast("int")


def salted_repartition(
    df: DataFrame, num_partitions: int, key: str, n_salts: int = 16
) -> DataFrame:
    """Repartition by (key, salt): co-locates mostly by key but caps
    any single key's share of one partition at ~1/n_salts."""
    return df.repartition(num_partitions, F.col(key), salt_col(F.col(key), n_salts))


def salted_count_by_key(
    df: DataFrame, key: str, n_salts: int = 16, aggs: dict[str, Column] | None = None
) -> DataFrame:
    """Two-phase skew-safe aggregation: partial per (key, salt), then
    final per key. Default aggregation is count + kept-count; pass
    ``aggs`` as {name: sum-able Column} for more.

    At 100 TB this turns one 35%-of-the-data reducer into n_salts
    parallel partials — map-side combine does most of the work and
    the final shuffle moves only n_keys * n_salts rows.
    """
    aggs = aggs or {}
    salted = df.withColumn("_salt", salt_col(F.col(key), n_salts))
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_pc"),
        *[v.alias(f"_p_{k}") for k, v in aggs.items()],
    )
    final = partial.groupBy(key).agg(
        F.sum("_pc").alias("n_rows"),
        *[F.sum(f"_p_{k}").alias(k) for k in aggs],
    )
    return final

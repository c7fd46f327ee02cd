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

def host_col(url: Column) -> Column:
    """THE per-host key — delegates to urls.host_col so the host
    audit/salting key can never diverge from the host_rank and
    robots joins (code-review r4c6 finding #1: an inline
    case-sensitive regex here kept port/userinfo and returned ''
    instead of NULL, splitting one host's metrics across keys that
    no longer joined back to the rank/robots dimensions)."""
    from .urls import host_col as _urls_host_col

    return _urls_host_col(url)


def bucket_col(url: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")


def with_bucket(df: DataFrame, n_buckets: int, url_col: str = "url") -> DataFrame:
    return df.withColumn("bucket_id", bucket_col(F.col(url_col), n_buckets))


def salt_col(row_entropy: Column, n_salts: int) -> Column:
    """Per-ROW salt. ``row_entropy`` must vary *within* a hot group
    key (a finer-grained column like url, or a synthetic per-row id)
    — a salt derived from the group key itself would assign every row
    of a hot key the same salt and mitigate nothing."""
    return F.pmod(F.xxhash64(row_entropy, F.lit(0x5A17)), F.lit(n_salts)).cast("int")


def default_row_entropy() -> Column:
    """Fallback per-row entropy when no finer column exists:
    partition-local row ids. Deterministic given a fixed input
    partitioning; aggregation results are salt-invariant either way."""
    return F.monotonically_increasing_id()


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    key: str,
    n_salts: int = 16,
    salt_from: Column | str | None = None,
) -> DataFrame:
    """Repartition by (key, salt): co-locates mostly by key but caps
    any single key's share of one partition at ~1/n_salts."""
    ent = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    ent = default_row_entropy() if ent is None else ent
    return df.repartition(num_partitions, F.col(key), salt_col(ent, n_salts))


def salted_count_by_key(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    aggs: dict[str, Column] | None = None,
    salt_from: Column | str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: partial per (key, salt), then
    final per key. Default output is the row count (``n_rows``); pass
    ``aggs`` as {name: sum-able Column} for more, and ``salt_from``
    as a per-row-varying column (e.g. url when key=host) so hot keys
    actually spread across n_salts reducers.

    At 100 TB this turns one 35%-of-the-data reducer into n_salts
    parallel partials — map-side combine does most of the work and
    the final shuffle moves only n_keys * n_salts rows.
    """
    aggs = aggs or {}
    ent = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    ent = default_row_entropy() if ent is None else ent
    salted = df.withColumn("_salt", salt_col(ent, n_salts))
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_pc"),
        *[v.alias(f"_p_{k}") for k, v in aggs.items()],
    )
    final = partial.groupBy(key).agg(
        F.sum("_pc").alias("n_rows"),
        *[F.sum(f"_p_{k}").alias(k) for k in aggs],
    )
    return final


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a hash-BUCKETED parquet table (external, at
    ``path``), registered in the session catalog so later scans carry
    the bucketing spec into the planner.

    This is the write-once/join-many contract for 100 TB: bucket the
    big fact tables by their join key (url/host/doc_id) at ingest,
    and every subsequent equi-join or aggregation on that key is
    EXCHANGE-FREE — Spark's planner proves co-location from the
    catalog bucketing spec instead of shuffling 100 TB per query
    (`colocated_join` + tests/test_bucketed.py assert zero Exchange
    nodes in the physical plan). The reference's one physical hint is
    a blind repartition(64) (pmc.py:152) re-paid on every run; a
    bucketed table pays the partitioning shuffle once, at write time.

    ``sort`` additionally sorts within each bucket file, which lets
    the parquet reader skip row groups on key predicates and cheapens
    the SMJ sort. Bucket counts must MATCH across tables that join
    together (the negative test shows a mismatched side reintroduces
    its Exchange).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.option("path", path).saveAsTable(table)


def colocated_join(spark, left_table: str, right_table: str, on, how: str = "inner") -> DataFrame:
    """Join two same-key same-bucket-count tables written by
    `write_bucketed` without any shuffle: reading via
    ``spark.table`` (NOT ``read.parquet``, which would drop the
    bucketing metadata) lets the planner emit a SortMergeJoin whose
    both children are bucket-aligned FileScans — zero Exchange nodes.
    The merge hint pins SMJ so plan assertions don't depend on
    size-based broadcast estimates; with co-located inputs SMJ is
    also the right physical choice at any scale."""
    lhs = spark.table(left_table).hint("merge")
    return lhs.join(spark.table(right_table), on, how)

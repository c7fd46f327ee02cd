"""Z-order clustering (webfilter/zorder.py): Morton key correctness
vs a pure-Python reference, exact binning, write-path locality."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from webfilter.zorder import interleave_bits, with_zorder, zorder_write


def _morton(vals: list[int], bits: int) -> int:
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 4095, 2048) for b in (0, 3, 4095, 1024)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", interleave_bits([F.col("a"), F.col("b")], 12).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton([a, b], 12), (a, b)


def test_interleave_three_dims_and_bit_budget(spark):
    df = spark.createDataFrame([(3, 5, 6)], "a long, b long, c long")
    z = df.select(
        interleave_bits([F.col("a"), F.col("b"), F.col("c")], 4).alias("z")
    ).collect()[0]["z"]
    assert z == _morton([3, 5, 6], 4)
    with pytest.raises(ValueError):
        interleave_bits([F.col("a"), F.col("b"), F.col("c")], 21)


def test_with_zorder_exact_binning_and_degenerate_span(spark):
    # range [10, 20] binned to 12 bits: endpoints map to 0 and 4095
    # exactly; a constant dim bins to 0 (no divide-by-zero)
    df = spark.createDataFrame([(10, 7), (20, 7), (15, 7)], "x long, k long")
    out = {
        r["x"]: r["zval"]
        for r in with_zorder(df, ["x", "k"], bits=12).collect()
    }
    assert out[10] == _morton([0, 0], 12)
    assert out[20] == _morton([4095, 0], 12)
    assert out[15] == _morton([(5 * 4095) // 10, 0], 12)


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    """After a z-ordered write, per-FILE min/max of BOTH dims must be
    tighter than the full domain — the property min/max pruning needs.
    A single-column sort leaves the other dim spanning ~everything."""
    import pyarrow.parquet as pq

    n, dom = 40_000, 256
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(dom)).cast("bigint").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(dom)).cast("bigint").alias("y"),
    )
    path = str(tmp_path / "z")
    zorder_write(df, path, ["x", "y"], bits=8, n_files=16)

    spans_x, spans_y, total = [], [], 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            sx = rg.column(names["x"]).statistics
            sy = rg.column(names["y"]).statistics
            spans_x.append(sx.max - sx.min)
            spans_y.append(sy.max - sy.min)
            total += rg.num_rows
    assert total == n
    # 16 z-ranges over a 16-bit z-space: each file covers ~1/16 of the
    # curve -> expected rect ~64x128; assert well under the domain on
    # BOTH dims on average (a single-dim sort would pin one dim's span
    # at ~dom for every file)
    avg_x = sum(spans_x) / len(spans_x)
    avg_y = sum(spans_y) / len(spans_y)
    assert avg_x < 0.75 * dom, avg_x
    assert avg_y < 0.75 * dom, avg_y
    assert min(avg_x, avg_y) < 0.55 * dom, (avg_x, avg_y)

    # round-trip: clustering must not lose or duplicate rows
    assert spark.read.parquet(path).count() == n

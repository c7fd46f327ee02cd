"""Mergeable sketch algebra shared by the batch registry queries and
the streaming ingestion path.

Everything here is PURE Column algebra over the cross-engine
md5-prefix hash (conv(substr(md5(x),1,15),16,10) — replayable in
DuckDB as ('0x'||substr(md5(x),1,15))::BIGINT), so batch results are
hash-checked against an independent engine and the streaming path is
tested equal to batch. The HLL state (group, register, max rank) is
MERGEABLE: max is idempotent/commutative/associative, so partial
states from partitions, days, or micro-batch epochs combine by a
plain groupBy-max — arrival order and replays cannot change it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: register count (p=8 -> m=256) — the documented estimate error is
#: ~1.04/sqrt(m) = 6.5%
HLL_M = 256
#: usable hash bits after the register index (60-bit md5 prefix - 8)
_W_BITS = 52


def md5_prefix_hash(s: Column, n_hex: int = 15) -> Column:
    """Cross-engine bigint hash: first n_hex hex chars of md5 as a
    base-16 int (15 hex = 60 bits, positive in int64 on both
    engines)."""
    return F.conv(F.substring(F.md5(s), 1, n_hex), 16, 10).cast("bigint")


def shingles3_lower(text_col: Column) -> Column:
    """Word 3-grams over lowercase whitespace tokens as array<string>
    (shifted-slice arrays_zip construction — no captured-array HOF
    re-evaluation)."""
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    n = F.size(toks)
    m = n - 2
    z = F.arrays_zip(
        F.slice(toks, 1, m).alias("t0"),
        F.slice(toks, 2, m).alias("t1"),
        F.slice(toks, 3, m).alias("t2"),
    )
    grams = F.transform(z, lambda s: F.concat_ws(" ", s["t0"], s["t1"], s["t2"]))
    return F.when(n < 3, F.array(F.concat_ws(" ", toks))).otherwise(grams)


def hll_registers(
    df: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """(group, reg, m_j) HLL register state over the 3-gram shingle
    universe: reg = low 8 hash bits, m_j = max leading-zero rank of
    the remaining 52 bits (via length(bin(w)) — integer algebra).
    One map-side-combining groupBy; at most group_cardinality * 256
    output rows regardless of corpus size."""
    e = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(group_col, F.explode(shingles3_lower(F.col(text_col))).alias("tok"))
    )
    h = md5_prefix_hash(F.col("tok"))
    t = e.select(
        group_col,
        h.bitwiseAND(F.lit(HLL_M - 1)).alias("reg"),
        F.shiftright(h, 8).alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(_W_BITS + 1)).otherwise(
            _W_BITS + 1 - F.length(F.bin(F.col("w")))
        ),
    )
    return t.groupBy(group_col, "reg").agg(F.max("rho").alias("m_j"))


def merge_registers(regs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Combine partial register states (any union of per-partition /
    per-day / per-epoch outputs of hll_registers) into one state:
    a plain groupBy-max."""
    return regs.groupBy(group_col, "reg").agg(F.max("m_j").alias("m_j"))


def hll_estimate(regs: DataFrame, group_col: str = "lang") -> DataFrame:
    """(group, regs_hit, v_zero, s_denom, hll_estimate) from a
    register state. The harmonic denominator is the EXACT integer
    sum(2^(53-m_j)) + V*2^53 (fits int64); the only float ops are one
    IEEE-deterministic multiply/divide plus the standard
    linear-counting small-range correction."""
    state = regs.groupBy(group_col).agg(
        F.count("*").alias("regs_hit"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_W_BITS + 1} - m_j)")).alias(
            "s_hit"
        ),
    )
    state = state.select(
        group_col,
        "regs_hit",
        (F.lit(HLL_M) - F.col("regs_hit")).alias("v_zero"),
        (
            F.col("s_hit")
            + (F.lit(HLL_M).cast("bigint") - F.col("regs_hit"))
            * F.lit(1 << (_W_BITS + 1)).cast("bigint")
        ).alias("s_denom"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    raw = (
        F.lit(alpha)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(1 << (_W_BITS + 1)))
        / F.col("s_denom").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("v_zero") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_zero").cast("double")),
    ).otherwise(raw)
    return state.select(
        group_col, "regs_hit", "v_zero", "s_denom",
        F.round(est, 2).alias("hll_estimate"),
    )


def cms_cells(
    df: DataFrame, text_col: str = "text", d: int = 4, w: int = 512
) -> DataFrame:
    """(r, col, cell_n) Count-Min cells over the 3-gram shingle
    universe — d rows x w columns of md5-derived counters, one
    map-side-combining groupBy (constant d*w state regardless of
    corpus size). Unlike HLL registers, CMS cells merge by SUM —
    NOT idempotent, so incremental/streaming use must dedupe epochs
    before merging (see streaming.stream_cms_cells)."""
    e = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(shingles3_lower(F.col(text_col))).alias("tok"))
    )
    rc = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda r: md5_prefix_hash(
                F.concat_ws("#", F.col("tok"), r.cast("string"))
            ) % w,
        )
    ).alias("r", "col")
    return (
        e.select("tok", rc)
        .groupBy("r", "col")
        .agg(F.count("*").alias("cell_n"))
    )

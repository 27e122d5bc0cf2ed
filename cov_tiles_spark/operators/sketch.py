"""HyperLogLog distinct-count sketch — mergeable, engine-portable,
integer-exact where it matters.

Why a sketch: at 100 TB, ``COUNT(DISTINCT)`` is a full shuffle of every
distinct key; an HLL register table is 2^p bytes per group, combines
with a ``max`` per register (map-side partial aggregation — the same
combine Spark already applies to ``max``), and merges across datasets /
days / incremental batches for free. Flajolet et al. 2007 (public).

Engine portability (the driver's DuckDB twin recomputes the estimator
from the raw table in pure SQL):

- the value hash is the repo's engine-portable multiplicative-xorshift
  hash (``operators/sampling.sample_hash`` — exact int64 arithmetic in
  any engine, ANSI-safe); register index and rho come from two
  independently-seeded 31-bit hashes.
- rho (leading-zero rank) is computed EXACTLY via the length of the
  binary-string rendering (`bin()` exists in both Spark and DuckDB) —
  no float log2, whose 53-bit mantissa mis-ranks near powers of two.
- the harmonic sum is kept as an INTEGER: sum of 2^(32-rho) (rho <= 32,
  so each term is exact, and 4096 terms < 2^44 cannot overflow int64).
  Float summation order across partitions would otherwise make the
  estimate non-deterministic at the last ulp and fail value-hash gates.
- the only floats are one constant-folded division (bit-identical IEEE
  on any engine) and, in the small-range branch, one ``ln`` (engines may
  differ in the last ulp — callers round the estimate; the integer
  fields S and n_zero are exact and order-independent).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cov_tiles_spark.operators.sampling import sample_hash

_P = 12
_M = 1 << _P  # 4096 registers
_W = 31  # rho bits (portable hash ring is 2^31)
# alpha_m * m^2 * 2^32, constant-folded host-side so both engines run a
# single literal/S division (bit-identical IEEE rounding)
ALPHA_NUM = (0.7213 / (1.0 + 1.079 / _M)) * _M * _M * float(1 << 32)


def _rho(h2: F.Column) -> F.Column:
    """1 + leading zeros of a 31-bit value, exactly, via bin-length."""
    return F.when(h2 == 0, F.lit(_W + 1)).otherwise(
        F.lit(_W + 1) - F.length(F.bin(h2))
    )


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-group HLL register table: (group..., idx, max_rho).

    Shuffles at most |groups| * 4096 rows regardless of input size —
    ``max`` is partially aggregated map-side, so the wire carries
    registers, not keys. Register tables from disjoint batches merge
    with ``hll_merge`` (max per register), the property that makes the
    sketch incremental."""
    group_cols = group_cols or []
    k = F.col(key_col)
    # register index from the TOP 12 bits: the final step of the portable
    # hash is a multiply mod 2^31, whose low bits mix measurably worse
    # (3948/4065 expected distinct registers at 20k keys -> a 14% low
    # estimate); the top bits measure uniform (4064/4065)
    idx = F.shiftright(sample_hash(k, seed=101), _W - _P)
    rho = _rho(sample_hash(k, seed=202))
    return (
        df.select(*group_cols, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge register tables (same grouping columns): max per register."""
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    keys = [c for c in merged.columns if c != "max_rho"]
    return merged.groupBy(*keys).agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., hll_s, n_zero, hll_est) from a register table.

    hll_s = integer harmonic sum scaled by 2^32 (exact, order-free);
    n_zero = empty registers; hll_est = the HLL estimate with the
    standard small-range linear-counting correction, rounded to 4 dp
    (the ln's last ulp is the one engine-dependent operation)."""
    group_cols = group_cols or []
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), 32 - F.col("max_rho")).cast("long")).alias("_s_hit"),
        F.count("*").alias("_n_hit"),
    )
    s = (F.col("_s_hit") + (F.lit(_M) - F.col("_n_hit")) * F.lit(1 << 32)).alias(
        "hll_s"
    )
    zeros = (F.lit(_M) - F.col("_n_hit")).alias("n_zero")
    staged = agg.select(*group_cols, s, zeros)
    raw = F.lit(ALPHA_NUM) / F.col("hll_s").cast("double")
    linear = F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.col("n_zero").cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * _M)) & (F.col("n_zero") > 0), linear
    ).otherwise(raw)
    return staged.withColumn("hll_est", F.round(est, 4))


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """One-shot per-group approximate distinct count."""
    return hll_estimate(hll_registers(df, key_col, group_cols), group_cols)

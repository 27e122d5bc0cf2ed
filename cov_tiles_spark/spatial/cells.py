"""Spatial cell indexes: S2-level-13 analogue (Hilbert) and H3-res-9
analogue (hex axial binning) — from-scratch, vectorized numpy inside
Arrow-batched pandas UDFs (no per-row Python).

Per SURVEY.md §7.0: the sandbox has no h3/s2 libraries and the north_rule
demands from-scratch implementations, so:

- ``cell_s2l13``: Hilbert index at 13 bits/dim over the web-mercator unit
  square — the same Hilbert math as the reference's
  `GeometryUtils.java:8-21`, applied at planet scale. Like real S2 cells,
  ids are hierarchical under the curve (prefix property along the Hilbert
  order) and equal-area on the mercator plane.
- ``cell_h3r9``: pointy-top hexagon axial binning on the mercator plane
  with edge length matched to H3 res-9 (~174 m at the equator). Like real
  H3, each point maps to exactly one hexagon and neighbor lookup is O(1)
  in axial coordinates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from cov_tiles_spark.covt.sfc import hilbert_xy2d, morton_interleave
from cov_tiles_spark.spatial.tiling import mercator_np

S2_BITS = 13
# H3 res-9 average edge length ~174.4 m; earth equatorial circumference
# ~40_075_017 m -> edge in mercator unit-square units.
HEX_EDGE_MERCATOR = 174.4 / 40_075_017.0
_HEX_OFFSET = 1 << 24  # axial coords fit comfortably in 25 bits each


def s2l13_cell_np(lon: np.ndarray, lat: np.ndarray, bits: int = S2_BITS) -> np.ndarray:
    """Hilbert cell id on the mercator unit square, ``bits`` bits/dim."""
    mx, my = mercator_np(lon, lat)
    n = 1 << bits
    hx = np.clip((mx * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    hy = np.clip((my * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    return hilbert_xy2d(bits, hx, hy).astype(np.int64)


def h3r9_cell_np(
    lon: np.ndarray, lat: np.ndarray, edge: float = HEX_EDGE_MERCATOR
) -> np.ndarray:
    """Hex cell id via axial coordinates + cube rounding (pointy-top)."""
    mx, my = mercator_np(lon, lat)
    # fractional axial coords
    q = (np.sqrt(3.0) / 3.0 * mx - my / 3.0) / edge
    r = (2.0 / 3.0 * my) / edge
    # cube rounding
    x = q
    z = r
    y = -x - z
    rx, ry, rz = np.round(x), np.round(y), np.round(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    qi = rx.astype(np.int64) + _HEX_OFFSET
    ri = rz.astype(np.int64) + _HEX_OFFSET
    return (qi << 25) | ri


def hex_neighbors_np(cell: np.ndarray) -> np.ndarray:
    """The 6 axial neighbors + self for each cell id -> (n, 7) int64."""
    c = np.asarray(cell, dtype=np.int64)
    q = (c >> 25) - _HEX_OFFSET
    r = (c & ((1 << 25) - 1)) - _HEX_OFFSET
    dq = np.array([0, 1, 1, 0, -1, -1, 0], dtype=np.int64)
    dr = np.array([0, 0, -1, -1, 0, 1, 1], dtype=np.int64)
    nq = q[:, None] + dq[None, :] + _HEX_OFFSET
    nr = r[:, None] + dr[None, :] + _HEX_OFFSET
    return (nq << 25) | nr


def morton_cell_np(lon: np.ndarray, lat: np.ndarray, bits: int = 16) -> np.ndarray:
    """Morton (z-order) cell id — SQL-expressible twin of the Hilbert cell."""
    mx, my = mercator_np(lon, lat)
    n = 1 << bits
    gx = np.clip((mx * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    gy = np.clip((my * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    return morton_interleave(gx, gy).astype(np.int64)


# ---------- pandas UDFs (Arrow-batched; register once per session) ----------

@F.pandas_udf(LongType())
def cell_s2l13(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series(s2l13_cell_np(lon.to_numpy(), lat.to_numpy()))


@F.pandas_udf(LongType())
def cell_h3r9(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series(h3r9_cell_np(lon.to_numpy(), lat.to_numpy()))


@F.pandas_udf(LongType())
def cell_morton16(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series(morton_cell_np(lon.to_numpy(), lat.to_numpy()))


def cell_stats_rollup(
    df,
    cell_col: str,
    levels: list[int],
    value_col: str | None = None,
    finest_bits: int = S2_BITS,
):
    """Hierarchical per-cell aggregates (hypertable-style continuous
    rollup): counts (+ optional value sums) at the finest level, coarser
    levels derived from the AGGREGATE table — never from the raw rows.

    Hilbert indexes are hierarchical (a parent's four children occupy
    consecutive indices), so the parent cell at ``k`` levels up is
    exactly ``cell >> 2k`` — each coarser level is one tiny shuffle over
    pre-aggregated rows (|cells| of the level below, not |records|),
    the same telescoping shape as the tile pyramid rollup. Returns
    ``(level, cell, n_points[, sum_value])`` for every requested level
    (``levels`` descending, starting at ``finest_bits``).
    """
    from pyspark.sql import functions as F

    assert sorted(levels, reverse=True) == levels and levels[0] == finest_bits
    aggs = [F.count("*").alias("n_points")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    level = (
        df.groupBy(F.col(cell_col).alias("cell")).agg(*aggs)
        .withColumn("level", F.lit(finest_bits))
    )
    out_cols = ["level", "cell", "n_points"] + (
        ["sum_value"] if value_col is not None else []
    )
    out = [level.select(*out_cols)]
    prev_bits = finest_bits
    for bits in levels[1:]:
        re_aggs = [F.sum("n_points").alias("n_points")]
        if value_col is not None:
            re_aggs.append(F.sum("sum_value").alias("sum_value"))
        level = (
            level.groupBy(
                F.shiftright("cell", 2 * (prev_bits - bits)).alias("cell")
            )
            .agg(*re_aggs)
            .withColumn("level", F.lit(bits))
        )
        out.append(level.select(*out_cols))
        prev_bits = bits
    from functools import reduce

    return reduce(lambda a, b: a.unionAll(b), out)

"""Web-mercator ZXY tiling — JVM-side column expressions + numpy twins.

The reference addresses tiles by (zoom, x, y) (`MvtUtils.java:32-33`,
filenames `z_x_y.covt`); tile-local integer coordinates live on an
``extent`` grid (4096, `CovtConverter.java:674-677`). This module provides
the standard slippy-map math in two exactly-matching forms:

- **Column expressions** (`F.*` only — stays inside whole-stage codegen,
  no Python in the hot path) for tile assignment at any zoom.
- **numpy kernels** used inside encode UDFs and by the pytest oracle.

The ANSI-SQL equivalents (for the DuckDB oracle) are the same formulas;
see __spark_entry__.oracle_sql().
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LAT = 85.05112878  # web-mercator latitude clamp
DEFAULT_EXTENT = 4096


# ---------- column-expression form (JVM, codegen) ----------

def mercator_x(lon: Column) -> Column:
    """lon degrees -> mercator x in [0, 1)."""
    return (lon + F.lit(180.0)) / F.lit(360.0)


def mercator_y(lat: Column) -> Column:
    """lat degrees -> mercator y in [0, 1) (y grows south)."""
    rad = F.radians(lat)
    return (
        F.lit(0.5)
        - F.log(F.tan(F.lit(math.pi / 4.0) + rad / F.lit(2.0))) / F.lit(2.0 * math.pi)
    )


def tile_x(lon: Column, z: int) -> Column:
    n = F.lit(float(1 << z))
    return F.least(
        F.lit((1 << z) - 1),
        F.greatest(F.lit(0), F.floor(mercator_x(lon) * n)),
    ).cast("int")


def tile_y(lat: Column, z: int) -> Column:
    n = F.lit(float(1 << z))
    return F.least(
        F.lit((1 << z) - 1),
        F.greatest(F.lit(0), F.floor(mercator_y(lat) * n)),
    ).cast("int")


def tile_local_x(lon: Column, z: int, x: Column, extent: int = DEFAULT_EXTENT) -> Column:
    """Integer coordinate within tile (z, x), on the extent grid."""
    n = F.lit(float(1 << z))
    return F.floor((mercator_x(lon) * n - x.cast("double")) * F.lit(float(extent))).cast("int")


def tile_local_y(lat: Column, z: int, y: Column, extent: int = DEFAULT_EXTENT) -> Column:
    n = F.lit(float(1 << z))
    return F.floor((mercator_y(lat) * n - y.cast("double")) * F.lit(float(extent))).cast("int")


def with_tile(df, lon_col: str, lat_col: str, z: int, extent: int = DEFAULT_EXTENT):
    """Append z/x/y/local_x/local_y columns for one zoom level (narrow op)."""
    lon, lat = F.col(lon_col), F.col(lat_col)
    df = df.withColumn("z", F.lit(z))
    df = df.withColumn("x", tile_x(lon, z)).withColumn("y", tile_y(lat, z))
    df = df.withColumn("local_x", tile_local_x(lon, z, F.col("x"), extent))
    df = df.withColumn("local_y", tile_local_y(lat, z, F.col("y"), extent))
    return df


# ---------- numpy twin (UDF kernels + pytest oracle) ----------

def mercator_np(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = (lon + 180.0) / 360.0
    rad = np.radians(lat)
    my = 0.5 - np.log(np.tan(math.pi / 4.0 + rad / 2.0)) / (2.0 * math.pi)
    return mx, my


def tile_np(
    lon: np.ndarray, lat: np.ndarray, z: int
) -> tuple[np.ndarray, np.ndarray]:
    mx, my = mercator_np(lon, lat)
    n = 1 << z
    tx = np.clip(np.floor(mx * n), 0, n - 1).astype(np.int32)
    ty = np.clip(np.floor(my * n), 0, n - 1).astype(np.int32)
    return tx, ty


def tile_local_np(
    lon: np.ndarray, lat: np.ndarray, z: int, extent: int = DEFAULT_EXTENT
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (tx, ty, local_x, local_y)."""
    mx, my = mercator_np(lon, lat)
    n = 1 << z
    tx = np.clip(np.floor(mx * n), 0, n - 1).astype(np.int32)
    ty = np.clip(np.floor(my * n), 0, n - 1).astype(np.int32)
    lx = np.floor((mx * n - tx) * extent).astype(np.int32)
    ly = np.floor((my * n - ty) * extent).astype(np.int32)
    return tx, ty, lx, ly


def tile_bounds_lonlat(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of tile (z, x, y)."""
    n = 1 << z
    lon_min = x / n * 360.0 - 180.0
    lon_max = (x + 1) / n * 360.0 - 180.0

    def lat_of(my: float) -> float:
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * my))))

    lat_max = lat_of(y / n)
    lat_min = lat_of((y + 1) / n)
    return lon_min, lat_min, lon_max, lat_max

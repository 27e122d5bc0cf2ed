"""Raster ↔ vector tile materialization (north_star component).

**raster → vector** (``raster_grid_tiles``): decode every image's pixels
(vectorized numpy inside ``mapInPandas``, *before* the shuffle so each
record is decoded exactly once), aggregate per (tile, grid-cell) with
built-in hash aggregation — Spark's map-side partial aggregation handles
the hot low-zoom tiles, no salting needed — then materialize each tile's
occupied cells as POLYGON features (one square ring per cell) with the
aggregated raster statistics as properties, encoded as a COVT layer.

**vector → raster** (``rasterize_tiles``): decode COVT payloads and render
a G x G RGB raster per tile from the per-cell mean colors — the inverse
direction, producing an opaque ``binary`` raster column with typed
metadata (w, h, fmt='raw'), i.e. the same multimodal column convention as
the input corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cov_tiles_spark.covt.decoder import GeometryColumn, decode_covt
from cov_tiles_spark.covt.encoder import LayerInput, PropertyInput, encode_tile
from cov_tiles_spark.covt.metadata import ColumnDataType, GeometryType
from cov_tiles_spark.operators.images import decode_image
from cov_tiles_spark.pipeline.materialize import assign_tiles
from cov_tiles_spark.spatial.tiling import DEFAULT_EXTENT

GRID = 16  # cells per tile side

RASTER_SCHEMA = (
    "z int, x int, y int, n_cells long, payload binary, payload_bytes long"
)


def _mean_color_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Narrow stage: decode pixels once per record -> mean RGB columns."""
    for pdf in batches:
        n = len(pdf)
        r = np.empty(n)
        g = np.empty(n)
        b = np.empty(n)
        for i in range(n):
            px = decode_image(
                bytes(pdf["bytes"].iloc[i]),
                int(pdf["w"].iloc[i]),
                int(pdf["h"].iloc[i]),
                pdf["fmt"].iloc[i],
            )
            means = px.reshape(-1, 3).mean(axis=0)
            r[i], g[i], b[i] = means
        out = pdf[["image_id", "lon", "lat"]].copy()
        out["mean_r"] = r
        out["mean_g"] = g
        out["mean_b"] = b
        yield out


def _encode_grid_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (z,x,y) group of aggregated cells -> COVT raster_grid layer."""
    z = int(pdf["z"].iloc[0]); x = int(pdf["x"].iloc[0]); y = int(pdf["y"].iloc[0])
    pdf = pdf.sort_values(["gy", "gx"], kind="stable")
    n = len(pdf)
    cell = DEFAULT_EXTENT // GRID
    gx = pdf["gx"].to_numpy(np.int64)
    gy = pdf["gy"].to_numpy(np.int64)
    x0 = gx * cell
    y0 = gy * cell
    # open square ring per cell: (x0,y0) (x0+c,y0) (x0+c,y0+c) (x0,y0+c)
    vb = np.empty((n, 8), dtype=np.int32)
    vb[:, 0] = x0;        vb[:, 1] = y0
    vb[:, 2] = x0 + cell; vb[:, 3] = y0
    vb[:, 4] = x0 + cell; vb[:, 5] = y0 + cell
    vb[:, 6] = x0;        vb[:, 7] = y0 + cell
    geom = GeometryColumn(
        geometry_types=np.full(n, GeometryType.POLYGON, np.uint8),
        vertex_buffer=vb.ravel(),
        part_offsets=np.ones(n, np.int64),
        ring_offsets=np.full(n, 4, np.int64),
    )
    props = {
        "n_images": PropertyInput(
            ColumnDataType.INT_64, pdf["n_images"].to_numpy(np.int64)
        ),
        "mean_r": PropertyInput(
            ColumnDataType.INT_64, np.round(pdf["mean_r"].to_numpy()).astype(np.int64)
        ),
        "mean_g": PropertyInput(
            ColumnDataType.INT_64, np.round(pdf["mean_g"].to_numpy()).astype(np.int64)
        ),
        "mean_b": PropertyInput(
            ColumnDataType.INT_64, np.round(pdf["mean_b"].to_numpy()).astype(np.int64)
        ),
    }
    layer = LayerInput(
        name="raster_grid",
        geometry=geom,
        ids=(gy * GRID + gx).astype(np.int64),
        properties=props,
    )
    payload = encode_tile([layer])
    return pd.DataFrame(
        {"z": [z], "x": [x], "y": [y], "n_cells": [n],
         "payload": [payload], "payload_bytes": [len(payload)]}
    )


def raster_grid_tiles(images: DataFrame, zooms: list[int]) -> DataFrame:
    """images (with pixel bytes) -> per-tile raster_grid COVT payloads."""
    decoded = images.select(
        "image_id", "bytes", "w", "h", "fmt", "lon", "lat"
    ).mapInPandas(
        _mean_color_batches,
        schema="image_id string, lon double, lat double, "
               "mean_r double, mean_g double, mean_b double",
    )
    assigned = assign_tiles(decoded, zooms)
    cell = DEFAULT_EXTENT // GRID
    cells = assigned.withColumn(
        "gx", (F.col("local_x") / cell).cast("int")
    ).withColumn("gy", (F.col("local_y") / cell).cast("int"))
    # built-in hash agg: partial map-side combine absorbs hot-tile skew
    agg = cells.groupBy("z", "x", "y", "gx", "gy").agg(
        F.count("*").alias("n_images"),
        F.avg("mean_r").alias("mean_r"),
        F.avg("mean_g").alias("mean_g"),
        F.avg("mean_b").alias("mean_b"),
    )
    return agg.groupBy("z", "x", "y").applyInPandas(
        _encode_grid_group, schema=RASTER_SCHEMA
    )


def rasterize_tiles(payloads: DataFrame) -> DataFrame:
    """vector -> raster: COVT raster_grid payloads -> G x G RGB tile images."""

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                layers = decode_covt(bytes(row["payload"]))
                lay = layers["raster_grid"]
                img = np.zeros((GRID, GRID, 3), dtype=np.uint8)
                ids = lay.ids.astype(np.int64)
                gx = ids % GRID
                gy = ids // GRID
                for ch, name in enumerate(("mean_r", "mean_g", "mean_b")):
                    vals = lay.properties[name].data.astype(np.int64)
                    img[gy, gx, ch] = np.clip(vals, 0, 255)
                rows.append(
                    {
                        "z": row["z"], "x": row["x"], "y": row["y"],
                        "raster": img.tobytes(),
                        "w": GRID, "h": GRID, "fmt": "raw",
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["z", "x", "y", "raster", "w", "h", "fmt"]
            )

    return payloads.mapInPandas(
        _render, schema="z int, x int, y int, raster binary, w int, h int, fmt string"
    )


def raster_overview_level(rasters: DataFrame) -> DataFrame:
    """One overview level: parent-tile rasters downsampled from their
    (up to 4) children — the COG/overview pyramid step, and the raster
    analogue of ``pipeline/pyramid.py``'s vector rollup.

    Each child's G x G image lands in its quadrant of a 2G x 2G parent
    mosaic (missing children stay black — sparse tiles are normal at
    depth), then an exact integer 2x2 box mean ((a+b+c+d) // 4, no float
    drift) reduces the mosaic to the parent's G x G. Grouping is
    applyInPandas keyed on the PARENT tile: groups are at most 4 rows,
    and each level has 4x fewer tiles than the one below, so the
    per-group Arrow overhead that ruled out grouped-map for the encode
    stage is immaterial here.
    """

    def _downsample(pdf: pd.DataFrame) -> pd.DataFrame:
        mosaic = np.zeros((2 * GRID, 2 * GRID, 3), dtype=np.uint16)
        for _, row in pdf.iterrows():
            img = np.frombuffer(bytes(row["raster"]), dtype=np.uint8).reshape(
                GRID, GRID, 3
            )
            qy = (int(row["y"]) & 1) * GRID
            qx = (int(row["x"]) & 1) * GRID
            mosaic[qy : qy + GRID, qx : qx + GRID] = img
        down = (
            mosaic[0::2, 0::2].astype(np.uint32)
            + mosaic[0::2, 1::2]
            + mosaic[1::2, 0::2]
            + mosaic[1::2, 1::2]
        ) // 4
        return pd.DataFrame(
            [
                {
                    "z": int(pdf["z"].iloc[0]) - 1,
                    "x": int(pdf["x"].iloc[0]) >> 1,
                    "y": int(pdf["y"].iloc[0]) >> 1,
                    "raster": down.astype(np.uint8).tobytes(),
                    "w": GRID, "h": GRID, "fmt": "raw",
                }
            ]
        )

    return (
        rasters.groupBy(
            (F.col("z") - 1).alias("_pz"),
            F.shiftright("x", 1).alias("_px"),
            F.shiftright("y", 1).alias("_py"),
        )
        .applyInPandas(
            _downsample,
            schema="z int, x int, y int, raster binary, w int, h int, fmt string",
        )
    )


def raster_overviews(rasters: DataFrame, zmin: int, zmax: int) -> DataFrame:
    """Full overview pyramid: levels zmin..zmax-1 derived bottom-up from
    the zmax rasters. Each level is 4x smaller; intermediate levels are
    persisted (each feeds both the output union and the next level)."""
    out: list[DataFrame] = []
    level = rasters.filter(F.col("z") == zmax)
    for _ in range(zmax, zmin, -1):
        level = raster_overview_level(level).persist()
        out.append(level)
    from functools import reduce

    return reduce(DataFrame.unionAll, out)

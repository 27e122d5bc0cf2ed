"""Tile materialization: image records → COVT tile payloads.

The Spark lifecycle equivalent of the reference's per-tile converter loop
(`CovtConverter.java:103-175`, traced in SURVEY.md §3.1):

    records → withColumn(tile ids)            narrow, codegen
            → per-tile feature cap            Window top-K (bounds UDF groups)
            → groupBy(z, x, y)                the ONLY wide exchange
            → applyInPandas(encode_tile)      all codec work vectorized
            → (z, x, y, payload, stats)

Scale design (SURVEY.md §4.2):
- **Bounded groups**: low-zoom tiles are inherently hot (z2 = 16 tiles
  worldwide). Groups are bounded *by construction* with a deterministic
  per-tile feature cap (hash-ranked uniform sample, ``cap_tile_features``)
  — real tile pipelines cap per-tile features at low zoom for the same
  reason.
- **AQE skew split** handles residual partition skew in the shuffle
  (spark.sql.adaptive.skewJoin/coalescePartitions enabled in session.py).
- **Map-side partial agg**: raster-grid aggregates use built-in
  hash aggregation (sum/count), which Spark partially aggregates before
  the shuffle — no custom salting needed there.
- At 100 TB the exchange is hash(z,x,y); payload bytes never shuffle
  (images' pixel ``bytes`` are pruned out of the plan before the wide
  stage — only coords + small properties move).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cov_tiles_spark.covt.decoder import GeometryColumn, decode_covt
from cov_tiles_spark.covt.encoder import LayerInput, PropertyInput, encode_tile
from cov_tiles_spark.covt.metadata import ColumnDataType, GeometryType
from cov_tiles_spark.covt.mvt import encode_mvt
from cov_tiles_spark.spatial.tiling import (
    DEFAULT_EXTENT,
    tile_local_x,
    tile_local_y,
    tile_x,
    tile_y,
)

PAYLOAD_SCHEMA = (
    "z int, x int, y int, num_features long, payload binary, "
    "payload_bytes long, mvt_bytes long"
)


def assign_tiles(
    images: DataFrame, zooms: list[int], extent: int = DEFAULT_EXTENT
) -> DataFrame:
    """Narrow map: one output row per (record, zoom) with tile + local coords.

    Column-expression only — stays in whole-stage codegen; Catalyst prunes
    the heavy ``bytes`` column if the consumer doesn't select it.
    """
    lon, lat = F.col("lon"), F.col("lat")
    per_zoom = [
        F.struct(
            F.lit(z).alias("z"),
            tile_x(lon, z).alias("x"),
            tile_y(lat, z).alias("y"),
            tile_local_x(lon, z, tile_x(lon, z), extent).alias("local_x"),
            tile_local_y(lat, z, tile_y(lat, z), extent).alias("local_y"),
        )
        for z in zooms
    ]
    return images.withColumn("tile", F.explode(F.array(*per_zoom))).select(
        "*", "tile.*"
    ).drop("tile")


def cap_tile_features(assigned: DataFrame, max_features: int) -> DataFrame:
    """Deterministic per-tile cap bounding every downstream pandas group.

    Rank by ``xxhash64(image_id, z)`` (a deterministic uniform sample —
    spatially unbiased, unlike a Hilbert-prefix cut) with image_id
    tie-break; keep the first ``max_features``. JVM-only expressions, so
    the wide stage stays in whole-stage codegen.
    """
    w = Window.partitionBy("z", "x", "y").orderBy(
        F.xxhash64("image_id", F.col("z")), F.col("image_id")
    )
    return (
        assigned.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= max_features)
        .drop("_rank")
    )


def _encode_group(pdf: pd.DataFrame, with_mvt_baseline: bool = True) -> pd.DataFrame:
    """Grouped-map kernel: one (z,x,y) group → one COVT payload row."""
    z = int(pdf["z"].iloc[0])
    x = int(pdf["x"].iloc[0])
    y = int(pdf["y"].iloc[0])

    # feature id = numeric suffix of image_id; sort ascending (reference
    # sorts building/poi/place layers by id, CovtConverter.java:556-558)
    ids = (
        pdf["image_id"].str.slice(4).astype(np.int64)
        if pdf["image_id"].dtype == object
        else pdf["image_id"].astype(np.int64)
    )
    order = np.argsort(ids.to_numpy(), kind="stable")
    pdf = pdf.iloc[order]
    ids_sorted = ids.to_numpy()[order]

    n = len(pdf)
    vb = np.empty(2 * n, dtype=np.int32)
    vb[0::2] = np.clip(pdf["local_x"].to_numpy(np.int64), -DEFAULT_EXTENT // 2, DEFAULT_EXTENT + DEFAULT_EXTENT // 2 - 1)
    vb[1::2] = np.clip(pdf["local_y"].to_numpy(np.int64), -DEFAULT_EXTENT // 2, DEFAULT_EXTENT + DEFAULT_EXTENT // 2 - 1)
    geom = GeometryColumn(
        geometry_types=np.full(n, GeometryType.POINT, np.uint8), vertex_buffer=vb
    )

    caption = pdf["caption"].to_numpy(dtype=object)
    props = {
        "caption": PropertyInput(ColumnDataType.STRING, caption),
        "fmt": PropertyInput(ColumnDataType.STRING, pdf["fmt"].to_numpy(dtype=object)),
        "w": PropertyInput(ColumnDataType.UINT_64, pdf["w"].to_numpy(np.int64)),
        "h": PropertyInput(ColumnDataType.UINT_64, pdf["h"].to_numpy(np.int64)),
        "phash": PropertyInput(ColumnDataType.INT_64, pdf["phash"].to_numpy(np.int64)),
    }
    layer = LayerInput(
        name="images", geometry=geom, ids=ids_sorted, properties=props,
        extent=DEFAULT_EXTENT,
    )
    payload = encode_tile([layer])

    if not with_mvt_baseline:
        return pd.DataFrame(
            {
                "z": [z], "x": [x], "y": [y],
                "num_features": [n],
                "payload": [payload],
                "payload_bytes": [len(payload)],
                "mvt_bytes": [0],
            }
        )

    # row-oriented MVT baseline of the same features (benchmark denominator)
    mvt_feats = [
        {
            "id": int(ids_sorted[i]),
            "geom_type": 1,
            "parts": [[(int(vb[2 * i]), int(vb[2 * i + 1]))]],
            "properties": {
                "caption": caption[i],
                "fmt": pdf["fmt"].iloc[i],
                "w": int(pdf["w"].iloc[i]),
                "h": int(pdf["h"].iloc[i]),
                "phash": int(pdf["phash"].iloc[i]),
            },
        }
        for i in range(n)
    ]
    mvt_bytes = len(encode_mvt([("images", mvt_feats, DEFAULT_EXTENT)]))

    return pd.DataFrame(
        {
            "z": [z], "x": [x], "y": [y],
            "num_features": [n],
            "payload": [payload],
            "payload_bytes": [len(payload)],
            "mvt_bytes": [mvt_bytes],
        }
    )


def materialize_tiles(
    images: DataFrame,
    zooms: list[int],
    extent: int = DEFAULT_EXTENT,
    max_features_per_tile: int = 20_000,
    with_mvt_baseline: bool = True,
) -> DataFrame:
    """records → per-tile COVT payloads (+ MVT-baseline sizes)."""
    cols = ["image_id", "caption", "fmt", "w", "h", "phash", "lon", "lat"]
    assigned = assign_tiles(images.select(*cols), zooms, extent)
    capped = cap_tile_features(assigned, max_features_per_tile)

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_group(pdf, with_mvt_baseline=with_mvt_baseline)

    return capped.groupBy("z", "x", "y").applyInPandas(_encode, schema=PAYLOAD_SCHEMA)


DECODE_SCHEMA = (
    "z int, x int, y int, feature_id long, local_x int, local_y int, "
    "caption string, fmt string, w long, h long, phash long"
)


def decode_tiles(payloads: DataFrame) -> DataFrame:
    """Inverse: payload rows → exploded feature rows (verification join)."""

    def _decode(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                layers = decode_covt(bytes(row["payload"]))
                lay = layers["images"]
                n = lay.metadata.num_features
                vb = lay.geometry.vertex_buffer
                rec = {
                    "z": np.full(n, row["z"], np.int32),
                    "x": np.full(n, row["x"], np.int32),
                    "y": np.full(n, row["y"], np.int32),
                    "feature_id": lay.ids.astype(np.int64),
                    "local_x": vb[0::2].astype(np.int32),
                    "local_y": vb[1::2].astype(np.int32),
                }
                for name in ("caption", "fmt"):
                    pc = lay.properties[name]
                    rec[name] = np.array(
                        [pc.dictionary[int(i)] for i in pc.data], dtype=object
                    )
                for name in ("w", "h", "phash"):
                    rec[name] = lay.properties[name].data.astype(np.int64)
                outs.append(pd.DataFrame(rec))
            yield pd.concat(outs) if outs else pd.DataFrame(
                columns=[f.split()[0] for f in DECODE_SCHEMA.split(", ")]
            )

    return payloads.mapInPandas(_decode, schema=DECODE_SCHEMA)

"""Tracks layer: LINESTRING features through the distributed pipeline
(FIXTURES.md §4 — paths linking same-cluster images; exercises the
linestring/ICE encode path at the Spark level, not just in unit tests).

Cluster assignment is deterministic (numeric image id mod N_CLUSTERS);
within a tile, each cluster's points sorted by id form one linestring
(clusters with a single in-tile point contribute nothing). Same
streaming-encode shape as materialize_tiles: one hash(z,x,y) exchange,
sorted partitions, per-batch Arrow protocol with a carry-over tile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cov_tiles_spark.covt.decoder import GeometryColumn
from cov_tiles_spark.covt.encoder import LayerInput, encode_tile
from cov_tiles_spark.covt.metadata import GeometryType
from cov_tiles_spark.pipeline.materialize import assign_tiles
from cov_tiles_spark.spatial.tiling import DEFAULT_EXTENT

N_CLUSTERS = 12

TRACKS_SCHEMA = (
    "z int, x int, y int, n_tracks long, n_vertices long, "
    "payload binary, payload_bytes long"
)


def _encode_tile_tracks(z, x, y, cluster, ids, lx, ly) -> dict | None:
    order = np.lexsort((ids, cluster))
    cluster = cluster[order]
    lx = lx[order]
    ly = ly[order]
    # cluster boundaries
    change = np.empty(cluster.shape[0], dtype=bool)
    change[0] = True
    change[1:] = np.diff(cluster) != 0
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], cluster.shape[0])
    lens = ends - starts
    keep = lens >= 2  # a track needs at least 2 points
    if not keep.any():
        return None
    part_offsets = lens[keep].astype(np.int64)
    track_ids = cluster[starts[keep]].astype(np.int64)
    sel = np.concatenate(
        [np.arange(s, e) for s, e, k in zip(starts, ends, keep) if k]
    )
    n_vertices = sel.shape[0]
    vb = np.empty(2 * n_vertices, dtype=np.int32)
    half = DEFAULT_EXTENT // 2
    vb[0::2] = np.clip(lx[sel], -half, DEFAULT_EXTENT + half - 1)
    vb[1::2] = np.clip(ly[sel], -half, DEFAULT_EXTENT + half - 1)
    geom = GeometryColumn(
        geometry_types=np.full(len(part_offsets), GeometryType.LINESTRING, np.uint8),
        vertex_buffer=vb,
        part_offsets=part_offsets,
    )
    payload = encode_tile(
        [LayerInput(name="tracks", geometry=geom, ids=track_ids)]
    )
    return {
        "z": int(z), "x": int(x), "y": int(y),
        "n_tracks": int(len(part_offsets)),
        "n_vertices": int(n_vertices),
        "payload": payload,
        "payload_bytes": len(payload),
    }


def tracks_tiles(images: DataFrame, zooms: list[int]) -> DataFrame:
    pts = images.select(
        F.expr("cast(substring(image_id, 5) as long)").alias("nid"),
        (F.expr("cast(substring(image_id, 5) as long)") % N_CLUSTERS).alias("cluster"),
        "lon", "lat",
    )
    assigned = assign_tiles(pts, zooms)
    sc = images.sparkSession.sparkContext
    num_parts = max(sc.defaultParallelism * 4, 16)
    part = assigned.repartition(num_parts, "z", "x", "y").sortWithinPartitions(
        "z", "x", "y", "cluster", "nid"
    )

    def encode_stream(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            zc = pdf["z"].to_numpy(np.int64)
            xc = pdf["x"].to_numpy(np.int64)
            yc = pdf["y"].to_numpy(np.int64)
            last = (zc == zc[-1]) & (xc == xc[-1]) & (yc == yc[-1])
            split = len(pdf) - int(last[::-1].cumprod().sum())
            out = []
            if split > 0:
                _emit_tiles(pdf.iloc[:split], out)
            carry = pdf.iloc[split:]
            if out:
                yield pd.DataFrame(out)
        if carry is not None and len(carry):
            out = []
            _emit_tiles(carry, out)
            if out:
                yield pd.DataFrame(out)

    def _emit_tiles(pdf: pd.DataFrame, out: list) -> None:
        zc = pdf["z"].to_numpy(np.int64)
        xc = pdf["x"].to_numpy(np.int64)
        yc = pdf["y"].to_numpy(np.int64)
        change = np.empty(len(pdf), dtype=bool)
        change[0] = True
        change[1:] = (np.diff(zc) != 0) | (np.diff(xc) != 0) | (np.diff(yc) != 0)
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(pdf))
        for s, e in zip(starts.tolist(), ends.tolist()):
            row = _encode_tile_tracks(
                zc[s], xc[s], yc[s],
                pdf["cluster"].to_numpy(np.int64)[s:e],
                pdf["nid"].to_numpy(np.int64)[s:e],
                pdf["local_x"].to_numpy(np.int64)[s:e],
                pdf["local_y"].to_numpy(np.int64)[s:e],
            )
            if row is not None:
                out.append(row)

    return part.select(
        "z", "x", "y", "cluster", "nid", "local_x", "local_y"
    ).mapInPandas(encode_stream, schema=TRACKS_SCHEMA)

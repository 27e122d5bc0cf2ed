"""Tracks linestring layer through the distributed pipeline vs numpy oracle."""

from __future__ import annotations

import collections

import numpy as np

from cov_tiles_spark.covt.decoder import decode_covt
from cov_tiles_spark.io.synth import images_df, row_params
from cov_tiles_spark.pipeline.tracks import N_CLUSTERS, tracks_tiles
from cov_tiles_spark.spatial.tiling import tile_local_np

N = 600
ZOOMS = [3, 6]


def test_tracks_match_oracle(spark):
    corpus = images_df(spark, N, partitions=4).cache()
    tiles = tracks_tiles(corpus, ZOOMS).collect()
    assert tiles

    # oracle: same grouping in plain numpy
    ids = np.arange(N, dtype=np.int64)
    p = row_params(ids)
    expected: dict[tuple, dict[int, list]] = collections.defaultdict(dict)
    for z in ZOOMS:
        tx, ty, lx, ly = tile_local_np(p["lon"], p["lat"], z)
        buckets = collections.defaultdict(list)
        for i in ids.tolist():
            buckets[(z, int(tx[i]), int(ty[i]), int(i % N_CLUSTERS))].append(
                (i, int(lx[i]), int(ly[i]))
            )
        for (zz, xx, yy, c), pts in buckets.items():
            if len(pts) >= 2:
                expected[(zz, xx, yy)][c] = [(x, y) for _, x, y in sorted(pts)]

    got_tiles = set()
    for r in tiles:
        key = (r.z, r.x, r.y)
        got_tiles.add(key)
        exp = expected[key]
        layers = decode_covt(bytes(r.payload))
        lay = layers["tracks"]
        assert lay.metadata.num_features == len(exp) == r.n_tracks
        feats = lay.features()
        for f in feats:
            cluster = f["id"]
            assert f["geometry"] == [exp[cluster]], (key, cluster)
    assert got_tiles == set(expected)

"""Multi-layer tile bundling (images + raster_grid in one payload)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cov_tiles_spark.covt.decoder import decode_covt
from cov_tiles_spark.io.synth import images_df
from cov_tiles_spark.pipeline.multilayer import materialize_multilayer


def test_multilayer_payloads(spark):
    corpus = images_df(spark, 400, partitions=4).cache()
    tiles = materialize_multilayer(corpus, [3]).cache()
    rows = tiles.collect()
    assert rows
    n_pts_total = 0
    for r in rows:
        layers = decode_covt(bytes(r.payload))
        assert set(layers) <= {"images", "raster_grid"}
        if r.n_points:
            assert layers["images"].metadata.num_features == r.n_points
            n_pts_total += r.n_points
        if r.n_cells:
            assert layers["raster_grid"].metadata.num_features == r.n_cells
    assert n_pts_total == 400

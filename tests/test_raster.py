"""Raster ↔ vector materialization round-trip (north_star component)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cov_tiles_spark.io.synth import images_df
from cov_tiles_spark.operators.images import decode_image, generate_image
from cov_tiles_spark.pipeline.raster import (
    GRID,
    raster_grid_tiles,
    rasterize_tiles,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return images_df(spark, 500, partitions=4).cache()


def test_raster_grid_roundtrip(spark, corpus):
    tiles = raster_grid_tiles(corpus, [3]).cache()
    rows = tiles.collect()
    assert rows, "no raster tiles produced"
    total_cells = sum(r.n_cells for r in rows)
    assert 0 < total_cells <= len(rows) * GRID * GRID

    # vector -> raster: every tile renders to a GxGx3 image
    rasters = rasterize_tiles(tiles).collect()
    assert len(rasters) == len(rows)
    for r in rasters:
        img = np.frombuffer(bytes(r.raster), dtype=np.uint8).reshape(GRID, GRID, 3)
        assert img.any(), f"tile {r.z}/{r.x}/{r.y} rendered empty"
        assert r.fmt == "raw" and r.w == GRID and r.h == GRID


def test_raster_cell_stats_match_oracle(spark, corpus):
    """Aggregated cell colors must equal a driver-side numpy recompute."""
    tiles = raster_grid_tiles(corpus, [2]).cache()
    from cov_tiles_spark.covt.decoder import decode_covt
    from cov_tiles_spark.spatial.tiling import tile_local_np

    # oracle: decode every image, aggregate per (tile, cell)
    recs = corpus.collect()
    import collections

    agg = collections.defaultdict(lambda: [0, 0.0, 0.0, 0.0])
    cell_size = 4096 // GRID
    for r in recs:
        i = int(r.image_id[4:])
        px = generate_image(i, r.w, r.h)
        dec = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        means = dec.reshape(-1, 3).mean(axis=0)
        tx, ty, lx, ly = tile_local_np(
            np.array([r.lon]), np.array([r.lat]), 2
        )
        key = (int(tx[0]), int(ty[0]), int(lx[0]) // cell_size, int(ly[0]) // cell_size)
        agg[key][0] += 1
        for c in range(3):
            agg[key][1 + c] += means[c]

    for row in tiles.collect():
        layers = decode_covt(bytes(row.payload))
        lay = layers["raster_grid"]
        ids = lay.ids.astype(np.int64)
        n_imgs = lay.properties["n_images"].data.astype(np.int64)
        mr = lay.properties["mean_r"].data.astype(np.int64)
        for j in range(len(ids)):
            gx, gy = int(ids[j] % GRID), int(ids[j] // GRID)
            key = (row.x, row.y, gx, gy)
            assert key in agg, key
            cnt, sr, sg, sb = agg[key]
            assert n_imgs[j] == cnt, key
            assert mr[j] == round(sr / cnt), (key, mr[j], sr / cnt)


def test_overview_level_exact_box_mean(spark):
    import numpy as np

    from cov_tiles_spark.pipeline.raster import GRID, raster_overview_level

    rng = np.random.default_rng(8)
    kids = {}
    rows = []
    for dx in (0, 1):
        for dy in (0, 1):
            img = rng.integers(0, 256, (GRID, GRID, 3), dtype=np.uint8)
            kids[(dx, dy)] = img
            rows.append((5, 10 + dx, 6 + dy, img.tobytes(), GRID, GRID, "raw"))
    # second parent with ONE child present (sparse): quadrant fill = black
    lone = rng.integers(0, 256, (GRID, GRID, 3), dtype=np.uint8)
    rows.append((5, 21, 7, lone.tobytes(), GRID, GRID, "raw"))
    df = spark.createDataFrame(
        rows, "z int, x int, y int, raster binary, w int, h int, fmt string"
    )
    got = {
        (r.z, r.x, r.y): np.frombuffer(bytes(r.raster), dtype=np.uint8).reshape(
            GRID, GRID, 3
        )
        for r in raster_overview_level(df).collect()
    }
    assert set(got) == {(4, 5, 3), (4, 10, 3)}

    # scalar oracle for the full parent
    mosaic = np.zeros((2 * GRID, 2 * GRID, 3), dtype=np.int64)
    for (dx, dy), img in kids.items():
        mosaic[dy * GRID:(dy + 1) * GRID, dx * GRID:(dx + 1) * GRID] = img
    want = np.zeros((GRID, GRID, 3), dtype=np.uint8)
    for i in range(GRID):
        for j in range(GRID):
            for c in range(3):
                want[i, j, c] = (
                    int(mosaic[2 * i, 2 * j, c]) + int(mosaic[2 * i, 2 * j + 1, c])
                    + int(mosaic[2 * i + 1, 2 * j, c]) + int(mosaic[2 * i + 1, 2 * j + 1, c])
                ) // 4
    assert np.array_equal(got[(4, 5, 3)], want)
    # sparse parent: x=21 is the RIGHT half (bit 0 = 1), y=7 the BOTTOM
    sparse = got[(4, 10, 3)]
    assert sparse[:GRID // 2, :GRID // 2].sum() == 0  # empty quadrants black
    lone_q = sparse[GRID // 2:, GRID // 2:]
    assert lone_q.sum() > 0


def test_overview_pyramid_end_to_end(spark, corpus):
    from pyspark.sql import functions as F

    from cov_tiles_spark.pipeline.raster import (
        raster_grid_tiles, raster_overviews, rasterize_tiles,
    )

    payloads = raster_grid_tiles(corpus, [6])
    rasters = rasterize_tiles(payloads)
    over = raster_overviews(rasters, zmin=4, zmax=6)
    levels = {
        r.z: r.n for r in over.groupBy("z").agg(F.count("*").alias("n")).collect()
    }
    assert set(levels) == {4, 5}
    assert levels[4] <= levels[5]  # each level coarser than the one below

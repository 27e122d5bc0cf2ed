"""Spark end-to-end: synth corpus → tile assignment → encode → decode →
equality against the input and the numpy oracle (FIXTURES.md §1/§7)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cov_tiles_spark.io.synth import images_df, row_params
from cov_tiles_spark.operators.images import decode_image, generate_image, psnr
from cov_tiles_spark.pipeline.materialize import (
    assign_tiles,
    decode_tiles,
    materialize_tiles,
)
from cov_tiles_spark.spatial.cells import (
    cell_h3r9,
    cell_s2l13,
    h3r9_cell_np,
    s2l13_cell_np,
)
from cov_tiles_spark.spatial.tiling import tile_local_np

N = 1000
ZOOMS = [2, 5, 8]


@pytest.fixture(scope="module")
def corpus(spark):
    return images_df(spark, N, partitions=4).cache()


def test_corpus_deterministic_and_lossless(spark, corpus):
    rows = corpus.orderBy("image_id").limit(50).collect()
    assert len(rows) == 50
    for r in rows:
        i = int(r.image_id[4:])
        px = generate_image(i, r.w, r.h)
        dec = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        if r.fmt in ("raw", "rle"):
            assert np.array_equal(dec, px), r.image_id
        else:
            assert psnr(px, dec) >= 40.0, r.image_id

    # lon/lat match the shared deterministic generator
    p = row_params(np.array([int(r.image_id[4:]) for r in rows]))
    np.testing.assert_allclose([r.lon for r in rows], p["lon"], rtol=0, atol=1e-12)
    np.testing.assert_allclose([r.lat for r in rows], p["lat"], rtol=0, atol=1e-12)


def test_tile_assignment_matches_numpy_oracle(spark, corpus):
    assigned = (
        assign_tiles(corpus.select("image_id", "lon", "lat"), ZOOMS)
        .orderBy("image_id", "z")
        .collect()
    )
    by_id: dict[str, dict[int, tuple]] = {}
    for r in assigned:
        by_id.setdefault(r.image_id, {})[r.z] = (r.x, r.y, r.local_x, r.local_y)

    ids = sorted(by_id)
    nums = np.array([int(s[4:]) for s in ids])
    p = row_params(nums)
    for z in ZOOMS:
        tx, ty, lx, ly = tile_local_np(p["lon"], p["lat"], z)
        for k, image_id in enumerate(ids):
            got = by_id[image_id][z]
            assert got == (tx[k], ty[k], lx[k], ly[k]), (image_id, z, got)


def test_cell_ids_match_numpy_oracle(spark, corpus):
    rows = (
        corpus.select(
            "image_id",
            "lon",
            "lat",
            cell_s2l13("lon", "lat").alias("s2"),
            cell_h3r9("lon", "lat").alias("h3"),
        )
        .orderBy("image_id")
        .collect()
    )
    lon = np.array([r.lon for r in rows])
    lat = np.array([r.lat for r in rows])
    np.testing.assert_array_equal([r.s2 for r in rows], s2l13_cell_np(lon, lat))
    np.testing.assert_array_equal([r.h3 for r in rows], h3r9_cell_np(lon, lat))


def test_materialize_roundtrip(spark, corpus):
    tiles = materialize_tiles(corpus, ZOOMS).cache()
    stats = tiles.agg(
        F.sum("num_features").alias("nf"),
        F.count("*").alias("tiles"),
    ).collect()[0]
    assert stats.nf == N * len(ZOOMS)
    assert stats.tiles > 20
    # compression: COVT must beat the row-oriented MVT baseline on dense
    # tiles (>=100 features). On near-empty tiles the self-describing
    # per-layer metadata dominates — the reference's own wins are measured
    # on dense tiles (README.md:21-35), and at 100 TB every tile is dense.
    dense = tiles.filter(F.col("num_features") >= 100).agg(
        F.sum("payload_bytes").alias("covt"), F.sum("mvt_bytes").alias("mvt")
    ).collect()[0]
    assert dense.covt is not None, "no dense tiles in corpus"
    assert dense.covt < dense.mvt, (dense.covt, dense.mvt)

    # decode → join back to the assignment → full equality
    decoded = decode_tiles(tiles)
    src = assign_tiles(
        corpus.select("image_id", "caption", "fmt", "w", "h", "phash", "lon", "lat"),
        ZOOMS,
    ).withColumn("feature_id", F.expr("cast(substring(image_id, 5) as long)"))

    joined = decoded.alias("d").join(
        src.alias("s"), ["z", "x", "y", "feature_id"], "full_outer"
    )
    n_total = joined.count()
    assert n_total == N * len(ZOOMS)
    mismatches = joined.filter(
        F.col("d.caption").isNull()
        | F.col("s.caption").isNull()
        | (F.col("d.caption") != F.col("s.caption"))
        | (F.col("d.fmt") != F.col("s.fmt"))
        | (F.col("d.w") != F.col("s.w"))
        | (F.col("d.h") != F.col("s.h"))
        | (F.col("d.phash") != F.col("s.phash"))
        | (F.col("d.local_x") != F.col("s.local_x"))
        | (F.col("d.local_y") != F.col("s.local_y"))
    ).count()
    assert mismatches == 0


def test_cap_bounds_groups(spark, corpus):
    tiles = materialize_tiles(corpus, [2], max_features_per_tile=50)
    mx = tiles.agg(F.max("num_features")).collect()[0][0]
    assert mx <= 50


def test_precap_is_byte_identical_to_postcap_only(spark, corpus):
    """The map-side pre-cap (``_make_precap_stream``) must select the
    exact same per-tile subset as the inline post-shuffle cap alone —
    tile payloads byte-identical with a binding cap, on a corpus with
    every tile saturated (z2 over 1000 rows, cap 20 << rows/tile) and
    enough input partitions that superset-vs-exact bugs would surface."""
    from cov_tiles_spark.pipeline.materialize import assign_tiles, encode_assigned

    assigned = assign_tiles(
        corpus.select(
            "image_id", "caption", "fmt", "w", "h", "phash", "lon", "lat"
        ).repartition(8),
        [2],
    )
    kw = dict(max_features_per_tile=20, with_mvt_baseline=False)
    a = {
        (r.z, r.x, r.y): (r.num_features, bytes(r.payload))
        for r in encode_assigned(assigned, pre_cap=True, **kw).collect()
    }
    b = {
        (r.z, r.x, r.y): (r.num_features, bytes(r.payload))
        for r in encode_assigned(assigned, pre_cap=False, **kw).collect()
    }
    assert a == b and len(a) > 0
    assert max(n for n, _ in a.values()) <= 20


def test_precap_reduces_exchange_rows_on_hot_tile(spark):
    """A hot tile (all rows in one z0 tile) must cross the exchange
    pre-reduced: count the rows entering the encode stage's sort by
    tapping the pre-exchange stage output row count via the Spark UI
    accumulators is flaky in local mode, so instead assert the pre-cap
    stream itself drops rows: feed one partition of 5000 rows for one
    tile with cap 100 and check the emitted superset is ~cap, not 5000."""
    import pandas as pd

    from cov_tiles_spark.pipeline.materialize import _make_precap_stream

    rng = np.random.default_rng(7)
    cols = ["z", "x", "y", "image_id", "local_x", "local_y",
            "caption", "fmt", "w", "h", "phash", "_sk"]
    batches = []
    for b in range(5):
        n = 1000
        batches.append(pd.DataFrame({
            "z": np.zeros(n, np.int64), "x": np.zeros(n, np.int64),
            "y": np.zeros(n, np.int64),
            "image_id": [f"img_{b * n + i}" for i in range(n)],
            "local_x": np.zeros(n, np.int64), "local_y": np.zeros(n, np.int64),
            "caption": "c", "fmt": "png",
            "w": np.ones(n, np.int64), "h": np.ones(n, np.int64),
            "phash": np.zeros(n, np.int64),
            "_sk": rng.integers(-(2**62), 2**62, n),
        }))
    out = list(_make_precap_stream(100, cols)(iter(batches)))
    emitted = sum(len(p) for p in out)
    # bound: <= cap survivors per batch once tracking engages; far
    # below the 5000 input rows, and a superset of the global top-100
    assert emitted < 600
    all_sk = np.sort(np.concatenate([p["_sk"].to_numpy() for p in out]))
    true_top = np.sort(
        np.concatenate([b["_sk"].to_numpy() for b in batches])
    )[:100]
    assert np.isin(true_top, all_sk).all()

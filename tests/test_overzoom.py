"""Overzoom: child tiles derived from a parent payload equal direct
materialization — exact feature membership, coords within 1 child unit
(the parent's quantization), properties byte-identical."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cov_tiles_spark.covt.decoder import decode_covt
from cov_tiles_spark.io.synth import images_df
from cov_tiles_spark.pipeline.materialize import assign_tiles, encode_assigned
from cov_tiles_spark.pipeline.overzoom import overzoom_tiles

COLS = ["image_id", "caption", "fmt", "w", "h", "phash", "lon", "lat"]


def _features(df):
    out = {}
    for r in df.collect():
        layers = decode_covt(bytes(r["payload"]))
        for name, lay in layers.items():
            vb = lay.geometry.vertex_buffer
            for i in range(lay.metadata.num_features):
                props = lay.features()[i]["properties"]
                out[(r["z"], r["x"], r["y"], name, int(lay.ids[i]))] = (
                    int(vb[2 * i]), int(vb[2 * i + 1]), props
                )
    return out


def test_overzoom_equals_direct(spark):
    imgs = images_df(spark, 800, partitions=4).persist()
    parents = encode_assigned(
        assign_tiles(imgs.select(*COLS), [4]),
        with_mvt_baseline=False,
        sample_key=F.xxhash64("image_id"),
    )
    derived = _features(overzoom_tiles(parents))
    direct = _features(
        encode_assigned(
            assign_tiles(imgs.select(*COLS), [5]),
            with_mvt_baseline=False,
            sample_key=F.xxhash64("image_id"),
        )
    )
    # exact same feature membership per child tile
    assert set(derived) == set(direct)
    for k, (dx, dy, dprops) in derived.items():
        ex, ey, eprops = direct[k]
        # coords carry the parent's quantization: off by at most 1 unit
        assert abs(dx - ex) <= 1 and abs(dy - ey) <= 1, k
        assert dprops == eprops, k
    imgs.unpersist()


def test_overzoom_feature_conservation(spark):
    imgs = images_df(spark, 300, partitions=4).persist()
    parents = encode_assigned(
        assign_tiles(imgs.select(*COLS), [3]), with_mvt_baseline=False
    ).persist()
    kids = overzoom_tiles(parents)
    n_parent = parents.agg(F.sum("num_features")).collect()[0][0]
    n_child = kids.agg(F.sum("num_features")).collect()[0][0]
    assert n_parent == n_child  # every feature lands in exactly one child
    zs = {r.z for r in kids.select("z").distinct().collect()}
    assert zs == {4}
    imgs.unpersist()
    parents.unpersist()

"""Distributed MVT→COVT transcoding over the reference's own golden .mvt
tiles — the reference's main program as a Spark job (SURVEY §3.1/§3.3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cov_tiles_spark.pipeline.transcode import transcode_mvt_directory


def test_transcode_with_generalization_pass(spark):
    # Bing tiles are NOT pre-simplified (BENCH/BASELINE.md generalization
    # table): the opt-in pass must shrink the gen-B total while every
    # tile still verifies against its simplified geometry
    base = transcode_mvt_directory(
        spark, "/root/reference/parser/js/data/bing"
    ).agg(F.sum("genb_bytes").alias("b")).collect()[0].b
    slim = transcode_mvt_directory(
        spark, "/root/reference/parser/js/data/bing", simplify_tolerance=8
    ).cache()
    rows = slim.collect()
    assert len(rows) == 7
    for r in rows:
        assert r.verified and r.genb_verified, r.path
    assert sum(r.genb_bytes for r in rows) < base


def test_transcode_reference_omt_tiles(spark):
    result = transcode_mvt_directory(
        spark, "/root/reference/parser/js/data/omt"
    ).cache()
    rows = result.collect()
    assert len(rows) == 7  # z2..z8 OMT tiles
    for r in rows:
        assert r.verified, f"{r.path}: round-trip verification failed"
        assert r.z >= 2 and r.n_features > 0
        assert r.covt_bytes > 0

    # compression parity with the reference's own measurements
    # (README.md:21-35 reports 29-74% reduction vs uncompressed MVT; we
    # lack FastPFOR + localized dictionaries, so expect >= 20% average)
    agg = result.agg(
        (1 - F.sum("covt_bytes") / F.sum("mvt_bytes")).alias("reduction")
    ).collect()[0]
    assert agg.reduction >= 0.20, f"aggregate reduction only {agg.reduction:.2%}"


def test_transcode_bing_tiles(spark):
    result = transcode_mvt_directory(
        spark, "/root/reference/parser/js/data/bing"
    )
    rows = result.collect()
    assert len(rows) == 7
    assert all(r.verified for r in rows)


def test_mvt_point_layer_size_matches_writer():
    """mvt_point_layer_size must equal len(encode_mvt(...)) byte-for-byte:
    the flagship pipeline reports this as the honest MVT-baseline size
    without materializing the bytes. Covers cross-column value-table
    collisions (w == h), negative ints (sint zigzag values), multi-byte
    value indices (> 127 table entries), and the no-id/no-props edge."""
    import numpy as np

    from cov_tiles_spark.covt.mvt import encode_mvt, mvt_point_layer_size

    rng = np.random.default_rng(2)
    for trial in range(25):
        n = int(rng.integers(1, 500))
        ids = np.sort(rng.integers(0, 10**9, n))
        xs = rng.integers(-2048, 6144, n)
        ys = rng.integers(-2048, 6144, n)
        caption = np.array(
            [f"c{int(v)}" for v in rng.integers(0, 200, n)], dtype=object
        )
        fmt = np.array(
            ["raw" if v else "rle" for v in rng.integers(0, 2, n)], dtype=object
        )
        w = rng.integers(16, 64, n)
        h = rng.integers(16, 64, n)
        phash = rng.integers(-(2**40), 2**40, n)
        props = {"caption": caption, "fmt": fmt, "w": w, "h": h, "phash": phash}
        feats = [
            {
                "id": int(ids[i]),
                "geom_type": 1,
                "parts": [[(int(xs[i]), int(ys[i]))]],
                "properties": {
                    "caption": caption[i],
                    "fmt": fmt[i],
                    "w": int(w[i]),
                    "h": int(h[i]),
                    "phash": int(phash[i]),
                },
            }
            for i in range(n)
        ]
        real = len(encode_mvt([("images", feats, 4096)]))
        fast = mvt_point_layer_size("images", ids, xs, ys, props, 4096)
        assert real == fast, (trial, n, real, fast)

    for _ in range(5):
        n = int(rng.integers(1, 50))
        xs = rng.integers(0, 4096, n)
        ys = rng.integers(0, 4096, n)
        feats = [
            {
                "id": None,
                "geom_type": 1,
                "parts": [[(int(xs[i]), int(ys[i]))]],
                "properties": {},
            }
            for i in range(n)
        ]
        real = len(encode_mvt([("p", feats, 8192)]))
        assert real == mvt_point_layer_size("p", None, xs, ys, {}, 8192)


def test_covt_to_mvt_roundtrip_both_formats():
    """Reverse transcode: MVT -> {gen-A, gen-B} -> MVT must reproduce the
    original decode exactly (id, geometry type, geometry, properties) on
    every reference golden tile. MVT byte layout is not preserved
    (command grouping differs); decoded features are."""
    import glob

    from cov_tiles_spark.covt.mvt import decode_mvt
    from cov_tiles_spark.pipeline.transcode import (
        covt_to_mvt,
        mvt_to_covt,
        mvt_to_genb,
    )

    paths = sorted(
        glob.glob("/root/reference/parser/js/data/*/*.mvt")
        + glob.glob("/root/reference/parser/js/data/*/*.pbf")
    )
    assert len(paths) == 15  # 7 omt + 7 bing + 1 amazon
    for p in paths:
        mvt = open(p, "rb").read()
        orig = {l.name: l for l in decode_mvt(mvt) if l.features}
        covt, _, _ = mvt_to_covt(mvt)
        genb, tilejson, _, _ = mvt_to_genb(mvt)
        for back_bytes in (
            covt_to_mvt(covt),
            covt_to_mvt(genb=genb, tilejson=tilejson),
        ):
            back = {l.name: l for l in decode_mvt(back_bytes) if l.features}
            assert set(orig) == set(back), p
            for n in orig:
                assert len(orig[n].features) == len(back[n].features), (p, n)
                for fa, fb in zip(orig[n].features, back[n].features):
                    assert fa.geometry == fb.geometry, (p, n)
                    assert fa.geom_type == fb.geom_type, (p, n)
                    assert fa.id == fb.id, (p, n)
                    pa = {k: v for k, v in fa.properties.items() if v is not None}
                    pb = {k: v for k, v in fb.properties.items() if v is not None}
                    assert pa == pb, (p, n)


def test_covt_to_mvt_exports_reference_tiles():
    """Export the reference's own committed gen-A tiles back to MVT:
    geometry must match the paired golden MVT exactly; properties match
    up to the reference encoder's documented fixture artifacts
    (`name:xx` renamed `name_xx`, some columns dropped — see
    tests/test_fixture_conformance.py)."""
    import glob

    from cov_tiles_spark.covt.mvt import decode_mvt
    from cov_tiles_spark.pipeline.transcode import covt_to_mvt

    for p in sorted(glob.glob("/root/reference/parser/js/data/omt/*.covt")):
        mvt_map = {
            l.name: l
            for l in decode_mvt(open(p[:-5] + ".mvt", "rb").read())
            if l.features
        }
        out = {
            l.name: l
            for l in decode_mvt(covt_to_mvt(open(p, "rb").read()))
            if l.features
        }
        assert set(mvt_map) == set(out), p
        for n in mvt_map:
            assert len(mvt_map[n].features) == len(out[n].features), (p, n)
            # the reference encoder re-sorts some layers by feature id
            # (CovtConverter.java:556-558) — align by id where present
            a_feats = mvt_map[n].features
            b_feats = out[n].features
            if all(f.id is not None for f in a_feats):
                key = lambda f: (f.id, f.geometry)  # noqa: E731
                a_feats = sorted(a_feats, key=key)
                b_feats = sorted(b_feats, key=key)
            for fa, fb in zip(a_feats, b_feats):
                assert fa.geometry == fb.geometry, (p, n)
                # properties: compare on the intersection after the
                # fixture encoder's name:xx <-> name_xx rename
                pb = {
                    k.replace("name:", "name_"): v
                    for k, v in fb.properties.items()
                    if v is not None
                }
                for k, v in fa.properties.items():
                    key = k.replace("name:", "name_")
                    if v is None or key not in pb:
                        continue
                    if isinstance(v, float):
                        assert abs(float(pb[key]) - v) <= 1e-6 * max(1.0, abs(v))
                    else:
                        assert pb[key] == v, (p, n, k)


def test_export_covt_directory(spark):
    from cov_tiles_spark.pipeline.transcode import export_covt_directory

    rows = export_covt_directory(
        spark, "/root/reference/parser/js/data/omt"
    ).collect()
    assert len(rows) == 7
    assert all(r.verified for r in rows), [r.path for r in rows if not r.verified]
    assert all(r.mvt_bytes > 0 and r.n_features > 0 for r in rows)


def test_genb_java_pfor_wire_on_golden_tiles():
    """Encode real golden MVT tiles to gen-B with the JavaFastPFOR wire
    and verify the decode is feature-identical to the default wire —
    the interop path must hold on real stream shapes (big transportation
    topology/vertex streams), not just synthetic layers."""
    from cov_tiles_spark.covt.genb import decode_tile_genb
    from cov_tiles_spark.pipeline.transcode import mvt_to_genb

    for p in (
        "/root/reference/parser/js/data/omt/4_3_9.mvt",
        "/root/reference/parser/js/data/omt/5_16_20.mvt",
    ):
        mvt = open(p, "rb").read()
        ours_b, tj, _, _ = mvt_to_genb(mvt)
        java_b, tj2, _, _ = mvt_to_genb(mvt, pfor_wire="java")
        assert tj == tj2
        assert java_b != ours_b, p  # FAST_PFOR streams engaged
        ours = decode_tile_genb(ours_b, tj)
        java = decode_tile_genb(java_b, tj2, pfor_wire="java")
        assert set(ours) == set(java), p
        for name in ours:
            a, b = ours[name], java[name]
            ga, gb = a.geometry, b.geometry
            assert np.array_equal(ga.vertex_buffer, gb.vertex_buffer), (p, name)
            assert np.array_equal(ga.geometry_types, gb.geometry_types), (p, name)
            for oa, ob in (
                (ga.geometry_offsets, gb.geometry_offsets),
                (ga.part_offsets, gb.part_offsets),
                (ga.ring_offsets, gb.ring_offsets),
            ):
                assert (oa is None) == (ob is None), (p, name)
                if oa is not None:
                    assert np.array_equal(oa, ob), (p, name)

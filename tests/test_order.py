"""Feature-order optimization (covt/order.py): the permutation must be
lossless for every geometry kind, and the reorder argmin must never
grow a tile (reference levers: README.md:210-221, id sort
CovtConverter.java:556-558)."""

from __future__ import annotations

import glob
import gzip

import numpy as np
import pytest

from cov_tiles_spark.covt.decoder import GeometryColumn
from cov_tiles_spark.covt.encoder import LayerInput, PropertyInput
from cov_tiles_spark.covt.genb import decode_tile_genb, encode_tile_genb
from cov_tiles_spark.covt.metadata import ColumnDataType, GeometryType
from cov_tiles_spark.covt.order import (
    candidate_perms,
    feature_spans,
    order_perm,
    permute_layer,
)

OMT = sorted(glob.glob("/root/reference/parser/js/data/omt/*.mvt"))


def _mixed_layer() -> LayerInput:
    """point, linestring, polygon(2 rings), multilinestring(2),
    multipolygon(2 polys: 1+2 rings), multipoint(3)."""
    types = np.array(
        [
            GeometryType.POINT,
            GeometryType.LINESTRING,
            GeometryType.POLYGON,
            GeometryType.MULTI_LINESTRING,
            GeometryType.MULTI_POLYGON,
            GeometryType.MULTI_POINT,
        ],
        np.uint8,
    )
    geometry_offsets = np.array([2, 2, 3], np.int64)  # mls, mpoly, mpt
    # ls: 3 verts; poly: 2 rings; mls parts: 2,3 verts; mpoly: 1,2 rings
    part_offsets = np.array([3, 2, 2, 3, 1, 2], np.int64)
    # rings: poly(4,3) mpoly(3, 3,4)
    ring_offsets = np.array([4, 3, 3, 3, 4], np.int64)
    verts = []
    rng = np.random.default_rng(9)
    n_verts = 1 + 3 + (4 + 3) + (2 + 3) + (3 + 3 + 4) + 3
    vb = rng.integers(0, 4096, n_verts * 2).astype(np.int32)
    props = {
        "kind": PropertyInput(
            ColumnDataType.STRING,
            np.array(["a", "b", "c", "d", "e", "f"], object),
            None,
        ),
        "rank": PropertyInput(
            ColumnDataType.INT_64,
            np.array([10, 30], np.int64),
            np.array([True, False, False, True, False, False]),
        ),
        "flag": PropertyInput(
            ColumnDataType.BOOLEAN,
            np.array([True, False, True, False, True, False]),
            np.array([True, True, False, True, True, True]),
        ),
    }
    return LayerInput(
        name="mixed",
        geometry=GeometryColumn(
            geometry_types=types,
            vertex_buffer=vb,
            geometry_offsets=geometry_offsets,
            part_offsets=part_offsets,
            ring_offsets=ring_offsets,
        ),
        ids=np.array([7, 3, 9, 1, 5, 2], np.int64),
        properties=props,
        extent=4096,
    )


def _feature_multiset(layers: dict) -> set:
    out = []
    for name, lay in layers.items():
        for f in lay.features():
            props = tuple(sorted((k, str(v)) for k, v in f["properties"].items()))
            out.append((name, f["id"], str(f["geometry"]), props))
    assert len(set(out)) == len(out)
    return set(out)


def test_feature_spans_mixed():
    lay = _mixed_layer()
    sp = feature_spans(lay.geometry)
    np.testing.assert_array_equal(sp["verts_per"], [1, 3, 7, 5, 10, 3])
    np.testing.assert_array_equal(sp["parts_per"], [0, 1, 1, 2, 2, 0])
    np.testing.assert_array_equal(sp["rings_per"], [0, 0, 2, 0, 3, 0])
    np.testing.assert_array_equal(sp["g_cnt"], [0, 0, 0, 1, 1, 1])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_permute_layer_lossless(seed):
    lay = _mixed_layer()
    base = decode_tile_genb(
        *encode_tile_genb([lay], optimize_metadata=True)
    )
    want = _feature_multiset(base)
    perm = np.random.default_rng(seed).permutation(6)
    permuted = permute_layer(lay, perm)
    got = _feature_multiset(
        decode_tile_genb(*encode_tile_genb([permuted], optimize_metadata=True))
    )
    assert got == want


def test_order_perm_point_layer_hilbert():
    rng = np.random.default_rng(3)
    n = 50
    vb = rng.integers(0, 4096, n * 2).astype(np.int32)
    g = GeometryColumn(
        geometry_types=np.full(n, GeometryType.POINT, np.uint8),
        vertex_buffer=vb,
    )
    perm = order_perm(g, 4096)
    assert perm is not None and sorted(perm) == list(range(n))


def test_order_perm_linestring_chain():
    # three segments laid end-to-start in scrambled order: the greedy
    # chain must recover the geometric order 0 -> 2 -> 1
    pts = {
        0: [(0, 0), (10, 0)],
        2: [(11, 0), (20, 0)],
        1: [(21, 0), (30, 0)],
    }
    order = [0, 1, 2]
    vb = np.array(
        [c for i in order for xy in pts[i] for c in xy], np.int32
    )
    g = GeometryColumn(
        geometry_types=np.full(3, GeometryType.LINESTRING, np.uint8),
        vertex_buffer=vb,
        part_offsets=np.array([2, 2, 2], np.int64),
    )
    perm = order_perm(g, 4096)
    assert perm is not None and perm.tolist() == [0, 2, 1]


@pytest.mark.skipif(not OMT, reason="reference fixtures unavailable")
def test_reorder_argmin_never_larger_and_verifies():
    from cov_tiles_spark.covt.mvt import decode_mvt
    from cov_tiles_spark.pipeline.transcode import (
        mvt_to_genb,
        verify_genb_roundtrip,
    )

    for p in OMT[:3]:
        raw = open(p, "rb").read()
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        base, _, _, _ = mvt_to_genb(raw)
        re_payload, tilejson, _, _ = mvt_to_genb(raw, reorder=True)
        assert len(re_payload) <= len(base)
        assert verify_genb_roundtrip(
            re_payload, tilejson, decode_mvt(raw), any_order=True
        )


def test_candidate_perms_includes_idsort():
    lay = _mixed_layer()
    names = [n for n, _ in candidate_perms(lay)]
    assert "idsort" in names

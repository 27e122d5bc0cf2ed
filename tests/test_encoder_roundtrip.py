"""Encoder round-trip: encode∘decode == identity.

Two layers of evidence:
1. synthetic layers exercising every geometry type and property codec
   (incl. nulls, UTF-8 multibyte dictionary entries, ICE-winning shared
   vertices),
2. re-encode of *real* reference fixture data: decode a golden tile,
   re-encode the layer tables with our encoder, decode again, compare
   features — real-world value distributions through every argmin path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from cov_tiles_spark.covt.decoder import GeometryColumn, decode_covt
from cov_tiles_spark.covt.encoder import (
    LayerInput,
    PropertyInput,
    encode_tile,
)
from cov_tiles_spark.covt.metadata import ColumnDataType, ColumnEncoding, GeometryType



def _points_layer(n=100) -> LayerInput:
    RNG = np.random.default_rng(1)
    xs = RNG.integers(0, 4096, n)
    ys = RNG.integers(0, 4096, n)
    vb = np.empty(2 * n, dtype=np.int32)
    vb[0::2] = xs
    vb[1::2] = ys
    geom = GeometryColumn(
        geometry_types=np.full(n, GeometryType.POINT, np.uint8), vertex_buffer=vb
    )
    present = RNG.random(n) > 0.3
    captions = np.array(
        [f"café ☕ {i % 7}" if i % 3 else f"plain {i % 5}" for i in range(n)],
        dtype=object,
    )
    return LayerInput(
        name="images",
        geometry=geom,
        ids=np.arange(n, dtype=np.int64),
        properties={
            "caption": PropertyInput(ColumnDataType.STRING, captions),
            "phash": PropertyInput(
                ColumnDataType.INT_64, RNG.integers(-(2**52), 2**52, n)
            ),
            "w": PropertyInput(ColumnDataType.UINT_64, np.tile([16, 32, 64], n)[:n]),
            "sharp": PropertyInput(ColumnDataType.BOOLEAN, RNG.random(n) > 0.5),
            "score": PropertyInput(
                ColumnDataType.FLOAT, RNG.random(n).astype(np.float32)
            ),
            "alt_caption": PropertyInput(
                ColumnDataType.STRING,
                np.array([f"alt-{i}" for i in range(int(present.sum()))], dtype=object),
                present=present,
            ),
        },
    )


def _tracks_layer(n=40) -> LayerInput:
    """LineStrings + MultiLineStrings sharing vertices (ICE should win)."""
    RNG = np.random.default_rng(2)
    shared = RNG.integers(0, 4096, (25, 2))
    types = []
    part_offsets = []
    geometry_offsets = []
    verts = []
    for i in range(n):
        if i % 4 == 0:
            types.append(GeometryType.MULTI_LINESTRING)
            geometry_offsets.append(2)
            for _ in range(2):
                k = int(RNG.integers(2, 6))
                part_offsets.append(k)
                verts.extend(shared[RNG.integers(0, 25, k)])
        else:
            types.append(GeometryType.LINESTRING)
            k = int(RNG.integers(2, 8))
            part_offsets.append(k)
            verts.extend(shared[RNG.integers(0, 25, k)])
    vb = np.asarray(verts, dtype=np.int32).ravel()
    geom = GeometryColumn(
        geometry_types=np.asarray(types, np.uint8),
        vertex_buffer=vb,
        geometry_offsets=np.asarray(geometry_offsets, np.int64),
        part_offsets=np.asarray(part_offsets, np.int64),
    )
    return LayerInput(name="tracks", geometry=geom, ids=np.arange(n, dtype=np.int64))


def _footprints_layer(n=30) -> LayerInput:
    """Polygons (some with holes) + MultiPolygons."""
    RNG = np.random.default_rng(3)
    types, g_off, p_off, r_off, verts = [], [], [], [], []

    def ring(cx, cy, r, k=5):
        pts = []
        for j in range(k):
            ang = 2 * np.pi * j / k
            pts.append((int(cx + r * np.cos(ang)), int(cy + r * np.sin(ang))))
        return pts

    for i in range(n):
        cx, cy = int(RNG.integers(200, 3800)), int(RNG.integers(200, 3800))
        if i % 5 == 0:
            types.append(GeometryType.MULTI_POLYGON)
            g_off.append(2)
            for _ in range(2):
                p_off.append(1)
                rr = ring(cx, cy, 50 + i)
                r_off.append(len(rr))
                verts.extend(rr)
        else:
            types.append(GeometryType.POLYGON)
            with_hole = i % 3 == 0
            p_off.append(2 if with_hole else 1)
            outer = ring(cx, cy, 100)
            r_off.append(len(outer))
            verts.extend(outer)
            if with_hole:
                inner = ring(cx, cy, 30)
                r_off.append(len(inner))
                verts.extend(inner)
    vb = np.asarray(verts, dtype=np.int32).ravel()
    geom = GeometryColumn(
        geometry_types=np.asarray(types, np.uint8),
        vertex_buffer=vb,
        geometry_offsets=np.asarray(g_off, np.int64),
        part_offsets=np.asarray(p_off, np.int64),
        ring_offsets=np.asarray(r_off, np.int64),
    )
    return LayerInput(
        name="footprints",
        geometry=geom,
        ids=np.arange(n, dtype=np.int64),
        properties={
            "kind": PropertyInput(
                ColumnDataType.STRING,
                np.array([["res", "ind", "com"][i % 3] for i in range(n)], dtype=object),
            ),
            "area": PropertyInput(ColumnDataType.INT_64, RNG.integers(10, 10**6, n)),
        },
    )


def test_synthetic_roundtrip():
    layers = [_points_layer(), _tracks_layer(), _footprints_layer()]
    tile = encode_tile(layers)
    decoded = decode_covt(tile)
    assert set(decoded) == {"images", "tracks", "footprints"}

    img = decoded["images"]
    src = _points_layer()
    np.testing.assert_array_equal(img.ids, src.ids)
    np.testing.assert_array_equal(img.geometry.vertex_buffer, src.geometry.vertex_buffer)
    feats = img.features()
    present = src.properties["alt_caption"].present
    alt_vals = src.properties["alt_caption"].values
    cursor = 0
    for i, f in enumerate(feats):
        assert f["properties"]["caption"] == src.properties["caption"].values[i]
        assert f["properties"]["phash"] == int(src.properties["phash"].values[i])
        assert f["properties"]["sharp"] == bool(src.properties["sharp"].values[i])
        assert f["properties"]["score"] == pytest.approx(
            float(np.float32(src.properties["score"].values[i]))
        )
        if present[i]:
            assert f["properties"]["alt_caption"] == alt_vals[cursor]
            cursor += 1
        else:
            assert "alt_caption" not in f["properties"]

    # tracks: ICE should have been selected (shared vertices)
    trk_meta = decoded["tracks"].metadata.columns
    geom_col = [c for c in trk_meta if c.name == "geometry"][0]
    assert geom_col.encoding == ColumnEncoding.INDEXED_COORDINATE_ENCODING
    # geometry equality through the row facade
    src_t = _tracks_layer()
    got = decoded["tracks"].features()
    vb = src_t.geometry.vertex_buffer
    pos = 0
    po_c = 0
    go_c = 0
    for i, f in enumerate(got):
        gt = int(src_t.geometry.geometry_types[i])
        exp_parts = []
        n_parts = 1 if gt == GeometryType.LINESTRING else int(src_t.geometry.geometry_offsets[go_c])
        if gt != GeometryType.LINESTRING:
            go_c += 1
        for _ in range(n_parts):
            k = int(src_t.geometry.part_offsets[po_c]); po_c += 1
            exp_parts.append([(int(vb[2 * (pos + j)]), int(vb[2 * (pos + j) + 1])) for j in range(k)])
            pos += k
        assert f["geometry"] == exp_parts, f"tracks[{i}]"

    # footprints: rings closed on materialization
    fp = decoded["footprints"].features()
    for f in fp:
        for ring in f["geometry"]:
            assert ring[0] == ring[-1]


@pytest.mark.parametrize(
    "fixture",
    [
        "omt/5_16_20.covt",
        "omt/2_2_2.covt",
        "bing/6-32-22.covt",
    ],
)
def test_reencode_fixture(fixture):
    """Decode a golden tile, re-encode with our encoder, decode, compare."""
    path = Path("/root/reference/parser/js/data") / fixture
    original = decode_covt(path.read_bytes())

    layers = []
    for name, lay in original.items():
        props = {}
        localized: dict[str, dict[str, PropertyInput]] = {}
        for col_name, pc in lay.properties.items():
            if pc.localized:
                group = {}
                for pname, (present, data) in pc.localized.items():
                    vals = np.array(
                        [pc.dictionary[int(i)] for i in data], dtype=object
                    )
                    group[pname] = PropertyInput(ColumnDataType.STRING, vals, present)
                localized[col_name] = group
                continue
            if pc.data_type == ColumnDataType.STRING:
                vals = np.array([pc.dictionary[int(i)] for i in pc.data], dtype=object)
                props[col_name] = PropertyInput(pc.data_type, vals, pc.present)
            elif pc.data_type == ColumnDataType.BOOLEAN:
                props[col_name] = PropertyInput(pc.data_type, pc.data, pc.present)
            else:
                props[col_name] = PropertyInput(pc.data_type, pc.data, pc.present)
        # plain-ify ICE geometries: materialize the actual vertex sequence
        geom = lay.geometry
        if geom.vertex_offsets is not None:
            flat = geom.vertex_buffer.reshape(-1, 2)[geom.vertex_offsets.astype(np.int64)]
            geom = GeometryColumn(
                geometry_types=geom.geometry_types,
                vertex_buffer=flat.astype(np.int32).ravel(),
                geometry_offsets=geom.geometry_offsets,
                part_offsets=geom.part_offsets,
                ring_offsets=geom.ring_offsets,
            )
        layers.append(
            LayerInput(
                name=name, geometry=geom, ids=lay.ids, properties=props,
                localized=localized or None,
            )
        )

    tile2 = encode_tile(layers)
    redecoded = decode_covt(tile2)

    for name, lay in original.items():
        a = lay.features()
        b = redecoded[name].features()
        assert len(a) == len(b), name
        for i, (fa, fb) in enumerate(zip(a, b)):
            assert fa["id"] == fb["id"], f"{name}[{i}] id"
            assert fa["geometry"] == fb["geometry"], f"{name}[{i}] geometry"
            assert fa["properties"] == fb["properties"], f"{name}[{i}] properties"

    # compression parity: with localized dictionaries our re-encode
    # matches or beats the reference encoder's own output size
    # (measured 0.96-1.0x on omt tiles; allow 10% headroom for bing)
    assert len(tile2) < 1.1 * path.stat().st_size

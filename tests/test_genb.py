"""Gen-B (current-format) COVT encode/decode roundtrips.

Structural parity target: `CovtParser.java:39-660` (metadata layout,
stream set, break conditions, implicit present streams) — no reference-
produced gen-B fixtures exist in the repo (the converter needs external
maven deps), so conformance here is self-roundtrip over every code path
plus byte-level layout assertions.
"""

from __future__ import annotations

import numpy as np
import pytest

from cov_tiles_spark.covt.decoder import GeometryColumn
from cov_tiles_spark.covt.encoder import LayerInput, PropertyInput
from cov_tiles_spark.covt.genb import StreamEncoding, decode_tile_genb, encode_tile_genb
from cov_tiles_spark.covt.metadata import ColumnDataType, GeometryType
from cov_tiles_spark.covt.pfor import decode_pfor, encode_pfor


def _mixed_layer(n_points: int = 300) -> LayerInput:
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 4096, n_points)
    ys = rng.integers(0, 4096, n_points)
    vb = np.empty(2 * n_points, dtype=np.int32)
    vb[0::2] = xs
    vb[1::2] = ys
    geom = GeometryColumn(
        geometry_types=np.full(n_points, GeometryType.POINT, np.uint8),
        vertex_buffer=vb,
    )
    present = np.ones(n_points, dtype=bool)
    present[::7] = False
    return LayerInput(
        name="images",
        geometry=geom,
        ids=np.arange(n_points, dtype=np.int64) * 3 + 1,
        properties={
            "caption": PropertyInput(
                ColumnDataType.STRING,
                np.array([f"cap-{i % 5}" for i in range(n_points)], dtype=object),
            ),
            "w": PropertyInput(ColumnDataType.INT_64, rng.integers(1, 4096, n_points)),
            "score": PropertyInput(
                ColumnDataType.FLOAT, rng.random(n_points).astype(np.float32)
            ),
            "flagged": PropertyInput(ColumnDataType.BOOLEAN, rng.random(n_points) > 0.5),
            "sparse": PropertyInput(
                ColumnDataType.INT_64,
                rng.integers(0, 100, int(present.sum())),
                present=present,
            ),
        },
        extent=4096,
    )


def _line_layer() -> LayerInput:
    rng = np.random.default_rng(3)
    # 40 linestrings of 20 vertices each, repeated coords to exercise ICE
    base = rng.integers(0, 512, (25, 2))
    parts = []
    part_offsets = []
    types = []
    for i in range(40):
        idx = rng.integers(0, 25, 20)
        parts.append(base[idx])
        part_offsets.append(20)
        types.append(GeometryType.LINESTRING)
    flat = np.concatenate(parts)
    vb = np.empty(flat.shape[0] * 2, dtype=np.int32)
    vb[0::2] = flat[:, 0]
    vb[1::2] = flat[:, 1]
    geom = GeometryColumn(
        geometry_types=np.array(types, np.uint8),
        vertex_buffer=vb,
        part_offsets=np.array(part_offsets, np.int64),
    )
    return LayerInput(name="roads", geometry=geom, ids=np.arange(40, dtype=np.int64))


def _poly_layer() -> LayerInput:
    # one polygon with a hole + one multipolygon of two shells
    types = np.array([GeometryType.POLYGON, GeometryType.MULTI_POLYGON], np.uint8)
    rings = [
        [(0, 0), (100, 0), (100, 100), (0, 100)],        # shell (open)
        [(40, 40), (60, 40), (60, 60), (40, 60)],        # hole
        [(200, 200), (300, 200), (250, 300)],            # mp shell 1
        [(400, 400), (500, 400), (450, 500)],            # mp shell 2
    ]
    flat = [v for ring in rings for v in ring]
    vb = np.empty(len(flat) * 2, dtype=np.int32)
    vb[0::2] = [x for x, _ in flat]
    vb[1::2] = [y for _, y in flat]
    geom = GeometryColumn(
        geometry_types=types,
        vertex_buffer=vb,
        geometry_offsets=np.array([2], np.int64),       # multipolygon: 2 polys
        part_offsets=np.array([2, 1, 1], np.int64),     # rings per polygon
        ring_offsets=np.array([4, 4, 3, 3], np.int64),  # open-ring vertex counts
    )
    return LayerInput(name="boundaries", geometry=geom)


def _assert_layer_roundtrip(layer: LayerInput, decoded) -> None:
    lay = decoded[layer.name]
    assert lay.metadata.num_features == len(layer.geometry.geometry_types)
    if layer.ids is not None:
        np.testing.assert_array_equal(lay.ids, layer.ids)
    np.testing.assert_array_equal(
        lay.geometry.geometry_types, layer.geometry.geometry_types
    )
    np.testing.assert_array_equal(lay.geometry.vertex_buffer, layer.geometry.vertex_buffer)
    for stream in ("geometry_offsets", "part_offsets", "ring_offsets"):
        want = getattr(layer.geometry, stream)
        got = getattr(lay.geometry, stream)
        if want is None or len(want) == 0:
            assert got is None or len(got) == 0
        else:
            np.testing.assert_array_equal(got, np.asarray(want))
    for name, prop in (layer.properties or {}).items():
        got = lay.properties[name]
        n = lay.metadata.num_features
        present = (
            prop.present.astype(bool) if prop.present is not None
            else np.ones(n, dtype=bool)
        )
        if prop.data_type == ColumnDataType.BOOLEAN:
            dense = np.zeros(n, dtype=bool)
            dense[present] = np.asarray(prop.values, dtype=bool)
            np.testing.assert_array_equal(got.data, dense)
        elif prop.data_type == ColumnDataType.STRING:
            np.testing.assert_array_equal(got.present, present)
            vals = [got.dictionary[int(i)] for i in got.data]
            assert vals == list(np.asarray(prop.values, dtype=object))
        elif prop.data_type == ColumnDataType.FLOAT:
            np.testing.assert_array_equal(got.present, present)
            np.testing.assert_array_equal(got.data, np.asarray(prop.values, np.float32))
        else:
            np.testing.assert_array_equal(got.present, present)
            np.testing.assert_array_equal(got.data, np.asarray(prop.values, np.int64))


@pytest.mark.parametrize("optimize", [True, False])
def test_genb_roundtrip_points_props(optimize):
    layer = _mixed_layer()
    payload, tilejson = encode_tile_genb([layer], optimize_metadata=optimize)
    decoded = decode_tile_genb(payload, tilejson if optimize else None)
    _assert_layer_roundtrip(layer, decoded)


def test_genb_optimized_requires_tilejson():
    layer = _mixed_layer(32)
    payload, _ = encode_tile_genb([layer], optimize_metadata=True)
    with pytest.raises(ValueError, match="TileJSON"):
        decode_tile_genb(payload, None)


@pytest.mark.parametrize("genc", ["plain", "ice", "ice_morton"])
def test_genb_roundtrip_lines(genc):
    layer = _line_layer()
    payload, tilejson = encode_tile_genb([layer], geometry_encoding=genc)
    decoded = decode_tile_genb(payload, tilejson)
    _assert_layer_roundtrip(layer, decoded)


def test_genb_roundtrip_polygons():
    layer = _poly_layer()
    for genc in ("plain", "ice"):
        payload, tilejson = encode_tile_genb([layer], geometry_encoding=genc)
        decoded = decode_tile_genb(payload, tilejson)
        _assert_layer_roundtrip(layer, decoded)


def test_genb_multilayer_and_pfor_toggle():
    layers = [_mixed_layer(200), _line_layer(), _poly_layer()]
    with_pfor, tj = encode_tile_genb(layers, allow_pfor_topology=True, allow_pfor_vertex=True)
    no_pfor, _ = encode_tile_genb(layers, allow_pfor_topology=False, allow_pfor_vertex=False)
    # best-of selection can only ever shrink the payload
    assert len(with_pfor) <= len(no_pfor)
    for payload in (with_pfor, no_pfor):
        decoded = decode_tile_genb(payload, tj)
        assert set(decoded) == {"images", "roads", "boundaries"}
        for layer in layers:
            _assert_layer_roundtrip(layer, decoded)


def test_genb_localized_dictionary_extension():
    """Format-reserved LOCALIZED_DICTIONARY (ColumnType 2): locales share
    one dictionary; followers carry an empty DICTIONARY marker so the
    parser's break-at-DICTIONARY state machine is preserved."""
    n = 10
    geom = GeometryColumn(
        geometry_types=np.full(n, GeometryType.POINT, np.uint8),
        vertex_buffer=np.arange(2 * n, dtype=np.int32),
    )
    present_de = np.array([True] * 6 + [False] * 4)
    names = np.array([f"city-{i % 3}" for i in range(n)], dtype=object)
    names_de = np.array([f"stadt-{i % 3}" for i in range(6)], dtype=object)
    layer = LayerInput(
        name="place",
        geometry=geom,
        localized={
            "name": {
                "name": PropertyInput(ColumnDataType.STRING, names),
                "name:de": PropertyInput(ColumnDataType.STRING, names_de, present_de),
            }
        },
    )
    payload, tj = encode_tile_genb([layer])
    dec = decode_tile_genb(payload, tj)["place"]
    got = dec.properties["name"]
    got_de = dec.properties["name:de"]
    assert got.dictionary is got_de.dictionary  # genuinely shared
    assert [got.dictionary[int(i)] for i in got.data] == list(names)
    np.testing.assert_array_equal(got_de.present, present_de)
    assert [got_de.dictionary[int(i)] for i in got_de.data] == list(names_de)

    # shared dictionary must be smaller than two independent ones when
    # locales overlap heavily
    shared_vals = np.array(["common-" + str(i % 4) for i in range(n)], dtype=object)
    layer_shared = LayerInput(
        name="place", geometry=geom,
        localized={"name": {
            "name": PropertyInput(ColumnDataType.STRING, shared_vals),
            "name:en": PropertyInput(ColumnDataType.STRING, shared_vals.copy()),
        }},
    )
    layer_split = LayerInput(
        name="place", geometry=geom,
        properties={
            "name": PropertyInput(ColumnDataType.STRING, shared_vals),
            "name:en": PropertyInput(ColumnDataType.STRING, shared_vals.copy()),
        },
    )
    p_shared, _ = encode_tile_genb([layer_shared])
    p_split, _ = encode_tile_genb([layer_split])
    assert len(p_shared) < len(p_split)


def test_pfor_exceptions_and_tail():
    rng = np.random.default_rng(11)
    v = rng.integers(0, 200, 1000).astype(np.int64)
    v[::37] = 1 << 24  # outliers -> patched exceptions
    enc = encode_pfor(v)
    dec, off = decode_pfor(np.frombuffer(enc, np.uint8), len(v))
    assert off == len(enc)
    np.testing.assert_array_equal(dec, v)
    # exceptions must beat brute-force max-width packing
    wide = encode_pfor(np.full(1000, 1 << 24, dtype=np.int64))
    assert len(enc) < 1000 * 25 // 8


def test_genb_tileset_shared_tilejson():
    """Tileset mode: all 7 OMT tiles encoded against one global layer
    table must decode feature-exact using the SINGLE shared TileJSON
    (per-tile sidecars are positional and cannot be shared — this is
    the reference's one-metadata-file-per-tileset deployment shape)."""
    import glob

    from cov_tiles_spark.covt.genb import decode_tile_genb
    from cov_tiles_spark.covt.mvt import decode_mvt
    from cov_tiles_spark.pipeline.transcode import (
        _features_match,
        mvts_to_genb_tileset,
    )

    paths = sorted(glob.glob("/root/reference/parser/js/data/omt/*.mvt"))
    tiles = [open(p, "rb").read() for p in paths]
    payloads, tilejson = mvts_to_genb_tileset(tiles)
    assert len(payloads) == 7
    # the merged table covers every layer exactly once
    names = [v["id"] for v in tilejson["vector_layers"]]
    assert len(names) == len(set(names))
    for p, payload, mvt in zip(paths, payloads, tiles):
        decoded = decode_tile_genb(payload, tilejson)
        assert _features_match(decoded, decode_mvt(mvt)), p


@pytest.mark.parametrize("genc", ["plain", "ice", "ice_morton"])
def test_genb_java_pfor_wire_roundtrip(genc):
    """pfor_wire="java" round-trips every geometry mode and actually
    engages: with the size-gate bypassed by a line layer big enough to
    pick FAST_PFOR, the java-wire payload differs byte-wise from the
    default wire while decoding to the identical layers."""
    layers = [_mixed_layer(300), _line_layer(), _poly_layer()]
    ours, tj = encode_tile_genb(layers, geometry_encoding=genc)
    java, tj2 = encode_tile_genb(layers, geometry_encoding=genc, pfor_wire="java")
    assert tj == tj2
    decoded = decode_tile_genb(java, tj, pfor_wire="java")
    for layer in layers:
        _assert_layer_roundtrip(layer, decoded)
    # cross-wire decode of a FAST_PFOR-bearing tile must not silently
    # succeed-with-garbage: when the wires produced different payloads,
    # decoding the java tile as "ours" must either raise or mis-decode
    if java != ours:
        try:
            wrong = decode_tile_genb(java, tj)
            assert any(
                not np.array_equal(
                    wrong[k].geometry.vertex_buffer, decoded[k].geometry.vertex_buffer
                )
                for k in decoded
            )
        except (ValueError, IndexError):
            pass


def test_genb_java_wire_uses_fastpfor_streams():
    """The java wire is live on the stream level: a topology stream
    whose values make FAST_PFOR win must carry JavaFastPFOR words
    (decode them directly with covt/pfor_java.py)."""
    from cov_tiles_spark.covt.pfor_java import decode_fastpfor_java

    rng = np.random.default_rng(11)
    vals = np.sort(rng.integers(0, 5000, 4000))
    from cov_tiles_spark.covt.genb import _PFOR_WIRE, _best_offsets

    token = _PFOR_WIRE.set("java")
    try:
        enc, data = _best_offsets(vals.astype(np.int64), True)
    finally:
        _PFOR_WIRE.reset(token)
    assert enc == StreamEncoding.FAST_PFOR_DELTA_ZIG_ZAG
    got, _ = decode_fastpfor_java(
        np.frombuffer(data, np.uint8), len(vals), len(data),
        zigzag=True, delta=True,
    )
    np.testing.assert_array_equal(got, vals)

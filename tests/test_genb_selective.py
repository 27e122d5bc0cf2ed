"""Selective (projected) gen-B decode: layer- and column-level pruning
pushed INTO the tile payload.

Every stream's byte length is in the column metadata, so the decoder can
jump unselected data instead of parsing it — the lazy-parse scan shape
the reference's parser roadmap targets. These tests pin the skip
arithmetic against the full decode on real reference tiles (any drift in
a stream's recorded byte length desyncs the cursor and fails loudly).
"""

from __future__ import annotations

import glob

import numpy as np

from cov_tiles_spark.covt.genb import decode_tile_genb

OMT = sorted(glob.glob("/root/reference/parser/js/data/omt/*.mvt"))


def _props_equal(a, b) -> bool:
    if (a.dictionary is None) != (b.dictionary is None):
        return False
    if a.dictionary is not None and list(a.dictionary) != list(b.dictionary):
        return False
    if (a.present is None) != (b.present is None):
        return False
    if a.present is not None and not np.array_equal(a.present, b.present):
        return False
    return np.array_equal(np.asarray(a.data), np.asarray(b.data))


def _encode_omt_tileset():
    from cov_tiles_spark.pipeline.transcode import mvts_to_genb_tileset

    tiles = [open(p, "rb").read() for p in OMT]
    return mvts_to_genb_tileset(tiles)


def test_layer_pruned_decode_matches_full_on_reference_tiles():
    payloads, tj = _encode_omt_tileset()
    for payload in payloads:
        full = decode_tile_genb(payload, tj)
        for lname, flay in full.items():
            only = decode_tile_genb(payload, tj, layers={lname})
            assert set(only) == {lname}
            lay = only[lname]
            assert np.array_equal(
                np.asarray(lay.geometry.vertex_buffer),
                np.asarray(flay.geometry.vertex_buffer),
            )
            if flay.ids is None:
                assert lay.ids is None
            else:
                assert np.array_equal(lay.ids, flay.ids)
            assert set(lay.properties) == set(flay.properties)
            for pname, pc in flay.properties.items():
                assert _props_equal(lay.properties[pname], pc), (lname, pname)


def test_column_pruned_decode_matches_full_on_reference_tiles():
    payloads, tj = _encode_omt_tileset()
    checked_props = 0
    for payload in payloads:
        full = decode_tile_genb(payload, tj)
        for lname, flay in full.items():
            # geometry-only read: no ids, no properties decoded
            geo = decode_tile_genb(
                payload, tj, layers={lname}, columns={"geometry"}
            )[lname]
            assert np.array_equal(
                np.asarray(geo.geometry.vertex_buffer),
                np.asarray(flay.geometry.vertex_buffer),
            )
            assert geo.ids is None and geo.properties == {}
            # column metadata stays complete even under pruning
            assert [c.name for c in geo.metadata.columns] == [
                c.name for c in flay.metadata.columns
            ]
            # single-property read (no geometry): exact per column
            for pname, pc in flay.properties.items():
                one = decode_tile_genb(
                    payload, tj, layers={lname}, columns={pname}
                )[lname]
                assert one.geometry is None
                assert set(one.properties) == {pname}
                assert _props_equal(one.properties[pname], pc), (lname, pname)
                checked_props += 1
    assert checked_props > 50  # omt tiles are property-rich


def test_localized_follower_forces_leader_dictionary():
    """Selecting only a shared-dictionary FOLLOWER must still decode its
    group leader's dictionary stream (and only emit the follower)."""
    payloads, tj = _encode_omt_tileset()
    found = 0
    for payload in payloads:
        full = decode_tile_genb(payload, tj)
        for lname, flay in full.items():
            followers = [
                p
                for p, pc in flay.properties.items()
                if ":" in p and pc.dictionary is not None
            ]
            for pname in followers[:3]:
                one = decode_tile_genb(
                    payload, tj, layers={lname}, columns={pname}
                )[lname]
                assert set(one.properties) == {pname}
                assert _props_equal(one.properties[pname], flay.properties[pname])
                found += 1
    assert found > 0  # omt place layers carry name:* locale groups


def test_selective_decode_under_pfor_and_id_selection():
    from cov_tiles_spark.pipeline.transcode import mvt_to_genb

    mvt = open(OMT[-1], "rb").read()
    payload, tj, _nl, _nf = mvt_to_genb(mvt)
    full = decode_tile_genb(payload, tj)
    for lname, flay in full.items():
        ids_only = decode_tile_genb(payload, tj, layers={lname}, columns={"id"})[
            lname
        ]
        if flay.ids is None:
            assert ids_only.ids is None
        else:
            assert np.array_equal(ids_only.ids, flay.ids)
        assert ids_only.geometry is None and ids_only.properties == {}

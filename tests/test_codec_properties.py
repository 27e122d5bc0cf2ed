"""Property-based codec tests (hypothesis): encode∘decode == id for
arbitrary inputs, not just the seeded fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cov_tiles_spark.covt.bitset import pack_bitset, unpack_bitset
from cov_tiles_spark.covt.rle import (
    decode_byte_rle,
    decode_int_rle,
    encode_byte_rle,
    encode_int_rle,
)
from cov_tiles_spark.covt.sfc import hilbert_d2xy, hilbert_xy2d, morton_decode, morton_encode
from cov_tiles_spark.covt.varint import (
    decode_varints,
    decode_zigzag_varints,
    encode_varints,
    encode_zigzag_varints,
)

_settings = settings(max_examples=60, deadline=None)


@_settings
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = np.frombuffer(encode_varints(arr), dtype=np.uint8)
    out, off = decode_varints(buf, len(arr)) if len(arr) else (arr, 0)
    np.testing.assert_array_equal(out, arr)
    assert off == len(buf)


@_settings
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=300))
def test_zigzag_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    buf = np.frombuffer(encode_zigzag_varints(arr), dtype=np.uint8)
    out, _ = decode_zigzag_varints(buf, len(arr)) if len(arr) else (arr, 0)
    np.testing.assert_array_equal(out, arr)


@_settings
@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=400),
    st.booleans(),
)
def test_int_rle_roundtrip(vals, signed):
    if not signed:
        vals = [abs(v) for v in vals]
    arr = np.array(vals, dtype=np.int64)
    buf = np.frombuffer(encode_int_rle(arr, signed=signed), dtype=np.uint8)
    out, off = decode_int_rle(buf, len(arr), signed=signed)
    np.testing.assert_array_equal(out.astype(np.int64), arr)
    assert off == len(buf)


@_settings
@given(st.binary(max_size=600))
def test_byte_rle_roundtrip(raw):
    arr = np.frombuffer(raw, dtype=np.uint8)
    buf = np.frombuffer(encode_byte_rle(arr), dtype=np.uint8)
    out, off = decode_byte_rle(buf, len(arr))
    np.testing.assert_array_equal(out, arr)
    assert off == len(buf)


@_settings
@given(st.lists(st.booleans(), max_size=200))
def test_bitset_roundtrip(bits):
    arr = np.array(bits, dtype=bool)
    packed = pack_bitset(arr, len(arr))
    np.testing.assert_array_equal(unpack_bitset(packed, len(arr)), arr)


@_settings
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**13 - 1),
            st.integers(min_value=0, max_value=2**13 - 1),
        ),
        min_size=1,
        max_size=100,
    )
)
def test_hilbert_bijective(points):
    x = np.array([p[0] for p in points], dtype=np.uint64)
    y = np.array([p[1] for p in points], dtype=np.uint64)
    d = hilbert_xy2d(13, x, y)
    rx, ry = hilbert_d2xy(13, d)
    np.testing.assert_array_equal(rx, x)
    np.testing.assert_array_equal(ry, y)


@_settings
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-2048, max_value=2047),
            st.integers(min_value=-2048, max_value=2047),
        ),
        min_size=1,
        max_size=100,
    )
)
def test_morton_bijective(points):
    x = np.array([p[0] for p in points], dtype=np.int64)
    y = np.array([p[1] for p in points], dtype=np.int64)
    code = morton_encode(x, y, 4096)
    rx, ry = morton_decode(code, 4096)
    np.testing.assert_array_equal(rx, x)
    np.testing.assert_array_equal(ry, y)


@_settings
@given(
    st.lists(st.integers(min_value=-(2**45), max_value=2**45), min_size=1, max_size=500),
    st.booleans(),
    st.booleans(),
)
def test_bitpack_roundtrip(vals, signed, delta):
    from cov_tiles_spark.covt.bitpack import decode_bitpack, encode_bitpack

    if not (signed or delta):
        vals = [abs(v) for v in vals]
    arr = np.array(vals, dtype=np.int64)
    buf = np.frombuffer(encode_bitpack(arr, signed=signed, delta=delta), dtype=np.uint8)
    out = decode_bitpack(buf, len(arr), signed=signed, delta=delta)
    np.testing.assert_array_equal(out, arr)


@_settings
@given(
    st.lists(st.integers(min_value=-(2**45), max_value=2**45), min_size=1, max_size=600),
    st.booleans(),
    st.booleans(),
)
def test_pfor_roundtrip(vals, zigzag, delta):
    """Patched frame-of-reference (FastPFOR analogue, covt/pfor.py):
    any int64 stream round-trips under all flag combinations."""
    from cov_tiles_spark.covt.pfor import decode_pfor, encode_pfor

    if not (zigzag or delta):
        vals = [abs(v) for v in vals]
    arr = np.array(vals, dtype=np.int64)
    buf = np.frombuffer(
        encode_pfor(arr, zigzag=zigzag, delta=delta), dtype=np.uint8
    )
    out, _off = decode_pfor(buf, len(arr), zigzag=zigzag, delta=delta)
    np.testing.assert_array_equal(np.asarray(out, dtype=np.int64), arr)

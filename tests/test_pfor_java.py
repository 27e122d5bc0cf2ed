"""JavaFastPFOR wire-format conformance (covt/pfor_java.py).

Strategy: the vectorized codec is pinned against an INDEPENDENT scalar
twin below that transliterates the public JavaFastPFOR control flow
(Composition / FastPFOR.encodePage / VariableByte) with plain python
loops — word-for-word layout, no shared code with the implementation
under test. Plus hand-derived byte vectors for the VariableByte lane
and the small-input ("F1 had no effect") marker. The sandbox carries no
JavaFastPFOR jar, so cross-language execution is out of reach; the twin
+ vectors pin the layout the module documents.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cov_tiles_spark.covt.pfor_java import (
    BLOCK,
    PAGE,
    compress_composition,
    decode_fastpfor_java,
    decode_fastpfor_java_delta_pairs,
    decompress_composition,
    encode_fastpfor_java,
)

# --------------------------------------------------------- scalar twin


def _twin_pack32(vals, b, out):
    """BitPacking.fastpack: 32 values -> b ints, LSB-first bit walk."""
    if b == 0:
        return
    words = [0] * b
    bit = 0
    for v in vals:
        w, off = bit >> 5, bit & 31
        words[w] |= (v & ((1 << b) - 1)) << off
        spill = words[w] >> 32
        words[w] &= 0xFFFFFFFF
        if spill:
            words[w + 1] |= spill
        bit += b
    out.extend(words)


def _twin_best_b(block):
    freqs = [0] * 34
    for v in block:
        freqs[v.bit_length()] += 1
    maxb = 33
    while freqs[maxb := maxb - 1] == 0 and maxb > 0:
        pass
    bestb, bestc, bestcost = maxb, 0, maxb * BLOCK
    cexcept = 0
    for b in range(maxb - 1, -1, -1):
        cexcept += freqs[b + 1]
        if cexcept == BLOCK:
            break
        cost = cexcept * 8 + cexcept * (maxb - b) + b * BLOCK + 8
        if maxb - b == 1:
            cost -= cexcept
        if cost < bestcost:
            bestcost, bestb, bestc = cost, b, cexcept
    return bestb, bestc, maxb


def _twin_encode_page(vals, out):
    header = len(out)
    out.append(None)  # meta_offset placeholder
    meta = bytearray()
    pools = {k: [] for k in range(2, 33)}
    for s in range(0, len(vals), BLOCK):
        block = vals[s : s + BLOCK]
        bestb, cexcept, maxb = _twin_best_b(block)
        meta.append(bestb)
        meta.append(cexcept)
        if cexcept:
            meta.append(maxb)
            index = maxb - bestb
            for k, v in enumerate(block):
                if v >> bestb:
                    meta.append(k)
                    if index != 1:
                        pools[index].append(v >> bestb)
        for g in range(0, BLOCK, 32):
            _twin_pack32([v & ((1 << bestb) - 1) for v in block[g : g + 32]], bestb, out)
    out[header] = len(out) - header
    bytesize = len(meta)
    while len(meta) & 3:
        meta.append(0)
    out.append(bytesize)
    for i in range(0, len(meta), 4):  # big-endian bytes -> int
        out.append((meta[i] << 24) | (meta[i + 1] << 16) | (meta[i + 2] << 8) | meta[i + 3])
    bitmap = 0
    for k in range(2, 33):
        if pools[k]:
            bitmap |= 1 << (k - 2)
    out.append(bitmap)
    for k in range(2, 33):
        if pools[k]:
            out.append(len(pools[k]))
            padded = pools[k] + [0] * ((-len(pools[k])) % 32)
            for g in range(0, len(padded), 32):
                _twin_pack32(padded[g : g + 32], k, out)


def _twin_compress(values):
    """Composition(FastPFOR, VariableByte).compress -> int list."""
    vals = [int(v) & 0xFFFFFFFF for v in values]
    if not vals:
        return []
    out = []
    n_f1 = (len(vals) // BLOCK) * BLOCK
    if n_f1:
        out.append(n_f1)
        for s in range(0, n_f1, PAGE):
            _twin_encode_page(vals[s : min(s + PAGE, n_f1)], out)
    else:
        out.append(0)
    rest = vals[n_f1:]
    if rest:
        by = bytearray()
        for v in rest:
            while v >= 128:
                by.append(v & 0x7F)
                v >>= 7
            by.append(v | 0x80)
        while len(by) & 3:
            by.append(0)
        for i in range(0, len(by), 4):
            out.append((by[i] << 24) | (by[i + 1] << 16) | (by[i + 2] << 8) | by[i + 3])
    return out


# ------------------------------------------------------------- corpora


def _corpus(rng, n):
    """Mix of small values with heavy-tail outliers (exception lanes)."""
    base = rng.integers(0, 64, n, dtype=np.int64)
    hot = rng.random(n) < 0.04
    base[hot] = rng.integers(0, 2**31 - 1, int(hot.sum()), dtype=np.int64)
    return base.astype(np.uint64)


@pytest.mark.parametrize(
    "n", [0, 1, 17, 255, 256, 257, 300, 512, 1000, 4096, PAGE, PAGE + 300]
)
def test_words_match_twin(n):
    rng = np.random.default_rng(n + 1)
    vals = _corpus(rng, n)
    ours = compress_composition(vals)
    twin = _twin_compress(vals)
    assert ours.tolist() == twin, f"word stream diverges at n={n}"


def test_roundtrip_matches_twin_stream():
    # decode the TWIN's stream with our decoder (the interop direction:
    # library-produced words -> our values)
    rng = np.random.default_rng(42)
    vals = _corpus(rng, 5000)
    twin = np.array(_twin_compress(vals), dtype=np.uint32)
    got = decompress_composition(twin, len(vals))
    np.testing.assert_array_equal(got, vals)


@given(
    st.lists(
        st.integers(0, 2**32 - 1), min_size=0, max_size=700
    ),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(vals, seed):
    u = np.array(vals, dtype=np.uint64)
    words = compress_composition(u)
    assert words.tolist() == _twin_compress(u)
    got = decompress_composition(words, len(u))
    np.testing.assert_array_equal(got, u)


def test_width1_exceptions_are_implicit():
    """maxb - bestb == 1: positions recorded, values implicit (the
    decoder ORs 1 << bestb). Force it: 250 values of width 3, 6 of
    width 4 — cost picks bestb=3, and the width-1 high parts must not
    appear in any exception pool (bitmap == 0)."""
    vals = np.array([5] * 250 + [9] * 6, dtype=np.uint64)  # 9 = 0b1001
    words = compress_composition(vals)
    assert words.tolist() == _twin_compress(vals)
    got = decompress_composition(words, len(vals))
    np.testing.assert_array_equal(got, vals)
    # bitmap int == 0 (no stored pools): it sits right after the
    # metadata byte ints; locate via the page's meta_offset
    meta_off = int(words[1])  # ints[1] is the page header
    bytesize = int(words[1 + meta_off])
    bitmap = words[1 + meta_off + 1 + (bytesize + 3) // 4]
    assert bitmap == 0


def test_variable_byte_hand_vector():
    """< 256 values: a literal 0 int ("F1 had no effect") then the
    VariableByte lane. 300 -> 0x2C 0x82 (LSB-first groups, high bit on
    the last byte); 1 -> 0x81; padded to 4 bytes big-endian."""
    words = compress_composition(np.array([300, 1], dtype=np.uint64))
    assert words[0] == 0
    assert words[1] == (0x2C << 24) | (0x82 << 16) | (0x81 << 8)
    assert len(words) == 2


def test_byte_serialization_big_endian():
    by = encode_fastpfor_java(np.array([300, 1], dtype=np.int64))
    assert by == bytes([0, 0, 0, 0, 0x2C, 0x82, 0x81, 0x00])
    vals, off = decode_fastpfor_java(np.frombuffer(by, np.uint8), 2, len(by))
    assert vals.tolist() == [300, 1] and off == len(by)


def test_zigzag_delta_transform():
    rng = np.random.default_rng(3)
    vals = np.cumsum(rng.integers(-50, 50, 700, dtype=np.int64))
    by = encode_fastpfor_java(vals, zigzag=True, delta=True)
    buf = np.frombuffer(by, np.uint8)
    got, _ = decode_fastpfor_java(buf, len(vals), len(by), zigzag=True, delta=True)
    np.testing.assert_array_equal(got, vals)


def test_delta_pairs_transform():
    """decodeFastPfor128DeltaCoordinates: interleaved x/y chains."""
    rng = np.random.default_rng(4)
    pts = np.cumsum(rng.integers(-9, 9, (400, 2), dtype=np.int64), axis=0)
    inter = pts.ravel()
    # encode like EncodingUtils.encodeZigZagDeltaCoordinates: per-axis
    # deltas, zigzag per value
    deltas = np.diff(pts, axis=0, prepend=np.zeros((1, 2), np.int64)).ravel()
    zz = ((deltas << 1) ^ (deltas >> 63)).astype(np.uint64)
    by = compress_composition(zz).astype(">u4").tobytes()
    got, _ = decode_fastpfor_java_delta_pairs(
        np.frombuffer(by, np.uint8), len(inter), len(by)
    )
    np.testing.assert_array_equal(got, inter)


def test_int32_domain_guard():
    with pytest.raises(ValueError, match="int32"):
        compress_composition(np.array([2**32], dtype=np.uint64))


def test_multi_page():
    rng = np.random.default_rng(9)
    vals = _corpus(rng, 2 * PAGE + 700)
    words = compress_composition(vals)
    assert words.tolist() == _twin_compress(vals)
    np.testing.assert_array_equal(decompress_composition(words, len(vals)), vals)

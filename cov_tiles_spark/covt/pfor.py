"""FastPFOR-style patched frame-of-reference bitpacking (kernel K9).

The reference's gen-B format emits FAST_PFOR_DELTA_ZIG_ZAG streams for
topology/vertex data when smaller than varint/RLE (`CovtConverter.java:
92-97, 649-668, 899-919`), produced by me.lemire's JavaFastPFOR
``Composition(FastPFOR, VariableByte)`` and consumed by
`DecodingUtils.java:316-392`. This module is the from-scratch analogue:
the same algorithm family (128-int blocks, per-block bit width chosen by
exact cost minimization, out-of-band "patched" exceptions for outliers,
variable-byte tail for the non-multiple-of-128 remainder) with our own
documented container layout. JavaFastPFOR's exact word layout is an
implementation detail of an external library (not defined anywhere in the
reference repo), so byte-interop with it is out of scope; every stream
written here is decoded by ``decode_pfor`` below and round-trip
verified.

Container layout (all little-endian):
    per full 128-value block:
        u8 bestb ‖ u8 n_exceptions ‖
        [u8 maxb ‖ n_exceptions x u8 positions   -- iff n_exceptions > 0]
        ceil(128*bestb/8) bytes: low ``bestb`` bits of each value,
            LSB-first bitpacked
        ceil(n_exceptions*(maxb-bestb)/8) bytes: the high
            ``maxb-bestb`` bits of each exception value, LSB-first
    tail (numValues % 128 values): plain varints

Values are first delta-encoded (prev=0) and zigzag-encoded when the
stream's transform asks for it — the same pre-transforms the reference
applies before handing ints to FastPFOR (`EncodingUtils.java:149-163`).
"""

from __future__ import annotations

import numpy as np

from cov_tiles_spark.covt.varint import (
    decode_varints,
    encode_varints,
    zigzag_decode,
    zigzag_encode,
)

BLOCK = 128


def _pack_bits(vals: np.ndarray, width: int) -> bytes:
    """LSB-first bitpack ``vals`` (uint32-ish) at ``width`` bits each."""
    if width == 0:
        return b""
    bits = (
        (vals[:, None].astype(np.uint64) >> np.arange(width, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def _unpack_bits(buf: np.ndarray, offset: int, n: int, width: int) -> tuple[np.ndarray, int]:
    if width == 0:
        return np.zeros(n, dtype=np.uint64), offset
    nbytes = (n * width + 7) // 8
    bits = np.unpackbits(
        buf[offset : offset + nbytes], bitorder="little", count=n * width
    ).reshape(n, width)
    vals = (bits.astype(np.uint64) << np.arange(width, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return vals, offset + nbytes


def _best_width(widths: np.ndarray, maxb: int) -> tuple[int, int]:
    """Exact-cost argmin over candidate bit widths for one block.

    cost(b) in bits = 16 (header) + [8 + 8*cexcept + cexcept*(maxb-b)]
    (exception table, iff any) + 128*b (packed lanes).
    """
    counts = np.bincount(widths, minlength=maxb + 1)
    # n_exceptions(b) = number of values with width > b
    cum = np.cumsum(counts[::-1])[::-1]  # cum[b] = count(width >= b)
    best_b, best_cost = maxb, 16 + BLOCK * maxb
    for b in range(maxb):
        cexcept = int(cum[b + 1])
        cost = 16 + BLOCK * b + (8 + 8 * cexcept + cexcept * (maxb - b) if cexcept else 0)
        if cost < best_cost:
            best_b, best_cost = b, cost
    return best_b, best_cost


def encode_pfor(values: np.ndarray, zigzag: bool = False, delta: bool = False) -> bytes:
    """Encode int64 values; optional delta (prev=0) then zigzag transform."""
    v = np.asarray(values).astype(np.int64, copy=False)
    if delta:
        v = np.diff(v, prepend=np.int64(0))
    u = zigzag_encode(v) if zigzag else v.astype(np.uint64)
    # the reference's FastPFOR is int32-only (`EncodingUtils.java:149`
    # takes int[]); our container packs any width <= 64 — wide outliers
    # land in the exception lanes instead of overflowing
    parts: list[bytes] = []
    n_full = (len(u) // BLOCK) * BLOCK
    for s in range(0, n_full, BLOCK):
        block = u[s : s + BLOCK]
        maxb = int(block.max()).bit_length()
        widths = np.zeros(BLOCK, dtype=np.int64)
        nz = block > 0
        if nz.any():
            widths[nz] = np.floor(np.log2(block[nz].astype(np.float64))).astype(np.int64) + 1
        bestb, _ = _best_width(widths, maxb)
        exc_pos = np.flatnonzero(widths > bestb)
        parts.append(bytes([bestb, len(exc_pos)]))
        if len(exc_pos):
            parts.append(bytes([maxb]))
            parts.append(exc_pos.astype(np.uint8).tobytes())
        low_mask = np.uint64((1 << bestb) - 1) if bestb else np.uint64(0)
        parts.append(_pack_bits(block & low_mask, bestb))
        if len(exc_pos):
            high = block[exc_pos] >> np.uint64(bestb)
            parts.append(_pack_bits(high, maxb - bestb))
    if n_full < len(u):  # variable-byte tail (Composition analogue)
        parts.append(encode_varints(u[n_full:]))
    return b"".join(parts)


_WITHIN = np.arange(BLOCK, dtype=np.int64)


def decode_pfor(
    buf: np.ndarray, n: int, offset: int = 0, zigzag: bool = False, delta: bool = False
) -> tuple[np.ndarray, int]:
    """Decode ``n`` values; returns (int64 array, new offset).

    All full blocks' low lanes decode in ONE vectorized byte-gather pass
    (value i of a width-``w`` block starting at byte ``s`` lives at bit
    ``i*w`` of the payload: gather 8 bytes from ``s + i*w//8``, shift by
    ``i*w % 8``, mask ``w`` bits) — the per-block ``np.unpackbits`` path
    paid ~15 µs/block of numpy setup, dominating gen-B decode profiles.
    Widths > 56 bits cannot be windowed in a uint64 after the bit offset
    shift and fall back to the per-block path (never emitted for tile
    data, which is < 2^35 after zigzag).
    """
    u = np.empty(n, dtype=np.uint64)
    n_full = (n // BLOCK) * BLOCK
    nblocks = n_full // BLOCK
    if nblocks:
        widths = np.empty(nblocks, dtype=np.int64)
        starts = np.empty(nblocks, dtype=np.int64)
        exc: list[tuple] = []  # (block_idx, exc_pos u8 view, bestb, highw, high_at)
        hdr = memoryview(buf)  # scalar reads ~3x faster than numpy indexing
        for i in range(nblocks):
            bestb = hdr[offset]
            cexcept = hdr[offset + 1]
            offset += 2
            if cexcept:
                maxb = hdr[offset]
                offset += 1
                exc_pos = buf[offset : offset + cexcept]
                offset += cexcept
            widths[i] = bestb
            starts[i] = offset
            offset += (BLOCK * bestb + 7) >> 3
            if cexcept:
                exc.append((i, exc_pos, bestb, maxb - bestb, offset))
                offset += (cexcept * (maxb - bestb) + 7) >> 3
        maxw = int(widths.max())
        if maxw <= 56:
            w_rep = np.repeat(widths, BLOCK)
            bitpos = np.tile(_WITHIN, nblocks) * w_rep
            byte_idx = np.repeat(starts, BLOCK) + (bitpos >> 3)
            acc = np.zeros(n_full, dtype=np.uint64)
            last = buf.shape[0] - 1
            for k in range((maxw + 14) >> 3):  # bit_off<=7 + width, rounded up
                acc |= buf[np.minimum(byte_idx + k, last)].astype(
                    np.uint64
                ) << np.uint64(8 * k)
            u[:n_full] = (acc >> (bitpos & 7).astype(np.uint64)) & (
                (np.uint64(1) << w_rep.astype(np.uint64)) - np.uint64(1)
            )
        else:  # >56-bit lanes: per-block unpack (cold path)
            for i in range(nblocks):
                block, _ = _unpack_bits(buf, int(starts[i]), BLOCK, int(widths[i]))
                u[i * BLOCK : (i + 1) * BLOCK] = block
        if exc:  # batch the exception lanes with the same byte-gather
            e_ns = np.array([e[1].shape[0] for e in exc], dtype=np.int64)
            e_low = np.array([e[2] for e in exc], dtype=np.int64)
            e_ws = np.array([e[3] for e in exc], dtype=np.int64)
            e_starts = np.array([e[4] for e in exc], dtype=np.int64)
            pos = np.concatenate(
                [e[1] for e in exc]
            ).astype(np.int64) + np.repeat(
                np.array([e[0] for e in exc], dtype=np.int64) * BLOCK, e_ns
            )
            e_maxw = int(e_ws.max())
            if e_maxw <= 56:
                tot = int(e_ns.sum())
                within = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(e_ns) - e_ns, e_ns
                )
                w_rep = np.repeat(e_ws, e_ns)
                bitpos = within * w_rep
                byte_idx = np.repeat(e_starts, e_ns) + (bitpos >> 3)
                acc = np.zeros(tot, dtype=np.uint64)
                last = buf.shape[0] - 1
                for k in range((e_maxw + 14) >> 3):
                    acc |= buf[np.minimum(byte_idx + k, last)].astype(
                        np.uint64
                    ) << np.uint64(8 * k)
                high = (acc >> (bitpos & 7).astype(np.uint64)) & (
                    (np.uint64(1) << w_rep.astype(np.uint64)) - np.uint64(1)
                )
                u[pos] |= high << np.repeat(e_low, e_ns).astype(np.uint64)
            else:
                at = 0
                for i, exc_pos, bestb, highw, high_at in exc:
                    high, _ = _unpack_bits(buf, high_at, exc_pos.shape[0], highw)
                    u[pos[at : at + exc_pos.shape[0]]] |= high << np.uint64(bestb)
                    at += exc_pos.shape[0]
    if n_full < n:
        tail, offset = decode_varints(buf, n - n_full, offset)
        u[n_full:] = tail
    v = zigzag_decode(u) if zigzag else u.astype(np.int64)
    if delta:
        v = np.cumsum(v, dtype=np.int64)
    return v, offset

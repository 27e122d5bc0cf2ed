"""Frame-of-reference + bit-packing codec (evaluation-grade K9 analogue).

The reference evaluates FastPFOR/BinaryPacking/OptPFD against varint and
RLE on real integer columns (`IntegerCompressionEvaluation.java:68-105`,
SURVEY §2.8 K9/K10) and only emits FastPFOR into tiles behind an optional
flag. This module provides the same *evaluation* capability from scratch:

- 128-value blocks (the FastPFOR lane width),
- per-block frame of reference (subtract min) and bit width
  (ceil(log2(max-min+1))),
- little-endian LSB-first bit packing, fully vectorized via uint8
  bit-matrix reshaping (np.packbits/unpackbits),
- optional zigzag for signed streams and delta for sorted streams.

Wire format (self-describing per block): varint(min) ‖ u8 width ‖
packed bytes. Not part of the gen-A tile format — used by
``scripts/codec_eval.py`` for the per-stream codec sweep, exactly the
role K10 plays in the reference.
"""

from __future__ import annotations

import numpy as np

from cov_tiles_spark.covt.varint import (
    decode_varint,
    encode_varints,
    zigzag_decode,
    zigzag_encode,
)

BLOCK = 128


def _pack_block(vals: np.ndarray) -> bytes:
    """FOR + bitpack one block of uint64 values."""
    lo = int(vals.min())
    rel = (vals - np.uint64(lo)).astype(np.uint64)
    span = int(rel.max())
    width = max(span.bit_length(), 1)
    # bit matrix: (n, width) LSB-first, then packbits little-endian
    bits = (
        (rel[:, None] >> np.arange(width, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.uint8)
    packed = np.packbits(bits.ravel(), bitorder="little")
    return (
        encode_varints(np.array([lo], dtype=np.uint64))
        + bytes([width])
        + packed.tobytes()
    )


def _unpack_block(buf: np.ndarray, offset: int, n: int) -> tuple[np.ndarray, int]:
    lo, offset = decode_varint(buf, offset)
    width = int(buf[offset])
    offset += 1
    nbytes = (n * width + 7) // 8
    bits = np.unpackbits(
        buf[offset : offset + nbytes], bitorder="little", count=n * width
    ).reshape(n, width)
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(width):
        vals |= bits[:, j].astype(np.uint64) << np.uint64(j)
    return vals + np.uint64(lo), offset + nbytes


def encode_bitpack(values: np.ndarray, signed: bool = False, delta: bool = False) -> bytes:
    """Encode int array as FOR-bitpacked 128-value blocks."""
    v = np.asarray(values).astype(np.int64, copy=False)
    if delta:
        v = np.diff(v, prepend=np.int64(0))
        signed = True
    u = zigzag_encode(v) if signed else v.astype(np.uint64)
    parts = []
    for i in range(0, len(u), BLOCK):
        parts.append(_pack_block(u[i : i + BLOCK]))
    return b"".join(parts)


def decode_bitpack(
    buf: np.ndarray, n: int, signed: bool = False, delta: bool = False
) -> np.ndarray:
    if delta:
        signed = True
    out = np.empty(n, dtype=np.uint64)
    offset = 0
    for i in range(0, n, BLOCK):
        k = min(BLOCK, n - i)
        out[i : i + k], offset = _unpack_block(buf, offset, k)
    v = zigzag_decode(out) if signed else out.astype(np.int64)
    if delta:
        v = np.cumsum(v, dtype=np.int64)
    return v

"""Vectorized protobuf-style LEB128 varints + zigzag (kernels K1/K2).

Wire semantics match the reference decoder
(`/root/reference/parser/js/src/decoder/decodingUtils.ts:118-166` varint,
`:225-228` zigzag) and encoder (`EncodingUtils.java:39-71`): little-endian
7-bit groups, continuation bit 0x80, max 10 bytes; zigzag
``(v<<1)^(v>>63)`` / ``(u>>1)^-(u&1)``.

All functions are numpy-vectorized — no per-value Python in the hot path.
"""

from __future__ import annotations

import numpy as np

_SHIFTS = np.arange(0, 70, 7, dtype=np.uint64)  # 10 seven-bit groups
_MASK7 = np.uint64(0x7F)


def encode_varints(values: np.ndarray) -> bytes:
    """Encode an array of unsigned 64-bit values as concatenated varints."""
    v = np.asarray(values).astype(np.uint64, copy=False)
    n = v.shape[0]
    if n == 0:
        return b""
    if n <= 16:  # tiny-stream fast path: vectorized setup dominates below this
        out = bytearray()
        for x in v.tolist():
            while True:
                b = x & 0x7F
                x >>= 7
                if x:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)
    groups = (v[:, None] >> _SHIFTS[None, :]) & _MASK7  # (n, 10)
    nonzero = groups != 0
    any_nz = nonzero.any(axis=1)
    # index of highest nonzero group + 1 == byte count; zero encodes as 1 byte
    nbytes = np.where(any_nz, 10 - np.argmax(nonzero[:, ::-1], axis=1), 1)
    idx = np.arange(10, dtype=np.int64)
    cont = idx[None, :] < (nbytes - 1)[:, None]
    out = (groups.astype(np.uint8)) | (cont.astype(np.uint8) << 7)
    keep = idx[None, :] < nbytes[:, None]
    return out[keep].tobytes()  # row-major ravel keeps byte order per value


def encode_varints_with_ends(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Like :func:`encode_varints` but also returns the cumulative end
    offset of each value's encoding (int64), so callers that interleave
    varint payloads with other bytes (e.g. RLE block headers) can encode
    a whole stream's varints in ONE vectorized pass and slice per block.
    """
    v = np.asarray(values).astype(np.uint64, copy=False)
    n = v.shape[0]
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    if n <= 16:  # tiny-stream fast path: vectorized setup dominates below this
        out = bytearray()
        ends = np.empty(n, dtype=np.int64)
        for i, x in enumerate(v.tolist()):
            while True:
                b = x & 0x7F
                x >>= 7
                if x:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
            ends[i] = len(out)
        return bytes(out), ends
    groups = (v[:, None] >> _SHIFTS[None, :]) & _MASK7  # (n, 10)
    nonzero = groups != 0
    any_nz = nonzero.any(axis=1)
    nbytes = np.where(any_nz, 10 - np.argmax(nonzero[:, ::-1], axis=1), 1)
    idx = np.arange(10, dtype=np.int64)
    cont = idx[None, :] < (nbytes - 1)[:, None]
    out = (groups.astype(np.uint8)) | (cont.astype(np.uint8) << 7)
    keep = idx[None, :] < nbytes[:, None]
    return out[keep].tobytes(), np.cumsum(nbytes)


def decode_varints(
    buf: np.ndarray, n: int, offset: int = 0
) -> tuple[np.ndarray, int]:
    """Decode ``n`` varints from ``buf`` (uint8 array) starting at ``offset``.

    Returns (values uint64 array, new offset). Scans only until the n-th
    terminator, so callers should pass a tight slice for long buffers.
    """
    if n == 0:
        return np.empty(0, dtype=np.uint64), offset
    # incremental terminator scan: start near the expected byte extent and
    # grow — scanning the whole remaining buffer per call is O(blocks x
    # tile size) when RLE decoders call this per literal block
    total = buf.shape[0] - offset
    chunk = min(total, max(64, 3 * n + 16))
    while True:
        seg = buf[offset : offset + chunk]
        term = np.flatnonzero(seg < 0x80)
        if term.shape[0] >= n:
            break
        if chunk >= total:
            raise ValueError(f"buffer exhausted: wanted {n} varints")
        chunk = min(total, chunk * 4)
    ends = term[:n]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals = np.zeros(n, dtype=np.uint64)
    max_len = int((ends - starts).max()) + 1
    for j in range(max_len):  # <= 10 iterations, each fully vectorized
        pos = starts + j
        m = pos <= ends
        vals[m] |= (seg[pos[m]].astype(np.uint64) & _MASK7) << np.uint64(7 * j)
    return vals, offset + int(ends[-1]) + 1


def decode_varint(buf: np.ndarray, offset: int = 0) -> tuple[int, int]:
    """Decode a single varint; returns (value, new offset)."""
    value = 0
    shift = 0
    while True:
        b = int(buf[offset])
        offset += 1
        value |= (b & 0x7F) << shift
        if b < 0x80:
            return value, offset
        shift += 7
        if shift > 70:
            raise ValueError("varint longer than 10 bytes")


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Signed int64 -> unsigned zigzag uint64."""
    v = np.asarray(values).astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """Unsigned zigzag uint64 -> signed int64."""
    u = np.asarray(values).astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(
        (u & np.uint64(1)).astype(np.int64)
    )


def encode_zigzag_varints(values: np.ndarray) -> bytes:
    """Signed values -> zigzag -> varints."""
    return encode_varints(zigzag_encode(values))


def decode_zigzag_varints(
    buf: np.ndarray, n: int, offset: int = 0
) -> tuple[np.ndarray, int]:
    vals, offset = decode_varints(buf, n, offset)
    return zigzag_decode(vals), offset


def encode_delta_zigzag_varints(values: np.ndarray) -> bytes:
    """Delta (prev init 0, kernel K3) -> zigzag -> varint.

    Matches `EncodingUtils.java:73-93` encode /
    `decodingUtils.ts:168-185` decode (continuous chain).
    """
    v = np.asarray(values).astype(np.int64, copy=False)
    deltas = np.diff(v, prepend=np.int64(0))
    return encode_zigzag_varints(deltas)


def decode_delta_zigzag_varints(
    buf: np.ndarray, n: int, offset: int = 0
) -> tuple[np.ndarray, int]:
    deltas, offset = decode_zigzag_varints(buf, n, offset)
    return np.cumsum(deltas, dtype=np.int64), offset

"""Evaluation-only integer codecs: ORC RLE v2 and Parquet
DELTA_BINARY_PACKED analogues (kernel K10).

The reference's codec sweep (`IntegerCompressionEvaluation.java:68-120`)
benchmarks ORC RunLengthIntegerWriterV2 and Parquet's
DeltaBinaryPackingValuesWriterForInteger (`EncodingUtils.java:275-303`)
alongside varint/RLE/FastPFOR. These are bench-only — never emitted into
tiles — so this module mirrors that role: faithful-in-spirit
implementations of both formats' core modes, each round-trip verified by
`scripts/codec_eval.py` and `tests/test_codec_kernels.py`.

- ``orc_rle_v2``: all four sub-encodings of the ORC v2 spec —
  SHORT_REPEAT / DIRECT / DELTA / PATCHED_BASE (the outlier mode: bulk
  values bit-packed at the 90th-percentile width over a common base,
  outliers stitched back from a patch list; chosen per chunk only when
  it beats DIRECT, mirroring ORC's writer policy). Runs are chunked at
  512 values like ORC.
- ``parquet_delta``: DELTA_BINARY_PACKED layout — block 128, 4 miniblocks
  of 32, per-block min-delta frame of reference, per-miniblock bit
  widths, LSB-first packing.
"""

from __future__ import annotations

import numpy as np

from cov_tiles_spark.covt.varint import (
    decode_varint,
    encode_varints,
    zigzag_decode,
    zigzag_encode,
)

_MAX_RUN = 512


def _pack_bits(vals: np.ndarray, width: int) -> bytes:
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
    return (
        (bits.astype(np.uint64) << np.arange(width, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        ),
        offset + nbytes,
    )


def _u64(v: np.ndarray, signed: bool) -> np.ndarray:
    return zigzag_encode(v) if signed else v.astype(np.uint64)


def _width(u: np.ndarray) -> int:
    m = int(u.max()) if len(u) else 0
    return max(m.bit_length(), 1)


# ------------------------------------------------------------- ORC RLE v2

# chunk headers (1 byte): tag << 6 | payload
_SHORT_REPEAT, _DIRECT, _PATCHED_BASE, _DELTA = 0, 1, 2, 3


def _try_patched_base(u: np.ndarray, budget: int) -> bytes | None:
    """PATCHED_BASE chunk if it beats the DIRECT encoding of the same
    values (``budget`` bytes), else None.

    Layout: header, varints (n, base, width, n_patches), low bits of
    (value - base) packed at the 90th-percentile width, then the patch
    list (ascending indices, then the shifted-out high bits) — ORC's
    base + packed-bulk + patch-exception shape
    (`IntegerCompressionEvaluation.java:68-105` sweeps the real writer;
    the container here is this module's own, like the other chunks)."""
    n = len(u)
    if n < 8:
        return None
    base = np.uint64(u.min())
    rel = u - base
    w_full = _width(rel)
    w90 = _width(np.sort(rel)[: -max(1, n // 10)])
    if w90 >= w_full:
        return None
    mask = rel >= np.uint64(1 << w90)
    n_out = int(mask.sum())
    if n_out == 0 or n_out > n // 10:
        return None
    idx = np.flatnonzero(mask).astype(np.uint64)
    high = rel[mask] >> np.uint64(w90)
    body = b"".join(
        [
            bytes([_PATCHED_BASE << 6]),
            encode_varints(np.array([n, int(base), w90, n_out], np.uint64)),
            _pack_bits(rel & np.uint64((1 << w90) - 1), w90),
            encode_varints(idx),
            encode_varints(high),
        ]
    )
    return body if len(body) < budget else None


def orc_rle_v2_encode(values: np.ndarray, signed: bool = False) -> bytes:
    """SHORT_REPEAT / DIRECT / PATCHED_BASE / DELTA chunks, greedy like
    ORC's writer: repeats >= 3 -> SHORT_REPEAT (or DELTA(0) when long),
    monotone constant-difference spans -> DELTA, else DIRECT — swapped
    for PATCHED_BASE when <=10% outliers inflate the direct width and
    the patched form is smaller."""
    v = np.asarray(values, dtype=np.int64)
    parts: list[bytes] = []
    i, n = 0, len(v)
    while i < n:
        end = min(i + _MAX_RUN, n)
        chunk = v[i:end]
        # repeat prefix
        rep = 1
        while rep < len(chunk) and chunk[rep] == chunk[0]:
            rep += 1
        if rep >= 3:
            take = rep
            parts.append(bytes([(_SHORT_REPEAT << 6) | min(take - 3, 63)]))
            if take - 3 > 63:
                take = 66
                parts[-1] = bytes([(_SHORT_REPEAT << 6) | 63])
            parts.append(encode_varints(_u64(chunk[:1], signed)))
            i += take
            continue
        # constant-delta prefix (DELTA)
        if len(chunk) >= 3:
            d = np.diff(chunk)
            k = 1
            while k < len(d) and d[k] == d[0] and d[0] != 0:
                k += 1
            if d[0] != 0 and k + 1 >= 3:
                take = k + 1
                parts.append(bytes([(_DELTA << 6) | 0]))
                parts.append(encode_varints(np.array([take], np.uint64)))
                parts.append(encode_varints(_u64(chunk[:1], signed)))
                parts.append(encode_varints(zigzag_encode(np.array([d[0]], np.int64))))
                i += take
                continue
        # DIRECT: literal span until the next run of >= 4 repeats
        j = 1
        while j < len(chunk):
            if j + 3 < len(chunk) and (chunk[j] == chunk[j + 1] == chunk[j + 2] == chunk[j + 3]):
                break
            j += 1
        lits = chunk[:j]
        u = _u64(lits, signed)
        w = _width(u)
        direct = b"".join(
            [
                bytes([(_DIRECT << 6) | 0]),
                encode_varints(np.array([len(lits), w], np.uint64)),
                _pack_bits(u, w),
            ]
        )
        parts.append(_try_patched_base(u, len(direct)) or direct)
        i += j
    return b"".join(parts)


def orc_rle_v2_decode(
    buf: np.ndarray, n: int, offset: int = 0, signed: bool = False
) -> tuple[np.ndarray, int]:
    out = np.empty(n, dtype=np.int64)
    count = 0
    while count < n:
        header = int(buf[offset])
        offset += 1
        tag = header >> 6
        if tag == _SHORT_REPEAT:
            run = (header & 63) + 3
            u, offset = _decode_one(buf, offset)
            val = int(zigzag_decode(np.array([u], np.uint64))[0]) if signed else int(u)
            out[count : count + run] = val
            count += run
        elif tag == _DELTA:
            run, offset = _decode_one(buf, offset)
            u, offset = _decode_one(buf, offset)
            first = int(zigzag_decode(np.array([u], np.uint64))[0]) if signed else int(u)
            dz, offset = _decode_one(buf, offset)
            d = int(zigzag_decode(np.array([dz], np.uint64))[0])
            out[count : count + run] = first + np.arange(run, dtype=np.int64) * d
            count += run
        elif tag == _DIRECT:
            ln, offset = _decode_one(buf, offset)
            w, offset = _decode_one(buf, offset)
            u, offset = _unpack_bits(buf, offset, ln, w)
            out[count : count + ln] = (
                zigzag_decode(u) if signed else u.astype(np.int64)
            )
            count += ln
        elif tag == _PATCHED_BASE:
            ln, offset = _decode_one(buf, offset)
            base, offset = _decode_one(buf, offset)
            w, offset = _decode_one(buf, offset)
            n_out, offset = _decode_one(buf, offset)
            u, offset = _unpack_bits(buf, offset, ln, w)
            # patch lists are tiny (<= ln/10): scalar varint walk, per
            # the repo's numpy-per-item threshold note (CLAUDE.md)
            idx = np.empty(n_out, dtype=np.int64)
            for t in range(n_out):
                idx[t], offset = _decode_one(buf, offset)
            for t in range(n_out):
                hi, offset = _decode_one(buf, offset)
                u[idx[t]] |= np.uint64(hi) << np.uint64(w)
            u = u + np.uint64(base)
            out[count : count + ln] = (
                zigzag_decode(u) if signed else u.astype(np.int64)
            )
            count += ln
        else:
            raise ValueError(f"unsupported RLEv2 chunk tag {tag}")
    return out, offset


def _decode_one(buf: np.ndarray, offset: int) -> tuple[int, int]:
    return decode_varint(buf, offset)


# --------------------------------------------- Parquet DELTA_BINARY_PACKED

_BLOCK = 128
_MINIBLOCKS = 4
_MINI = _BLOCK // _MINIBLOCKS


def parquet_delta_encode(values: np.ndarray) -> bytes:
    """DELTA_BINARY_PACKED: header (block size, miniblock count, total
    count, zigzag first value), then per block: zigzag-varint min delta,
    miniblock bit-width bytes, LSB-first packed (delta - min) lanes."""
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    parts = [
        encode_varints(np.array([_BLOCK, _MINIBLOCKS, n], np.uint64)),
        encode_varints(zigzag_encode(v[:1])) if n else b"",
    ]
    deltas = np.diff(v)
    for s in range(0, len(deltas), _BLOCK):
        block = deltas[s : s + _BLOCK]
        if len(block) < _BLOCK:  # pad with min delta (spec: padding ignored)
            block = np.concatenate([block, np.full(_BLOCK - len(block), block.min() if len(block) else 0, np.int64)])
        mn = int(block.min())
        parts.append(encode_varints(zigzag_encode(np.array([mn], np.int64))))
        rel = (block - mn).astype(np.uint64)
        widths = []
        packed = []
        for m in range(_MINIBLOCKS):
            mini = rel[m * _MINI : (m + 1) * _MINI]
            w = _width(mini) if mini.max() > 0 else 0
            widths.append(w)
            packed.append(_pack_bits(mini, w))
        parts.append(bytes(widths))
        parts.extend(packed)
    return b"".join(parts)


def parquet_delta_decode(buf: np.ndarray, offset: int = 0) -> tuple[np.ndarray, int]:
    block_size, offset = decode_varint(buf, offset)
    miniblocks, offset = decode_varint(buf, offset)
    n, offset = decode_varint(buf, offset)
    if n == 0:
        return np.empty(0, dtype=np.int64), offset
    fz, offset = decode_varint(buf, offset)
    first = int(zigzag_decode(np.array([fz], np.uint64))[0])
    mini = block_size // miniblocks
    deltas = np.empty(((n - 2) // block_size + 1) * block_size if n > 1 else 0, np.int64)
    got = 0
    need = n - 1
    while got < need:
        mz, offset = decode_varint(buf, offset)
        mn = int(zigzag_decode(np.array([mz], np.uint64))[0])
        widths = buf[offset : offset + miniblocks].tolist()
        offset += miniblocks
        for w in widths:
            u, offset = _unpack_bits(buf, offset, mini, int(w))
            deltas[got : got + mini] = u.astype(np.int64) + mn
            got += mini
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    np.cumsum(deltas[: n - 1], out=out[1:]) if n > 1 else None
    out[1:] += first
    return out, offset


class _BitWriter:
    __slots__ = ("acc", "nbits", "out")

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


class _BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        v = 0
        p = self.pos
        for _ in range(width):
            v = (v << 1) | ((self.buf[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v


def gorilla_xor_encode(values: np.ndarray) -> bytes:
    """Gorilla-style XOR compression for float32 streams (eval-only —
    the reference leaves float compression as an acknowledged TODO,
    `CovtConverter.java:1120-1132` 'XOR-based encoding', and ships
    plain IEEE754; this measures what that TODO would buy).

    Scheme (Gorilla paper §4.1.2, adapted to 32-bit words): first value
    raw; then per value XOR with the previous —
    - 0 bit if the XOR is zero;
    - '10' + meaningful bits if they fit the previous leading/length
      window;
    - '11' + 5-bit leading-zero count + 5-bit (length-1) + the bits.
    """
    f = np.ascontiguousarray(np.asarray(values, dtype=np.float32))
    u = f.view(np.uint32)
    n = len(u)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.finish()
    w.write(int(u[0]), 32)
    prev = int(u[0])
    lead, length = 0xFF, 0  # invalid window forces '11' on first nonzero
    for i in range(1, n):
        cur = int(u[i])
        x = prev ^ cur
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        lz = 32 - x.bit_length()
        tz = (x & -x).bit_length() - 1
        if lead != 0xFF and lz >= lead and tz >= 32 - lead - length:
            w.write(0b10, 2)
            w.write(x >> (32 - lead - length), length)
        else:
            lead = min(lz, 31)
            length = 32 - lead - tz
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(length - 1, 5)
            w.write(x >> tz, length)
    return w.finish()


def gorilla_xor_decode(buf: bytes) -> np.ndarray:
    r = _BitReader(bytes(buf))
    n = r.read(32)
    out = np.empty(n, dtype=np.uint32)
    if n == 0:
        return out.view(np.float32)
    prev = r.read(32)
    out[0] = prev
    lead = length = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10': reuse window
            bits = r.read(length)
            x = bits << (32 - lead - length)
        else:  # '11': new window
            lead = r.read(5)
            length = r.read(5) + 1
            bits = r.read(length)
            x = bits << (32 - lead - length)
        prev ^= x
        out[i] = prev
    return out.view(np.float32)

"""Boolean bitset packing (kernel K6).

Bit order matches the reference's Java ``BitSet``/JS ``isBitSet``
(`/root/reference/parser/js/src/decoder/decodingUtils.ts:404-409`;
`EncodingUtils.java:213-230`): bit ``i`` lives in byte ``i // 8`` at
little-endian bit position ``i % 8``.
"""

from __future__ import annotations

import numpy as np


def pack_bitset(bits: np.ndarray, n_bits: int | None = None) -> np.ndarray:
    """Pack a boolean array into ceil(n/8) little-endian-bit bytes."""
    b = np.asarray(bits).astype(bool, copy=False)
    if n_bits is not None and b.shape[0] < n_bits:
        b = np.pad(b, (0, n_bits - b.shape[0]))
    return np.packbits(b, bitorder="little")


def unpack_bitset(packed: np.ndarray, n_bits: int) -> np.ndarray:
    """Unpack bytes into ``n_bits`` booleans (little-endian bit order)."""
    return np.unpackbits(
        np.asarray(packed, dtype=np.uint8), bitorder="little", count=n_bits
    ).astype(bool)

"""Vectorized bit-packing of unsigned integers (numpy only).

The primitive under FOR/delta/dict/RLE codecs: pack n values of a fixed
bit-width w into ceil(n*w/8) bytes, little-endian bit order. Fully
vectorized — no per-row Python (input_hint requirement).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def bit_width(values: np.ndarray) -> int:
    """Minimum bits needed to represent every value of a uint64 array."""
    if values.size == 0:
        return 0
    m = int(values.max())
    return m.bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 ``values`` at ``width`` bits each (0 <= width <= 64)."""
    n = values.size
    if n == 0 or width == 0:
        return b""
    v = values.astype(_U64, copy=False)
    shifts = np.arange(width, dtype=_U64)
    # (n, width) bit matrix, LSB first per value
    bits = ((v[:, None] >> shifts) & _U64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack(payload: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns a uint64 array of length ``n``."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=_U64)
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8), bitorder="little")
    bits = bits[: n * width].reshape(n, width).astype(_U64)
    shifts = np.arange(width, dtype=_U64)
    return (bits << shifts).sum(axis=1, dtype=_U64)


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag (small magnitudes -> small codes)."""
    v = values.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).astype(_U64)


def zigzag_decode(codes: np.ndarray) -> np.ndarray:
    """uint64 zigzag -> int64."""
    c = codes.astype(_U64, copy=False)
    return ((c >> _U64(1)).astype(np.int64)) ^ -(c & _U64(1)).astype(np.int64)

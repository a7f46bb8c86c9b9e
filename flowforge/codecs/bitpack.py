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
    """Pack uint64 ``values`` at ``width`` bits each (0 <= width <= 64).

    Word-accumulation: every temp is O(n) u64, never O(n*width) — the naive
    (n, width) bit matrix cost ~50x the payload in page-faulted temporaries
    at chunk scale. Byte-aligned widths take a pure astype/view fast path.
    """
    n = values.size
    if n == 0 or width == 0:
        return b""
    v = values.astype(_U64, copy=False)
    if width in (8, 16, 32, 64):
        dt = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}[width]
        return v.astype(dt).tobytes()
    # group-aligned column packing: g = lcm(w,64)/w values fill exactly
    # W = g*w/64 words, so every column j has a CONSTANT word/bit offset —
    # the whole pack is <= 2g column-wise shifts/ORs, no scatter anywhere
    import math

    g = math.lcm(width, 64) // width
    W = g * width // 64
    m = -(-n // g)
    vp = np.zeros(m * g, dtype=_U64)
    vp[:n] = v
    vp = vp.reshape(m, g)
    out = np.zeros((m, W), dtype=_U64)
    for j in range(g):
        bit = j * width
        w0, off = bit >> 6, bit & 63
        out[:, w0] |= vp[:, j] << _U64(off)
        if off + width > 64:
            out[:, w0 + 1] |= vp[:, j] >> _U64(64 - off)
    return out.tobytes()[: (n * width + 7) // 8]


def unpack(payload: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns a uint64 array of length ``n``."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=_U64)
    if width in (8, 16, 32, 64):
        dt = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}[width]
        return np.frombuffer(payload, dtype=dt, count=n).astype(_U64)
    import math

    g = math.lcm(width, 64) // width
    W = g * width // 64
    m = -(-n // g)
    buf = payload + b"\x00" * (m * W * 8 - len(payload))
    words = np.frombuffer(buf, dtype="<u8").reshape(m, W)
    mask = _U64((1 << width) - 1)
    vout = np.empty((m, g), dtype=_U64)
    for j in range(g):
        bit = j * width
        w0, off = bit >> 6, bit & 63
        lo = words[:, w0] >> _U64(off)
        if off + width > 64:
            lo = lo | (words[:, w0 + 1] << _U64(64 - off))
        vout[:, j] = lo & mask
    return vout.reshape(-1)[:n]


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag (small magnitudes -> small codes)."""
    v = values.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).astype(_U64)


def zigzag_decode(codes: np.ndarray) -> np.ndarray:
    """uint64 zigzag -> int64."""
    c = codes.astype(_U64, copy=False)
    return ((c >> _U64(1)).astype(np.int64)) ^ -(c & _U64(1)).astype(np.int64)

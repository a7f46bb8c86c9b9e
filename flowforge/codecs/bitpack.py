"""Vectorized bit-packing of unsigned integers (numpy only).

The primitive under FOR/delta/dict/RLE codecs: pack n values of a fixed
bit-width w into ceil(n*w/8) bytes, little-endian bit order. Fully
vectorized — no per-row Python (input_hint requirement).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def bit_width(values: np.ndarray) -> int:
    """Minimum bits needed to represent every value of a non-negative
    integer array (any integer dtype)."""
    if values.size == 0:
        return 0
    m = int(values.max())
    return m.bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integer ``values`` (any int dtype) at ``width``
    bits each (0 <= width <= 64).

    Group-aligned column packing: g = lcm(w,64)/w values fill exactly
    W = g*w/64 words, so every column j has a CONSTANT word/bit offset —
    the whole pack is <= 2g column-wise shifts/ORs, no scatter anywhere.
    The bulk (first n - n%g values) is a zero-copy reshape of the input;
    per-column astype temps are m-sized (cache-resident), never blob-sized
    — large fresh temporaries page-fault brutally under many concurrent
    workers on this class of box. Byte-aligned widths take a pure astype
    fast path.
    """
    n = values.size
    if n == 0 or width == 0:
        return b""
    if width in (8, 16, 32, 64):
        dt = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}[width]
        return np.ascontiguousarray(values).astype(dt, copy=False).tobytes()
    import math

    g = math.lcm(width, 64) // width
    W = g * width // 64
    k = (n // g) * g
    bulk_words = (k * width) // 64
    tail_words = W if k < n else 0
    out = np.zeros(bulk_words + tail_words, dtype=_U64)
    if k:
        bulk = np.ascontiguousarray(values[:k]).reshape(-1, g)
        ob = out[:bulk_words].reshape(-1, W)
        for j in range(g):
            col = bulk[:, j].astype(_U64)
            bit = j * width
            w0, off = bit >> 6, bit & 63
            ob[:, w0] |= col << _U64(off)
            if off + width > 64:
                ob[:, w0 + 1] |= col >> _U64(64 - off)
    if k < n:
        tw = out[bulk_words:]
        for j in range(n - k):
            val = int(values[k + j])
            bit = j * width
            w0, off = bit >> 6, bit & 63
            tw[w0] |= _U64((val << off) & 0xFFFFFFFFFFFFFFFF)
            if off + width > 64:
                tw[w0 + 1] |= _U64(val >> (64 - off))
    return out.tobytes()[: (n * width + 7) // 8]


def unpack_narrow(payload: bytes, width: int, n: int) -> np.ndarray:
    """Like :func:`unpack` but byte-aligned widths come back as a ZERO-COPY
    narrow view (u1/u2/u4/u8) instead of widening to uint64. The hot decode
    consumer is dictionary code streams (``dictionary.take(codes)``) —
    Arrow takes any integer index type, so widening there was two full
    stream-sized copies (frombuffer->u64->intp) for nothing. Non-aligned
    widths fall through to the u64 bulk unpacker."""
    if n and width in (8, 16, 32, 64):
        dt = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}[width]
        return np.frombuffer(payload, dtype=dt, count=n)
    return unpack(payload, width, n)


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
    k = (n // g) * g
    bulk_words = (k * width) // 64
    mask = _U64((1 << width) - 1)
    vout = np.empty(n, dtype=_U64)
    if k:
        # bulk region is word-exact: zero-copy frombuffer, no payload pad
        words = np.frombuffer(payload, dtype="<u8", count=bulk_words).reshape(-1, W)
        vb = vout[:k].reshape(-1, g)
        for j in range(g):
            bit = j * width
            w0, off = bit >> 6, bit & 63
            lo = words[:, w0] >> _U64(off)
            if off + width > 64:
                lo = lo | (words[:, w0 + 1] << _U64(64 - off))
            vb[:, j] = lo & mask
    if k < n:
        tail = payload[bulk_words * 8:]
        tail = tail + b"\x00" * (W * 8 - len(tail))
        tw = np.frombuffer(tail, dtype="<u8")
        for j in range(n - k):
            bit = j * width
            w0, off = bit >> 6, bit & 63
            lo = int(tw[w0]) >> off
            if off + width > 64:
                lo |= int(tw[w0 + 1]) << (64 - off)
            vout[k + j] = _U64(lo & int(mask))
    return vout


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag (small magnitudes -> small codes)."""
    v = values.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).astype(_U64)


def zigzag_decode(codes: np.ndarray) -> np.ndarray:
    """uint64 zigzag -> int64."""
    c = codes.astype(_U64, copy=False)
    return ((c >> _U64(1)).astype(np.int64)) ^ -(c & _U64(1)).astype(np.int64)

"""Integer (int64) codecs: plain, FOR+bit-pack, delta+zigzag, RLE, dictionary.

All codecs share the interface::

    encode(values: np.ndarray[int64]) -> (payload: bytes, meta: dict)
    decode(payload: bytes, meta: dict, n: int) -> np.ndarray[int64]

``values`` is null-free (validity handled by framing). Timestamps enter as
int64 unix microseconds (SURVEY §1.2: the reference promotes float-sec ->
int64-ms at core/normalize.go:115-119; we stay on int64 epoch units and never
round-trip through Python datetime).

Everything is numpy-vectorized; no per-row Python.
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .framing import pack_sections, unpack_sections

_I64 = np.int64
_U64 = np.uint64


def _as_i64(values: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(values, dtype=_I64)


# --- plain ---------------------------------------------------------------

def plain_encode(values: np.ndarray):
    return _as_i64(values).tobytes(), {}


def plain_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    return np.frombuffer(payload, dtype=_I64, count=n).copy()


# --- FOR + bit-pack -------------------------------------------------------

def forbp_encode(values: np.ndarray):
    """Frame-of-reference: deltas vs min, GCD-rescaled, bit-packed.

    Deltas computed in uint64 modular arithmetic so a full-range int64
    column (max-min > 2^63) still round-trips. The GCD rescale divides all
    deltas by their common divisor (stored in meta) — timestamps with
    coarse granularity (e.g. whole seconds carried as microseconds: GCD
    10^6) drop ~20 bits per value for one vectorized gcd pass.
    """
    v = _as_i64(values)
    if v.size == 0:
        return b"", {"ref": 0, "width": 0}
    ref = int(v.min())
    deltas = (v.view(_U64) - _U64(ref & 0xFFFFFFFFFFFFFFFF))  # mod 2^64
    g = int(np.gcd.reduce(deltas)) or 1
    if g > 1:
        deltas = deltas // _U64(g)
    width = bitpack.bit_width(deltas)
    meta = {"ref": ref, "width": width}
    if g > 1:
        meta["gcd"] = g
    return bitpack.pack(deltas, width), meta


def forbp_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    deltas = bitpack.unpack(payload, int(meta["width"]), n)
    g = int(meta.get("gcd", 1))
    if g > 1:
        deltas = deltas * _U64(g)  # mod 2^64, exact inverse of the rescale
    ref = _U64(int(meta["ref"]) & 0xFFFFFFFFFFFFFFFF)
    return (deltas + ref).view(_I64).copy()


# --- delta + zigzag + bit-pack (near-sorted streams, e.g. warc_ts) --------

def deltazz_encode(values: np.ndarray):
    v = _as_i64(values)
    if v.size == 0:
        return b"", {"first": 0, "width": 0}
    first = int(v[0])
    # modular diff avoids overflow on adversarial inputs
    d = (v.view(_U64)[1:] - v.view(_U64)[:-1]).view(_I64)
    # GCD rescale on signed deltas: magnitudes in uint64 (two's-complement
    # negate, exact for int64.min), divide magnitudes, re-apply the sign
    u = d.view(_U64)
    mag = np.where(d >= 0, u, (~u) + _U64(1))
    g = int(np.gcd.reduce(mag)) if mag.size else 0
    g = g or 1
    if g > 1:
        q_mag = mag // _U64(g)
        u = np.where(d >= 0, q_mag, (~q_mag) + _U64(1))
        d = u.view(_I64)
    zz = bitpack.zigzag_encode(d)
    width = bitpack.bit_width(zz)
    meta = {"first": first, "width": width}
    if g > 1:
        meta["gcd"] = g
    return bitpack.pack(zz, width), meta


def deltazz_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=_I64)
    zz = bitpack.unpack(payload, int(meta["width"]), n - 1)
    d = bitpack.zigzag_decode(zz)
    g = int(meta.get("gcd", 1))
    if g > 1:
        d = (d.view(_U64) * _U64(g)).view(_I64)  # mod 2^64, exact inverse
    out = np.empty(n, dtype=_U64)
    out[0] = _U64(int(meta["first"]) & 0xFFFFFFFFFFFFFFFF)
    np.cumsum(d.view(_U64), out=out[1:])
    out[1:] += out[0]
    return out.view(_I64).copy()


# --- run-length -----------------------------------------------------------

def _runs(v: np.ndarray):
    """Vectorized run detection: (run_values, run_lengths)."""
    if v.size == 0:
        return v[:0], np.zeros(0, dtype=_I64)
    change = np.empty(v.size, dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, v.size)).astype(_I64)
    return v[starts], lengths


def rle_encode(values: np.ndarray):
    v = _as_i64(values)
    run_vals, run_lens = _runs(v)
    val_payload, val_meta = forbp_encode(run_vals)
    len_u = run_lens.astype(_U64) - _U64(1)  # lengths >= 1
    len_width = bitpack.bit_width(len_u)
    sections = [val_payload, bitpack.pack(len_u, len_width)]
    meta = {"n_runs": int(run_vals.size), "len_width": len_width, "vals": val_meta}
    return pack_sections(sections), meta


def rle_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    val_payload, len_payload = unpack_sections(payload)
    n_runs = int(meta["n_runs"])
    run_vals = forbp_decode(val_payload, meta["vals"], n_runs)
    run_lens = bitpack.unpack(len_payload, int(meta["len_width"]), n_runs).astype(_I64) + 1
    return np.repeat(run_vals, run_lens)


# --- dictionary -----------------------------------------------------------

def dict_encode(values: np.ndarray):
    """Sorted-unique dictionary + bit-packed codes (deterministic order)."""
    v = _as_i64(values)
    uniq, codes = np.unique(v, return_inverse=True)
    dict_payload, dict_meta = forbp_encode(uniq)
    width = bitpack.bit_width(codes)
    sections = [dict_payload, bitpack.pack(codes, width)]
    meta = {"ndv": int(uniq.size), "width": width, "dict": dict_meta}
    return pack_sections(sections), meta


def dict_decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    dict_payload, code_payload = unpack_sections(payload)
    uniq = forbp_decode(dict_payload, meta["dict"], int(meta["ndv"]))
    # numpy fancy-indexing takes narrow index dtypes directly; widening the
    # code stream to intp was a full extra copy per chunk
    codes = bitpack.unpack_narrow(code_payload, int(meta["width"]), n)
    return uniq[codes]


INT_CODECS = {
    "plain": (plain_encode, plain_decode),
    "forbp": (forbp_encode, forbp_decode),
    "deltazz": (deltazz_encode, deltazz_decode),
    "rle": (rle_encode, rle_decode),
    "dict": (dict_encode, dict_decode),
}

"""Binary framing for encoded chunks.

A chunk payload is a flat list of byte *sections* with a tiny length-prefixed
header, so every codec can store its data (dictionaries, packed codes, blobs)
inside one self-contained ``binary`` cell of the chunk table. Null handling
lives here too: codecs see null-free values; the validity bitmap is a framing
section.

Layout of ``pack_sections([s0, s1, ...])``::

    u32 n_sections | u64 len(s0) ... u64 len(s_{n-1}) | s0 | s1 | ...

Reference parity note: the reference buffers row structs and bulk-writes
Parquet (core/parquet.go:254-270); here the unit of storage is instead a
per-column encoded chunk, fully self-describing via (codec, meta, payload).
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<I")
_LEN = struct.Struct("<Q")


def pack_sections(sections: list[bytes]) -> bytes:
    parts = [_HDR.pack(len(sections))]
    parts.extend(_LEN.pack(len(s)) for s in sections)
    parts.extend(sections)
    return b"".join(parts)


def unpack_sections(payload: bytes) -> list[bytes]:
    (n,) = _HDR.unpack_from(payload, 0)
    off = _HDR.size
    lens = []
    for _ in range(n):
        (ln,) = _LEN.unpack_from(payload, off)
        lens.append(ln)
        off += _LEN.size
    out = []
    for ln in lens:
        out.append(payload[off : off + ln])
        off += ln
    return out


def pack_validity(mask: np.ndarray) -> bytes:
    """Pack a boolean validity mask (True = valid) into a bitmap."""
    return np.packbits(mask.astype(np.uint8), bitorder="little").tobytes()


def unpack_validity(payload: bytes, n: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8), bitorder="little")
    return bits[:n].astype(bool)

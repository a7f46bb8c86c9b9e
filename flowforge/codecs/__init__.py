"""Codec kernels: pure numpy/pyarrow, vectorized, deterministic.

Layers:
- :mod:`bitpack`   — fixed-width bit packing + zigzag (the shared primitive)
- :mod:`framing`   — section container + validity bitmaps
- :mod:`intcodecs` — int64 domain: plain / FOR+BP / delta+zigzag / RLE / dict
- :mod:`bytescodecs` — bytes domain: plain / dict / RLE / FSST-style / hybrid
- :mod:`chunk`     — Arrow array <-> self-describing encoded cell (types+nulls)
"""

from . import bitpack, bytescodecs, chunk, framing, intcodecs  # noqa: F401

__all__ = ["bitpack", "bytescodecs", "chunk", "framing", "intcodecs"]

"""Pure-numpy baseline JPEG codec: round-trip + grammar coverage.

The codec (flowforge/functions/jpegcodec.py) is this repo's library-free
JPEG path for the multimodal family — the reference treats binary media as
opaque bytes (core/parquet.go row assembly); real decode is an extension.
Fidelity bounds here are loose vs the coarse documented quant tables; the
*exact* contract (DC-only mosaics round-trip bit-identically and the
entropy stream is integer-derivable) is what the golden oracle pins in
multimodal_real_features.
"""

import struct

import numpy as np
import pytest

from flowforge.functions.jpegcodec import (
    _DCT,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _mosaic(rng, h, w):
    tiles = rng.integers(0, 256, size=((h + 7) // 8, (w + 7) // 8),
                         dtype=np.uint8)
    return np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w]


def test_generated_tables():
    # DCT basis is orthonormal (so decode's D.T S D inverts encode's D s D.T)
    np.testing.assert_allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)
    # zigzag is a permutation of 0..63 whose first steps match the spec walk
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    assert _ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_gray_mosaic_bit_exact():
    """8x8-constant grayscale blocks survive DCT+quantization exactly
    (DC-only; quantization error provably zero) — including edge-padded
    partial blocks and restart markers."""
    rng = np.random.default_rng(3)
    for h, w, ri in [(37, 51, 0), (37, 51, 3), (8, 8, 0), (64, 64, 1),
                     (9, 17, 2)]:
        px = _mosaic(rng, h, w)
        got = decode_jpeg(encode_jpeg(px, restart_interval=ri))
        assert got.shape == (h, w)
        np.testing.assert_array_equal(got, px)


def test_color_roundtrip_quality():
    """Smooth gradients: PSNR well above 35 dB at 4:4:4 and 4:2:0; decoded
    dims always match the source (crop of the padded MCU grid)."""
    h, w = 40, 56
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256],
                   -1).astype(np.uint8)
    for sub in (False, True):
        got = decode_jpeg(encode_jpeg(img, subsample=sub))
        assert got.shape == img.shape
        mse = ((got.astype(np.float64) - img) ** 2).mean()
        psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-12))
        assert psnr > 35, f"subsample={sub}: psnr {psnr:.1f}"


def test_noise_roundtrip_bounded():
    """Worst-case content (uniform noise) with 4:2:0 + restarts: decode
    must parse every marker path and stay within coarse-quantization error."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(33, 29, 3), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(img, subsample=True, restart_interval=2))
    assert got.shape == img.shape
    # chroma is box-averaged 2x2 before encode, so errors are large but bounded
    assert np.abs(got.astype(np.int64) - img).mean() < 64
    gray = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(gray))
    assert np.abs(got.astype(np.int64) - gray).mean() < 16


def test_decoder_general_grammar():
    """The decoder handles table layouts the encoder never emits: several
    tables packed into ONE DQT/DHT segment (T.81 allows both layouts)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    b = bytearray(encode_jpeg(img))
    # collect and strip all DQT and DHT segments, re-pack each family as one
    segs = {0xDB: [], 0xC4: []}
    pos = 2
    spans = []
    while pos < len(b):
        marker = b[pos + 1]
        if marker == 0xDA:
            break
        (seglen,) = struct.unpack_from(">H", bytes(b), pos + 2)
        if marker in segs:
            segs[marker].append(bytes(b[pos + 4: pos + 2 + seglen]))
            spans.append((pos, pos + 2 + seglen))
        pos += 2 + seglen
    for s, e in reversed(spans):
        del b[s:e]
    packed = b""
    for marker in (0xDB, 0xC4):
        body = b"".join(segs[marker])
        packed += bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body
    combined = bytes(b[:2]) + packed + bytes(b[2:])
    np.testing.assert_array_equal(decode_jpeg(combined),
                                  decode_jpeg(encode_jpeg(img)))


def test_decoder_rejections():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + good)
    # flip SOF0 -> SOF2 (progressive): explicit rejection, not garbage out
    i = good.index(b"\xff\xc0")
    prog = good[:i] + b"\xff\xc2" + good[i + 2:]
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="marker sync"):
        decode_jpeg(good[:2] + b"\x00\x00" + good[2:])


def test_decoder_ff_fill_bytes_and_truncation():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    a truncated entropy stream must surface as ValueError, not IndexError
    (round-4 advice)."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    good = encode_jpeg(img)
    # inject FF pad bytes between SOI and the first segment
    padded = good[:2] + b"\xff\xff\xff" + good[2:]
    np.testing.assert_array_equal(decode_jpeg(padded), decode_jpeg(good))
    # cut the entropy stream short (drop EOI and some tail bytes)
    with pytest.raises(ValueError, match="truncated JPEG"):
        decode_jpeg(good[:-6])


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), dtype=np.float32))
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8, 3, 1), dtype=np.uint8))

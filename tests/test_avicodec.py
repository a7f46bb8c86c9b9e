"""MJPEG-AVI container codec: round-trip + RIFF grammar coverage.

Companion to tests/test_jpegcodec.py — the container layer is pure chunk
framing, so grayscale mosaic frames must survive bit-identically (the
JPEG layer is exact for DC-only blocks) and the decoder must walk real
RIFF trees (JUNK chunks, missing idx1, odd-size padding) rather than
assume the writer's exact layout.
"""

import struct

import numpy as np
import pytest

from flowforge.functions.avicodec import decode_avi_mjpeg, encode_avi_mjpeg


def _mosaic_frames(rng, n, h, w):
    tiles = rng.integers(0, 256, size=(n, (h + 7) // 8, (w + 7) // 8),
                         dtype=np.uint8)
    return np.repeat(np.repeat(tiles, 8, 1), 8, 2)[:, :h, :w]


def test_gray_mosaic_bit_exact_and_fps():
    rng = np.random.default_rng(3)
    for n, h, w, fps, ri in [(4, 25, 33, 10, 0), (2, 8, 8, 25, 0),
                             (7, 9, 9, 1, 3), (3, 40, 16, 30, 2)]:
        frames = _mosaic_frames(rng, n, h, w)
        dec, got_fps = decode_avi_mjpeg(
            encode_avi_mjpeg(frames, fps=fps, restart_interval=ri))
        np.testing.assert_array_equal(dec, frames)
        assert got_fps == fps


def test_color_roundtrip_bounded():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(3, 16, 24, 3), dtype=np.uint8)
    dec, fps = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=25))
    assert dec.shape == frames.shape and fps == 25
    assert np.abs(dec.astype(np.int64) - frames).mean() < 32


def test_decoder_tolerates_junk_and_missing_idx1():
    """Real AVI files carry JUNK alignment chunks and sometimes no idx1;
    the decoder walks what is there instead of assuming our writer."""
    rng = np.random.default_rng(7)
    frames = _mosaic_frames(rng, 3, 17, 17)
    b = encode_avi_mjpeg(frames, fps=10)
    # drop idx1 (it is the trailing chunk) and fix the RIFF size
    i = b.rindex(b"idx1")
    stripped = bytearray(b[:i])
    struct.pack_into("<I", stripped, 4, len(stripped) - 8)
    dec, _ = decode_avi_mjpeg(bytes(stripped))
    np.testing.assert_array_equal(dec, frames)
    # inject a JUNK chunk right after the hdrl LIST
    j = b.index(b"LIST", 12)
    (hdrl_size,) = struct.unpack_from("<I", b, j + 4)
    at = j + 8 + hdrl_size
    junk = b"JUNK" + struct.pack("<I", 6) + b"\x00" * 6
    padded = bytearray(b[:at] + junk + b[at:])
    struct.pack_into("<I", padded, 4, len(padded) - 8)
    dec, _ = decode_avi_mjpeg(bytes(padded))
    np.testing.assert_array_equal(dec, frames)


def test_decoder_rejections():
    rng = np.random.default_rng(9)
    frames = _mosaic_frames(rng, 2, 16, 16)
    b = encode_avi_mjpeg(frames, fps=10)
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi_mjpeg(b"\x00\x00" + b)
    # a non-MJPG vids handler must refuse, not emit garbage
    h264 = b.replace(b"vidsMJPG", b"vidsH264", 1)
    with pytest.raises(ValueError, match="ffmpeg"):
        decode_avi_mjpeg(h264)
    # frame chunks whose JPEGs disagree on shape
    other = encode_avi_mjpeg(_mosaic_frames(rng, 1, 8, 8), fps=10)
    jpeg_small = other[other.index(b"00dc") + 8:]
    jpeg_small = jpeg_small[: jpeg_small.index(b"\xff\xd9") + 2]
    i = b.rindex(b"idx1")
    mixed = bytearray(b[:i])
    # splice the 8x8 frame into movi: append as an extra chunk
    mv = mixed.index(b"movi")
    lst = mixed.rindex(b"LIST", 0, mv)
    (movi_size,) = struct.unpack_from("<I", mixed, lst + 4)
    extra = b"00dc" + struct.pack("<I", len(jpeg_small)) + jpeg_small \
        + (b"\x00" if len(jpeg_small) % 2 else b"")
    mixed[lst + 8 + movi_size: lst + 8 + movi_size] = extra
    struct.pack_into("<I", mixed, lst + 4, movi_size + len(extra))
    struct.pack_into("<I", mixed, 4, len(mixed) - 8)
    with pytest.raises(ValueError, match="shape"):
        decode_avi_mjpeg(bytes(mixed))


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_avi_mjpeg(np.zeros((2, 8, 8), dtype=np.float32))
    with pytest.raises(ValueError, match="at least one"):
        encode_avi_mjpeg(np.zeros((0, 8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg(np.zeros((1, 8, 8), dtype=np.uint8), fps=0)

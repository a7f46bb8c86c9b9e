"""Pure-numpy MJPEG-AVI video container codec (RIFF framing, stdlib only).

Motion-JPEG inside an AVI RIFF container is the classic library-free video
format: the container is plain chunk framing (no inter-frame prediction),
and each frame is a baseline JPEG handled by
:mod:`flowforge.functions.jpegcodec`. This makes the multimodal family's
VIDEO branch real — decode, per-frame features, and frame sampling run on
genuine decoded pixels — leaving only codecs that truly need ffmpeg (MP4/
H.264) behind the declared stub. Reference analog: the reference pipeline
treats binary payloads as opaque (core/parquet.go row assembly); real
decode is this repo's multimodal extension.

Layout written by :func:`encode_avi_mjpeg` (and accepted, along with minor
variations, by :func:`decode_avi_mjpeg`)::

    RIFF <sz> 'AVI '
      LIST <sz> 'hdrl'
        'avih' <56>              main header (frame period, dims, count)
        LIST <sz> 'strl'
          'strh' <56>            stream header (fcc 'vids'/'MJPG', rate)
          'strf' <40>            BITMAPINFOHEADER (compression 'MJPG')
      LIST <sz> 'movi'
        '00dc' <sz> <jpeg bytes> [pad to even]  x n_frames
      'idx1' <16*n>              keyframe index

All integers little-endian; chunk payloads pad to even length (the pad
byte is excluded from the chunk size but included in the parent's).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegcodec import decode_jpeg, encode_jpeg


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 10,
                     restart_interval: int = 0) -> bytes:
    """uint8 (n, h, w[, 3]) frame stack -> MJPEG AVI bytes.

    Grayscale or RGB frames; each frame becomes one baseline JPEG '00dc'
    chunk. ``fps`` must divide 1_000_000 evenly enough for the integer
    microsecond frame period (any fps in [1, 10^6] works; the period is
    truncated as every AVI writer does)."""
    a = np.asarray(frames)
    if a.dtype != np.uint8 or a.ndim not in (3, 4):
        raise ValueError(f"expected uint8 (n,h,w[,3]), got {a.dtype} {a.shape}")
    if a.shape[0] == 0:
        raise ValueError("need at least one frame")
    n, h, w = a.shape[0], a.shape[1], a.shape[2]
    if fps <= 0:
        raise ValueError("fps must be positive")

    jpegs = [encode_jpeg(a[i], restart_interval=restart_interval)
             for i in range(n)]
    maxsz = max(len(j) for j in jpegs)

    movi = bytearray(b"movi")
    index = bytearray()
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        index += b"00dc" + struct.pack("<II", 0x10, len(movi)) \
            + struct.pack("<I", len(j))
        movi += b"00dc" + struct.pack("<I", len(j)) + j
        if len(j) % 2:
            movi += b"\x00"

    avih = struct.pack(
        "<10I", 1_000_000 // fps, 0, 0, 0x10, n, 0, 1, maxsz, w, h
    ) + b"\x00" * 16
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, n, maxsz,
                          0, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) \
        + b"strl" \
        + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) \
        + b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    body = hdrl \
        + b"LIST" + struct.pack("<I", len(movi)) + bytes(movi) \
        + b"idx1" + struct.pack("<I", len(index)) + bytes(index)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def decode_avi_mjpeg(payload: bytes) -> tuple[np.ndarray, int]:
    """MJPEG AVI bytes -> (uint8 (n, h, w[, 3]) frames, fps).

    Walks the RIFF chunk tree: fps from the 'avih' frame period (falling
    back to the 'vids' strh rate/scale), frames from every '00dc'/'00db'
    chunk under LIST 'movi'. Unknown chunks are skipped (so files with
    'JUNK' padding, extra streams' headers, or no idx1 still decode); a
    non-MJPEG video stream header is rejected explicitly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI header)")
    fps = 0
    frames: list[np.ndarray] = []

    def walk(data: bytes, pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            fourcc = data[pos: pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError(f"AVI chunk {fourcc!r} overruns its parent")
            if fourcc == b"LIST":
                walk(data, body_start + 4, body_end)
            elif fourcc == b"avih" and size >= 4:
                (usec,) = struct.unpack_from("<I", data, body_start)
                if usec:
                    fps = max(1, round(1_000_000 / usec))
            elif fourcc == b"strh" and size >= 28:
                if data[body_start: body_start + 4] == b"vids":
                    handler = data[body_start + 4: body_start + 8]
                    if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
                        raise ValueError(
                            f"AVI video stream is {handler!r}, not MJPG "
                            f"(H.264/other codecs need ffmpeg)")
                    scale, rate = struct.unpack_from("<II", data,
                                                     body_start + 20)
                    if not fps and scale:
                        fps = max(1, round(rate / scale))
            elif fourcc[2:4] in (b"dc", b"db") and size:
                frames.append(decode_jpeg(data[body_start: body_end]))
            pos = body_end + (size % 2)

    walk(payload, 12, min(len(payload), 8 + struct.unpack_from(
        "<I", payload, 4)[0]))
    if not frames:
        raise ValueError("AVI contains no MJPEG frames")
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"AVI frames disagree on shape: {sorted(shapes)}")
    return np.stack(frames), fps or 1

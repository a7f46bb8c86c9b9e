"""Pure-numpy baseline JPEG codec (ITU-T T.81 baseline sequential DCT).

No Pillow / libjpeg — stdlib + numpy only, same spirit as the PNG and
Netpbm codecs in :mod:`flowforge.functions.multimodal`. The decoder
handles the general baseline grammar: any DQT/DHT tables carried by the
file, 1- or 3-component scans, arbitrary chroma sampling factors
(4:4:4 / 4:2:2 / 4:2:0 via block replication), DRI/RSTn restart
intervals, and 0xFF00 byte stuffing. The encoder is deliberately simple
and self-contained — 4:4:4 or 4:2:0, a documented custom quantization
table, and *flat* canonical Huffman tables (all DC categories at 4 bits,
all 162 AC symbols at 8 bits) generated in code rather than transcribed
from Annex K, so no spec constant is trusted to memory; every table the
decoder needs travels inside the file, as the format requires.

The two sides share only the zigzag order and the DCT basis matrix, both
*generated* from their definitions (T.81 A.3.6, A.3.3), keeping the
round-trip test meaningful: a bug in a transcribed table cannot cancel
itself out. Reference analog: the reference pipeline treats binary
payloads as opaque (core/parquet.go row assembly); real decode is this
repo's multimodal extension.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared, generated tables ----------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag index order, generated from its definition:
    walk anti-diagonals d = r+c; odd d with r ascending, even d with r
    descending (T.81 figure A.6)."""
    out = []
    for d in range(15):
        rng = range(d + 1)
        for r in (rng if d % 2 else reversed(rng)):
            c = d - r
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()          # block index -> zigzag position
_UNZIGZAG = np.argsort(_ZIGZAG)    # kept for clarity; _ZIGZAG[k] = raster idx


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: D[u, x] = c(u)/2 * cos((2x+1)u pi/16).
    FDCT: S = D @ s @ D.T ; IDCT: s = D.T @ S @ D (T.81 A.3.3)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    d[0] *= 1 / np.sqrt(2)
    return d


_DCT = _dct_matrix()

# custom quantization tables (any table is valid — it travels in DQT):
# coarser with frequency, luma finer than chroma
_QLUMA = (8 + 2 * (np.arange(8)[:, None] + np.arange(8)[None, :])).astype(np.uint8)
_QCHROMA = (12 + 3 * (np.arange(8)[:, None] + np.arange(8)[None, :])).astype(np.uint8)


# --- bit I/O ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:            # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, surfaces RSTn markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: entropy stream ended "
                             "before the scan completed")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: entropy stream ended "
                                 "mid marker")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                self.marker = nxt     # restart marker reached
                b = 0                 # should not be consumed as data
                self.pos += 0
            else:
                self.marker = nxt     # EOI or next segment
                b = 0
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Consume a restart marker (decoder saw self.marker in D0-D7)."""
        assert self.marker is not None and 0xD0 <= self.marker <= 0xD7
        self.pos += 2  # skip FF Dx
        self.acc = 0
        self.nbits = 0
        self.marker = None


# --- Huffman ----------------------------------------------------------------


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """(length, code) -> symbol lookup built from a DHT segment."""

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _flat_dc_table() -> tuple[list[int], list[int]]:
    """All 12 DC size categories at 4 bits (Kraft 12/16, valid canonical)."""
    bits = [0] * 16
    bits[3] = 12
    return bits, list(range(12))


def _flat_ac_table() -> tuple[list[int], list[int]]:
    """All 162 baseline AC symbols at 8 bits (Kraft 162/256): EOB, ZRL and
    run 0-15 x size 1-10, in ascending symbol order."""
    syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    syms.sort()
    bits = [0] * 16
    bits[7] = len(syms)
    return bits, syms


_DC_BITS, _DC_VALS = _flat_dc_table()
_AC_BITS, _AC_VALS = _flat_ac_table()
_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --- encoder ----------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane, h/w multiples of 8 -> (n, 8, 8) raster blocks."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h, w))


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_blocks(bw: _BitWriter, blocks: np.ndarray, qtab: np.ndarray,
                   pred: int) -> int:
    """FDCT+quantize+Huffman one component's block sequence; returns the
    updated DC predictor. `blocks` is (n, 8, 8) level-shifted float."""
    coeffs = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
    q = np.round(coeffs / qtab.astype(np.float64)).astype(np.int64)
    zz = q.reshape(-1, 64)[:, _ZIGZAG]
    for row in zz:
        diff = int(row[0]) - pred
        pred = int(row[0])
        s = _size_cat(diff)
        code, length = _DC_CODES[s]
        bw.write(code, length)
        if s:
            v = diff if diff >= 0 else diff + (1 << s) - 1
            bw.write(v, s)
        run = 0
        nz = np.flatnonzero(row[1:])
        last = nz[-1] + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = _AC_CODES[0xF0]     # ZRL
                bw.write(c, ln)
                run -= 16
            s = _size_cat(v)
            c, ln = _AC_CODES[(run << 4) | s]
            bw.write(c, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            c, ln = _AC_CODES[0x00]         # EOB
            bw.write(c, ln)
    return pred


def encode_jpeg(pixels: np.ndarray, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale -> baseline JFIF JPEG.

    ``subsample=True`` emits 4:2:0 chroma (16x16 MCUs); default is 4:4:4.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many MCUs
    (exercises the decoder's restart path)."""
    a = np.asarray(pixels)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError(f"expected uint8 (h,w[,3]), got {a.dtype} {a.shape}")
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = _rgb_to_ycbcr(a)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            # 2x2 box-mean chroma on an edge-padded even grid
            cbp = _pad_edge(cb, 2)
            crp = _pad_edge(cr, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad each plane so the MCU grid is complete
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    comp_blocks = []
    for p, (sh, sv) in zip(planes, samp):
        p = _pad_edge(p, 1)  # no-op; keeps types uniform
        tw, th = mcus_x * 8 * sh, mcus_y * 8 * sv
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge") \
            if (p.shape[0] < th or p.shape[1] < tw) else p[:th, :tw]
        comp_blocks.append((_blockify(p - 128.0), tw // 8))
    qtabs = [_QLUMA] if gray else [_QLUMA, _QCHROMA]

    out = bytearray()
    out += b"\xff\xd8"                                            # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)                        # APP0
    for tid, qt in enumerate(qtabs):                              # DQT
        body = bytes([tid]) + bytes(qt.reshape(64)[_ZIGZAG].astype(np.uint8))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)                    # SOF0
    for i in range(ncomp):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qsel[i]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid, bits, vals in ((0, 0, _DC_BITS, _DC_VALS),      # DHT
                                 (1, 0, _AC_BITS, _AC_VALS)):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    sos = bytes([ncomp])                                          # SOS
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])   # DC table 0 / AC table 0 for all
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                blocks, bpr = comp_blocks[ci]
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * bpr + (mx * sh + bx)
                        preds[ci] = _encode_blocks(
                            bw, blocks[bi: bi + 1], qtabs[qsel[ci]], preds[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                                            # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF JPEG -> uint8 (h, w, 3) RGB, or (h, w) for grayscale.

    General baseline grammar: any DQT/DHT the file carries, 1- or
    3-component scans, arbitrary sampling factors (chroma upsampled by
    block replication), DRI/RSTn, multiple table segments, stuffed bytes.
    Progressive (SOF2) and arithmetic coding are rejected explicitly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker sync at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:           # T.81 B.1.1.2: optional FF fill bytes
            pos += 1                 # before any marker — skip them
            continue
        if marker == 0xD9:           # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG: segment header cut short")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4: pos + 2 + seglen]
        if marker == 0xDB:           # DQT (may hold several tables)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec:
                    raise ValueError("16-bit quant tables not supported")
                zz = np.frombuffer(body, dtype=np.uint8, count=64, offset=b + 1)
                qt = np.zeros(64, dtype=np.float64)
                qt[_ZIGZAG] = zz
                qtabs[tid] = qt.reshape(8, 8)
                b += 65
        elif marker == 0xC4:         # DHT (may hold several tables)
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1: b + 17])
                n = sum(bits)
                vals = list(body[b + 17: b + 17 + n])
                huff[(cls, tid)] = _HuffDecoder(bits, vals)
                b += 17 + n
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 (baseline/ext seq)
            depth, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if depth != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, sampb, qid = body[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": sampb >> 4, "v": sampb & 0xF,
                              "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:         # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:         # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cid, tabs = body[1 + 2 * i: 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, tabs >> 4, tabs & 0xF))
            data_pos = pos + 2 + seglen
            return _decode_scan(payload, data_pos, frame, scan, qtabs, huff,
                                restart_interval)
        pos += 2 + seglen
    raise ValueError("no SOS scan found")


def _decode_scan(payload: bytes, pos: int, frame: dict, scan: list,
                 qtabs: dict, huff: dict, restart_interval: int) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    store = []   # per component: zigzag coefficient rows, row-major blocks
    for c in comps:
        bw_, bh_ = mcus_x * c["h"], mcus_y * c["v"]
        store.append(np.zeros((bh_ * bw_, 64), dtype=np.float64))
    br = _BitReader(payload, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if br.marker is None:
                    # skip remaining pad bits up to the marker
                    while br.marker is None:
                        br.read_bit()
                br.align_restart()
                preds = [0] * len(comps)
            for ci, (comp, dct, act) in enumerate(scan):
                dc = huff[(0, dct)]
                ac = huff[(1, act)]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        row = np.zeros(64, dtype=np.float64)
                        s = dc.decode(br)
                        diff = _extend(br.receive(s), s) if s else 0
                        preds[ci] += diff
                        row[0] = preds[ci]
                        k = 1
                        while k <= 63:
                            sym = ac.decode(br)
                            if sym == 0x00:       # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16            # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            row[k] = _extend(br.receive(size), size)
                            k += 1
                        bi = ((my * comp["v"] + by) * mcus_x * comp["h"]
                              + mx * comp["h"] + bx)
                        store[ci][bi] = row
            mcu_count += 1
    # dequantize + IDCT + reassemble, vectorized per component
    planes = []
    for ci, comp in enumerate(comps):
        qt = qtabs[comp["q"]]
        blocks = np.zeros((store[ci].shape[0], 64), dtype=np.float64)
        blocks[:, _ZIGZAG] = store[ci]
        blocks = blocks.reshape(-1, 8, 8) * qt
        spat = np.einsum("xu,nuv,yv->nxy", _DCT.T, blocks, _DCT.T) + 128.0
        bw_, bh_ = mcus_x * comp["h"], mcus_y * comp["v"]
        plane = _unblockify(spat, bh_ * 8, bw_ * 8)
        # upsample by replication to the full MCU grid resolution
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    rgb = _ycbcr_to_rgb(ycc)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

"""Pure numpy/stdlib baseline JPEG codec (encode + decode).

Completes the media-codec family (stages/media_codecs.py): PNG/BMP/WAV
were real since round 4; JPEG was dims-only.  This module implements the
ITU-T T.81 BASELINE process from the public spec — FDCT/IDCT as 8x8
orthonormal matrix products (exactly the spec's 1/4*C(u)C(v) transform),
Annex-K quantization + Huffman tables, IJG quality scaling, JFIF YCbCr —
so the decode stages can score genuine JPEG content (reference
capability: src/core/feature_extraction/object_detection/sift.py:39-189,
cnn.py:71-159 score actual image bytes).

Scope (declared, raising ``ValueError`` outside it):
- Baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr 4:4:4
  (all sampling factors 1x1 — what the encoder emits).  Progressive
  (SOF2), arithmetic coding, and subsampled chroma raise.
- Restart markers are honored on decode (DC predictors + bit buffer
  reset); the encoder does not emit DRI.

The entropy decoder walks bits in Python — fine for the small-batch
actor-pool stages that consume it (images are decoded once per payload
inside a stateful actor; the per-image cost is bounded by payload size,
not corpus size).  Encode is vectorized per 8x8 block plane.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables (ITU-T T.81, public spec constants)
# ---------------------------------------------------------------------------

_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

_QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# (bits[1..16], values) per Annex K.3.3
_HT_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
_HT_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HT_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Orthonormal 8-point DCT-II matrix: M @ B @ M.T is exactly the spec's
# F(u,v) = 1/4 C(u)C(v) sum f cos.cos  (C(0)=1/sqrt2)
_x = np.arange(8)
_DCT_M = np.sqrt(np.where(_x[:, None] == 0, 1.0, 2.0) / 8.0) * np.cos(
    (2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg convention, public)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-walking decoder."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, values).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _bitsize(v: int) -> int:
    return int(v).bit_length()


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


def _plane_to_qblocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """uint8 (H, W) padded plane -> (nblocks, 64) quantized zigzag coeffs
    in MCU (row-major block) order; fully vectorized."""
    H, W = plane.shape
    bh, bw = H // 8, W // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float64) - 128.0)
    coef = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
    q = np.round(coef / qt[None, :, :]).astype(np.int64)
    return q.reshape(-1, 64)[:, _ZIGZAG]


def _pad_edge(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    H, W = (h + 7) & ~7, (w + 7) & ~7
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def jpeg_encode(pixels: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes
    (SOF0, Annex-K Huffman tables, 4:4:4, no subsampling)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        planes = [px.astype(np.float64)]
    elif px.ndim == 3 and px.shape[2] == 3:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., i] for i in range(3)]
    else:
        raise ValueError("jpeg_encode expects (h, w) gray or (h, w, 3) RGB")
    h, w = px.shape[:2]
    if not (h and w):
        raise ValueError("empty image")
    ncomp = len(planes)
    qts = [_scaled_qt(_QT_LUM, quality)]
    if ncomp == 3:
        qts.append(_scaled_qt(_QT_CHR, quality))

    comp_blocks = []
    for ci, plane in enumerate(planes):
        qt = qts[0] if ci == 0 else qts[1]
        padded = _pad_edge(np.clip(np.round(plane), 0, 255).astype(np.uint8))
        comp_blocks.append(_plane_to_qblocks(padded, qt))

    enc_dc = [_canonical_codes(*_HT_DC_LUM)]
    enc_ac = [_canonical_codes(*_HT_AC_LUM)]
    if ncomp == 3:
        enc_dc.append(_canonical_codes(*_HT_DC_CHR))
        enc_ac.append(_canonical_codes(*_HT_AC_CHR))

    bw_ = _BitWriter()
    prev_dc = [0] * ncomp
    nblocks = comp_blocks[0].shape[0]
    for b in range(nblocks):
        for ci in range(ncomp):
            ti = 0 if ci == 0 else 1
            dct, act = enc_dc[ti], enc_ac[ti]
            zz = comp_blocks[ci][b]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            size = _bitsize(abs(diff))
            code, ln = dct[size]
            bw_.put(code, ln)
            if size:
                bw_.put(diff if diff > 0 else diff + (1 << size) - 1, size)
            run = 0
            nz = np.flatnonzero(zz[1:])
            pos = 0
            for idx in nz:
                gap = int(idx) - pos
                run += gap
                while run >= 16:
                    code, ln = act[0xF0]  # ZRL
                    bw_.put(code, ln)
                    run -= 16
                v = int(zz[1 + idx])
                size = _bitsize(abs(v))
                code, ln = act[(run << 4) | size]
                bw_.put(code, ln)
                bw_.put(v if v > 0 else v + (1 << size) - 1, size)
                run = 0
                pos = int(idx) + 1
            if pos < 63:
                code, ln = act[0x00]  # EOB
                bw_.put(code, ln)
    scan = bw_.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qts):
        out += seg(0xDB, bytes([ti]) + bytes(
            int(v) for v in qt.reshape(-1)[_ZIGZAG]))
    comps = b"".join(struct.pack(">BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
                     for ci in range(ncomp))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    tables = [(0x00, _HT_DC_LUM), (0x10, _HT_AC_LUM)]
    if ncomp == 3:
        tables += [(0x01, _HT_DC_CHR), (0x11, _HT_AC_CHR)]
    for tc, (bits, values) in tables:
        out += seg(0xC4, bytes([tc]) + bytes(bits) + bytes(values))
    scomp = b"".join(struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
                     for ci in range(ncomp))
    out += seg(0xDA, bytes([ncomp]) + scomp + b"\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment with byte
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG scan")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def at_restart(self) -> bool:
        return (self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7)

    def skip_restart(self) -> None:
        self.pos += 2
        self.acc = 0
        self.nbits = 0


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w) or (h, w, 3) RGB.  Only the
    declared scope (SOF0, 8-bit, sampling factors 1x1) decodes; anything
    else raises ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[int, dict[tuple[int, int], int]] = {}
    sof = None
    comps: list[tuple[int, int]] = []  # (comp_id, qt_id) in SOF order
    scan_map: list[tuple[int, int]] = []  # (dc_table, ac_table)
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                zz = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                qts[tq] = zz.astype(np.int64)[_UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential DCT (SOF0) is supported")
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled chroma not supported (4:4:4 only)")
                comps.append((cid, tq))
            sof = (h, w, nc)
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc = body[i]
                bits = list(body[i + 1:i + 17])
                nvals = sum(bits)
                values = list(body[i + 17:i + 17 + nvals])
                huff[tc] = _decode_table(bits, values)
                i += 17 + nvals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            for si in range(ns):
                _cid, tt = body[1 + 2 * si:3 + 2 * si]
                scan_map.append((tt >> 4, tt & 0xF))
            pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if sof is None or not scan_map:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, nc = sof
    H, W = (h + 7) & ~7, (w + 7) & ~7
    bh, bw_ = H // 8, W // 8
    nblocks = bh * bw_
    coeffs = [np.zeros((nblocks, 64), dtype=np.int64) for _ in range(nc)]
    br = _BitReader(data, pos)
    prev_dc = [0] * nc
    for b in range(nblocks):
        if restart_interval and b and b % restart_interval == 0:
            if br.at_restart():
                br.skip_restart()
            prev_dc = [0] * nc
        for ci in range(nc):
            dc_t = huff[scan_map[ci][0]]
            ac_t = huff[0x10 | scan_map[ci][1]]
            size = _read_symbol(br, dc_t)
            diff = _extend(br.bits(size), size) if size else 0
            prev_dc[ci] += diff
            zz = coeffs[ci][b]
            zz[0] = prev_dc[ci]
            k = 1
            while k < 64:
                rs = _read_symbol(br, ac_t)
                if rs == 0x00:  # EOB
                    break
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError("bad AC run/size symbol")
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC coefficient index overflow")
                zz[k] = _extend(br.bits(size), size)
                k += 1
    planes = []
    for ci in range(nc):
        qt = qts[comps[ci][1]]
        deq = coeffs[ci][:, _UNZIGZAG].reshape(-1, 8, 8) * qt[None, :, :]
        blocks = np.einsum("xu,nuv,yv->nxy", _DCT_M.T, deq.astype(np.float64),
                           _DCT_M.T) + 128.0
        plane = (blocks.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(H, W))
        planes.append(plane[:h, :w])
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if nc == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    raise ValueError(f"unsupported component count {nc}")

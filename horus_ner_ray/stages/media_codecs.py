"""Pure-stdlib image/audio codecs: PNG, uncompressed BMP, WAV/PCM.

The container has no Pillow/opencv/pyav, but these formats don't need
them: PNG pixel data is zlib (stdlib) behind per-scanline difference
filters, BMP stores raw padded rows, and WAV is RIFF-framed PCM readable
with the stdlib ``wave`` module.  This module turns the multimodal
stage's former codec STUBS into real decodes (reference capability:
src/core/feature_extraction/object_detection/sift.py:39-189 and
cnn.py:71-159 score actual image content).

Scope (declared, checked, raising ``ValueError`` outside it):
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), no interlace.  All five scanline filters decode; Sub/Up are
  fully vectorized (uint8 wraparound accumulate), Average/Paeth walk
  pixels within a row (channel-vectorized) — fine for the small-batch
  actor-pool stages that consume them.
- BMP: BITMAPINFOHEADER, uncompressed, 24-bit BGR or 8-bit paletted,
  bottom-up or top-down.
- WAV: integer PCM 8/16/32-bit via stdlib ``wave``.
- JPEG: baseline SOF0 encode + decode live in ``stages/jpeg.py`` (round
  5; lossy, so tested by tolerance + pinned decodes rather than byte
  round-trips); ``decode_image`` dispatches on the SOI magic.
- GIF: LZW encode + decode live in ``stages/gif.py`` (round 5; lossless,
  pixel-exact round-trip-tested incl. interlace); ``decode_image``
  dispatches on the GIF87a/89a magic.

Encoders (PNG/BMP/WAV) exist so tests can round-trip known pixels
byte-for-byte and so resize stages can re-emit a standard container.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, elementwise over channel vectors (spec 9.4)."""
    ai = a.astype(np.int16)
    bi = b.astype(np.int16)
    ci = c.astype(np.int16)
    p = ai + bi - ci
    pa_ = np.abs(p - ai)
    pb = np.abs(p - bi)
    pc = np.abs(p - ci)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) for grayscale or (h, w, ch)."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color}); this decoder "
            "handles 8-bit gray/RGB/gray+alpha/RGBA")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + w * ch
    if len(raw) != h * stride:
        raise ValueError("PNG pixel payload size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters = rows[:, 0]
    out = np.zeros((h, w, ch), dtype=np.uint8)
    zero_row = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        cur = rows[y, 1:].reshape(w, ch)
        f = int(filters[y])
        up = out[y - 1] if y else zero_row
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: uint8 accumulate wraps mod 256 by itself
            out[y] = np.add.accumulate(cur, axis=0, dtype=np.uint8)
        elif f == 2:  # Up
            out[y] = cur + up
        elif f == 3:  # Average — left-dependency: walk pixels
            row = out[y]
            row[0] = cur[0] + (up[0].astype(np.uint16) // 2).astype(np.uint8)
            for x in range(1, w):
                avg = ((row[x - 1].astype(np.uint16)
                        + up[x].astype(np.uint16)) // 2)
                row[x] = cur[x] + avg.astype(np.uint8)
        elif f == 4:  # Paeth — left-dependency: walk pixels
            row = out[y]
            zero_px = np.zeros(ch, dtype=np.uint8)
            row[0] = cur[0] + _paeth(zero_px, up[0], zero_px)
            for x in range(1, w):
                row[x] = cur[x] + _paeth(row[x - 1], up[x], up[x - 1])
        else:
            raise ValueError(f"bad PNG filter byte {f}")
    return out[:, :, 0] if ch == 1 else out


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def png_encode(pixels: np.ndarray, row_filters=None, level: int = 6) -> bytes:
    """uint8 (h, w) or (h, w, ch in {1,2,3,4}) -> PNG bytes.

    ``row_filters`` (int or per-row array, default 0) selects the scanline
    filter applied to each row — tests use it to exercise every decode
    filter with known pixels."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None or h == 0 or w == 0:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    rf = np.broadcast_to(np.asarray(
        0 if row_filters is None else row_filters, dtype=np.uint8), (h,))
    zero_row = np.zeros((w, ch), dtype=np.uint8)
    zero_px = np.zeros(ch, dtype=np.uint8)
    lines = bytearray()
    for y in range(h):
        cur = px[y]
        up = px[y - 1] if y else zero_row
        f = int(rf[y])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur.copy()
            enc[1:] -= cur[:-1]
        elif f == 2:
            enc = cur - up
        elif f == 3:
            enc = cur.copy()
            enc[0] -= (up[0].astype(np.uint16) // 2).astype(np.uint8)
            avg = ((cur[:-1].astype(np.uint16) + up[1:].astype(np.uint16))
                   // 2).astype(np.uint8)
            enc[1:] -= avg
        elif f == 4:
            enc = cur.copy()
            enc[0] -= _paeth(zero_px, up[0], zero_px)
            for x in range(1, w):
                enc[x] = cur[x] - _paeth(cur[x - 1], up[x], up[x - 1])
        else:
            raise ValueError(f"bad filter {f}")
        lines.append(f)
        lines.extend(enc.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines), level))
            + _png_chunk(b"IEND", b""))


def bmp_decode(data: bytes) -> np.ndarray:
    """Uncompressed BMP -> uint8 (h, w, 3) RGB (24-bit) or (h, w) (8-bit
    paletted, mapped through the palette's luminance)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("BMP core headers not supported")
    w, h_signed = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (8, 24):
        raise ValueError(f"unsupported BMP (bpp={bpp} comp={compression})")
    if w <= 0 or h_signed == 0:
        raise ValueError("bad BMP dimensions")
    h = abs(h_signed)
    top_down = h_signed < 0
    row_bytes = (w * bpp // 8 + 3) & ~3
    need = pix_off + row_bytes * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        data[pix_off : pix_off + row_bytes * h], dtype=np.uint8
    ).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return bgr[:, :, ::-1].copy()  # BGR -> RGB
    # 8-bit: palette right after the info header, BGRA quads
    pal_off = 14 + hdr_size
    pal = np.frombuffer(data[pal_off : pal_off + 256 * 4],
                        dtype=np.uint8).reshape(-1, 4)
    idx = rows[:, :w]
    # integer luminance of the palette entries (BGRA order)
    lum = ((77 * pal[:, 2].astype(np.uint32)
            + 150 * pal[:, 1].astype(np.uint32)
            + 29 * pal[:, 0].astype(np.uint32)) >> 8).astype(np.uint8)
    return lum[idx]


def bmp_encode(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit bottom-up uncompressed BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("bmp_encode expects (h, w, 3) RGB")
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       row_bytes * h, 2835, 2835, 0, 0)
    pix_off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", pix_off + row_bytes * h, 0, 0, pix_off)
    return hdr + info + body.tobytes()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 samples in [-1, 1], shape (n, channels);
    sample_rate).  Integer PCM 8/16/32-bit via stdlib ``wave``."""
    with wave.open(io.BytesIO(data), "rb") as f:
        sr = f.getframerate()
        nch = f.getnchannels()
        sw = f.getsampwidth()
        n = f.getnframes()
        raw = f.readframes(n)
    if sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return x.reshape(-1, nch), sr


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1, 1], shape (n,) or (n, ch) -> 16-bit PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    # symmetric with wav_decode's /32768 (quantization error <= 0.5 LSB;
    # an asymmetric 32767 multiplier costs up to ~1.2 LSB near full scale)
    q = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(2)
        f.setframerate(int(sample_rate))
        f.writeframes(q.tobytes())
    return buf.getvalue()


def wav_features(data: bytes) -> dict:
    """Deterministic audio stats over the decoded PCM: sample counts plus
    e6-quantized duration/RMS/peak (int publication — hash-stable)."""
    x, sr = wav_decode(data)
    n, nch = x.shape
    mono = x.mean(axis=1) if nch > 1 else x[:, 0]
    dur = n / sr if sr else 0.0
    rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    return {
        "sample_rate": int(sr),
        "n_channels": int(nch),
        "n_samples": int(n),
        "duration_e6": int(np.floor(dur * 1e6 + 0.5)),
        "rms_e6": int(np.floor(rms * 1e6 + 0.5)),
        "peak_e6": int(np.floor(peak * 1e6 + 0.5)),
    }


def decode_image(data: bytes) -> np.ndarray:
    """Sniff PNG/BMP/JPEG/GIF and decode to a uint8 pixel array."""
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return png_decode(data)
    if data[:2] == b"BM":
        return bmp_decode(data)
    if data[:2] == b"\xff\xd8":
        from horus_ner_ray.stages.jpeg import jpeg_decode

        return jpeg_decode(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from horus_ner_ray.stages.gif import gif_decode

        return gif_decode(data)
    raise ValueError("unsupported image container (PNG/BMP/JPEG/GIF supported)")

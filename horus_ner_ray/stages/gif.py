"""Pure-stdlib+numpy GIF87a/89a codec: LZW decode AND encode.

Closes the last dims-only gap in the media scope (round 4 shipped real
PNG/BMP/WAV, round 5 added baseline JPEG; GIF headers were parsed but
LZW payloads never decoded).  Implemented from the public GIF89a
specification (CompuServe, 1990) — variable-width LZW with LSB-first
bit packing, code-size growth at dictionary powers of two, CLEAR/EOI
control codes, a 12-bit code cap, sub-block framing, global/local color
tables, and the 4-pass Adam-style row interlace.

GIF LZW is LOSSLESS, so unlike JPEG the tests pin full pixel-exact
round-trips (encode -> decode == input) on top of container-level checks.

Scope (declared, raising ``ValueError`` outside it):
- decode: first image frame of a GIF87a/89a stream; full-canvas frames
  (left=0, top=0, frame dims == screen dims); global or local color
  table; interlaced or sequential row order.  Graphic-control /
  comment / application extensions are skipped (transparency indices
  are ignored — the palette color is returned).  Later frames of an
  animation are not composited.
- encode: grayscale ``(h, w)`` (identity 256-gray palette) or RGB
  ``(h, w, 3)`` with <=256 distinct colors; optional interlaced row
  order so the decode path's deinterlacer has conforming vectors.

Reference capability anchor: the reference pipeline downloads and
scores real web images (src/core/feature_extraction/object_detection/
sift.py:39-189, cnn.py:71-159); GIF is one of the container formats its
crawler stores.  This module keeps every pixel-consuming Ray stage
(feature extraction, trained media classifier) working on genuine GIF
content with no imaging library in the container.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12  # GIF LZW hard cap: codes never exceed 12 bits


# ---------------------------------------------------------------------------
# LZW core (GIF variant: LSB-first packing, CLEAR/EOI, growth at 2^width)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, expected: int | None = None) -> np.ndarray:
    """GIF-LZW decompress ``data`` (already de-blocked) -> uint8 indices.

    ``expected`` (pixel count) lets the caller stop exactly at the raster
    size even when the stream omits an explicit EOI, and bounds output.
    """
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1

    # dictionary as parallel arrays (prefix link + last byte) — avoids
    # quadratic bytes concatenation for long chains
    max_entries = 1 << _MAX_CODE_WIDTH
    prefix = np.zeros(max_entries, dtype=np.int32)
    suffix = np.zeros(max_entries, dtype=np.uint8)
    prefix[:clear] = -1
    suffix[:clear] = np.arange(clear, dtype=np.uint8)
    next_code = eoi + 1

    out = bytearray()
    chain = bytearray()  # scratch for expanding one code

    def expand(code: int) -> bytes:
        chain.clear()
        c = code
        while c >= 0:
            chain.append(int(suffix[c]))
            c = int(prefix[c]) if c >= clear else -1
        chain.reverse()
        return bytes(chain)

    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev = -1
    while True:
        while nbits < width:
            if pos >= n:
                # stream ended without EOI; accept if we already have the raster
                if expected is not None and len(out) >= expected:
                    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8).copy()
                raise ValueError("truncated GIF LZW stream")
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width

        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF LZW: first code after clear not a literal")
            out.append(code)
            prev = code
        else:
            if code < next_code:
                entry = expand(code)
            elif code == next_code:
                # the KwKwK case: entry = expand(prev) + first byte of it
                entry = expand(prev)
                entry += entry[:1]
            else:
                raise ValueError("GIF LZW: code beyond dictionary")
            if next_code < max_entries:
                # new entry = expand(prev) + first byte of `entry` — its
                # suffix is entry[0] in both the normal and KwKwK cases
                prefix[next_code] = prev
                suffix[next_code] = entry[0]
                next_code += 1
                if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                    width += 1
            out += entry
            prev = code
        if expected is not None and len(out) >= expected:
            return np.frombuffer(bytes(out[:expected]), dtype=np.uint8).copy()
    arr = np.frombuffer(bytes(out), dtype=np.uint8).copy()
    if expected is not None:
        if len(arr) < expected:
            raise ValueError(f"GIF raster short: {len(arr)} of {expected} pixels")
        arr = arr[:expected]
    return arr


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-LZW compress uint8 ``indices`` -> raw code bytes (no sub-blocks).

    Emits CLEAR up front and whenever the dictionary fills (no deferred
    clear — maximally compatible), EOI at the end; grows the code width
    exactly when ``next_code`` reaches ``2^width`` so it stays in lockstep
    with :func:`lzw_decode`.
    """
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    max_entries = 1 << _MAX_CODE_WIDTH

    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    width = min_code_size + 1
    emit(clear, width)
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    w_code = -1
    for k in np.asarray(indices, dtype=np.uint8).reshape(-1):
        k = int(k)
        if k >= clear:
            raise ValueError("index exceeds color table for this code size")
        if w_code < 0:
            w_code = k
            continue
        hit = table.get((w_code, k))
        if hit is not None:
            w_code = hit
            continue
        emit(w_code, width)
        table[(w_code, k)] = next_code
        next_code += 1
        # the decoder's dictionary runs ONE entry behind the encoder's (it
        # adds no entry for the first code after a clear), so the encoder
        # grows the width one emission later than the decoder's
        # next_code == 2^width rule: at 2^width + 1
        if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code == max_entries:
            emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        w_code = k
    if w_code >= 0:
        emit(w_code, width)
    emit(eoi, width)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row indices in GIF 4-pass interlace transmission order."""
    return np.concatenate([np.arange(start, h, step) for start, step in _INTERLACE_PASSES]).astype(np.int64)


def _read_color_table(data: bytes, pos: int, size_field: int) -> tuple[np.ndarray, int]:
    n = 2 << size_field  # 2^(field+1) entries
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("truncated GIF color table")
    pal = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3).copy()
    return pal, end


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        sz = data[pos]
        pos += 1
        if sz == 0:
            break
        if pos + sz > len(data):
            raise ValueError("truncated GIF sub-block body")
        chunks.append(data[pos : pos + sz])
        pos += sz
    return b"".join(chunks), pos


def gif_decode(data: bytes) -> np.ndarray:
    """GIF bytes -> uint8 pixels: ``(h, w)`` if the palette is pure gray,
    else ``(h, w, 3)`` RGB.  First frame only; see module scope."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, packed & 0x07)

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            pos += 1
            _, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if (left, top) != (0, 0) or (iw, ih) != (sw, sh):
            raise ValueError(
                "partial-canvas GIF frame not supported (decoder scope: "
                "full-frame left=top=0, frame dims == screen dims)")
        pal = gct
        if ipacked & 0x80:
            pal, pos = _read_color_table(data, pos, ipacked & 0x07)
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF before LZW data")
        mcs = data[pos]
        pos += 1
        raw, pos = _read_subblocks(data, pos)
        idx = lzw_decode(raw, mcs, expected=iw * ih)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF pixel index exceeds color table")
        rows = idx.reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in pass order
            order = _interlace_order(ih)
            out_rows = np.empty_like(rows)
            out_rows[order] = rows
            rows = out_rows
        rgb = pal[rows]  # (h, w, 3)
        if np.array_equal(rgb[:, :, 0], rgb[:, :, 1]) and np.array_equal(rgb[:, :, 0], rgb[:, :, 2]):
            return np.ascontiguousarray(rgb[:, :, 0])
        return rgb
    raise ValueError("GIF contains no image data")


def gif_encode(arr: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 pixels -> GIF89a bytes.  ``(h, w)`` gray uses the identity
    256-gray palette; ``(h, w, 3)`` RGB requires <=256 distinct colors."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError("gif_encode wants uint8 (h,w) or (h,w,3)")
    h, w = a.shape[:2]
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError("GIF dimensions out of range")
    if a.ndim == 2:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        idx = a
    else:
        if a.shape[2] != 3:
            raise ValueError("gif_encode RGB wants exactly 3 channels")
        packed = (
            a[:, :, 0].astype(np.int64) << 16
            | a[:, :, 1].astype(np.int64) << 8
            | a[:, :, 2].astype(np.int64)
        ).reshape(-1)
        colors, idx_flat = np.unique(packed, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(f"GIF needs <=256 distinct colors, got {len(colors)}")
        pal = np.stack(
            [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF], axis=1
        ).astype(np.uint8)
        idx = idx_flat.astype(np.uint8).reshape(h, w)

    n_colors = len(pal)
    size_field = 0
    while (2 << size_field) < n_colors:
        size_field += 1
    table_entries = 2 << size_field
    pal_padded = np.zeros((table_entries, 3), dtype=np.uint8)
    pal_padded[:n_colors] = pal
    mcs = max(2, size_field + 1)

    rows = idx
    ipacked = 0
    if interlace:
        rows = idx[_interlace_order(h)]
        ipacked |= 0x40
    code_bytes = lzw_encode(rows.reshape(-1), mcs)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | size_field, 0, 0)
    out += pal_padded.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    out.append(mcs)
    for i in range(0, len(code_bytes), 255):
        chunk = code_bytes[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_decode_frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> EVERY frame of an animated GIF as uint8 arrays
    ((h, w) gray / (h, w, 3) RGB per frame) — the multi-image walk the
    single-frame ``gif_decode`` stops short of.  Same scope rules:
    full-canvas frames only, global or local color tables, interlace
    honoured per frame; extensions (incl. Graphic Control) are
    skipped — disposal/transparency compositing is out of scope, every
    frame stands alone."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, packed & 0x07)
    frames: list[np.ndarray] = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            pos += 1
            _, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB",
                                                   data[pos:pos + 9])
        pos += 9
        if (left, top) != (0, 0) or (iw, ih) != (sw, sh):
            raise ValueError(
                "partial-canvas GIF frame not supported (decoder scope: "
                "full-frame left=top=0, frame dims == screen dims)")
        pal = gct
        if ipacked & 0x80:
            pal, pos = _read_color_table(data, pos, ipacked & 0x07)
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF before LZW data")
        mcs = data[pos]
        pos += 1
        raw, pos = _read_subblocks(data, pos)
        idx = lzw_decode(raw, mcs, expected=iw * ih)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF pixel index exceeds color table")
        rows = idx.reshape(ih, iw)
        if ipacked & 0x40:
            order = _interlace_order(ih)
            out_rows = np.empty_like(rows)
            out_rows[order] = rows
            rows = out_rows
        rgb = pal[rows]
        if np.array_equal(rgb[:, :, 0], rgb[:, :, 1]) \
                and np.array_equal(rgb[:, :, 0], rgb[:, :, 2]):
            frames.append(np.ascontiguousarray(rgb[:, :, 0]))
        else:
            frames.append(rgb)
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def _frame_block(a: np.ndarray, interlace: bool) -> bytes:
    """One image descriptor + LOCAL color table + LZW sub-blocks for a
    single full-canvas frame (the gif_encode palette/LZW logic, emitted
    as a local table so animated frames stay independent)."""
    h, w = a.shape[:2]
    if a.ndim == 2:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        idx = a
    else:
        packed = (
            a[:, :, 0].astype(np.int64) << 16
            | a[:, :, 1].astype(np.int64) << 8
            | a[:, :, 2].astype(np.int64)
        ).reshape(-1)
        colors, idx_flat = np.unique(packed, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(
                f"GIF needs <=256 distinct colors, got {len(colors)}")
        pal = np.stack(
            [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF],
            axis=1).astype(np.uint8)
        idx = idx_flat.astype(np.uint8).reshape(h, w)
    n_colors = len(pal)
    size_field = 0
    while (2 << size_field) < n_colors:
        size_field += 1
    table_entries = 2 << size_field
    pal_padded = np.zeros((table_entries, 3), dtype=np.uint8)
    pal_padded[:n_colors] = pal
    mcs = max(2, size_field + 1)
    rows = idx
    ipacked = 0x80 | size_field  # local color table
    if interlace:
        rows = idx[_interlace_order(h)]
        ipacked |= 0x40
    code_bytes = lzw_encode(rows.reshape(-1), mcs)
    out = bytearray()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    out += pal_padded.tobytes()
    out.append(mcs)
    for i in range(0, len(code_bytes), 255):
        chunk = code_bytes[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"
    return bytes(out)


def gif_encode_animation(frames: list[np.ndarray],
                         interlace: bool = False) -> bytes:
    """Frame list -> one animated GIF89a: shared logical screen, one
    full-canvas image block per frame with its own LOCAL color table
    (no disposal/timing extensions — frames stand alone, matching
    ``gif_decode_frames``).  All frames must share (h, w)."""
    if not frames:
        raise ValueError("gif_encode_animation wants >= 1 frame")
    shapes = {f.shape[:2] for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"animated frames must share dims, got {shapes}")
    h, w = next(iter(shapes))
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError("GIF dimensions out of range")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x70, 0, 0)  # no global table
    for f in frames:
        a = np.asarray(f)
        if a.dtype != np.uint8 or a.ndim not in (2, 3):
            raise ValueError("frames must be uint8 (h,w) or (h,w,3)")
        out += _frame_block(a, interlace)
    out += b"\x3b"
    return bytes(out)

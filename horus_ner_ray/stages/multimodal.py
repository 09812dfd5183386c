"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with metadata
columns alongside (media_type, width/height or sample_rate, byte length).
The Ray-side plumbing — schema, small-batch actor-pool stages, output
layout — is real and tested.  ``decoder="real"`` decodes actual
PNG/BMP pixels and WAV/PCM samples through the pure-stdlib codecs in
``stages/media_codecs.py`` (zlib IDAT + vectorized scanline unfilter; no
Pillow needed); ``decoder="fake"`` remains the deterministic seedable
stand-in for formats outside that scope.

SCOPE (declared): PNG, BMP and WAV pixel/sample decode+encode are fully
implemented and byte-exact-tested.  JPEG gained a REAL baseline codec in
round 5 (``stages/jpeg.py``: spec FDCT/IDCT, Annex-K tables, Huffman
entropy coding BOTH directions — the encoder provides the conforming
test vectors the round-4 scope note said were missing; lossy, so tested
by tolerance bounds + pinned decodes instead of byte round-trips, and
``decode_image`` dispatches on the SOI magic).  GIF gained a REAL LZW
codec too (``stages/gif.py``: variable-width LZW both directions,
global/local color tables, 4-pass interlace; lossless, so pixel-exact
round-trip-tested).  Every pixel-consuming operator (feature
extraction, resize, the trained media classifier in
``stages/media_classify.py``) runs on the real PNG/BMP/JPEG/GIF path —
no dims-only image format remains.

Sizing note (task brief "memory-aware"): binary rows are wide — these
stages use small ``batch_size`` (default 64) so batch x concurrency stays
within worker heaps, and keep ``batch_format='pyarrow'`` end-to-end since
binary columns round-trip Arrow cleanly but degrade to object dtype in
pandas.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/fake" | "audio/fake" | ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes) for tests."""
    rng = np.random.RandomState(seed)
    w = rng.randint(8, 64, size=n).astype(np.int32)
    h = rng.randint(8, 64, size=n).astype(np.int32)
    payloads = [rng.randint(0, 256, size=int(w[i]) * int(h[i]), dtype=np.uint8).tobytes() for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["image/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaDecodeFeatures:
    """Actor-pool stage: decode payload -> fixed-size feature vector.

    __init__ holds the (stub) codec state once per actor — the real version
    would load model weights / codec contexts here (the reference reloads
    its CNN weights per call, the anti-pattern SURVEY.md A4 flags; this is
    the fix).  __call__ is per small batch.
    """

    FEATURE_DIM = 16

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.decoder == "real":
            # REAL pixel decode (stdlib PNG/BMP codec): features are the
            # 16-bin intensity histogram of the decoded samples — byte
            # parsing + zlib + numpy, no Pillow
            from horus_ner_ray.stages.media_codecs import decode_image

            px = decode_image(payload).reshape(-1)
            if len(px) == 0:
                return np.zeros(self.FEATURE_DIM)
            hist = np.bincount((px.astype(np.int64) // 16), minlength=16)[:16]
            return hist / len(px)
        # deterministic fake decode: byte histogram moments as "features"
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        if len(arr) == 0:
            return np.zeros(self.FEATURE_DIM)
        hist = np.bincount((arr // 16).astype(np.int64), minlength=16)[:16]
        return hist / max(len(arr), 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p.as_py(), int(w.as_py() or 0), int(h.as_py() or 0))
            for p, w, h in zip(batch["payload"], batch["width"], batch["height"])
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


class MediaResize:
    """Actor-pool stage: resize image payloads to (target_w, target_h).

    Stub codec (nearest-neighbor over the fake byte raster; ``real`` raises
    at the Pillow seam); the Ray plumbing — binary in/out schema, metadata
    update, small batches — is real and tested."""

    def __init__(self, target_w: int = 16, target_h: int = 16, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.tw, self.th = int(target_w), int(target_h)
        self.decoder = decoder

    def _resize(self, payload: bytes, w: int, h: int) -> bytes:
        if self.decoder == "real":
            # decode PNG/BMP pixels, nearest-neighbor resample (vectorized
            # index gather), re-emit PNG — all stdlib + numpy
            from horus_ner_ray.stages.media_codecs import (
                decode_image,
                png_encode,
            )

            px = decode_image(payload)
            ph, pw = px.shape[:2]
            yi = (np.arange(self.th) * ph // self.th).astype(np.int64)
            xi = (np.arange(self.tw) * pw // self.tw).astype(np.int64)
            return png_encode(px[np.ix_(yi, xi)])
        if w <= 0 or h <= 0 or len(payload) < w * h:
            return b"\x00" * (self.tw * self.th)
        arr = np.frombuffer(payload[: w * h], dtype=np.uint8).reshape(h, w)
        yi = (np.arange(self.th) * h // self.th).astype(np.int64)
        xi = (np.arange(self.tw) * w // self.tw).astype(np.int64)
        return arr[np.ix_(yi, xi)].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [
            self._resize(p.as_py(), int(w.as_py() or 0), int(h.as_py() or 0))
            for p, w, h in zip(batch["payload"], batch["width"], batch["height"])
        ]
        # the real path re-encodes whatever came in as PNG
        mtype = (pa.array(["image/png"] * len(batch), pa.string())
                 if self.decoder == "real" else batch["media_type"])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": mtype,
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([self.tw] * len(batch), pa.int32()),
                "height": pa.array([self.th] * len(batch), pa.int32()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            },
            schema=MEDIA_SCHEMA,
        )


def frame_sample_batch(batch: pa.Table, every: int = 4, frame_bytes: int = 64) -> pa.Table:
    """Video-style frame sampling: treat the payload as a sequence of
    fixed-size frames and keep every ``every``-th one — flat_map shaped
    (one output row per kept frame).  Deterministic stub for the pyav seam;
    the explode plumbing (media_id, frame_idx, frame payload) is real."""
    out = {"media_id": [], "frame_idx": [], "frame": []}
    for mid, p in zip(batch["media_id"], batch["payload"]):
        raw = p.as_py()
        n_frames = len(raw) // frame_bytes
        for fi in range(0, n_frames, every):
            out["media_id"].append(mid.as_py())
            out["frame_idx"].append(fi)
            out["frame"].append(raw[fi * frame_bytes : (fi + 1) * frame_bytes])
    return pa.table(
        {
            "media_id": pa.array(out["media_id"], pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], pa.int32()),
            "frame": pa.array(out["frame"], pa.binary()),
        }
    )


def _png_dims(b: bytes):
    # 8-byte signature, then IHDR: len(4) 'IHDR' width(4 BE) height(4 BE)
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        return (int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big"))
    return None


def _gif_dims(b: bytes):
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return (int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little"))
    return None


def _bmp_dims(b: bytes):
    # height is legitimately negative for top-down BMPs (abs it); width is
    # not — a non-positive width means a corrupt header, classify unknown
    if len(b) >= 26 and b[:2] == b"BM":
        w = int.from_bytes(b[18:22], "little", signed=True)
        if w <= 0:
            return None
        return (w, abs(int.from_bytes(b[22:26], "little", signed=True)))
    return None


def _jpeg_dims(b: bytes):
    # walk the marker stream to the first SOFn frame header:
    # FF Cn len(2 BE) precision(1) height(2 BE) width(2 BE)
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 <= len(b):
        if b[i] != 0xFF:
            return None
        # JPEG B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while i + 9 <= len(b) and b[i + 1] == 0xFF:
            i += 1
        if i + 9 > len(b):
            return None
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        seg_len = int.from_bytes(b[i + 2:i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return (int.from_bytes(b[i + 7:i + 9], "big"),
                    int.from_bytes(b[i + 5:i + 7], "big"))
        i += 2 + seg_len
    return None


_SNIFFERS = (("png", _png_dims), ("jpeg", _jpeg_dims),
             ("gif", _gif_dims), ("bmp", _bmp_dims))


def image_header_meta_batch(batch: pa.Table, payload_col: str = "payload",
                            id_col: str = "media_id") -> pa.Table:
    """REAL (not stubbed) image metadata extraction: sniff the container
    format and parse width/height straight from PNG/JPEG/GIF/BMP headers —
    pure byte parsing, no codec library.  This is the ingest step a media
    pipeline runs on every object BEFORE deciding decode routing and batch
    sizing; unknown/corrupt payloads classify as 'unknown' instead of
    erroring (row error handling, SURVEY.md M11).  Per-row work is O(header
    bytes), independent of payload size — the Python loop is bounded by
    parsing, not data volume."""
    fmts, ws, hs, nbytes = [], [], [], []
    for p in batch[payload_col]:
        raw = p.as_py() or b""  # one copy out of Arrow per payload
        nbytes.append(len(raw))
        for name, fn in _SNIFFERS:
            d = fn(raw)
            if d is not None:
                fmts.append(name)
                ws.append(int(d[0]))
                hs.append(int(d[1]))
                break
        else:
            fmts.append("unknown")
            ws.append(0)
            hs.append(0)
    return pa.table({
        id_col: batch[id_col],
        "format": pa.array(fmts, pa.string()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_bytes": pa.array(nbytes, pa.int64()),
    })


def image_header_meta_dataset(media_ds, payload_col: str = "payload",
                              id_col: str = "media_id", batch_size: int = 64):
    from horus_ner_ray.util import worker_runtime_env

    return media_ds.map_batches(
        lambda b: image_header_meta_batch(b, payload_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
        runtime_env=worker_runtime_env(),
    )


def synth_image_headers(n: int = 32, seed: int = 7) -> pa.Table:
    """Deterministic REAL container headers (valid PNG/JPEG/GIF/BMP
    prefixes with genuine dimension fields) + junk payload tails, for
    testing the sniffer without codec libraries."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        w, h = int(rng.randint(1, 4000)), int(rng.randint(1, 4000))
        kind = i % 5
        if kind == 0:
            b = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
                 + w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(5))
            fmt = "png"
        elif kind == 1:
            # SOI, APP0 stub, then SOF0 carrying the true dimensions
            w, h = min(w, 65535), min(h, 65535)
            app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + bytes(14)
            b = (b"\xff\xd8" + app0 + b"\xff\xc0" + (17).to_bytes(2, "big")
                 + b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(10))
            fmt = "jpeg"
        elif kind == 2:
            w, h = min(w, 65535), min(h, 65535)
            b = (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
                 + bytes(4))
            fmt = "gif"
        elif kind == 3:
            b = (b"BM" + bytes(16) + w.to_bytes(4, "little")
                 + h.to_bytes(4, "little") + bytes(4))
            fmt = "bmp"
        else:
            # junk; first byte 0x00 so no magic prefix can match by chance
            b = b"\x00" + rng.randint(0, 256, size=31, dtype=np.uint8).tobytes()
            fmt, w, h = "unknown", 0, 0
        rows.append((i, fmt, w, h, b + rng.randint(0, 256, 16, dtype=np.uint8).tobytes()))
    return pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "true_format": pa.array([r[1] for r in rows], pa.string()),
        "true_w": pa.array([r[2] for r in rows], pa.int32()),
        "true_h": pa.array([r[3] for r in rows], pa.int32()),
        "payload": pa.array([r[4] for r in rows], pa.binary()),
    })


def synth_real_media_table(n: int = 48, seed: int = 42) -> pa.Table:
    """Deterministic table of GENUINE containers — PNG (mixed scanline
    filters and color types), 24-bit BMP, and 16-bit PCM WAV payloads —
    so the decode stages exercise the real stdlib codecs end-to-end."""
    from horus_ner_ray.stages.media_codecs import (
        bmp_encode,
        png_encode,
        wav_encode,
    )

    rng = np.random.RandomState(seed)
    mids, types, payloads, ws, hs = [], [], [], [], []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            h, w = int(rng.randint(4, 40)), int(rng.randint(4, 40))
            ch = int(rng.choice([1, 3, 4]))
            px = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
            if ch == 1:
                px = px[:, :, 0]
            filt = rng.randint(0, 5, size=h)
            payloads.append(png_encode(px, row_filters=filt))
            types.append("image/png")
        elif kind == 1:
            h, w = int(rng.randint(4, 40)), int(rng.randint(4, 40))
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(bmp_encode(px))
            types.append("image/bmp")
        else:
            sr = int(rng.choice([8000, 16000, 44100]))
            t = np.arange(int(rng.randint(200, 2000))) / sr
            x = 0.5 * np.sin(2 * np.pi * float(rng.randint(100, 2000)) * t)
            payloads.append(wav_encode(x, sr))
            types.append("audio/wav")
            h = w = 0
        mids.append(i)
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    }, schema=MEDIA_SCHEMA)


def synth_jpeg_media_table(n: int = 32, seed: int = 19) -> pa.Table:
    """Deterministic table of GENUINE baseline JPEGs (stages/jpeg.py
    encoder): gray and RGB, mixed qualities, non-multiple-of-8 dims —
    conforming test vectors for the real entropy decoder."""
    from horus_ner_ray.stages.jpeg import jpeg_encode

    rng = np.random.RandomState(seed)
    mids, types, payloads, ws, hs = [], [], [], [], []
    for i in range(n):
        h, w = int(rng.randint(5, 40)), int(rng.randint(5, 40))
        q = int(rng.choice([60, 80, 90, 95]))
        if i % 2 == 0:
            # smooth gradient gray (realistic transform-coded content)
            px = ((np.add.outer(np.arange(h), np.arange(w)) * 3
                   + int(rng.randint(0, 64))) % 256).astype(np.uint8)
        else:
            px = np.zeros((h, w, 3), np.uint8)
            px[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
            px[..., 1] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
            px[..., 2] = int(rng.randint(0, 256))
        payloads.append(jpeg_encode(px, quality=q))
        types.append("image/jpeg")
        mids.append(i)
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    }, schema=MEDIA_SCHEMA)


def gif_pattern_pixels(i: int) -> np.ndarray:
    """Closed-form pixel pattern for synth GIF #i — every value is pure
    integer arithmetic in (i, row, col[, channel]) so an ANSI-SQL oracle
    can re-derive the expected decoded raster with generate_series (GIF
    LZW is lossless, so decode(encode(pattern)) must equal the pattern
    exactly; the SQL states the pattern, the Ray side decodes real LZW
    bytes, and any codec defect breaks the hash)."""
    h = 5 + (i * 7) % 29
    w = 5 + (i * 11) % 31
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    if i % 2 == 0:
        # grayscale gradient: (a*r + b*c + d) % 256
        a, b, d = 1 + i % 5, 1 + i % 7, (i * 13) % 256
        return ((a * r + b * c + d) % 256).astype(np.uint8)
    # paletted RGB: K distinct colors, index m = (r + 3c + i) % K
    k = 7 + i % 9
    m = (r + 3 * c + i) % k
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = (m * 37 + i) % 256
    px[:, :, 1] = (m * 59 + 2 * i) % 256
    px[:, :, 2] = (m * 83 + 3 * i) % 256
    return px


def synth_gif_media_table(n: int = 30) -> pa.Table:
    """Deterministic table of GENUINE GIF89a payloads (stages/gif.py
    encoder) over the closed-form patterns above: gray and paletted RGB,
    every third image written in 4-pass interlaced row order so the
    decode path's deinterlacer is on the verified path."""
    from horus_ner_ray.stages.gif import gif_encode

    mids, types, payloads, ws, hs = [], [], [], [], []
    for i in range(n):
        px = gif_pattern_pixels(i)
        payloads.append(gif_encode(px, interlace=(i % 3 == 0)))
        types.append("image/gif")
        mids.append(i)
        hs.append(px.shape[0])
        ws.append(px.shape[1])
    return pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    }, schema=MEDIA_SCHEMA)


class DecodePixelStats:
    """Actor-pool stage: REAL image decode -> exact integer pixel stats
    per media row: sample count, 16-bin intensity histogram, and the
    position-weighted sum ``sum(value * (flat_index + 1))`` — the weight
    pins every sample to its exact raster position, so row-order defects
    (e.g. a broken deinterlacer) change the answer even though the
    histogram alone would not."""

    def __init__(self):
        from horus_ner_ray.stages.media_codecs import decode_image

        self._decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_px, wsum = [], []
        hist = np.zeros((len(batch), 16), dtype=np.int64)
        for j, p in enumerate(batch["payload"]):
            flat = self._decode(p.as_py()).reshape(-1).astype(np.int64)
            n_px.append(len(flat))
            wsum.append(int(np.dot(flat, np.arange(1, len(flat) + 1, dtype=np.int64))))
            hist[j] = np.bincount(flat // 16, minlength=16)[:16]
        out = {"media_id": batch["media_id"],
               "n_px": pa.array(n_px, pa.int64()),
               "wsum": pa.array(wsum, pa.int64())}
        for b in range(16):
            out[f"h{b:02d}"] = pa.array(hist[:, b], pa.int64())
        return pa.table(out)


def decode_pixel_stats_dataset(media_ds, batch_size: int = 64,
                               concurrency: int = 2):
    from horus_ner_ray.util import worker_runtime_env

    return media_ds.select_columns(["media_id", "payload"]).map_batches(
        DecodePixelStats, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1,
        runtime_env=worker_runtime_env(),
    )


def audio_features_batch(batch: pa.Table, payload_col: str = "payload",
                         id_col: str = "media_id") -> pa.Table:
    """REAL WAV/PCM feature extraction (stdlib wave + numpy): sample rate,
    channel/sample counts, e6-int duration/RMS/peak.  Non-WAV rows emit
    zeros with ok=false (row error handling, SURVEY.md M11)."""
    from horus_ner_ray.stages.media_codecs import wav_features

    keys = ["sample_rate", "n_channels", "n_samples", "duration_e6",
            "rms_e6", "peak_e6"]
    cols: dict[str, list] = {k: [] for k in keys}
    ok = []
    for p in batch[payload_col]:
        try:
            f = wav_features(p.as_py() or b"")
            ok.append(True)
        except Exception:
            f = {k: 0 for k in keys}
            ok.append(False)
        for k in keys:
            cols[k].append(f[k])
    return pa.table({
        id_col: batch[id_col],
        **{k: pa.array(cols[k], pa.int64()) for k in keys},
        "ok": pa.array(ok, pa.bool_()),
    })


def audio_features_dataset(media_ds, payload_col: str = "payload",
                           id_col: str = "media_id", batch_size: int = 64):
    from horus_ner_ray.util import worker_runtime_env

    return media_ds.map_batches(
        lambda b: audio_features_batch(b, payload_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
        runtime_env=worker_runtime_env(),
    )


def decode_features_dataset(media_ds, decoder: str = "fake", concurrency: int = 2,
                            batch_size: int = 64):
    from horus_ner_ray.util import worker_runtime_env

    return media_ds.map_batches(
        MediaDecodeFeatures,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        runtime_env=worker_runtime_env(),
    )


def animated_gif_frame_pixels(i: int, f: int) -> np.ndarray:
    """Closed-form GRAY pixel pattern for frame ``f`` of synth animated
    GIF #i — pure integer arithmetic in (i, f, row, col) so the SQL
    oracle re-derives every sampled frame with generate_series (GIF LZW
    is lossless; the Ray side decodes the real bytes)."""
    h = 5 + (i * 7) % 13
    w = 5 + (i * 11) % 17
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    a, b = 1 + i % 5, 1 + i % 7
    return (((a * r + b * c) + 17 * f + 13 * i) % 256).astype(np.uint8)


def synth_animated_gif_table(n: int = 20) -> pa.Table:
    """Deterministic table of GENUINE animated GIF89a payloads
    (stages/gif.gif_encode_animation): 2 + i%4 full-canvas frames per
    media over the closed-form patterns above, every third animation
    interlaced so the per-frame deinterlacer is on the verified path."""
    from horus_ner_ray.stages.gif import gif_encode_animation

    mids, types, payloads, ws, hs = [], [], [], [], []
    for i in range(n):
        frames = [animated_gif_frame_pixels(i, f)
                  for f in range(2 + i % 4)]
        payloads.append(gif_encode_animation(frames,
                                             interlace=(i % 3 == 0)))
        types.append("image/gif")
        mids.append(i)
        hs.append(frames[0].shape[0])
        ws.append(frames[0].shape[1])
    return pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    }, schema=MEDIA_SCHEMA)


class FrameSampleStats:
    """Actor-pool stage: REAL animated-GIF decode -> every ``k``-th
    frame's exact integer stats (the brief's frame-sample op): per kept
    frame (media_id, frame_idx, n_px, vsum, wsum) — the position-
    weighted sum pins every sample to its raster slot, so deinterlace /
    frame-order defects break the hash.  Decoder loads once per actor."""

    def __init__(self, every_k: int = 2):
        from horus_ner_ray.stages.gif import gif_decode_frames

        self._decode = gif_decode_frames
        self._k = int(every_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, n_px, vsum, wsum = [], [], [], [], []
        for mid, p in zip(batch["media_id"], batch["payload"]):
            frames = self._decode(p.as_py())
            for f, arr in enumerate(frames):
                if f % self._k:
                    continue
                flat = arr.reshape(-1).astype(np.int64)
                mids.append(mid.as_py())
                fidx.append(f)
                n_px.append(len(flat))
                vsum.append(int(flat.sum()))
                wsum.append(int(np.dot(
                    flat, np.arange(1, len(flat) + 1, dtype=np.int64))))
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "n_px": pa.array(n_px, pa.int64()),
            "vsum": pa.array(vsum, pa.int64()),
            "wsum": pa.array(wsum, pa.int64()),
        })


def frame_sample_stats_dataset(media_ds, every_k: int = 2,
                               batch_size: int = 64, concurrency: int = 2):
    from horus_ner_ray.util import worker_runtime_env

    return media_ds.select_columns(["media_id", "payload"]).map_batches(
        FrameSampleStats, fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1,
        runtime_env=worker_runtime_env(),
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with metadata
columns alongside (media_type, width/height or sample_rate, byte length).
The Ray-side plumbing — schema, small-batch actor-pool stages, output
layout — is real and tested; the codec itself is STUBBED (no image/audio
libraries in this container): ``decoder="fake"`` is a deterministic,
seedable stand-in; ``decoder="real"`` raises NotImplementedError at the
exact seam where Pillow/soundfile/pyav would plug in.

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
            raise NotImplementedError(
                "real image decode requires Pillow/opencv (not in this "
                "container); plug decode-to-ndarray here"
            )
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
            raise NotImplementedError("real resize requires Pillow/opencv")
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
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
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

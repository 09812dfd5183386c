"""Stdlib media codecs: byte-exact PNG/BMP round-trips (every scanline
filter), WAV PCM features, and the real-decoder multimodal stages."""

import numpy as np
import pyarrow as pa
import pytest

from horus_ner_ray.stages.media_codecs import (
    bmp_decode,
    bmp_encode,
    decode_image,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
    wav_features,
)


def _px(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 else a


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_each_filter(filt, ch):
    px = _px(11, 7, ch, seed=filt * 10 + ch)
    assert np.array_equal(png_decode(png_encode(px, row_filters=filt)), px)


def test_png_roundtrip_mixed_filters_exact():
    rng = np.random.RandomState(3)
    px = _px(64, 33, 3, seed=9)
    filt = rng.randint(0, 5, size=64)
    assert np.array_equal(png_decode(png_encode(px, row_filters=filt)), px)


def test_png_known_bytes():
    """Decode a hand-assembled 2x2 gray PNG byte-for-byte (no encoder in
    the loop): pixels [[1,2],[3,4]], filter 0 rows."""
    import struct
    import zlib

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 1, 2, 0, 3, 4])
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert np.array_equal(png_decode(data), np.array([[1, 2], [3, 4]], np.uint8))


def test_paeth_matches_spec_reference():
    from horus_ner_ray.stages.media_codecs import _paeth

    def ref(a, b, c):
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb and pa_ <= pc:
            return a
        return b if pb <= pc else c

    rng = np.random.RandomState(0)
    for _ in range(500):
        a, b, c = (int(x) for x in rng.randint(0, 256, 3))
        got = _paeth(np.array([a], np.uint8), np.array([b], np.uint8),
                     np.array([c], np.uint8))
        assert int(got[0]) == ref(a, b, c)


def test_png_rejects_unsupported():
    px = _px(4, 4, 3, seed=1)
    good = png_encode(px)
    with pytest.raises(ValueError):
        png_decode(b"nope" + good)
    # 16-bit depth flag
    bad = bytearray(good)
    bad[24] = 16  # depth byte inside IHDR
    with pytest.raises(ValueError):
        png_decode(bytes(bad))


@pytest.mark.parametrize("w", [3, 4, 5, 6])  # exercises all paddings
def test_bmp_roundtrip_padding(w):
    px = _px(5, w, 3, seed=w)
    assert np.array_equal(bmp_decode(bmp_encode(px)), px)


def test_decode_image_sniffs_both():
    px = _px(6, 6, 3, seed=2)
    assert np.array_equal(decode_image(png_encode(px)), px)
    assert np.array_equal(decode_image(bmp_encode(px)), px)
    with pytest.raises(ValueError):
        decode_image(b"\x00junk")


def test_wav_roundtrip_and_features():
    sr = 16000
    t = np.arange(sr // 10) / sr  # 100 ms
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    data = wav_encode(x, sr)
    y, sr2 = wav_decode(data)
    assert sr2 == sr and y.shape == (len(t), 1)
    # 16-bit quantization error bound
    assert np.max(np.abs(y[:, 0] - x)) < 1.0 / 32000
    f = wav_features(data)
    assert f["sample_rate"] == sr and f["n_samples"] == len(t)
    assert f["duration_e6"] == 100000
    # sine RMS = amp/sqrt(2) ~ 0.3536
    assert abs(f["rms_e6"] - 353553) < 2000
    assert abs(f["peak_e6"] - 500000) < 1000


def test_real_decode_features_stage(ray_session):
    """media_features over GENUINE containers: the 16-bin histogram must
    equal the histogram of the locally-decoded pixels (real decode, not a
    byte-level stand-in)."""
    import ray.data as rd

    from horus_ner_ray.stages.multimodal import (
        decode_features_dataset,
        synth_real_media_table,
    )

    tbl = synth_real_media_table(n=24, seed=5)
    imgs = tbl.filter(pa.compute.not_equal(tbl["media_type"], "audio/wav"))
    out = (decode_features_dataset(rd.from_arrow(imgs), decoder="real",
                                   concurrency=2, batch_size=8)
           .to_pandas().set_index("media_id"))
    assert len(out) == len(imgs)
    for mid, payload in zip(imgs["media_id"], imgs["payload"]):
        px = decode_image(payload.as_py()).reshape(-1)
        want = np.bincount(px.astype(np.int64) // 16, minlength=16)[:16] / len(px)
        got = np.array(out.loc[mid.as_py(), "features"])
        assert np.allclose(got, want)


def test_real_resize_stage(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.multimodal import MediaResize, synth_real_media_table

    tbl = synth_real_media_table(n=24, seed=5)
    imgs = tbl.filter(pa.compute.not_equal(tbl["media_type"], "audio/wav"))
    out = (rd.from_arrow(imgs)
           .map_batches(MediaResize, fn_constructor_kwargs={
               "target_w": 8, "target_h": 8, "decoder": "real"},
               batch_format="pyarrow", batch_size=8, concurrency=2)
           .to_pandas())
    assert (out["media_type"] == "image/png").all()
    for _, r in out.iterrows():
        px = png_decode(r["payload"])
        assert px.shape[:2] == (8, 8)


def test_audio_features_stage(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.multimodal import (
        audio_features_dataset,
        synth_real_media_table,
    )

    tbl = synth_real_media_table(n=24, seed=5)
    out = audio_features_dataset(rd.from_arrow(tbl)).to_pandas()
    is_wav = tbl["media_type"].to_pandas() == "audio/wav"
    got = out.set_index("media_id").loc[tbl["media_id"].to_pandas()]
    assert (got["ok"].to_numpy() == is_wav.to_numpy()).all()
    wavs = got[got["ok"]]
    assert (wavs["sample_rate"] > 0).all() and (wavs["rms_e6"] > 0).all()


# --- property-based fuzz (hypothesis) --------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    fseed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, seed, fseed):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    if ch == 1:
        px = px[:, :, 0]
    filt = np.random.RandomState(fseed).randint(0, 5, size=h)
    assert np.array_equal(png_decode(png_encode(px, row_filters=filt)), px)


@settings(max_examples=40, deadline=None)
@given(h=st.integers(1, 16), w=st.integers(1, 16), seed=st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3),
                                              dtype=np.uint8)
    assert np.array_equal(bmp_decode(bmp_encode(px)), px)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_codecs_reject_junk_loudly(data):
    """Arbitrary bytes must raise a clean error (or decode, for the
    vanishingly unlikely valid container) — never hang or corrupt."""
    import zlib

    for fn in (png_decode, bmp_decode, wav_decode):
        try:
            fn(data)
        except (ValueError, zlib.error, EOFError, Exception) as e:
            # stdlib wave raises wave.Error (subclass of Exception); the
            # contract is: SOME exception, raised promptly
            assert e is not None


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 4000),
    sr=st.sampled_from([8000, 16000, 44100]),
    nch=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, sr, nch, seed):
    x = np.random.RandomState(seed).uniform(-1, 1, size=(n, nch))
    y, sr2 = wav_decode(wav_encode(x, sr))
    assert sr2 == sr and y.shape == (n, nch)
    assert np.max(np.abs(y - x)) < 1.0 / 32000

"""GIF LZW codec tests (stages/gif.py).

GIF is lossless, so unlike JPEG these pin FULL pixel-exact round trips.
The decoder's code-width schedule is additionally pinned by a hand-derived
spec vector assembled from first principles (not by lzw_encode), so an
encoder+decoder pair that was self-consistent but off-spec would fail.
"""

import numpy as np
import pytest

from horus_ner_ray.stages.gif import (
    _interlace_order,
    gif_decode,
    gif_encode,
    lzw_decode,
    lzw_encode,
)
from horus_ner_ray.stages.media_codecs import decode_image


def test_lzw_hand_derived_spec_vector():
    # mcs=2: clear=4, eoi=5, width 3.  Indices [1,1,1] compress to codes
    # [CLEAR=4, 1, 6, 5] (6 = KwKwK of the (1,1) entry); packed LSB-first:
    # 4 | 1<<3 | 6<<6 | 5<<9 = 0x0B8C -> bytes 8C 0B.  Derived by hand from
    # the GIF89a spec, independent of lzw_encode.
    assert lzw_encode(np.array([1, 1, 1], np.uint8), 2) == b"\x8c\x0b"
    assert np.array_equal(lzw_decode(b"\x8c\x0b", 2), np.array([1, 1, 1], np.uint8))


@pytest.mark.parametrize("mcs", [2, 4, 8])
@pytest.mark.parametrize("n", [1, 5, 300, 5000, 60000])
def test_lzw_roundtrip_random(mcs, n):
    # 60000 symbols at mcs=8 crosses every width bump (9->12) AND the
    # 4096-entry dictionary-full clear/reset path
    rng = np.random.RandomState(mcs * 1000 + n)
    idx = rng.randint(0, 1 << mcs, size=n).astype(np.uint8)
    enc = lzw_encode(idx, mcs)
    assert np.array_equal(lzw_decode(enc, mcs, expected=n), idx)
    assert np.array_equal(lzw_decode(enc, mcs), idx)  # EOI-terminated path


def test_lzw_kwkwk_repetition():
    idx = np.tile(np.array([1, 1, 1, 1, 2, 1, 1], np.uint8), 4000)
    assert np.array_equal(lzw_decode(lzw_encode(idx, 2), 2), idx)


def test_lzw_compresses_repetitive_data():
    idx = np.zeros(10000, np.uint8)
    assert len(lzw_encode(idx, 8)) < 600  # ~sqrt growth on constant input


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (17, 31), (64, 64)])
@pytest.mark.parametrize("interlace", [False, True])
def test_gray_roundtrip(shape, interlace):
    rng = np.random.RandomState(hash(shape) % 2**31)
    px = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = gif_decode(gif_encode(px, interlace=interlace))
    assert out.shape == shape and np.array_equal(out, px)


@pytest.mark.parametrize("interlace", [False, True])
def test_rgb_roundtrip_limited_palette(interlace):
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, size=(200, 3), dtype=np.uint8)
    px = pal[rng.randint(0, 200, size=(23, 37))]
    out = gif_decode(gif_encode(px, interlace=interlace))
    assert out.shape == (23, 37, 3) and np.array_equal(out, px)


def test_interlace_order_is_a_permutation():
    for h in (1, 2, 7, 8, 9, 64):
        order = _interlace_order(h)
        assert sorted(order.tolist()) == list(range(h))


def test_interlaced_bytes_differ_but_decode_identically():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    seq, il = gif_encode(px), gif_encode(px, interlace=True)
    assert seq != il
    assert np.array_equal(gif_decode(seq), gif_decode(il))


def test_gray_palette_collapses_to_2d_rgb_stays_3d():
    g = np.full((4, 6), 77, np.uint8)
    assert gif_decode(gif_encode(g)).ndim == 2
    c = np.zeros((4, 6, 3), np.uint8)
    c[0, 0] = (1, 2, 3)
    assert gif_decode(gif_encode(c)).ndim == 3


def test_encode_scope_raises():
    with pytest.raises(ValueError):  # >256 distinct colors
        a = np.zeros((16, 17, 3), np.uint8)
        a[:, :, 0] = np.arange(16, dtype=np.uint8)[:, None]
        a[:, :, 1] = np.arange(17, dtype=np.uint8)[None, :]
        gif_encode(a)
    with pytest.raises(ValueError):  # wrong dtype
        gif_encode(np.zeros((4, 4), np.float64))
    with pytest.raises(ValueError):  # zero-size
        gif_encode(np.zeros((0, 4), np.uint8))


def _descriptor_offset(gif: bytes) -> int:
    # 13-byte header, then the global color table (0x2C also occurs as a
    # palette VALUE, so compute the offset instead of searching for it)
    assert gif[10] & 0x80
    return 13 + 3 * (2 << (gif[10] & 0x07))


def test_decode_scope_raises():
    with pytest.raises(ValueError):
        gif_decode(b"NOTGIF" + bytes(20))
    good = gif_encode(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):  # truncated stream
        gif_decode(good[: len(good) // 2])
    # partial-canvas frame: patch the image descriptor's left offset
    bad = bytearray(good)
    desc = _descriptor_offset(good)
    assert bad[desc] == 0x2C
    bad[desc + 1] = 1
    with pytest.raises(ValueError):
        gif_decode(bytes(bad))


def test_decode_image_dispatches_gif():
    px = np.arange(48, dtype=np.uint8).reshape(6, 8) * 5
    assert np.array_equal(decode_image(gif_encode(px)), px)


def test_extensions_are_skipped():
    # splice a Graphic Control Extension between the color table and the
    # image descriptor — decoders must skip unknown/control extensions
    px = np.arange(30, dtype=np.uint8).reshape(5, 6) * 7
    raw = bytearray(gif_encode(px))
    desc = _descriptor_offset(bytes(raw))
    assert raw[desc] == 0x2C
    gce = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0x00])
    patched = bytes(raw[:desc]) + gce + bytes(raw[desc:])
    assert np.array_equal(gif_decode(patched), px)


def test_synth_table_matches_closed_form_pattern():
    from horus_ner_ray.stages.multimodal import (
        DecodePixelStats,
        gif_pattern_pixels,
        synth_gif_media_table,
    )

    t = synth_gif_media_table(12)
    st = DecodePixelStats()(t)
    for i in range(12):
        flat = gif_pattern_pixels(i).reshape(-1).astype(np.int64)
        assert st["n_px"][i].as_py() == len(flat)
        assert st["wsum"][i].as_py() == int(
            np.dot(flat, np.arange(1, len(flat) + 1, dtype=np.int64)))
        hist = np.bincount(flat // 16, minlength=16)
        assert [st[f"h{b:02d}"][i].as_py() for b in range(16)] == hist.tolist()


def test_encode_bytes_are_pinned():
    # byte-stability regression: shard-style determinism for the synth table
    import hashlib

    from horus_ner_ray.stages.multimodal import synth_gif_media_table

    h = hashlib.sha256()
    for p in synth_gif_media_table(30)["payload"].to_pylist():
        h.update(p)
    assert h.hexdigest() == (
        "6035a62fb88f95aa9809291d2579366b7de30534667ecfc9e0fd3a7048257af9")


def test_animated_gif_roundtrip():
    import numpy as np

    from horus_ner_ray.stages.gif import (gif_decode, gif_decode_frames,
                                          gif_encode_animation)

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (9, 7)).astype(np.uint8)
              for _ in range(4)]
    data = gif_encode_animation(frames)
    back = gif_decode_frames(data)
    assert len(back) == 4
    assert all(np.array_equal(a, b) for a, b in zip(frames, back))
    # the single-frame decoder sees frame 0 of an animation
    assert np.array_equal(gif_decode(data), frames[0])
    # RGB + interlace path
    fr = [rng.integers(0, 5, (6, 8, 3)).astype(np.uint8) * 40
          for _ in range(3)]
    b2 = gif_decode_frames(gif_encode_animation(fr, interlace=True))
    assert all(np.array_equal(x, y) for x, y in zip(fr, b2))
    # mixed dims refuse
    try:
        gif_encode_animation([frames[0], frames[0][:5]])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "share dims" in str(e)


def test_frame_sample_stats(ray_session):
    import numpy as np
    import ray.data as rd

    from horus_ner_ray.stages.multimodal import (
        animated_gif_frame_pixels,
        frame_sample_stats_dataset,
        synth_animated_gif_table,
    )

    ds = rd.from_arrow(synth_animated_gif_table(n=8))
    out = (frame_sample_stats_dataset(ds, every_k=2).to_pandas()
           .sort_values(["media_id", "frame_idx"]).reset_index(drop=True))
    for _, r in out.iterrows():
        assert r["frame_idx"] % 2 == 0
        px = animated_gif_frame_pixels(int(r["media_id"]),
                                       int(r["frame_idx"]))
        flat = px.reshape(-1).astype(np.int64)
        assert r["n_px"] == len(flat)
        assert r["vsum"] == flat.sum()
        assert r["wsum"] == int(np.dot(
            flat, np.arange(1, len(flat) + 1, dtype=np.int64)))
    # every media contributes ceil(nf / 2) sampled frames
    want = sum((2 + i % 4 + 1) // 2 for i in range(8))
    assert len(out) == want

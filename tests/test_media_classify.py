"""Trained classifier over decoded media content (stages/media_classify.py;
reference A4 residual: sift.py:7-37 / cnn.py:71-159 score image CONTENT
with learned models).  Pins: the NB model separates the four synthetic
intensity classes perfectly on real decoded PNG/BMP pixels, predictions
are deterministic, and the fit matches a hand-computed model on a tiny
fixture."""

import numpy as np
import pyarrow as pa
import pytest

from horus_ner_ray.stages.media_classify import (
    BIN_TERMS,
    N_BINS,
    MediaHistFeatures,
    fit_media_nb,
    media_nb_predictions,
    synth_labeled_media_table,
)


def test_hist_features_match_direct_decode():
    from horus_ner_ray.stages.media_codecs import decode_image

    t = synth_labeled_media_table(n=12, seed=3)
    out = MediaHistFeatures()(t)
    hists = np.asarray(out["hist"].combine_chunks().flatten(),
                       dtype=np.int64).reshape(len(t), N_BINS)
    for i in range(len(t)):
        px = decode_image(t["payload"][i].as_py()).reshape(-1)
        want = np.bincount(px.astype(np.int64) >> 4, minlength=16)[:16]
        np.testing.assert_array_equal(hists[i], want)
        assert out["n_px"][i].as_py() == len(px)


def test_training_accuracy_and_determinism(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.from_arrow(synth_labeled_media_table(n=96, seed=42))
    a = media_nb_predictions(ds, checkpoint_dir=tmp_path / "a").to_pandas()
    a = a.sort_values("media_id").reset_index(drop=True)
    # four well-separated intensity classes -> exact training accuracy
    assert (a["pred_label"] == a["label"]).all()
    assert set(a["label"]) == {"banded", "bright", "dark", "flat"}
    b = media_nb_predictions(ds, checkpoint_dir=tmp_path / "b").to_pandas()
    b = b.sort_values("media_id").reset_index(drop=True)
    assert a[["media_id", "pred_label", "score_e9"]].equals(
        b[["media_id", "pred_label", "score_e9"]])


def test_fit_matches_hand_model(ray_session):
    """Two docs, two classes, two bins: weights equal the closed form."""
    import ray.data as rd

    hist = np.zeros((2, N_BINS), dtype=np.int64)
    hist[0, 0] = 3  # class x: 3 px in bin 0
    hist[1, 1] = 5  # class y: 5 px in bin 1
    feats = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "label": pa.array(["x", "y"], pa.string()),
        "hist": pa.FixedSizeListArray.from_arrays(
            pa.array(hist.reshape(-1), pa.int64()), N_BINS),
        "n_px": pa.array([3, 5], pa.int64()),
    })
    m = fit_media_nb(rd.from_arrow(feats))
    assert list(m.classes) == ["x", "y"]
    assert list(m.terms) == ["b00", "b01"]
    e9 = lambda x: int(np.floor(np.log(x) * 1e9 + 0.5))
    # V=2; class x total=3, class y total=5; alpha=1
    assert m.llh_e9[0, 0] == e9(4 / 5)   # (3+1)/(3+2)
    assert m.llh_e9[1, 0] == e9(1 / 5)   # unseen b01 in x
    assert m.llh_e9[1, 1] == e9(6 / 7)   # (5+1)/(5+2)
    assert m.default_e9[0] == e9(1 / 5)
    assert m.priors_e9[0] == e9(0.5)


def test_unlabeled_rows_score_without_label_column(ray_session, tmp_path):
    """Scoring path tolerates corpora where labels exist only on the fit
    rows is out of scope — but the feature stage must run label-free."""
    import ray.data as rd

    t = synth_labeled_media_table(n=8, seed=1).drop_columns(["label"])
    from horus_ner_ray.stages.media_classify import media_hist_dataset

    out = media_hist_dataset(rd.from_arrow(t)).to_pandas()
    assert len(out) == 8 and "label" not in out.columns
    assert (np.stack(out["hist"]).sum(axis=1) == out["n_px"].to_numpy()).all()

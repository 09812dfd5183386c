"""k-fold NB cross-validation (stages/crossval.py): fold assignment,
leakage (per-fold model must equal a fit over exactly the complement),
union completeness, accuracy tail."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from horus_ner_ray.stages.classify import fit_multinomial_nb, nb_score_dataset
from horus_ner_ray.stages.crossval import (
    assign_folds,
    cv_fold_accuracy,
    nb_cross_val,
)
from horus_ner_ray.stages.sketches import splitmix64


def _docs(n=240, seed=6):
    rng = np.random.RandomState(seed)
    langs = ["en", "de", "fr"]
    vocab = {"en": ["the", "cat", "sat"], "de": ["der", "katze", "sass"],
             "fr": ["le", "chat", "assis"]}
    rows = []
    for i in range(n):
        lg = langs[i % 3]
        words = list(rng.choice(vocab[lg] + ["shared"], 8))
        rows.append({"doc_id": i, "lang": lg, "text": " ".join(words)})
    return pd.DataFrame(rows)


def test_fold_assignment_rule(ray_session):
    df = _docs()
    out = assign_folds(rd.from_pandas(df), 3, seed=17).to_pandas()
    want = (splitmix64(df["doc_id"].to_numpy(np.uint64) ^ np.uint64(17))
            % np.uint64(3)).astype(np.int64)
    assert out.sort_values("doc_id")["fold"].tolist() == want.tolist()
    with pytest.raises(ValueError):
        assign_folds(rd.from_pandas(df), 1)


def test_out_of_fold_predictions_no_leakage(ray_session):
    """Every row is predicted exactly once, by the model fit on its
    complement: fold-f rows must match a manual complement fit."""
    df = _docs()
    cv = nb_cross_val(rd.from_pandas(df), k_folds=3, seed=17).to_pandas()
    assert sorted(cv["doc_id"]) == sorted(df["doc_id"])
    folds = (splitmix64(df["doc_id"].to_numpy(np.uint64) ^ np.uint64(17))
             % np.uint64(3)).astype(np.int64)
    df = df.assign(fold=folds)
    for f in range(3):
        train = df[df["fold"] != f]
        test = df[df["fold"] == f]
        model = fit_multinomial_nb(rd.from_pandas(train))
        want = nb_score_dataset(rd.from_pandas(test), model,
                                keep_cols=["doc_id"]).to_pandas()
        got = cv[cv["fold"] == f]
        m = want.merge(got, on="doc_id", suffixes=("_w", "_g"))
        assert len(m) == len(test)
        assert (m["pred_label_w"] == m["pred_label_g"]).all()
        assert (m["score_e9_w"] == m["score_e9_g"]).all()


def test_accuracy_tail(ray_session):
    df = _docs()
    cv = nb_cross_val(rd.from_pandas(df), k_folds=3, seed=17).to_pandas()
    acc = cv_fold_accuracy(cv)
    assert set(acc["fold"]) == {0, 1, 2, -1}
    pooled = acc[acc["fold"] == -1].iloc[0]
    assert pooled["n"] == len(df)
    assert pooled["n_correct"] == acc[acc["fold"] >= 0]["n_correct"].sum()
    # the dialects are near-separable: out-of-fold accuracy must be high
    assert pooled["n_correct"] / pooled["n"] > 0.9

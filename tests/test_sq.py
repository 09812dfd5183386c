"""Scalar-quantization ANN (stages/sq.py): quantization rule, exact
integer distances, tie handling, partitioning invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from horus_ner_ray.stages.sq import sq_ann, sq_encode, sq_fit


def _emb_frame(n=300, d=16, seed=2):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(rng.randn(n, d).astype(np.float32)),
    })


def test_encode_rule():
    mins = np.array([0.0, -1.0, 5.0])
    maxs = np.array([1.0, 1.0, 5.0])  # last dim constant
    m = np.array([[0.0, -1.0, 5.0], [1.0, 1.0, 5.0], [0.5, 0.0, 5.0],
                  [2.0, -3.0, 5.0]])  # out-of-range rows clamp
    c = sq_encode(m, mins, maxs)
    assert c.dtype == np.int64
    assert c[0].tolist() == [0, 0, 0]
    assert c[1].tolist() == [255, 255, 0]
    assert c[2].tolist() == [128, 128, 0]  # floor(127.5+0.5)=128
    assert c[3].tolist() == [255, 0, 0]


def test_fit_bounds_and_reuse(ray_session):
    df = _emb_frame()
    ds = rd.from_pandas(df)
    mins, maxs = sq_fit(ds)
    mat = np.stack(df["embedding"]).astype(np.float64)
    assert np.array_equal(mins, mat.min(axis=0))
    assert np.array_equal(maxs, mat.max(axis=0))
    q = df.head(3)
    a = sq_ann(ds, q["vec_id"].to_numpy(), np.stack(q["embedding"]),
               k=7, fit=(mins, maxs))
    b = sq_ann(ds, q["vec_id"].to_numpy(), np.stack(q["embedding"]), k=7)
    pd.testing.assert_frame_equal(a, b)
    # each query's own vector is its nearest code (dist 0 at rank 1)
    top1 = a[a["rank"] == 1]
    assert (top1["query_id"].to_numpy() == top1["vec_id"].to_numpy()).all()
    assert (top1["dist"] == 0).all()


def test_matches_local_reference(ray_session):
    df = _emb_frame(seed=7)
    ds = rd.from_pandas(df).repartition(5)
    mat = np.stack(df["embedding"]).astype(np.float64)
    mins, maxs = mat.min(axis=0), mat.max(axis=0)
    codes = sq_encode(mat, mins, maxs)
    q = df.head(4)
    got = sq_ann(ds, q["vec_id"].to_numpy(), np.stack(q["embedding"]), k=9)
    for qid in range(4):
        d2 = ((codes[qid][None, :] - codes) ** 2).sum(axis=1)
        order = np.lexsort((df["vec_id"].to_numpy(), d2))[:9]
        g = got[got["query_id"] == qid]
        assert g["vec_id"].tolist() == df["vec_id"].to_numpy()[order].tolist()
        assert g["dist"].tolist() == d2[order].tolist()


def test_k_validation(ray_session):
    ds = rd.from_pandas(_emb_frame(50))
    with pytest.raises(ValueError):
        sq_ann(ds, np.array([0]), np.zeros((1, 16)), k=0)

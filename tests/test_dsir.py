"""DSIR importance resampling (stages/dsir.py): model fit, weight
semantics, partitioning invariance, and the fused one-pass path."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from horus_ner_ray.stages.dsir import (
    bucket_counts,
    bucket_counts_split,
    dsir_select,
    dsir_weights,
    gumbel_topk,
    log_ratio_table,
)


@pytest.fixture(scope="module")
def pool(ray_session):
    rng = np.random.RandomState(5)
    # target dialect: heavy "alpha beta"; background: heavy "gamma delta"
    rows = []
    for i in range(200):
        is_t = i % 4 == 0
        vocab = (["alpha", "beta", "shared"] if is_t
                 else ["gamma", "delta", "shared"])
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, 12)),
                     "is_target": is_t})
    return pd.DataFrame(rows)


def test_fused_equals_two_pass(pool):
    ds = rd.from_pandas(pool)
    tc, tn, rc, rn = bucket_counts_split(ds, "is_target", n_buckets=8)
    tgt = rd.from_pandas(pool[pool["is_target"]])
    tc2, tn2 = bucket_counts(tgt, n_buckets=8)
    rc2, rn2 = bucket_counts(ds, n_buckets=8)
    assert (tc == tc2).all() and tn == tn2
    assert (rc == rc2).all() and rn == rn2


def test_weights_prefer_target_dialect(pool):
    ds = rd.from_pandas(pool)
    tc, tn, rc, rn = bucket_counts_split(ds, "is_target", n_buckets=8)
    lr = log_ratio_table(tc, tn, rc, rn)
    w = dsir_weights(ds, lr).to_pandas().set_index("doc_id")["w_e9"]
    t_mean = w[pool[pool["is_target"]]["doc_id"]].mean()
    b_mean = w[pool[~pool["is_target"]]["doc_id"]].mean()
    assert t_mean > b_mean > -np.inf


def test_partitioning_invariance(pool):
    one = rd.from_pandas(pool)
    many = rd.from_pandas(pool).repartition(7)
    a = dsir_select(one, k=20, n_buckets=8, seed=3,
                    target_mask_col="is_target")
    b = dsir_select(many, k=20, n_buckets=8, seed=3,
                    target_mask_col="is_target")
    pd.testing.assert_frame_equal(a, b)


def test_selection_enriches_target(pool):
    ds = rd.from_pandas(pool)
    sel = dsir_select(ds, k=30, n_buckets=8, seed=11,
                      target_mask_col="is_target")
    assert len(sel) == 30 and sel["rank"].tolist() == list(range(1, 31))
    frac = pool.set_index("doc_id").loc[sel["doc_id"], "is_target"].mean()
    assert frac > 0.25  # pool base rate; Gumbel noise keeps it stochastic


def test_gumbel_topk_k_validation(pool, ray_session):
    ds = rd.from_pandas(pool.assign(w_e9=0))
    with pytest.raises(ValueError):
        gumbel_topk(ds, k=0)

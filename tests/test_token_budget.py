"""token_budget_mix (functions/sampling.py): the histogram-refinement
selection must equal the defining window rule — per group, the maximal
(h, id)-ordered prefix with cumulative dl <= budget."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from horus_ner_ray.functions.sampling import token_budget_mix
from horus_ner_ray.stages.sketches import splitmix64


def _pool(n=400, seed=1):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "source": rng.choice([f"s{i}" for i in range(5)], n),
        "doc_id": np.arange(n, dtype=np.int64),
        "dl": rng.randint(1, 120, n).astype(np.int64),
    })


def _reference(df, budget, seed):
    out = []
    h = splitmix64(df["doc_id"].to_numpy(np.uint64) ^ np.uint64(seed))
    df = df.assign(h=h)
    for g, gdf in df.groupby("source"):
        bud = budget.get(g, 0) if isinstance(budget, dict) else budget
        gdf = gdf.sort_values(["h", "doc_id"])
        out.append(gdf[gdf["dl"].cumsum() <= bud])
    return (pd.concat(out)[["source", "doc_id", "dl"]]
            .sort_values(["source", "doc_id"]).reset_index(drop=True))


def _run(df, budget, seed=9, n_buckets=16, parts=1):
    ds = rd.from_pandas(df)
    if parts > 1:
        ds = ds.repartition(parts)
    got = token_budget_mix(ds, "source", "doc_id", "dl", budget,
                           seed=seed, n_buckets=n_buckets).to_pandas()
    if len(got) == 0:  # all-empty match sets drop their blocks (repo gotcha)
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "dl": pd.Series([], dtype=np.int64)})
    return (got[["source", "doc_id", "dl"]]
            .sort_values(["source", "doc_id"]).reset_index(drop=True))


@pytest.mark.parametrize("budget", [0, 37, 500, 10**9])
def test_matches_window_rule(ray_session, budget):
    df = _pool()
    pd.testing.assert_frame_equal(_run(df, budget),
                                  _reference(df, budget, 9))


def test_boundary_bucket_nothing_fits(ray_session):
    # big docs + tiny bucket count force the crossing row not to fit:
    # earlier buckets must still be fully selected (the src0 regression)
    df = _pool(seed=3)
    df["dl"] = df["dl"] * 50
    for budget in (1000, 5000, 12345):
        pd.testing.assert_frame_equal(_run(df, budget, n_buckets=2),
                                      _reference(df, budget, 9))


def test_dict_budgets_and_missing_group(ray_session):
    df = _pool(seed=4)
    budget = {"s0": 300, "s1": 0, "s3": 10**9}  # s2/s4 absent -> nothing
    got = _run(df, budget)
    pd.testing.assert_frame_equal(got, _reference(df, budget, 9))
    assert set(got["source"]) <= {"s0", "s3"}


def test_partitioning_invariance(ray_session):
    df = _pool(seed=5)
    pd.testing.assert_frame_equal(_run(df, 400, parts=7),
                                  _run(df, 400, parts=1))


def test_n_buckets_validation(ray_session):
    ds = rd.from_pandas(_pool())
    with pytest.raises(ValueError):
        token_budget_mix(ds, "source", "doc_id", "dl", 10, n_buckets=48)

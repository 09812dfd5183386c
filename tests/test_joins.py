"""Broadcast join/semi/anti tests vs pandas reference (SURVEY.md J1)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tables(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(4)
    big = pd.DataFrame(
        {"k": rng.randint(0, 50, 500), "v": rng.normal(size=500)}
    )
    small = pd.DataFrame(
        {"k": np.arange(0, 50, 2), "name": [f"n{i}" for i in range(0, 50, 2)]}
    )
    return rd.from_pandas(big), big, small


def test_broadcast_inner_join(tables):
    from horus_ner_ray.stages.joins import broadcast_inner_join

    ds, big, small = tables
    got = (
        broadcast_inner_join(ds, small, "k", "k")
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = big.merge(small, on="k").sort_values(["k", "v"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert (got["name"].to_numpy() == want["name"].to_numpy()).all()


def test_broadcast_semi_and_anti(tables):
    from horus_ner_ray.stages.joins import broadcast_semi_join

    ds, big, small = tables
    semi = broadcast_semi_join(ds, small["k"].to_numpy(), "k").to_pandas()
    anti = broadcast_semi_join(ds, small["k"].to_numpy(), "k", anti=True).to_pandas()
    keyset = set(small["k"])
    assert set(semi["k"]) <= keyset
    assert set(anti["k"]).isdisjoint(keyset)
    assert len(semi) + len(anti) == len(big)
    # empty key set: semi keeps nothing, anti keeps everything
    none = broadcast_semi_join(ds, np.array([], dtype=np.int64), "k").to_pandas()
    assert len(none) == 0

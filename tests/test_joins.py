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


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def _asof_reference(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Per-row Python oracle: latest right ts <= left ts per key, inner."""
    rows = []
    for _, lr in left.iterrows():
        cand = right[(right["k"] == lr["k"]) & (right["ts"] <= lr["ts"])]
        if len(cand):
            best = cand.sort_values(["ts", "rid"]).iloc[-1]
            rows.append((lr["k"], lr["ts"], lr["lid"], best["ts"], best["rid"]))
    return (
        pd.DataFrame(rows, columns=["k", "ts", "lid", "ts_r", "rid_r"])
        .astype(np.int64)
        .sort_values(["k", "ts", "lid"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def asof_frames():
    rng = np.random.RandomState(11)
    left = pd.DataFrame({
        "k": rng.randint(0, 20, 300),
        "ts": rng.randint(0, 1000, 300),
        "lid": np.arange(300),
    })
    # keys 15..19 have no right rows; include exact-tie timestamps
    right = pd.DataFrame({
        "k": rng.randint(0, 15, 200),
        "ts": rng.randint(0, 1000, 200),
        "rid": np.arange(200),
    })
    right.loc[:20, "ts"] = left.loc[:20, "ts"].to_numpy()  # exact matches
    right.loc[:20, "k"] = left.loc[:20, "k"].to_numpy() % 15
    return left, right


@pytest.mark.parametrize("n_buckets", [1, 7, 64])
def test_asof_join_matches_reference(ray_session, asof_frames, n_buckets):
    import ray.data as rd

    from horus_ner_ray.stages.joins import asof_join_dataset

    left, right = asof_frames
    got = (
        asof_join_dataset(
            rd.from_pandas(left), rd.from_pandas(right), by="k", on="ts",
            left_cols=["lid"], right_cols=["rid"], n_buckets=n_buckets,
        )
        .to_pandas()
        .astype(np.int64)
        .sort_values(["k", "ts", "lid"])
        .reset_index(drop=True)
    )
    want = _asof_reference(left, right)
    pd.testing.assert_frame_equal(
        got[["k", "ts", "lid", "ts_r", "rid_r"]].reset_index(drop=True), want
    )


def test_asof_join_empty_right(ray_session, asof_frames):
    import ray.data as rd

    from horus_ner_ray.stages.joins import asof_join_dataset

    left, right = asof_frames
    got = asof_join_dataset(
        rd.from_pandas(left), rd.from_pandas(right.iloc[0:0]), by="k", on="ts",
        left_cols=["lid"], right_cols=["rid"], n_buckets=8,
    ).to_pandas()
    assert len(got) == 0


def test_asof_join_rejects_unsafe_ints(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.joins import asof_join_dataset

    left = pd.DataFrame({"k": [1], "ts": [5], "lid": [2**53]})
    right = pd.DataFrame({"k": [1], "ts": [3], "rid": [7]})
    with pytest.raises(Exception, match="2\\^53"):
        asof_join_dataset(
            rd.from_pandas(left), rd.from_pandas(right), by="k", on="ts",
            left_cols=["lid"], right_cols=["rid"], n_buckets=4,
        ).to_pandas()


def test_interval_join_matches_reference(ray_session):
    """Point-in-interval join vs a per-row Python oracle, including points
    before/after/between intervals (dropped) and on boundaries (kept)."""
    import ray.data as rd

    from horus_ner_ray.stages.joins import interval_join_dataset

    rng = np.random.RandomState(5)
    # per key: disjoint intervals [10i+2, 10i+5]
    ivs = pd.DataFrame([
        {"k": k, "lo": 10 * i + 2, "hi": 10 * i + 5, "iv_id": 100 * k + i}
        for k in range(6) for i in range(4)
    ])
    pts = pd.DataFrame({
        "k": rng.randint(0, 8, 400),       # keys 6,7 have no intervals
        "ts": rng.randint(0, 50, 400),
        "pid": np.arange(400),
    })
    got = (
        interval_join_dataset(
            rd.from_pandas(pts), rd.from_pandas(ivs), by="k", on="ts",
            lo="lo", hi="hi", left_cols=["pid"], right_cols=["iv_id"],
            n_buckets=5,
        )
        .to_pandas().astype(np.int64)
        .sort_values("pid").reset_index(drop=True)
    )
    rows = []
    for _, p in pts.iterrows():
        m = ivs[(ivs["k"] == p["k"]) & (ivs["lo"] <= p["ts"]) & (p["ts"] <= ivs["hi"])]
        if len(m):
            assert len(m) == 1  # disjoint intervals
            rows.append((p["k"], p["ts"], p["pid"], m["lo"].iloc[0],
                         m["hi"].iloc[0], m["iv_id"].iloc[0]))
    want = pd.DataFrame(
        rows, columns=["k", "ts", "pid", "lo_r", "hi_r", "iv_id_r"]
    ).astype(np.int64).sort_values("pid").reset_index(drop=True)
    assert len(want) > 0 and len(want) < 400  # both kept and dropped points
    pd.testing.assert_frame_equal(got[list(want.columns)], want)


# ---------------------------------------------------------------------------
# bloom semi-join
# ---------------------------------------------------------------------------


def test_bloom_semi_join_exact(ray_session):
    """Exact path output == pandas isin semi-join, across layouts and with
    a filter sized to force real false positives for the verify stage."""
    import ray.data as rd

    from horus_ner_ray.stages.joins import bloom_semi_join

    rng = np.random.RandomState(2)
    big = pd.DataFrame({"k": rng.randint(0, 5000, 20_000), "v": np.arange(20_000)})
    keys = pd.DataFrame({"k": np.unique(rng.randint(0, 5000, 800))})
    want = big[big["k"].isin(set(keys["k"]))].reset_index(drop=True)

    # tiny filter (512 bits) -> high fpp -> verify must actually prune
    got = bloom_semi_join(
        rd.from_pandas(big).repartition(6), rd.from_pandas(keys),
        big_key="k", small_key="k", n_bits=512, k_hashes=3, n_buckets=7,
    ).to_pandas().sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v"]],
                                  want.sort_values("v").reset_index(drop=True))

    # probabilistic path: superset of the truth, no false negatives
    pruned = bloom_semi_join(
        rd.from_pandas(big), rd.from_pandas(keys), big_key="k", small_key="k",
        n_bits=512, k_hashes=3, exact=False,
    ).to_pandas()
    assert set(want["v"]) <= set(pruned["v"])


def test_bloom_semi_join_string_keys(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.joins import bloom_semi_join

    big = pd.DataFrame({"name": [f"u{i % 50}" for i in range(1000)],
                        "row": np.arange(1000)})
    keys = pd.DataFrame({"name": [f"u{i}" for i in range(0, 50, 5)]})
    got = bloom_semi_join(
        rd.from_pandas(big), rd.from_pandas(keys),
        big_key="name", small_key="name", n_bits=4096, n_buckets=4,
    ).to_pandas()
    want = big[big["name"].isin(set(keys["name"]))]
    assert sorted(got["row"]) == sorted(want["row"])


def test_bloom_anti_join_exact(ray_session):
    """Anti path == pandas ~isin, with a tiny filter so bloom false
    positives must be rescued by the verify stage, not dropped."""
    import ray.data as rd

    from horus_ner_ray.stages.joins import bloom_semi_join

    rng = np.random.RandomState(4)
    big = pd.DataFrame({"k": rng.randint(0, 3000, 10_000), "v": np.arange(10_000)})
    keys = pd.DataFrame({"k": np.unique(rng.randint(0, 3000, 500))})
    want = big[~big["k"].isin(set(keys["k"]))]

    got = bloom_semi_join(
        rd.from_pandas(big).repartition(5), rd.from_pandas(keys),
        big_key="k", small_key="k", n_bits=256, k_hashes=2, n_buckets=6,
        anti=True,
    ).to_pandas()
    assert sorted(got["v"]) == sorted(want["v"])
    assert got["v"].dtype == np.int64

    with pytest.raises(ValueError, match="anti-join requires exact"):
        bloom_semi_join(rd.from_pandas(big), rd.from_pandas(keys),
                        big_key="k", small_key="k", exact=False, anti=True)


def test_bloom_semi_join_kind_mismatch_raises(ray_session):
    """int-vs-float key encodings hash differently; must fail loudly."""
    import ray.data as rd

    from horus_ner_ray.stages.joins import bloom_semi_join

    big = pd.DataFrame({"k": np.array([1.0, 2.0]), "v": [1, 2]})
    keys = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64)})
    with pytest.raises(ValueError, match="key kinds differ"):
        bloom_semi_join(rd.from_pandas(big), rd.from_pandas(keys),
                        big_key="k", small_key="k")


def test_bloom_semi_join_int32_keys(ray_session):
    """Width-mismatched integer encodings must still match (normalized to
    int64 before hashing) — including negatives."""
    import ray.data as rd

    from horus_ner_ray.stages.joins import bloom_semi_join

    big = pd.DataFrame({"k": np.array([-5, 3, 9, -5], dtype=np.int64),
                        "v": np.arange(4)})
    keys = pd.DataFrame({"k": np.array([-5, 9], dtype=np.int32)})
    got = bloom_semi_join(rd.from_pandas(big), rd.from_pandas(keys),
                          big_key="k", small_key="k", n_bits=1024,
                          n_buckets=3).to_pandas()
    assert sorted(got["v"]) == [0, 2, 3]


def test_hash_join_matches_pandas(ray_session):
    """Both-sides-large inner equi-join vs pandas merge, incl. many-to-many
    keys (full cross product per key) and keys missing from one side."""
    import ray.data as rd

    from horus_ner_ray.stages.joins import hash_join_dataset

    rng = np.random.RandomState(6)
    left = pd.DataFrame({"k": rng.randint(0, 50, 600), "lv": np.arange(600)})
    right = pd.DataFrame({"k": rng.randint(20, 70, 400), "rv": np.arange(400)})
    got = (
        hash_join_dataset(
            rd.from_pandas(left).repartition(4), rd.from_pandas(right).repartition(3),
            key="k", left_cols=["lv"], right_cols=["rv"], n_buckets=7,
        )
        .to_pandas().astype(np.int64)
        .sort_values(["k", "lv", "rv_r"]).reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k").rename(columns={"rv": "rv_r"})
        .sort_values(["k", "lv", "rv_r"]).reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got[["k", "lv", "rv_r"]], want[["k", "lv", "rv_r"]])
    # many-to-many sanity: some key must appear multiple times on each side
    assert (left["k"].value_counts().max() > 1) and (right["k"].value_counts().max() > 1)


def test_join_column_collision_raises(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.joins import asof_join_dataset, hash_join_dataset

    l = pd.DataFrame({"k": [1], "ts": [1], "v_r": [2]})
    r = pd.DataFrame({"k": [1], "ts": [1], "v": [3]})
    with pytest.raises(ValueError, match="collision"):
        hash_join_dataset(rd.from_pandas(l), rd.from_pandas(r), key="k",
                          left_cols=["v_r"], right_cols=["v"])
    with pytest.raises(ValueError, match="collision"):
        asof_join_dataset(rd.from_pandas(l), rd.from_pandas(r), by="k",
                          on="ts", left_cols=["v_r"], right_cols=["v"])


def test_hash_join_left_outer(ray_session):
    """how='left': every left row survives; unmatched rows carry the
    declared fills; matched region identical to the inner join."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.joins import hash_join_dataset

    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 40, 200).astype(np.int64),
                         "lv": np.arange(200, dtype=np.int64)})
    right = pd.DataFrame({"k": rng.integers(20, 60, 80).astype(np.int64),
                          "rv": np.arange(80, dtype=np.int64)})
    j = hash_join_dataset(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        key="k", left_cols=["lv"], right_cols=["rv"], n_buckets=8,
        how="left", left_fill={"rv": -1}).to_pandas()
    want = left.merge(right, on="k", how="left")
    want["rv"] = want["rv"].fillna(-1).astype(np.int64)
    key_cols = ["k", "lv", "rv_r"]
    got = j.sort_values(key_cols).reset_index(drop=True)
    want = want.rename(columns={"rv": "rv_r"}).sort_values(
        key_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key_cols], want[key_cols])
    # missing fill fails loudly
    try:
        hash_join_dataset(rd.from_pandas(left), rd.from_pandas(right),
                          key="k", left_cols=["lv"], right_cols=["rv"],
                          how="left")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "left_fill" in str(e)

"""Sampling/split/export helpers + stopword-filtered build + margins."""

import numpy as np
import pyarrow as pa
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine, topk_with_margin


def test_hash_split_deterministic(ray_session):
    import ray.data as rd

    from horus_ner_ray.functions.sampling import hash_split, split_proportions

    ds = rd.range(1000).map_batches(
        lambda b: {"doc_id": b["id"]}, batch_format="numpy"
    )
    out = hash_split(ds).to_pandas()
    assert (out[out.doc_id % 100 < 80]["split"] == "train").all()
    assert (out[out.doc_id % 100 >= 80]["split"] == "test").all()
    props = split_proportions(ds).to_pandas().set_index("split")["n"]
    assert props["train"] == 800 and props["test"] == 200


def test_random_sample_and_shuffle_seeded(ray_session):
    import ray.data as rd

    from horus_ner_ray.functions.sampling import random_sample, shuffled

    ds = rd.range(2000)
    a = sorted(r["id"] for r in random_sample(ds, 0.1, seed=7).take_all())
    b = sorted(r["id"] for r in random_sample(rd.range(2000), 0.1, seed=7).take_all())
    assert a == b and 100 < len(a) < 320
    s = shuffled(rd.range(100), seed=3).take_all()
    assert sorted(r["id"] for r in s) == list(range(100))


def test_export_formats(ray_session, tmp_path):
    import ray.data as rd

    from horus_ner_ray.functions.export import export_dataset

    ds = rd.from_items([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    for fmt in ("parquet", "csv", "json"):
        export_dataset(ds, tmp_path / fmt, fmt=fmt)
        assert any((tmp_path / fmt).iterdir())
    with pytest.raises(ValueError):
        export_dataset(ds, tmp_path / "z", fmt="tsv")


def test_stopword_filtered_build_rank_identity(small_corpus, tmp_path, ray_session):
    stop = ("the", "to", "a", "of", "and", "sessionmark")
    cfg = PipelineConfig(num_shards=3, stopword_filter=stop)
    build_index(small_corpus, tmp_path / "i", cfg)
    eng = QueryEngine(tmp_path / "i")
    bf = BruteForceBM25.from_corpus_files(small_corpus, stopwords=stop)
    assert eng.global_df("the") == 0 and eng.global_df("sessionmark") == 0
    for q in ["alpha beta", "the tok00042", "uniqueedge1", "tok00007 tok00011"]:
        assert eng.search(q, 10) == bf.search(q, 10), q


def test_topk_with_margin():
    rows = topk_with_margin([(5, 3.0), (2, 2.5), (9, 2.5)])
    assert rows == [(5, 3.0, 0.5), (2, 2.5, 0.0), (9, 2.5, 2.5)]
    assert topk_with_margin([]) == []


def test_weighted_sample_exact_and_invariant(ray_session):
    """A-ES weighted top-k: exactly the reference priorities' top-k,
    partitioning-invariant, weight<=0 excluded, k>n returns all."""
    import ray.data as rd

    from horus_ner_ray.functions.sampling import weighted_sample_topk
    from horus_ner_ray.stages.sketches import splitmix64

    rng = np.random.default_rng(3)
    n = 5000
    keys = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 50, n).astype(np.float64)
    w[::97] = 0.0  # excluded rows
    ds = rd.from_arrow(pa.table({"k": keys, "w": w}))
    got = weighted_sample_topk(ds, "k", "w", k=100, seed=11).to_pandas()
    ok = w > 0
    h = splitmix64(keys[ok].astype(np.uint64) ^ np.uint64(11))
    u = (h.astype(np.float64) + 1.0) / 2.0**64
    pr = np.power(u, 1.0 / w[ok])
    sel = np.lexsort((keys[ok], -pr))[:100]
    assert (got["k"].to_numpy() == keys[ok][sel]).all()
    assert not np.isin(np.flatnonzero(~ok), got["k"].to_numpy()).any()
    # partitioning invariance (combiner + sort path, not row order)
    got2 = weighted_sample_topk(ds.repartition(17), "k", "w",
                                k=100, seed=11).to_pandas()
    assert (got2["k"].to_numpy() == got["k"].to_numpy()).all()
    # k > n: every positive-weight row comes back
    small = rd.from_arrow(pa.table({"k": keys[:20], "w": w[:20]}))
    allrows = weighted_sample_topk(small, "k", "w", k=500).to_pandas()
    assert len(allrows) == int((w[:20] > 0).sum())
    with pytest.raises(ValueError, match="k must be > 0"):
        weighted_sample_topk(ds, "k", "w", k=0)


def test_weighted_sample_prefers_heavy_rows(ray_session):
    """Statistical sanity across seeds: rows with 10x weight must be
    sampled far more often (binomial bound, deterministic seeds)."""
    import ray.data as rd

    from horus_ner_ray.functions.sampling import weighted_sample_topk

    n = 400
    keys = np.arange(n, dtype=np.int64)
    w = np.where(keys < 40, 10.0, 1.0)  # 40 heavy rows
    ds = rd.from_arrow(pa.table({"k": keys, "w": w}))
    heavy_hits = 0
    draws = 0
    for seed in range(8):
        got = weighted_sample_topk(ds, "k", "w", k=40, seed=seed).to_pandas()
        heavy_hits += int((got["k"].to_numpy() < 40).sum())
        draws += 40
    # heavy rows hold 10/19 of total mass; expect well above the 10%
    # uniform share — 40% is > 6 sigma below the A-ES expectation and
    # > 10 sigma above uniform
    assert heavy_hits / draws > 0.40, heavy_hits / draws


def test_weighted_sample_per_group_exact(ray_session):
    """Per-group A-ES: exactly each group's reference top-k, invariant
    to partitioning, weight<=0 excluded."""
    import ray.data as rd

    from horus_ner_ray.functions.sampling import weighted_sample_per_group
    from horus_ner_ray.stages.sketches import splitmix64

    rng = np.random.default_rng(21)
    n = 3000
    keys = np.arange(n, dtype=np.int64)
    w = rng.integers(0, 30, n).astype(np.float64)  # some zeros
    grp = np.array([f"g{int(x)}" for x in keys % 5], dtype=object)
    ds = rd.from_arrow(pa.table({"g": grp.astype(str), "k": keys, "w": w}))
    got = weighted_sample_per_group(ds, "g", "k", "w", k=12,
                                    seed=3).to_pandas()
    h = splitmix64(keys.astype(np.uint64) ^ np.uint64(3))
    u = (h.astype(np.float64) + 1.0) / 2.0**64
    pr = np.power(u, 1.0 / np.where(w > 0, w, 1.0))
    for g in sorted(set(grp)):
        m = (grp == g) & (w > 0)
        sel = np.lexsort((keys[m], -pr[m]))[:12]
        want = keys[m][sel]
        gg = got[got.g == g].sort_values("rank")
        assert (gg["k"].to_numpy() == want).all(), g
        assert (gg["rank"].to_numpy() == np.arange(1, len(want) + 1)).all()
    got2 = weighted_sample_per_group(ds.repartition(11), "g", "k", "w",
                                     k=12, seed=3).to_pandas()
    a = got.sort_values(["g", "rank"]).reset_index(drop=True)
    b = got2.sort_values(["g", "rank"]).reset_index(drop=True)
    assert (a[["g", "k"]].to_numpy() == b[["g", "k"]].to_numpy()).all()
    with pytest.raises(ValueError, match="k must be > 0"):
        weighted_sample_per_group(ds, "g", "k", "w", k=0)


def test_group_hash_split_is_group_atomic_and_deterministic(ray_session):
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.functions.sampling import group_hash_split
    from horus_ner_ray.stages.sketches import splitmix64

    rng = np.random.RandomState(6)
    df = pd.DataFrame({
        "user_id": rng.randint(0, 60, 2000).astype(np.int64),
        "v": rng.rand(2000),
    })
    for parts in (1, 5):
        got = (group_hash_split(
            rd.from_pandas(df.sample(frac=1, random_state=parts))
            .repartition(parts), "user_id", train_pct=80, seed=42)
            .to_pandas())
        # group-atomicity: one split value per user
        per = got.groupby("user_id")["split"].nunique()
        assert (per == 1).all()
        # the rule itself
        for u in per.index[:10]:
            h = int(splitmix64(np.array([np.uint64(u) ^ np.uint64(42)],
                                        dtype=np.uint64))[0])
            want = "train" if h % 100 < 80 else "test"
            assert (got.loc[got.user_id == u, "split"] == want).all()
    import pytest

    with pytest.raises(ValueError, match="train_pct"):
        group_hash_split(rd.from_pandas(df), "user_id", train_pct=150)


def test_rare_terms_long_tail(ray_session):
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.termstats import rare_terms

    df = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "text": [f"common filler rare{i:03d}" + (" semi" if i < 5 else "")
                 for i in range(50)],
    })
    got = rare_terms(rd.from_pandas(df).repartition(4), max_df=5, k=10)
    # every rare{i} term has df == 1; first 10 in term order
    assert list(got["term"])[:10] == [f"rare{i:03d}" for i in range(10)]
    assert (got["df"] == 1).all()
    # df-ordering: 'semi' (df 5) ranks after all df-1 terms, outside k=10
    full = rare_terms(rd.from_pandas(df), max_df=5, k=1000)
    assert list(full["term"])[-1] == "semi" and int(full["df"].iloc[-1]) == 5
    assert "common" not in set(full["term"])  # df 50 > max_df


def test_group_sampler_temperature(ray_session):
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.functions.sampling import weighted_sample_per_group

    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], 500),
        "id": np.arange(500, dtype=np.int64),
        "w": rng.randint(1, 1000, 500).astype(np.float64),
    })
    ds = rd.from_pandas(df)
    base = weighted_sample_per_group(ds, "g", "id", "w", k=5,
                                     seed=3).to_pandas()
    # T=1 is bitwise the default (libm pow(w, 1.0) == w)
    t1 = weighted_sample_per_group(ds, "g", "id", "w", k=5, seed=3,
                                   temperature=1.0).to_pandas()
    assert t1.equals(base)
    # T=2 flattens: the sample changes, raw weights still published
    t2 = weighted_sample_per_group(ds, "g", "id", "w", k=5, seed=3,
                                   temperature=2.0).to_pandas()
    assert not t2["id"].equals(base["id"])
    assert set(t2["w"]).issubset(set(df["w"]))
    import pytest

    with pytest.raises(ValueError, match="temperature"):
        weighted_sample_per_group(ds, "g", "id", "w", k=5, temperature=0.0)


def test_negative_pairs(ray_session):
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.functions.sampling import negative_pairs
    from horus_ner_ray.stages.sketches import splitmix64

    n = 200
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    for parts in (1, 5):
        got = (negative_pairs(rd.from_pandas(df).repartition(parts),
                              k=3, seed=9)
               .to_pandas().sort_values(["doc_id", "neg_rank"])
               .reset_index(drop=True))
        assert len(got) == n * 3
        # never the anchor, always in range
        assert (got["neg_id"] != got["doc_id"]).all()
        assert got["neg_id"].between(0, n - 1).all()
        # the rule itself, scalar-recomputed
        for r in got.head(9).itertuples():
            h = int(splitmix64(np.array(
                [np.uint64(r.doc_id * 3 + r.neg_rank) ^ np.uint64(9)],
                dtype=np.uint64))[0])
            off = h % (n - 1)
            assert r.neg_id == off + (1 if off >= r.doc_id else 0)
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        negative_pairs(rd.from_pandas(df), k=0)


def test_matches_dataset_full_set(built_index, ray_session):
    """matches_dataset returns the FULL match set with the engine's exact
    floats (exhaustive path) — the search -> Dataset bridge."""
    from horus_ner_ray.functions.export import matches_dataset
    from horus_ner_ray.pipelines.query import QueryEngine

    idx, _ = built_index
    eng = QueryEngine(idx)
    for q, mode in (("the session", "or"), ("the session", "and"),
                    ("sessionmark", "or")):
        df = matches_dataset(idx, q, mode=mode).to_pandas()
        want = sorted(eng.search(q, k=10 ** 9, mode=mode))
        if len(df) == 0:
            # an all-empty match set drops its blocks: no columns either
            assert want == [], (q, mode)
            continue
        got = sorted(zip(df["doc_id"].astype(int),
                         df["score"].astype(float)))
        assert got == want, (q, mode)
    assert len(matches_dataset(idx, "zzzqnotfound").to_pandas()) == 0

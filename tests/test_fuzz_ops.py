"""Seeded randomized fuzz for the round-2 operator family: every trial
draws adversarial shapes (ties, empty keys, duplicates, degenerate
distributions) and compares against an independent in-memory reference."""

import math

import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_asof_join(ray_session, seed):
    import ray.data as rd

    from horus_ner_ray.stages.joins import asof_join_dataset

    rng = np.random.RandomState(100 + seed)
    nl, nr = rng.randint(1, 200), rng.randint(0, 150)
    # tiny ts range -> many exact ties; tiny key range -> dense groups
    left = pd.DataFrame({"k": rng.randint(0, 8, nl),
                         "ts": rng.randint(0, 30, nl),
                         "lid": np.arange(nl)})
    right = pd.DataFrame({"k": rng.randint(0, 8, nr),
                          "ts": rng.randint(0, 30, nr),
                          "rid": np.arange(nr)})
    # drop duplicate (k, ts) on the right: tie order is engine-defined
    right = right.drop_duplicates(["k", "ts"], keep="last")
    got = (
        asof_join_dataset(rd.from_pandas(left).repartition(3),
                          rd.from_pandas(right),
                          by="k", on="ts", left_cols=["lid"],
                          right_cols=["rid"],
                          n_buckets=int(rng.randint(1, 9)))
        .to_pandas()
    )
    rows = []
    for _, lr in left.iterrows():
        cand = right[(right["k"] == lr["k"]) & (right["ts"] <= lr["ts"])]
        if len(cand):
            best = cand.sort_values("ts").iloc[-1]
            rows.append((lr["k"], lr["ts"], lr["lid"], best["ts"], best["rid"]))
    assert len(got) == len(rows)
    if rows:
        want = (pd.DataFrame(rows, columns=["k", "ts", "lid", "ts_r", "rid_r"])
                .astype(np.int64).sort_values("lid").reset_index(drop=True))
        got = got.astype(np.int64).sort_values("lid").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_quantiles(ray_session, seed):
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_disc

    rng = np.random.RandomState(200 + seed)
    n = rng.randint(1, 4000)
    kind = seed % 3
    if kind == 0:
        vals = rng.normal(0, 1, n)
    elif kind == 1:
        vals = rng.randint(0, 5, n).astype(np.float64)  # heavy duplicates
    else:
        vals = np.round(rng.exponential(3, n), 1)  # boundary-prone grid
    qs = [0.0, 0.125, 0.5, 0.875, 1.0]
    got = quantile_disc(
        rd.from_pandas(pd.DataFrame({"x": vals})).repartition(int(rng.randint(1, 6))),
        "x", qs,
        n_bins=int(rng.choice([2, 7, 64])),
        gather_limit=int(rng.choice([1, 50, 10**9])),
        max_rounds=40)
    v = np.sort(vals)
    want = [float(v[min(n - 1, max(0, math.ceil(q * n) - 1))]) for q in qs]
    assert list(got["value"]) == want, (seed, kind)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_hash_join(ray_session, seed):
    import ray.data as rd

    from horus_ner_ray.stages.joins import hash_join_dataset

    rng = np.random.RandomState(300 + seed)
    nl, nr = rng.randint(1, 300), rng.randint(1, 300)
    left = pd.DataFrame({"k": rng.randint(0, 20, nl), "lv": np.arange(nl)})
    right = pd.DataFrame({"k": rng.randint(10, 30, nr), "rv": np.arange(nr)})
    got = (
        hash_join_dataset(rd.from_pandas(left).repartition(2),
                          rd.from_pandas(right).repartition(3), key="k",
                          left_cols=["lv"], right_cols=["rv"],
                          n_buckets=int(rng.randint(1, 10)))
        .to_pandas().astype(np.int64)
        .sort_values(["k", "lv", "rv_r"]).reset_index(drop=True)
    )
    want = (left.merge(right, on="k").rename(columns={"rv": "rv_r"})
            .astype(np.int64).sort_values(["k", "lv", "rv_r"])
            .reset_index(drop=True))
    assert len(got) == len(want)
    if len(want):
        pd.testing.assert_frame_equal(got[["k", "lv", "rv_r"]],
                                      want[["k", "lv", "rv_r"]])


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_line_dedup(ray_session, seed):
    from collections import Counter

    import ray.data as rd

    from horus_ner_ray.stages.dedupe import remove_duplicate_lines

    rng = np.random.RandomState(400 + seed)
    vocab = ["BOILER", "FOOT", "", "x y", "unique%d"]
    rows = []
    for d in range(rng.randint(1, 60)):
        n = rng.randint(1, 6)
        lines = []
        for _ in range(n):
            w = vocab[rng.randint(len(vocab))]
            lines.append(w % (rng.randint(0, 40)) if "%d" in w else w)
        rows.append({"doc_id": d, "text": "\n".join(lines)})
    mc = int(rng.randint(2, 4))
    got = (
        remove_duplicate_lines(rd.from_items(rows), min_count=mc,
                               n_buckets=int(rng.randint(1, 8)))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    cnt = Counter(l for r in rows for l in r["text"].split("\n"))
    want_rows = []
    for r in rows:
        kept = [l for l in r["text"].split("\n") if cnt[l] < mc]
        if kept:
            want_rows.append({"doc_id": r["doc_id"],
                              "clean_text": "\n".join(kept),
                              "n_kept_lines": len(kept)})
    assert len(got) == len(want_rows)
    if want_rows:
        want = pd.DataFrame(want_rows).astype(
            {"doc_id": np.int64, "n_kept_lines": np.int64})
        pd.testing.assert_frame_equal(got, want)

"""PMI collocations and rolling aggregates vs single-process references."""

import math

import numpy as np
import pandas as pd


def _pmi_ref(df, min_df=2, max_df_ratio=0.5, min_pair=2, k=100):
    import re
    from itertools import combinations

    tok = re.compile(r"[a-z0-9]+")
    sets = {r.doc_id: sorted(set(tok.findall(r.text.lower())))
            for r in df.itertuples()}
    n = len(df)
    dfc = {}
    for s in sets.values():
        for t in s:
            dfc[t] = dfc.get(t, 0) + 1
    max_df = math.floor(max_df_ratio * n)
    kept = {t: c for t, c in dfc.items() if min_df <= c <= max_df}
    pc = {}
    for s in sets.values():
        ks = [t for t in s if t in kept]
        for a, b in combinations(ks, 2):
            pc[(a, b)] = pc.get((a, b), 0) + 1
    rows = []
    for (a, b), c in pc.items():
        if c < min_pair:
            continue
        pmi = math.log(float(c * n) / float(kept[a] * kept[b]))
        rows.append((a, b, c, math.floor(pmi * 1e6 + 0.5)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


def _mk_docs(n=200, seed=2):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(n):
        words = list(rng.choice(vocab, rng.randint(3, 12)))
        if i % 3 == 0:
            words += ["alpha", "beta"]  # a planted collocation
        texts.append(" ".join(words))
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_pmi_matches_reference(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.collocations import pmi_pairs

    df = _mk_docs()
    want = _pmi_ref(df)
    got = pmi_pairs(rd.from_pandas(df).repartition(5), top_k=100)
    got_rows = list(map(tuple, got[["ta", "tb", "pair_count", "pmi_e6"]]
                        .itertuples(index=False)))
    assert got_rows == want
    assert ("alpha", "beta") in {(a, b) for a, b, _, _ in got_rows[:5]}


def test_pmi_empty_corpus(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.collocations import pmi_pairs

    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": ["x", "y", "z"]})  # all df==1 -> filtered
    got = pmi_pairs(rd.from_pandas(df))
    assert len(got) == 0 and list(got.columns) == ["ta", "tb", "pair_count",
                                                   "pmi_e6"]


def test_pair_emission_vectorized_matches_itertools():
    """emit_pair_indices (the no-per-doc-loop kernel) vs itertools, many
    segment shapes including empty and singleton segments."""
    from itertools import combinations

    from horus_ner_ray.stages.collocations import emit_pair_indices

    rng = np.random.RandomState(7)
    for trial in range(20):
        seg_lens = rng.randint(1, 9, rng.randint(1, 12)).astype(np.int64)
        seg_starts = np.concatenate(([0], np.cumsum(seg_lens)[:-1]))
        # ascending ids within each segment (the np.unique invariant)
        t_ids = np.concatenate([np.sort(rng.choice(1000, ln, replace=False))
                                for ln in seg_lens]).astype(np.int64)
        ia, ib = emit_pair_indices(t_ids, seg_starts, seg_lens)
        want = []
        for s, ln in zip(seg_starts, seg_lens):
            want += list(combinations(t_ids[s:s + ln].tolist(), 2))
        assert list(zip(ia.tolist(), ib.tolist())) == want
        assert (ia < ib).all() if len(ia) else True


def test_kept_vocab_is_columnar_not_dict(ray_session):
    """Scale-shape pin: the broadcast vocab is a sorted Arrow string array +
    int64 df vector (searchsorted/index_in membership), never a Python dict;
    the df filter runs on the dataset, not driver pandas."""
    import pyarrow as pa
    import ray.data as rd

    from horus_ner_ray.stages.collocations import kept_vocab
    from horus_ner_ray.stages.termstats import term_df_dataset

    df = _mk_docs(60)
    dfds = term_df_dataset(rd.from_pandas(df).repartition(3))
    terms, dfv = kept_vocab(dfds, 2, 50)
    assert isinstance(terms, (pa.Array, pa.ChunkedArray))
    assert isinstance(dfv, np.ndarray) and dfv.dtype == np.int64
    tl = terms.to_pylist()
    assert tl == sorted(tl) and len(tl) == len(dfv)
    # hot-pair skew: one pair in 90% of docs still aggregates correctly
    hot = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "text": ["hotx hoty filler%d" % (i % 7) if i % 10 else "solo only"
                 for i in range(100)]})
    from horus_ner_ray.stages.collocations import pmi_pairs

    got = pmi_pairs(rd.from_pandas(hot).repartition(8), min_df=2,
                    max_df_ratio=0.95, min_pair_count=2, top_k=200)
    want = _pmi_ref(hot, min_df=2, max_df_ratio=0.95, min_pair=2, k=200)
    got_rows = list(map(tuple, got[["ta", "tb", "pair_count", "pmi_e6"]]
                        .itertuples(index=False)))
    assert got_rows == want


def _rolling_ref(df, w):
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        v = np.floor(g["value"].to_numpy(np.float64) * 1e6 + 0.5).astype(np.int64)
        for i in range(len(g)):
            lo = max(0, i - w + 1)
            fr = v[lo:i + 1]
            s = int(fr.sum())
            out.append((int(g["event_id"].iloc[i]), int(uid), len(fr), s,
                        math.floor(float(s) / len(fr) + 0.5),
                        int(fr.min()), int(fr.max())))
    return sorted(out)


def test_rolling_aggregates_match_reference(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.analytic import rolling_aggregates_dataset

    rng = np.random.RandomState(4)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 25, n).astype(np.int64),
        "ts": pd.to_datetime(rng.randint(0, 10**6, n), unit="s"),
        "value": rng.randn(n) * 50,
    })
    want = _rolling_ref(df, 5)
    got = (rolling_aggregates_dataset(rd.from_pandas(df).repartition(6),
                                      window=5, n_buckets=8)
           .to_pandas())
    got_rows = sorted(map(tuple, got[["event_id", "user_id", "roll_cnt",
                                      "roll_sum_e6", "roll_avg_e6",
                                      "roll_min_e6", "roll_max_e6"]]
                          .astype(np.int64).itertuples(index=False)))
    assert got_rows == want

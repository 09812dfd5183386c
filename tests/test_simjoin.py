"""TF-IDF cosine similarity join: equality vs a numpy ground truth,
df-cap semantics, layout invariance, and checkpoint ownership."""

import shutil

import numpy as np
import pandas as pd
import pytest

from horus_ner_ray.stages.simjoin import tfidf_cosine_pairs


def _corpus(seed: int = 21, n: int = 120):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(25)]
    texts = []
    for i in range(n):
        k = rng.randint(3, 15)
        texts.append(" ".join(rng.choice(vocab, k)))
    # plant near-duplicates
    for i in range(0, 20, 2):
        texts[i + 1] = texts[i]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _ground_truth(df: pd.DataFrame, threshold: float, max_df: int | None = None):
    import re

    n_docs = len(df)
    rows = []
    for d, t in zip(df["doc_id"], df["text"]):
        tf: dict[str, int] = {}
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            tf[w] = tf.get(w, 0) + 1
        rows.append((int(d), tf))
    dfc: dict[str, int] = {}
    for _d, tf in rows:
        for w in tf:
            dfc[w] = dfc.get(w, 0) + 1
    cap = max_df if max_df is not None else n_docs
    vecs = {}
    for d, tf in rows:
        v = {}
        for w, f in tf.items():
            if dfc[w] > cap:
                continue
            idf_e6 = int(np.floor(np.log(float(n_docs) / dfc[w]) * 1e6 + 0.5))
            wt = f * idf_e6
            if wt > 0:
                v[w] = wt
        vecs[d] = v
    out = []
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = set(vecs[a]) & set(vecs[b])
            if not shared:
                continue
            dot = sum(vecs[a][w] * vecs[b][w] for w in shared)
            qa = sum(x * x for x in vecs[a].values())
            qb = sum(x * x for x in vecs[b].values())
            den = np.sqrt(np.float64(qa)) * np.sqrt(np.float64(qb))
            cos = np.float64(dot) / den
            if cos >= threshold:
                out.append((a, b, int(np.floor(cos * 1e6 + 0.5))))
    return (pd.DataFrame(out, columns=["doc_a", "doc_b", "cosine_e6"])
            .astype(np.int64).sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))


def _run(df, tmp_path, threshold, max_df=None, parts=4, n_buckets=16):
    import ray.data as rd

    ckpt = str(tmp_path / f"ck_{threshold}_{max_df}_{parts}_{n_buckets}")
    try:
        got = tfidf_cosine_pairs(
            rd.from_pandas(df).repartition(parts), n_docs=len(df),
            threshold=threshold, max_df=max_df, n_buckets=n_buckets,
            checkpoint_dir=ckpt).to_pandas()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    if len(got) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("doc_a", "doc_b", "cosine_e6")})
    return (got.astype(np.int64).sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))


def test_matches_ground_truth(ray_session, tmp_path):
    df = _corpus()
    want = _ground_truth(df, 0.8)
    got = _run(df, tmp_path, 0.8)
    assert len(want) >= 10  # planted dups + random overlap
    pd.testing.assert_frame_equal(got, want)
    # planted exact duplicates score 1.0
    exact = got[(got["doc_a"] % 2 == 0) & (got["doc_b"] == got["doc_a"] + 1)]
    assert (exact["cosine_e6"] == 10**6).sum() >= 8


def test_df_cap_changes_vocabulary(ray_session, tmp_path):
    df = _corpus(seed=5)
    want = _ground_truth(df, 0.5, max_df=40)
    got = _run(df, tmp_path, 0.5, max_df=40)
    pd.testing.assert_frame_equal(got, want)


def test_layout_invariance(ray_session, tmp_path):
    df = _corpus(seed=9, n=80)
    a = _run(df, tmp_path, 0.7, parts=2, n_buckets=8)
    b = _run(df, tmp_path, 0.7, parts=9, n_buckets=32)
    pd.testing.assert_frame_equal(a, b)


def test_empty_and_short_docs(ray_session, tmp_path):
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["", "alpha alpha", "alpha alpha", "!!!"],
    })
    got = _run(df, tmp_path, 0.5)
    # 'alpha' df=2 of 4 docs -> idf>0; docs 1,2 identical
    assert list(got.itertuples(index=False, name=None)) == [(1, 2, 10**6)]


def test_doc_keywords_matches_ground_truth(ray_session):
    import re

    import ray.data as rd

    from horus_ner_ray.stages.simjoin import doc_keywords

    df = _corpus(seed=33, n=100)
    got = (doc_keywords(rd.from_pandas(df).repartition(5), n_docs=len(df), k=3)
           .to_pandas().sort_values(["doc_id", "kw_rank"]).reset_index(drop=True)
           [["doc_id", "kw_rank", "term", "w"]])
    # ground truth
    n_docs = len(df)
    dfc: dict[str, int] = {}
    tfs = []
    for t in df["text"]:
        tf: dict[str, int] = {}
        for wd in re.findall(r"[a-z0-9]+", t.lower()):
            tf[wd] = tf.get(wd, 0) + 1
        tfs.append(tf)
        for wd in tf:
            dfc[wd] = dfc.get(wd, 0) + 1
    rows = []
    for d, tf in zip(df["doc_id"], tfs):
        ws = []
        for wd, f in tf.items():
            idf = int(np.floor(np.log(float(n_docs) / dfc[wd]) * 1e6 + 0.5))
            if f * idf > 0:
                ws.append((-(f * idf), wd))
        ws.sort()
        for r, (negw, wd) in enumerate(ws[:3], 1):
            rows.append((int(d), r, wd, -negw))
    want = pd.DataFrame(rows, columns=["doc_id", "kw_rank", "term", "w"])
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": np.int64, "kw_rank": np.int64, "w": np.int64}),
        want.astype({"doc_id": np.int64, "kw_rank": np.int64, "w": np.int64}))

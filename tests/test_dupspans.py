"""Duplicated k-gram span detection (stages/dupspans.py): exact parity
with a pure-Python naive sweep, routing invariance, and edge cases."""

import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from horus_ner_ray.stages.dupspans import dup_span_stats


def _naive(docs, k, min_count=2):
    tok = {r.doc_id: re.findall(r"[a-z0-9]+", r.text.lower())
           for r in docs.itertuples()}
    cnt = defaultdict(int)
    for ts in tok.values():
        for i in range(len(ts) - k + 1):
            cnt[tuple(ts[i:i + k])] += 1
    rows = []
    for d, ts in sorted(tok.items()):
        n = max(0, len(ts) - k + 1)
        dup = [i for i in range(n) if cnt[tuple(ts[i:i + k])] >= min_count]
        if not dup:
            continue
        best = run = 1
        for a, b in zip(dup, dup[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        rows.append((d, n, len(dup), best))
    return pd.DataFrame(rows, columns=["doc_id", "total_kgrams",
                                       "dup_kgrams", "max_dup_run"])


def _docs(n=60, seed=11):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(n):
        words = rng.choice(vocab, size=int(rng.integers(2, 25)), replace=True)
        rows.append({"doc_id": i, "text": " ".join(words)})
    # one doc that repeats another verbatim (a guaranteed long run)
    rows.append({"doc_id": n, "text": rows[0]["text"]})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    docs = _docs()
    return docs, rd.from_pandas(docs)


def _run(ds, **kw):
    out = dup_span_stats(ds, **kw).to_pandas()
    return (out.sort_values("doc_id").reset_index(drop=True)
            .astype(np.int64))


def test_matches_naive_k3(docs_ds):
    docs, ds = docs_ds
    pd.testing.assert_frame_equal(_run(ds, k=3), _naive(docs, 3))


def test_matches_naive_k5(docs_ds):
    docs, ds = docs_ds
    pd.testing.assert_frame_equal(_run(ds, k=5), _naive(docs, 5))


def test_routing_invariant(docs_ds):
    docs, ds = docs_ds
    a = _run(ds, k=3, n_buckets=16, n_salts=2)
    b = _run(ds.repartition(9), k=3, n_buckets=64, n_salts=8)
    pd.testing.assert_frame_equal(a, b)


def test_verbatim_copy_is_fully_duplicated(docs_ds):
    docs, ds = docs_ds
    out = _run(ds, k=3).set_index("doc_id")
    copy_id = int(docs.doc_id.max())
    n_tok = len(re.findall(r"[a-z0-9]+", docs.text.iloc[0].lower()))
    assert out.loc[copy_id, "dup_kgrams"] == n_tok - 2
    assert out.loc[copy_id, "max_dup_run"] == n_tok - 2


def test_no_duplicates(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["aa bb cc dd", "ee ff gg hh"]})
    out = dup_span_stats(rd.from_pandas(docs), k=2).to_pandas()
    assert len(out) == 0


def test_short_docs_dropped(ray_session):
    import ray.data as rd

    # doc 2 is shorter than k -> no kgrams; docs 0/1 identical
    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": ["x y z", "x y z", "q"]})
    out = (dup_span_stats(rd.from_pandas(docs), k=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True).astype(np.int64))
    assert list(out.doc_id) == [0, 1]
    assert list(out.dup_kgrams) == [1, 1]
    assert list(out.total_kgrams) == [1, 1]
    assert list(out.max_dup_run) == [1, 1]

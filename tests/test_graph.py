"""Co-occurrence graph operators (stages/graph.py): exact parity of the
integer-fixed-point PageRank and the triangle census against pure-Python
naive references, and invariance to block layout."""

import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from horus_ner_ray.stages.graph import SCALE, cooc_triangles, term_pagerank

MIN_DF, MAX_DF_RATIO, MIN_PAIR = 2, 0.9, 2


def _docs(n=80, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for i in range(n):
        k = int(rng.integers(3, 10))
        words = rng.choice(vocab, size=k, replace=True)
        rows.append({"doc_id": i, "text": " ".join(words)})
    return pd.DataFrame(rows)


def _graph(docs):
    toksets = {r.doc_id: set(re.findall(r"[a-z0-9]+", r.text.lower()))
               for r in docs.itertuples()}
    n = len(docs)
    df = defaultdict(int)
    for s in toksets.values():
        for t in s:
            df[t] += 1
    max_df = int(np.floor(MAX_DF_RATIO * n))
    kept = {t for t, d in df.items() if MIN_DF <= d <= max_df}
    pair = defaultdict(int)
    for s in toksets.values():
        ks = sorted(s & kept)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                pair[(ks[i], ks[j])] += 1
    return {k: v for k, v in pair.items() if v >= MIN_PAIR}


def _naive_pagerank(pair, n_iter):
    adj = defaultdict(dict)
    for (a, b), c in pair.items():
        adj[a][b] = c
        adj[b][a] = c
    nodes = set(adj)
    wsum = {u: sum(adj[u].values()) for u in nodes}
    r = {u: SCALE for u in nodes}
    base = (15 * SCALE) // 100
    for _ in range(n_iter):
        nr = {}
        for v in nodes:
            s = base
            for u, c in adj[v].items():
                s += (85 * c * r[u]) // (100 * wsum[u])
            nr[v] = s
        r = nr
    return sorted(((rk, t) for t, rk in r.items()),
                  key=lambda x: (-x[0], x[1]))


def _naive_triangles(pair):
    es = set(pair)
    adj = defaultdict(set)
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    cnt = 0
    for a, b in es:
        for c in adj[a]:
            if c > b and (b, c) in es:
                cnt += 1
    nodes = set(adj)
    return len(nodes), len(es), cnt


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    docs = _docs()
    return docs, rd.from_pandas(docs)


def test_pagerank_matches_naive(docs_ds):
    docs, ds = docs_ds
    got = term_pagerank(ds, min_df=MIN_DF, max_df_ratio=MAX_DF_RATIO,
                        min_pair_count=MIN_PAIR, n_iter=4, top_k=1000)
    ref = _naive_pagerank(_graph(docs), n_iter=4)
    assert [(int(r), t) for t, r in zip(got.term, got.rank_e9)] == ref


def test_pagerank_partitioning_invariant(docs_ds):
    docs, ds = docs_ds
    a = term_pagerank(ds, n_iter=3, top_k=50)
    b = term_pagerank(ds.repartition(7), n_iter=3, top_k=50)
    pd.testing.assert_frame_equal(a, b)


def test_pagerank_ranks_plausible(docs_ds):
    _docs_, ds = docs_ds
    got = term_pagerank(ds, n_iter=4, top_k=1000)
    # ranks positive, and the mean stays near SCALE (PageRank conserves
    # total mass up to floor-division loss)
    assert (got.rank_e9 > 0).all()
    assert abs(got.rank_e9.mean() - SCALE) < 0.2 * SCALE


def test_triangles_match_naive(docs_ds):
    docs, ds = docs_ds
    got = cooc_triangles(ds, min_df=MIN_DF, max_df_ratio=MAX_DF_RATIO,
                         min_pair_count=MIN_PAIR)
    n_nodes, n_edges, n_tri = _naive_triangles(_graph(docs))
    assert (int(got.n_nodes[0]), int(got.n_edges[0]),
            int(got.n_triangles[0])) == (n_nodes, n_edges, n_tri)


def test_triangles_partitioning_invariant(docs_ds):
    docs, ds = docs_ds
    a = cooc_triangles(ds)
    b = cooc_triangles(ds.repartition(5))
    pd.testing.assert_frame_equal(a, b)


def test_empty_graph(ray_session):
    import ray.data as rd

    # every term unique -> nothing survives min_df=2
    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["aaa bbb", "ccc ddd"]})
    ds = rd.from_pandas(docs)
    pr = term_pagerank(ds)
    assert len(pr) == 0 and list(pr.columns) == ["term", "rank_e9"]
    tri = cooc_triangles(ds)
    assert int(tri.n_triangles[0]) == 0 and int(tri.n_edges[0]) == 0

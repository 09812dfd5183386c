"""Proximity (NEAR/window) search: rank-identity vs the independent naive
oracle, window-edge behavior, composition with tombstones, and the
min-cover-span helper (2-label vectorized path vs the generic
two-pointer)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import (
    BruteForceBM25,
    QueryEngine,
    _min_cover_spans,
)


@pytest.fixture(scope="module")
def near_index(small_corpus, tmp_path_factory, ray_session):
    idx = tmp_path_factory.mktemp("nearidx") / "idx"
    build_index(small_corpus, idx,
                PipelineConfig(num_shards=4, with_positions=True))
    return str(idx)


@pytest.fixture(scope="module")
def near_oracle(small_corpus):
    return BruteForceBM25.from_corpus_files(small_corpus)


NEAR_QUERIES = [
    ("alpha beta", 1),        # adjacency window
    ("alpha beta", 3),
    ("the sessionmark", 2),
    ("the sessionmark", 10),
    ("alpha sessionmark the", 6),   # 3 distinct terms -> two-pointer path
    ("alpha alpha beta", 4),        # duplicate query tokens collapse
    ("zzzqabsent the", 5),          # absent term -> empty
    ("tok00042", 0),                # single term: window 0 still matches
]


def test_near_rank_identity(near_index, near_oracle):
    eng = QueryEngine(near_index)
    for q, w in NEAR_QUERIES:
        assert eng.search_near(q, 10, window=w) == near_oracle.search_near(
            q, 10, window=w), (q, w)


def test_near_is_superset_of_phrase(near_index, near_oracle):
    """Every phrase match is a NEAR match at window = len(phrase) - 1."""
    eng = QueryEngine(near_index)
    ph = {d for d, _ in eng.search_phrase("alpha beta", 10**6)}
    nr = {d for d, _ in eng.search_near("alpha beta", 10**6, window=1)}
    assert ph <= nr


def test_near_window_monotone(near_index):
    """Growing the window only adds matches (never reorders survivors'
    scores — scores don't depend on the window)."""
    eng = QueryEngine(near_index)
    prev: set[int] = set()
    for w in (1, 2, 4, 8, 16):
        cur = {d for d, _ in eng.search_near("the sessionmark", 10**6, window=w)}
        assert prev <= cur
        prev = cur


def test_near_respects_tombstones(small_corpus, tmp_path_factory, ray_session):
    from horus_ner_ray.pipelines.delete import delete_docs

    idx = tmp_path_factory.mktemp("neardel") / "idx"
    build_index(small_corpus, idx,
                PipelineConfig(num_shards=4, with_positions=True))
    deleted = list(range(0, 60, 4))
    delete_docs(idx, deleted)
    o = BruteForceBM25.from_corpus_files(small_corpus)
    o.delete_docs(deleted)
    eng = QueryEngine(idx)
    for q, w in NEAR_QUERIES[:5]:
        assert eng.search_near(q, 10, window=w) == o.search_near(q, 10, window=w)


def test_near_served_end_to_end(near_index, near_oracle, ray_session):
    """NEAR through ScorerActor, QueryService and the HTTP front —
    bitwise-identical to the oracle; window rides as a query param;
    near+exclude rejected with 400."""
    import json
    import threading
    import urllib.error
    import urllib.parse
    import urllib.request

    from horus_ner_ray.serve import make_http_server

    server, service = make_http_server(near_index, port=0, n_actors=2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        for q, w in NEAR_QUERIES[:4]:
            url = base + "/search?" + urllib.parse.urlencode(
                {"q": q, "k": 5, "mode": "near", "window": w})
            with urllib.request.urlopen(url, timeout=30) as r:
                hits = json.loads(r.read())["hits"]
            want = near_oracle.search_near(q, 5, window=w)
            assert [(h["doc_id"], h["score"]) for h in hits] == want, (q, w)
        try:
            urllib.request.urlopen(
                base + "/search?q=a+b&mode=near&exclude=c", timeout=10)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        service.close()


def _naive_cover(pos, label, n_labels):
    best = np.inf
    occ = sorted(zip(pos, label))
    for s in range(len(occ)):
        seen = set()
        for e in range(s, len(occ)):
            seen.add(occ[e][1])
            if len(seen) == n_labels:
                best = min(best, occ[e][0] - occ[s][0])
                break
    return best


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 4), st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 3)),
    min_size=0, max_size=60))
def test_min_cover_spans_matches_naive(n_labels, rows):
    """Property: the vectorized/two-pointer helper equals the quadratic
    naive cover for every candidate."""
    rows = [(c, p, min(l, n_labels - 1)) for c, p, l in rows]
    rows.sort()
    if rows:
        ci = np.array([r[0] for r in rows], dtype=np.int64)
        pp = np.array([r[1] for r in rows], dtype=np.int64)
        ll = np.array([r[2] for r in rows], dtype=np.int64)
    else:
        ci = pp = ll = np.zeros(0, dtype=np.int64)
    got = _min_cover_spans(ci, pp, ll, n_labels, 3)
    for c in range(3):
        m = ci == c
        assert got[c] == _naive_cover(pp[m], ll[m], n_labels), (c, rows)


# --------------------------------------------------------------------------
# span_not ("A away from B")
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pos_engines(near_index, near_oracle):
    from horus_ner_ray.pipelines.query import QueryEngine

    return QueryEngine(near_index), near_oracle


def test_span_not_rank_identical(pos_engines):
    eng, bf = pos_engines
    cases = [
        ("sessionmark", "the", 1),
        ("sessionmark", "the", 3),
        ("tok00007 tok00011", "sessionmark", 2),
        ("alpha", "beta", 1),
        ("tok00013", "zzzqabsent", 2),   # absent B == plain OR
        ("zzzqabsent", "the", 2),        # absent A -> empty
    ]
    hit_any = drop_any = False
    for a, b, dist in cases:
        got = eng.search_span_not(a, b, k=10, dist=dist)
        want = bf.search_span_not(a, b, k=10, dist=dist)
        assert got == want, (a, b, dist)
        hit_any = hit_any or bool(got)
        plain = eng.search(a, k=10)
        drop_any = drop_any or (bool(plain) and got != plain)
    assert hit_any and drop_any  # exercises both match and exclusion


def test_span_not_absent_b_is_plain_or(pos_engines):
    eng, _bf = pos_engines
    assert eng.search_span_not("tok00013", "zzzqabsent", k=10, dist=3) == \
        eng.search("tok00013", k=10)


def test_span_not_negative_dist_raises(pos_engines):
    eng, bf = pos_engines
    import pytest

    for obj in (eng, bf):
        with pytest.raises(ValueError, match="dist"):
            obj.search_span_not("a", "b", dist=-1)


def test_span_not_served_end_to_end(near_index, near_oracle, ray_session):
    import pandas as pd

    from horus_ner_ray.pipelines.query import QueryEngine, ScorerActor

    eng = QueryEngine(near_index)
    actor = ScorerActor(near_index)
    out = actor(pd.DataFrame([{
        "query_id": 0, "text": "sessionmark", "k": 5,
        "mode": "span_not", "negative": "the", "dist": 2}]))
    want = eng.search_span_not("sessionmark", "the", k=5, dist=2)
    assert [(int(d), float(s)) for d, s in
            zip(out["doc_id"], out["score"])] == want

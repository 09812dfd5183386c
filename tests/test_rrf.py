"""Hybrid reciprocal-rank fusion (the ES/Lucene RRF retriever): engine
vs brute-force exact-rank parity, the shared integer fusion rule, and
serving pass-through.  Fused scores are exact integers, so parity is
equality — no float tolerance anywhere."""

import pytest

from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine, rrf_fuse
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def test_rrf_fuse_integer_rule():
    """The fusion arithmetic on hand-checkable inputs: rank 1 in one list
    contributes 1_000_000 // 61 = 16393, rank 2 -> 16129, and a doc in
    both lists sums its contributions."""
    a = [(7, 3.0), (5, 2.0)]
    b = [(5, -1.0), (9, -2.0)]
    got = rrf_fuse([a, b], k=10)
    assert got == [(5, 16129 + 16393), (7, 16393), (9, 16129)]


def test_rrf_fuse_e6_domain_rank_assignment():
    """Two float scores that collide after e6 rounding must rank by
    doc_id asc REGARDLESS of input order — rank assignment happens in
    the integer domain."""
    a = [(9, 1.0000004), (3, 1.0000001)]   # both floor to 1_000_000
    b = [(3, 1.0000001), (9, 1.0000004)]
    assert rrf_fuse([a], k=2) == rrf_fuse([b], k=2)
    assert rrf_fuse([a], k=2)[0][0] == 3   # doc asc wins the e6 tie


def test_rrf_fuse_window_bounds_contributions():
    hits = [(d, float(100 - d)) for d in range(50)]
    got = dict(rrf_fuse([hits], k=100, window=5))
    assert set(got) == set(range(5))


def test_fused_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    nonempty = 0
    for q in reference_queries(k=10):
        for window in (5, 20, 100):
            got = eng.search_fused(q["text"], k=10, window=window)
            want = bf.search_fused(q["text"], k=10, window=window)
            assert got == want, (q["text"], window)
            nonempty += bool(got)
    assert nonempty >= 15


def test_fused_actually_differs_from_both_phases(engines):
    """Somewhere fusion must produce an order that is neither pure BM25
    nor pure LM — otherwise the fixture never exercises the blend."""
    eng, _bf = engines
    differs = False
    for q in reference_queries(k=10):
        fused = [d for d, _ in eng.search_fused(q["text"], k=10)]
        bm = [d for d, _ in eng.search(q["text"], k=10)]
        lm = [d for d, _ in eng.search_lm(q["text"], k=10)]
        if fused and fused != bm and fused != lm:
            differs = True
    assert differs


def test_fused_empty_on_absent_terms(engines):
    eng, bf = engines
    assert eng.search_fused("zzzqnotfound", k=5) == []
    assert bf.search_fused("zzzqnotfound", k=5) == []


def test_fused_through_pool(built_index, ray_session):
    """QueryService.fused must reproduce the engine's fused ranking
    exactly (integer scores)."""
    from horus_ner_ray.serve import QueryService

    idx, _res = built_index
    svc = QueryService(str(idx), n_actors=2)
    try:
        eng = QueryEngine(idx)
        for q in reference_queries(k=10)[:6]:
            want = eng.search_fused(q["text"], k=10)
            got = [(h["doc_id"], h["rrf"]) for h in svc.fused(q["text"], k=10)]
            assert got == want, q["text"]
    finally:
        svc.close()

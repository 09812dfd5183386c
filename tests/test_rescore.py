"""Two-phase LM rescoring (Lucene Rescorer / ES rescore window): engine
vs brute-force bitwise rank parity, window semantics, lm_scores
consistency with search_lm, and serving pass-through."""

import pytest

from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def test_rescore_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    nonempty = 0
    for q in reference_queries(k=10):
        for window in (5, 20, 100):
            got = eng.rescore_lm(q["text"], k=10, window=window)
            want = bf.rescore_lm(q["text"], k=10, window=window)
            assert got == want, (q["text"], window)
            nonempty += bool(got)
    assert nonempty >= 15


def test_lm_scores_bitwise_match_search_lm(engines):
    """A doc's windowed LM score must be bitwise the score search_lm
    assigns it in the full ranking."""
    eng, _bf = engines
    for q in reference_queries(k=10)[:6]:
        full = dict(eng.search_lm(q["text"], k=10**6))
        if not full:
            continue
        some = list(full)[:25]
        sc = eng.lm_scores(q["text"], some)
        for d in some:
            assert sc[d] == full[d], (q["text"], d)


def test_rescore_actually_reorders(engines):
    """Somewhere the LM reranking must change the BM25 order — otherwise
    the fixture never exercises phase 2."""
    eng, _bf = engines
    changed = False
    for q in reference_queries(k=10):
        bm = [d for d, _ in eng.search(q["text"], k=10)]
        rs = [d for d, _ in eng.rescore_lm(q["text"], k=10, window=10)]
        assert set(rs) == set(bm[: len(rs)]), q["text"]  # same window
        if rs != bm[: len(rs)]:
            changed = True
    assert changed


def test_rescore_window_bounds_candidates(engines):
    """k > window: only window members can come back."""
    eng, _bf = engines
    out = eng.rescore_lm("the sessionmark", k=50, window=5)
    assert len(out) <= 5
    win = {d for d, _ in eng.search("the sessionmark", k=5)}
    assert {d for d, _ in out} <= win


def test_service_rescore(built_index, ray_session):
    from horus_ner_ray.serve import QueryService

    idx, _res = built_index
    eng = QueryEngine(idx)
    svc = QueryService(idx, n_actors=2)
    try:
        for q in reference_queries(k=10)[:4]:
            want = eng.rescore_lm(q["text"], k=8, window=30)
            got = svc.rescore(q["text"], k=8, window=30)
            assert [(h["doc_id"], h["score"]) for h in got] == want, q["text"]
    finally:
        svc.close()

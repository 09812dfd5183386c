"""Recency function-score search (linear decay over stored ts): engine
vs brute-force exact-rank parity (integer combined domain), the shared
decay rule, and pool pass-through."""

import numpy as np
import pytest

from horus_ner_ray.pipelines.query import (BruteForceBM25, QueryEngine,
                                           recency_boost_e6)
from horus_ner_ray.synth import reference_queries

NOW_US = int(np.datetime64("2025-06-20T00:00:00", "us").astype(np.int64))
HORIZON_S = 30 * 86400


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def test_decay_rule_hand_values():
    # fresh doc: full boost; 15 of 30 days old: half; beyond horizon: 0;
    # missing ts: 0; future ts clamps to full boost
    assert recency_boost_e6(NOW_US, NOW_US, HORIZON_S, 1_000_000) == 1_000_000
    half = NOW_US - 15 * 86400 * 1_000_000
    assert recency_boost_e6(half, NOW_US, HORIZON_S, 1_000_000) == 500_000
    old = NOW_US - 31 * 86400 * 1_000_000
    assert recency_boost_e6(old, NOW_US, HORIZON_S, 1_000_000) == 0
    assert recency_boost_e6(None, NOW_US, HORIZON_S, 1_000_000) == 0
    future = NOW_US + 86400 * 1_000_000
    assert recency_boost_e6(future, NOW_US, HORIZON_S, 1_000_000) == 1_000_000
    # integer flooring, not rounding
    assert recency_boost_e6(NOW_US - 1_000_000, NOW_US, 3, 10) == \
        10 * 2 // 3


def test_recency_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    nonempty = 0
    for q in reference_queries(k=10):
        for mode in ("or", "and"):
            got = eng.search_recency(q["text"], k=10, now_us=NOW_US,
                                     horizon_s=HORIZON_S, mode=mode)
            want = bf.search_recency(q["text"], k=10, now_us=NOW_US,
                                     horizon_s=HORIZON_S, mode=mode)
            assert got == want, (q["text"], mode)
            nonempty += bool(got)
    assert nonempty >= 10


def test_recency_actually_reorders(engines):
    """With a large boost the ranking must differ from pure BM25 for at
    least one fixture query — otherwise the decay is never exercised."""
    eng, _bf = engines
    changed = False
    for q in reference_queries(k=10):
        bm = [d for d, _ in eng.search(q["text"], k=10)]
        rc = [d for d, _ in eng.search_recency(
            q["text"], k=10, now_us=NOW_US, horizon_s=HORIZON_S,
            boost_e6=50_000_000)]
        if bm and rc != bm:
            changed = True
    assert changed


def test_recency_zero_boost_is_bm25_order(engines):
    eng, _bf = engines
    for q in reference_queries(k=10)[:5]:
        bm = [d for d, _ in eng.search(q["text"], k=10)]
        rc = [d for d, _ in eng.search_recency(
            q["text"], k=10, now_us=NOW_US, boost_e6=0)]
        assert rc == bm, q["text"]


def test_recency_rejects_bad_horizon(engines):
    eng, bf = engines
    with pytest.raises(ValueError):
        eng.search_recency("the", horizon_s=0)
    with pytest.raises(ValueError):
        bf.search_recency("the", horizon_s=0)


def test_recency_through_pool(built_index, ray_session):
    from horus_ner_ray.serve import QueryService

    idx, _res = built_index
    svc = QueryService(str(idx), n_actors=2)
    try:
        eng = QueryEngine(idx)
        for q in reference_queries(k=10)[:6]:
            want = eng.search_recency(q["text"], k=10, now_us=NOW_US,
                                      horizon_s=HORIZON_S)
            got = [(h["doc_id"], h["score_e6"])
                   for h in svc.recency(q["text"], k=10, now_us=NOW_US,
                                        horizon_s=HORIZON_S)]
            assert got == want, q["text"]
    finally:
        svc.close()

"""MMR result diversification: engine vs brute-force exact parity, the
shared integer selection rule, and diversification actually firing."""

import pytest

from horus_ner_ray.pipelines.query import (BruteForceBM25, QueryEngine,
                                           mmr_select)
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def test_mmr_select_hand_case():
    # doc 1 (rank1) and doc 2 (rank2) near-identical; doc 3 (rank3)
    # disjoint -> at diversity-heavy lam10=3, after seeding with 1 MMR
    # must prefer 3 over 2 (at lam10=7 relevance still wins: checked)
    toksets = {1: {"a", "b", "c"}, 2: {"a", "b", "d"}, 3: {"x", "y"}}
    assert mmr_select([1, 2, 3], toksets, k=3, pool_n=3, lam10=3) == \
        [1, 3, 2]
    assert mmr_select([1, 2, 3], toksets, k=3, pool_n=3, lam10=7) == \
        [1, 2, 3]
    # pure relevance (lam10=10) keeps the original order
    assert mmr_select([1, 2, 3], toksets, k=3, pool_n=3, lam10=10) == \
        [1, 2, 3]


def test_mmr_select_edges():
    assert mmr_select([], {}, k=5, pool_n=3) == []
    assert mmr_select([7], {7: {"a"}}, k=5, pool_n=3) == [7]
    assert mmr_select([1, 2], {1: {"a"}, 2: {"a"}}, k=0, pool_n=3) == []
    # empty token sets: sim 0/0 defined as 0, no crash
    assert mmr_select([1, 2], {1: set(), 2: set()}, k=2, pool_n=2) == [1, 2]


def test_diverse_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    nonempty = 0
    for q in reference_queries(k=10):
        for pool_n in (5, 15):
            got = eng.search_diverse(q["text"], k=5, pool_n=pool_n)
            want = bf.search_diverse(q["text"], k=5, pool_n=pool_n)
            assert got == want, (q["text"], pool_n)
            nonempty += bool(got)
    assert nonempty >= 10


def test_diverse_actually_reorders(engines):
    """Somewhere MMR must deviate from pure BM25 order, and picks must
    always be a subset of the candidate pool."""
    eng, _bf = engines
    changed = False
    for q in reference_queries(k=10):
        pool = [d for d, _ in eng.search(q["text"], k=15)]
        div = eng.search_diverse(q["text"], k=5, pool_n=15, lam10=3)
        assert set(div) <= set(pool), q["text"]
        if div and div != pool[: len(div)]:
            changed = True
    assert changed


def test_diverse_absent_terms(engines):
    eng, bf = engines
    assert eng.search_diverse("zzzqnotfound", k=5) == []
    assert bf.search_diverse("zzzqnotfound", k=5) == []

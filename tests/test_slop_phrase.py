"""Ordered sloppy phrase (Lucene phrase slop): engine chain-sweep vs the
brute-force explicit-max DP, slop=0 == exact adjacency for distinct
terms, repeats rejection, filter composition, serving pass-through, and
a randomized-document property fuzz."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def pos_index(small_corpus, tmp_path_factory, ray_session):
    idx = tmp_path_factory.mktemp("slopidx") / "idx"
    build_index(small_corpus, idx,
                PipelineConfig(num_shards=4, with_positions=True))
    return str(idx)


@pytest.fixture(scope="module")
def oracle(small_corpus):
    return BruteForceBM25.from_corpus_files(small_corpus)


SLOP_QUERIES = [
    "alpha beta",
    "beta alpha",
    "the sessionmark",
    "sessionmark the",
    "uniqueedge1 appears",
    "the session data",
    "session the",
]


def test_slop_rank_identical_to_bruteforce(pos_index, oracle):
    eng = QueryEngine(pos_index)
    nonempty = 0
    for q in SLOP_QUERIES:
        for slop in (1, 2, 4, 16, 200):
            got = eng.search_phrase(q, k=10, slop=slop)
            want = oracle.search_phrase(q, k=10, slop=slop)
            assert got == want, (q, slop)
            nonempty += bool(got)
    assert nonempty >= 10


def test_slop_zero_rule_equals_exact_adjacency(pos_index):
    """For distinct-term phrases the slop=0 ordered-window rule and the
    adjacency path must agree exactly (stretch 0 == consecutive)."""
    eng = QueryEngine(pos_index)
    for q in SLOP_QUERIES:
        via_rule = eng._search_phrase_slop(q, 10, None, None, 0)
        exact = eng.search_phrase(q, k=10)
        assert via_rule == exact, q


def test_slop_widens_the_match_set(pos_index):
    """Growing slop must be monotone: every slop-s match remains a
    slop-(s+1) match, and somewhere a gap phrase matches only with
    slop > 0 — otherwise the fixture never exercises the window."""
    eng = QueryEngine(pos_index)
    widened = False
    for q in SLOP_QUERIES:
        prev: set[int] = set()
        for slop in (0, 1, 2, 8, 64):
            cur = {d for d, _ in eng.search_phrase(q, k=10**6, slop=slop)
                   } if slop else {d for d, _ in eng.search_phrase(q, k=10**6)}
            assert prev <= cur, (q, slop)
            if prev and cur > prev:
                widened = True
            prev = cur
    assert widened


def test_slop_requires_distinct_terms(pos_index, oracle):
    eng = QueryEngine(pos_index)
    with pytest.raises(ValueError, match="distinct"):
        eng.search_phrase("alpha beta alpha", k=5, slop=2)
    with pytest.raises(ValueError, match="distinct"):
        oracle.search_phrase("alpha beta alpha", k=5, slop=2)


def test_slop_respects_role_filter(pos_index, oracle):
    """Filtered slop search must be the filtered subset with untouched
    scores (stats stay global)."""
    eng = QueryEngine(pos_index)
    for q in SLOP_QUERIES[:4]:
        got = eng.search_phrase(q, k=10, role="user", slop=4)
        full = dict(eng.search_phrase(q, k=1000, slop=4))
        assert all(d in full and s == full[d] for d, s in got)
        role = {d: a[0] for d, a in oracle.attrs.items()}
        assert all(role.get(d) == "user" for d, _ in got)


def test_serving_slop_param(pos_index, ray_session):
    import pandas as pd

    from horus_ner_ray.pipelines.query import ScorerActor

    actor = ScorerActor(pos_index)
    eng = QueryEngine(pos_index)
    out = actor(pd.DataFrame([
        {"query_id": 0, "text": "the sessionmark", "k": 5,
         "mode": "phrase", "slop": 3},
    ]))
    want = eng.search_phrase("the sessionmark", k=5, slop=3)
    assert [(int(d), float(s)) for d, s
            in zip(out["doc_id"], out["score"])] == want
    with pytest.raises(ValueError, match="slop= requires"):
        actor(pd.DataFrame([
            {"query_id": 0, "text": "the sessionmark", "k": 5, "slop": 3},
        ]))


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_slop_fuzz_matches_naive_cover(oracle, data):
    """Property fuzz of the DP itself: random token streams, random
    ordered 2-3-term queries — the brute DP must equal a cubic
    enumerate-all-chains reference."""
    vocab = ["a", "b", "c", "d", "e"]
    toks = data.draw(st.lists(st.sampled_from(vocab), min_size=3,
                              max_size=40))
    nq = data.draw(st.integers(2, 3))
    qterms = data.draw(st.permutations(vocab))[:nq]
    slop = data.draw(st.integers(0, 6))
    bf = BruteForceBM25()
    bf.add_doc(0, " ".join(toks))
    got = {d for d, _ in bf.search_phrase(" ".join(qterms), k=10, slop=slop)}
    # cubic reference: try every combination of one occurrence per term
    occs = [[i for i, w in enumerate(toks) if w == t] for t in qterms]
    match = False
    import itertools

    for combo in itertools.product(*occs):
        if all(a < b for a, b in zip(combo, combo[1:])) \
                and combo[-1] - combo[0] - (len(combo) - 1) <= slop:
            match = True
            break
    assert got == ({0} if match else set())

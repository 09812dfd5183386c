"""Boosting (negative demotion), dis_max, and match_phrase_prefix:
engine vs brute-force rank identity + serving pass-through."""

import pandas as pd
import pytest

from horus_ner_ray.pipelines.query import (
    BruteForceBM25,
    QueryEngine,
    ScorerActor,
)
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


@pytest.fixture(scope="module")
def pos_engines(small_corpus, tmp_path_factory, ray_session):
    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index

    idx = tmp_path_factory.mktemp("ppidx") / "idx"
    build_index(small_corpus, idx,
                PipelineConfig(num_shards=4, with_positions=True))
    return (str(idx), QueryEngine(str(idx)),
            BruteForceBM25.from_corpus_files(small_corpus))


NEGATIVES = ["the", "tok00042 tok00007", "zzzqabsent", ""]


def test_boosting_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    for q in reference_queries(k=10):
        for neg in NEGATIVES:
            for nb in (0.5, 0.25, 1.0):
                got = eng.search_boosting(q["text"], neg, k=10,
                                          negative_boost=nb)
                want = bf.search_boosting(q["text"], neg, k=10,
                                          negative_boost=nb)
                assert got == want, (q["text"], neg, nb)


def test_boosting_demotes_not_excludes(engines):
    eng, _bf = engines
    plain = eng.search("tok00007 tok00011", k=50)
    demoted = eng.search_boosting("tok00007 tok00011", "tok00011", k=50,
                                  negative_boost=0.25)
    assert {d for d, _ in plain} == {d for d, _ in demoted}  # no exclusion
    assert [d for d, _ in plain] != [d for d, _ in demoted]  # reordered
    # neutral boost 1.0 is bitwise the plain ranking
    assert eng.search_boosting("tok00007 tok00011", "tok00011", k=50,
                               negative_boost=1.0) == plain


def test_boosting_bad_boost_raises(engines):
    eng, bf = engines
    for obj in (eng, bf):
        with pytest.raises(ValueError, match="negative_boost"):
            obj.search_boosting("the", "to", k=5, negative_boost=0.0)
        with pytest.raises(ValueError, match="negative_boost"):
            obj.search_boosting("the", "to", k=5, negative_boost=2.0)


DISMAX_CASES = [
    ["tok00007 tok00011", "the sessionmark"],
    ["alpha beta", "tok00042", "uniqueedge1 the"],
    ["zzzqabsent", "tok00013"],          # one empty subquery
    ["zzzqabsent", "qqqqzz"],            # all empty
]


def test_dismax_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    for qs in DISMAX_CASES:
        for tb in (0.5, 0.25, 0.0, 1.0):
            got = eng.search_dismax(qs, k=10, tie_breaker=tb)
            want = bf.search_dismax(qs, k=10, tie_breaker=tb)
            assert got == want, (qs, tb)


def test_dismax_tb_zero_is_pure_max(engines):
    eng, _bf = engines
    qs = ["tok00007", "tok00011"]
    got = dict(eng.search_dismax(qs, k=200, tie_breaker=0.0))
    a = dict(eng.search(qs[0], k=200))
    b = dict(eng.search(qs[1], k=200))
    for d, s in got.items():
        assert s == max(a.get(d, 0.0), b.get(d, 0.0))


PP_CASES = [
    ("the tok000", 50),
    ("the tok000", 5),        # tight expansion cap
    ("to the sessionm", 50),  # two fixed terms
    ("the zzzqabsen", 50),    # prefix matches nothing -> empty
    ("zzzqabsent tok000", 50),  # fixed term absent -> empty
]


def test_phrase_prefix_rank_identical_to_bruteforce(pos_engines):
    _idx, eng, bf = pos_engines
    hit_any = False
    for text, mx in PP_CASES:
        got = eng.search_phrase_prefix(text, k=10, max_expansions=mx)
        want = bf.search_phrase_prefix(text, k=10, max_expansions=mx)
        assert got == want, (text, mx)
        hit_any = hit_any or bool(got)
    assert hit_any  # the fixture must exercise a non-empty match


def test_phrase_prefix_needs_two_tokens(pos_engines):
    _idx, eng, bf = pos_engines
    for obj in (eng, bf):
        with pytest.raises(ValueError, match="2 tokens"):
            obj.search_phrase_prefix("tok000", k=5)


def test_scorer_actor_new_modes(built_index):
    idx, _res = built_index
    actor = ScorerActor(idx)
    eng = QueryEngine(idx)

    out = actor(pd.DataFrame([{
        "query_id": 0, "text": "tok00007 tok00011", "k": 5,
        "mode": "boosting", "negative": "tok00011", "nb": 0.25}]))
    want = eng.search_boosting("tok00007 tok00011", "tok00011", k=5,
                               negative_boost=0.25)
    assert [(int(d), float(s)) for d, s in
            zip(out["doc_id"], out["score"])] == want

    out = actor(pd.DataFrame([{
        "query_id": 0, "text": "tok00007 tok00011|the sessionmark",
        "k": 5, "mode": "dismax", "tie": 0.25}]))
    want = eng.search_dismax(["tok00007 tok00011", "the sessionmark"],
                             k=5, tie_breaker=0.25)
    assert [(int(d), float(s)) for d, s in
            zip(out["doc_id"], out["score"])] == want


def test_scorer_actor_phrase_prefix(pos_engines):
    idx, eng, _bf = pos_engines
    actor = ScorerActor(idx)
    out = actor(pd.DataFrame([{
        "query_id": 0, "text": "the tok000", "k": 5,
        "mode": "phrase_prefix", "max_exp": 50}]))
    want = eng.search_phrase_prefix("the tok000", k=5, max_expansions=50)
    assert [(int(d), float(s)) for d, s in
            zip(out["doc_id"], out["score"])] == want

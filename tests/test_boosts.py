"""Per-term query boosts (Lucene ``term^boost``): engine vs brute-force
rank-identity, neutral-boost bitwise identity, filter composition, the
shared boost-spec parser, and serving pass-through."""

import pytest

from horus_ner_ray.pipelines.query import (
    BruteForceBM25,
    QueryEngine,
    parse_boosts,
    query_terms,
)
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def _boost_maps(text):
    """A few deterministic boost maps over the query's own terms (plus one
    absent term, which must be a no-op)."""
    terms = query_terms(text)
    maps = []
    if terms:
        maps.append({terms[0]: 2.0})
        maps.append({t: (0.5 if i % 2 else 3.0) for i, t in enumerate(terms)})
        maps.append({terms[-1]: 0.25, "zzzqnotfound": 9.0})
    maps.append({"zzzqnotfound": 4.0})
    return maps


def test_boost_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    for q in reference_queries(k=10):
        for boosts in _boost_maps(q["text"]):
            for mode in ("or", "and"):
                got = eng.search(q["text"], k=10, mode=mode, boosts=boosts)
                want = bf.search(q["text"], k=10, mode=mode, boosts=boosts)
                assert got == want, (q["text"], mode, boosts)


def test_neutral_boost_is_bitwise_plain_search(engines):
    """boost=1.0 multiplies idf by exactly 1.0 (IEEE identity) — results
    must be bitwise identical to the unboosted search."""
    eng, _bf = engines
    for q in reference_queries(k=10)[:6]:
        ones = {t: 1.0 for t in query_terms(q["text"])}
        assert eng.search(q["text"], k=10, boosts=ones) == eng.search(
            q["text"], k=10)


def test_boost_changes_ranking_somewhere(engines):
    """A large boost on one term must be able to reorder the top-k —
    otherwise the fixture doesn't exercise the feature."""
    eng, _bf = engines
    changed = False
    for q in reference_queries(k=10):
        terms = query_terms(q["text"])
        if len(terms) < 2:
            continue
        plain = [d for d, _ in eng.search(q["text"], k=10)]
        boosted = [d for d, _ in eng.search(q["text"], k=10,
                                            boosts={terms[0]: 64.0})]
        if plain != boosted:
            changed = True
            break
    assert changed


def test_boost_composes_with_filters(engines):
    eng, bf = engines
    for q in reference_queries(k=10)[:5]:
        terms = query_terms(q["text"])
        if not terms:
            continue
        boosts = {terms[0]: 2.0}
        got = eng.search(q["text"], k=10, boosts=boosts, role="user")
        want = bf.search(q["text"], k=10, boosts=boosts, role="user")
        assert got == want
        got2 = eng.search(q["text"], k=10, boosts=boosts, exclude="slow")
        want2 = bf.search(q["text"], k=10, boosts=boosts, exclude="slow")
        assert got2 == want2


def test_nonpositive_boost_raises(engines):
    eng, _bf = engines
    with pytest.raises(ValueError, match="boosts must be > 0"):
        eng.search("batch join", k=5, boosts={"batch": 0.0})
    with pytest.raises(ValueError, match="boosts must be > 0"):
        eng.search("batch join", k=5, boosts={"join": -1.5})


def test_parse_boosts():
    assert parse_boosts("batch:2,join:0.5") == {"batch": 2.0, "join": 0.5}
    # keys normalize through the shared tokenizer rule
    assert parse_boosts("Batch:2") == {"batch": 2.0}
    assert parse_boosts(" a:1.5 , b:3 ") == {"a": 1.5, "b": 3.0}
    with pytest.raises(ValueError, match="malformed"):
        parse_boosts("nocolon")
    with pytest.raises(ValueError, match="single term"):
        parse_boosts("two words:2")
    with pytest.raises(ValueError, match="> 0"):
        parse_boosts("a:0")


def test_scorer_actor_boost_column(built_index):
    """The serving row path parses the boost spec and matches the direct
    engine call; non-or/and modes reject it loudly."""
    import pandas as pd

    from horus_ner_ray.pipelines.query import ScorerActor

    idx, _res = built_index
    actor = ScorerActor(idx)
    out = actor(pd.DataFrame([
        {"query_id": 0, "text": "batch join", "k": 5, "boost": "batch:64"},
    ]))
    eng = QueryEngine(idx)
    want = eng.search("batch join", k=5, boosts={"batch": 64.0})
    got = list(zip(out["doc_id"], out["score"]))
    assert [(int(d), float(s)) for d, s in got] == want

    with pytest.raises(ValueError, match="boost= composes only"):
        actor(pd.DataFrame([
            {"query_id": 0, "text": "batch join", "k": 5,
             "boost": "batch:2", "mode": "phrase"},
        ]))


def test_search_relaxed_cascade(engines):
    """Each tier fires on the right fixture query and matches brute."""
    eng, bf = engines
    cases = [
        ("the sessionmark", "and"),           # conjunction matches
        ("the zzzqabsent", "or"),             # absent term kills AND
        ("sessionnark zzqx", "corrected"),    # only the rewrite matches
        ("qqqqqqzz", "corrected"),            # nothing anywhere
    ]
    for text, want_tier in cases:
        gt, gh = eng.search_relaxed(text, k=10)
        wt, wh = bf.search_relaxed(text, k=10)
        assert gt == wt == want_tier, (text, gt, wt)
        assert gh == wh, text
        if text != "qqqqqqzz":
            assert gh, text
    # the chosen tier's hits equal that tier's direct search
    tier, hits = eng.search_relaxed("the zzzqabsent", k=10)
    assert hits == eng.search("the zzzqabsent", k=10, mode="or")

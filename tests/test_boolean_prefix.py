"""Boolean-NOT (exclude=) and trailing-wildcard (search_prefix) search:
engine vs brute-force rank identity, dictionary-expansion correctness,
edge semantics (absent exclusion, self-exclusion, empty expansion)."""

import pytest

from horus_ner_ray.pipelines.query import (
    BruteForceBM25,
    QueryEngine,
    parse_prefix_query,
)
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def test_parse_prefix_query():
    assert parse_prefix_query("ab* cd EF* cd") == (["cd"], ["ab", "ef"])
    assert parse_prefix_query("* !!") == ([], [])
    assert parse_prefix_query("x") == (["x"], [])


def test_expand_prefix_equals_linear_scan(engines):
    eng, _bf = engines
    vocab = [str(t) for t in eng._vocab]
    for p in ("a", "th", "s", "da", "zzz", "q"):
        want = sorted(t for t in vocab if t.startswith(p))
        assert eng.expand_prefix(p) == want, p
    assert eng.expand_prefix("") == []


def test_prefix_search_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    vocab = sorted({t for t in bf.postings})
    # wildcard variants derived from real corpus terms (2-char prefixes)
    prefixes = sorted({t[:2] + "*" for t in vocab[:40] if len(t) > 2})[:8]
    queries = [" ".join(prefixes[i : i + 2]) for i in range(0, len(prefixes), 2)]
    queries += [f"{q['text']} {prefixes[0]}" for q in reference_queries(k=5)[:4]]
    assert queries
    for text in queries:
        got = eng.search_prefix(text, k=10)
        want = bf.search_prefix(text, k=10)
        assert got == want, text


def test_prefix_no_match_empty(engines):
    eng, bf = engines
    assert eng.search_prefix("zzzqx*", k=10) == []
    assert bf.search_prefix("zzzqx*", k=10) == []


def test_prefix_without_wildcard_equals_plain_or(engines):
    eng, _bf = engines
    for q in reference_queries(k=5)[:4]:
        assert eng.search_prefix(q["text"], k=10) == eng.search(q["text"], k=10)


def test_exclude_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    vocab = sorted(bf.postings)
    excls = [vocab[len(vocab) // 3], f"{vocab[0]} {vocab[-1]}", vocab[-2]]
    for q in reference_queries(k=10):
        for ex in excls:
            got = eng.search(q["text"], k=10, exclude=ex)
            want = bf.search(q["text"], k=10, exclude=ex)
            assert got == want, (q["text"], ex)


def test_exclude_actually_excludes(engines, built_index):
    from horus_ner_ray.pipelines.query import fetch_docs, query_terms

    eng, bf = engines
    q = reference_queries(k=10)[0]["text"]
    ex = sorted(bf.postings)[5]
    hits = eng.search(q, k=20, exclude=ex)
    banned = {d for d, _ in bf.postings[ex]}
    assert all(d not in banned for d, _ in hits)
    # survivors keep their unexcluded scores
    plain = dict(eng.search(q, k=1000))
    for d, s in hits:
        assert plain[d] == s


def test_exclude_absent_term_is_noop(engines):
    eng, _bf = engines
    q = reference_queries(k=10)[0]["text"]
    assert eng.search(q, k=10, exclude="zzzqnotfound") == eng.search(q, k=10)


def test_self_exclusion_empty(engines):
    eng, bf = engines
    term = sorted(bf.postings)[10]
    assert eng.search(term, k=10, exclude=term) == []


def test_exclude_composes_with_role_filter(engines):
    eng, bf = engines
    ex = sorted(bf.postings)[7]
    for q in reference_queries(k=10)[:4]:
        got = eng.search(q["text"], k=10, role="user", exclude=ex)
        want = bf.search(q["text"], k=10, role="user", exclude=ex)
        assert got == want


def test_exclude_and_mode(engines):
    eng, bf = engines
    ex = sorted(bf.postings)[3]
    for q in reference_queries(k=10)[:4]:
        got = eng.search(q["text"], k=10, mode="and", exclude=ex)
        want = bf.search(q["text"], k=10, mode="and", exclude=ex)
        assert got == want


def test_more_like_this_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    some_ids = sorted(bf.dl)[::max(1, len(bf.dl) // 12)][:12]
    for d in some_ids:
        got = eng.more_like_this(d, k=10, m_terms=5)
        want = bf.more_like_this(d, k=10, m_terms=5)
        assert got == want, d


def test_more_like_this_excludes_source_and_missing(engines):
    eng, bf = engines
    d = sorted(bf.dl)[0]
    assert all(h != d for h, _ in eng.more_like_this(d, k=50))
    assert eng.more_like_this(10**12, k=10) == []  # unknown doc -> empty


def test_fuzzy_search_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    vocab = sorted(bf.postings)
    # typo variants of real corpus terms: drop a char, swap a char
    typos = [vocab[4][:-1], vocab[8] + "x",
             ("z" + vocab[12][1:]) if len(vocab[12]) > 2 else vocab[12]]
    for text in [" ".join(typos[:2]), typos[2], "qqqzzz"]:
        got = eng.search_fuzzy(text, k=10)
        want = bf.search_fuzzy(text, k=10)
        assert got == want, text


def test_fuzzy_expansion_includes_exact_term(engines):
    eng, bf = engines
    t = sorted(bf.postings)[6]
    assert t in eng.expand_fuzzy(t, max_dist=1)


def test_contains_search_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    vocab = sorted(bf.postings)
    subs = sorted({t[1:4] for t in vocab if len(t) >= 5})[:6]
    for sub in subs + ["zzzq"]:
        got = eng.search_contains(sub, k=10)
        want = bf.search_contains(sub, k=10)
        assert got == want, sub


def test_expand_contains_equals_linear_scan(engines):
    eng, _bf = engines
    vocab = [str(t) for t in eng._vocab]
    for sub in ("a", "th", "ses", "zzz"):
        assert eng.expand_contains(sub) == sorted(t for t in vocab if sub in t)
    assert eng.expand_contains("") == []


BOOLEAN_CASES = [
    ("the", "alpha beta", "sessionmark"),
    ("alpha beta", "the", ""),
    ("the sessionmark", "", "alpha"),
    ("the", "", ""),                      # pure must == AND mode
    ("zzzqabsent", "the", ""),            # absent must -> empty
    ("the", "zzzqabsent", ""),            # absent should is a no-op
    ("alpha", "alpha the", "alpha"),      # must_not over a must term -> empty
]


def test_boolean_query_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    for m, s, n in BOOLEAN_CASES:
        got = eng.search_boolean(m, s, n, 10)
        want = bf.search_boolean(m, s, n, 10)
        assert got == want, (m, s, n)


def test_boolean_reduces_to_and_and_composes(engines):
    eng, _bf = engines
    # no should/not: identical to AND mode (same candidacy, same terms)
    assert eng.search_boolean("alpha beta", k=10) == eng.search(
        "alpha beta", 10, mode="and")
    # should terms only ever raise a doc's score
    base = dict(eng.search_boolean("alpha beta", k=10**6))
    boosted = dict(eng.search_boolean("alpha beta", "the", k=10**6))
    assert set(base) == set(boosted)
    assert all(boosted[d] >= base[d] for d in base)


def test_boolean_respects_tombstones(small_corpus, tmp_path_factory,
                                     ray_session):
    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.delete import delete_docs

    idx = tmp_path_factory.mktemp("booldel") / "idx"
    build_index(small_corpus, idx, PipelineConfig(num_shards=3))
    deleted = list(range(1, 60, 4))
    delete_docs(idx, deleted)
    bf = BruteForceBM25.from_corpus_files(small_corpus)
    bf.delete_docs(deleted)
    eng = QueryEngine(idx)
    for m, s, n in BOOLEAN_CASES[:4]:
        assert eng.search_boolean(m, s, n, 10) == bf.search_boolean(m, s, n, 10)


def test_scorer_actor_rejects_should_without_boolean(built_index):
    """The actor path fails loudly too — a silently dropped boost clause
    would return plausible-but-unboosted results."""
    import pandas as pd

    from horus_ner_ray.pipelines.query import ScorerActor

    idx, _ = built_index
    actor = ScorerActor(idx)
    with pytest.raises(ValueError, match="should"):
        actor(pd.DataFrame([{"query_id": 0, "text": "the", "k": 5,
                             "mode": "or", "should": "alpha"}]))
    out = actor(pd.DataFrame([{"query_id": 0, "text": "the", "k": 5,
                               "mode": "boolean", "should": "alpha"}]))
    assert len(out) > 0

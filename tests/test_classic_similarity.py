"""Lucene ClassicSimilarity (vector-space TF-IDF) ranking: engine vs
brute-force bitwise parity, mode semantics, and the served
(pool scatter + HTTP mode=classic) paths."""

import json
import threading
import urllib.error
import urllib.parse
import urllib.request

import pytest

from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def test_classic_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    for q in reference_queries(k=10):
        for mode in ("or", "and"):
            got = eng.search_classic(q["text"], 10, mode=mode)
            want = bf.search_classic(q["text"], 10, mode=mode)
            assert got == want, (q["text"], mode)


def test_classic_differs_from_bm25_but_same_match_set(engines):
    eng, _bf = engines
    q = reference_queries(k=5)[0]["text"]
    cl = eng.search_classic(q, 10 ** 6)
    bm = eng.search(q, 10 ** 6)
    assert {d for d, _ in cl} == {d for d, _ in bm}  # same candidacy
    assert [s for _d, s in cl] != [s for _d, s in bm]
    # classic scores are strictly positive (idf >= 1 at df < N*e)
    assert all(s > 0 for _d, s in cl)


def test_classic_edge_semantics(engines):
    eng, _bf = engines
    assert eng.search_classic("zzzqabsent", 10) == []
    assert eng.search_classic("", 10) == []
    q = reference_queries(k=5)[0]["text"]
    assert eng.search_classic(q + " zzzqabsent", 10, mode="and") == []


def test_classic_served(built_index, ray_session, engines):
    from horus_ner_ray.serve import make_http_server

    idx, _ = built_index
    eng, _bf = engines
    server, service = make_http_server(idx, port=0, n_actors=2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        q = reference_queries(k=5)[1]["text"]
        want = eng.search_classic(q, 5)
        got = service.search(q, k=5, mode="classic")
        assert [(h["doc_id"], h["score"]) for h in got] == want
        url = base + "/search?" + urllib.parse.urlencode(
            {"q": q, "k": 5, "mode": "classic"})
        with urllib.request.urlopen(url, timeout=30) as r:
            j = json.loads(r.read())
        assert [(h["doc_id"], h["score"]) for h in j["hits"]] == want
        try:
            urllib.request.urlopen(
                base + "/search?q=the&mode=classic&role=user", timeout=10)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        service.close()


def test_wildcard_parity_and_semantics(engines):
    """Wildcard mode (see also tests covering regex): engine/brute
    parity + the translation rule's semantics."""
    eng, bf = engines
    for q in ("th*", "t?e", "*ing", "a?out b*"):
        assert eng.search_wildcard(q, 10) == bf.search_wildcard(q, 10), q
    # '?' is exactly one char (not optional), '*' may be empty
    vocab = {str(t) for t in eng._vocab}
    word = next(t for t in vocab if len(t) >= 3)
    assert eng.search_wildcard(word, 5) == eng.search(word, 5)  # literal
    q_star = word + "*"
    assert {d for d, _ in eng.search_wildcard(q_star, 10 ** 6)} >= \
        {d for d, _ in eng.search(word, 10 ** 6)}


def test_wildcard_served(built_index, ray_session, engines):
    from horus_ner_ray.serve import QueryService

    idx, _ = built_index
    eng, _bf = engines
    svc = QueryService(idx, n_actors=2)
    try:
        got = svc.search("th* a?out", k=5, mode="wildcard")
        want = eng.search_wildcard("th* a?out", 5)
        assert [(h["doc_id"], h["score"]) for h in got] == want
    finally:
        svc.close()

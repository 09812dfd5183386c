"""OSA (Damerau restricted) distance + transposition-aware fuzzy search:
vectorized DP vs a scalar reference, engine/brute parity, served params."""

import json
import threading
import urllib.error
import urllib.parse
import urllib.request

import numpy as np
import pytest

from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine
from horus_ner_ray.stages.fuzzy import levenshtein_distances, osa_distances
from horus_ner_ray.synth import reference_queries


def _osa_scalar(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


def test_osa_known_cases():
    pairs = [("ca", "abc", 3),     # the OSA != full-DL case (DL = 2)
             ("abcd", "acbd", 1),  # one adjacent swap
             ("ab", "ba", 1),
             ("abc", "abc", 0),
             ("", "abc", 3), ("abc", "", 3), ("", "", 0),
             ("kitten", "sitting", 3)]
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = osa_distances(a, b)
    assert list(got) == [p[2] for p in pairs]


def test_osa_matches_scalar_reference():
    rng = np.random.default_rng(11)
    alphabet = list("abcde")
    pairs = []
    for _ in range(300):
        la, lb = rng.integers(0, 8, 2)
        pairs.append(("".join(rng.choice(alphabet, la)),
                      "".join(rng.choice(alphabet, lb))))
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = osa_distances(a, b)
    want = [_osa_scalar(x, y) for x, y in pairs]
    assert list(got) == want
    # OSA <= Levenshtein always; equal when no transposition helps
    lev = levenshtein_distances(a, b)
    assert (got <= lev).all()


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def test_fuzzy_osa_parity_and_semantics(engines):
    eng, bf = engines
    # a transposed typo of a real term: swap two adjacent letters
    vocab = [str(t) for t in eng._vocab]
    word = next(t for t in vocab if len(t) >= 4 and len(set(t)) == len(t))
    typo = word[1] + word[0] + word[2:]
    for q in [typo] + [r["text"] for r in reference_queries(k=5)]:
        got = eng.search_fuzzy(q, 10, transpositions=True)
        want = bf.search_fuzzy(q, 10, transpositions=True)
        assert got == want, q
    # the transposed typo reaches the original term only with OSA
    assert word in eng.expand_fuzzy(typo, 1, transpositions=True)
    assert word not in eng.expand_fuzzy(typo, 1, transpositions=False)


def test_fuzzy_osa_served(built_index, ray_session, engines):
    from horus_ner_ray.serve import make_http_server

    idx, _ = built_index
    eng, _bf = engines
    server, service = make_http_server(idx, port=0, n_actors=2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        q = reference_queries(k=5)[0]["text"]
        want = eng.search_fuzzy(q, 5, transpositions=True)
        got = service.search(q, k=5, mode="fuzzy", transpositions=True)
        assert [(h["doc_id"], h["score"]) for h in got] == want
        url = base + "/search?" + urllib.parse.urlencode(
            {"q": q, "k": 5, "mode": "fuzzy", "transpose": 1})
        with urllib.request.urlopen(url, timeout=30) as r:
            j = json.loads(r.read())
        assert [(h["doc_id"], h["score"]) for h in j["hits"]] == want
        # transpose outside fuzzy -> clean 400
        try:
            urllib.request.urlopen(
                base + "/search?q=the&mode=or&transpose=1", timeout=10)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        service.close()

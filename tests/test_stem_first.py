"""Stem-expansion search (S-stemmer) and span-first search: shared rule
hand cases, engine/brute bitwise parity, and serving composition."""

import numpy as np
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import (BruteForceBM25, QueryEngine,
                                           s_stem)


def test_s_stem_rules():
    # rule 1: ies -> y, with eies/aies guards
    assert s_stem("queries") == "query"
    assert s_stem("flies") == "fly"
    assert s_stem("ies") == "y"
    # eies/aies guards block rule 1; the word falls through to rule 2
    # (drop the s) — same fall-through as the SQL CASE chain
    assert s_stem("eies") == "eie"
    assert s_stem("aies") == "aie"
    # rule 2: -es drops the s, with aes/ees/oes guards falling through
    assert s_stem("classes") == "classe"
    assert s_stem("trees") == "tree"  # ees guard -> rule 3 drops the s
    assert s_stem("goes") == "goe"    # oes guard -> rule 3 drops the s
    # rule 3: -s drops, with us/ss guards
    assert s_stem("tables") == "table"
    assert s_stem("bus") == "bus"
    assert s_stem("class") == "class"
    assert s_stem("s") == ""
    assert s_stem("window") == "window"


@pytest.fixture(scope="module")
def pos_engines(small_corpus, tmp_path_factory, ray_session):
    idx = tmp_path_factory.mktemp("stemidx") / "idx"
    build_index(small_corpus, idx,
                PipelineConfig(num_shards=4, with_positions=True))
    return (QueryEngine(str(idx)),
            BruteForceBM25.from_corpus_files(small_corpus), str(idx))


def test_stemmed_rank_identical_to_bruteforce(pos_engines):
    eng, bf, _ = pos_engines
    for q in ["queries tables windows", "sorts merges", "tools agents",
              "the a", "zzzz", ""]:
        assert eng.search_stemmed(q, k=15) == bf.search_stemmed(q, k=15), q


def test_stemmed_expands_plural_to_singular(pos_engines):
    eng, bf, _ = pos_engines
    # the corpus contains 'query' etc.; the plural query must match docs
    # exactly as the singular OR query does when no other term shares the
    # stem bucket
    direct = eng.search("query", k=10)
    stemmed = eng.search_stemmed("queries", k=10)
    if direct:
        assert stemmed == direct


def test_span_first_rank_identical_to_bruteforce(pos_engines):
    eng, bf, _ = pos_engines
    for q in ["merge window", "query the", "zzzz"]:
        for n in (0, 1, 2, 5, 10**6):
            a = eng.search_span_first(q, k=15, first_n=n)
            b = bf.search_span_first(q, k=15, first_n=n)
            assert a == b, (q, n)


def test_span_first_huge_n_equals_or_search(pos_engines):
    eng, _, _ = pos_engines
    q = "merge window query"
    assert eng.search_span_first(q, k=15, first_n=10**9) == \
        eng.search(q, k=15)


def test_span_first_subset_and_monotone(pos_engines):
    eng, _, _ = pos_engines
    q = "merge window"
    full = {d for d, _ in eng.search_span_first(q, k=100_000, first_n=10**6)}
    tight = {d for d, _ in eng.search_span_first(q, k=100_000, first_n=2)}
    wide = {d for d, _ in eng.search_span_first(q, k=100_000, first_n=20)}
    assert tight <= wide <= full


def test_http_routes(pos_engines, ray_session):
    import json
    import threading
    import urllib.error
    import urllib.parse
    import urllib.request

    from horus_ner_ray.serve import make_http_server

    eng, _, idx = pos_engines
    server, service = make_http_server(idx, port=0, n_actors=2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def get(**params):
        url = base + "/search?" + urllib.parse.urlencode(params)
        with urllib.request.urlopen(url, timeout=30) as r:
            return json.loads(r.read())

    try:
        got = get(q="queries tables", k=6, mode="stemmed")["hits"]
        want = eng.search_stemmed("queries tables", k=6)
        assert [(h["doc_id"], h["score"]) for h in got] == \
            [(int(d), float(s)) for d, s in want]
        got = get(q="merge window", k=6, mode="first", first_n=3)["hits"]
        want = eng.search_span_first("merge window", k=6, first_n=3)
        assert [(h["doc_id"], h["score"]) for h in got] == \
            [(int(d), float(s)) for d, s in want]
        for bad in ({"q": "x", "mode": "first", "first_n": -1},
                    {"q": "x", "mode": "or", "first_n": 3},
                    {"q": "x", "mode": "stemmed", "role": "user"}):
            try:
                get(k=5, **bad)
                raise AssertionError(f"expected 400 for {bad}")
            except urllib.error.HTTPError as e:
                assert e.code == 400, bad
    finally:
        server.shutdown()
        service.close()


def test_served_modes(pos_engines, ray_session):
    from horus_ner_ray.serve import QueryService

    eng, _, idx = pos_engines
    svc = QueryService(idx, n_actors=2)
    try:
        want = eng.search_stemmed("queries tables", k=7)
        got = svc.search("queries tables", k=7, mode="stemmed")
        assert [(h["doc_id"], h["score"]) for h in got] == \
            [(int(d), float(s)) for d, s in want]
        want = eng.search_span_first("merge window", k=7, first_n=3)
        got = svc.search("merge window", k=7, mode="first", first_n=3)
        assert [(h["doc_id"], h["score"]) for h in got] == \
            [(int(d), float(s)) for d, s in want]
        # composition rejections surface as errors, not silent drops
        with pytest.raises(Exception):
            svc.search("x", k=5, mode="stemmed", role="user")
    finally:
        svc.close()

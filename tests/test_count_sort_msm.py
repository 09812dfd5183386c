"""min_should_match boolean candidacy, total-hits counts and
field-sorted retrieval: engine vs brute-force parity, edge semantics,
and the served (pool + HTTP) paths."""

import json
import threading
import urllib.parse
import urllib.request

import pytest

from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def test_boolean_msm_rank_identical(engines):
    eng, bf = engines
    vocab = sorted(bf.postings)
    must = vocab[len(vocab) // 2]
    should = " ".join([vocab[1], vocab[5], vocab[9]])
    for m in (0, 1, 2, 3):
        got = eng.search_boolean(must, should, "", 10, min_should_match=m)
        want = bf.search_boolean(must, should, "", 10, min_should_match=m)
        assert got == want, m


def test_boolean_msm_tightens_candidacy(engines):
    eng, _bf = engines
    vocab = [str(t) for t in eng._vocab]
    must, should = vocab[0], " ".join(vocab[1:4])
    sizes = [len(eng.search_boolean(must, should, "", 10 ** 6,
                                    min_should_match=m))
             for m in range(0, 4)]
    assert sizes == sorted(sizes, reverse=True)  # monotone non-increasing
    # more matches required than should terms exist -> empty
    assert eng.search_boolean(must, should, "", 10,
                              min_should_match=4) == []
    # msm=0 == the plain boolean query
    assert eng.search_boolean(must, should, "", 10) == \
        eng.search_boolean(must, should, "", 10, min_should_match=0)


def test_match_count_parity_and_semantics(engines):
    eng, bf = engines
    for q in reference_queries(k=5):
        for mode in ("or", "and"):
            assert eng.match_count(q["text"], mode) == \
                bf.match_count(q["text"], mode), (q["text"], mode)
    assert eng.match_count("zzzqabsent") == 0
    assert eng.match_count("") == 0
    # count equals the size of the exhaustive result set
    q = reference_queries(k=5)[0]["text"]
    assert eng.match_count(q, "or") == len(eng.search(q, 10 ** 6))


def test_match_count_respects_filters(engines):
    eng, bf = engines
    q = reference_queries(k=5)[0]["text"]
    n_user = eng.match_count(q, "or", role="user")
    assert n_user == bf.match_count(q, "or", role="user")
    assert n_user <= eng.match_count(q, "or")


def test_search_sorted_by_parity(engines):
    eng, bf = engines
    for q in reference_queries(k=5):
        for asc in (True, False):
            got = eng.search_sorted_by(q["text"], 10, ascending=asc)
            want = bf.search_sorted_by(q["text"], 10, ascending=asc)
            assert got == want, (q["text"], asc)
        got_and = eng.search_sorted_by(q["text"], 10, mode="and")
        assert got_and == bf.search_sorted_by(q["text"], 10, mode="and")


def test_search_sorted_by_ordering_and_errors(engines):
    eng, _bf = engines
    rows = eng.search_sorted_by(reference_queries(k=5)[0]["text"], 20)
    keys = [(v, d) for d, v in rows]
    assert keys == sorted(keys)
    with pytest.raises(ValueError, match="not an integer|no .* column"):
        eng.search_sorted_by("the", 5, field="role")
    assert eng.search_sorted_by("zzzqabsent", 5) == []


@pytest.fixture(scope="module")
def http_service(built_index, ray_session):
    from horus_ner_ray.serve import make_http_server

    idx, _ = built_index
    server, service = make_http_server(idx, port=0, n_actors=2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", service
    server.shutdown()
    service.close()


def _get(base: str, path: str, **params) -> dict:
    url = base + path + "?" + urllib.parse.urlencode(params)
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def test_served_count_and_sorted(http_service, engines):
    base, service = http_service
    eng, _bf = engines
    q = reference_queries(k=5)[0]["text"]
    assert service.count(q, "or") == eng.match_count(q, "or")
    assert _get(base, "/count", q=q, mode="and")["count"] == \
        eng.match_count(q, "and")
    want = eng.search_sorted_by(q, 5)
    via_pool = service.search_sorted(q, k=5)
    assert [(h["doc_id"], h["ts"]) for h in via_pool] == want
    via_http = _get(base, "/sorted", q=q, k=5, order="asc")["hits"]
    assert [(h["doc_id"], h["ts"]) for h in via_http] == want
    desc = _get(base, "/sorted", q=q, k=5, order="desc")["hits"]
    assert [(h["doc_id"], h["ts"]) for h in desc] == \
        eng.search_sorted_by(q, 5, ascending=False)


def test_served_boolean_msm(http_service, engines):
    base, _service = http_service
    eng, _bf = engines
    vocab = [str(t) for t in eng._vocab]
    must, should = vocab[0], " ".join(vocab[1:4])
    want = eng.search_boolean(must, should, "", 5, min_should_match=2)
    got = _get(base, "/search", q=must, mode="boolean", should=should,
               k=5, msm=2)["hits"]
    assert [(h["doc_id"], h["score"]) for h in got] == want
    # msm outside boolean mode -> clean 400
    try:
        urllib.request.urlopen(
            base + "/search?q=the&msm=1", timeout=10)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_search_regex_parity_and_anchoring(engines):
    import re as _re

    eng, bf = engines
    vocab = sorted(bf.postings)
    long = [t for t in vocab if len(t) > 4]
    pats = [long[0][:3] + ".*", "[a-z]*" + long[1][-2:], f"({vocab[0]}|{vocab[-1]})",
            "zzzq.*", vocab[2]]
    for p in pats:
        assert eng.search_regex(p, 10) == bf.search_regex(p, 10), p
    # anchored: a pattern matching only a PREFIX of a term must not expand
    t = long[2]
    inner = _re.escape(t[:-1])
    assert all(x == t[:-1] for x in
               [v for v in vocab if _re.fullmatch(inner, v)])
    assert eng.search_regex(inner, 10) == bf.search_regex(inner, 10)
    # exact-term pattern == plain single-term search
    assert eng.search_regex(vocab[3], 10) == eng.search(vocab[3], 10)


def test_field_stats_parity(engines):
    eng, bf = engines
    for q in reference_queries(k=5):
        for mode in ("or", "and"):
            assert eng.field_stats(q["text"], mode=mode) == \
                bf.field_stats(q["text"], mode=mode), (q["text"], mode)
    st = eng.field_stats(reference_queries(k=5)[0]["text"])
    assert st["min"] <= st["avg"] <= st["max"]
    assert st["avg"] == st["sum"] // st["count"]
    assert eng.field_stats("zzzqabsent") == {
        "count": 0, "min": 0, "max": 0, "avg": 0, "sum": 0}


def test_served_regex_and_fieldstats(http_service, engines):
    base, service = http_service
    eng, _bf = engines
    q = reference_queries(k=5)[0]["text"]
    st = service.field_stats(q, mode="or")
    assert st == eng.field_stats(q, mode="or")
    got = _get(base, "/fieldstats", q=q, mode="or")["stats"]
    assert got["count"] == st["count"] and got["avg"] == st["avg"]
    vocab = [str(t) for t in eng._vocab]
    pat = vocab[0][:2] + ".*"
    want = eng.search_regex(pat, 5)
    got = _get(base, "/search", q=pat, mode="regex", k=5)["hits"]
    assert [(h["doc_id"], h["score"]) for h in got] == want


def test_search_synonyms_parity_and_semantics(engines):
    eng, bf = engines
    vocab = sorted(bf.postings)
    syn = {vocab[0]: [vocab[5]], vocab[1]: [f"{vocab[7]} {vocab[9]}"],
           "zzabsent": [vocab[2]]}
    for q in reference_queries(k=5):
        got = eng.search_synonyms(q["text"], syn, 10)
        want = bf.search_synonyms(q["text"], syn, 10)
        assert got == want, q["text"]
    # a query hitting the mapped term scores like the expanded OR query
    assert eng.search_synonyms(vocab[0], syn, 10) == \
        eng.search(f"{vocab[0]} {vocab[5]}", 10)
    # empty map / unmapped terms == plain search
    assert eng.search_synonyms(vocab[3], {}, 10) == eng.search(vocab[3], 10)
    # a synonym mapping to an absent term changes nothing
    assert eng.search_synonyms(vocab[3], {vocab[3]: ["zzqx"]}, 10) == \
        eng.search(vocab[3], 10)


# --- exact match-set percentiles ----------------------------------------


def test_field_percentile_matches_bruteforce(engines):
    import numpy as np

    eng, bf = engines
    rng = np.random.default_rng(9)
    nonempty = 0
    for q in reference_queries(k=10):
        for quant in (0.1, 0.25, 0.5, 0.75, 0.9, 1.0,
                      float(rng.uniform(0.01, 0.99))):
            for mode in ("or", "and"):
                got = eng.field_percentile(q["text"], q=quant, mode=mode)
                want = bf.field_percentile(q["text"], q=quant, mode=mode)
                assert got == want, (q["text"], quant, mode)
                nonempty += got["count"] > 0
    assert nonempty >= 40


def test_field_percentile_small_buckets_refine(engines):
    """Tiny bucket counts force many refinement rounds — result must not
    depend on n_buckets."""
    eng, bf = engines
    for nb in (2, 3, 7, 1024):
        got = eng.field_percentile("the sessionmark", q=0.5, n_buckets=nb)
        assert got == bf.field_percentile("the sessionmark", q=0.5), nb


def test_field_percentile_rejects_bad_q(engines):
    import pytest as _pytest

    eng, _bf = engines
    with _pytest.raises(ValueError, match="q must be"):
        eng.field_percentile("the", q=0.0)
    with _pytest.raises(ValueError, match="q must be"):
        eng.field_percentile("the", q=1.5)


def test_service_field_percentile(built_index, ray_session):
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.serve import QueryService

    idx, _res = built_index
    eng = QueryEngine(idx)
    svc = QueryService(idx, n_actors=2)
    try:
        for quant in (0.25, 0.5, 0.9):
            got = svc.field_percentile("the sessionmark", q=quant)
            want = eng.field_percentile("the sessionmark", q=quant)
            assert got == want, quant
    finally:
        svc.close()


# --- percentile ranks (the inverse aggregation) --------------------------


def test_field_percentile_ranks_matches_bruteforce(engines):
    eng, bf = engines
    st = eng.field_stats("the sessionmark")
    probes = [st["min"] - 1, st["min"], (st["min"] + st["max"]) // 2,
              st["max"], st["max"] + 1]
    for q in reference_queries(k=10)[:6]:
        for mode in ("or", "and"):
            got = eng.field_percentile_ranks(q["text"], probes, mode=mode)
            want = bf.field_percentile_ranks(q["text"], probes, mode=mode)
            assert got == want, (q["text"], mode)
    # CDF endpoints: below-min is 0, at-max is exactly 1e6
    rows = eng.field_percentile_ranks("the sessionmark", probes)
    assert rows[0]["rank_e6"] == 0 and rows[0]["count_le"] == 0
    assert rows[3]["rank_e6"] == 1_000_000
    assert rows[4]["count_le"] == rows[3]["count"]


def test_field_percentile_ranks_inverts_percentile(engines):
    """rank(percentile(p)) >= p (discrete CDF inverse relation)."""
    eng, _bf = engines
    for p in (0.25, 0.5, 0.9):
        v = eng.field_percentile("the sessionmark", q=p)["value"]
        r = eng.field_percentile_ranks("the sessionmark", [v])[0]
        assert r["rank_e6"] >= int(p * 1e6) - 1


def test_field_percentile_ranks_served(built_index, ray_session):
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.serve import QueryService

    idx, _ = built_index
    eng = QueryEngine(idx)
    st = eng.field_stats("sessionmark")
    probes = [st["min"], (st["min"] + st["max"]) // 2, st["max"]]
    svc = QueryService(idx, n_actors=2)
    try:
        assert svc.field_percentile_ranks("sessionmark", probes) == \
            eng.field_percentile_ranks("sessionmark", probes)
    finally:
        svc.close()


# --- adjacency matrix ----------------------------------------------------


def test_adjacency_matrix_matches_bruteforce(engines):
    eng, bf = engines
    filters = {"hot": "sessionmark", "stop": "the to",
               "mid": "tok00007 tok00011", "none": "zzzqabsent"}
    got = eng.adjacency_matrix(filters)
    want = bf.adjacency_matrix(filters)
    assert got == want
    cells = {(a, b): c for a, b, c in got}
    # diagonal = the filter's own live match count (df for one term)
    assert cells[("hot", "hot")] == eng.global_df("sessionmark")
    # intersection bounded by the smaller diagonal
    assert cells[("hot", "mid")] <= cells[("mid", "mid")]
    assert cells[("none", "none")] == 0
    import pytest

    for obj in (eng, bf):
        with pytest.raises(ValueError, match="non-empty"):
            obj.adjacency_matrix({})


def test_adjacency_matrix_served(built_index, ray_session):
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.serve import QueryService

    idx, _ = built_index
    eng = QueryEngine(idx)
    filters = {"a": "sessionmark", "b": "tok00007"}
    svc = QueryService(idx, n_actors=2)
    try:
        got = svc.adjacency_matrix(filters)
    finally:
        svc.close()
    assert [(r["a"], r["b"], r["count"]) for r in got] == \
        eng.adjacency_matrix(filters)


def test_histogram_pipeline_rule():
    from horus_ner_ray.pipelines.query import histogram_pipeline

    # gap-filled, cumulative, derivative-with-empty-past
    rows = histogram_pipeline({3: 5, 6: 2, 4: 1})
    assert rows == [(3, 5, 5, 5), (4, 1, 6, -4), (5, 0, 6, -1),
                    (6, 2, 8, 2)]
    assert histogram_pipeline({}) == []
    assert histogram_pipeline({7: 4}) == [(7, 4, 4, 4)]


def test_histogram_pipeline_on_engine_histogram(engines):
    from horus_ner_ray.pipelines.query import histogram_pipeline

    eng, bf = engines
    iv = 3_600_000_000
    got = histogram_pipeline(eng.date_histogram("sessionmark",
                                                interval_us=iv))
    want = histogram_pipeline(bf.date_histogram("sessionmark",
                                                interval_us=iv))
    assert got == want and got
    # cumulative total equals the histogram total
    assert got[-1][2] == sum(n for _b, n, _c, _d in got)


def test_msm_percentage_and_negative_specs(built_index, small_corpus):
    """resolve_msm (Solr mm subset): percentages floor, negative = all
    but m; engine and brute agree bitwise under every spec form."""
    from horus_ner_ray.pipelines.query import (
        BruteForceBM25,
        QueryEngine,
        resolve_msm,
    )

    assert resolve_msm(2, 5) == 2
    assert resolve_msm("2", 5) == 2
    assert resolve_msm("75%", 4) == 3
    assert resolve_msm("75%", 5) == 3      # floor, fraction dropped
    assert resolve_msm("100%", 3) == 3
    assert resolve_msm("0%", 3) == 0
    assert resolve_msm(-1, 3) == 2
    assert resolve_msm(-5, 3) == 0
    assert resolve_msm("-50%", 4) == 2     # all but floor(50%)

    idx, _ = built_index
    eng = QueryEngine(idx)
    bf = BruteForceBM25.from_corpus_files(small_corpus)
    for spec in (0, 1, "50%", "100%", -1, "2"):
        got = eng.search_boolean("the", should="session user batch",
                                 k=12, min_should_match=spec)
        want = bf.search_boolean("the", should="session user batch",
                                 k=12, min_should_match=spec)
        assert got == want, spec


def test_common_terms_query_parity(built_index, small_corpus):
    """CommonTermsQuery: bitwise engine/brute parity across cutoffs; the
    candidacy rule actually excludes stopword-only docs; all-high falls
    back to plain OR."""
    from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine

    idx, _ = built_index
    eng = QueryEngine(idx)
    bf = BruteForceBM25.from_corpus_files(small_corpus)
    queries = ["the tok00042", "sessionmark the user",
               "the sessionmark uniqueedge1", "alpha beta the",
               "zzzqnotfound"]
    for q in queries:
        for pct in (5, 30, 50, 99):
            got = eng.search_common_terms(q, k=15, cutoff_pct=pct)
            want = bf.search_common_terms(q, k=15, cutoff_pct=pct)
            assert got == want, (q, pct)
    # all-high fallback == plain OR
    assert eng.search_common_terms("the sessionmark", k=10,
                                   cutoff_pct=1) == \
        eng.search("the sessionmark", k=10)
    # candidacy bites: with a rare low term, every hit contains it
    hits = eng.search_common_terms("the tok00042", k=10 ** 6,
                                   cutoff_pct=50)
    full = eng.search("tok00042", k=10 ** 6)
    assert {d for d, _ in hits} == {d for d, _ in full}
    # and survivors score as plain OR scores (bitwise)
    orr = dict(eng.search("the tok00042", k=10 ** 6))
    for d, s in hits:
        assert s == orr[d]

"""Spell suggestion, token-window snippets and significant-terms
aggregation: engine vs brute-force parity, hand-computed semantics, and
the served (pool + HTTP) paths returning identical rows."""

import json
import threading
import urllib.parse
import urllib.request

import numpy as np
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import (
    BruteForceBM25,
    QueryEngine,
    query_terms,
    snippet_text,
)
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def pos_index(small_corpus, tmp_path_factory, ray_session):
    idx = tmp_path_factory.mktemp("sugsnip") / "idx"
    build_index(small_corpus, idx,
                PipelineConfig(num_shards=4, with_positions=True))
    return str(idx)


@pytest.fixture(scope="module")
def engines(pos_index, small_corpus):
    return QueryEngine(pos_index), BruteForceBM25.from_corpus_files(small_corpus)


# --------------------------------------------------------------------------
# suggest
# --------------------------------------------------------------------------


def test_suggest_matches_bruteforce(engines):
    eng, bf = engines
    vocab = sorted(bf.postings)
    # real terms with one char dropped / swapped, plus edge probes
    probes = [t[:-1] for t in vocab[:15] if len(t) > 3]
    probes += [t[1:] for t in vocab[15:25] if len(t) > 3]
    probes += ["zzzzzzz", "a", ""]
    for w in probes:
        assert eng.suggest(w, k=5, max_dist=2) == bf.suggest(w, k=5, max_dist=2), w


def test_suggest_excludes_word_and_orders_by_distance_then_df(engines):
    eng, _bf = engines
    vocab = [str(t) for t in eng._vocab]
    w = vocab[len(vocab) // 2]
    rows = eng.suggest(w, k=10, max_dist=2)
    assert all(t != w for t, _d, _df in rows)
    keys = [(d, -df, t) for t, d, df in rows]
    assert keys == sorted(keys)
    # every returned distance really is the Levenshtein distance
    for t, d, _df in rows:
        assert 1 <= d <= 2 and t in vocab


def test_suggest_k_and_no_neighborhood(engines):
    eng, _bf = engines
    assert eng.suggest("qqqqqqqqqqqq", k=5) == []
    full = eng.suggest(str(eng._vocab[0])[:-1] or "a", k=100, max_dist=2)
    cut = eng.suggest(str(eng._vocab[0])[:-1] or "a", k=2, max_dist=2)
    assert cut == full[:2]


# --------------------------------------------------------------------------
# snippets
# --------------------------------------------------------------------------


def test_snippet_text_rule():
    s = "Alpha, beta GAMMA delta epsilon zeta"
    assert snippet_text(s, 2, 1) == "beta gamma delta"
    assert snippet_text(s, 0, 2) == "alpha beta gamma"   # window clips at 0
    assert snippet_text(s, 5, 2) == "delta epsilon zeta"  # clips at end
    assert snippet_text("", 0, 3) == ""


def test_search_snippets_matches_bruteforce(engines):
    eng, bf = engines
    for q in reference_queries(k=5):
        got = eng.search_snippets(q["text"], k=5, window=3)
        want = bf.search_snippets(q["text"], k=5, window=3)
        assert got == want, q["text"]


def test_snippet_contains_a_query_term(engines):
    eng, _bf = engines
    q = reference_queries(k=5)[0]["text"]
    terms = set(query_terms(q))
    for _d, _s, snip in eng.search_snippets(q, k=5, window=3):
        assert terms & set(snip.split()), snip


# --------------------------------------------------------------------------
# significant terms
# --------------------------------------------------------------------------


def test_significant_terms_hand_computed(tmp_path, ray_session):
    import pandas as pd

    rows = []
    # 4 docs about "kiwi", 16 background docs about "rock"
    for i in range(4):
        rows.append(("c%02d" % i, 0, "user", f"kiwi fruit snack {i}"))
    for i in range(4, 20):
        rows.append(("c%02d" % i, 0, "user", f"rock stone pebble {i}"))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    f = tmp_path / "part-00000.parquet"
    df.to_parquet(f, index=False)
    idx = tmp_path / "idx"
    build_index([str(f)], idx, PipelineConfig(num_shards=2))
    eng = QueryEngine(idx)
    # foreground = the 4 kiwi docs (rank ids 0..3: conv_ids sort first)
    got = eng.significant_terms([0, 1, 2, 3], k=3, min_fg=2)
    # kiwi/fruit/snack: fg=4, df=4, N=20, n_fg=4 -> lift = 5.0 exactly
    assert [(t, f_, df_) for t, f_, df_ in
            [(r[0], r[1], r[2]) for r in got]] == [
        ("fruit", 4, 4), ("kiwi", 4, 4), ("snack", 4, 4)]
    assert all(r[3] == 5_000_000 for r in got)
    # numeric suffixes appear once each -> filtered by min_fg
    assert all(not r[0].isdigit() for r in got)


def test_significant_terms_lift_arithmetic(engines):
    eng, _bf = engines
    hits = eng.search(reference_queries(k=5)[0]["text"], 10)
    rows = eng.significant_terms([d for d, _ in hits], k=10, min_fg=2)
    n_fg = len(hits)
    for t, fg, df, lift in rows:
        assert lift == (2 * fg * eng.n_docs * 1_000_000 + df * n_fg) // (
            2 * df * n_fg)
        assert fg >= 2 and df >= fg  # foreground docs are corpus docs
    keys = [(-l, -f, t) for t, f, _df, l in rows]
    assert keys == sorted(keys)


def test_significant_terms_empty_foreground(engines):
    eng, _bf = engines
    assert eng.significant_terms([], k=5) == []


# --------------------------------------------------------------------------
# served paths
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def http_service(pos_index, ray_session):
    from horus_ner_ray.serve import make_http_server

    server, service = make_http_server(pos_index, port=0, n_actors=2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", service
    server.shutdown()
    service.close()


def _get(base: str, path: str, **params) -> dict:
    url = base + path + "?" + urllib.parse.urlencode(params)
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def test_served_suggest_matches_engine(http_service, engines):
    base, service = http_service
    eng, _bf = engines
    w = str(eng._vocab[3])[:-1]
    want = eng.suggest(w, k=5, max_dist=2)
    via_pool = service.suggest(w, k=5, max_dist=2)
    assert [(r["term"], r["dist"], r["df"]) for r in via_pool] == want
    via_http = _get(base, "/suggest", q=w, k=5, dist=2)["suggestions"]
    assert [(r["term"], r["dist"], r["df"]) for r in via_http] == want
    assert [r["rank"] for r in via_http] == list(range(1, len(want) + 1))


def test_served_snippets_match_engine(http_service, engines):
    base, service = http_service
    eng, _bf = engines
    q = reference_queries(k=5)[1]["text"]
    want = eng.search_snippets(q, k=5, window=3)
    via_pool = service.search_snippets(q, k=5, window=3)
    assert [(h["doc_id"], h["score"], h["snippet"]) for h in via_pool] == want
    via_http = _get(base, "/snippets", q=q, k=5, window=3)["hits"]
    assert [(h["doc_id"], h["score"], h["snippet"]) for h in via_http] == want


def test_http_suggest_errors(http_service):
    base, _service = http_service
    try:
        urllib.request.urlopen(base + "/suggest?q=x&k=-1", timeout=10)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # empty word: clean empty result
    assert _get(base, "/suggest", q="")["suggestions"] == []


# --- 'did you mean' corrected search -----------------------------------


def test_corrected_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    queries = ["alpha betb", "sessionnark", "uniqueedge2 appeard",
               "qqqqqqzz alpha", "the sessoin data"]
    nonempty = 0
    for q in queries:
        gt, gh = eng.search_corrected(q, k=10)
        wt, wh = bf.search_corrected(q, k=10)
        assert gt == wt, q
        assert gh == wh, q
        nonempty += bool(gh)
    assert nonempty >= 3


def test_corrected_present_terms_pass_through(engines):
    eng, _bf = engines
    from horus_ner_ray.pipelines.query import query_terms

    t = "the sessionmark alpha"
    terms, hits = eng.search_corrected(t, k=10)
    assert terms == [x for x in query_terms(t) if eng.global_df(x) > 0]
    assert hits == eng.search(t, k=10)


def test_corrected_no_neighborhood_drops(engines):
    eng, _bf = engines
    terms, hits = eng.search_corrected("qqqqqqzz", k=10)
    assert terms == [] and hits == []


def test_service_corrected(built_index, ray_session):
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.serve import QueryService

    idx, _res = built_index
    eng = QueryEngine(idx)
    svc = QueryService(idx, n_actors=2)
    try:
        out = svc.search_corrected("alpha betb", k=5)
        terms, hits = eng.search_corrected("alpha betb", k=5)
        assert out["corrected"] == terms
        assert [(h["doc_id"], h["score"]) for h in out["hits"]] == hits
    finally:
        svc.close()


# --- term vectors API --------------------------------------------------


def test_term_vector_matches_bruteforce(engines):
    eng, bf = engines
    for d in (0, 5, 17, 42):
        assert eng.term_vector(d) == bf.term_vector(d), d
    assert eng.term_vector(10**9) == []  # absent doc


def test_term_vector_df_zero_for_stopword_build(small_corpus, tmp_path,
                                                ray_session):
    """A stopword-filtered build still reports tf over the stored
    stream, but df=0 for the filtered term (not indexed)."""
    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine

    stop = ("the",)
    build_index(small_corpus, tmp_path / "i",
                PipelineConfig(num_shards=2, stopword_filter=stop))
    eng = QueryEngine(tmp_path / "i")
    rows = {}
    for d in range(40):  # doc 0 is an empty-text edge doc; scan forward
        rows = {t: (f, df) for t, f, df in eng.term_vector(d)}
        if "the" in rows:
            break
    assert "the" in rows and rows["the"][1] == 0 and rows["the"][0] > 0


def test_service_term_vector(built_index, ray_session):
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.serve import QueryService

    idx, _res = built_index
    eng = QueryEngine(idx)
    svc = QueryService(idx, n_actors=2)
    try:
        got = svc.term_vector(3)
        want = eng.term_vector(3)
        assert [(r["term"], r["tf"], r["df"]) for r in got] == want
    finally:
        svc.close()


# --------------------------------------------------------------------------
# multi-fragment highlighter
# --------------------------------------------------------------------------


def test_select_fragment_anchors_rule():
    from horus_ner_ray.pipelines.query import select_fragment_anchors

    # windows of w=2 cover [a-2, a+2]; next anchor must be > a + 4
    assert select_fragment_anchors([0, 1, 4, 5, 9, 20], 2, 3) == [0, 5, 20]
    # n_fragments cap
    assert select_fragment_anchors([0, 10, 20, 30], 2, 2) == [0, 10]
    # single position
    assert select_fragment_anchors([7], 3, 5) == [7]
    assert select_fragment_anchors([], 3, 5) == []


def test_search_fragments_matches_bruteforce(engines):
    eng, bf = engines
    for q in ["sessionmark", "the tok00042 uniqueedge1", "alpha beta",
              "zzzqabsent"]:
        for nf in (1, 3):
            got = eng.search_fragments(q, k=5, window=3, n_fragments=nf)
            want = bf.search_fragments(q, k=5, window=3, n_fragments=nf)
            assert got == want, (q, nf)


def test_fragments_are_nonoverlapping_and_bounded(engines):
    eng, _bf = engines
    res = eng.search_fragments("the sessionmark", k=5, window=2,
                               n_fragments=3)
    assert res
    multi = False
    for _d, _s, frags in res:
        assert 1 <= len(frags) <= 3
        multi = multi or len(frags) > 1
        for f in frags:
            assert 1 <= len(f.split()) <= 5  # window 2 -> <= 2w+1 tokens
    assert multi  # the hot query must actually produce >1 fragment


def test_match_positions_all_occurrences(engines):
    eng, bf = engines
    hits = [d for d, _ in eng.search("sessionmark the", k=5)]
    got = eng.match_positions("sessionmark the", hits)
    want = bf.match_positions("sessionmark the", hits)
    assert got == want


# --------------------------------------------------------------------------
# completion suggester
# --------------------------------------------------------------------------


def test_complete_matches_bruteforce(engines):
    eng, bf = engines
    for p in ["tok000", "sess", "t", "zzzq", "THE"]:
        got = eng.complete(p, k=8)
        want = bf.complete(p, k=8)
        assert got == want, p
    # ordering: df desc then term asc
    rows = eng.complete("tok0", k=20)
    keys = [(-df, t) for t, df in rows]
    assert keys == sorted(keys)
    assert eng.complete("zzzq", k=5) == []
    import pytest

    for obj in (eng, bf):
        with pytest.raises(ValueError, match="k must be"):
            obj.complete("t", k=0)


def test_complete_served(pos_index, ray_session):
    from horus_ner_ray.serve import QueryService

    eng = QueryEngine(pos_index)
    svc = QueryService(pos_index, n_actors=2)
    try:
        got = svc.complete("tok000", k=5)
    finally:
        svc.close()
    assert [(r["term"], r["df"]) for r in got] == eng.complete("tok000",
                                                              k=5)

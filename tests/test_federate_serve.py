"""FederatedQueryService: the serving shape of federation must answer
every route exactly like a QueryService over the single merged index.
Services run sequentially (collect expected, close, then compare) so the
4-CPU test session never over-subscribes actor slots."""

import numpy as np
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.synth import reference_queries

QUERIES = ["the session", "user batch data", "sessionmark", "zzzqnotfound"]


@pytest.fixture(scope="module")
def fed_serve_tree(small_corpus, tmp_path_factory, ray_session):
    cfg = PipelineConfig(num_shards=3, doc_id_mode="hash",
                         with_positions=True)
    base = tmp_path_factory.mktemp("fedsrv")
    a, b, full = base / "a", base / "b", base / "full"
    build_index(small_corpus[:2], a, cfg)
    build_index(small_corpus[2:], b, cfg)
    build_index(small_corpus, full, cfg)
    return str(a), str(b), str(full)


def _expected(full):
    from horus_ner_ray.serve import QueryService

    svc = QueryService(full, n_actors=2)
    try:
        exp = {
            "search": {(q, m): svc.search(q, k=8, mode=m)
                       for q in QUERIES for m in ("or", "and")},
            "batch": svc.search_batch(
                [{"q": q, "k": 5} for q in QUERIES]),
            "count": {q: svc.count(q) for q in QUERIES},
            "suggest": svc.suggest("sesion", k=5, max_dist=2),
            "complete": svc.complete("se", k=5),
            "corrected": svc.search_corrected("sesionmark", k=5),
            "relaxed": svc.search_relaxed("zzzqnotfound sessionmark", k=5),
            "rescore": svc.rescore("the session", k=5, window=20),
            "fused": svc.fused("the session", k=5, window=20),
            "collapse": svc.collapse("the session", k=5),
            "field_stats": svc.field_stats("the session"),
            "snippets": svc.search_snippets("the session", k=5, window=2),
            "text": svc.search("the session", k=3, return_text=True),
        }
        doc = exp["search"][("the session", "or")][0]["doc_id"]
        exp["term_vector"] = svc.term_vector(doc)
        exp["tv_doc"] = doc
    finally:
        svc.close()
    return exp


def test_federated_service_route_parity(fed_serve_tree):
    from horus_ner_ray.pipelines.federate import FederatedQueryService

    a, b, full = fed_serve_tree
    exp = _expected(full)
    svc = FederatedQueryService([a, b], n_actors_per_index=1)
    try:
        for (q, m), want in exp["search"].items():
            assert svc.search(q, k=8, mode=m) == want, (q, m)
        assert svc.search_batch([{"q": q, "k": 5} for q in QUERIES]) == \
            exp["batch"]
        for q, want in exp["count"].items():
            assert svc.count(q) == want
        assert svc.suggest("sesion", k=5, max_dist=2) == exp["suggest"]
        assert svc.complete("se", k=5) == exp["complete"]
        assert svc.search_corrected("sesionmark", k=5) == exp["corrected"]
        assert svc.search_relaxed("zzzqnotfound sessionmark", k=5) == \
            exp["relaxed"]
        assert svc.rescore("the session", k=5, window=20) == exp["rescore"]
        assert svc.fused("the session", k=5, window=20) == exp["fused"]
        assert svc.collapse("the session", k=5) == exp["collapse"]
        assert svc.field_stats("the session") == exp["field_stats"]
        assert svc.search_snippets("the session", k=5, window=2) == \
            exp["snippets"]
        assert svc.search("the session", k=3, return_text=True) == \
            exp["text"]
        assert svc.term_vector(exp["tv_doc"]) == exp["term_vector"]
        st = svc.stats()
        assert st["n_indexes"] == 2 and st["n_deleted"] == 0
        assert st["n_docs"] > 0
    finally:
        svc.close()


def test_federated_http_front(fed_serve_tree):
    """make_http_server(service=FederatedQueryService(...)): the same
    HTTP routes over two indexes answer exactly like the merged-index
    server."""
    import json
    import threading
    import urllib.parse
    import urllib.request

    from horus_ner_ray.pipelines.federate import FederatedQueryService
    from horus_ner_ray.serve import make_http_server

    a, b, full = fed_serve_tree

    def fetch(base, path, **params):
        url = base + path + "?" + urllib.parse.urlencode(params)
        with urllib.request.urlopen(url, timeout=30) as r:
            return json.loads(r.read())

    # expected: merged-index server (collect, then tear down)
    server, svc = make_http_server(full, port=0, n_actors=2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    exp_search = fetch(base, "/search", q="the session", k=5)
    exp_sugg = fetch(base, "/suggest", q="sesion", k=3)
    cid = None
    rows = svc._fetch_rows([exp_search["hits"][0]["doc_id"]])
    cid = str(rows["conv_id"].iloc[0])
    exp_conv = fetch(base, "/conv", id=cid)
    server.shutdown()
    svc.close()

    fed = FederatedQueryService([a, b], n_actors_per_index=1)
    server2, _svc2 = make_http_server(None, port=0, service=fed)
    t2 = threading.Thread(target=server2.serve_forever, daemon=True)
    t2.start()
    base2 = f"http://127.0.0.1:{server2.server_address[1]}"
    try:
        assert fetch(base2, "/search", q="the session", k=5) == exp_search
        assert fetch(base2, "/suggest", q="sesion", k=3) == exp_sugg
        assert fetch(base2, "/conv", id=cid) == exp_conv
        st = fetch(base2, "/stats")
        assert st["n_indexes"] == 2
    finally:
        server2.shutdown()
        fed.close()


def test_federated_service_actor_churn(fed_serve_tree):
    """A killed federated actor respawns on its (index, shard subset)
    placement WITH the stats override — results stay identical after
    worker loss (the churn-retry path runs the overridden _spawn)."""
    import ray

    from horus_ner_ray.pipelines.federate import FederatedQueryService

    a, b, _full = fed_serve_tree
    svc = FederatedQueryService([a, b], n_actors_per_index=1)
    try:
        before = svc.search("the session", k=8)
        cnt = svc.count("the session")
        ray.kill(svc.actors[0])   # member a's only actor
        assert svc.search("the session", k=8) == before
        ray.kill(svc.actors[1])   # member b's only actor
        assert svc.search("the session", k=8) == before
        assert svc.count("the session") == cnt
    finally:
        svc.close()

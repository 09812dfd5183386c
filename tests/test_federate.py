"""FederatedEngine: query-time fan-out over independently built indexes
under COMBINED collection statistics (dfs_query_then_fetch) must be
BITWISE identical to searching a single index built over the union
corpus — for every federated mode, including kwargs and per-member
tombstones."""

import numpy as np
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.federate import FederatedEngine
from horus_ner_ray.pipelines.query import QueryEngine
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def fed_tree(small_corpus, tmp_path_factory, ray_session):
    """Two hash-mode indexes over disjoint fragment subsets (disjoint doc
    ids by construction) + the fresh union build they must rank like."""
    cfg = PipelineConfig(num_shards=3, doc_id_mode="hash")
    base = tmp_path_factory.mktemp("fed")
    a, b, full = base / "a", base / "b", base / "full"
    build_index(small_corpus[:2], a, cfg)
    build_index(small_corpus[2:], b, cfg)
    build_index(small_corpus, full, cfg)
    return str(a), str(b), str(full)


def test_federated_stats_match_union(fed_tree):
    a, b, full = fed_tree
    fed = FederatedEngine([a, b])
    eng = QueryEngine(full)
    assert fed.n_docs == eng.n_docs
    assert fed.total_tokens == eng.total_tokens
    assert fed.avgdl == eng.avgdl  # bitwise: same ints, same division
    for t in ("the", "user", "sessionmark", "zzzqnotfound"):
        assert fed.global_df(t) == eng.global_df(t)


def test_federated_search_bitwise(fed_tree):
    a, b, full = fed_tree
    fed = FederatedEngine([a, b])
    eng = QueryEngine(full)
    for q in reference_queries(k=10):
        for mode in ("or", "and"):
            got = fed.search(q["text"], k=q["k"], mode=mode)
            want = eng.search(q["text"], k=q["k"], mode=mode)
            assert got == want, (q["text"], mode)
    # large k exercises the cross-member merge depth
    assert fed.search("the session", k=10**6) == \
        eng.search("the session", k=10**6)


def test_federated_search_kwargs(fed_tree):
    a, b, full = fed_tree
    fed = FederatedEngine([a, b])
    eng = QueryEngine(full)
    kws = [
        {"boosts": {"the": 2.0, "session": 0.5}},
        {"exclude": "user"},
        {"role": "user"},
        {"role_weights": {"user": 2.0, "assistant": 0.5}},
    ]
    for kw in kws:
        assert fed.search("the session user", k=15, **kw) == \
            eng.search("the session user", k=15, **kw), kw


def test_federated_lm_and_counts(fed_tree):
    a, b, full = fed_tree
    fed = FederatedEngine([a, b])
    eng = QueryEngine(full)
    for q in reference_queries(k=10):
        assert fed.search_lm(q["text"], k=q["k"]) == \
            eng.search_lm(q["text"], k=q["k"])
        assert fed.match_count(q["text"]) == eng.match_count(q["text"])
        assert fed.match_count(q["text"], mode="and") == \
            eng.match_count(q["text"], mode="and")


def test_federated_member_tombstones(fed_tree, tmp_path_factory):
    """Per-member deletes keep working: tombstoning ids in ONE member
    masks them federation-wide, exactly like the same tombstones on the
    union index (stale-stats contract on both sides)."""
    import shutil

    from horus_ner_ray.pipelines.delete import delete_docs

    a, b, full = fed_tree
    base = tmp_path_factory.mktemp("fed_del")
    a2, full2 = base / "a", base / "full"
    shutil.copytree(a, a2)
    shutil.copytree(full, full2)
    eng0 = QueryEngine(str(a2))
    hits = eng0.search("the session", k=5)
    assert hits
    dead = [d for d, _ in hits[:2]]
    delete_docs(a2, dead)
    delete_docs(full2, dead)
    fed = FederatedEngine([str(a2), b])
    eng = QueryEngine(str(full2))
    got = fed.search("the session", k=10**6)
    assert got == eng.search("the session", k=10**6)
    assert not ({d for d, _ in got} & set(dead))


def test_federated_single_member_is_plain_engine(fed_tree):
    _a, _b, full = fed_tree
    fed = FederatedEngine([full])
    eng = QueryEngine(full)
    for q in reference_queries(k=10):
        assert fed.search(q["text"], k=q["k"]) == eng.search(q["text"], k=q["k"])


def test_federated_refuses_param_mismatch(small_corpus, tmp_path_factory,
                                          ray_session, fed_tree):
    a, _b, _full = fed_tree
    idx = tmp_path_factory.mktemp("fed_k1") / "idx"
    build_index(small_corpus[2:], idx,
                PipelineConfig(num_shards=2, doc_id_mode="hash", k1=0.9))
    with pytest.raises(ValueError, match="k1"):
        FederatedEngine([a, str(idx)])
    with pytest.raises(ValueError):
        FederatedEngine([])


def test_federated_empty_and_absent_terms(fed_tree):
    a, b, _full = fed_tree
    fed = FederatedEngine([a, b])
    assert fed.search("zzzqnotfound", k=5) == []
    assert fed.search("", k=5) == []
    assert fed.search("zzzqnotfound the", k=5, mode="and") == []
    assert fed.match_count("zzzqnotfound") == 0


def test_federation_fuzz_any_partition(small_corpus, tmp_path_factory,
                                       ray_session):
    """Property: ANY partition of the corpus fragments into member
    indexes (with any shard counts) federates bitwise-identically to the
    union index, for OR and AND search and for match counts."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    files = list(small_corpus)  # 3 fragments
    cfg_full = PipelineConfig(num_shards=3, doc_id_mode="hash")
    base = tmp_path_factory.mktemp("fedfuzz")
    full = base / "full"
    build_index(files, full, cfg_full)
    eng = QueryEngine(str(full))
    built: dict[tuple, str] = {}

    def member(sub: tuple, shards: int) -> str:
        key = (sub, shards)
        if key not in built:
            d = base / f"m{len(built)}"
            build_index([files[i] for i in sub], d,
                        PipelineConfig(num_shards=shards,
                                       doc_id_mode="hash"))
            built[key] = str(d)
        return built[key]

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data())
    def run(data):
        n_groups = data.draw(st.integers(2, 3), label="n_groups")
        assign = data.draw(
            st.lists(st.integers(0, n_groups - 1), min_size=len(files),
                     max_size=len(files)).filter(
                lambda a: len(set(a)) == n_groups),
            label="assign")
        groups = [tuple(i for i, g in enumerate(assign) if g == gi)
                  for gi in range(n_groups)]
        shards = [data.draw(st.integers(1, 4), label=f"shards{gi}")
                  for gi in range(n_groups)]
        fed = FederatedEngine([member(g, s)
                               for g, s in zip(groups, shards)])
        assert fed.n_docs == eng.n_docs
        assert fed.avgdl == eng.avgdl
        for q in ("the session", "sessionmark user", "alpha beta"):
            for mode in ("or", "and"):
                assert fed.search(q, k=25, mode=mode) == \
                    eng.search(q, k=25, mode=mode), (q, mode)
            assert fed.match_count(q) == eng.match_count(q)

    run()

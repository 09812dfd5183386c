"""Positions + phrase queries (SURVEY.md M6 analogue) and the position
codec roundtrip."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine
from horus_ner_ray.state import codec


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.integers(0, 5000), min_size=1, max_size=30), min_size=1, max_size=20))
def test_position_codec_roundtrip(lists):
    lists = [sorted(set(l)) for l in lists]
    flat = np.array([p for l in lists for p in l], dtype=np.int64)
    tfs = np.array([len(l) for l in lists], dtype=np.int32)
    blob = codec.encode_positions(flat, tfs)
    got = codec.decode_positions(blob, tfs)
    assert (got == flat).all()


@pytest.fixture(scope="module")
def pos_index(small_corpus, tmp_path_factory, ray_session):
    idx = tmp_path_factory.mktemp("posidx") / "idx"
    build_index(small_corpus, idx, PipelineConfig(num_shards=4, with_positions=True))
    return str(idx)


@pytest.fixture(scope="module")
def pos_oracle(small_corpus):
    return BruteForceBM25.from_corpus_files(small_corpus)


PHRASES = [
    "alpha beta",          # exists adjacently in edge docs
    "beta alpha",          # also adjacent ("alpha beta alpha")
    "alpha alpha",         # NOT adjacent
    "uniqueedge1 appears once",
    "appears uniqueedge1",  # wrong order
    "the sessionmark",
    "zzzqabsent alpha",
    "sessionmark",          # single-term phrase == that term's docs
]


def test_phrase_rank_identical(pos_index, pos_oracle):
    eng = QueryEngine(pos_index)
    for p in PHRASES:
        got = eng.search_phrase(p, 10)
        want = pos_oracle.search_phrase(p, 10)
        assert got == want, f"phrase {p!r}"


def test_phrase_requires_positions(built_index):
    idx, _ = built_index  # built without positions
    eng = QueryEngine(idx)
    with pytest.raises(ValueError, match="positions"):
        eng.search_phrase("alpha beta", 5)


def test_phrase_mode_actor_pool(pos_index, pos_oracle, ray_session):
    from horus_ner_ray.pipelines.query import serve_queries

    qs = [{"query_id": i, "text": p, "k": 10} for i, p in enumerate(PHRASES)]
    out, _ = serve_queries(pos_index, qs, n_actors=2, mode="phrase")
    for q in qs:
        want = pos_oracle.search_phrase(q["text"], 10)
        got = out[out.query_id == q["query_id"]].sort_values("rank")
        assert list(zip(got.doc_id, got.score)) == want, q["text"]


def test_phrase_semantics(pos_index):
    eng = QueryEngine(pos_index)
    hits = eng.search_phrase("alpha beta alpha", 10)
    assert len(hits) == 3  # the three identical edge docs
    assert eng.search_phrase("beta beta", 10) == []
    # OR search on same index still works with positions present
    assert len(eng.search("alpha beta", 5)) == 5 or len(eng.search("alpha beta", 5)) == 3


def test_phrase_with_stopword_filter_rank_identity(small_corpus, tmp_path_factory, ray_session):
    """Phrase + stopword-filtered index: engine positions are
    original-text-relative and the oracle scans the UNFILTERED token
    stream, so a phrase spanning a removed stopword matches on NEITHER
    side (shared text-faithful semantics), while phrases of surviving
    adjacent tokens match on both."""
    stop = ("the", "to", "a", "and", "of")
    idx = tmp_path_factory.mktemp("posidx_sw") / "idx"
    build_index(
        small_corpus, idx,
        PipelineConfig(num_shards=4, with_positions=True, stopword_filter=stop),
    )
    eng = QueryEngine(str(idx))
    oracle = BruteForceBM25.from_corpus_files(small_corpus, stopwords=stop)
    for p in PHRASES + ["alpha beta alpha", "beta alpha beta"]:
        got = eng.search_phrase(p, 10)
        want = oracle.search_phrase(p, 10)
        assert got == want, f"phrase {p!r}: {got} != {want}"
    # a phrase containing a filtered stopword is unanswerable on both sides
    assert eng.search_phrase("the sessionmark", 10) == []
    assert oracle.search_phrase("the sessionmark", 10) == []


def test_match_anchors_identical_to_bruteforce(pos_index, pos_oracle):
    from horus_ner_ray.synth import reference_queries

    eng = QueryEngine(pos_index)
    bf = pos_oracle
    for q in reference_queries(k=10):
        hits = [d for d, _ in eng.search(q["text"], k=20)]
        got = eng.match_anchors(q["text"], hits)
        want = bf.match_anchors(q["text"], hits)
        assert got == want, q["text"]
        # every hit has an anchor (OR semantics: >=1 term present)
        assert set(got) == set(int(h) for h in hits)


def test_match_anchors_edges(pos_index, pos_oracle):
    eng = QueryEngine(pos_index)
    assert eng.match_anchors("zzzqnotfound", [0, 1]) == {}
    assert eng.match_anchors("the", []) == {}
    # absent doc ids simply don't appear
    out = eng.match_anchors("the", [10**12])
    assert out == {}

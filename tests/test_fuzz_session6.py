"""Hypothesis fuzz for the session-6 query modes: one shared random
corpus + positions index, engine vs brute-force rank identity over
generated queries (boosting / dismax / phrase_prefix / span_not)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine

VOCAB = [f"w{i}" for i in range(12)] + ["shared", "common"]


@pytest.fixture(scope="module")
def fuzz_engines(tmp_path_factory, ray_session):
    """Small dense random corpus (seeded): every term hot enough that
    generated queries usually match, repeated terms and adjacencies
    frequent enough to exercise the positional kernels."""
    rng = np.random.RandomState(77)
    texts = [" ".join(rng.choice(VOCAB, rng.randint(2, 30)))
             for _ in range(150)]
    corpus_dir = tmp_path_factory.mktemp("fz6corpus")
    df = pd.DataFrame({
        "conv_id": [f"conv-{i:08d}" for i in range(len(texts))],
        "turn_idx": np.zeros(len(texts), dtype=np.int64),
        "role": ["user"] * len(texts),
        "text": texts,
        "tool": [""] * len(texts),
        "ts": pd.to_datetime("2025-06-01")
        + pd.to_timedelta(np.arange(len(texts)), unit="s"),
    })
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = corpus_dir / "part-000.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f)
    idx = tmp_path_factory.mktemp("fz6idx") / "idx"
    build_index([str(f)], idx,
                PipelineConfig(num_shards=3, with_positions=True))
    return QueryEngine(str(idx)), BruteForceBM25.from_corpus_files([str(f)])


terms_st = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=4)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pos=terms_st, neg=terms_st,
       nb=st.sampled_from([0.25, 0.5, 1.0]))
def test_fuzz_boosting(fuzz_engines, pos, neg, nb):
    eng, bf = fuzz_engines
    got = eng.search_boosting(" ".join(pos), " ".join(neg), k=10,
                              negative_boost=nb)
    want = bf.search_boosting(" ".join(pos), " ".join(neg), k=10,
                              negative_boost=nb)
    assert got == want


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(subqs=st.lists(terms_st, min_size=1, max_size=4),
       tb=st.sampled_from([0.0, 0.25, 0.5, 1.0]))
def test_fuzz_dismax(fuzz_engines, subqs, tb):
    eng, bf = fuzz_engines
    qs = [" ".join(q) for q in subqs]
    assert eng.search_dismax(qs, k=10, tie_breaker=tb) == \
        bf.search_dismax(qs, k=10, tie_breaker=tb)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(fixed=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3),
       pref=st.sampled_from(["w", "w1", "sh", "c", "zz"]),
       mx=st.sampled_from([1, 3, 50]))
def test_fuzz_phrase_prefix(fuzz_engines, fixed, pref, mx):
    eng, bf = fuzz_engines
    text = " ".join(fixed) + " " + pref
    got = eng.search_phrase_prefix(text, k=10, max_expansions=mx)
    want = bf.search_phrase_prefix(text, k=10, max_expansions=mx)
    assert got == want


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=terms_st, b=terms_st, dist=st.integers(0, 6))
def test_fuzz_span_not(fuzz_engines, a, b, dist):
    eng, bf = fuzz_engines
    got = eng.search_span_not(" ".join(a), " ".join(b), k=10, dist=dist)
    want = bf.search_span_not(" ".join(a), " ".join(b), k=10, dist=dist)
    assert got == want

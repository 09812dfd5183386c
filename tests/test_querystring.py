"""Query-string mini-language (mode=qs): parser unit tests + engine vs
brute-force bitwise rank identity over crafted and generated strings.
The dialect is parse_query_string's docstring; the SQL oracle for the
driver pair restates the same candidacy + scoring (bm25_query_string)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import (
    BruteForceBM25,
    QueryEngine,
    parse_query_string,
    resolve_query_string,
)

VOCAB = [f"w{i}" for i in range(10)] + ["shared", "common", "wax"]


def test_parse_clauses():
    spec = parse_query_string(
        '+alpha beta -gamma "one two" -"three four" pre* fix~ fox~2 '
        "role:user tool:search Don't")
    assert spec["must"] == {"alpha"}
    # plain tokens contribute every tokenizer term ("don't" -> don, t)
    assert spec["should"] == {"beta", "don", "t"}
    assert spec["must_not"] == {"gamma"}
    assert spec["phrases"] == [["one", "two"]]
    assert spec["not_phrases"] == [["three", "four"]]
    assert spec["prefixes"] == {"pre"}
    assert spec["fuzzies"] == {("fix", 1), ("fox", 2)}
    assert spec["role"] == "user"
    assert spec["tool"] == "search"


def test_parse_degenerate():
    # unknown field prefixes degrade to plain tokens; empty phrase and
    # bare wildcard are dropped; case folds
    spec = parse_query_string('site:x "" * +WAX')
    assert spec["must"] == {"wax"}
    assert spec["should"] == {"site", "x"}
    assert spec["phrases"] == [] and spec["prefixes"] == set()


def test_resolve_rule():
    spec = parse_query_string("+alpha alp* beta")
    must, should, mnot, ph, nph, role, tool = resolve_query_string(
        spec, lambda p: ["alpha", "alpine"], lambda w, d: [])
    # expansion folds into SHOULD minus the MUST overlap, sorted
    assert must == ["alpha"]
    assert should == ["alpine", "beta"]


@pytest.fixture(scope="module")
def qs_engines(tmp_path_factory, ray_session):
    rng = np.random.RandomState(99)
    texts = [" ".join(rng.choice(VOCAB, rng.randint(2, 25)))
             for _ in range(160)]
    roles = rng.choice(["user", "assistant"], len(texts))
    tools = rng.choice(["", "search"], len(texts))
    corpus_dir = tmp_path_factory.mktemp("qscorpus")
    df = pd.DataFrame({
        "conv_id": [f"conv-{i:08d}" for i in range(len(texts))],
        "turn_idx": np.zeros(len(texts), dtype=np.int64),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": pd.to_datetime("2025-06-01")
        + pd.to_timedelta(np.arange(len(texts)), unit="s"),
    })
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = corpus_dir / "part-000.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f)
    idx = tmp_path_factory.mktemp("qsidx") / "idx"
    build_index([str(f)], idx,
                PipelineConfig(num_shards=3, with_positions=True))
    return QueryEngine(str(idx)), BruteForceBM25.from_corpus_files([str(f)])


CRAFTED = [
    "shared common",                       # plain OR
    "+shared common",                      # must + should boost
    "+shared +common",                     # pure conjunction
    "shared -common",                      # OR with NOT
    '"shared common"',                     # phrase only
    '+w1 "shared common"',                 # must + phrase
    '-"shared common" shared',             # banned phrase
    "w*",                                  # prefix expansion only
    "+shared w*",                          # must + expansion boost
    "wax~ shared",                         # fuzzy union
    "wax~2",                               # wider fuzzy only
    "shared role:user",                    # field filter
    "+common tool:search role:assistant",  # both filters
    "-shared",                             # only NOT: empty by rule
    "zzz* qqq~",                           # expansions matching nothing
    '+zzznot shared',                      # absent must empties
    '"w1 zzznot"',                         # absent phrase term empties
]


@pytest.mark.parametrize("q", CRAFTED)
def test_crafted_parity(qs_engines, q):
    eng, bf = qs_engines
    assert eng.search_querystring(q, k=12) == bf.search_querystring(q, k=12)


def test_deleted_docs_masked(qs_engines, tmp_path_factory, ray_session):
    eng, bf = qs_engines
    base = eng.search_querystring("+shared common", k=5)
    assert base
    victim = base[0][0]
    import copy

    bf2 = copy.deepcopy(bf)
    bf2.delete_docs([victim])
    got = [d for d, _ in bf2.search_querystring("+shared common", k=5)]
    assert victim not in got


_tok = st.sampled_from(VOCAB + ["zzz"])
_clause = st.one_of(
    _tok,
    _tok.map(lambda t: "+" + t),
    _tok.map(lambda t: "-" + t),
    _tok.map(lambda t: t[:2] + "*"),
    _tok.map(lambda t: t + "~"),
    st.tuples(_tok, _tok).map(lambda p: f'"{p[0]} {p[1]}"'),
    st.tuples(_tok, _tok).map(lambda p: f'-"{p[0]} {p[1]}"'),
    st.sampled_from(["role:user", "role:assistant", "tool:search"]),
)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(clauses=st.lists(_clause, min_size=1, max_size=5))
def test_fuzz_querystring(qs_engines, clauses):
    eng, bf = qs_engines
    q = " ".join(clauses)
    assert eng.search_querystring(q, k=10) == bf.search_querystring(q, k=10)

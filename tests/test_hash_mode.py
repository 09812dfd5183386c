"""doc_id_mode='hash' (the beyond-broadcast scale path): same corpus,
same queries -> same documents and identical scores as rank mode, with ids
mapped back through the doc store."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import QueryEngine
from horus_ner_ray.state.shards import IndexPaths
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def hash_index(small_corpus, tmp_path_factory, ray_session):
    idx = tmp_path_factory.mktemp("hashidx") / "idx"
    build_index(small_corpus, idx, PipelineConfig(num_shards=4, doc_id_mode="hash"))
    return str(idx)


def _key_of(index_dir):
    parts = sorted(IndexPaths(index_dir).docstore.glob("part-*.parquet"))
    df = pd.concat([pq.read_table(p).to_pandas() for p in parts])
    return df.set_index("doc_id")[["conv_id", "turn_idx"]]


def test_hash_mode_same_results_as_rank(built_index, hash_index):
    rank_idx, _ = built_index
    er, eh = QueryEngine(rank_idx), QueryEngine(hash_index)
    assert er.n_docs == eh.n_docs and abs(er.avgdl - eh.avgdl) < 1e-9
    kr, kh = _key_of(rank_idx), _key_of(hash_index)
    for q in reference_queries(k=10):
        hr = er.search(q["text"], q["k"])
        hh = eh.search(q["text"], q["k"])
        assert len(hr) == len(hh), q["text"]
        # same scores; same documents per score level (tie order may differ
        # because the doc_id tie-break key differs between id modes)
        by_score_r: dict[float, set] = {}
        by_score_h: dict[float, set] = {}
        for d, s in hr:
            by_score_r.setdefault(round(s, 12), set()).add(
                tuple(kr.loc[d][["conv_id", "turn_idx"]])
            )
        for d, s in hh:
            by_score_h.setdefault(round(s, 12), set()).add(
                tuple(kh.loc[d][["conv_id", "turn_idx"]])
            )
        # boundary score level may hold different tied members; all interior
        # levels must match exactly
        scores_r = sorted(by_score_r, reverse=True)
        scores_h = sorted(by_score_h, reverse=True)
        assert scores_r == scores_h, q["text"]
        for s in scores_r[:-1]:
            assert by_score_r[s] == by_score_h[s], (q["text"], s)


def test_hash_mode_df_matches_rank(built_index, hash_index):
    er = QueryEngine(built_index[0])
    eh = QueryEngine(hash_index)
    for t in ["sessionmark", "the", "uniqueedge1", "alpha"]:
        assert er.global_df(t) == eh.global_df(t)

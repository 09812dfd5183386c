"""End-to-end: build -> query, rank-identity vs the brute-force oracle,
per-turn text equality, determinism across layouts (SURVEY.md section 5)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine, score_queries
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def oracle(small_corpus):
    return BruteForceBM25.from_corpus_files(small_corpus)


def test_stats_match_oracle(built_index, oracle):
    _, res = built_index
    assert res.n_docs == oracle.n_docs
    assert res.total_tokens == oracle.total_tokens
    assert abs(res.avgdl - oracle.avgdl) < 1e-12


def test_topk_rank_identical_or(built_index, oracle):
    idx, _ = built_index
    eng = QueryEngine(idx)
    for q in reference_queries(k=10):
        got = eng.search(q["text"], q["k"])
        want = oracle.search(q["text"], q["k"])
        assert got == want, f"query {q['text']!r}"  # bitwise score equality


def test_topk_rank_identical_and(built_index, oracle):
    idx, _ = built_index
    eng = QueryEngine(idx)
    for q in ["alpha beta", "the tok00042", "sessionmark the of", "zzzqabsent the",
              "uniqueedge1 appears", "sessionmark uniqueedge1"]:
        assert eng.search(q, 10, mode="and") == oracle.search(q, 10, mode="and"), q


def test_degenerate_queries(built_index):
    idx, _ = built_index
    eng = QueryEngine(idx)
    assert eng.search("", 10) == []
    assert eng.search("the", 0) == []
    assert eng.search("?!;;", 5) == []
    assert len(eng.search("the", 10**6)) > 0  # k larger than corpus


def test_global_df_matches_oracle(built_index, oracle):
    idx, _ = built_index
    eng = QueryEngine(idx)
    for t in ["sessionmark", "the", "uniqueedge1", "alpha", "zzzqabsent"]:
        assert eng.global_df(t) == len(oracle.postings.get(t, []))
    assert eng.global_df("sessionmark") < eng.n_docs  # empty/punct turns excluded


def test_per_turn_text_equality(built_index, small_corpus):
    """FIXTURES.md section 4: doc store reconstructs every turn byte-equal."""
    import pandas as pd

    idx, _ = built_index
    from horus_ner_ray.state.shards import IndexPaths

    parts = sorted(IndexPaths(idx).docstore.glob("part-*.parquet"))
    store = pd.concat([pq.read_table(p).to_pandas() for p in parts])
    src = pd.concat(
        [pq.read_table(f).to_pandas() for f in small_corpus], ignore_index=True
    )
    merged = src.merge(store, on=["conv_id", "turn_idx"], suffixes=("_src", "_idx"))
    assert len(merged) == len(src) == len(store)
    assert (merged["text_src"] == merged["text_idx"]).all()
    # doc ids dense 0..N-1 and aligned with (conv_id, turn_idx) sort order
    assert sorted(store["doc_id"]) == list(range(len(src)))
    s = store.sort_values(["conv_id", "turn_idx"], kind="stable")
    assert s["doc_id"].tolist() == list(range(len(src)))


def test_layout_invariance(small_corpus, tmp_path, ray_session, oracle):
    """Different shard counts -> identical query results (salting-equivalence
    analogue of FIXTURES.md section 4: partitioning must not affect output)."""
    r1 = build_index(small_corpus, tmp_path / "i1", PipelineConfig(num_shards=1))
    r7 = build_index(small_corpus, tmp_path / "i7", PipelineConfig(num_shards=7))
    e1, e7 = QueryEngine(tmp_path / "i1"), QueryEngine(tmp_path / "i7")
    for q in reference_queries(k=10):
        assert e1.search(q["text"]) == e7.search(q["text"]) == oracle.search(q["text"])


def test_fragmentation_invariance(tmp_path, ray_session):
    """Same corpus split into different fragment layouts -> byte-identical
    shard payloads (merge output independent of run partitioning)."""
    from horus_ner_ray.synth import synth_transcripts, transcript_files

    c1 = synth_transcripts(tmp_path / "c1", n_convs=40, seed=42, convs_per_file=40)
    c2 = synth_transcripts(tmp_path / "c2", n_convs=40, seed=42, convs_per_file=7)
    build_index(transcript_files(c1), tmp_path / "j1", PipelineConfig(num_shards=3))
    build_index(transcript_files(c2), tmp_path / "j2", PipelineConfig(num_shards=3))
    for s in range(3):
        for fname in ["postings.bin", "docids.npy", "dl.npy"]:
            a = (tmp_path / "j1" / "shards" / f"shard-{s:05d}" / fname).read_bytes()
            b = (tmp_path / "j2" / "shards" / f"shard-{s:05d}" / fname).read_bytes()
            assert a == b, f"shard {s} {fname}"
        da = pq.read_table(tmp_path / "j1" / "shards" / f"shard-{s:05d}" / "dict.parquet")
        db = pq.read_table(tmp_path / "j2" / "shards" / f"shard-{s:05d}" / "dict.parquet")
        assert da.equals(db)


def test_merge_paths_byte_identical(small_corpus, tmp_path, ray_session):
    """Arrow-sort merge vs streaming k-way cursor merge -> identical shards
    (including positions)."""
    fast = PipelineConfig(num_shards=3, with_positions=True)
    slow = PipelineConfig(num_shards=3, with_positions=True, streaming_merge_threshold=0)
    build_index(small_corpus, tmp_path / "f", fast)
    build_index(small_corpus, tmp_path / "s", slow)
    for s in range(3):
        for fname in ["postings.bin", "docids.npy", "dl.npy"]:
            a = (tmp_path / "f" / "shards" / f"shard-{s:05d}" / fname).read_bytes()
            b = (tmp_path / "s" / "shards" / f"shard-{s:05d}" / fname).read_bytes()
            assert a == b, f"shard {s} {fname}"
        da = pq.read_table(tmp_path / "f" / "shards" / f"shard-{s:05d}" / "dict.parquet")
        db = pq.read_table(tmp_path / "s" / "shards" / f"shard-{s:05d}" / "dict.parquet")
        assert da.equals(db)


def test_serve_queries_matches_oracle(built_index, oracle, ray_session):
    from horus_ner_ray.pipelines.query import serve_queries
    from horus_ner_ray.synth import reference_queries

    idx, _ = built_index
    out, wall = serve_queries(idx, reference_queries(k=5), n_actors=2)
    for q in reference_queries(k=5):
        want = oracle.search(q["text"], 5)
        got = out[out.query_id == q["query_id"]].sort_values("rank")
        assert list(zip(got.doc_id, got.score)) == want
    assert wall > 0


def test_partitioned_serving_matches_oracle(built_index, oracle, ray_session):
    """Multi-node shape: shard-partitioned actors + scatter/gather merge
    must equal single-engine results exactly."""
    from horus_ner_ray.pipelines.query import serve_queries_partitioned
    from horus_ner_ray.synth import reference_queries

    idx, _ = built_index
    qs = reference_queries(k=7)
    out, wall = serve_queries_partitioned(idx, qs, n_actors=3)
    for q in qs:
        want = oracle.search(q["text"], 7)
        got = out[out.query_id == q["query_id"]].sort_values("rank")
        assert list(zip(got.doc_id, got.score)) == want, q["text"]
    assert wall > 0


def test_score_queries_actor_pool(built_index, oracle, ray_session):
    idx, _ = built_index
    qs = reference_queries(k=5)
    out = score_queries(idx, qs, concurrency=2).to_pandas()
    for q in qs:
        want = oracle.search(q["text"], 5)
        got = out[out.query_id == q["query_id"]].sort_values("rank")
        assert list(zip(got.doc_id, got.score)) == want

"""Field collapsing + grouped top hits: engine vs brute-force
rank-identity, per-shard-partial exactness through the serving pool,
tombstone masking, and the missing-column error path."""

import numpy as np
import pytest

from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def test_collapse_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    nonempty = 0
    for q in reference_queries(k=10):
        for mode in ("or", "and"):
            got = eng.search_collapse(q["text"], k=8, mode=mode)
            want = bf.search_collapse(q["text"], k=8, mode=mode)
            assert got == want, (q["text"], mode)
            nonempty += bool(got)
    assert nonempty >= 8


def test_collapse_by_role_and_tool(engines):
    eng, bf = engines
    for q in reference_queries(k=10)[:6]:
        for field in ("role", "tool"):
            got = eng.search_collapse(q["text"], k=5, field=field)
            want = bf.search_collapse(q["text"], k=5, field=field)
            assert got == want, (q["text"], field)


def test_collapse_actually_collapses(engines):
    """Somewhere the plain top-k must contain two docs of one conv while
    the collapsed top-k keeps distinct convs — otherwise the fixture
    never exercises the reduction."""
    eng, bf = engines
    exercised = False
    for q in reference_queries(k=10):
        plain = [d for d, _ in eng.search(q["text"], k=8)]
        convs = [bf.convs.get(d, "") for d in plain]
        if len(set(convs)) < len(convs):
            coll = eng.search_collapse(q["text"], k=8)
            vals = [v for v, _, _ in coll]
            assert len(set(vals)) == len(vals)
            exercised = True
    assert exercised


def test_grouped_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    for q in reference_queries(k=10):
        for field in ("role", "conv_id"):
            got = eng.search_grouped(q["text"], field=field, k=3)
            want = bf.search_grouped(q["text"], field=field, k=3)
            assert got == want, (q["text"], field)


def test_grouped_respects_per_group_k(engines):
    eng, _bf = engines
    out = eng.search_grouped("the session data", field="role", k=2)
    assert out and all(len(v) <= 2 for v in out.values())
    # per-group hits are ordered (score desc, doc asc)
    for hits in out.values():
        keys = [(-s, d) for d, s in hits]
        assert keys == sorted(keys)


def test_collapse_masks_tombstones(built_index, small_corpus, tmp_path):
    """Deleted docs drop from the collapse — a conv whose best doc is
    tombstoned must be represented by its next-best live doc."""
    import shutil

    from horus_ner_ray.pipelines.delete import delete_docs

    idx, _res = built_index
    idx2 = tmp_path / "idx_del"
    shutil.copytree(idx, idx2)
    eng0 = QueryEngine(str(idx2))
    base = eng0.search_collapse("the session data", k=5)
    assert base
    victim = base[0][1]
    delete_docs(str(idx2), np.array([victim], dtype=np.int64))
    bf = BruteForceBM25.from_corpus_files(small_corpus)
    bf.delete_docs([victim])
    eng = QueryEngine(str(idx2))
    got = eng.search_collapse("the session data", k=5)
    want = bf.search_collapse("the session data", k=5)
    assert got == want
    assert all(d != victim for _, d, _ in got)


def test_collapse_missing_field_raises(tmp_path, ray_session):
    """A provided-mode documents index has no conv_id column — fail
    loudly, not an empty result."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index

    f = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(20, dtype=np.int64)),
        "text": pa.array([f"alpha beta w{i}" for i in range(20)]),
    }), f)
    idx = tmp_path / "idx"
    build_index([str(f)], idx,
                PipelineConfig(num_shards=2, doc_id_mode="provided"))
    eng = QueryEngine(str(idx))
    with pytest.raises(ValueError, match="conv_id"):
        eng.search_collapse("alpha", k=3)


def test_service_collapse_and_grouped(built_index, ray_session):
    """Pool scatter/gather reproduces the single-engine rows exactly."""
    from horus_ner_ray.serve import QueryService

    idx, _res = built_index
    eng = QueryEngine(idx)
    svc = QueryService(idx, n_actors=2)
    try:
        for q in reference_queries(k=10)[:4]:
            want = eng.search_collapse(q["text"], k=6)
            got = svc.collapse(q["text"], k=6)
            assert [(h["conv_id"], h["doc_id"], h["score"]) for h in got] \
                == want, q["text"]
            wantg = eng.search_grouped(q["text"], field="role", k=2)
            gotg = svc.grouped(q["text"], field="role", k=2)
            assert {v: [(h["doc_id"], h["score"]) for h in hs]
                    for v, hs in gotg.items()} == wantg, q["text"]
    finally:
        svc.close()

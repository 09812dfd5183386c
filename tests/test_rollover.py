"""Index rollover (pipelines/rollover.py): max_docs routing, append
composition, idempotent re-ingest, and federated-query parity with a
single index over the same corpus."""

import pyarrow.parquet as pq
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import QueryEngine
from horus_ner_ray.pipelines.rollover import (
    rollover_engine,
    rollover_indexes,
    rollover_ingest,
    rollover_status,
)
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def rolled(small_corpus, tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("roll") / "target"
    sizes = [pq.ParquetFile(f).metadata.num_rows for f in small_corpus]
    # cap a hair above the largest fragment so every generation holds
    # 1-2 fragments and at least one append happens
    cap = max(sizes) + min(sizes)
    cfg = PipelineConfig(num_shards=2, doc_id_mode="hash")
    m = rollover_ingest(root, small_corpus, max_docs=cap, cfg=cfg)
    return root, m, cap


def test_generation_routing(rolled, small_corpus):
    root, m, cap = rolled
    gens = m["generations"]
    assert len(gens) >= 2  # the cap forced a rollover
    assert all(g["n_docs"] <= cap for g in gens)
    assert all(g["sealed"] for g in gens[:-1]) and not gens[-1]["sealed"]
    assert m["ingested"] == [str(f) for f in small_corpus]
    assert rollover_status(root)["generations"] == gens
    total = sum(g["n_docs"] for g in gens)
    assert total == sum(pq.ParquetFile(f).metadata.num_rows
                        for f in small_corpus)


def test_reingest_is_noop(rolled, small_corpus):
    root, m, cap = rolled
    m2 = rollover_ingest(root, small_corpus, max_docs=cap)
    assert m2["generations"] == m["generations"]
    assert m2["ingested"] == m["ingested"]


def test_federated_parity_with_single_index(rolled, small_corpus,
                                            tmp_path_factory):
    """The rollover target queried through rollover_engine ranks bitwise
    like ONE hash-mode index over the whole corpus."""
    root, _m, _cap = rolled
    one = tmp_path_factory.mktemp("rollref") / "idx"
    build_index(small_corpus, one,
                PipelineConfig(num_shards=2, doc_id_mode="hash"))
    ref = QueryEngine(str(one))
    fed = rollover_engine(root)
    assert fed.n_docs == ref.n_docs
    for q in reference_queries(k=10):
        assert fed.search(q["text"], q["k"]) == ref.search(q["text"], q["k"])


def test_incremental_waves_equal_one_shot(small_corpus, tmp_path_factory,
                                          ray_session):
    """Ingesting in two calls lands the same manifest + bytes-equivalent
    rankings as one call over the full list."""
    cap = 10**9  # everything appends into one generation
    a = tmp_path_factory.mktemp("w") / "a"
    b = tmp_path_factory.mktemp("w") / "b"
    rollover_ingest(a, small_corpus[:1], max_docs=cap)
    rollover_ingest(a, small_corpus, max_docs=cap)  # first file skipped
    rollover_ingest(b, small_corpus, max_docs=cap)
    ma, mb = rollover_status(a), rollover_status(b)
    assert [g["n_docs"] for g in ma["generations"]] == \
        [g["n_docs"] for g in mb["generations"]]
    ea, eb = rollover_engine(a), rollover_engine(b)
    for q in reference_queries(k=10):
        assert ea.search(q["text"], q["k"]) == eb.search(q["text"], q["k"])


def test_validation(tmp_path, ray_session, small_corpus):
    with pytest.raises(ValueError):
        rollover_ingest(tmp_path / "x", small_corpus, max_docs=0)
    with pytest.raises(ValueError):
        rollover_ingest(tmp_path / "x", small_corpus, max_docs=10,
                        cfg=PipelineConfig(num_shards=2,
                                           doc_id_mode="rank"))
    with pytest.raises(ValueError):
        rollover_engine(tmp_path / "empty")

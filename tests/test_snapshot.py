"""Snapshots: hard-link copies stay point-in-time consistent under the
tmp+rename write discipline — later deletes/compactions on the source
never leak into an existing snapshot."""

from pathlib import Path

import numpy as np
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.delete import compact_index, delete_docs
from horus_ner_ray.pipelines.query import QueryEngine
from horus_ner_ray.pipelines.snapshot import snapshot_index
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def snap_pair(small_corpus, tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("snap")
    idx = base / "idx"
    build_index(small_corpus, idx,
                PipelineConfig(num_shards=3, doc_id_mode="hash"))
    snap = base / "snap"
    info = snapshot_index(idx, snap)
    assert info["files"] > 0
    return str(idx), str(snap)


def test_snapshot_answers_identically(snap_pair):
    idx, snap = snap_pair
    ei, es = QueryEngine(idx), QueryEngine(snap)
    for q in reference_queries(k=10):
        assert ei.search(q["text"], q["k"]) == es.search(q["text"], q["k"])


def test_snapshot_survives_source_mutation(snap_pair):
    idx, snap = snap_pair
    before = {q["text"]: QueryEngine(snap).search(q["text"], 10)
              for q in reference_queries(k=10)}
    # mutate the SOURCE: tombstone a slice, then compact (rewrites shards,
    # docstore, runs, stats — all via tmp+rename)
    eng = QueryEngine(idx)
    delete_docs(idx, np.asarray(eng._reader(0).docids)[:10])
    compact_index(idx)
    es = QueryEngine(snap)  # fresh open of the snapshot
    for text, want in before.items():
        assert es.search(text, 10) == want, text
    # and the source really changed
    ei = QueryEngine(idx)
    assert ei.n_docs < es.n_docs


def test_snapshot_refusals(snap_pair, tmp_path_factory):
    idx, snap = snap_pair
    with pytest.raises(ValueError, match="not empty"):
        snapshot_index(idx, snap)
    with pytest.raises(ValueError, match="differ"):
        snapshot_index(idx, idx)
    import shutil

    frozen = tmp_path_factory.mktemp("snapref") / "idx"
    shutil.copytree(idx, frozen)
    (Path(frozen) / "compacting.json").write_text("{}")
    with pytest.raises(RuntimeError, match="mid-compaction"):
        snapshot_index(frozen, tmp_path_factory.mktemp("snapref2") / "s")
    with pytest.raises(ValueError, match="not a built index"):
        snapshot_index(tmp_path_factory.mktemp("snapref3"),
                       tmp_path_factory.mktemp("snapref4") / "s")

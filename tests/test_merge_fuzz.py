"""Property fuzz for merge_indexes: ANY ordered partition of the corpus
fragments into input indexes (2- or 3-way, any shard counts on the
slow path) must merge byte-identically to a fresh build over the same
fragment order."""

import json
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.merge import merge_indexes

# the ONE byte-identity helper (shards + docstore + df table) — shared so
# a change to the corpus-pure file set updates both merge suites at once
from tests.test_merge_indexes import _tree_bytes  # noqa: F401


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    from horus_ner_ray.synth import synth_transcripts, transcript_files

    d = tmp_path_factory.mktemp("mrgfuzz_corpus")
    synth_transcripts(d, n_convs=16, seed=9, convs_per_file=4)
    return transcript_files(d)  # 4 fragment files


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_any_partition_merges_byte_identical(data, tiny_corpus,
                                             tmp_path_factory, ray_session):
    files = list(tiny_corpus)
    n_groups = data.draw(st.integers(2, 3), label="n_groups")
    # assignment of each file to a group; every group must be non-empty
    assign = data.draw(
        st.lists(st.integers(0, n_groups - 1), min_size=len(files),
                 max_size=len(files)).filter(
            lambda a: len(set(a)) == n_groups),
        label="assignment")
    s_target = data.draw(st.sampled_from([2, 3]), label="target_shards")
    # per-input shard counts: equal (fast hard-link path) or mixed (forces
    # the re-split path for every fragment)
    mixed = data.draw(st.booleans(), label="mixed_shard_counts")
    base = tmp_path_factory.mktemp("mrgfuzz_case")
    groups = [[f for f, g in zip(files, assign) if g == gi]
              for gi in range(n_groups)]
    inputs = []
    for gi, grp in enumerate(groups):
        s_in = (2 + (gi % 2)) if mixed else s_target
        idx = base / f"in{gi}"
        build_index(grp, idx,
                    PipelineConfig(num_shards=s_in, doc_id_mode="hash"))
        inputs.append(str(idx))
    out = base / "merged"
    merge_indexes(inputs, out, num_shards=s_target)
    fresh = base / "fresh"
    order = [f for grp in groups for f in grp]  # merged corpus order
    build_index(order, fresh,
                PipelineConfig(num_shards=s_target, doc_id_mode="hash"))
    assert _tree_bytes(out) == _tree_bytes(fresh)
    sm = json.loads((out / "stats.json").read_text())
    sf = json.loads((fresh / "stats.json").read_text())
    assert (sm["n_docs"], sm["total_tokens"], sm["avgdl"]) == (
        sf["n_docs"], sf["total_tokens"], sf["avgdl"])
    assert sm["corpus_files"] == sf["corpus_files"]

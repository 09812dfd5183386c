"""Resume / checkpoint semantics (FIXTURES.md section 4; SURVEY.md D2):
a build killed after partial output, then resumed, is byte-identical to a
clean build; completed partitions are skipped on rerun."""

import json
import shutil
from pathlib import Path

import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import (
    MergeShardWorker,
    TokenizeFragmentWorker,
    build_index,
)
from horus_ner_ray.state.shards import IndexPaths


def _index_bytes(idx: Path) -> dict[str, bytes]:
    out = {}
    for p in sorted((idx / "shards").rglob("*")):
        if p.is_file() and p.name != "manifest.json":  # manifests carry wall times
            out[str(p.relative_to(idx))] = p.read_bytes()
    return out


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(num_shards=3)


def test_kill_after_partial_phase_a(small_corpus, tmp_path, cfg, ray_session):
    clean = tmp_path / "clean"
    build_index(small_corpus, clean, cfg)

    # simulate a killed run: only fragment 0 completed, plus a stray tmp file
    partial = tmp_path / "partial"
    paths = IndexPaths(partial)
    paths.ensure()
    w = TokenizeFragmentWorker(str(partial), cfg, offsets=_offsets(small_corpus), id_space=_n(small_corpus))
    w.process_fragment(0, small_corpus[0])
    (paths.runs / "shard-00000" / "run-frag00099.parquet.tmp").write_bytes(b"junk")

    build_index(small_corpus, partial, cfg)  # resume
    assert _index_bytes(clean) == _index_bytes(partial)


def test_kill_after_partial_phase_b(small_corpus, tmp_path, cfg, ray_session):
    clean = tmp_path / "clean2"
    build_index(small_corpus, clean, cfg)

    partial = tmp_path / "partial2"
    shutil.copytree(clean, partial)
    # wipe one finished shard and leave another half-written (.tmp)
    shutil.rmtree(IndexPaths(partial).shard_dir(1))
    tmpdir = IndexPaths(partial).shards / "shard-00002.tmp"
    tmpdir.mkdir()
    (tmpdir / "postings.bin").write_bytes(b"half")

    build_index(small_corpus, partial, cfg)
    assert _index_bytes(clean) == _index_bytes(partial)


def test_completed_fragments_are_skipped(small_corpus, tmp_path, cfg, ray_session):
    idx = tmp_path / "skip"
    build_index(small_corpus, idx, cfg)
    mpath = IndexPaths(idx).frag_manifest(1)
    before = mpath.stat().st_mtime_ns
    build_index(small_corpus, idx, cfg)  # no-op rerun
    assert mpath.stat().st_mtime_ns == before


def _offsets(files):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from horus_ner_ray.stages.docstore import conv_offsets_from_table

    return conv_offsets_from_table(
        pa.concat_tables([pq.read_table(f, columns=["conv_id"]) for f in files])
    )


def _n(files):
    return _offsets(files).n_docs


def test_stale_format_version_rebuilds(small_corpus, tmp_path, cfg, ray_session):
    """Manifests from an OLDER index-format version must not satisfy
    resume: the completed-looking partitions are re-done, and the resumed
    index is byte-identical to a clean build (regression: a format bump
    left old-version shards in place and ShardReader failed on them)."""
    clean = tmp_path / "clean_v"
    build_index(small_corpus, clean, cfg)

    stale = tmp_path / "stale_v"
    build_index(small_corpus, stale, cfg)
    # simulate output of a previous engine version: downgrade every
    # manifest's version stamp (fragment manifests + shard manifests)
    paths = IndexPaths(stale)
    manifests = [
        *paths.runs.glob("_frag-*.json"),
        *(paths.shards.glob("shard-*/manifest.json")),
    ]
    n_down = 0
    for mp in manifests:
        m = json.loads(mp.read_text())
        if "version" in m or mp.name == "manifest.json":
            m["version"] = 1
            mp.write_text(json.dumps(m))
            n_down += 1
    assert n_down > 0, "no manifests found to downgrade"

    build_index(small_corpus, stale, cfg)  # must redo, not skip
    assert _index_bytes(clean) == _index_bytes(stale)
    for mp in paths.shards.glob("shard-*/manifest.json"):
        assert json.loads(mp.read_text())["version"] > 1


def test_job_change_wipes_stale_state(small_corpus, tmp_path, ray_session):
    """Rebuilding the same dir with a different num_shards must not leave
    orphan shard dirs from the old layout (regression: an 8-shard index
    rebuilt at 4 shards kept shard-00004.. and the reader served them)."""
    idx = tmp_path / "idx_jobchange"
    build_index(small_corpus, idx, PipelineConfig(num_shards=8))
    assert len(list(IndexPaths(idx).shards.glob("shard-*"))) == 8

    build_index(small_corpus, idx, PipelineConfig(num_shards=3))
    assert len(list(IndexPaths(idx).shards.glob("shard-*"))) == 3

    clean = tmp_path / "idx_jobclean"
    build_index(small_corpus, clean, PipelineConfig(num_shards=3))
    assert _index_bytes(clean) == _index_bytes(idx)

    # neutral knobs (execution sizing) must NOT invalidate: rebuild with a
    # different tokenize batch is a pure resume (manifest wall_s unchanged)
    before = json.loads(
        (IndexPaths(idx).shards / "shard-00000" / "manifest.json").read_text())
    build_index(small_corpus, idx, PipelineConfig(num_shards=3, tokenize_batch_size=999))
    after = json.loads(
        (IndexPaths(idx).shards / "shard-00000" / "manifest.json").read_text())
    assert before == after


def test_docstore_chunking_batchsize_invariant(tmp_path, ray_session):
    """Docstore parts stream fixed DOCSTORE_CHUNK_ROWS chunks in file order:
    bytes must be identical across tokenize_batch_size values (the knob is
    job-neutral) even when a fragment spans multiple chunks, and fetch_docs
    must read the multi-row-group layout correctly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import horus_ner_ray.pipelines.build_index as bi
    from horus_ner_ray.pipelines.query import fetch_docs

    # one fragment, > 1 chunk of rows
    n = bi.DOCSTORE_CHUNK_ROWS + 7_000
    rng = np.random.RandomState(11)
    conv = np.repeat(np.arange(n // 4 + 1), 4)[:n]
    tbl = pa.table({
        "conv_id": pa.array([f"c{c:07d}" for c in conv], pa.string()),
        "turn_idx": pa.array(
            np.concatenate([np.arange((conv == c).sum())
                            for c in np.unique(conv)]).astype(np.int32)),
        "role": pa.array(np.where(rng.rand(n) < 0.5, "user", "assistant")),
        "text": pa.array([f"tok{i % 97} alpha beta" for i in range(n)]),
    })
    frag = tmp_path / "big_frag.parquet"
    pq.write_table(tbl, frag)

    outs = []
    for bs in (4096, 30_000):
        idx = tmp_path / f"idx_bs{bs}"
        build_index([str(frag)], idx,
                    PipelineConfig(num_shards=3, tokenize_batch_size=bs))
        part = IndexPaths(idx).docstore / "part-00000.parquet"
        assert pq.ParquetFile(part).metadata.num_row_groups >= 2
        outs.append(part.read_bytes())
    assert outs[0] == outs[1]

    got = fetch_docs(tmp_path / "idx_bs4096", [0, 5, n - 1],
                     columns=["doc_id", "conv_id", "turn_idx"])
    assert list(got["doc_id"]) == [0, 5, n - 1]

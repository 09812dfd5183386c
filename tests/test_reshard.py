"""Resharding (pipelines/reshard.py): run re-split + re-merge must be
byte-identical to a fresh build at the new shard count, in every doc-id
mode, without re-tokenizing (fragment manifests untouched in content,
phase A never re-runs); composes with append and tombstones."""

import json
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.reshard import reshard_index
from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine
from horus_ner_ray.state.shards import IndexPaths
from horus_ner_ray.synth import reference_queries


def _index_bytes(idx: Path) -> dict[str, bytes]:
    out = {}
    for sub in ("shards", "runs"):
        for p in sorted((idx / sub).rglob("*")):
            if p.is_file() and p.name != "manifest.json" \
                    and not p.name.startswith("_frag-"):
                out[str(p.relative_to(idx))] = p.read_bytes()
    out["df"] = (idx / "df.parquet").read_bytes()
    return out


@pytest.mark.parametrize("mode,pos", [("rank", True), ("hash", False)])
def test_reshard_byte_identical_to_fresh_build(small_corpus, tmp_path,
                                               ray_session, mode, pos):
    cfg3 = PipelineConfig(num_shards=3, doc_id_mode=mode, with_positions=pos)
    cfg5 = PipelineConfig(num_shards=5, doc_id_mode=mode, with_positions=pos)
    idx = tmp_path / f"resh_{mode}"
    build_index(small_corpus, idx, cfg3)
    out = reshard_index(idx, 5)
    assert out["resharded"] and out["n_shards"] == 5 and out["from"] == 3
    clean = tmp_path / f"clean_{mode}"
    build_index(small_corpus, clean, cfg5)
    assert _index_bytes(idx) == _index_bytes(clean)
    s_a = json.loads((idx / "stats.json").read_text())
    assert s_a["n_shards"] == 5 and s_a["config"]["num_shards"] == 5
    # results stay rank-identical to the oracle across the reshard (the
    # brute-force oracle assigns rank ids, so only the rank build compares
    # id-for-id; hash mode is already covered by the byte identity above)
    if mode == "rank":
        bf = BruteForceBM25.from_corpus_files(small_corpus)
        eng = QueryEngine(idx)
        for q in reference_queries(k=10)[:4]:
            assert eng.search(q["text"], q["k"]) == bf.search(q["text"], q["k"])


def test_reshard_noop_and_validation(small_corpus, tmp_path, ray_session):
    idx = tmp_path / "resh_noop"
    build_index(small_corpus[:1], idx, PipelineConfig(num_shards=2))
    assert reshard_index(idx, 2) == {"resharded": False, "n_shards": 2}
    with pytest.raises(ValueError, match="positive"):
        reshard_index(idx, 0)


def test_reshard_then_append_byte_identical(small_corpus, tmp_path,
                                            ray_session):
    """Resharded manifests/job must support a later append: build(A) ->
    reshard -> append(B) == fresh build(A+B) at the new count."""
    from horus_ner_ray.pipelines.build_index import append_fragments

    cfg = PipelineConfig(num_shards=2, doc_id_mode="hash")
    idx = tmp_path / "resh_app"
    build_index(small_corpus[:2], idx, cfg)
    reshard_index(idx, 4)
    append_fragments(idx, small_corpus[2:])
    clean = tmp_path / "resh_app_clean"
    build_index(small_corpus, clean,
                PipelineConfig(num_shards=4, doc_id_mode="hash"))
    assert _index_bytes(idx) == _index_bytes(clean)


def test_reshard_twice_and_then_compact(small_corpus, tmp_path, ray_session):
    """Double reshard: the rewritten fragment manifests must point at the
    FINAL run locations (not the staging dir), or the second reshard and
    any later compaction read dangling paths (code-review regression)."""
    from horus_ner_ray.pipelines.delete import compact_index, delete_docs

    cfg = PipelineConfig(num_shards=3, doc_id_mode="hash")
    idx = tmp_path / "resh_twice"
    build_index(small_corpus, idx, cfg)
    reshard_index(idx, 5)
    reshard_index(idx, 2)
    clean = tmp_path / "resh_twice_clean"
    build_index(small_corpus, clean,
                PipelineConfig(num_shards=2, doc_id_mode="hash"))
    assert _index_bytes(idx) == _index_bytes(clean)
    # manifests are readable and compaction over them works
    store = pd.concat([pq.read_table(p, columns=["doc_id"]).to_pandas()
                       for p in sorted(IndexPaths(idx).docstore.glob("part-*.parquet"))])
    delete_docs(idx, store["doc_id"].tolist()[::9])
    assert compact_index(idx)["compacted"]


def test_reshard_recovers_from_swap_crash(small_corpus, tmp_path, ray_session):
    """Crash between the two swap renames strands the layout at runs.old;
    the next reshard must restore it and succeed."""
    idx = tmp_path / "resh_crash"
    build_index(small_corpus, idx, PipelineConfig(num_shards=3))
    p = IndexPaths(idx)
    p.runs.rename(p.root / "runs.old")  # simulate the crash window
    out = reshard_index(idx, 4)
    assert out["resharded"] and out["n_shards"] == 4
    clean = tmp_path / "resh_crash_clean"
    build_index(small_corpus, clean, PipelineConfig(num_shards=4))
    assert _index_bytes(idx) == _index_bytes(clean)


def test_reshard_after_compact_rank_mode_loses_no_postings(
        small_corpus, tmp_path, ray_session):
    """Compaction keeps original rank ids while shrinking stats n_docs;
    reshard must route by the ORIGINAL id space (max id + 1 from the
    docstore) or tail docs land on shard indices that are never merged —
    silent posting loss (code-review regression)."""
    from horus_ner_ray.pipelines.delete import compact_index, delete_by_conv

    idx = tmp_path / "cmp_resh"
    build_index(small_corpus, idx, PipelineConfig(num_shards=3))
    store = pd.concat([pq.read_table(p, columns=["doc_id", "conv_id"]).to_pandas()
                       for p in sorted(IndexPaths(idx).docstore.glob("part-*.parquet"))])
    convs = sorted(store["conv_id"].unique())[:8]  # low-id convs: max id survives
    delete_by_conv(idx, convs)
    compact_index(idx)
    reshard_index(idx, 5)
    dset = set(store.loc[store["conv_id"].isin(convs), "doc_id"])
    frames = [pq.read_table(f, columns=["conv_id", "turn_idx", "text", "role",
                                        "tool", "ts"]).to_pandas()
              for f in small_corpus]
    df = pd.concat(frames, ignore_index=True).sort_values(
        ["conv_id", "turn_idx"], kind="stable")
    df["doc_id"] = range(len(df))
    bf = BruteForceBM25()
    for r in df.itertuples():
        if int(r.doc_id) not in dset:
            bf.add_doc(int(r.doc_id), r.text, r.role or "", r.tool or "",
                       ts=None if pd.isna(r.ts) else r.ts)
    eng = QueryEngine(idx)
    # the highest-id docs (last convs, untouched) must still be findable
    for q in reference_queries(k=10):
        assert eng.search(q["text"], q["k"]) == bf.search(q["text"], q["k"])
    assert {d for d, _ in eng.search("the", 10**6)} == {
        d for d, _ in bf.search("the", 10**6)}


def test_resharding_marker_refuses_queries(small_corpus, tmp_path,
                                           ray_session):
    """Mid-reshard the shard set is incomplete: engines must refuse to
    open (partial sets would silently serve subset results); the marker
    clears after a completed reshard."""
    idx = tmp_path / "resh_marker"
    build_index(small_corpus[:1], idx, PipelineConfig(num_shards=2))
    (Path(idx) / "resharding.json").write_text("{}")
    with pytest.raises(RuntimeError, match="mid-reshard"):
        QueryEngine(idx)
    # append/compact also refuse; a direct rebuild wipes and self-heals
    from horus_ner_ray.pipelines.build_index import append_fragments
    from horus_ner_ray.pipelines.delete import compact_index

    with pytest.raises(RuntimeError, match="mid-reshard"):
        append_fragments(idx, small_corpus[1:])
    with pytest.raises(RuntimeError, match="mid-reshard"):
        compact_index(idx)
    res = build_index(small_corpus[:1], idx, PipelineConfig(num_shards=2))
    assert not (Path(idx) / "resharding.json").exists()
    assert res.n_docs > 0 and QueryEngine(idx).search("the", 3)
    reshard_index(idx, 3)
    assert not (Path(idx) / "resharding.json").exists()
    assert QueryEngine(idx).search("the", 3)


def test_reshard_preserves_tombstones(small_corpus, tmp_path, ray_session):
    from horus_ner_ray.pipelines.delete import delete_docs, read_tombstones

    idx = tmp_path / "resh_del"
    build_index(small_corpus, idx, PipelineConfig(num_shards=3))
    deleted = list(range(5, 60, 6))
    delete_docs(idx, deleted)
    reshard_index(idx, 6)
    assert read_tombstones(idx).tolist() == sorted(deleted)
    bf = BruteForceBM25.from_corpus_files(small_corpus)
    bf.delete_docs(deleted)
    eng = QueryEngine(idx)
    for q in reference_queries(k=10)[:4]:
        assert eng.search(q["text"], q["k"]) == bf.search(q["text"], q["k"])

"""Randomized maintenance-chain property fuzz: ANY sequence of
delete / append / compact / reshard / snapshot / merge operations on a
hash-mode index must land exactly where a from-scratch reconstruction
lands — fresh
build over the per-fragment FILTERED contents at the final shard count,
plus the not-yet-compacted tombstones.  Shards/docstore/df compare
byte-identical; tombstone sets and query results compare exactly.

This generalizes the pairwise composition tests (delete->compact,
delete->append, merge->append, double-reshard) to arbitrary chains —
the operational reality of a long-lived 100 TB index."""

import json
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import append_fragments, build_index
from horus_ner_ray.pipelines.delete import (
    compact_index,
    delete_by_query,
    delete_docs,
    delete_older_than,
    read_tombstones,
)
from horus_ner_ray.pipelines.merge import merge_indexes
from horus_ner_ray.pipelines.query import QueryEngine
from horus_ner_ray.pipelines.reshard import reshard_index
from horus_ner_ray.pipelines.snapshot import snapshot_index
from horus_ner_ray.pipelines.verify import verify_index
from horus_ner_ray.synth import (
    reference_queries,
    synth_transcripts,
    transcript_files,
)
from tests.test_merge_indexes import _tree_bytes



def _disjoint_conv_files(src_dir: Path, tag: str) -> list[str]:
    """synth conv ids are seed-independent (conv-<idx>), so extra corpora
    would COLLIDE with the base corpus's (conv_id, turn_idx) keys — and a
    key deleted+compacted earlier must not filter a later re-added row in
    the reconstruction.  Prefix the conv ids to keep id spaces disjoint
    (the semantics merge/append are specified for)."""
    out = []
    for f in sorted(Path(src_dir).glob("part-*.parquet")):
        t = pq.read_table(f).to_pandas()
        t["conv_id"] = tag + t["conv_id"]
        dst = f.with_name(f"{tag}{f.name}")
        t.to_parquet(dst, index=False)
        out.append(str(dst))
    return out

def _all_keys(idx) -> list[tuple[int, str, int]]:
    """(doc_id, conv_id, turn_idx) of every docstore row, tombstoned or
    not."""
    from horus_ner_ray.state.shards import IndexPaths

    parts = sorted(IndexPaths(idx).docstore.glob("part-*.parquet"))
    rows = []
    for p in parts:
        t = pq.read_table(p, columns=["doc_id", "conv_id", "turn_idx"])
        rows.extend(zip(t["doc_id"].to_pylist(), t["conv_id"].to_pylist(),
                        t["turn_idx"].to_pylist()))
    return sorted(rows)


def _live_keys(idx) -> list[tuple[int, str, int]]:
    """(doc_id, conv_id, turn_idx) of every docstore row not currently
    tombstoned."""
    dead = read_tombstones(idx)
    dead = set() if dead is None else set(dead.tolist())
    return [(d, c, ti) for d, c, ti in _all_keys(idx) if d not in dead]


def _tombstone_set(idx) -> set[int]:
    t = read_tombstones(idx)
    return set() if t is None else set(t.tolist())


def _note_new_tombstones(idx, before: set[int], pending: dict) -> None:
    """Record whatever a bulk delete (by query / by TTL) tombstoned."""
    new = _tombstone_set(idx) - before
    if new:
        keymap = {d: (c, t) for d, c, t in _all_keys(idx)}
        for d in new:
            pending[d] = keymap[d]


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_any_maintenance_chain_matches_reconstruction(data,
                                                      tmp_path_factory,
                                                      ray_session):
    base = tmp_path_factory.mktemp("chain")
    synth_transcripts(base / "c0", n_convs=12, seed=3, convs_per_file=6)
    files = list(transcript_files(base / "c0"))
    s0 = data.draw(st.sampled_from([2, 3]), label="initial_shards")
    idx = base / "idx"
    build_index(files, idx, PipelineConfig(num_shards=s0,
                                           doc_id_mode="hash"))

    removed: set[tuple[str, int]] = set()   # compact-folded (conv, turn)
    pending: dict[int, tuple[str, int]] = {}  # live tombstones
    n_shards = s0
    n_appends = 0
    snapshots: list[tuple[Path, dict]] = []
    n_merges = 0
    ops = data.draw(st.lists(
        st.sampled_from(["delete", "delete_query", "delete_ttl", "append",
                         "compact", "reshard", "snapshot", "merge"]),
        min_size=3, max_size=5), label="ops")
    # every example exercises the point-in-time, cross-index and bulk
    # delete ops at least once (random position for the rest of the chain)
    ops += [o for o in ("snapshot", "merge", "delete_query", "delete_ttl")
            if o not in ops]
    for op in ops:
        if op == "delete":
            live = _live_keys(idx)
            if not live:
                continue
            step = data.draw(st.integers(2, 5), label="del_step")
            chosen = live[::step][:6]
            delete_docs(idx, [d for d, _c, _t in chosen])
            for d, c, t in chosen:
                pending[d] = (c, t)
        elif op == "delete_query":
            # bulk delete of a query's whole match set (delete_by_query)
            term = data.draw(st.sampled_from(["tok00042", "alpha",
                                              "uniqueedge1"]),
                             label="dq_term")
            before = _tombstone_set(idx)
            delete_by_query(idx, term)
            _note_new_tombstones(idx, before, pending)
        elif op == "delete_ttl":
            # retention delete: everything older than a drawn percentile
            # of the LIVE stored timestamps
            from horus_ner_ray.state.shards import IndexPaths

            parts = sorted(IndexPaths(idx).docstore.glob("part-*.parquet"))
            t = pq.read_table(parts, columns=["doc_id", "ts"]).to_pandas()
            dead0 = _tombstone_set(idx)
            live_ts = t.loc[~t["doc_id"].isin(dead0), "ts"].dropna()
            if len(live_ts) == 0:
                continue
            pct = data.draw(st.sampled_from([10, 25, 40]), label="ttl_pct")
            cutoff = int(np.percentile(
                live_ts.astype("datetime64[us]").astype(np.int64), pct))
            delete_older_than(idx, cutoff)
            _note_new_tombstones(idx, dead0, pending)
        elif op == "append":
            n_appends += 1
            d = base / f"extra{n_appends}"
            synth_transcripts(d, n_convs=4, seed=100 + n_appends,
                              convs_per_file=4)
            new = _disjoint_conv_files(d, f"a{n_appends}x")
            append_fragments(idx, new)
            files += new
        elif op == "compact":
            compact_index(idx)
            removed |= set(pending.values())
            pending = {}
        elif op == "snapshot":
            # point-in-time hard-link copy: later chain ops must leave it
            # bit-identical (every writer publishes tmp+rename)
            sdst = base / f"snap{len(snapshots)}"
            snapshot_index(idx, sdst)
            snapshots.append((sdst, _tree_bytes(Path(idx))))
        elif op == "merge":
            # merge a small independently built index (disjoint convs)
            n_merges += 1
            d = base / f"msrc{n_merges}"
            synth_transcripts(d, n_convs=4, seed=200 + n_merges,
                              convs_per_file=4)
            new = _disjoint_conv_files(d, f"m{n_merges}x")
            idx2 = base / f"midx{n_merges}"
            build_index(new, idx2,
                        PipelineConfig(num_shards=data.draw(
                            st.sampled_from([2, 3]), label="merge_shards"),
                            doc_id_mode="hash"))
            out = base / f"merged{n_merges}"
            merge_indexes([idx, idx2], out, num_shards=n_shards)
            idx = out
            files += new
        else:  # reshard
            n_shards = data.draw(st.sampled_from([2, 3, 4]),
                                 label="new_shards")
            reshard_index(idx, n_shards)
        # every op must leave a fully consistent index behind
        # (continuous fsck: manifests vs files vs stats vs df table)
        assert verify_index(idx)["ok"]

    # reconstruction: fresh build over per-fragment FILTERED contents at
    # the final shard count, then the still-pending tombstones
    ref_dir = base / "refsrc"
    ref_dir.mkdir()
    ref_files = []
    for i, f in enumerate(files):
        t = pq.read_table(f).to_pandas()
        keep = [
            (str(c), int(ti)) not in removed
            for c, ti in zip(t["conv_id"], t["turn_idx"])
        ]
        out = ref_dir / f"part-{i:05d}.parquet"
        t[np.asarray(keep)].to_parquet(out, index=False)
        ref_files.append(str(out))
    ref = base / "ref"
    build_index(ref_files, ref, PipelineConfig(num_shards=n_shards,
                                               doc_id_mode="hash"))
    if pending:
        delete_docs(ref, sorted(pending))

    assert _tree_bytes(Path(idx)) == _tree_bytes(Path(ref))
    got_dead = read_tombstones(idx)
    want_dead = read_tombstones(ref)
    assert (got_dead is None) == (want_dead is None)
    if got_dead is not None:
        assert got_dead.tolist() == want_dead.tolist()
    si = json.loads((Path(idx) / "stats.json").read_text())
    sr = json.loads((Path(ref) / "stats.json").read_text())
    assert (si["n_docs"], si["total_tokens"], si["avgdl"]) == (
        sr["n_docs"], sr["total_tokens"], sr["avgdl"])
    ei, er = QueryEngine(idx), QueryEngine(ref)
    for q in reference_queries(k=10):
        assert ei.search(q["text"], q["k"]) == er.search(q["text"], q["k"])
    # the end state also passes the deep tombstone-membership scan
    assert verify_index(idx, deep=True)["ok"]
    # every snapshot is STILL bit-identical to its point-in-time source
    # tree and still passes fsck, no matter what the chain did afterwards
    for sdst, frozen in snapshots:
        assert _tree_bytes(Path(sdst)) == frozen
        assert verify_index(sdst)["ok"]

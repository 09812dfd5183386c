"""Point-in-time index snapshots — the backup/restore maintenance
operation (Elasticsearch snapshots; Lucene's SnapshotDeletionPolicy).

A snapshot is a HARD-LINK copy of every published file in the index
tree.  Once taken, it STAYS consistent without any locking because of
the repo-wide write discipline: every writer publishes via tmp+rename
(``atomic_write_table`` / ``atomic_write_json`` / ``os.replace``),
never by mutating a published file in place — so a link keeps pointing
at the immutable old inode no matter what deletes/compactions/appends/
reshards later do to the source tree.  Cost: O(#files) metadata
operations, zero data copied (falls back to a byte copy across
filesystems).

Taking the snapshot itself assumes the single-writer-per-index
deployment contract: per-file atomicity does not give multi-file
isolation, so maintenance running CONCURRENTLY with the walk could mix
old stats with new shards.  That violation is detected, not silently
tolerated — after linking, the maintenance markers must still be absent
and the mutable top-level files (stats.json, tombstones.parquet) must
still be the same inodes that were linked; otherwise the snapshot is
discarded and the call raises for a retry.

Refused up front while a maintenance marker is present
(``resharding.json`` / ``compacting.json``): those windows have shard
sets or stats that do not yet describe a complete index.  In-flight
publishes are skipped at every level — both ``*.tmp`` files and files
inside ``*.tmp`` staging DIRECTORIES (write_shard stages whole
``shard-NNNNN.tmp/`` dirs) — so the snapshot captures only published
state.

The snapshot IS an index directory: ``QueryEngine(snapshot_dir)`` opens
it directly, and a restore is just pointing the engine (or another
snapshot_index call) at it.  Tombstones present at snapshot time ride
along; the source's later deletes do not leak in (pinned in tests).
"""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path


def snapshot_index(index_dir: str | Path, dst_dir: str | Path) -> dict:
    """Hard-link snapshot of the index at ``index_dir`` into the new
    directory ``dst_dir``.  Returns {files, bytes, wall_s}."""
    t0 = time.time()
    src = Path(index_dir).resolve()
    dst = Path(dst_dir).resolve()
    if not (src / "stats.json").exists():
        raise ValueError(f"{src} is not a built index (no stats.json)")
    for marker, what in (("resharding.json", "mid-reshard"),
                         ("compacting.json", "mid-compaction")):
        if (src / marker).exists():
            raise RuntimeError(
                f"index is {what} ({marker} present) — its shard set / "
                "stats do not describe a complete index; finish the "
                "maintenance operation, then snapshot")
    if dst == src or src in dst.parents or dst in src.parents:
        raise ValueError(
            "snapshot destination must be a separate directory — not the "
            "source, not nested inside it (a snapshot planted in the live "
            "tree would be re-snapshotted into itself), not a parent")
    if dst.exists() and any(dst.iterdir()):
        raise ValueError(f"snapshot destination {dst} is not empty")
    n_files = 0
    n_bytes = 0
    linked: list[tuple[Path, Path]] = []
    for p in sorted(src.rglob("*")):
        rel = p.relative_to(src)
        # skip in-flight publishes at ANY level: write_shard stages whole
        # 'shard-NNNNN.tmp/' DIRECTORIES, whose inner files don't end in
        # .tmp themselves — a name-only check would bake a partial shard
        # into the snapshot (QueryEngine globs 'shard-*' and would open it)
        if p.is_dir() or any(part.endswith(".tmp") for part in rel.parts):
            continue
        out = dst / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        try:
            os.link(p, out)
        except OSError:  # cross-device: fall back to a byte copy
            shutil.copyfile(p, out)
        linked.append((p, out))
        n_files += 1
        n_bytes += p.stat().st_size
    # tmp+rename gives PER-FILE atomicity, not multi-file isolation: a
    # maintenance op starting mid-walk could leave the snapshot mixing
    # old stats with new shards.  Detect-and-refuse instead of locking
    # (single writer per index is the deployment contract; violations
    # must be loud): after linking, (a) no maintenance marker may exist,
    # and (b) every mutable top-level file every maintenance op rewrites
    # (stats.json by build/append/compact/reshard/merge,
    # tombstones.parquet by delete/compact) must still be the SAME inode
    # we linked — an atomic rewrite during the walk changes it.
    conflict = None
    for marker in ("resharding.json", "compacting.json"):
        if (src / marker).exists():
            conflict = f"{marker} appeared during the snapshot"
    for s, o in linked:
        if s.name in ("stats.json", "tombstones.parquet") \
                and s.parent == src:
            try:
                if not os.path.samefile(s, o):
                    conflict = f"{s.name} was rewritten during the snapshot"
            except OSError:
                conflict = f"{s.name} was removed during the snapshot"
    if (src / "tombstones.parquet").exists() and not \
            (dst / "tombstones.parquet").exists():
        conflict = "tombstones.parquet appeared during the snapshot"
    if conflict:
        shutil.rmtree(dst)
        raise RuntimeError(
            f"concurrent index maintenance detected ({conflict}) — the "
            "snapshot was discarded; retry when the index is quiescent")
    return {"files": n_files, "bytes": n_bytes,
            "wall_s": round(time.time() - t0, 3)}


def restore_snapshot(snapshot_dir: str | Path, dst_dir: str | Path,
                     alias_path: str | Path | None = None) -> dict:
    """Restore a snapshot into a NEW index directory (hard-link copy —
    the inverse direction of ``snapshot_index``, same O(files) metadata
    cost and the same tmp+rename publish discipline that makes snapshots
    consistent forever).  The restored tree is a full, independent index
    (QueryEngine opens it, maintenance ops apply to it); optionally
    repoint ``alias_path`` at it atomically for the zero-downtime
    restore-and-swap flow (pipelines/alias.py)."""
    out = snapshot_index(snapshot_dir, dst_dir)  # snapshots ARE index dirs
    if alias_path is not None:
        from horus_ner_ray.pipelines.alias import write_alias

        write_alias(alias_path, dst_dir)
        out = {**out, "alias": str(alias_path)}
    return out

"""Point-in-time index snapshots — the backup/restore maintenance
operation (Elasticsearch snapshots; Lucene's SnapshotDeletionPolicy).

A snapshot is a HARD-LINK copy of every published file in the index
tree.  It is consistent and stays consistent without any locking
because of the repo-wide write discipline: every writer publishes via
tmp+rename (``atomic_write_table`` / ``atomic_write_json`` /
``os.replace``), never by mutating a published file in place — so a
link taken now keeps pointing at the immutable old inode no matter what
deletes/compactions/appends/reshards later do to the source tree.
Cost: O(#files) metadata operations, zero data copied (falls back to a
byte copy across filesystems).

Refused while a maintenance marker is present (``resharding.json`` /
``compacting.json``): those windows have shard sets or stats that do
not yet describe a complete index.  ``*.tmp`` files (in-flight
publishes) are skipped — the snapshot captures only published state.

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
    if dst == src:
        raise ValueError("snapshot destination must differ from the source")
    if dst.exists() and any(dst.iterdir()):
        raise ValueError(f"snapshot destination {dst} is not empty")
    n_files = 0
    n_bytes = 0
    for p in sorted(src.rglob("*")):
        if p.is_dir() or p.name.endswith(".tmp"):
            continue
        rel = p.relative_to(src)
        out = dst / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        try:
            os.link(p, out)
        except OSError:  # cross-device: fall back to a byte copy
            shutil.copyfile(p, out)
        n_files += 1
        n_bytes += p.stat().st_size
    return {"files": n_files, "bytes": n_bytes,
            "wall_s": round(time.time() - t0, 3)}

"""Index aliases — the zero-downtime swap primitive (ES index aliases /
Lucene's swap-the-IndexSearcher pattern): readers open a stable alias
path; a reindex builds a NEW tree beside the old one and repoints the
alias with one atomic rename, so no reader ever observes a half-built
index.

An alias is a tiny JSON file ``{"index_dir": ...}``.  ``QueryEngine``
(and everything built on it — ScorerActor pools, serving, federation
members) accepts an alias path wherever it accepts an index dir: a FILE
argument resolves through ``resolve_index`` before ``IndexPaths`` opens
the tree.  Long-lived engines hold the tree they resolved at open time
(mmaps pin the old files — POSIX keeps them readable after the swap);
re-open to pick up the new target, exactly Lucene's searcher-refresh
contract.

Reference analogue: the reference swaps its SQLite evidence database by
path configuration between runs (reference: src/horus_meta.py connection
setup); here the swap is atomic and readers are explicit about refresh.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

ALIAS_MAX_HOPS = 4  # aliases may point at aliases; cycles refuse


def write_alias(alias_path: str | Path, index_dir: str | Path) -> None:
    """Create or atomically REPOINT an alias at ``index_dir`` (which must
    be a published index tree or another alias).  tmp+rename publish —
    concurrent readers see either the old target or the new one, never a
    partial file."""
    p = Path(alias_path)
    target = Path(index_dir)
    # the target must resolve to a real index NOW — refuse dangling
    resolved = resolve_index(target) if target.is_file() else target
    if not (Path(resolved) / "stats.json").exists():
        raise ValueError(
            f"alias target {index_dir} is not a published index "
            "(no stats.json)")
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_name(p.name + f".tmp-{os.getpid()}")
    tmp.write_text(json.dumps({"index_dir": str(Path(target).resolve())}))
    os.replace(tmp, p)


def read_alias(alias_path: str | Path) -> str:
    """The alias's immediate target (one hop, no validation)."""
    return str(json.loads(Path(alias_path).read_text())["index_dir"])


def resolve_index(path: str | Path) -> str:
    """Follow alias hops to an index DIRECTORY.  A directory argument
    returns unchanged (so callers can resolve unconditionally); a missing
    path or an alias chain deeper than ``ALIAS_MAX_HOPS`` (cycle) raises."""
    p = Path(path)
    for _ in range(ALIAS_MAX_HOPS + 1):
        if p.is_dir():
            return str(p)
        if p.is_file():
            p = Path(read_alias(p))
            continue
        raise FileNotFoundError(f"alias target does not exist: {p}")
    raise ValueError(
        f"alias chain from {path} exceeds {ALIAS_MAX_HOPS} hops "
        "(cycle or over-nesting)")

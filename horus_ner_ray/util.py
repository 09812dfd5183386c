"""Small shared runtime helpers."""

from __future__ import annotations

import os
from pathlib import Path

_REPO_PARENT = str(Path(__file__).resolve().parent.parent)


def worker_runtime_env() -> dict:
    """runtime_env for library stages so Ray worker processes can import
    this package even when the driver's cwd is elsewhere (worker sys.path
    does not inherit driver-side sys.path mutations).

    Returns {} when workers will already find the package — driver cwd is
    the repo, or the repo is on $PYTHONPATH — because a non-empty
    runtime_env forces a dedicated worker pool per stage (measured: tens of
    worker spawns, ~12x build slowdown at small scale); the default pool is
    shared and warm."""
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_PARENT in pp.split(os.pathsep) or os.getcwd() == _REPO_PARENT:
        return {}
    pp = _REPO_PARENT + (os.pathsep + pp if pp else "")
    return {"env_vars": {"PYTHONPATH": pp}}


def rmb(ds, fn, **kw):
    """map_batches with the package-importable runtime_env and the engine's
    defaults (zero-copy Arrow batches).  Every library stage goes through
    here so pipelines work regardless of the driver's cwd."""
    kw.setdefault("batch_format", "pyarrow")
    if kw["batch_format"] == "pyarrow":
        kw.setdefault("zero_copy_batch", True)
    return ds.map_batches(fn, runtime_env=worker_runtime_env(), **kw)


def rmg(grouped, fn, **kw):
    """map_groups with the package-importable runtime_env."""
    return grouped.map_groups(fn, runtime_env=worker_runtime_env(), **kw)

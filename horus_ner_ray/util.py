"""Small shared runtime helpers."""

from __future__ import annotations

import os
from pathlib import Path

_REPO_PARENT = str(Path(__file__).resolve().parent.parent)


def worker_runtime_env() -> dict:
    """runtime_env for actor-pool stages so Ray worker processes can import
    this package even when the driver's cwd is elsewhere (worker sys.path
    does not inherit driver-side sys.path mutations)."""
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_PARENT not in pp.split(os.pathsep):
        pp = _REPO_PARENT + (os.pathsep + pp if pp else "")
    return {"env_vars": {"PYTHONPATH": pp}}

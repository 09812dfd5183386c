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


def list_column_to_matrix(col, dtype="float64"):
    """Arrow list<float> column -> (n, d) numpy matrix, zero-copy from the
    flattened values buffer when rows are equal-length (the embedding-table
    case) — replaces per-row ``to_pylist()`` Python-object conversion in
    every matmul hot path.  Ragged rows fall back to the object path."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    if not hasattr(col, "offsets"):
        # Ray's ArrowTensorArray extension (from_pandas over ndarray cells)
        return np.asarray(col.to_numpy(zero_copy_only=False), dtype=dtype)
    offs = np.asarray(col.offsets, dtype=np.int64)
    lens = offs[1:] - offs[:-1]
    d = int(lens[0]) if n else 0
    if not (lens == d).all():
        return np.array(col.to_pylist(), dtype=object)  # ragged: slow path
    # flatten() honors the array's offset window, so this is the logical
    # values buffer in row order
    return np.asarray(col.flatten(), dtype=dtype).reshape(n, d)


def matrix_to_list_column(mat):
    """(n, d) numpy matrix -> Arrow list<float64> column without a Python
    list-of-rows materialization (inverse of list_column_to_matrix).
    Falls back to large_list when n*d exceeds int32 offset range (a huge
    block of high-dim embeddings) instead of silently wrapping."""
    import numpy as np
    import pyarrow as pa

    n, d = mat.shape
    flat = pa.array(np.ascontiguousarray(mat).reshape(-1), pa.float64())
    if n * d <= np.iinfo(np.int32).max:
        offsets = pa.array(np.arange(n + 1, dtype=np.int64) * d, pa.int32())
        return pa.ListArray.from_arrays(offsets, flat)
    offsets = pa.array(np.arange(n + 1, dtype=np.int64) * d, pa.int64())
    return pa.LargeListArray.from_arrays(offsets, flat)

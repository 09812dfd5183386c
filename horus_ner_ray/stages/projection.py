"""Sparse sign random projection (Johnson-Lindenstrauss dimensionality
reduction) over embedding columns — EXACT integer arithmetic end-to-end.

Achlioptas (2003) shows a sparse {+1, 0, -1} projection matrix with
probabilities {1/6, 2/3, 1/6} satisfies the JL lemma (up to the sqrt(3)
scale factor, which is a constant and irrelevant to distance RANKING —
ANN / near-dup consumers compare, they don't need calibrated norms).
Here the matrix entry m[i, j] is a pure function of (i, j, seed) via the
oracle-shared splitmix64 hash (stages/sketches.py; HUGEINT restatement
in __ray_entry__._sql_splitmix64), and the input vectors quantize to e6
ints BEFORE the matmul — so the projection is EXACT int64 arithmetic,
partitioning/order-invariant, and bit-replicable in SQL.

Scale shape: a pure per-batch map (no shuffle, no broadcast — the matrix
regenerates from (dims, seed) inside each batch, a few KB of hashing);
the d_in -> d_out reduction is the classic pre-ANN move that cuts the
embedding table by d_out/d_in before any index is built.

Reference analogue: the reference reduces image features to fixed-size
BoW codes before its SVMs (src/core/feature_extraction/object_detection/
sift.py:7-37) — same role: cheap, fixed-target-dim featurization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horus_ner_ray.stages.sketches import splitmix64
from horus_ner_ray.util import worker_runtime_env as _rte


def projection_matrix(in_dim: int, out_dim: int, seed: int) -> np.ndarray:
    """(in_dim, out_dim) int64 matrix with m[i, j] in {+1, -1, 0}:
    h = splitmix64((i * out_dim + j) XOR seed); h % 6 == 0 -> +1,
    == 1 -> -1, else 0 (Achlioptas density 1/3)."""
    i = np.arange(in_dim, dtype=np.uint64)[:, None]
    j = np.arange(out_dim, dtype=np.uint64)[None, :]
    h = splitmix64((i * np.uint64(out_dim) + j) ^ np.uint64(seed))
    r = h % np.uint64(6)
    return np.where(r == 0, 1, np.where(r == 1, -1, 0)).astype(np.int64)


def sparse_sign_projection(ds, out_dim: int = 8, seed: int = 2025,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id"):
    """Dataset(id, vector) -> Dataset (id, dim, value): value =
    sum_i m[i, dim] * floor(x_i * 1e6 + 0.5) — exact int64, long format
    (one row per output component, the SQL-comparable layout)."""
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")

    def project(batch: pa.Table) -> pa.Table:
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "value": pa.array([], pa.int64())})
        t = col.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            offs = np.asarray(col.offsets, dtype=np.int64)
            widths = np.unique(offs[1:] - offs[:-1])
            if len(widths) != 1:
                raise ValueError(
                    f"ragged {vec_col} lists (widths {widths.tolist()}) — "
                    "projection needs a fixed dimension")
            d = int(widths[0])
            flat = np.asarray(col.values, dtype=np.float64).reshape(n, d)
        else:
            # fixed-size list / Ray tensor extension / object-of-arrays
            arr = col.to_numpy(zero_copy_only=False)
            if arr.dtype == object:
                widths = {len(a) for a in arr}
                if len(widths) != 1:
                    raise ValueError(
                        f"ragged {vec_col} lists (widths "
                        f"{sorted(widths)}) — projection needs a fixed "
                        "dimension")
                flat = np.stack([np.asarray(a, dtype=np.float64)
                                 for a in arr])
            else:
                flat = np.asarray(arr, dtype=np.float64)
            d = flat.shape[1]
        q = np.floor(flat * 1e6 + 0.5).astype(np.int64)
        m = projection_matrix(d, out_dim, seed)
        out = q @ m  # exact int64 matmul
        ids = np.repeat(np.asarray(batch[id_col], dtype=np.int64), out_dim)
        dims = np.tile(np.arange(out_dim, dtype=np.int64), n)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "dim": pa.array(dims, pa.int64()),
                         "value": pa.array(out.reshape(-1), pa.int64())})

    return (ds.select_columns([id_col, vec_col])
            .map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte()))

"""Scalar quantization (SQ8) for vector search — the FAISS
ScalarQuantizer / Lucene int8-HNSW compression step (public technique):
fit per-dimension min/max over the corpus, encode every vector as 8-bit
codes (32x smaller than float64, 4x smaller than float32), and rank by
EXACT INTEGER squared-L2 distance between code vectors.

Scale shape: the fit is a per-batch min/max combiner (one 2xD row per
batch leaves each task; D-bounded driver state), the (mins, scale)
table broadcasts by closure, and search is the partial-top-k combiner
of ``similarity.ann_topk_bruteforce`` with int64 arithmetic — at most
k rows per query leave each batch and the corpus never shuffles.

Determinism / oracle: codes are ``clamp(floor((x - mn) / (mx - mn) *
255 + 0.5), 0, 255)`` — one float64 IEEE expression shared verbatim
with the DuckDB restatement — and distances are pure int64 sums, so
the driver pair (``sq_ann``) publishes integers only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horus_ner_ray.util import list_column_to_matrix, worker_runtime_env as _rte


def sq_fit(emb_ds, vec_col: str = "embedding"
           ) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (mins, maxs) over the corpus — a tiny combiner."""

    def part(batch: pa.Table) -> pa.Table:
        mat = list_column_to_matrix(batch[vec_col])
        if mat.shape[0] == 0:
            return pa.table({"kind": pa.array([], pa.string()),
                             "v": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "kind": pa.array(["min", "max"], pa.string()),
            "v": pa.array([mat.min(axis=0).tolist(),
                           mat.max(axis=0).tolist()],
                          pa.list_(pa.float64()))})

    parts = (emb_ds.select_columns([vec_col])
             .map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True, runtime_env=_rte())
             .to_pandas())
    mins = np.min(np.stack(parts.loc[parts["kind"] == "min", "v"]), axis=0)
    maxs = np.max(np.stack(parts.loc[parts["kind"] == "max", "v"]), axis=0)
    return mins.astype(np.float64), maxs.astype(np.float64)


def sq_encode(mat: np.ndarray, mins: np.ndarray,
              maxs: np.ndarray) -> np.ndarray:
    """The shared quantization rule: int64 codes in [0, 255] (constant
    dimensions — mx == mn — map everything to code 0 via a unit
    denominator, matching the SQL CASE)."""
    denom = maxs - mins
    denom = np.where(denom == 0.0, 1.0, denom)
    c = np.floor((np.asarray(mat, np.float64) - mins) / denom * 255.0
                 + 0.5)
    return np.clip(c, 0.0, 255.0).astype(np.int64)


def sq_ann(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray,
           k: int = 10, id_col: str = "vec_id",
           vec_col: str = "embedding",
           fit: tuple[np.ndarray, np.ndarray] | None = None):
    """Exact top-k by integer squared-L2 over SQ8 codes: (query_id,
    rank, vec_id, dist) — dist ascending, ties broken vec_id ascending.
    Pass ``fit`` to reuse a precomputed (mins, maxs)."""
    import ray

    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    mins, maxs = fit if fit is not None else sq_fit(emb_ds, vec_col)
    qids = np.asarray(query_ids, dtype=np.int64)
    qc = sq_encode(np.asarray(query_mat, np.float64), mins, maxs)
    ref = (ray.put((qids, qc, mins, maxs)) if ray.is_initialized()
           else (qids, qc, mins, maxs))

    def partial(batch: pa.Table) -> pa.Table:
        qi, q, mn, mx = ray.get(ref) if ray.is_initialized() else ref
        ids = np.asarray(batch[id_col], dtype=np.int64)
        codes = sq_encode(list_column_to_matrix(batch[vec_col]), mn, mx)
        # (nq, nb) int64 squared-L2 via the ||a-b||^2 expansion — exact
        # (codes are <= 255, D*255^2 fits easily)
        d2 = ((q * q).sum(axis=1)[:, None]
              + (codes * codes).sum(axis=1)[None, :]
              - 2 * (q @ codes.T))
        out_q, out_v, out_d = [], [], []
        kk = min(k, d2.shape[1])
        for i in range(len(qi)):
            row = d2[i]
            if len(row) > kk:
                kth = np.partition(row, kk - 1)[kk - 1]
                sel = np.flatnonzero(row <= kth)  # keep boundary ties
            else:
                sel = np.arange(len(row))
            out_q.append(np.full(len(sel), qi[i], dtype=np.int64))
            out_v.append(ids[sel])
            out_d.append(row[sel])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "dist": pa.array(np.concatenate(out_d), pa.int64()),
        })

    cand = (emb_ds.select_columns([id_col, vec_col])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte())
            .to_pandas())  # small: O(n_batches * nq * k)
    import pandas as pd

    out = []
    for qid, g in cand.groupby("query_id", sort=True):
        g = g.sort_values(["dist", "vec_id"], ascending=[True, True],
                          kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    res = (pd.concat(out, ignore_index=True) if out else
           pd.DataFrame(columns=["query_id", "vec_id", "dist", "rank"]))
    return res[["query_id", "rank", "vec_id", "dist"]].astype(np.int64)

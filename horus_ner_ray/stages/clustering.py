"""Distributed k-means over an embedding column (Lloyd's algorithm).

The clustering pass a semantic-dedup / data-curation pipeline runs over
document embeddings (cluster, then dedup or sample within clusters).
Reference analogue: the topic/feature grouping the reference's scorers
feed on (SURVEY.md A2/D5; reference src/core/feature_extraction/
features.py:224-235 is its only vector-space operator) — here clustering
is a first-class distributed iterative operator.

Distribution shape (the 100-TB design):
- centroids (k x d, tiny) broadcast once per iteration via ``ray.put``;
  fetched per task, never re-shipped per batch;
- each iteration is ONE streaming pass: a ``map_batches`` combiner emits
  per-batch partial statistics — k*(d+1) rows of (cluster, dim, s) int64
  sums + counts — and one small ``groupby`` reduces them; driver state is
  O(k*d), never O(rows);
- member components are quantized to e6 int64 BEFORE summation, so the
  reduction is order-free (integer adds commute exactly) and the updated
  centroids are bit-identical regardless of block arrival order — which
  also makes the whole algorithm expressible as unrolled SQL for the
  conformance oracle;
- determinism: init = the k vectors with the smallest ids (per-batch
  partial min-k, driver merges the tiny candidate set); assignment ties
  break toward the lowest cluster id; empty clusters keep their previous
  centroid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import list_column_to_matrix, worker_runtime_env as _rte


def _smallest_k_vectors(ds, k: int, id_col: str, vec_col: str) -> np.ndarray:
    """(k, d) float64 matrix of the vectors with the k smallest ids,
    ascending-id order.  Per-batch partial min-k -> tiny driver merge."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        if len(ids) > k:
            sel = np.argpartition(ids, k - 1)[:k]
            batch = batch.take(pa.array(np.sort(sel)))
        return batch

    cand = (
        ds.select_columns([id_col, vec_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .to_pandas()  # small: O(n_batches * k)
    )
    cand = cand.sort_values(id_col, kind="stable").head(k)
    if len(cand) < k:
        raise ValueError(f"k={k} exceeds dataset size {len(cand)}")
    return np.array(cand[vec_col].tolist(), dtype=np.float64)


def _sq_dists(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances via the inner-product expansion
    ||x||^2 - 2<x,c> + ||c||^2 — the same arithmetic shape as the SQL
    oracle's list_inner_product expression."""
    ee = np.einsum("ij,ij->i", x, x)
    cc = np.einsum("ij,ij->i", c, c)
    return ee[:, None] - 2.0 * (x @ c.T) + cc[None, :]


def kmeans_fit(ds, k: int, n_iter: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding") -> np.ndarray:
    """Fit k-means; returns the (k, d) float64 centroid matrix.

    Each of the ``n_iter`` Lloyd iterations is one streaming pass over
    ``ds`` producing e6-integer partial sums (order-free), so the result
    is a pure function of the multiset of rows."""
    import ray

    cent = _smallest_k_vectors(ds, k, id_col, vec_col)
    d = cent.shape[1]
    for _ in range(n_iter):
        ref = ray.put(cent) if ray.is_initialized() else cent

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref) if ray.is_initialized() else _ref
            x = list_column_to_matrix(batch[vec_col])
            a = np.argmin(_sq_dists(x, c), axis=1)  # ties -> lowest cluster
            xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, a, xq)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            cl = np.repeat(np.arange(k, dtype=np.int64), d + 1)
            dim = np.tile(np.r_[np.arange(d, dtype=np.int64), -1], k)
            s = np.concatenate([np.c_[sums, cnt[:, None]].reshape(-1)])
            return pa.table({"cluster": pa.array(cl), "dim": pa.array(dim),
                             "s": pa.array(s, pa.int64())})

        stats = (
            ds.select_columns([vec_col])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                         runtime_env=_rte())
            .groupby(["cluster", "dim"]).sum("s")
            .to_pandas()  # tiny: k * (d + 1) rows
        )
        piv = stats.pivot(index="cluster", columns="dim", values="sum(s)")
        cnt = piv[-1].reindex(np.arange(k)).fillna(0).to_numpy(np.int64)
        sums = piv.reindex(index=np.arange(k),
                           columns=np.arange(d)).fillna(0).to_numpy(np.float64)
        nonempty = cnt > 0
        new = cent.copy()
        new[nonempty] = sums[nonempty] / (cnt[nonempty, None] * 1e6)
        cent = new
    return cent


def kmeans_assign(ds, centroids: np.ndarray, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """Dataset(embeddings) -> Dataset(id, cluster): one broadcast +
    vectorized argmin pass; ties break toward the lowest cluster id."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64)) \
        if ray.is_initialized() else np.asarray(centroids, dtype=np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref) if ray.is_initialized() else ref
        x = list_column_to_matrix(batch[vec_col])
        a = np.argmin(_sq_dists(x, c), axis=1)
        return pa.table({id_col: batch[id_col],
                         "cluster": pa.array(a.astype(np.int64), pa.int64())})

    return ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
    )

"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — each batch does one numpy matmul
against a broadcast query matrix (``ray.put`` once, fetched per actor;
never re-shipped per batch), emits per-batch partial top-k rows, and the
driver merges the tiny (batches x k) candidate set exactly.  Scale path:
IVF — a seeded k-means-lite coarse quantizer assigns each vector to a
centroid list; queries probe the ``nprobe`` nearest centroids only.

Reference analogue: the word2vec ``most_similar`` neighbor expansion
(SURVEY.md D5, reference: src/core/feature_extraction/features.py:224-235)
— the only similarity search the reference performs, driver-side; here it
is a first-class distributed operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def ann_topk_bruteforce(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray,
                        k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Dataset(embeddings) -> (query_id, vec_id, cosine) exact top-k.

    Per-batch partial top-k (vectorized argpartition keeping score ties) ->
    driver-side exact merge of the small candidate set, tie-broken
    (cosine desc, vec_id asc).
    """
    import ray

    qm = np.asarray(query_mat, dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qm, qn)) if ray.is_initialized() else (
        np.asarray(query_ids, dtype=np.int64), qm, qn
    )

    def partial(batch: pa.Table) -> pa.Table:
        qids, q, qnorm = ray.get(ref) if ray.is_initialized() else ref
        ids = np.asarray(batch[id_col], dtype=np.int64)
        mat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        mn = np.linalg.norm(mat, axis=1)
        mn[mn == 0] = 1.0
        # dot / (|a||b|) — same arithmetic shape as list_cosine_similarity
        sims = (q @ mat.T) / (qnorm[:, None] * mn[None, :])  # (nq, nb)
        out_q, out_v, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(len(qids)):
            row = sims[qi]
            if len(row) > kk:
                kth = np.partition(row, len(row) - kk)[len(row) - kk]
                sel = np.flatnonzero(row >= kth)  # keep boundary ties
            else:
                sel = np.arange(len(row))
            out_q.append(np.full(len(sel), qids[qi], dtype=np.int64))
            out_v.append(ids[sel])
            out_s.append(row[sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    cand = emb_ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
    ).to_pandas()  # small: O(n_batches * nq * k)
    out = []
    for qid, g in cand.groupby("query_id", sort=True):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "vec_id", "cosine", "rank"]
    )
    return res[["query_id", "rank", "vec_id", "cosine"]]


class IVFIndex:
    """Seeded k-means-lite IVF over an embedding table (scale path).

    fit(): few Lloyd iterations on a sample, driver-side (centroid count is
    small); assign(): map_batches argmax matmul; search(): probe the
    ``nprobe`` nearest centroid lists only.
    """

    def __init__(self, n_centroids: int = 16, nprobe: int = 4, seed: int = 42, iters: int = 8):
        self.n_centroids = n_centroids
        self.nprobe = nprobe
        self.seed = seed
        self.iters = iters
        self.centroids: np.ndarray | None = None
        self.lists: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def fit(self, emb_ds, id_col: str = "vec_id", vec_col: str = "embedding"):
        rows = emb_ds.select_columns([id_col, vec_col]).take_all()
        ids = np.array([r[id_col] for r in rows], dtype=np.int64)
        mat = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float64))
        order = np.argsort(ids, kind="stable")
        ids, mat = ids[order], mat[order]
        rng = np.random.RandomState(self.seed)
        c = mat[rng.choice(len(mat), size=min(self.n_centroids, len(mat)), replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(mat @ c.T, axis=1)
            for j in range(len(c)):
                m = assign == j
                if m.any():
                    v = mat[m].mean(axis=0)
                    nv = np.linalg.norm(v)
                    if nv > 0:
                        c[j] = v / nv
        self.centroids = c
        assign = np.argmax(mat @ c.T, axis=1)
        for j in range(len(c)):
            m = assign == j
            self.lists[j] = (ids[m], mat[m])
        return self

    def search(self, query_mat: np.ndarray, k: int = 10) -> list[list[tuple[int, float]]]:
        q = _normalize(np.asarray(query_mat, dtype=np.float64))
        sims_c = q @ self.centroids.T
        out = []
        for qi in range(len(q)):
            probe = np.argsort(-sims_c[qi], kind="stable")[: self.nprobe]
            cids = []
            csims = []
            for j in probe:
                ids, mat = self.lists[int(j)]
                if len(ids) == 0:
                    continue
                cids.append(ids)
                csims.append(mat @ q[qi])
            if not cids:
                out.append([])
                continue
            ids = np.concatenate(cids)
            sims = np.concatenate(csims)
            order = np.lexsort((ids, -sims))[:k]
            out.append([(int(ids[i]), float(sims[i])) for i in order])
        return out

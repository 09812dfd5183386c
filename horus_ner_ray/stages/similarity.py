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

from horus_ner_ray.util import list_column_to_matrix, matrix_to_list_column, worker_runtime_env as _rte


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def ann_topk_bruteforce(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray,
                        k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
                        filter_col: str | None = None,
                        query_filter_vals: np.ndarray | None = None):
    """Dataset(embeddings) -> (query_id, vec_id, cosine) exact top-k.

    Per-batch partial top-k (vectorized argpartition keeping score ties) ->
    driver-side exact merge of the small candidate set, tie-broken
    (cosine desc, vec_id asc).

    ``filter_col`` + ``query_filter_vals`` (one value per query) turn this
    into FILTERED vector search with PRE-filter semantics (ES ``knn`` with
    ``filter``): query i only competes against rows whose ``filter_col``
    equals ``query_filter_vals[i]``, so exactly top-k of the FILTERED
    universe returns (never fewer than k because the filter ate the
    candidates).  The predicate masks inside each batch before the partial
    top-k — no second pass, no per-row Python.
    """
    import ray

    qm = np.asarray(query_mat, dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    if (filter_col is None) != (query_filter_vals is None):
        raise ValueError("filter_col and query_filter_vals go together")
    qf = (np.asarray(query_filter_vals, dtype=np.int64)
          if query_filter_vals is not None else None)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qm, qn, qf)) if ray.is_initialized() else (
        np.asarray(query_ids, dtype=np.int64), qm, qn, qf
    )

    def partial(batch: pa.Table) -> pa.Table:
        qids, q, qnorm, qfv = ray.get(ref) if ray.is_initialized() else ref
        ids = np.asarray(batch[id_col], dtype=np.int64)
        mat = list_column_to_matrix(batch[vec_col])
        mn = np.linalg.norm(mat, axis=1)
        mn[mn == 0] = 1.0
        # dot / (|a||b|) — same arithmetic shape as list_cosine_similarity
        sims = (q @ mat.T) / (qnorm[:, None] * mn[None, :])  # (nq, nb)
        if qfv is not None:
            labels = np.asarray(batch[filter_col], dtype=np.int64)
            # pre-filter: mismatching rows leave the competition entirely
            sims = np.where(qfv[:, None] == labels[None, :], sims, -np.inf)
        out_q, out_v, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(len(qids)):
            row = sims[qi]
            if len(row) > kk:
                kth = np.partition(row, len(row) - kk)[len(row) - kk]
                sel = np.flatnonzero(row >= kth)  # keep boundary ties
            else:
                sel = np.arange(len(row))
            if qfv is not None:
                sel = sel[row[sel] > -np.inf]  # drop filtered-out rows
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

    cols = [id_col, vec_col] + ([filter_col] if filter_col is not None else [])
    cand = emb_ds.select_columns(cols).map_batches(
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


def _sample_hash(ids: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of int64 ids for sampling order."""
    x = ids.astype(np.uint64)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    return x ^ (x >> np.uint64(33))


class IVFIndex:
    """Coarse-quantized IVF over an embedding table (scale path).

    Two fit modes: ``fit()`` (metric='cosine') draws a bounded sample and
    runs a seeded k-means-lite — cheap, approximate, the default;
    ``fit_kmeans()`` (metric='l2') runs the deterministic distributed
    Lloyd's fit from stages/clustering.py whose every step unrolls to SQL,
    making the pruned probe itself ORACLE-checkable (the ``ann_ivf``
    conformance query).  Search semantics are identical; only quantizer
    arithmetic and the stored-vector form differ.

    Nothing materializes the embedding table on the driver:

    * ``fit()`` draws a BOUNDED deterministic sample — each batch keeps its
      ``sample_size`` smallest id-hash rows (a partial of the global
      hash-order top-S), the driver keeps the global smallest ``sample_size``
      of the small partials — and runs Lloyd iterations on the S x d sample
      only (centroids are tiny).  Then it assigns every vector via a
      ``map_batches`` argmax matmul against the broadcast centroids and
      writes the inverted lists as centroid-partitioned Parquet
      (``lists_dir/centroid=J/``) — resumable, partition-pruned at probe
      time, one directory per list as the 100-TB layout requires.
    * ``search()`` probes the ``nprobe`` nearest centroids per query,
      reads ONLY the probed partitions, and streams per-batch partial
      top-k (each query masked to its own probe set) into a tiny driver
      merge — the same shape as ``ann_topk_bruteforce``.
    """

    def __init__(self, n_centroids: int = 16, nprobe: int = 4, seed: int = 42,
                 iters: int = 8, sample_size: int = 8192, lists_dir: str | None = None,
                 metric: str = "cosine"):
        if metric not in ("cosine", "l2"):
            raise ValueError(metric)
        self.n_centroids = n_centroids
        self.nprobe = nprobe
        self.seed = seed
        self.iters = iters
        self.sample_size = sample_size
        self.lists_dir = lists_dir
        self.metric = metric
        self.centroids: np.ndarray | None = None

    # -- fit ---------------------------------------------------------------

    def _bounded_sample(self, emb_ds, id_col: str, vec_col: str) -> np.ndarray:
        S = self.sample_size

        def partial(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col], dtype=np.int64)
            h = _sample_hash(ids)
            keep = np.argsort(h, kind="stable")[:S]
            return pa.table(
                {
                    "h": pa.array(h[keep].astype(np.int64), pa.int64()),
                    "vec": batch[vec_col].take(pa.array(keep)),
                }
            )

        cand = emb_ds.select_columns([id_col, vec_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
        ).to_pandas()  # O(n_blocks * S) small partials, not the table
        order = np.argsort(cand["h"].to_numpy().view(np.uint64), kind="stable")[:S]
        return _normalize(np.array(cand["vec"].iloc[order].tolist(), dtype=np.float64))

    def fit(self, emb_ds, id_col: str = "vec_id", vec_col: str = "embedding"):
        import tempfile

        mat = self._bounded_sample(emb_ds, id_col, vec_col)
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
        if self.lists_dir is None:
            self.lists_dir = tempfile.mkdtemp(prefix="ivf_lists_")
        self._write_lists(emb_ds, id_col, vec_col)
        return self

    def fit_kmeans(self, emb_ds, id_col: str = "vec_id",
                   vec_col: str = "embedding", n_iter: int = 2):
        """ORACLE-replicable coarse quantizer (metric='l2'): the same
        deterministic distributed Lloyd's fit the ``kmeans_clusters`` query
        hash-matches in SQL — init = k smallest vec_ids, one streaming
        combiner pass per iteration with order-free e6-int centroid sums,
        argmin squared-L2 assignment with ties to the lowest cluster
        (stages/clustering.py kmeans_fit).  Every step is expressible as
        unrolled SQL, which is what flips the pruned-probe ``ann_ivf``
        query from rows-only to rows+schema+hash ORACLE."""
        import tempfile

        from horus_ner_ray.stages.clustering import kmeans_fit

        self.metric = "l2"
        self.centroids = kmeans_fit(emb_ds, self.n_centroids, n_iter=n_iter,
                                    id_col=id_col, vec_col=vec_col)
        if self.lists_dir is None:
            self.lists_dir = tempfile.mkdtemp(prefix="ivf_lists_")
        self._write_lists(emb_ds, id_col, vec_col)
        return self

    def assign_dataset(self, emb_ds, id_col: str = "vec_id", vec_col: str = "embedding"):
        """map_batches argmax matmul against the broadcast centroids ->
        (vec_id, vec[normalized], cent, centroid); ``centroid`` becomes the
        hive partition key, ``cent`` stays inside the files so probed
        partitions can be read back by path."""
        import ray

        cref = ray.put(self.centroids) if ray.is_initialized() else self.centroids
        metric = self.metric

        def fn(batch: pa.Table) -> pa.Table:
            c = ray.get(cref) if ray.is_initialized() else cref
            ids = np.asarray(batch[id_col], dtype=np.int64)
            raw = list_column_to_matrix(batch[vec_col])
            if metric == "l2":
                # the kmeans_assign arithmetic (inner-product expansion,
                # ties to the lowest cluster) over RAW vectors; the stored
                # vector stays raw so the scorer can mirror the oracle's
                # list_cosine_similarity shape exactly
                from horus_ner_ray.stages.clustering import _sq_dists

                cent = np.argmin(_sq_dists(raw, c), axis=1).astype(np.int32)
                mat = raw
            else:
                mat = _normalize(raw)
                cent = np.argmax(mat @ c.T, axis=1).astype(np.int32)
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "vec": matrix_to_list_column(mat),
                    "cent": pa.array(cent, pa.int32()),
                    "centroid": pa.array(cent, pa.int32()),
                }
            )

        return emb_ds.select_columns([id_col, vec_col]).map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
        )

    def _write_lists(self, emb_ds, id_col: str, vec_col: str) -> None:
        import shutil
        from pathlib import Path

        # clear any previous generation: search() globs *.parquet per
        # probed partition, so stale files from an earlier fit would be
        # scored alongside the new ones
        if Path(self.lists_dir).exists():
            shutil.rmtree(self.lists_dir)
        self.assign_dataset(emb_ds, id_col, vec_col).write_parquet(
            self.lists_dir, partition_cols=["centroid"]
        )

    # -- search ------------------------------------------------------------

    def search(self, query_mat: np.ndarray, k: int = 10) -> list[list[tuple[int, float]]]:
        """Batch probe: (nq, d) queries -> per query the exact top-k within
        its ``nprobe`` probed lists, tie-broken (cosine desc, vec_id asc)."""
        import ray
        from pathlib import Path

        import ray.data as rd

        raw_q = np.asarray(query_mat, dtype=np.float64)
        q = _normalize(raw_q)
        C = len(self.centroids)
        nprobe = min(self.nprobe, C)
        if self.metric == "l2":
            # probe = nprobe nearest centroids by the same squared-L2
            # expansion the assignment (and the SQL oracle) uses; ties
            # break to the lowest cluster id
            from horus_ner_ray.stages.clustering import _sq_dists

            d = _sq_dists(raw_q, self.centroids)  # (nq, C)
            probes = np.empty((len(q), nprobe), dtype=np.int64)
            for qi in range(len(q)):
                probes[qi] = np.lexsort((np.arange(C), d[qi]))[:nprobe]
        else:
            sims_c = q @ self.centroids.T  # (nq, C)
            probes = np.argsort(-sims_c, axis=1, kind="stable")[:, :nprobe]  # (nq, P)
        # per-centroid query-probe mask, broadcast once
        mask = np.zeros((len(self.centroids), len(q)), dtype=bool)  # (C, nq)
        for qi in range(len(q)):
            mask[probes[qi], qi] = True
        probed_dirs = [
            str(f)
            for j in sorted(set(int(x) for x in probes.reshape(-1)))
            for f in sorted((Path(self.lists_dir) / f"centroid={j}").glob("*.parquet"))
        ]
        if not probed_dirs:
            return [[] for _ in range(len(q))]
        metric = self.metric
        if metric == "l2":
            qn = np.linalg.norm(raw_q, axis=1)
            qn[qn == 0] = 1.0
            payload = (raw_q, qn, mask)
        else:
            payload = (q, None, mask)
        ref = ray.put(payload) if ray.is_initialized() else payload

        def partial(batch: pa.Table) -> pa.Table:
            qm, qnorm, msk = ray.get(ref) if ray.is_initialized() else ref
            ids = np.asarray(batch["vec_id"], dtype=np.int64)
            mat = list_column_to_matrix(batch["vec"])
            cent = np.asarray(batch["cent"], dtype=np.int64)
            if qnorm is not None:
                # l2 lists store RAW vectors: dot / (|q||v|) — the exact
                # bruteforce (and SQL list_cosine_similarity) arithmetic
                mn = np.linalg.norm(mat, axis=1)
                mn[mn == 0] = 1.0
                sims = (qm @ mat.T) / (qnorm[:, None] * mn[None, :])
            else:
                sims = qm @ mat.T  # (nq, nb); vectors stored normalized
            sims = np.where(msk[cent].T, sims, -np.inf)  # mask unprobed lists
            out_q, out_v, out_s = [], [], []
            kk = min(k, sims.shape[1])
            for qi in range(len(qm)):
                row = sims[qi]
                if len(row) > kk:
                    kth = np.partition(row, len(row) - kk)[len(row) - kk]
                    sel = np.flatnonzero((row >= kth) & np.isfinite(row))
                else:
                    sel = np.flatnonzero(np.isfinite(row))
                if len(sel) == 0:
                    continue
                out_q.append(np.full(len(sel), qi, dtype=np.int64))
                out_v.append(ids[sel])
                out_s.append(row[sel])
            if not out_q:
                return pa.table(
                    {"qi": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "qi": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                    "cosine": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

        cand = rd.read_parquet(probed_dirs, columns=["vec_id", "vec", "cent"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
        ).to_pandas()  # small: O(n_batches * nq * k)
        out: list[list[tuple[int, float]]] = [[] for _ in range(len(q))]
        for qi, g in cand.groupby("qi", sort=True):
            ids_ = g["vec_id"].to_numpy(np.int64)
            sims_ = g["cosine"].to_numpy(np.float64)
            order = np.lexsort((ids_, -sims_))[:k]
            out[int(qi)] = [(int(ids_[i]), float(sims_[i])) for i in order]
        return out

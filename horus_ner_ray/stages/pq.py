"""Product quantization ANN (the memory-scale path of the similarity
family: brute force -> IVF partition pruning -> PQ compression).

Jégou, Douze & Schmid, "Product quantization for nearest neighbor
search" (IEEE TPAMI 33(1), 2011): split the d dims into M contiguous
subspaces, learn a ks-centroid codebook per subspace, store each vector
as M small codes (d floats -> M bytes), and answer queries by ASYMMETRIC
DISTANCE (ADC): one (M x ks) table of exact query-sub-to-centroid
squared distances per query, then each candidate's approximate distance
is M table lookups summed — no decoded vectors, no full-width matmul.

Everything here is deterministic: the per-subspace codebooks come from
the same seeded distributed Lloyd's fit the ``kmeans_clusters`` oracle
hash-matches in SQL (init = ks smallest vec_ids' sub-slices, order-free
e6-integer centroid sums, argmin ties to the lowest centroid), so codes
AND ADC rankings replicate in DuckDB (the ``pq_codes`` / ``pq_ann``
conformance queries).  Reference capability analogue: the vector-space
scorer family (SURVEY.md A2/D5); at 100 TB the codes table is ~d*4/M x
smaller than the embedding table and streams through ``map_batches``
without ever materializing on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horus_ner_ray.stages.clustering import _sq_dists, list_column_to_matrix
from horus_ner_ray.util import worker_runtime_env as _rte


class PQIndex:
    """Deterministic product quantizer.

    ``fit`` runs one distributed Lloyd's fit PER SUBSPACE over the
    sub-sliced embedding column (M small passes; centroids are tiny and
    live on the driver).  ``encode`` broadcasts the (M, ks, d/M)
    codebook tensor once and assigns codes batch-vectorized.  ``search``
    builds the per-query distance tables on the driver (M*ks floats per
    query) and streams the codes table through a per-batch partial
    top-k; the driver merges bounded partials, never the table."""

    def __init__(self, m: int = 4, ks: int = 16, n_iter: int = 2):
        if m <= 0 or ks <= 0:
            raise ValueError("m and ks must be > 0")
        self.m = m
        self.ks = ks
        self.n_iter = n_iter
        self.codebooks: np.ndarray | None = None  # (m, ks, d//m)
        self.d: int | None = None

    def fit(self, emb_ds, id_col: str = "vec_id", vec_col: str = "embedding"):
        """All M per-subspace Lloyd's fits fused into ONE streaming pass
        per iteration (instead of M independent fits = 3M dataset
        passes): each batch assigns codes for every subspace against the
        broadcast codebook tensor and emits order-free e6-integer
        partial sums keyed (subspace, cluster, dim).  Arithmetic is
        element-for-element the per-subspace ``kmeans_fit`` (same init =
        ks smallest vec_ids' sub-slices, same floor(x*1e6+0.5) sums,
        same argmin tie rule), pinned by test_pq_fit_matches_kmeans_fit."""
        import ray

        from horus_ner_ray.stages.clustering import _smallest_k_vectors

        row = emb_ds.take(1)[0]
        self.d = len(row[vec_col])
        if self.d % self.m:
            raise ValueError(
                f"dim {self.d} not divisible into {self.m} subspaces")
        m, ks, dsub = self.m, self.ks, self.d // self.m
        init = _smallest_k_vectors(emb_ds, ks, id_col, vec_col)
        cbs = np.stack([init[:, mi * dsub:(mi + 1) * dsub]
                        for mi in range(m)])  # (m, ks, dsub)
        for _ in range(self.n_iter):
            ref = ray.put(cbs) if ray.is_initialized() else cbs

            def partial(batch: pa.Table, _ref=ref) -> pa.Table:
                c = ray.get(_ref) if ray.is_initialized() else _ref
                x = list_column_to_matrix(batch[vec_col])
                subs, cls, dims, ss = [], [], [], []
                for mi in range(m):
                    sub = x[:, mi * dsub:(mi + 1) * dsub]
                    a = np.argmin(_sq_dists(sub, c[mi]), axis=1)
                    xq = np.floor(sub * 1e6 + 0.5).astype(np.int64)
                    sums = np.zeros((ks, dsub), dtype=np.int64)
                    np.add.at(sums, a, xq)
                    cnt = np.bincount(a, minlength=ks).astype(np.int64)
                    subs.append(np.full(ks * (dsub + 1), mi, dtype=np.int64))
                    cls.append(np.repeat(np.arange(ks, dtype=np.int64),
                                         dsub + 1))
                    dims.append(np.tile(
                        np.r_[np.arange(dsub, dtype=np.int64), -1], ks))
                    ss.append(np.c_[sums, cnt[:, None]].reshape(-1))
                return pa.table({
                    "sub": pa.array(np.concatenate(subs)),
                    "cluster": pa.array(np.concatenate(cls)),
                    "dim": pa.array(np.concatenate(dims)),
                    "s": pa.array(np.concatenate(ss), pa.int64()),
                })

            stats = (emb_ds.select_columns([vec_col])
                     .map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True, runtime_env=_rte())
                     .groupby(["sub", "cluster", "dim"]).sum("s")
                     .to_pandas())  # tiny: m * ks * (dsub + 1) rows
            new = cbs.copy()
            for mi in range(m):
                g = stats[stats["sub"] == mi]
                piv = g.pivot(index="cluster", columns="dim",
                              values="sum(s)")
                cnt = piv[-1].reindex(np.arange(ks)).fillna(0).to_numpy(
                    np.int64)
                sums = piv.reindex(index=np.arange(ks),
                                   columns=np.arange(dsub)).fillna(0)\
                    .to_numpy(np.float64)
                nonempty = cnt > 0
                new[mi][nonempty] = (sums[nonempty]
                                     / (cnt[nonempty, None] * 1e6))
            cbs = new
        self.codebooks = cbs
        return self

    def encode(self, emb_ds, id_col: str = "vec_id",
               vec_col: str = "embedding"):
        """(vec_id, code_0..code_{m-1}) dataset: per subspace, argmin
        squared L2 against the broadcast codebooks (ties -> lowest code,
        the Lloyd's-fit tie rule)."""
        import ray

        if self.codebooks is None:
            raise ValueError("fit() first")
        m, ks, dsub = self.codebooks.shape
        ref = ray.put(self.codebooks) if ray.is_initialized() else self.codebooks

        def fn(batch: pa.Table, _ref=ref) -> pa.Table:
            cbs = ray.get(_ref) if ray.is_initialized() else _ref
            x = list_column_to_matrix(batch[vec_col])
            cols = {id_col: batch[id_col]}
            for mi in range(m):
                sub = x[:, mi * dsub:(mi + 1) * dsub]
                codes = np.argmin(_sq_dists(sub, cbs[mi]), axis=1)
                cols[f"code_{mi}"] = pa.array(codes.astype(np.int32),
                                              pa.int32())
            return pa.table(cols)

        return emb_ds.select_columns([id_col, vec_col]).map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True,
            runtime_env=_rte())

    def distance_tables(self, query_mat: np.ndarray) -> np.ndarray:
        """(nq, m, ks) exact query-sub-to-centroid squared distances —
        the ADC lookup tables; M*ks floats per query."""
        q = np.asarray(query_mat, dtype=np.float64)
        m, ks, dsub = self.codebooks.shape
        out = np.empty((len(q), m, ks), dtype=np.float64)
        for mi in range(m):
            out[:, mi, :] = _sq_dists(q[:, mi * dsub:(mi + 1) * dsub],
                                      self.codebooks[mi])
        return out

    def search(self, codes_ds, query_ids: np.ndarray,
               query_mat: np.ndarray, k: int = 10,
               id_col: str = "vec_id") -> "pa.Table":
        """ADC top-k per query over an encoded dataset.  Approximate
        distance accumulates the M table lookups in subspace order
        (m=0..M-1, left-associated — the SQL oracle's explicit
        ``d0+d1+...`` sum), ties (dist, vec_id) ascending.  Per-batch
        partial top-k -> tiny driver merge, the ``ann_topk_bruteforce``
        shape."""
        import ray

        if self.codebooks is None:
            raise ValueError("fit() first")
        m = self.m
        dts = self.distance_tables(query_mat)
        qids = np.asarray(query_ids, dtype=np.int64)
        ref = ray.put(dts) if ray.is_initialized() else dts

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            dt = ray.get(_ref) if ray.is_initialized() else _ref
            ids = np.asarray(batch[id_col], dtype=np.int64)
            codes = [np.asarray(batch[f"code_{mi}"], dtype=np.int64)
                     for mi in range(m)]
            out = {"query_id": [], id_col: [], "adist": []}
            for qi in range(len(dt)):
                acc = dt[qi, 0][codes[0]]
                for mi in range(1, m):  # fixed order == SQL's d0+d1+...
                    acc = acc + dt[qi, mi][codes[mi]]
                sel = np.lexsort((ids, acc))[:k]
                out["query_id"].append(np.full(len(sel), qids[qi],
                                               dtype=np.int64))
                out[id_col].append(ids[sel])
                out["adist"].append(acc[sel])
            return pa.table({
                "query_id": pa.array(np.concatenate(out["query_id"])),
                id_col: pa.array(np.concatenate(out[id_col])),
                "adist": pa.array(np.concatenate(out["adist"]),
                                  pa.float64()),
            })

        parts = codes_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            runtime_env=_rte()).to_pandas()  # bounded: nq*k per batch
        outs = []
        for qi in qids:
            g = parts[parts.query_id == qi]
            sel = np.lexsort((g[id_col].to_numpy(),
                              g["adist"].to_numpy()))[:k]
            g = g.iloc[sel].reset_index(drop=True)
            g["rank"] = np.arange(1, len(g) + 1)
            outs.append(g)
        import pandas as pd

        return pd.concat(outs, ignore_index=True)[
            ["query_id", "rank", id_col, "adist"]]


def ivfpq_search(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray,
                 k: int = 10, n_centroids: int = 16, nprobe: int = 4,
                 m: int = 4, ks: int = 16, n_iter: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 pq: "PQIndex | None" = None):
    """IVF + PQ composed (the FAISS ``IVFPQ`` shape): the deterministic
    coarse k-means prunes each query to its ``nprobe`` nearest
    partitions (the ``ann_ivf`` quantizer) and the surviving candidates
    rank by PQ asymmetric distance over their CODES (the ``pq_ann``
    scorer) — at scale the scan touches nprobe/n_centroids of the codes
    table (already ~d*4/M x smaller than the vectors) and never decodes
    an embedding.  One combined encode pass emits (vec_id, cluster,
    code_0..code_{m-1}); probes and distance tables are driver-side
    numpy over the tiny centroid state.  Fully deterministic — both legs
    replicate in SQL (the ``ivfpq_ann`` conformance query chains the two
    existing oracle builders)."""
    import pandas as pd
    import ray

    from horus_ner_ray.stages.clustering import kmeans_fit

    cents = kmeans_fit(emb_ds, n_centroids, n_iter=n_iter,
                       id_col=id_col, vec_col=vec_col)
    # ``pq=`` accepts a prefitted quantizer (the fit is a pure function
    # of the table, so reuse is free determinism-wise)
    pqi = pq if pq is not None else PQIndex(m=m, ks=ks, n_iter=n_iter).fit(
        emb_ds, id_col=id_col, vec_col=vec_col)
    m = pqi.m
    dsub = pqi.d // m
    state = (cents, pqi.codebooks)
    ref = ray.put(state) if ray.is_initialized() else state

    def encode(batch: pa.Table, _ref=ref) -> pa.Table:
        ce, cb = ray.get(_ref) if ray.is_initialized() else _ref
        x = list_column_to_matrix(batch[vec_col])
        cols = {id_col: batch[id_col],
                "cluster": pa.array(
                    np.argmin(_sq_dists(x, ce), axis=1).astype(np.int32),
                    pa.int32())}
        for mi in range(m):
            sub = x[:, mi * dsub:(mi + 1) * dsub]
            cols[f"code_{mi}"] = pa.array(
                np.argmin(_sq_dists(sub, cb[mi]), axis=1).astype(np.int32),
                pa.int32())
        return pa.table(cols)

    codes = emb_ds.select_columns([id_col, vec_col]).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())

    q = np.asarray(query_mat, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)
    # per-query probe sets: nprobe nearest coarse centroids (the same
    # squared-L2 expansion as the fit; argsort ties -> lowest cluster)
    probes = np.argsort(_sq_dists(q, cents), axis=1,
                        kind="stable")[:, :nprobe]
    dts = pqi.distance_tables(q)
    sref = ray.put((dts, probes)) if ray.is_initialized() else (dts, probes)

    def partial(batch: pa.Table, _ref=sref) -> pa.Table:
        dt, pr = ray.get(_ref) if ray.is_initialized() else _ref
        ids = np.asarray(batch[id_col], dtype=np.int64)
        cl = np.asarray(batch["cluster"], dtype=np.int64)
        cds = [np.asarray(batch[f"code_{mi}"], dtype=np.int64)
               for mi in range(m)]
        out_q, out_i, out_d = [], [], []
        for qi in range(len(dt)):
            mask = np.isin(cl, pr[qi])
            if not mask.any():
                continue
            sel_ids = ids[mask]
            acc = dt[qi, 0][cds[0][mask]]
            for mi in range(1, m):  # fixed order == SQL's d0+d1+...
                acc = acc + dt[qi, mi][cds[mi][mask]]
            sel = np.lexsort((sel_ids, acc))[:k]
            out_q.append(np.full(len(sel), qids[qi], dtype=np.int64))
            out_i.append(sel_ids[sel])
            out_d.append(acc[sel])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "adist": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_i)),
                         "adist": pa.array(np.concatenate(out_d),
                                           pa.float64())})

    parts = codes.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True,
                              runtime_env=_rte()).to_pandas()
    outs = []
    for qi in qids:
        g = parts[parts.query_id == qi]
        sel = np.lexsort((g[id_col].to_numpy(), g["adist"].to_numpy()))[:k]
        g = g.iloc[sel].reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        outs.append(g)
    return pd.concat(outs, ignore_index=True)[
        ["query_id", "rank", id_col, "adist"]]


def ivfpq_refine(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray,
                 k: int = 10, r: int = 20, id_col: str = "vec_id",
                 vec_col: str = "embedding", **ivfpq_kwargs):
    """Two-stage ANN with EXACT refinement (FAISS ``IndexRefineFlat``
    over IVFPQ): stage 1 takes each query's top-``r`` candidates by PQ
    asymmetric distance under the integer rule (adist_e6 asc, vec asc —
    the same rank the ivfpq oracle states); stage 2 re-scores ONLY those
    candidates with the exact cosine (the ann_topk arithmetic —
    ``(q . x) / (|q||x|)``, matching list_cosine_similarity) in one
    masked streaming pass, and reranks (cosine_e6 desc, vec asc).

    The expensive exact scorer touches nq x r vectors instead of the
    corpus — the standard recall-repair step after lossy compression.
    Returns a DataFrame (query_id, rank, vec_id, cosine_e6).
    """
    import math

    import pandas as pd
    import ray

    from horus_ner_ray.util import list_column_to_matrix

    qids = np.asarray(query_ids, dtype=np.int64)
    qm = np.asarray(query_mat, dtype=np.float64)
    cand = ivfpq_search(emb_ds, qids, qm, k=r * 3 + 20,
                        id_col=id_col, vec_col=vec_col, **ivfpq_kwargs)
    cand = cand.assign(
        adist_e6=[math.floor(v * 1e6 + 0.5) for v in cand["adist"]])
    keep = []
    for qid, g in cand.groupby("query_id", sort=True):
        keep.append(g.sort_values(["adist_e6", "vec_id"],
                                  kind="stable").head(r))
    cand = pd.concat(keep, ignore_index=True)
    byq = {int(qid): np.sort(g[id_col].to_numpy(np.int64))
           for qid, g in cand.groupby("query_id")}
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    state = (qids, qm, qn, byq)
    ref = ray.put(state) if ray.is_initialized() else state

    def partial(batch: pa.Table) -> pa.Table:
        qi, q, qnorm, cands = ray.get(ref) if ray.is_initialized() else state
        ids = np.asarray(batch[id_col], dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        mat = None
        mn = None
        for i, qid in enumerate(qi):
            sel = np.flatnonzero(np.isin(ids, cands.get(int(qid), ())))
            if not len(sel):
                continue
            if mat is None:
                mat = list_column_to_matrix(batch[vec_col])
                mn = np.linalg.norm(mat, axis=1)
                mn[mn == 0] = 1.0
            # same arithmetic shape as ann_topk / list_cosine_similarity
            sims = (q[i:i + 1] @ mat[sel].T) / (qnorm[i] * mn[sel][None, :])
            out_q.append(np.full(len(sel), qid, dtype=np.int64))
            out_v.append(ids[sel])
            out_s.append(sims[0])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            id_col: pa.array(np.concatenate(out_v), pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        })

    from horus_ner_ray.util import worker_runtime_env as _rte2

    exact = emb_ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte2()).to_pandas()
    exact["cosine_e6"] = np.array(
        [math.floor(v * 1e6 + 0.5) for v in exact["cosine"]],
        dtype=np.int64) if len(exact) else np.array([], dtype=np.int64)
    rows = []
    for qid, g in exact.groupby("query_id", sort=True):
        g = g.sort_values(["cosine_e6", id_col],
                          ascending=[False, True], kind="stable").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        rows.append(g[["query_id", "rank", id_col, "cosine_e6"]])
    if not rows:
        return pd.DataFrame({"query_id": [], "rank": [], id_col: [],
                             "cosine_e6": []}).astype(np.int64)
    return pd.concat(rows, ignore_index=True).astype(np.int64)

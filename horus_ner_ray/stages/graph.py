"""Term co-occurrence graph operators: weighted PageRank (TextRank
keyword extraction) and triangle counting.

Reference analogue: the reference's only term-association operator is the
word2vec ``most_similar`` lookup (src/core/feature_extraction/
features.py:224-235); graph centrality over the co-occurrence structure is
the corpus-level counterpart a training-data pipeline runs for keyword /
keyphrase extraction (TextRank, Mihalcea & Tarau 2004) and for community
statistics (triangles).

Graph construction (shared with stages/collocations.py — same df-filtered
vocabulary, same presence-based document co-occurrence):
    nodes = terms with ``min_df <= df <= max_df_ratio * N``
    edge (a, b) with weight c_ab = #docs containing both, kept when
    ``c_ab >= min_pair_count``; the graph is undirected (symmetrized into
    two directed arcs for the rank iteration).

PageRank in exact integer fixed-point (order-free, oracle-hashable):
    r_0(v)     = SCALE                        (SCALE = 10^9)
    base       = ((den - num) * SCALE) // den   (damping d = num/den)
    r_{t+1}(v) = base + sum_{u ~ v} (num * c_uv * r_t(u)) // (den * W(u))
with W(u) = sum_b c_ub the weighted out-degree.  Every contribution is a
single integer floor-division of exact integers, so the distributed sum
commutes and the result is a pure function of the graph — which also makes
the whole recurrence expressible as K chained SQL CTEs for the conformance
oracle.  Magnitude bound: contributions shrink each hop (sum over u of
c_uv/W(u) <= deg(v)), so r stays O(n_nodes * SCALE); the int64 product
num * c * r is safe while n_nodes * max_c < ~1e9 — far above the
post-filter vocab of any windowed corpus; the oracle runs HUGEINT.

Distribution shape (the 100-TB design):
- the edge table is built once by the PMI combiner pipeline (per-batch
  ``np.unique``-packed partials, one (ia, ib) groupby) and CHECKPOINTED to
  Parquet so the K rank iterations re-read edges, never re-tokenize;
- the rank vector is O(post-filter vocab) — the same bounded small table
  as the vocabulary itself — broadcast once per iteration via ``ray.put``
  and combined per batch (``np.add.at`` over in-batch targets), so each
  iteration is ONE streaming pass over edges + one tiny groupby;
- triangle counting broadcasts the sorted packed edge-key array once
  (O(edges) ints, bounded by the df filter) and intersects neighbor
  ranges per batch with searchsorted — no all-to-all join.
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.collocations import kept_vocab
from horus_ner_ray.util import worker_runtime_env as _rte

SCALE = 10**9


def _edges_dataset(ds, min_df: int, max_df_ratio: float,
                   min_pair_count: int, text_col: str, id_col: str):
    """(terms_arr, df_vec, undirected edge Dataset (ia, ib, pair_count))
    — the PMI pipeline up to (and including) the pair-count filter."""
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages import collocations as C
    from horus_ner_ray.stages.termstats import term_df_dataset

    n_docs = ds.count()
    max_df = int(np.floor(max_df_ratio * n_docs))
    terms_arr, df_vec = kept_vocab(
        term_df_dataset(ds, text_col=text_col, id_col=id_col), min_df, max_df)
    V = len(terms_arr)
    if V == 0:
        return terms_arr, df_vec, None

    import ray

    import pyarrow.compute as pc

    from horus_ner_ray.stages.tokenize import tokenize_column

    payload = terms_arr
    ref = ray.put(payload) if ray.is_initialized() else payload

    def pair_partials(batch: pa.Table) -> pa.Table:
        terms = ray.get(ref) if ray.is_initialized() else ref
        toks = tokenize_column(batch[text_col])
        flat = pc.list_flatten(toks)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        ids = pc.index_in(flat, value_set=terms)
        mask = np.asarray(pc.is_valid(ids), dtype=bool)
        if not mask.any():
            return C._empty_pairs()
        idv = np.asarray(pc.fill_null(ids, 0), dtype=np.int64)[mask]
        par = parents[mask]
        uk = np.unique(par * np.int64(V) + idv)
        p = uk // V
        t = uk % V
        seg_starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        seg_lens = np.diff(np.append(seg_starts, len(uk)))
        ia, ib = C.emit_pair_indices(t, seg_starts, seg_lens)
        if len(ia) == 0:
            return C._empty_pairs()
        upk, cnt = np.unique(ia * np.int64(V) + ib, return_counts=True)
        return pa.table({"ia": pa.array(upk // V, pa.int64()),
                         "ib": pa.array(upk % V, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    edges = (
        ds.select_columns([id_col, text_col])
        .map_batches(pair_partials, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby(["ia", "ib"]).aggregate(Sum("cnt", alias_name="pair_count"))
        .filter(expr=f"pair_count >= {int(min_pair_count)}")
    )
    return terms_arr, df_vec, edges


def _empty_rank() -> pd.DataFrame:
    return pd.DataFrame({"term": pd.Series([], dtype=object),
                         "rank_e9": pd.Series([], dtype=np.int64)})


def term_pagerank(ds, min_df: int = 2, max_df_ratio: float = 0.9,
                  min_pair_count: int = 2, n_iter: int = 5,
                  damping_num: int = 85, damping_den: int = 100,
                  top_k: int = 100, text_col: str = "text",
                  id_col: str = "doc_id") -> pd.DataFrame:
    """TextRank keywords: weighted PageRank over the document
    co-occurrence graph -> top_k (term, rank_e9) by (rank desc, term).

    Nodes are edge endpoints (isolated vocabulary terms drop out, the
    TextRank convention); the iteration is exact-integer (module doc)."""
    import ray

    terms_arr, _dfv, edges = _edges_dataset(
        ds, min_df, max_df_ratio, min_pair_count, text_col, id_col)
    V = len(terms_arr)
    if V == 0 or edges is None:
        return _empty_rank()

    import ray.data as rd

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["ia"], dtype=np.int64)
        b = np.asarray(batch["ib"], dtype=np.int64)
        cw = np.asarray(batch["pair_count"], dtype=np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            "w": pa.array(np.concatenate([cw, cw]), pa.int64())})

    # Checkpoint the directed arc table so the K iterations re-read
    # Parquet instead of re-running tokenization; arcs never land on the
    # driver — only the O(V) wsum / rank vectors do.
    tmp = tempfile.mkdtemp(prefix="pagerank_arcs_")
    try:
        (edges.map_batches(symmetrize, batch_format="pyarrow",
                           zero_copy_batch=True, runtime_env=_rte())
         .write_parquet(tmp))
        arc_ds = rd.read_parquet(tmp)
        ws_rows = arc_ds.groupby("src").sum("w").to_pandas()  # O(V) rows
        if len(ws_rows) == 0:
            return _empty_rank()
        wsum = np.zeros(V, dtype=np.int64)
        wsum[ws_rows["src"].to_numpy(np.int64)] = (
            ws_rows["sum(w)"].to_numpy(np.int64))
        in_graph = wsum > 0

        num = np.int64(damping_num)
        den = np.int64(damping_den)
        base = ((den - num) * np.int64(SCALE)) // den
        r = np.full(V, SCALE, dtype=np.int64)

        for _ in range(int(n_iter)):
            ref = ray.put((r, wsum)) if ray.is_initialized() else (r, wsum)

            def contrib(batch: pa.Table, _ref=ref) -> pa.Table:
                rv, ws = ray.get(_ref) if ray.is_initialized() else _ref
                s = np.asarray(batch["src"], dtype=np.int64)
                d = np.asarray(batch["dst"], dtype=np.int64)
                cw = np.asarray(batch["w"], dtype=np.int64)
                part = (num * cw * rv[s]) // (den * ws[s])
                sums = np.zeros(V, dtype=np.int64)
                np.add.at(sums, d, part)
                nz = np.flatnonzero(sums)
                return pa.table({"v": pa.array(nz, pa.int64()),
                                 "s": pa.array(sums[nz], pa.int64())})

            agg = (arc_ds.map_batches(contrib, batch_format="pyarrow",
                                      zero_copy_batch=True,
                                      runtime_env=_rte())
                   .groupby("v").sum("s").to_pandas())  # O(V) rows
            new_r = np.zeros(V, dtype=np.int64)
            new_r[in_graph] = base
            if len(agg):
                vv = agg["v"].to_numpy(np.int64)
                new_r[vv] += agg["sum(s)"].to_numpy(np.int64)
            r = new_r
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    nodes = np.flatnonzero(in_graph)
    out = pd.DataFrame({
        "term": np.asarray(terms_arr.take(pa.array(nodes, pa.int64()))),
        "rank_e9": r[nodes],
    })
    out = out.sort_values(["rank_e9", "term"], ascending=[False, True],
                          kind="stable").head(top_k)
    return out.reset_index(drop=True).astype({"rank_e9": np.int64})


def cooc_triangles(ds, min_df: int = 2, max_df_ratio: float = 0.9,
                   min_pair_count: int = 2, text_col: str = "text",
                   id_col: str = "doc_id") -> pd.DataFrame:
    """Triangle census of the co-occurrence graph -> one row
    (n_nodes, n_edges, n_triangles).

    The sorted packed edge-key array (ia*V+ib, ia<ib) broadcasts once;
    each batch of edges intersects ``adj(a) ∩ adj(b) ∩ (b, V)`` with two
    searchsorted probes — every triangle a<b<c is counted exactly once at
    its lexicographically-least edge (a, b)."""
    import ray

    terms_arr, _dfv, edges = _edges_dataset(
        ds, min_df, max_df_ratio, min_pair_count, text_col, id_col)
    V = len(terms_arr)
    empty = pd.DataFrame({"n_nodes": pd.Series([0], dtype=np.int64),
                          "n_edges": pd.Series([0], dtype=np.int64),
                          "n_triangles": pd.Series([0], dtype=np.int64)})
    if V == 0 or edges is None:
        return empty
    ew = edges.to_pandas()  # bounded: post-filter pairs
    if len(ew) == 0:
        return empty
    ia = ew["ia"].to_numpy(np.int64)
    ib = ew["ib"].to_numpy(np.int64)
    keys = np.sort(ia * np.int64(V) + ib)
    n_nodes = int(np.unique(np.concatenate([ia, ib])).size)
    n_edges = int(len(ia))

    payload = keys
    ref = ray.put(payload) if ray.is_initialized() else payload

    def count(batch: pa.Table, _ref=ref) -> pa.Table:
        ks = ray.get(_ref) if ray.is_initialized() else _ref
        a = np.asarray(batch["ia"], dtype=np.int64)
        b = np.asarray(batch["ib"], dtype=np.int64)
        total = 0
        # neighbors of a greater than b: keys in (a*V+b, a*V+V)
        lo = np.searchsorted(ks, a * np.int64(V) + b, side="right")
        hi = np.searchsorted(ks, (a + 1) * np.int64(V), side="left")
        lens = hi - lo
        if lens.sum() > 0:
            tot = int(lens.sum())
            ei = np.repeat(np.arange(len(a), dtype=np.int64), lens)
            offs = (np.arange(tot, dtype=np.int64)
                    - np.repeat(np.cumsum(lens) - lens, lens))
            cand_c = ks[np.repeat(lo, lens) + offs] % V
            probe = b[ei] * np.int64(V) + cand_c
            pos = np.searchsorted(ks, probe)
            pos = np.minimum(pos, len(ks) - 1)
            total = int(np.count_nonzero(ks[pos] == probe))
        return pa.table({"t": pa.array([total], pa.int64())})

    import ray.data as rd
    arc_ds = rd.from_arrow(pa.table({"ia": pa.array(ia, pa.int64()),
                                     "ib": pa.array(ib, pa.int64())}))
    tri = (arc_ds.map_batches(count, batch_format="pyarrow",
                              zero_copy_batch=True, runtime_env=_rte())
           .to_pandas())
    return pd.DataFrame({
        "n_nodes": pd.Series([n_nodes], dtype=np.int64),
        "n_edges": pd.Series([n_edges], dtype=np.int64),
        "n_triangles": pd.Series([int(tri["t"].sum())], dtype=np.int64)})

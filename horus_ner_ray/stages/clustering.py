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


_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio id mix (routing only)


def _local_union_find(edges, id_col: str, lab_col: str):
    """Exact union-find over a small (size-gated) symmetrized edge
    Dataset -> Ray dataset of (node, min reachable node id).  Union by
    min root, path halving; the root of a set is always its minimum
    member, so the final find IS the component label."""
    import ray.data as rd

    df = edges.to_pandas()  # gated: <= 2 * local_edge_threshold rows
    eu = df["eu"].to_numpy(np.int64)
    ev = df["ev"].to_numpy(np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            parent[r] = parent[parent[r]]  # path halving
            r = parent[r]
        return r

    for a, b in zip(eu.tolist(), ev.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = np.unique(np.r_[eu, ev])
    comp = np.fromiter((find(int(n)) for n in nodes), dtype=np.int64,
                       count=len(nodes))
    return rd.from_arrow(pa.table({id_col: pa.array(nodes, pa.int64()),
                                   lab_col: pa.array(comp, pa.int64())}))


def connected_components(edges_ds, nodes_ds=None, u_col: str = "u",
                         v_col: str = "v", id_col: str = "node",
                         lab_col: str = "component", n_buckets: int = 64,
                         n_salts: int = 8, max_iter: int = 64,
                         local_edge_threshold: int = 100_000):
    """Distributed connected components over an edge Dataset: every node is
    labelled with the MINIMUM node id reachable from it.  The grouping step
    a dedup pipeline runs after pair generation (minhash / simhash /
    embedding near-dup pairs -> duplicate CLUSTERS -> keep one per cluster);
    reference analogue: the reference collapses duplicate evidence only
    pairwise (SURVEY.md D1/D5) — components make the closure explicit.

    Algorithm: iterative min-label propagation.  Labels start as identity;
    each round every node takes the min of its own label and its
    neighbors', until a round changes nothing.  Rounds needed = the
    largest component's diameter (near-dup clusters are tight, so a
    handful); at adversarial diameters a pointer-jumping / large-star
    variant would halve rounds, traded here for exactness + simplicity.

    Distribution shape (the 100-TB design):
    - the symmetric edge list is materialized ONCE (it re-enters the plan
      every round; streaming lineage would re-run pair generation per
      round) — this is the run-file move the index build makes;
    - per round, ONE salted replicate join attaches labels to edges: edge
      rows group by ``(hash(u) % B) * S + mix(v) % S`` and each label row
      is replicated to its bucket's S salt groups, so a hot node (high
      degree) spreads over S groups instead of landing all-in-one;
    - inside each group the neighbor-min is pre-combined (vectorized
      pandas groupby-min -> one candidate row per (group, node)), so the
      following global ``groupby(node).min`` is over combiner output, not
      raw edges;
    - labels are int64 and the reduce is MIN — order-free, so every round
      (and the fixpoint test: exact integer sum of labels, monotone
      decreasing) is bit-stable regardless of block arrival order.

    ``nodes_ds`` (optional, one ``id_col`` column) adds isolated nodes to
    the output as their own singleton components.

    Size gate: the edge list here is a DERIVED pair set (the output of the
    bucketed near-dup stage), not the corpus — when it is small
    (``<= local_edge_threshold`` pairs) an exact driver-side union-find is
    the right plan, exactly as a join gathers its provably-small side to
    broadcast instead of shuffling.  Labels are identical (min reachable
    id); the distributed min-label loop below remains the big-graph path
    (``local_edge_threshold=0`` forces it — tests pin both paths against
    each other).
    """
    import pandas as pd
    from ray.data.aggregate import Min

    B, S = np.uint64(n_buckets), np.uint64(n_salts)
    s_int = int(n_salts)

    def symmetrize(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch[u_col], dtype=np.int64)
        v = np.asarray(batch[v_col], dtype=np.int64)
        return pa.table({"eu": pa.array(np.r_[u, v], pa.int64()),
                         "ev": pa.array(np.r_[v, u], pa.int64())})

    edges = (
        edges_ds.select_columns([u_col, v_col])
        .map_batches(symmetrize, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .materialize()  # tiny vs corpus: re-read every round
    )
    # Without this, each round's label table inherits the union's block
    # fan-out and block count grows linearly round-over-round (task count
    # quadratic overall); pin it to the edge table's own width.
    label_parts = max(int(edges.num_blocks()), 1)
    n_sym = edges.count()
    if n_sym == 0:
        labels = None
    elif n_sym <= 2 * local_edge_threshold:  # symmetrized = 2x pairs
        labels = _local_union_find(edges, id_col, lab_col)
    else:
        # L0: identity labels on every edge endpoint
        def endpoint_partial(batch: pa.Table) -> pa.Table:
            eu = np.unique(np.asarray(batch["eu"], dtype=np.int64))
            return pa.table({id_col: pa.array(eu, pa.int64())})

        labels = (
            edges.map_batches(endpoint_partial, batch_format="pyarrow",
                              zero_copy_batch=True, runtime_env=_rte())
            .groupby(id_col).count()
            .map_batches(lambda b: pa.table({
                id_col: b[id_col],
                lab_col: b[id_col]}), batch_format="pyarrow",
                runtime_env=_rte())
            .repartition(label_parts)
            .materialize()
        )

    def tag_edges(batch: pa.Table) -> pa.Table:
        eu = np.asarray(batch["eu"], dtype=np.int64).astype(np.uint64)
        ev = np.asarray(batch["ev"], dtype=np.int64)
        gbkt = (((eu * _MIX) % B) * S
                + (ev.astype(np.uint64) * _MIX) % S).astype(np.int64)
        n = len(eu)
        return pa.table({
            "eu": batch["eu"], "ev": batch["ev"],
            lab_col: pa.nulls(n, pa.int64()),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "gbkt": pa.array(gbkt, pa.int64()),
        })

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch[id_col], dtype=np.int64)
        lab = np.asarray(batch[lab_col], dtype=np.int64)
        base = ((node.astype(np.uint64) * _MIX) % B) * S
        n = len(node)
        gbkt = (np.repeat(base, s_int)
                + np.tile(np.arange(s_int, dtype=np.uint64), n)).astype(np.int64)
        return pa.table({
            "eu": pa.array(np.repeat(node, s_int), pa.int64()),
            "ev": pa.nulls(n * s_int, pa.int64()),
            lab_col: pa.array(np.repeat(lab, s_int), pa.int64()),
            "side": pa.array(np.ones(n * s_int, np.int8), pa.int8()),
            "gbkt": pa.array(gbkt, pa.int64()),
        })

    _empty_prop = pa.table({id_col: pa.array([], pa.int64()),
                            lab_col: pa.array([], pa.int64())})

    def propagate_group(g: pd.DataFrame) -> pa.Table:
        # returns Arrow so prop blocks union cleanly with the Arrow labels
        data = g[g["side"] == 0]
        if len(data) == 0:
            return _empty_prop
        stat = g[g["side"] == 1]
        lab_of = dict(zip(stat["eu"].to_numpy(np.int64),
                          stat[lab_col].to_numpy(np.int64)))
        cand = data["eu"].map(lab_of)  # label(u) -> candidate for v
        out = (pd.DataFrame({id_col: data["ev"].to_numpy(np.int64),
                             lab_col: cand.to_numpy(np.int64)})
               .groupby(id_col, sort=False)[lab_col].min())  # pre-combine
        return pa.table({id_col: pa.array(out.index.to_numpy(np.int64),
                                          pa.int64()),
                         lab_col: pa.array(out.to_numpy(np.int64),
                                           pa.int64())})

    local_done = labels is not None and n_sym <= 2 * local_edge_threshold
    n_rounds = 0
    converged = labels is None or local_done
    if labels is not None and not local_done:
        prev_sum = None
        for _ in range(max_iter):
            tagged_e = edges.map_batches(
                tag_edges, batch_format="pyarrow", zero_copy_batch=True,
                runtime_env=_rte())
            tagged_l = labels.map_batches(
                tag_labels, batch_format="pyarrow", runtime_env=_rte())
            prop = (
                tagged_e.union(tagged_l)
                .groupby("gbkt")
                .map_groups(lambda g: propagate_group(g.drop(columns=["gbkt"])),
                            batch_format="pandas", runtime_env=_rte())
            )
            labels = (
                prop.union(labels)
                .groupby(id_col).aggregate(Min(lab_col, alias_name=lab_col))
                .repartition(label_parts)
                .materialize()
            )
            n_rounds += 1
            cur_sum = labels.sum(lab_col)  # exact int64: order-free fixpoint
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
        if not converged:
            # a component whose diameter exceeds max_iter would otherwise
            # return truncated (wrong) labels indistinguishable from a
            # fixpoint — fail loudly instead
            raise RuntimeError(
                f"connected_components: min-label propagation did not reach "
                f"a fixpoint in max_iter={max_iter} rounds (graph diameter "
                f"exceeds the iteration budget); raise max_iter")

    parts = []
    if labels is not None:
        parts.append(labels)
    if nodes_ds is not None:
        parts.append(nodes_ds.select_columns([id_col]).map_batches(
            lambda b: pa.table({id_col: b[id_col], lab_col: b[id_col]}),
            batch_format="pyarrow", runtime_env=_rte()))
    if not parts:
        raise ValueError("connected_components: no edges and no nodes_ds")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.groupby(id_col).aggregate(Min(lab_col, alias_name=lab_col))


def semantic_dup_components(emb_ds, threshold: float = 0.95,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding", exact: bool = False,
                            **cc_kwargs):
    """SemDeDup-style duplicate clustering: embedding near-dup pairs
    (``embedding_dup_pairs``: banded sign-LSH by default; ``exact=True`` is
    the oracle-harness all-pairs path) closed into connected components —
    (id, component) where component = min id of the duplicate cluster.
    Downstream keeps one doc per component (e.g. ``component == id``)."""
    from horus_ner_ray.stages.dedupe import embedding_dup_pairs

    pairs = embedding_dup_pairs(emb_ds, threshold=threshold, id_col=id_col,
                                vec_col=vec_col, exact=exact)
    return connected_components(
        pairs, nodes_ds=emb_ds.select_columns([id_col]),
        u_col="doc_a", v_col="doc_b", id_col=id_col, **cc_kwargs)


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


def nearest_centroid_classify(ds, vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              label_col: str = "label"):
    """Rocchio / nearest-centroid classifier over a labeled embedding
    table — EXACT integer arithmetic end-to-end: vectors e6-quantize,
    per-label centroids are FLOOR-means (sum_e6 // n, exact int), and
    each vector classifies to the centroid with the smallest exact
    integer squared-L2 distance (ties -> smaller label).  Returns a
    Dataset (vec_id, label, pred).

    Shape: one combiner scan for the per-label sums (labels x dim
    partials), centroids broadcast once, one streaming classify pass —
    no shuffle of the vector table."""
    import ray
    from ray.data.aggregate import Sum

    def _mat(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            offs = np.asarray(col.offsets, dtype=np.int64)
            widths = np.unique(offs[1:] - offs[:-1])
            if len(widths) != 1:
                raise ValueError("ragged embedding lists")
            d = int(widths[0])
            return np.asarray(col.values, dtype=np.float64).reshape(-1, d)
        arr = col.to_numpy(zero_copy_only=False)
        if arr.dtype == object:
            return np.stack([np.asarray(a, dtype=np.float64) for a in arr])
        return np.asarray(arr, dtype=np.float64)

    def sums_partial(batch: pa.Table) -> pa.Table:
        q = np.floor(_mat(batch[vec_col]) * 1e6 + 0.5).astype(np.int64)
        lab = np.asarray(batch[label_col], dtype=np.int64)
        uniq = np.unique(lab)
        rows = {"label": [], "n": []}
        d = q.shape[1]
        for j in range(d):
            rows[f"s{j}"] = []
        for lv in uniq:
            m = lab == lv
            rows["label"].append(int(lv))
            rows["n"].append(int(m.sum()))
            s = q[m].sum(axis=0)
            for j in range(d):
                rows[f"s{j}"].append(int(s[j]))
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in rows.items()})

    # probe the dimension from ONE row (the LSH precedent), then fold
    # the per-label sums
    b1 = ds.take_batch(1, batch_format="pyarrow")
    d = _mat(b1[vec_col]).shape[1]
    sums = (ds.select_columns([vec_col, label_col])
            .map_batches(sums_partial, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte())
            .groupby("label"))
    agg = sums.aggregate(Sum("n", alias_name="n"),
                         *[Sum(f"s{j}", alias_name=f"s{j}")
                           for j in range(d)]).to_pandas()
    agg = agg.sort_values("label").reset_index(drop=True)
    labels = agg["label"].to_numpy(np.int64)
    cent = np.stack([
        np.array([int(agg[f"s{j}"].iloc[i]) // int(agg["n"].iloc[i])
                  for j in range(d)], dtype=np.int64)
        for i in range(len(agg))])
    ref = ray.put((labels, cent))

    def classify(batch: pa.Table) -> pa.Table:
        labs, c = ray.get(ref)
        q = np.floor(_mat(batch[vec_col]) * 1e6 + 0.5).astype(np.int64)
        # exact int64 squared distances — dim-aware overflow guard:
        # sum(diff^2) <= dim * (2*M)^2 must stay under 2^63
        limit = int((2 ** 63 / q.shape[1]) ** 0.5 / 2)
        if max(np.abs(q).max(initial=0), np.abs(c).max(initial=0)) > limit:
            raise ValueError(
                "nearest_centroid_classify bound exceeded: "
                f"|x*1e6| must be <= {limit} at dim {q.shape[1]}")
        diff = q[:, None, :] - c[None, :, :]
        dist = (diff * diff).sum(axis=2)
        best = np.argmin(dist, axis=1)  # first min == smaller label
        return pa.table({
            id_col: batch[id_col],
            label_col: batch[label_col],
            "pred": pa.array(labs[best], pa.int64()),
        })

    return ds.select_columns([id_col, vec_col, label_col]).map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())


def keep_best_per_component(comp_ds, score_ds, id_col: str = "doc_id",
                            comp_col: str = "component",
                            score_col: str = "n_unique",
                            n_buckets: int = 64) -> "pd.DataFrame":
    """Curation keep-rule over duplicate clusters: for every component,
    KEEP the member with the highest quality score (ties -> lowest id) —
    the SemDeDup/'keep best, drop rest' policy, composed from the
    component table and a per-doc score table.

    Shape: one hash join (both sides corpus-sized) + an associative
    per-component arg-max combiner; the published table is O(components).
    Returns ``(component, kept_doc, score, n_members)`` sorted by
    component.
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from horus_ner_ray.stages.aggs import top_metrics
    from horus_ner_ray.stages.joins import hash_join_dataset

    joined = hash_join_dataset(
        comp_ds, score_ds, key=id_col,
        left_cols=[comp_col], right_cols=[score_col],
        n_buckets=n_buckets)

    def add_neg(batch: pa.Table) -> pa.Table:
        # hash_join_dataset suffixes right-side payload columns with _r
        if f"{score_col}_r" in batch.column_names:
            batch = batch.rename_columns(
                [score_col if c == f"{score_col}_r" else c
                 for c in batch.column_names])
        return batch.append_column(
            "_neg_id", pc.negate(pc.cast(batch[id_col], pa.int64())))

    joined = joined.map_batches(add_neg, batch_format="pyarrow",
                                zero_copy_batch=True, runtime_env=_rte())
    best = top_metrics(joined, comp_col, score_col, "_neg_id", [id_col])
    members = (joined.groupby(comp_col)
               .aggregate(Count(alias_name="n_members"))).to_pandas()
    out = best.merge(members, on=comp_col)
    out = pd.DataFrame({
        comp_col: out[comp_col].astype(np.int64),
        "kept_doc": out[id_col].astype(np.int64),
        score_col: out[score_col].astype(np.int64),
        "n_members": out["n_members"].astype(np.int64),
    })
    return out.sort_values(comp_col).reset_index(drop=True)

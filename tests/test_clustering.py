"""Distributed k-means vs a single-process numpy reference."""

import numpy as np
import pandas as pd


def _mk(n=400, d=8, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(4, d) * 4
    x = centers[rng.randint(0, 4, n)] + rng.randn(n, d)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(x.astype(np.float32))})


def _ref_kmeans(df, k, n_iter):
    x = np.array([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    ids = df["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids, kind="stable")
    cent = x[order[:k]].copy()

    def dists(a, c):
        ee = np.einsum("ij,ij->i", a, a)
        cc = np.einsum("ij,ij->i", c, c)
        return ee[:, None] - 2.0 * (a @ c.T) + cc[None, :]

    for _ in range(n_iter):
        a = np.argmin(dists(x, cent), axis=1)
        xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
        for j in range(k):
            m = a == j
            if m.any():
                cent[j] = xq[m].sum(0).astype(np.float64) / (m.sum() * 1e6)
    return cent, np.argmin(dists(x, cent), axis=1)


def _uf_components(n_nodes, pairs):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n_nodes)], dtype=np.int64)


def _run_cc(pairs, n_nodes, parts, ray_session=None, **kw):
    import ray.data as rd

    from horus_ner_ray.stages.clustering import connected_components

    edges = pd.DataFrame({"u": [a for a, _ in pairs],
                          "v": [b for _, b in pairs]}, dtype=np.int64)
    nodes = rd.from_pandas(
        pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64)}))
    got = connected_components(
        rd.from_pandas(edges).repartition(parts), nodes_ds=nodes, **kw
    ).to_pandas().sort_values("node").reset_index(drop=True)
    return got["component"].to_numpy(np.int64)


def test_cc_chain_star_singletons(ray_session):
    # chain 0..9 (diameter 9 -> multi-round propagation), star at 20,
    # clique 30-32, nodes 40..44 isolated.  local_edge_threshold=0 forces
    # the distributed min-label loop; the default takes the size-gated
    # local union-find — both must agree with the reference
    pairs = ([(i, i + 1) for i in range(9)]
             + [(20, j) for j in (21, 22, 23)]
             + [(30, 31), (31, 32), (30, 32)])
    want = _uf_components(45, pairs)
    for parts in (1, 5):
        for thresh in (0, 100_000):
            got = _run_cc(pairs, 45, parts, local_edge_threshold=thresh)
            assert np.array_equal(got, want), (parts, thresh)


def test_cc_random_graph_matches_union_find(ray_session):
    rng = np.random.RandomState(11)
    n = 300
    pairs = [tuple(sorted(p)) for p in rng.randint(0, n, (180, 2))
             if p[0] != p[1]]
    want = _uf_components(n, pairs)
    # distributed path (forced) and local path must both match
    got_dist = _run_cc(pairs, n, 7, n_buckets=16, n_salts=4,
                       local_edge_threshold=0)
    got_local = _run_cc(pairs, n, 7)
    assert np.array_equal(got_dist, want)
    assert np.array_equal(got_local, want)


def test_cc_no_edges_is_identity(ray_session):
    got = _run_cc([], 6, 1)
    assert np.array_equal(got, np.arange(6))


def test_semantic_dup_components_exact_vs_reference(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.clustering import semantic_dup_components

    df = _mk(n=120, d=8, seed=9)
    x = np.array([np.asarray(v, np.float64) for v in df["embedding"]])
    norm = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = norm @ norm.T
    pairs = [(int(a), int(b)) for a, b in zip(*np.nonzero(np.triu(sims >= 0.8, 1)))]
    want = _uf_components(120, pairs)
    got = (semantic_dup_components(rd.from_pandas(df).repartition(4),
                                   threshold=0.8, exact=True)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert np.array_equal(got["component"].to_numpy(np.int64), want)
    assert len(pairs) > 10  # the fixture actually exercises propagation


def test_kmeans_matches_reference_any_block_order(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.clustering import kmeans_assign, kmeans_fit

    df = _mk()
    want_cent, want_a = _ref_kmeans(df, k=6, n_iter=2)
    for parts in (1, 7):
        ds = rd.from_pandas(df.sample(frac=1, random_state=parts)
                            ).repartition(parts)
        cent = kmeans_fit(ds, 6, n_iter=2)
        # e6-integer partial sums -> centroids are bit-identical
        # regardless of block count / arrival order
        assert np.array_equal(cent, want_cent), parts
        got = (kmeans_assign(ds, cent).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        assert np.array_equal(got["cluster"].to_numpy(), want_a), parts


def test_kmeans_empty_cluster_keeps_previous_centroid(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.clustering import kmeans_fit

    # two tight far-apart blobs + k=3: the third initial centroid (inside
    # blob one) attracts nothing after the first update on some layouts;
    # fit must not NaN out and every centroid must stay finite
    rng = np.random.RandomState(0)
    x = np.r_[rng.randn(50, 4) * 0.01, rng.randn(50, 4) * 0.01 + 100.0]
    df = pd.DataFrame({"vec_id": np.arange(100, dtype=np.int64),
                       "embedding": list(x.astype(np.float32))})
    cent = kmeans_fit(rd.from_pandas(df), 3, n_iter=3)
    assert np.isfinite(cent).all()


def test_kmeans_k_too_large(ray_session):
    import pytest
    import ray.data as rd

    from horus_ner_ray.stages.clustering import kmeans_fit

    df = _mk(n=5)
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(rd.from_pandas(df), 10)


def test_nearest_centroid_classifier(ray_session):
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.clustering import nearest_centroid_classify

    rng = np.random.RandomState(4)
    d, n = 8, 300
    centers = {0: rng.randn(d) * 0.3, 1: rng.randn(d) * 0.3 + 2.0,
               2: rng.randn(d) * 0.3 - 2.0}
    labs = rng.randint(0, 3, n)
    X = np.stack([centers[int(l)] + rng.randn(d) * 0.2 for l in labs])
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "label": labs.astype(np.int64),
                       "embedding": [row.astype(np.float32) for row in X]})
    for parts in (1, 5):
        got = (nearest_centroid_classify(
            rd.from_pandas(df.sample(frac=1, random_state=parts))
            .repartition(parts))
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
        # scalar reference: exact-int floor-mean centroids + int dists
        q = np.floor(X.astype(np.float32).astype(np.float64) * 1e6
                     + 0.5).astype(object)
        cent = {}
        for lv in (0, 1, 2):
            m = labs == lv
            cent[lv] = np.array(
                [int(q[m, j].sum()) // int(m.sum()) for j in range(d)],
                dtype=object)
        for r in got.itertuples():
            qs = q[r.vec_id]
            dists = [(int(((qs - cent[lv]) ** 2).sum()), lv)
                     for lv in (0, 1, 2)]
            assert r.pred == min(dists)[1], r.vec_id
        # separated clusters classify back to their own label mostly
        acc = (got["pred"] == got["label"]).mean()
        assert acc > 0.95

"""Product quantization: the fused multi-subspace fit vs per-subspace
kmeans_fit equality, encode/search exactness vs a plain-numpy reference,
partitioning invariance, and an ADC recall floor on clustered data."""

import numpy as np
import pyarrow as pa
import pytest

from horus_ner_ray.stages.clustering import _sq_dists, kmeans_fit
from horus_ner_ray.stages.pq import PQIndex


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    # clustered data: 8 well-separated centers, dim 32
    centers = rng.normal(0, 10, (8, 32))
    X = np.repeat(centers, 50, axis=0) + rng.normal(0, 1, (400, 32))
    t = pa.table({
        "vec_id": pa.array(np.arange(400, dtype=np.int64)),
        "embedding": pa.array(list(X)),
    })
    return rd.from_arrow(t), X


def test_pq_fit_matches_kmeans_fit(emb_ds):
    """The fused one-pass-per-iteration fit must produce EXACTLY the
    codebooks of M independent kmeans_fit runs over the sub-slices."""
    import ray.data as rd

    ds, X = emb_ds
    pqi = PQIndex(m=4, ks=8, n_iter=2).fit(ds)
    for mi in range(4):
        sub = np.ascontiguousarray(X[:, mi * 8:(mi + 1) * 8])
        sub_ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(400, dtype=np.int64)),
            "embedding": pa.array(list(sub)),
        }))
        want = kmeans_fit(sub_ds, 8, n_iter=2)
        assert (pqi.codebooks[mi] == want).all(), mi


def test_pq_encode_matches_reference_and_invariant(emb_ds):
    ds, X = emb_ds
    pqi = PQIndex(m=4, ks=8, n_iter=2).fit(ds)
    codes = pqi.encode(ds).to_pandas().sort_values("vec_id")
    for mi in range(4):
        sub = X[:, mi * 8:(mi + 1) * 8]
        want = np.argmin(_sq_dists(sub, pqi.codebooks[mi]), axis=1)
        assert (codes[f"code_{mi}"].to_numpy() == want).all(), mi
    codes2 = pqi.encode(ds.repartition(7)).to_pandas().sort_values("vec_id")
    assert (codes2[[f"code_{i}" for i in range(4)]].to_numpy()
            == codes[[f"code_{i}" for i in range(4)]].to_numpy()).all()


def test_pq_search_matches_reference(emb_ds):
    ds, X = emb_ds
    pqi = PQIndex(m=4, ks=8, n_iter=2).fit(ds)
    qids = np.arange(3, dtype=np.int64)
    Q = X[:3]
    res = pqi.search(pqi.encode(ds), qids, Q, k=10)
    codes = pqi.encode(ds).to_pandas().sort_values("vec_id")
    cm = codes[[f"code_{i}" for i in range(4)]].to_numpy(np.int64)
    ids = codes["vec_id"].to_numpy(np.int64)
    dts = pqi.distance_tables(Q)
    for qi in range(3):
        acc = dts[qi, 0][cm[:, 0]]
        for mi in range(1, 4):
            acc = acc + dts[qi, mi][cm[:, mi]]
        sel = np.lexsort((ids, acc))[:10]
        g = res[res.query_id == qids[qi]]
        assert (g["vec_id"].to_numpy() == ids[sel]).all()
        assert (g["adist"].to_numpy() == acc[sel]).all()
        assert (g["rank"].to_numpy() == np.arange(1, 11)).all()


def test_pq_recall_on_clustered_data(emb_ds):
    """On well-separated clusters ADC must keep every top-10 result
    inside the query's true cluster (coarse structure survives the
    compression) and recover a fair share of the exact intra-cluster
    top-10 (a floor, not exactness — PQ is lossy by design)."""
    ds, X = emb_ds
    pqi = PQIndex(m=8, ks=16, n_iter=2).fit(ds)
    qids = np.arange(5, dtype=np.int64)
    res = pqi.search(pqi.encode(ds), qids, X[:5], k=10)
    hits = 0
    for qi in range(5):
        got = res[res.query_id == qi]["vec_id"].to_numpy()
        # rows 50*c..50*c+49 belong to cluster c by construction
        assert (got // 50 == qi // 50).all(), qi
        d = ((X - X[qi]) ** 2).sum(1)
        exact = set(np.lexsort((np.arange(len(X)), d))[:10])
        hits += len(exact & set(got))
    assert hits / 50 >= 0.35, hits / 50


def test_pq_rejects_bad_dims(emb_ds):
    ds, _X = emb_ds
    with pytest.raises(ValueError, match="not divisible"):
        PQIndex(m=5, ks=8).fit(ds)
    with pytest.raises(ValueError, match="fit"):
        PQIndex(m=4).encode(ds)


def test_ivfpq_matches_reference_composition(emb_ds):
    """IVFPQ == (coarse kmeans probes) ∩ (plain-numpy ADC): candidates
    are exactly the probed clusters' members, ranked by the same table
    sums."""
    import ray.data as rd

    from horus_ner_ray.stages.pq import ivfpq_search
    from horus_ner_ray.stages.clustering import kmeans_fit

    ds, X = emb_ds
    res = ivfpq_search(ds, np.arange(3, dtype=np.int64), X[:3], k=10,
                       n_centroids=8, nprobe=2, m=4, ks=8, n_iter=2)
    cents = kmeans_fit(ds, 8, n_iter=2)
    assign = np.argmin(_sq_dists(X, cents), axis=1)
    pqi = PQIndex(m=4, ks=8, n_iter=2).fit(ds)
    codes = pqi.encode(ds).to_pandas().sort_values("vec_id")
    cm = codes[[f"code_{i}" for i in range(4)]].to_numpy(np.int64)
    ids = codes["vec_id"].to_numpy(np.int64)
    dts = pqi.distance_tables(X[:3])
    probes = np.argsort(_sq_dists(X[:3], cents), axis=1,
                        kind="stable")[:, :2]
    for qi in range(3):
        mask = np.isin(assign, probes[qi])
        sel_ids = ids[mask]
        acc = dts[qi, 0][cm[mask, 0]]
        for mi in range(1, 4):
            acc = acc + dts[qi, mi][cm[mask, mi]]
        sel = np.lexsort((sel_ids, acc))[:10]
        g = res[res.query_id == qi]
        assert (g["vec_id"].to_numpy() == sel_ids[sel]).all(), qi
        assert (g["adist"].to_numpy() == acc[sel]).all(), qi
        # pruning semantics: every hit's coarse cluster was probed
        hit_assign = assign[np.searchsorted(ids, g["vec_id"].to_numpy())]
        assert np.isin(hit_assign, probes[qi]).all(), qi

"""Greedy sequence packing: reference-walk equality, partitioning
invariance, range-scoped bins, oversized-doc and zero-token edges."""

import numpy as np
import pyarrow as pa
import pytest

from horus_ner_ray.stages.packing import pack_sequences, packing_stats


def _docs_ds(texts, ids=None):
    import ray.data as rd

    ids = np.arange(len(texts), dtype=np.int64) if ids is None else \
        np.asarray(ids, dtype=np.int64)
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                   "text": pa.array(texts)}))


def _reference_pack(dls, ids, capacity, range_size):
    order = np.argsort(ids)
    out = {}
    cur_range, fill, b = None, 0, 0
    for i in order:
        rid = ids[i] // range_size
        if rid != cur_range:
            cur_range, fill, b = rid, 0, 0
        n = dls[i]
        if fill > 0 and fill + n > capacity:
            b += 1
            fill = 0
        out[ids[i]] = rid * range_size + b
        fill += n
    return out


def test_pack_matches_reference_walk(ray_session):
    rng = np.random.default_rng(5)
    texts = [" ".join(f"w{j}" for j in range(rng.integers(0, 30)))
             for _ in range(300)]
    ds = _docs_ds(texts)
    got = pack_sequences(ds, capacity=40, range_size=64).to_pandas()
    got = got.sort_values("doc_id")
    dls = got.set_index("doc_id")["dl"].to_dict()
    want = _reference_pack(
        np.array([dls[i] for i in range(300)]),
        np.arange(300), capacity=40, range_size=64)
    assert {int(d): int(b) for d, b
            in zip(got["doc_id"], got["bin_id"])} == want
    # no bin overflows unless it holds a single oversized doc
    by_bin = got.groupby("bin_id").agg(tok=("dl", "sum"), n=("dl", "size"))
    bad = by_bin[(by_bin.tok > 40) & (by_bin.n > 1)]
    assert bad.empty


def test_pack_partitioning_invariant(ray_session):
    texts = [" ".join(["x"] * (i % 17)) for i in range(200)]
    ds = _docs_ds(texts)
    a = pack_sequences(ds, capacity=32, range_size=50).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(ds.repartition(9), capacity=32,
                       range_size=50).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (a[["doc_id", "dl", "bin_id"]].to_numpy()
            == b[["doc_id", "dl", "bin_id"]].to_numpy()).all()


def test_pack_range_scoping_and_edges(ray_session):
    # one oversized doc, zero-token docs, a range boundary at id 4
    texts = ["a b c", "", " ".join(["y"] * 50), "d e", "f g h i"]
    ds = _docs_ds(texts, ids=[0, 1, 2, 3, 4])
    out = pack_sequences(ds, capacity=5, range_size=4).to_pandas() \
        .sort_values("doc_id")
    bins = out["bin_id"].to_numpy()
    # doc0 (3) + doc1 (0) share bin 0; doc2 (50, oversized) gets bin 1
    # alone; doc3 (2) opens bin 2; doc4 sits in range 1 -> bin 4*1=4
    assert list(bins) == [0, 0, 1, 2, 4]
    st = packing_stats(pack_sequences(ds, capacity=5, range_size=4))
    assert st["n_docs"] == 5 and st["n_bins"] == 4
    assert st["max_bin_tokens"] == 50
    with pytest.raises(ValueError):
        pack_sequences(ds, capacity=0)

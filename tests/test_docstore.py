"""Doc-id assignment + collection stats (SURVEY.md section 2.9 invariant:
doc ids are pure functions of (conv_id, turn_idx), never of block order)."""

import numpy as np
import pyarrow as pa

from horus_ner_ray.stages import docstore as d


def _tbl(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        }
    )


def test_rank_ids_dense_and_order_independent():
    rows = [("b", 0), ("b", 1), ("a", 0), ("c", 0), ("a", 1), ("a", 2)]
    offs = d.conv_offsets_from_table(_tbl(rows))
    assert offs.n_docs == 6
    ids = d.assign_doc_ids_rank(_tbl(rows), offs)
    # a:0,1,2  b:3,4  c:5
    assert ids.tolist() == [3, 4, 0, 5, 1, 2]
    # shuffled arrival produces identical ids per key
    import random

    rows2 = rows[:]
    random.Random(1).shuffle(rows2)
    ids2 = d.assign_doc_ids_rank(_tbl(rows2), offs)
    assert dict(zip(rows2, ids2.tolist())) == dict(zip(rows, ids.tolist()))


def test_rank_lookup_missing_conv_raises():
    offs = d.conv_offsets_from_table(_tbl([("a", 0)]))
    import pytest

    with pytest.raises(KeyError):
        d.assign_doc_ids_rank(_tbl([("zz", 0)]), offs)


def test_hash_ids_deterministic():
    t = _tbl([("conv-1", 0), ("conv-1", 1), ("conv-2", 0)])
    a = d.assign_doc_ids_hash(t)
    b = d.assign_doc_ids_hash(t)
    assert (a == b).all()
    assert len(set(a.tolist())) == 3
    assert a[1] - a[0] == 1  # turn_idx in low bits
    assert (a >= 0).all()


def test_collection_stats_ray(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"text": "a b c"}, {"text": ""}, {"text": "x y"}])
    s = d.collection_stats_from_dataset(ds)
    assert s.n_docs == 3 and s.total_tokens == 5
    assert abs(s.avgdl - 5 / 3) < 1e-12


def test_conv_offsets_from_dataset_matches_local(ray_session, small_corpus):
    import pyarrow.parquet as pq
    import ray.data as rd

    local = d.conv_offsets_from_table(
        pa.concat_tables([pq.read_table(f, columns=["conv_id"]) for f in small_corpus])
    )
    dist = d.conv_offsets_from_dataset(rd.read_parquet(small_corpus))
    assert local.n_docs == dist.n_docs
    assert (local.conv_ids == dist.conv_ids).all()
    assert (local.offsets == dist.offsets).all()

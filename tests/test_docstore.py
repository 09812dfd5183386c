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


def test_fetch_conv_docs_matches_source(built_index, small_corpus):
    """Conversation multi-get returns every stored turn of the requested
    convs, doc_id-ordered, with per-turn text EQUAL to the source table
    (the north-star invariant through the docstore)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import pytest

    from horus_ner_ray.pipelines.query import fetch_conv_docs

    idx, _res = built_index
    src = pq.read_table(
        small_corpus,
        columns=["conv_id", "turn_idx", "role", "text"]).to_pandas()
    convs = np.unique(src["conv_id"].astype(str).to_numpy())
    pick = [str(convs[0]), str(convs[len(convs) // 2]), str(convs[-1])]
    got = fetch_conv_docs(idx, pick)
    assert set(got["conv_id"]) == set(pick)
    assert (got["doc_id"].to_numpy()[1:]
            > got["doc_id"].to_numpy()[:-1]).all()  # doc-ordered
    want = (src[src["conv_id"].isin(pick)]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    g = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(g) == len(want)
    pd.testing.assert_frame_equal(
        g[["conv_id", "turn_idx", "role", "text"]].astype(
            {"turn_idx": np.int64}),
        want.astype({"turn_idx": np.int64}))
    # unknown conv -> empty; empty request -> empty
    assert len(fetch_conv_docs(idx, ["zzz-no-such-conv"])) == 0
    assert len(fetch_conv_docs(idx, [])) == 0


def test_conv_text_dataset(small_corpus, ray_session):
    """Per-conversation text join matches a pandas groupby string join in
    turn order, for every conversation."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.stages.docstore import conv_text_dataset

    src = pq.read_table(small_corpus,
                        columns=["conv_id", "turn_idx", "text"]).to_pandas()
    got = conv_text_dataset(
        rd.read_parquet(small_corpus,
                        columns=["conv_id", "turn_idx", "text"])
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    want = (src.sort_values(["conv_id", "turn_idx"])
            .groupby("conv_id")["text"].agg(" ".join)
            .reset_index().sort_values("conv_id").reset_index(drop=True))
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()

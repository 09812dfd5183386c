"""Arrow IPC transcript source/sink (sources/ipc.py): write_ipc is the
lossless inverse of read_ipc_transcripts (schema-preserving — no text
round-trip at all); ipc_to_parquet lands build-ready fragments; re-runs
are resumable no-ops."""

import pandas as pd
import pyarrow.parquet as pq

from horus_ner_ray.sources.ipc import (ipc_to_parquet,
                                       read_ipc_transcripts, write_ipc)


def _src_frame(small_corpus) -> pd.DataFrame:
    df = pq.read_table(small_corpus).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_ipc_roundtrip_lossless(small_corpus, tmp_path, ray_session):
    import ray.data as rd

    src = _src_frame(small_corpus)
    n = write_ipc(rd.read_parquet(small_corpus), tmp_path / "out")
    assert n == src["conv_id"].nunique()
    files = sorted(str(p) for p in (tmp_path / "out").glob("*.arrow"))
    assert len(files) == n
    back = (read_ipc_transcripts(files).to_pandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert len(back) == len(src)
    for c in ("conv_id", "role", "text", "tool"):
        assert back[c].tolist() == src[c].astype(str).fillna("").tolist(), c
    assert back["turn_idx"].tolist() == src["turn_idx"].astype(int).tolist()
    s_ts = src["ts"].astype("datetime64[us]")
    b_ts = back["ts"].astype("datetime64[us]")
    assert (b_ts.isna() == s_ts.isna()).all()
    assert (b_ts.dropna().to_numpy() == s_ts.dropna().to_numpy()).all()
    # resumable: second write is a skip-if-exists no-op with same count
    assert write_ipc(rd.read_parquet(small_corpus), tmp_path / "out") == n


def test_ipc_to_parquet_builds(small_corpus, tmp_path, ray_session):
    """IPC fragments land as build-ready Parquet; an index built over
    them ranks identically to one built over the original Parquet."""
    import ray.data as rd

    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.synth import reference_queries

    write_ipc(rd.read_parquet(small_corpus), tmp_path / "ic")
    files = sorted(str(p) for p in (tmp_path / "ic").glob("*.arrow"))
    frags = ipc_to_parquet(files, tmp_path / "frags")
    assert len(frags) == len(files)
    assert ipc_to_parquet(files, tmp_path / "frags") == frags
    idx_i = tmp_path / "idx_i"
    idx_p = tmp_path / "idx_p"
    build_index(frags, idx_i, PipelineConfig(num_shards=3))
    build_index(small_corpus, idx_p, PipelineConfig(num_shards=3))
    ei, ep = QueryEngine(str(idx_i)), QueryEngine(str(idx_p))
    assert ei.n_docs == ep.n_docs
    for q in reference_queries(k=10):
        assert ei.search(q["text"], q["k"]) == ep.search(q["text"], q["k"])

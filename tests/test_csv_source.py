"""CSV transcript source/sink (sources/csvfile.py): write_csv is the
lossless inverse of read_csv_transcripts (quoted commas/quotes/newlines
included); csv_to_parquet lands build-ready fragments; re-runs are
resumable no-ops."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from horus_ner_ray.sources.csvfile import (
    csv_to_parquet,
    read_csv_transcripts,
    write_csv,
)


def _src_frame(small_corpus) -> pd.DataFrame:
    df = pq.read_table(small_corpus).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_csv_roundtrip_lossless(small_corpus, tmp_path, ray_session):
    import ray.data as rd

    src = _src_frame(small_corpus)
    n = write_csv(rd.read_parquet(small_corpus), tmp_path / "out")
    assert n == src["conv_id"].nunique()
    files = sorted(str(p) for p in (tmp_path / "out").glob("*.csv"))
    assert len(files) == n
    back = (read_csv_transcripts(files).to_pandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert len(back) == len(src)
    for c in ("conv_id", "role", "text", "tool"):
        assert back[c].tolist() == src[c].astype(str).fillna("").tolist(), c
    assert back["turn_idx"].tolist() == src["turn_idx"].astype(int).tolist()
    s_ts = src["ts"].astype("datetime64[us]")
    b_ts = back["ts"].astype("datetime64[us]")
    assert (b_ts.isna() == s_ts.isna()).all()
    assert (b_ts.dropna().to_numpy() == s_ts.dropna().to_numpy()).all()
    assert write_csv(rd.read_parquet(small_corpus), tmp_path / "out") == n


def test_csv_quoting_hostile_text(tmp_path, ray_session):
    """Embedded commas, double quotes, newlines and CRs survive the
    round trip byte-exactly."""
    import ray.data as rd

    texts = ['a,b,"c"', 'line1\nline2', 'tricky\r\nrow', '"start', 'end"',
             '', 'plain', ',', '"",""\n,']
    df = pd.DataFrame({
        "conv_id": ["conv-x"] * len(texts),
        "turn_idx": np.arange(len(texts), dtype=np.int32),
        "role": ["user"] * len(texts),
        "text": texts,
        "tool": ["", "t,1", 't"2', "", "", "", "", "", ""],
        "ts": pd.to_datetime("2025-06-01")
        + pd.to_timedelta(np.arange(len(texts)), unit="s"),
    })
    write_csv(rd.from_pandas(df), tmp_path / "h")
    files = sorted(str(p) for p in (tmp_path / "h").glob("*.csv"))
    back = (read_csv_transcripts(files).to_pandas()
            .sort_values("turn_idx").reset_index(drop=True))
    assert back["text"].tolist() == texts
    assert back["tool"].tolist() == df["tool"].tolist()


def test_csv_to_parquet_builds(small_corpus, tmp_path, ray_session):
    """CSV fragments land as build-ready Parquet; an index built over
    them ranks identically to one built over the original Parquet."""
    import ray.data as rd

    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.synth import reference_queries

    write_csv(rd.read_parquet(small_corpus), tmp_path / "cv")
    files = sorted(str(p) for p in (tmp_path / "cv").glob("*.csv"))
    frags = csv_to_parquet(files, tmp_path / "frags")
    assert len(frags) == len(files)
    assert csv_to_parquet(files, tmp_path / "frags") == frags
    idx_c = tmp_path / "idx_c"
    idx_p = tmp_path / "idx_p"
    build_index(frags, idx_c, PipelineConfig(num_shards=3))
    build_index(small_corpus, idx_p, PipelineConfig(num_shards=3))
    ec, ep = QueryEngine(str(idx_c)), QueryEngine(str(idx_p))
    assert ec.n_docs == ep.n_docs
    for q in reference_queries(k=10):
        assert ec.search(q["text"], q["k"]) == ep.search(q["text"], q["k"])

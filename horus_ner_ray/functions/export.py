"""Result export sinks (SURVEY.md S6 — the reference dumps its feature
matrix as TSV/CSV/JSON, reference: src/core/feature_extraction/features.py:117-135
and horus_to_conll.py:117-164).  Parquet is the primary sink (partitioned,
resumable); CSV/JSON provided for small result tables."""

from __future__ import annotations

from pathlib import Path


def export_dataset(ds, path: str | Path, fmt: str = "parquet", **kw):
    """Write a Dataset to a directory of part files in the given format."""
    path = str(path)
    if fmt == "parquet":
        return ds.write_parquet(path, **kw)
    if fmt == "csv":
        return ds.write_csv(path, **kw)
    if fmt == "json":
        return ds.write_json(path, **kw)
    raise ValueError(f"unknown format {fmt!r} (parquet|csv|json)")


def matches_dataset(index_dir: str | Path, text: str, mode: str = "or",
                    concurrency: int = 2):
    """The search -> Dataset bridge: the FULL match set of one query as a
    ``ray.data.Dataset`` of (doc_id, score) rows, scored shard-by-shard
    inside an actor pool (one QueryEngine per actor, opened once in
    ``__init__``) — so a retrieval result can feed any downstream
    ``map_batches`` pipeline (re-labeling, export, dedup against a
    corpus) WITHOUT materializing on the driver.

    Scores take the exhaustive exact path (``_shard_scores_full``):
    ascending-term float64 accumulation, live docs masked — the same
    floats ``QueryEngine.search`` returns for those docs, so e6-domain
    results are oracle-checkable (driver query ``bm25_matches_export``).
    Shards partition docs, so rows are globally unique; output order is
    whatever block order the pool produces (sort downstream if needed).
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import IndexPaths
    from horus_ner_ray.util import worker_runtime_env

    index_dir = str(index_dir)
    n_shards = len(IndexPaths(index_dir).published_shards())

    class ShardMatcher:
        def __init__(self):
            self.engine = QueryEngine(index_dir)
            self.terms, self.idfs = self.engine._or_and_terms(text, mode)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            docs, scores = [], []
            for si in batch["shard"].tolist():
                ds_ = (self.engine._shard_scores_full(
                    int(si), self.terms, self.idfs, mode)
                    if self.terms else None)
                if ds_ is None:
                    continue
                d, s = ds_
                docs.append(np.asarray(d, dtype=np.int64))
                scores.append(np.asarray(s, dtype=np.float64))
            if not docs:
                return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                     "score": pd.Series([], dtype=np.float64)})
            return pd.DataFrame({"doc_id": np.concatenate(docs),
                                 "score": np.concatenate(scores)})

    env = worker_runtime_env()
    kw = {"runtime_env": env} if env else {}
    return rd.from_pandas(
        pd.DataFrame({"shard": list(range(n_shards))})
    ).repartition(n_shards).map_batches(
        ShardMatcher, batch_format="pandas", batch_size=1,
        concurrency=min(concurrency, max(1, n_shards)), **kw)

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

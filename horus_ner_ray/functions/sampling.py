"""Sampling, shuffling, and deterministic train/test splits (SURVEY.md
T4/T5 — the reference shuffles with seeded ``random.shuffle`` /
``df.sample(frac=1)`` and splits on a fixed seed list,
reference: text-classification-module train.py:68-92,
src/.../benchmarking.py:278,348)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def random_sample(ds, fraction: float, seed: int = 42):
    """Seeded Bernoulli sample (wraps Dataset.random_sample)."""
    return ds.random_sample(fraction, seed=seed)


def shuffled(ds, seed: int = 42):
    """Seeded global shuffle (full all-to-all — training-side only)."""
    return ds.random_shuffle(seed=seed)


def hash_split(ds, id_col: str = "doc_id", train_pct: int = 80, buckets: int = 100):
    """Deterministic content-keyed split: doc goes to 'train' iff
    (doc_id % buckets) < train_pct.  Order- and partitioning-independent
    (unlike random_shuffle-based splits), so it's reproducible across
    cluster sizes and SQL-expressible for the oracle."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        split = np.where((ids % buckets) < train_pct, "train", "test")
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          runtime_env=_rte())


def split_proportions(ds, id_col: str = "doc_id", train_pct: int = 80):
    """(split, n) counts for the hash split — combiner + tiny groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        tr = int(((ids % 100) < train_pct).sum())
        return pa.table(
            {"split": pa.array(["train", "test"]),
             "n": pa.array([tr, len(ids) - tr], pa.int64())}
        )

    parts = ds.select_columns([id_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None, runtime_env=_rte(),
    )
    return parts.groupby("split").aggregate(Sum("n", alias_name="n"))

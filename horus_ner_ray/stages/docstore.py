"""Doc-id assignment, conversation offset table, collection statistics.

The document key is ``(conv_id, turn_idx)`` under stable turn ordering
(BASELINE.json input_hint; SURVEY.md section 2.9): doc_id must be a pure
function of the key, never of block arrival order.  The reference gets the
same invariant implicitly from enumeration order of its sequential loop
(reference: src/core/feature_extraction/util.py:632-706); a distributed
engine has to make it explicit.

Two modes (config.doc_id_mode):

* ``rank``  (default, dense): doc_id = offset(conv_id) + turn_idx where
  offset is the cumulative turn count of all conv_ids sorting before this
  one.  The offset table has one row per conversation — built by a
  pre-aggregated (combiner-style) Ray Data groupby over just the
  ``(conv_id)`` column and broadcast with ``ray.put``.  Scale note: at
  10^12 turns / ~10^10 convs the broadcast table no longer fits; switch to
  'hash' mode, or distribute the offset table as a sorted Parquet keyed
  lookup (range-partitioned searchsorted), which this layout is already
  shaped for.

* ``hash`` (scale, sparse): doc_id = (h48(conv_id) << 16) | turn_idx with a
  deterministic 46-bit string hash — no global state, collision probability
  ~n^2/2^47 per 16-bit turn space (document and monitor; dense mode is the
  correctness default).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.tokenize import token_counts
from horus_ner_ray.util import worker_runtime_env as _rte


@dataclass
class ConvOffsets:
    """Sorted conv_id -> starting doc_id lookup (vectorized searchsorted)."""

    conv_ids: np.ndarray  # sorted, dtype=<U / object
    offsets: np.ndarray   # int64, same length
    n_docs: int           # total turns

    def lookup(self, conv_id_arr: np.ndarray) -> np.ndarray:
        arr = np.asarray(conv_id_arr, dtype=str)
        idx = np.searchsorted(self.conv_ids, arr)
        if len(idx) and (idx >= len(self.conv_ids)).any():
            raise KeyError("conv_id not present in offset table")
        got = self.conv_ids[idx]
        if not (got == arr).all():
            raise KeyError("conv_id not present in offset table")
        return self.offsets[idx]


def offsets_from_counts(conv_ids: np.ndarray, counts: np.ndarray) -> ConvOffsets:
    # fixed-width unicode ('<U') array, NOT object dtype: the table is
    # ray.put-broadcast to every fragment task, and pickling N Python
    # strings costs seconds at bench scale while '<U' buffers are ~free
    cids_u = np.asarray(conv_ids, dtype=str)
    order = np.argsort(cids_u, kind="stable")
    cids = cids_u[order]
    cnts = np.asarray(counts)[order].astype(np.int64)
    offs = np.zeros(len(cnts), dtype=np.int64)
    np.cumsum(cnts[:-1], out=offs[1:])
    return ConvOffsets(cids, offs, int(cnts.sum()))


def conv_offsets_from_dataset(ds) -> ConvOffsets:
    """Ray Data path: per-batch partial counts (combiner) -> tiny groupby.

    Input dataset needs only the ``conv_id`` column — select it before
    calling so the shuffle moves one small column of partials, not turns.
    """
    import ray.data  # noqa: F401  (ds is a ray.data.Dataset)

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by("conv_id", use_threads=False).aggregate([("conv_id", "count")])
        return pa.table({"conv_id": g["conv_id"], "n": g["conv_id_count"]})

    parts = ds.select_columns(["conv_id"]).map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    )
    from ray.data.aggregate import Sum

    agg = parts.groupby("conv_id").aggregate(Sum("n", alias_name="n_turns")).to_pandas()
    return offsets_from_counts(
        agg["conv_id"].to_numpy(dtype=object), agg["n_turns"].to_numpy()
    )


def conv_offsets_from_table(tbl: pa.Table) -> ConvOffsets:
    """Local (no-Ray) path for tests and small fragments."""
    g = tbl.group_by("conv_id", use_threads=False).aggregate([("conv_id", "count")])
    return offsets_from_counts(
        np.asarray(g["conv_id"], dtype=object), np.asarray(g["conv_id_count"])
    )


def assign_doc_ids_rank(batch: pa.Table, offsets: ConvOffsets) -> np.ndarray:
    conv = np.asarray(batch["conv_id"], dtype=object)
    base = offsets.lookup(conv)
    return base + np.asarray(batch["turn_idx"], dtype=np.int64)


_HASH_MASK = (1 << 46) - 1


def assign_doc_ids_hash(batch: pa.Table) -> np.ndarray:
    conv = np.asarray(batch["conv_id"], dtype=object)
    h = pd.util.hash_array(conv, categorize=False)  # deterministic 64-bit
    return (((h & _HASH_MASK) << 16) | np.asarray(batch["turn_idx"], dtype=np.uint64)).astype(
        np.int64
    )


# ---------------------------------------------------------------------------
# Collection statistics (the BM25 N / avgdl; SURVEY.md G5)
# ---------------------------------------------------------------------------


@dataclass
class CollectionStats:
    n_docs: int
    total_tokens: int

    @property
    def avgdl(self) -> float:
        return self.total_tokens / self.n_docs if self.n_docs else 0.0

    def to_dict(self) -> dict:
        return {"n_docs": self.n_docs, "total_tokens": self.total_tokens, "avgdl": self.avgdl}


def collection_stats_from_dataset(ds) -> CollectionStats:
    """Streaming partial-sum reduce: one (n, tokens) row per batch, then a
    driver-side sum of the tiny partials (no all-to-all)."""

    def partial(batch: pa.Table) -> pa.Table:
        dl = token_counts(batch["text"])
        return pa.table(
            {"n": pa.array([len(batch)], pa.int64()), "tok": pa.array([int(dl.sum())], pa.int64())}
        )

    parts = ds.select_columns(["text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    ).to_pandas()
    return CollectionStats(int(parts["n"].sum()), int(parts["tok"].sum()))

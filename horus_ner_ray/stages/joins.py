"""Broadcast joins / lookups (SURVEY.md §2.4 J1-J3).

The reference's joins are key lookups against its SQLite term index
(reference: src/core/feature_extraction/util.py:947-1016 term probe;
features.py:283,417 posting FK fetch).  Distributed, the same shapes become:

* **broadcast join** — small side (dimension table, vocab, blocklist) is
  ``ray.put`` once and looked up inside every ``map_batches`` task with a
  vectorized searchsorted; NO shuffle.  Right whenever one side fits in
  memory (the engine's conv-offset table, ANN query matrix, and embedding
  matrix all use this pattern already).
* **semi/anti join** — the same broadcast with a membership mask.

Both-sides-large joins: bucket both sides by ``hash(key) %% B`` and join
matching buckets pairwise (the pattern minhash/simhash dedup uses for its
pair generation); not needed for the testdata star schema where every
dimension is broadcastable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def _broadcast_side(small_df: pd.DataFrame, key: str):
    """Sorted key array + column arrays, ray.put once when Ray is up.

    The small side must be UNIQUE on ``key``: the probe is one searchsorted
    position per big-side row, so duplicate dimension keys would silently
    drop all but one match.  Fail loudly instead (a one-to-many dimension
    needs a shuffle join, not a broadcast lookup)."""
    import ray

    s = small_df.sort_values(key, kind="stable").reset_index(drop=True)
    keys = s[key].to_numpy()
    if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
        raise ValueError(
            f"broadcast join small side has duplicate '{key}' values; "
            "broadcast lookup requires a unique dimension key"
        )
    cols = {c: s[c].to_numpy() for c in s.columns if c != key}
    payload = (keys, cols)
    return ray.put(payload) if ray.is_initialized() else payload


def _resolve(ref):
    import ray

    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def broadcast_inner_join(big_ds, small_df: pd.DataFrame, big_key: str, small_key: str):
    """Dataset ⨝ small pandas table on an integer key -> Dataset with the
    small side's columns appended; rows without a match are dropped.
    Vectorized searchsorted per batch against the broadcast side."""
    ref = _broadcast_side(small_df, small_key)

    def fn(batch: pa.Table) -> pa.Table:
        keys, cols = _resolve(ref)
        bk = np.asarray(batch[big_key])
        pos = np.searchsorted(keys, bk)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = keys[pos_c] == bk
        batch = batch.filter(pa.array(hit))
        sel = pos_c[hit]
        for name, arr in cols.items():
            batch = batch.append_column(name, pa.array(arr[sel]))
        return batch

    return big_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                              runtime_env=_rte())


def broadcast_semi_join(big_ds, keys: np.ndarray, big_key: str, anti: bool = False):
    """Keep rows whose key is (not, if anti) in the broadcast key set."""
    import ray

    srt = np.sort(np.asarray(keys))
    ref = ray.put(srt) if ray.is_initialized() else srt

    def fn(batch: pa.Table) -> pa.Table:
        ks = _resolve(ref)
        bk = np.asarray(batch[big_key])
        pos = np.minimum(np.searchsorted(ks, bk), len(ks) - 1)
        hit = ks[pos] == bk if len(ks) else np.zeros(len(bk), dtype=bool)
        return batch.filter(pa.array(~hit if anti else hit))

    return big_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                              runtime_env=_rte())

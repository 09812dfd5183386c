"""Windowed aggregates over the ``events`` stream table.

Ray Data has no event-time windows (SURVEY.md section 2.9: neither does the
reference — it is strictly batch); stream-shaped workloads are expressed as
an ordered partitioned log: tumbling windows become a combiner map_batches
(one partial row per (key, window) per batch) + a small groupby — the exact
pre-aggregation pattern of stages/termstats.py — and session windows become
``groupby(key).map_groups`` over ts-sorted groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def tumbling_window_dataset(ds, window_s: int = 3600, key_col: str = "user_id",
                            ts_col: str = "ts", val_col: str = "value"):
    """Dataset(events) -> (user_id, window_start, n_events, sum_value).

    window_start = floor(epoch_us / window) * window, as timestamp[us].
    """
    from ray.data.aggregate import Sum

    w_us = np.int64(window_s) * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch[ts_col].cast(pa.int64()), dtype=np.int64)
        win = (ts // w_us) * w_us
        t = pa.table(
            {
                key_col: batch[key_col],
                "window_start": pa.array(win, pa.int64()),
                val_col: batch[val_col],
            }
        )
        g = t.group_by([key_col, "window_start"], use_threads=False).aggregate(
            [([], "count_all"), (val_col, "sum")]
        )
        return pa.table(
            {
                key_col: g[key_col],
                "window_start": g["window_start"],
                "n_events": g["count_all"],
                "sum_value": g[f"{val_col}_sum"],
            }
        )

    parts = ds.select_columns([key_col, ts_col, val_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    )
    agg = parts.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("window_start"),
            "window_start",
            batch["window_start"].cast(pa.timestamp("us")),
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())


def session_windows_dataset(ds, gap_s: int = 1800, key_col: str = "user_id",
                            ts_col: str = "ts", n_buckets: int = 256):
    """Session windows: per key, ts-sorted events split where the gap to the
    previous event exceeds ``gap_s`` -> (key, session_start, session_end,
    n_events).

    Shuffle key is hash(key) % n_buckets — one Python ``map_groups`` call
    per COARSE bucket, not per user (a per-tiny-group call measured ~100x
    slower; same fix as stages/dedupe.py).  Inside a bucket: one sort by
    (key, ts), then a fully vectorized sweep — session boundaries are
    ``user changed OR gap exceeded`` over np.diff, session aggregates read
    straight off the boundary indices.  ``n_buckets`` scales with input
    (dedupe.buckets_for_rows) so a bucket's payload stays bounded; all of
    one user's events land in one bucket by construction."""
    gap = np.int64(gap_s) * 1_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col])
        h = pd.util.hash_array(
            keys if keys.dtype != object else keys.astype(object), categorize=False
        )
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="stable")
        users = g[key_col].to_numpy()
        tsi = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (users[1:] != users[:-1]) | ((tsi[1:] - tsi[:-1]) > gap)
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(g)]
        return pd.DataFrame(
            {
                key_col: users[starts],
                "session_start": tsi[starts].astype("datetime64[us]"),
                "session_end": tsi[ends - 1].astype("datetime64[us]"),
                "n_events": (ends - starts).astype(np.int64),
            }
        )

    return (
        ds.select_columns([key_col, ts_col])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas", runtime_env=_rte())
    )

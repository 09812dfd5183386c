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
                            ts_col: str = "ts"):
    """Session windows: per key, ts-sorted events split where the gap to the
    previous event exceeds ``gap_s`` -> (key, session_start, session_end,
    n_events).  Keys are hash-partitioned by the groupby; per-group pandas
    does the sequential sweep (bounded by one key's events — state the
    reference also never exceeds, SURVEY.md section 2.9 ordering note)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = g[ts_col].to_numpy()
        gap = np.int64(gap_s) * 1_000_000
        tsi = ts.astype("datetime64[us]").astype(np.int64)
        new = np.ones(len(g), dtype=bool)
        new[1:] = (tsi[1:] - tsi[:-1]) > gap
        sid = np.cumsum(new) - 1
        out = pd.DataFrame({"sid": sid, "ts": tsi})
        r = out.groupby("sid")["ts"].agg(["min", "max", "count"]).reset_index()
        return pd.DataFrame(
            {
                key_col: np.repeat(g[key_col].iloc[0], len(r)),
                "session_start": r["min"].to_numpy().astype("datetime64[us]"),
                "session_end": r["max"].to_numpy().astype("datetime64[us]"),
                "n_events": r["count"].to_numpy(dtype=np.int64),
            }
        )

    return ds.select_columns([key_col, ts_col]).groupby(key_col).map_groups(
        sessions, batch_format="pandas"
    )

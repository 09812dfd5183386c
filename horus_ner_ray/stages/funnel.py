"""Funnel analysis: per-user ordered event-sequence matching.

The product-analytics counterpart of the reference's per-sentence
sequential passes (SURVEY.md J4; stages/windows.py session logic): for a
step sequence like view -> click -> purchase, count how many users reach
each step, where step k+1 must occur STRICTLY AFTER the user's chosen
step-k event in (ts, event_id) order (the earliest-chain greedy match,
which is the standard funnel semantics and is order-unambiguous because
event_id breaks ts ties).

Distribution shape: users are hash-routed to coarse buckets (whole user
history in one group — the same key-bounded assumption as the session
window family), each bucket resolves every user's chain fully vectorized
(one pandas pass per STEP, no per-user loop: lexicographic firsts via
sort + drop_duplicates, "after" via two int64 comparisons), and emits one
count row per step; a tiny ``groupby(step).sum`` folds buckets.  Counts
are exact ints — order-free, hash-stable vs the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte

_MIX = np.uint64(0x9E3779B97F4A7C15)


def funnel_counts(ds, steps: list[str], key_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  id_col: str = "event_id", n_buckets: int = 256):
    """-> Dataset (step_idx, step, n_users): users whose history contains
    the step-prefix chain steps[0] < steps[1] < ... in (ts, id) order."""
    from ray.data.aggregate import Sum

    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")

    def bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[key_col], dtype=np.int64).astype(np.uint64)
        bkt = ((ids * _MIX) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g[ts_col]
        tv = t.to_numpy()
        # compare in the column's NATIVE int64 resolution (ns for pandas
        # datetimes) — a us truncation would tie sub-us events the SQL
        # oracle still orders
        tus = (tv.view(np.int64) if np.issubdtype(tv.dtype, np.datetime64)
               else tv.astype(np.int64))
        f = pd.DataFrame({"u": g[key_col].to_numpy(np.int64),
                          "t": tus,
                          "i": g[id_col].to_numpy(np.int64),
                          "y": g[type_col].to_numpy(object)})
        counts = []
        # step 0: lexicographic first (t, i) per user among step-0 events
        cur = (f[f["y"] == steps[0]]
               .sort_values(["u", "t", "i"], kind="stable")
               .drop_duplicates("u")[["u", "t", "i"]])
        counts.append(len(cur))
        for step in steps[1:]:
            a = f[f["y"] == step].merge(cur, on="u", how="inner",
                                        suffixes=("", "_c"))
            after = (a["t"] > a["t_c"]) | ((a["t"] == a["t_c"])
                                           & (a["i"] > a["i_c"]))
            cur = (a[after]
                   .sort_values(["u", "t", "i"], kind="stable")
                   .drop_duplicates("u")[["u", "t", "i"]])
            counts.append(len(cur))
        return pd.DataFrame({
            "step_idx": np.arange(len(steps), dtype=np.int64),
            "step": np.array(steps, dtype=object),
            "n_users": np.array(counts, dtype=np.int64),
        })

    return (
        ds.select_columns([key_col, type_col, ts_col, id_col])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: per_bucket(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
        .groupby(["step_idx", "step"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

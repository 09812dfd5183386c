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


def event_paths(ds, key_col: str = "user_id", type_col: str = "event_type",
                ts_col: str = "ts", id_col: str = "event_id",
                prefix_len: int = 3, sep: str = ">", n_buckets: int = 256):
    """Per-user journey paths: the first ``prefix_len`` events in (ts, id)
    order joined with ``sep`` — Dataset(user_id, path).  The product-
    analytics "user journey" primitive funnel_counts is the matching
    half of.

    Vectorized end-to-end: one lexsort per bucket orders every user's
    history at once, a cumcount mask takes the prefix, and the per-user
    concatenation is ``pyarrow.compute.binary_join`` over a ListArray
    built from the sorted run boundaries — no per-user Python."""
    import pyarrow.compute as pc

    def bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[key_col], dtype=np.int64).astype(np.uint64)
        bkt = ((ids * _MIX) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g[key_col].to_numpy(np.int64)
        tv = g[ts_col].to_numpy()
        t = (tv.view(np.int64) if np.issubdtype(tv.dtype, np.datetime64)
             else tv.astype(np.int64))
        i = g[id_col].to_numpy(np.int64)
        y = g[type_col].to_numpy(object)
        order = np.lexsort((i, t, u))
        us, ys = u[order], y[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        # prefix mask: position within the user's run < prefix_len
        runpos = np.arange(len(us)) - np.repeat(starts,
                                                np.diff(np.r_[starts, len(us)]))
        keep = runpos < prefix_len
        kept_u = us[keep]
        kept_y = ys[keep]
        kstarts = np.flatnonzero(np.r_[True, kept_u[1:] != kept_u[:-1]])
        offsets = np.r_[kstarts, len(kept_u)].astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets),
                                       pa.array(kept_y, pa.string()))
        paths = pc.binary_join(lst, sep)
        return pd.DataFrame({
            "user_id": kept_u[kstarts],
            "path": np.asarray(paths, dtype=object),
        })

    return (
        ds.select_columns([key_col, type_col, ts_col, id_col])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: per_bucket(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )


def top_paths(ds, k: int = 50, **kwargs):
    """Top-k most common journey prefixes: (path, n_users), n desc then
    path asc.  The groupby runs over the path table (one row per user);
    the final top-k is a sort over the distinct-path table, whose
    cardinality is bounded by (event-type vocabulary)^prefix_len."""
    paths = event_paths(ds, **kwargs)
    counts = paths.groupby("path").count()
    df = counts.to_pandas().rename(columns={"count()": "n_users"})
    df["n_users"] = df["n_users"].astype(np.int64)
    return (df.sort_values(["n_users", "path"], ascending=[False, True],
                           kind="stable").head(k).reset_index(drop=True))


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


def conversion_delays(ds, step_a: str, step_b: str,
                      key_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id", n_buckets: int = 256):
    """-> Dataset (user_id, delta_us): per converting user, the time
    from their FIRST ``step_a`` event to the FIRST ``step_b`` event
    strictly after it ((ts, id) lexicographic order, the funnel_counts
    contract) — the time-to-convert table behind funnel latency
    percentiles.  Users who never complete the pair emit no row.

    Same scale shape as funnel_counts: user-hash coarse buckets, one
    vectorized kernel per bucket, no per-user Python."""

    def bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[key_col], dtype=np.int64).astype(np.uint64)
        bkt = ((ids * _MIX) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tv = g[ts_col].to_numpy()
        # pandas 2 preserves parquet's us resolution; older paths give ns
        # — convert the DELTA by the column's actual unit, not a guess
        if np.issubdtype(tv.dtype, np.datetime64):
            unit = np.datetime_data(tv.dtype)[0]
            div = {"ns": 1000, "us": 1}.get(unit)
            if div is None:
                raise ValueError(f"unsupported datetime unit {unit!r}")
            tus = tv.view(np.int64)
        else:
            div = 1
            tus = tv.astype(np.int64)
        f = pd.DataFrame({"u": g[key_col].to_numpy(np.int64),
                          "t": tus,
                          "i": g[id_col].to_numpy(np.int64),
                          "y": g[type_col].to_numpy(object)})
        first_a = (f[f["y"] == step_a]
                   .sort_values(["u", "t", "i"], kind="stable")
                   .drop_duplicates("u")[["u", "t", "i"]])
        b = f[f["y"] == step_b].merge(first_a, on="u", how="inner",
                                      suffixes=("", "_a"))
        after = (b["t"] > b["t_a"]) | ((b["t"] == b["t_a"])
                                       & (b["i"] > b["i_a"]))
        conv = (b[after]
                .sort_values(["u", "t", "i"], kind="stable")
                .drop_duplicates("u"))
        delta = (conv["t"] - conv["t_a"]).to_numpy(np.int64) // div
        return pd.DataFrame({
            "user_id": conv["u"].to_numpy(np.int64),
            "delta_us": delta,
        })

    return (
        ds.select_columns([key_col, type_col, ts_col, id_col])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: per_bucket(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )

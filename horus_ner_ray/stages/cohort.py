"""Cohort retention analysis: users grouped by first-activity week, counted
by weeks-since-cohort activity.

The product-analytics companion of the funnel operator (stages/funnel.py)
and the classic question a training-data/telemetry pipeline answers at
scale: of the users who first appeared in week W, how many were active in
W+k?  Reference analogue: the per-term aggregation-with-history shape of
SURVEY.md G-family operators.

Distribution shape (exact, integer-domain, oracle-checkable):
- per-batch COMBINER: min event ts per (user, week) — a hot user costs one
  row per week per batch, never a hot shuffle key beyond their week count;
- users hash-route to coarse buckets (whole user history in one group —
  the same key-bounded assumption as the session/funnel family); inside a
  bucket everything is vectorized pandas/numpy: per-user first ts = min
  over (user, week) mins, week offsets by integer day arithmetic;
- buckets emit partial (cohort_week, offset, n) counts; a tiny
  ``groupby.sum`` folds them.

Week truncation matches DuckDB ``date_trunc('week', ts)`` (ISO weeks,
Monday start): 1970-01-01 is a Thursday, so
``monday = day - ((day + 3) mod 7)`` in epoch days.  All timestamps are
compared as int64 microseconds; the published ``cohort_week_us`` is the
week start's epoch microseconds — hash-identical to the SQL
``epoch_us(date_trunc('week', ...))``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte

_MIX = np.uint64(0x9E3779B97F4A7C15)
_US_PER_DAY = np.int64(86_400_000_000)


def week_start_us(ts_us: np.ndarray) -> np.ndarray:
    """int64 epoch-us -> epoch-us of the containing ISO week's Monday
    (floor semantics, correct for pre-1970 values too)."""
    days = np.floor_divide(ts_us, _US_PER_DAY)
    monday = days - np.mod(days + 3, 7)
    return monday * _US_PER_DAY


def cohort_retention(ds, user_col: str = "user_id", ts_col: str = "ts",
                     n_buckets: int = 256):
    """-> Dataset (cohort_week_us, week_offset, n_users): distinct users
    whose FIRST event falls in cohort week W and who have >=1 event in
    week W + week_offset (offset 0 row = cohort size)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(
            batch[ts_col].combine_chunks().cast(pa.timestamp("us"))
            .cast(pa.int64()))
        users = np.asarray(batch[user_col], dtype=np.int64)
        wk = week_start_us(ts)
        g = (pd.DataFrame({"u": users, "w": wk, "t": ts})
             .groupby(["u", "w"], sort=False)["t"].min().reset_index())
        h = g["u"].to_numpy(np.int64).astype(np.uint64)
        bkt = ((h * _MIX) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "u": pa.array(g["u"].to_numpy(np.int64), pa.int64()),
            "w": pa.array(g["w"].to_numpy(np.int64), pa.int64()),
            "t": pa.array(g["t"].to_numpy(np.int64), pa.int64()),
            "bkt": pa.array(bkt, pa.int64()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # fold batch partials: true min per (user, week); first ts per user
        m = g.groupby(["u", "w"], sort=False)["t"].min().reset_index()
        first = m.groupby("u", sort=False)["t"].min()
        fw = week_start_us(first.to_numpy(np.int64))
        fw_of = pd.Series(fw, index=first.index)
        cohort = m["u"].map(fw_of).to_numpy(np.int64)
        off = (m["w"].to_numpy(np.int64) - cohort) // (_US_PER_DAY * 7)
        out = (pd.DataFrame({"cohort_week_us": cohort,
                             "week_offset": off.astype(np.int64)})
               .groupby(["cohort_week_us", "week_offset"], sort=False)
               .size().reset_index(name="n"))
        return out

    return (
        ds.select_columns([user_col, ts_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: per_bucket(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
        .groupby(["cohort_week_us", "week_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )


def bucket_churn(ds, interval_us: int, key_col: str = "user_id",
                 ts_col: str = "ts", n_buckets: int = 256):
    """Per-time-bucket churn: (bucket, n_active, n_retained, n_churned)
    with retained = active users ALSO active in bucket+1 (strict
    adjacency), churned = active - retained.  The last active bucket of
    a user counts as churn by construction.

    Shape: distinct (bucket, user) pairs from a per-batch combiner;
    users coarse-hash-grouped so the retained flag computes vectorized
    per group (sorted buckets, next-bucket adjacency — never a per-user
    Python call); a tiny groupby(bucket) folds the counts."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if interval_us <= 0:
        raise ValueError(f"interval_us must be > 0, got {interval_us}")

    def pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tsv = np.asarray(pc.cast(batch[ts_col], pa.int64()),
                         dtype=np.int64)
        bkt = np.floor_divide(tsv, np.int64(interval_us))
        u = np.asarray(batch[key_col], dtype=np.int64)
        g = (pd.DataFrame({"u": u, "b": bkt})
             .drop_duplicates(["u", "b"]))
        ub = g["u"].to_numpy(np.int64).astype(np.uint64)
        cg = ((ub * np.uint64(0x9E3779B97F4A7C15))
              % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "u": pa.array(g["u"].to_numpy(np.int64), pa.int64()),
            "b": pa.array(g["b"].to_numpy(np.int64), pa.int64()),
            "cg": pa.array(cg, pa.int64()),
        })

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "b"])
        u = g["u"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        order = np.lexsort((b, u))
        u, b = u[order], b[order]
        retained = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            adj = (u[1:] == u[:-1]) & (b[1:] == b[:-1] + 1)
            retained[:-1][adj] = 1
        out = (pd.DataFrame({"bucket": b, "n_active": np.int64(1),
                             "n_retained": retained})
               .groupby("bucket", sort=False).sum().reset_index())
        return out

    return (ds.select_columns([key_col, ts_col])
            .map_batches(pairs, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte())
            .groupby("cg")
            .map_groups(lambda g: per_group(g.drop(columns=["cg"])),
                        batch_format="pandas", runtime_env=_rte())
            .groupby("bucket")
            .aggregate(Sum("n_active", alias_name="n_active"),
                       Sum("n_retained", alias_name="n_retained")))

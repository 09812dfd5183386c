"""Distributed analytic (SQL OVER-clause) window functions.

The reference's per-sentence sequential passes (e.g. compound->token
propagation, reference: src/horusdemo.py:110-126, and the positional
feature joins in src/core/feature_extraction/features.py) are instances of
partitioned-ordered analytics.  This stage generalises them to the standard
SQL window-function family — row_number, lag, running sum, rank,
dense_rank — over ``PARTITION BY key ORDER BY order_cols``.

Plan (same coarse-bucket shape as stages/windows.py): hash(key) routes every
row of a partition to one of ``n_buckets`` coarse groups (ONE Python
``map_groups`` call per bucket, not per key), each bucket sorts once by
(key, *order_cols) and computes every function fully vectorized off the
segment-boundary indices — no per-key Python.  Partitions are assumed
key-bounded (a single user's events fit one worker); n_buckets scales with
input rows (dedupe.buckets_for_rows) so bucket payloads stay bounded at any
corpus size.

The value column is fixed-point-scaled to int64 BEFORE any accumulation
(``val_scale``): integer running sums are exact and independent of float
association order, so results hash-match a SQL oracle bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def _segments(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(seg_starts, seg_lens, seg_of_row) for a key-sorted key array."""
    n = len(keys)
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, n))
    return starts, lens, np.repeat(starts, lens)


def window_functions_dataset(
    ds,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
    n_buckets: int = 256,
    val_scale: int = 1_000_000,
    lag_default: int = -1,
    extended: bool = False,
    ntile_n: int = 4,
):
    """SQL window functions over ``PARTITION BY key_col ORDER BY order_cols``:

    - ``rn``                row_number()
    - ``prev_value_e6``     lag(value_e6) with ``lag_default`` at partition head
    - ``running_value_e6``  sum(value_e6) ROWS UNBOUNDED PRECEDING (exact int)
    - ``value_rank``        rank()       OVER (... ORDER BY value_e6 DESC)
    - ``value_dense_rank``  dense_rank() OVER (... ORDER BY value_e6 DESC)

    With ``extended=True`` three more columns (kept opt-in so the base
    query's published schema stays frozen):

    - ``tile``          ntile(ntile_n) OVER (... ORDER BY order_cols) —
                        the first cnt%n tiles get the extra row, as in SQL
    - ``prank_e6``      percent_rank() OVER (... ORDER BY value_e6 DESC),
                        (rank-1)/(cnt-1) e6-published, 0 for cnt==1
    - ``cume_e6``       cume_dist() OVER (... ORDER BY value_e6 DESC),
                        peers-inclusive row fraction, e6-published

    ``order_cols`` must be unique per key (include a tiebreaker id) so
    row_number/lag/running-sum order is deterministic.  rank/dense_rank
    order by the SCALED value alone — ties share min/dense rank exactly as
    in SQL, and because the compared values are ints the tie set is
    order-free."""
    scale = float(val_scale)

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col])
        h = pd.util.hash_array(
            keys if keys.dtype != object else keys.astype(object), categorize=False
        )
        v = np.asarray(batch[value_col], dtype=np.float64)
        out = batch.drop_columns([value_col]).append_column(
            "value_e6", pa.array(np.floor(v * scale + 0.5).astype(np.int64), pa.int64())
        )
        return out.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def fns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="stable")
        keys = g[key_col].to_numpy()
        v = g["value_e6"].to_numpy(dtype=np.int64)
        n = len(g)
        pos = np.arange(n, dtype=np.int64)
        seg_starts, seg_lens, seg_of_row = _segments(keys)

        rn = pos - seg_of_row + 1
        prev = np.empty(n, dtype=np.int64)
        if n > 1:
            prev[1:] = v[:-1]
        prev[seg_starts] = lag_default
        cs = np.cumsum(v)
        running = cs - np.repeat(cs[seg_starts] - v[seg_starts], seg_lens)

        # rank / dense_rank by value desc: one lexsort (segment, -value,
        # original position), then run boundaries give both ranks
        order = np.lexsort((pos, -v, seg_of_row))
        sv, sseg = v[order], seg_of_row[order]
        s_starts, s_lens, _ = _segments(sseg)
        pos_in_seg = np.arange(n, dtype=np.int64) - np.repeat(s_starts, s_lens)
        newrun = np.ones(n, dtype=bool)
        if n > 1:
            newrun[1:] = (sseg[1:] != sseg[:-1]) | (sv[1:] != sv[:-1])
        run_starts = np.flatnonzero(newrun)
        run_lens = np.diff(np.append(run_starts, n))
        rank_sorted = np.repeat(pos_in_seg[run_starts] + 1, run_lens)
        run_idx = np.cumsum(newrun)  # 1-based global run ordinal
        seg_first_run = np.repeat(run_idx[s_starts], s_lens)[run_starts]
        dr_sorted = np.repeat(run_idx[run_starts] - seg_first_run + 1, run_lens)
        rank = np.empty(n, dtype=np.int64)
        drank = np.empty(n, dtype=np.int64)
        rank[order] = rank_sorted
        drank[order] = dr_sorted

        res = g[[*id_cols, key_col]].copy()
        res["rn"] = rn
        res["prev_value_e6"] = prev
        res["running_value_e6"] = running
        res["value_rank"] = rank
        res["value_dense_rank"] = drank
        if extended:
            cnt = np.repeat(seg_lens, seg_lens)
            # ntile over the row order: first cnt%n tiles take the extra row
            q, r = cnt // ntile_n, cnt % ntile_n
            cut = r * (q + 1)  # rows covered by the big tiles
            in_big = (rn - 1) < cut
            big = (rn - 1) // np.maximum(q + 1, 1) + 1
            small = r + ((rn - 1) - cut) // np.maximum(q, 1) + 1
            res["tile"] = np.where(in_big, big,
                                   np.where(q > 0, small, rn)).astype(np.int64)
            # percent_rank: (rank-1)/(cnt-1); 0 when the partition is a row
            pr = np.zeros(n, dtype=np.float64)
            multi = cnt > 1
            pr[multi] = (rank[multi] - 1).astype(np.float64) \
                / (cnt[multi] - 1).astype(np.float64)
            res["prank_e6"] = np.floor(pr * 1e6 + 0.5).astype(np.int64)
            # cume_dist: (last peer's position-in-segment + 1) / cnt,
            # scattered back through the same desc-sorted run layout
            run_end = np.repeat(pos_in_seg[run_starts] + run_lens, run_lens)
            cume_sorted = run_end.astype(np.float64) \
                / np.repeat(cnt[order][run_starts], run_lens).astype(np.float64)
            cume = np.empty(n, dtype=np.float64)
            cume[order] = cume_sorted
            res["cume_e6"] = np.floor(cume * 1e6 + 0.5).astype(np.int64)
        return res

    cols = list(dict.fromkeys([*id_cols, key_col, *order_cols, value_col]))
    return (
        ds.select_columns(cols)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bucket")
        .map_groups(fns, batch_format="pandas", runtime_env=_rte())
    )


def rolling_aggregates_dataset(
    ds,
    window: int,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
    n_buckets: int = 256,
    val_scale: int = 1_000_000,
):
    """Rolling (moving-window) aggregates over ``PARTITION BY key_col ORDER
    BY order_cols ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``:

    - ``roll_cnt``     count(*) in the frame (= min(row_number, window))
    - ``roll_sum_e6``  sum(value_e6), EXACT int64 via per-segment cumsum
                       difference (never a float accumulation)
    - ``roll_avg_e6``  floor(double(roll_sum_e6) / roll_cnt + 0.5)
    - ``roll_min_e6`` / ``roll_max_e6``  frame min/max (comparisons only;
      requires |value_e6| < 2**53 since pandas.rolling round-trips float64)

    Same coarse-bucket plan as ``window_functions_dataset``: hash(key)
    routes whole partitions to buckets, each bucket sorts once and computes
    everything vectorized.  Partitions are assumed key-bounded."""
    scale = float(val_scale)
    w = int(window)
    if w < 1:
        raise ValueError("window must be >= 1")

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col])
        h = pd.util.hash_array(
            keys if keys.dtype != object else keys.astype(object),
            categorize=False)
        v = np.asarray(batch[value_col], dtype=np.float64)
        out = batch.drop_columns([value_col]).append_column(
            "value_e6",
            pa.array(np.floor(v * scale + 0.5).astype(np.int64), pa.int64()))
        return out.append_column(
            "bucket",
            pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64()))

    def fns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="stable")
        keys = g[key_col].to_numpy()
        v = g["value_e6"].to_numpy(dtype=np.int64)
        n = len(g)
        pos = np.arange(n, dtype=np.int64)
        seg_starts, seg_lens, seg_of_row = _segments(keys)

        rn = pos - seg_of_row + 1  # 1-based row number within partition
        cnt = np.minimum(rn, w)
        # exact rolling sum: cumsum(seg) - cumsum(seg) shifted by w
        cs = np.cumsum(v)
        seg_base = np.repeat(cs[seg_starts] - v[seg_starts], seg_lens)
        run = cs - seg_base  # running sum within segment
        prev_idx = pos - w   # global index of the row w back
        valid = rn > w       # frame truncated at partition head otherwise
        roll = run.copy()
        roll[valid] = run[valid] - run[prev_idx[valid]]
        # rolling min/max within each partition (comparison-only kernels)
        grp = pd.Series(v, dtype=np.float64).groupby(seg_of_row)
        rmin = grp.rolling(w, min_periods=1).min().to_numpy()
        rmax = grp.rolling(w, min_periods=1).max().to_numpy()
        avg = np.floor(roll.astype(np.float64) / cnt + 0.5).astype(np.int64)

        res = g[[*id_cols, key_col]].copy()
        res["roll_cnt"] = cnt
        res["roll_sum_e6"] = roll
        res["roll_avg_e6"] = avg
        res["roll_min_e6"] = rmin.astype(np.int64)
        res["roll_max_e6"] = rmax.astype(np.int64)
        return res

    cols = list(dict.fromkeys([*id_cols, key_col, *order_cols, value_col]))
    return (
        ds.select_columns(cols)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bucket")
        .map_groups(fns, batch_format="pandas", runtime_env=_rte())
    )


def global_rank_by(ds, key_cols: list[str], id_col: str,
                   n_buckets: int = 64,
                   bounds: list[int] | None = None):
    """GLOBAL ORDER BY with a dense 1-based rank column — the
    un-partitioned ``row_number() OVER (ORDER BY key_cols, id)`` that a
    curriculum ordering / leaderboard export needs, WITHOUT collecting
    the corpus on the driver.

    Plan (the range-partition + offsets shape of the rank-mode doc-id
    assignment): rows route to ``n_buckets`` ORDER-PRESERVING range
    buckets on the first key (fixed-width over ``bounds``, or probed
    min/max when absent — two cheap aggregate passes); per-bucket counts
    prefix-sum into O(B) driver offsets; each bucket then sorts locally
    by (*key_cols, id) and adds its offset.  Equal first keys always
    share a bucket, so the within-bucket sort settles every tie.  Skewed
    key distributions concentrate rows in few buckets (same caveat as
    every range partitioner) — pass explicit ``bounds`` quantiles when
    the distribution is known.

    First key and ``id_col`` must be integers.  Returns a Dataset of
    ``(*key_cols, id_col, rank)``.
    """
    from ray.data.aggregate import Count, Max, Min

    first = key_cols[0]
    if bounds is None:
        mm = (ds.select_columns([first])
              .aggregate(Min(first), Max(first)))
        lo = int(mm[f"min({first})"])
        hi = int(mm[f"max({first})"]) + 1
    else:
        lo, hi = int(bounds[0]), int(bounds[1])
    span = max(1, hi - lo)

    def route(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[first], dtype=np.int64)
        b = ((k - lo).clip(0, span - 1) * n_buckets) // span
        keep = batch.select(list(dict.fromkeys([*key_cols, id_col])))
        return keep.append_column("__bkt", pa.array(b.astype(np.int64),
                                                    pa.int64()))

    routed = ds.map_batches(route, batch_format="pyarrow",
                            zero_copy_batch=True, runtime_env=_rte())
    counts = (routed.groupby("__bkt")
              .aggregate(Count(alias_name="n"))).to_pandas()
    counts = counts.sort_values("__bkt").reset_index(drop=True)
    offs = np.zeros(n_buckets, dtype=np.int64)
    cum = 0
    for bkt, n in zip(counts["__bkt"].astype(int), counts["n"].astype(int)):
        offs[bkt] = cum
        cum += n
    import ray

    ref = ray.put(offs) if ray.is_initialized() else offs

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(ref) if ray.is_initialized() else ref
        bkt = int(g["__bkt"].iloc[0])
        g = g.sort_values([*key_cols, id_col],
                          kind="stable").reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64) + o[bkt]
        return g.drop(columns=["__bkt"])

    return routed.groupby("__bkt").map_groups(
        rank_bucket, batch_format="pandas", runtime_env=_rte())

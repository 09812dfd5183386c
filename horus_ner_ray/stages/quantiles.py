"""Distributed EXACT discrete quantiles (percentiles/median) over a numeric
column — the G-family aggregate the engine lacked (SURVEY.md §2.5; the
reference computes percentile-style eval summaries driver-side over tiny
result sets, e.g. horus_to_conll-style stats; here it must work at corpus
scale).

Semantics match DuckDB ``quantile_disc(col, q)``: the value at 0-based rank
``max(0, ceil(q * n) - 1)`` of the ascending-sorted column (calibrated
empirically; exact for binary-representable q — prefer 0.25/0.5/0.75-style
quantiles so ``q * n`` never rounds across an integer differently in the
two engines).

Algorithm — selection by histogram refinement, never a global sort:

1. one ``map_batches`` pass: per-batch (count, min, max) partials, tiny
   driver reduce;
2. per round, one ``map_batches`` pass computing a B-bin histogram of each
   unresolved target's current value interval (all targets share the
   pass); the bin holding the target rank becomes the next interval and
   the rank is re-based into it — each round divides the candidate count
   by ~B;
3. when a target's interval holds <= ``gather_limit`` values, one filtered
   pass collects them and ``np.partition`` picks the exact rank.

Every pass streams (no materialization); driver state is O(B * targets).
Skew guard: an interval that stops shrinking (mass concentrated at one
float value) resolves by direct gather.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def _minmax_count(ds, col: str):
    def f(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[col], dtype=np.float64)
        if len(a) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"n": pa.array([len(a)], pa.int64()),
                         "lo": pa.array([float(a.min())], pa.float64()),
                         "hi": pa.array([float(a.max())], pa.float64())})

    p = ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                       runtime_env=_rte()).to_pandas()
    if len(p) == 0 or p["n"].sum() == 0:
        return 0, 0.0, 0.0
    return int(p["n"].sum()), float(p["lo"].min()), float(p["hi"].max())


def _interval_histograms(ds, col: str, intervals: list[tuple[float, float]],
                         n_bins: int):
    """One streaming pass: per-batch bin counts for every interval, reduced
    driver-side into one (targets, n_bins) matrix.  Partials are dense but
    tiny (targets * n_bins int64 per batch)."""
    ivs = [(float(lo), float(hi)) for lo, hi in intervals]

    def f(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[col], dtype=np.float64)
        rows = []
        for t, (lo, hi) in enumerate(ivs):
            sel = a[(a >= lo) & (a <= hi)]
            width = (hi - lo) / n_bins
            if width <= 0:
                cnts = np.zeros(n_bins, dtype=np.int64)
                cnts[0] = len(sel)
            else:
                idx = np.minimum(((sel - lo) / width).astype(np.int64),
                                 n_bins - 1)
                cnts = np.bincount(idx, minlength=n_bins).astype(np.int64)
            rows.append(cnts)
        return pa.table({"t": pa.array(np.arange(len(ivs)), pa.int64()),
                         "h": pa.array(list(map(list, rows)),
                                       pa.list_(pa.int64()))})

    parts = ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                           runtime_env=_rte()).to_pandas()
    out = np.zeros((len(ivs), n_bins), dtype=np.int64)
    for t, h in zip(parts["t"], parts["h"]):
        out[int(t)] += np.asarray(h, dtype=np.int64)
    return out


def _gather(ds, col: str, intervals: list[tuple[float, float]]) -> list[np.ndarray]:
    ivs = [(float(lo), float(hi)) for lo, hi in intervals]

    def f(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[col], dtype=np.float64)
        ts, vs = [], []
        for t, (lo, hi) in enumerate(ivs):
            sel = a[(a >= lo) & (a <= hi)]
            ts.append(np.full(len(sel), t, dtype=np.int64))
            vs.append(sel)
        return pa.table({"t": pa.array(np.concatenate(ts), pa.int64()),
                         "v": pa.array(np.concatenate(vs), pa.float64())})

    g = ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                       runtime_env=_rte()).to_pandas()
    return [g.loc[g["t"] == t, "v"].to_numpy() for t in range(len(ivs))]


def quantile_disc(ds, col: str, qs: list[float], n_bins: int = 4096,
                  gather_limit: int = 2_000_000, max_rounds: int = 16) -> pd.DataFrame:
    """Exact discrete quantiles of ``ds[col]`` -> DataFrame (q, value)."""
    n, lo, hi = _minmax_count(ds, col)
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                             "value": pd.Series([np.nan] * len(qs))})
    # state per target: (interval, local rank within it, candidate count)
    state = []
    for q in qs:
        rank = min(n - 1, max(0, math.ceil(q * n) - 1))
        state.append({"iv": (lo, hi), "k": rank, "cnt": n, "done": False})

    for _ in range(max_rounds):
        open_idx = [i for i, s in enumerate(state)
                    if not s["done"] and s["cnt"] > gather_limit]
        if not open_idx:
            break
        hists = _interval_histograms(
            ds, col, [state[i]["iv"] for i in open_idx], n_bins)
        for row, i in enumerate(open_idx):
            s = state[i]
            h = hists[row]
            cum = np.cumsum(h)
            j = int(np.searchsorted(cum, s["k"] + 1))
            below = int(cum[j - 1]) if j > 0 else 0
            ilo, ihi = s["iv"]
            width = (ihi - ilo) / n_bins
            nlo = ilo + j * width
            nhi = ihi if j == n_bins - 1 else ilo + (j + 1) * width
            new_cnt = int(h[j])
            if width <= 0 or new_cnt == s["cnt"]:
                # mass concentrated at one float (or interval can't shrink):
                # histogram refinement is stuck -> resolve by gather
                s["done"] = True
                continue
            s["iv"], s["k"], s["cnt"] = (nlo, nhi), s["k"] - below, new_cnt

    vals = _gather(ds, col, [s["iv"] for s in state])
    out = []
    for s, v in zip(state, vals):
        assert len(v) == 0 or s["k"] < len(v), "rank outside gathered bin"
        out.append(float(np.partition(v, s["k"])[s["k"]]))
    return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                         "value": pd.Series(out, dtype=np.float64)})

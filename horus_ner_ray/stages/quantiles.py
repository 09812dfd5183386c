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
   unresolved target's current candidate set (all targets share the pass);
   the bin holding the target rank becomes the next candidate set and the
   rank is re-based into it — each round divides the candidate count by
   ~B;
3. when a target's candidate set holds <= ``gather_limit`` values, one
   filtered pass collects them and ``np.partition`` picks the exact rank.

Float-exactness invariant: a candidate set is defined by the CHAIN of
binning predicates ``clip(floor((x - glo) / gwidth)) == j`` accumulated
across rounds — the exact same arithmetic that produced the counts — never
by recomputed interval bounds.  (Recomputing ``lo + j*width`` in floating
point can disagree with the floor-division binning at bin edges by one
ulp, which would silently shift every rank in the bin.)

Every pass streams (no materialization); driver state is O(bins x targets
x rounds).  Skew guard: a candidate set that stops shrinking (mass
concentrated at one float value) resolves by direct gather.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte

# one refinement predicate: clip(floor((x - glo) / gwidth), 0, nb-1) == j
_Cond = tuple  # (glo, gwidth, j, n_bins)


def _apply_conds(a: np.ndarray, conds: list[_Cond]) -> np.ndarray:
    keep = np.ones(len(a), dtype=bool)
    for glo, gwidth, j, nb in conds:
        idx = np.clip(np.floor((a - glo) / gwidth).astype(np.int64), 0, nb - 1)
        keep &= idx == j
    return keep


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


def _candidate_histograms(ds, col: str, jobs: list[dict], n_bins: int):
    """One streaming pass: per-batch bin counts of every job's candidate
    set (selected by its predicate chain, binned on its grid), reduced
    driver-side into one (jobs, n_bins) matrix."""
    def f(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[col], dtype=np.float64)
        rows = []
        for job in jobs:
            sel = a[_apply_conds(a, job["conds"])]
            glo, gwidth = job["grid"]
            idx = np.clip(np.floor((sel - glo) / gwidth).astype(np.int64),
                          0, n_bins - 1)
            rows.append(np.bincount(idx, minlength=n_bins).astype(np.int64))
        return pa.table({"t": pa.array(np.arange(len(jobs)), pa.int64()),
                         "h": pa.array(list(map(list, rows)),
                                       pa.list_(pa.int64()))})

    parts = ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                           runtime_env=_rte()).to_pandas()
    out = np.zeros((len(jobs), n_bins), dtype=np.int64)
    for t, h in zip(parts["t"], parts["h"]):
        out[int(t)] += np.asarray(h, dtype=np.int64)
    return out


def _gather(ds, col: str, cond_sets: list[list[_Cond]]) -> list[np.ndarray]:
    def f(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[col], dtype=np.float64)
        ts, vs = [], []
        for t, conds in enumerate(cond_sets):
            sel = a[_apply_conds(a, conds)]
            ts.append(np.full(len(sel), t, dtype=np.int64))
            vs.append(sel)
        return pa.table({"t": pa.array(np.concatenate(ts), pa.int64()),
                         "v": pa.array(np.concatenate(vs), pa.float64())})

    g = ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                       runtime_env=_rte()).to_pandas()
    return [g.loc[g["t"] == t, "v"].to_numpy() for t in range(len(cond_sets))]


def _resolve_ranks(ds, col: str, ranks: list[int], n: int, lo: float,
                   hi: float, n_bins: int, gather_limit: int,
                   max_rounds: int) -> list[float]:
    """Exact order statistics at the given 0-based ascending ranks via the
    histogram-refinement selection described in the module docstring."""
    state = [{"conds": [], "grid": (lo, hi), "k": rank, "cnt": n,
              "done": False} for rank in ranks]

    for _ in range(max_rounds):
        open_idx = [i for i, s in enumerate(state)
                    if not s["done"] and s["cnt"] > gather_limit]
        if not open_idx:
            break
        jobs = []
        for i in open_idx:
            s = state[i]
            glo, ghi = s["grid"]
            gwidth = (ghi - glo) / n_bins
            if gwidth <= 0:  # candidate mass at a single float
                s["done"] = True
                continue
            jobs.append({"i": i, "conds": s["conds"], "grid": (glo, gwidth)})
        if not jobs:
            break
        hists = _candidate_histograms(ds, col, jobs, n_bins)
        for row, job in enumerate(jobs):
            s = state[job["i"]]
            h = hists[row]
            cum = np.cumsum(h)
            j = int(np.searchsorted(cum, s["k"] + 1))
            below = int(cum[j - 1]) if j > 0 else 0
            new_cnt = int(h[j])
            if new_cnt == s["cnt"]:
                # not shrinking (duplicate-heavy bin) -> resolve by gather
                s["done"] = True
                continue
            glo, gwidth = job["grid"]
            s["conds"] = [*s["conds"], (glo, gwidth, j, n_bins)]
            # nominal grid for the NEXT round's subdivision; candidate
            # membership stays predicate-defined, so slop here only costs
            # bin balance, never correctness
            s["grid"] = (glo + j * gwidth, glo + (j + 1) * gwidth)
            s["k"], s["cnt"] = s["k"] - below, new_cnt

    vals = _gather(ds, col, [s["conds"] for s in state])
    out = []
    for s, v in zip(state, vals):
        assert len(v) == 0 or s["k"] < len(v), "rank outside gathered bin"
        out.append(float(np.partition(v, s["k"])[s["k"]]))
    return out


def quantile_disc(ds, col: str, qs: list[float], n_bins: int = 4096,
                  gather_limit: int = 2_000_000, max_rounds: int = 16) -> pd.DataFrame:
    """Exact discrete quantiles of ``ds[col]`` -> DataFrame (q, value)."""
    n, lo, hi = _minmax_count(ds, col)
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                             "value": pd.Series([np.nan] * len(qs))})
    ranks = [min(n - 1, max(0, math.ceil(q * n) - 1)) for q in qs]
    out = _resolve_ranks(ds, col, ranks, n, lo, hi, n_bins, gather_limit,
                         max_rounds)
    return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                         "value": pd.Series(out, dtype=np.float64)})


def quantile_cont(ds, col: str, qs: list[float], n_bins: int = 4096,
                  gather_limit: int = 2_000_000, max_rounds: int = 16) -> pd.DataFrame:
    """Exact INTERPOLATED quantiles (SQL ``quantile_cont`` /
    ``percentile_cont`` semantics): at fractional rank ``rn = q * (n-1)``
    the result is ``(crn - rn) * v[floor(rn)] + (rn - floor(rn)) *
    v[ceil(rn)]`` — the textbook formula in the exact association DuckDB
    evaluates, so e6 publications hash-match.  Needs at most two order
    statistics per q; both resolve in the SAME refinement passes as
    quantile_disc (the rank set is shared across targets)."""
    n, lo, hi = _minmax_count(ds, col)
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                             "value": pd.Series([np.nan] * len(qs))})
    rns = [float(q) * (n - 1) for q in qs]
    need = sorted({r for rn in rns for r in (int(math.floor(rn)), int(math.ceil(rn)))})
    vals = _resolve_ranks(ds, col, need, n, lo, hi, n_bins, gather_limit,
                          max_rounds)
    at = dict(zip(need, vals))
    out = []
    for rn in rns:
        frn, crn = math.floor(rn), math.ceil(rn)
        if frn == crn:
            out.append(at[int(frn)])
        else:
            out.append((crn - rn) * at[int(frn)] + (rn - frn) * at[int(crn)])
    return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                         "value": pd.Series(out, dtype=np.float64)})


def quantile_disc_by_group(ds, key: str, col: str, qs: list[float],
                           n_buckets: int = 64):
    """Per-group discrete quantiles (same ceil(q*n)-1 rank rule as
    ``quantile_disc``) for HIGH-CARDINALITY group keys: one coarse-bucket
    shuffle co-locates each key's rows, then one sort + vectorized rank
    pick per bucket — no per-key Python, no global sort.

    Precondition: one KEY's rows fit in a bucket worker (keys partition
    the data; buckets only pack whole keys together).  For a handful of
    giant groups, run the streaming ``quantile_disc`` per group instead —
    this operator is the wide-key complement.  Returns a Ray Dataset of
    (key, q, value) rows.
    """
    qarr = np.asarray(qs, dtype=np.float64)

    def bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(batch[key]), categorize=False)
        return pa.table({
            key: batch[key],
            col: batch[col],
            "bkt": pa.array((h % np.uint64(n_buckets)).astype(np.int64),
                            pa.int64()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, col], kind="stable")
        keys = g[key].to_numpy()
        vals = g[col].to_numpy(np.float64)
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, len(g)])
        # rank rule per group x quantile, fully vectorized:
        # idx = start + clip(ceil(q*n) - 1, 0, n-1)
        ranks = np.ceil(qarr[None, :] * lens[:, None]).astype(np.int64) - 1
        ranks = np.clip(ranks, 0, (lens - 1)[:, None])
        pick = starts[:, None] + ranks
        return pd.DataFrame({
            key: np.repeat(keys[starts], len(qarr)),
            "q": np.tile(qarr, len(starts)),
            "value": vals[pick.ravel()],
        })

    parts = (
        ds.select_columns([key, col])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: per_bucket(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )
    return parts


def mad_by_group(ds, key: str, col: str, n_buckets: int = 64) -> pd.DataFrame:
    """Grouped MEDIAN ABSOLUTE DEVIATION (the robust dispersion statistic)
    — exact, in two passes of the same machinery:

    1. exact per-group discrete medians (``quantile_disc_by_group``,
       ceil(q*n)-1 rank rule);
    2. the small (one row per distinct key) median table broadcasts via
       ``ray.put``; a streaming map attaches |x - median(group)| by
       searchsorted (no shuffle); a second grouped median over the
       deviations is the MAD.

    Exactness: a DISC median is an order statistic — an actual stored
    float, never an average — so both medians, the subtraction and the
    abs are reproducible IEEE ops, and results hash-compare against
    DuckDB's quantile_disc/abs chain without tolerance.  Driver state is
    one row per distinct key (the by_group precondition already bounds
    this).  Returns (key, median, mad) rows."""
    import pyarrow.compute as pc
    import ray

    med = quantile_disc_by_group(ds, key, col, [0.5], n_buckets).to_pandas()
    mk = med[key].to_numpy()
    mv = med["value"].to_numpy(np.float64)
    order = np.argsort(mk)
    mk, mv = mk[order], mv[order]
    ref = ray.put((mk, mv)) if ray.is_initialized() else (mk, mv)

    def dev(batch: pa.Table) -> pa.Table:
        kk, vv = ray.get(ref) if ray.is_initialized() else ref
        keys = np.asarray(batch[key])
        m = vv[np.searchsorted(kk, keys)]
        x = np.asarray(pc.cast(batch[col], pa.float64()), dtype=np.float64)
        return pa.table({key: batch[key],
                         "dev": pa.array(np.abs(x - m), pa.float64())})

    dv = ds.select_columns([key, col]).map_batches(
        dev, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())
    mad = (quantile_disc_by_group(dv, key, "dev", [0.5], n_buckets)
           .to_pandas().rename(columns={"value": "mad"}))
    out = med.rename(columns={"value": "median"})[[key, "median"]].merge(
        mad[[key, "mad"]], on=key)
    return out.sort_values(key).reset_index(drop=True)


def boxplot(ds, col: str, n_bins: int = 4096,
            gather_limit: int = 2_000_000) -> pd.DataFrame:
    """ES ``boxplot`` aggregation — EXACT, where ES itself settles for a
    TDigest sketch (reference analogue: the corpus statistics family,
    SURVEY §2 G5).  One row: (n, min, max, q1, q2, q3, lo_whisker,
    hi_whisker) with interpolated quartiles (``quantile_cont``
    semantics), Tukey fences ``q1 - 1.5*IQR`` / ``q3 + 1.5*IQR``, and
    whiskers = the smallest stored value >= the lower fence / the
    largest stored value <= the upper fence.

    Scale shape: three bounded streaming passes — min/max/count,
    histogram-refinement quartiles (O(bins) driver state), and ONE
    combiner pass for both whiskers (per-batch conditional min/max,
    driver reduces a row per block).  Nothing materializes.

    Exactness: quartiles interpolate with the same float association
    DuckDB's quantile_cont evaluates; the fence arithmetic is two IEEE
    ops on identical operands; whiskers are actual stored values — so
    e6 publications hash-compare against SQL without tolerance."""
    n, vmin, vmax = _minmax_count(ds, col)
    cols = ["n", "min", "max", "q1", "q2", "q3", "lo_whisker", "hi_whisker"]
    if n == 0:
        return pd.DataFrame({c: pd.Series([0 if c == "n" else np.nan])
                             for c in cols})
    q = quantile_cont(ds, col, [0.25, 0.5, 0.75], n_bins, gather_limit)
    q1, q2, q3 = (float(v) for v in q["value"])
    iqr = q3 - q1
    lo_fence = q1 - 1.5 * iqr
    hi_fence = q3 + 1.5 * iqr

    def whisk(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[col], dtype=np.float64)
        wl = a[a >= lo_fence]
        wh = a[a <= hi_fence]
        if len(wl) == 0 and len(wh) == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({
            "lo": pa.array([float(wl.min()) if len(wl) else np.inf],
                           pa.float64()),
            "hi": pa.array([float(wh.max()) if len(wh) else -np.inf],
                           pa.float64())})

    w = ds.select_columns([col]).map_batches(
        whisk, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte()).to_pandas()
    lo_w = float(w["lo"].min()) if len(w) else np.nan
    hi_w = float(w["hi"].max()) if len(w) else np.nan
    return pd.DataFrame({"n": pd.Series([n], dtype=np.int64),
                         "min": [vmin], "max": [vmax],
                         "q1": [q1], "q2": [q2], "q3": [q3],
                         "lo_whisker": [lo_w], "hi_whisker": [hi_w]})

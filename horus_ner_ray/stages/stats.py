"""Exact distributed second-moment statistics: per-group variance /
stddev and Pearson correlation.

Reference analogue: the reference's per-class score statistics and
confidence aggregation (SURVEY.md G3/G5; reference src/eval.py:67-134
reduces per-class counts; simple_indicators/report.py:17-50 averages
scores) — here the moment family is a first-class exact operator.

Why not float sums: a distributed ``sum(x*x)`` in float64 depends on block
arrival order (non-associative rounding), so an e6-published result can
flip vs a SQL oracle.  Instead every value is fixed-point-quantized to
int64 and all five sufficient statistics (n, Sx, Sy, Sxx, Syy, Sxy) are
accumulated in EXACT integer domains:

- products that fit comfortably (x*y of bounded scales) sum as int64;
- squares are SPLIT base 2**30 into (hi, lo) int64 columns before the
  global sum, so ``sum(x*x)`` never overflows int64 for any group up to
  ~2**33 rows (documented bound; the recombine ``hi*2**30 + lo`` happens
  in Python big-int space on the tiny reduced table).

The finishing formulas convert the exact integer statistics to float64 at
fixed points mirrored verbatim by the DuckDB oracle (HUGEINT sums, CAST to
DOUBLE at the same parentheses), so e6 publications hash-match bit-for-bit.

Distribution shape: ONE streaming ``map_batches`` combiner emits a partial
row per (key, batch) — a hot key costs one row per batch, never a hot
group — followed by a small ``groupby(key).sum`` and an O(groups) finish.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte

_SPLIT = 1 << 30


def _quant(col, scale: int) -> np.ndarray:
    """floor(x * scale + 0.5) as int64 — the shared oracle quantizer."""
    x = np.asarray(col, dtype=np.float64)
    return np.floor(x * scale + 0.5).astype(np.int64)


def grouped_moment_sums(ds, key_col: str, x_col: str, y_col: str,
                        x_scale: int = 1, y_scale: int = 1):
    """Dataset -> Dataset of exact per-key sufficient statistics:
    ``(key, n, sx, sy, sxx_hi, sxx_lo, syy_hi, syy_lo, sxy_hi, sxy_lo)``.

    All columns are int64; squares/products are split base 2**30 so the
    global integer sums are exact (and therefore order-free) for any group
    up to ~2**33 rows at |x*scale|, |y*scale| < 2**24.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        xq = _quant(batch[x_col], x_scale)
        yq = xq if y_col == x_col and y_scale == x_scale \
            else _quant(batch[y_col], y_scale)
        keys = batch[key_col].to_pandas().to_numpy()
        df = pd.DataFrame({"k": keys})
        prods = {"sxx": xq * xq, "syy": yq * yq, "sxy": xq * yq}
        df["n"] = np.int64(1)
        df["sx"] = xq
        df["sy"] = yq
        for name, p in prods.items():
            df[f"{name}_hi"] = p >> 30
            df[f"{name}_lo"] = p & (_SPLIT - 1)
        g = df.groupby("k", sort=False).sum().reset_index()
        cols = {key_col: pa.array(g["k"])}
        for c in g.columns[1:]:
            cols[c] = pa.array(g[c].to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    stat_cols = ["n", "sx", "sy", "sxx_hi", "sxx_lo", "syy_hi", "syy_lo",
                 "sxy_hi", "sxy_lo"]
    return (
        ds.select_columns(list(dict.fromkeys([key_col, x_col, y_col])))
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c) for c in stat_cols])
    )


def _recombine(df: pd.DataFrame, name: str) -> list[int]:
    """Exact big-int totals from the split sums (Python ints, no overflow)."""
    hi = df[f"{name}_hi"].astype(object).tolist()
    lo = df[f"{name}_lo"].astype(object).tolist()
    return [int(h) * _SPLIT + int(l) for h, l in zip(hi, lo)]


def grouped_variance(ds, key_col: str, x_col: str, scale: int = 1,
                     out_prefix: str = "x"):
    """Per-key count / mean / population variance / stddev of the quantized
    column, published as e6 ints: mean_e6 = floor(sx/n * 1e6 + 0.5) etc.
    Float conversions mirror the SQL oracle's CAST(... AS DOUBLE) points:
    variance = double(n*sxx - sx*sx) / double(n*n)."""
    sums = grouped_moment_sums(ds, key_col, x_col, x_col,
                               x_scale=scale, y_scale=scale).to_pandas()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = [int(v) for v in df["n"].tolist()]
        sx = [int(v) for v in df["sx"].tolist()]
        sxx = _recombine(df, "sxx")
        s = float(scale)
        mean_e6, var_e6, std_e6 = [], [], []
        for ni, sxi, sxxi in zip(n, sx, sxx):
            mean = float(sxi) / float(ni) / s
            var = float(ni * sxxi - sxi * sxi) / float(ni * ni) / (s * s)
            mean_e6.append(math.floor(mean * 1e6 + 0.5))
            var_e6.append(math.floor(var * 1e6 + 0.5))
            std_e6.append(math.floor(math.sqrt(var) * 1e6 + 0.5))
        return pd.DataFrame({
            key_col: df[key_col],
            "n_rows": np.array(n, dtype=np.int64),
            f"{out_prefix}_mean_e6": np.array(mean_e6, dtype=np.int64),
            f"{out_prefix}_var_e6": np.array(var_e6, dtype=np.int64),
            f"{out_prefix}_std_e6": np.array(std_e6, dtype=np.int64),
        })

    return finish(sums)


def grouped_corr(ds, key_col: str, x_col: str, y_col: str,
                 x_scale: int = 1, y_scale: int = 1):
    """Per-key Pearson correlation of the two quantized columns, published
    as corr_e6 (0 when either side is constant — mirrored by the oracle's
    CASE).  r = double(n*sxy - sx*sy)
              / (sqrt(double(n*sxx - sx*sx)) * sqrt(double(n*syy - sy*sy)))
    with each parenthesized factor exact-integer before the cast."""
    sums = grouped_moment_sums(ds, key_col, x_col, y_col,
                               x_scale=x_scale, y_scale=y_scale).to_pandas()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = [int(v) for v in df["n"].tolist()]
        sx = [int(v) for v in df["sx"].tolist()]
        sy = [int(v) for v in df["sy"].tolist()]
        sxx, syy, sxy = (_recombine(df, c) for c in ("sxx", "syy", "sxy"))
        corr_e6 = []
        for ni, sxi, syi, sxxi, syyi, sxyi in zip(n, sx, sy, sxx, syy, sxy):
            num = ni * sxyi - sxi * syi
            dx = ni * sxxi - sxi * sxi
            dy = ni * syyi - syi * syi
            if dx <= 0 or dy <= 0:
                corr_e6.append(0)
                continue
            r = float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
            corr_e6.append(math.floor(r * 1e6 + 0.5))
        return pd.DataFrame({
            key_col: df[key_col],
            "n_rows": np.array(n, dtype=np.int64),
            "corr_e6": np.array(corr_e6, dtype=np.int64),
        })

    return finish(sums)


def value_histogram(ds, col: str, bin_width: float):
    """Fixed-width histogram: -> Dataset (bin_idx, bin_lo_e6, n_rows).

    ``bin_idx = floor(x / bin_width)`` in float64 — the identical single
    division+floor the SQL oracle states, so bucket boundaries agree
    bitwise.  Per-batch combiner (one row per occupied bin per batch);
    the global groupby moves O(occupied bins) rows.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    w = float(bin_width)

    def partial(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch[col], dtype=np.float64)
        idx = np.floor(x / w).astype(np.int64)
        u, c = np.unique(idx, return_counts=True)
        return pa.table({"bin_idx": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    out = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bin_idx").aggregate(Sum("n", alias_name="n_rows"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        bi = np.asarray(batch["bin_idx"], dtype=np.int64)
        lo = np.floor(bi.astype(np.float64) * w * 1e6 + 0.5).astype(np.int64)
        return pa.table({"bin_idx": batch["bin_idx"],
                         "bin_lo_e6": pa.array(lo, pa.int64()),
                         "n_rows": batch["n_rows"]})

    return out.map_batches(finish, batch_format="pyarrow", runtime_env=_rte())


def grouped_zscore(ds, key_col: str, x_col: str, id_cols: list[str],
                   scale: int = 1, out_col: str = "z_e6"):
    """Per-row z-score normalization within each ``key_col`` group — the
    feature-scaling staple of a training-data pipeline, with the hash-exact
    arithmetic of this module: z = (n*xq - Sx) / sqrt(n*Sxx - Sx^2) over
    the EXACT integer sufficient statistics (both numerator and the sqrt
    argument are exact integers, so the only float ops are one int->double
    conversion on each side and one divide — mirrored verbatim by the
    DuckDB oracle's HUGEINT/CAST-AS-DOUBLE points, giving bitwise-equal
    doubles).  Zero-variance groups emit 0.

    Two streaming passes: the moment-sums combiner (tiny reduced table,
    O(groups) driver state — documented bound), then a broadcast
    (ray.put) of the per-group (n, Sx, den) arrays and a vectorized
    searchsorted map_batches over the corpus.  Overflow guard: the per-row
    numerator n*xq stays in int64; the stage raises when
    max(n)*max|xq| could exceed 2^62 (escalate by lowering ``scale``).
    """
    import ray
    from horus_ner_ray.stages.dedupe import _resolve_ref

    sums = grouped_moment_sums(ds, key_col, x_col, x_col,
                               x_scale=scale, y_scale=scale).to_pandas()
    order = np.argsort(np.asarray(sums[key_col]))
    keys = np.asarray(sums[key_col])[order]
    n = sums["n"].to_numpy(np.int64)[order]
    sx = sums["sx"].to_numpy(np.int64)[order]
    sxx = [_recombine(sums, "sxx")[i] for i in order]
    den = np.array(
        [math.sqrt(float(ni * sxxi - sxi * sxi)) if ni * sxxi - sxi * sxi > 0
         else 0.0
         for ni, sxi, sxxi in zip(n.tolist(), sx.tolist(), sxx)],
        dtype=np.float64,
    )
    ref = ray.put((keys, n, sx, den))

    def fn(batch: pa.Table) -> pa.Table:
        keys_b, n_b, sx_b, den_b = _resolve_ref(ref)
        xq = _quant(batch[x_col], scale)
        if len(xq) and int(n_b.max()) * int(np.abs(xq).max()) >= (1 << 62):
            raise OverflowError(
                "grouped_zscore numerator would overflow int64; lower scale")
        g = np.asarray(batch[key_col])
        j = np.searchsorted(keys_b, g)
        num = n_b[j] * xq - sx_b[j]
        d = den_b[j]
        z = np.where(d > 0, num.astype(np.float64) / np.where(d > 0, d, 1.0), 0.0)
        cols = {c: batch[c] for c in id_cols}
        cols[out_col] = pa.array(
            np.floor(z * 1e6 + 0.5).astype(np.int64), pa.int64())
        return pa.table(cols)

    return (
        ds.select_columns(list(dict.fromkeys([*id_cols, key_col, x_col])))
        .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
    )


def matrix_stats(ds, cols: list[str], scales: list[int]) -> pd.DataFrame:
    """ES ``matrix_stats`` aggregation over numeric columns — the full
    pairwise covariance / correlation matrix from ONE streaming scan.

    Every column quantizes to int64 (its own fixed-point scale); a single
    combiner pass accumulates n, per-column sums, and hi/lo-split sums of
    ALL C(k+1, 2) pair products, so the corpus is read once no matter how
    many columns.  Returns one row per ordered pair (i <= j):

        (col_x, col_y, n_rows, mean_x_e6, mean_y_e6, cov_e6, corr_e6)

    cov  = double(n*sxy - sx*sy) / double(n*n) / (scale_x * scale_y)
    corr = double(n*sxy - sx*sy)
           / (sqrt(double(n*sxx - sx*sx)) * sqrt(double(n*syy - sy*sy)))
    (0 when either side is constant) — the exact-integer-then-CAST points
    the SQL oracle mirrors.  Population (not sample) covariance, like the
    grouped_variance family."""
    from ray.data.aggregate import Sum

    k = len(cols)
    if k != len(scales) or k < 1:
        raise ValueError("cols and scales must align and be non-empty")
    pairs = [(i, j) for i in range(k) for j in range(i, k)]

    def partial(batch: pa.Table) -> pa.Table:
        qs = [_quant(batch[c], s) for c, s in zip(cols, scales)]
        row: dict[str, list[int]] = {"n": [len(qs[0])]}
        for i in range(k):
            row[f"s{i}"] = [int(qs[i].sum())]
        for i, j in pairs:
            p = qs[i] * qs[j]
            row[f"p{i}_{j}_hi"] = [int((p >> 30).sum())]
            row[f"p{i}_{j}_lo"] = [int((p & (_SPLIT - 1)).sum())]
        return pa.table({c: pa.array(v, pa.int64()) for c, v in row.items()})

    stat_cols = (["n"] + [f"s{i}" for i in range(k)]
                 + [f"p{i}_{j}_{h}" for i, j in pairs for h in ("hi", "lo")])
    sums = (ds.select_columns(list(dict.fromkeys(cols)))
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte())
            .sum(stat_cols))
    n = int(sums["sum(n)"])
    s = [int(sums[f"sum(s{i})"]) for i in range(k)]
    prod = {(i, j): int(sums[f"sum(p{i}_{j}_hi)"]) * _SPLIT
            + int(sums[f"sum(p{i}_{j}_lo)"]) for i, j in pairs}
    out = {c: [] for c in ("col_x", "col_y", "n_rows", "mean_x_e6",
                           "mean_y_e6", "cov_e6", "corr_e6")}
    for i, j in pairs:
        num = n * prod[(i, j)] - s[i] * s[j]
        dx = n * prod[(i, i)] - s[i] * s[i]
        dy = n * prod[(j, j)] - s[j] * s[j]
        cov = float(num) / float(n * n) / (float(scales[i]) * float(scales[j]))
        if dx <= 0 or dy <= 0:
            corr = None
        else:
            corr = float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
        out["col_x"].append(cols[i])
        out["col_y"].append(cols[j])
        out["n_rows"].append(n)
        out["mean_x_e6"].append(math.floor(
            float(s[i]) / float(n) / float(scales[i]) * 1e6 + 0.5))
        out["mean_y_e6"].append(math.floor(
            float(s[j]) / float(n) / float(scales[j]) * 1e6 + 0.5))
        out["cov_e6"].append(math.floor(cov * 1e6 + 0.5))
        out["corr_e6"].append(0 if corr is None
                              else math.floor(corr * 1e6 + 0.5))
    df = pd.DataFrame(out)
    for c in ("n_rows", "mean_x_e6", "mean_y_e6", "cov_e6", "corr_e6"):
        df[c] = df[c].astype(np.int64)
    return df


def grouped_skew_kurt(ds, key_col: str, x_col: str,
                      scale: int = 1) -> pd.DataFrame:
    """Per-key population SKEWNESS and (excess) KURTOSIS from exact
    integer raw moments — the 3rd/4th-moment completion of the
    variance/corr family: one combiner scan accumulates s1..s4 with
    every power SPLIT base 2**30 into (hi2, hi1, lo) int64 columns
    (exact for |x*scale| < 2**15 and groups to ~2**33 rows — documented
    bound, like grouped_moment_sums'), recombined as Python big ints.

        m2 = (n*s2 - s1^2) / n^2                     [exact int num]
        m3 = (n^2*s3 - 3n*s1*s2 + 2*s1^3) / n^3      [exact int num]
        m4 = (n^3*s4 - 4n^2*s1*s3 + 6n*s1^2*s2 - 3*s1^4) / n^4
        skew = m3 / m2**1.5        kurt = m4 / m2^2 - 3

    published as skew_e6 / kurt_e6 (0 when m2 <= 0); float conversions
    happen only in the O(groups) finish at the exact points the SQL
    oracle mirrors (libm pow on both sides)."""
    from ray.data.aggregate import Sum

    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    B = 1 << 30

    def partial(batch: pa.Table) -> pa.Table:
        xq = _quant(batch[x_col], scale)
        if np.abs(xq).max(initial=0) >= (1 << 15):
            raise ValueError(
                "grouped_skew_kurt documented bound exceeded: "
                "|x*scale| must be < 2**15")
        keys = batch[key_col].to_pandas().to_numpy()
        df = pd.DataFrame({"k": keys})
        df["n"] = np.int64(1)
        df["s1"] = xq
        for mi, p in (("s2", xq * xq), ("s3", xq * xq * xq),
                      ("s4", (xq * xq) * (xq * xq))):
            df[f"{mi}_h2"] = p >> 60
            df[f"{mi}_h1"] = (p >> 30) & (B - 1)
            df[f"{mi}_lo"] = p & (B - 1)
        g = df.groupby("k", sort=False).sum().reset_index()
        cols = {key_col: pa.array(g["k"])}
        for c in g.columns[1:]:
            cols[c] = pa.array(g[c].to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    stat_cols = ["n", "s1"] + [f"{m}_{h}" for m in ("s2", "s3", "s4")
                               for h in ("h2", "h1", "lo")]
    sums = (ds.select_columns([key_col, x_col])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte())
            .groupby(key_col)
            .aggregate(*[Sum(c, alias_name=c) for c in stat_cols])
            .to_pandas())

    def recomb(row, m):
        return (int(row[f"{m}_h2"]) * (B * B) + int(row[f"{m}_h1"]) * B
                + int(row[f"{m}_lo"]))

    out = {key_col: [], "n_rows": [], "skew_e6": [], "kurt_e6": []}
    for _i, row in sums.iterrows():
        n, s1 = int(row["n"]), int(row["s1"])
        s2, s3, s4 = (recomb(row, m) for m in ("s2", "s3", "s4"))
        num2 = n * s2 - s1 * s1
        num3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        num4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
                + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        out[key_col].append(row[key_col])
        out["n_rows"].append(n)
        if num2 <= 0:
            out["skew_e6"].append(0)
            out["kurt_e6"].append(0)
            continue
        # scale cancels in both ratios (homogeneous) — compute in the
        # quantized domain, the SQL's exact float points
        m2 = float(num2) / float(n * n)
        m3 = float(num3) / float(n ** 3)
        m4 = float(num4) / float(n ** 4)
        out["skew_e6"].append(math.floor(m3 / m2 ** 1.5 * 1e6 + 0.5))
        out["kurt_e6"].append(math.floor((m4 / (m2 * m2) - 3.0)
                                         * 1e6 + 0.5))
    df = pd.DataFrame(out)
    for c in ("n_rows", "skew_e6", "kurt_e6"):
        df[c] = df[c].astype(np.int64)
    return df


def profile_columns(ds, cols: list[str]) -> pd.DataFrame:
    """Data-profiling report — per column: row count, null count, EXACT
    distinct count.  The ETL pre-flight every pipeline runs before
    trusting a new table.

    Shape: TWO passes total regardless of column count — one combiner
    scan tallies rows/nulls for every column at once, and one scan emits
    each batch's per-column DISTINCT values as (column, value) pairs so
    a single two-key groupby (distinct-bounded partials, never raw
    rows) followed by a per-column count yields exact cardinalities."""
    from ray.data.aggregate import Sum

    if not cols:
        raise ValueError("cols must be non-empty")

    def counts_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        row = {"n": pa.array([len(batch)], pa.int64())}
        for c in cols:
            row[f"nn_{c}"] = pa.array(
                [int(pc.sum(pc.is_null(batch[c])).as_py() or 0)],
                pa.int64())
        return pa.table(row)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            a = batch[c]
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            u = a.drop_null().unique().cast(pa.string())
            names.append(np.repeat(np.array([c], dtype=object), len(u)))
            vals.append(np.asarray(u, dtype=object))
        return pa.table({
            "column": pa.array(np.concatenate(names), pa.string()),
            "v": pa.array(np.concatenate(vals), pa.string()),
        })

    keep = list(dict.fromkeys(cols))
    tallies = (ds.select_columns(keep)
               .map_batches(counts_partial, batch_format="pyarrow",
                            zero_copy_batch=True, runtime_env=_rte())
               .sum(["n"] + [f"nn_{c}" for c in cols]))
    nd = (ds.select_columns(keep)
          .map_batches(distinct_partial, batch_format="pyarrow",
                       zero_copy_batch=True, runtime_env=_rte())
          .groupby(["column", "v"]).count()
          .groupby("column").count().to_pandas())
    nd_map = dict(zip(nd["column"], nd["count()"]))
    df = pd.DataFrame({
        "column": cols,
        "n_rows": [int(tallies["sum(n)"])] * len(cols),
        "n_null": [int(tallies[f"sum(nn_{c})"]) for c in cols],
        "n_distinct": [int(nd_map.get(c, 0)) for c in cols],
    })
    for c2 in ("n_rows", "n_null", "n_distinct"):
        df[c2] = df[c2].astype(np.int64)
    return df


def winsorized_mean(ds, col: str, scale: int = 100,
                    p_lo: float = 0.0625, p_hi: float = 0.9375) -> dict:
    """Robust (winsorized) mean: values quantize to ints, clip at the
    EXACT percentile_disc bounds (the distributed histogram-refinement
    quantiles — values never leave their shards), then ONE combiner scan
    sums the clipped integers exactly.  Returns
    {n, lo, hi, mean_e6} with mean_e6 = floor(S / n / scale * 1e6 +
    0.5).  Default percentiles are BINARY-EXACT (1/16, 15/16) so the
    float rank ceil(q*n) equals the SQL oracle's integer (k*n+15)//16
    at every n."""
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages.quantiles import quantile_disc

    if not (0.0 <= p_lo < p_hi <= 1.0):
        raise ValueError("need 0 <= p_lo < p_hi <= 1")

    def quant(batch: pa.Table) -> pa.Table:
        return pa.table({"qv": pa.array(_quant(batch[col], scale),
                                        pa.int64())})

    qds = ds.select_columns([col]).map_batches(
        quant, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())
    b = quantile_disc(qds, "qv", [p_lo, p_hi])
    lo = int(b["value"].iloc[0])
    hi = int(b["value"].iloc[1])

    def clipped(batch: pa.Table) -> pa.Table:
        v = np.clip(np.asarray(batch["qv"], dtype=np.int64), lo, hi)
        return pa.table({"s": pa.array([int(v.sum())], pa.int64()),
                         "n": pa.array([len(v)], pa.int64())})

    t = qds.map_batches(clipped, batch_format="pyarrow",
                        runtime_env=_rte()).sum(["s", "n"])
    s, n = int(t["sum(s)"]), int(t["sum(n)"])
    mean_e6 = (math.floor(s / n / float(scale) * 1e6 + 0.5) if n else 0)
    return {"n": n, "lo": lo, "hi": hi, "mean_e6": mean_e6}


def welch_ttest(ds, key_col: str, x_col: str, group_a, group_b,
                scale: int = 100) -> dict:
    """ES ``t_test`` aggregation, heteroscedastic (Welch) flavor — EXACT
    sufficient statistics, deterministic float tail (reference analogue:
    the per-class score statistics family, SURVEY §2 G5).

    One streaming combiner pass (``grouped_moment_sums``) accumulates the
    two groups' (n, Sx, Sxx) in exact split-integer domains; the finish
    evaluates, in Python-bigint-then-float64 steps mirrored verbatim by
    the SQL oracle's HUGEINT/DOUBLE casts:

        A_g = (n*Sxx - Sx^2) / (n^2 * (n-1))      # s_g^2 / n_g (quantized)
        md  = (Sa*nb - Sb*na) / (na*nb)           # mean_a - mean_b
        t   = md / sqrt(Aa + Ab)
        df  = (Aa+Ab)^2 / (Aa^2/(na-1) + Ab^2/(nb-1))   # Welch-Satterthwaite

    Every division is ONE float op on exactly-representable integer
    operands (both sides correctly round the same bigints), so t/df
    publish e6-hash-stable.  The quantization scale cancels in t and df.
    Returns {n_a, n_b, t, df}."""
    sums = grouped_moment_sums(ds, key_col, x_col, x_col,
                               x_scale=scale, y_scale=scale).to_pandas()
    sxx = _recombine(sums, "sxx")
    recs = {k: (int(n), int(sx), int(q))
            for k, n, sx, q in zip(sums[key_col], sums["n"], sums["sx"], sxx)}
    if group_a not in recs or group_b not in recs:
        raise ValueError(f"group missing from {sorted(recs)}")
    na, sa, qa = recs[group_a]
    nb, sb, qb = recs[group_b]
    if na < 2 or nb < 2:
        raise ValueError("Welch t-test needs n >= 2 per group")
    a_a = float(na * qa - sa * sa) / float(na * na * (na - 1))
    a_b = float(nb * qb - sb * sb) / float(nb * nb * (nb - 1))
    md = float(sa * nb - sb * na) / float(na * nb)
    t = md / math.sqrt(a_a + a_b)
    dof = ((a_a + a_b) * (a_a + a_b)
           / (a_a * a_a / float(na - 1) + a_b * a_b / float(nb - 1)))
    return {"n_a": na, "n_b": nb, "t": t, "df": dof}


def grouped_robust_scale(ds, key_col: str, x_col: str, id_cols: list[str],
                         out_col: str = "r_e6"):
    """Per-row ROBUST scaling within each group — (x - median) / MAD, the
    outlier-resistant complement to ``grouped_zscore`` (sklearn
    RobustScaler with the disc-median centering of quantiles.mad_by_group).

    median and MAD are exact order statistics (STORED float values, never
    averages — stages/quantiles.mad_by_group), so the per-row expression
    is three IEEE ops (subtract, divide, e6 floor) both sides compute
    identically.  Zero-MAD groups emit 0.  One broadcast of the tiny
    per-group table + one vectorized streaming pass.
    """
    import ray

    from horus_ner_ray.stages.dedupe import _resolve_ref
    from horus_ner_ray.stages.quantiles import mad_by_group

    mm = mad_by_group(ds, key_col, x_col)
    order = np.argsort(mm[key_col].to_numpy())
    keys = mm[key_col].to_numpy()[order]
    med = mm["median"].to_numpy(np.float64)[order]
    mad = mm["mad"].to_numpy(np.float64)[order]
    ref = ray.put((keys, med, mad)) if ray.is_initialized() \
        else (keys, med, mad)

    def fn(batch: pa.Table) -> pa.Table:
        keys_b, med_b, mad_b = _resolve_ref(ref)
        x = np.asarray(batch[x_col], dtype=np.float64)
        g = np.asarray(batch[key_col])
        j = np.searchsorted(keys_b, g)
        d = mad_b[j]
        r = np.where(d > 0, (x - med_b[j]) / np.where(d > 0, d, 1.0), 0.0)
        cols = {c: batch[c] for c in id_cols}
        cols[out_col] = pa.array(
            np.floor(r * 1e6 + 0.5).astype(np.int64), pa.int64())
        return pa.table(cols)

    return (
        ds.select_columns(list(dict.fromkeys([*id_cols, key_col, x_col])))
        .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
    )

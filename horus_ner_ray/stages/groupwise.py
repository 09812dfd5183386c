"""Group-wise top-k and deterministic stratified sampling (SURVEY.md §2.5
T1/T4 generalized beyond the query engine's per-shard heaps).

Reference analogue: the per-term evidence ranking keeps the top results per
term/modality (reference: src/core/feature_extraction/features.py:288,423 —
``tot_resources`` caps results per term), i.e. a group-wise top-k.  Here the
operator is generic over any (key, order) pair.

Scale shape — the three-layer pattern every wide stage in this repo uses:

1. **Combiner pre-reduction** inside ``map_batches``: each batch keeps at
   most k rows per key it sees, so the shuffle moves O(keys_in_batch * k)
   rows, not the whole table.  Correct because a group's global top-k rows
   are top-k within every subset that contains them.
2. **Coarse-bucket shuffle**: one groupby on ``hash(key) % n_buckets`` —
   O(buckets) Python group calls, never O(keys) (per-tiny-group
   ``map_groups`` measured ~100x slower; see CLAUDE.md).
3. **Vectorized intra-bucket finish**: one sort + C-speed
   ``groupby(key).cumcount() < k`` mask; no per-key Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from horus_ner_ray.util import worker_runtime_env as _rte

_MIX = np.uint64(0x9E3779B97F4A7C15)

# Multiplier for the deterministic sampling hash, shared VERBATIM with the
# DuckDB oracle SQL in __ray_entry__ (Knuth multiplicative).  The id bound
# below keeps id * MULT inside int64 so numpy and DuckDB compute the same
# product with no wrapping; change both or neither.
SAMPLE_HASH_MULT = 2654435761
SAMPLE_HASH_MOD = 2147483647
SAMPLE_ID_MAX = (2**63 - 1) // SAMPLE_HASH_MULT  # ~3.47e9


def _take_topk(df: pd.DataFrame, key: str, sort_cols: list[str],
               ascending: list[bool], k: int) -> pd.DataFrame:
    d = df.sort_values(sort_cols, ascending=ascending, kind="stable")
    return d[d.groupby(key, sort=False).cumcount() < k]


def topk_per_group(ds, key: str, sort_cols: list[str],
                   ascending: list[bool] | None = None, k: int = 10,
                   n_buckets: int = 64):
    """Top-k rows per ``key`` under (sort_cols, ascending) order.

    Ties at the rank-k boundary: make the LAST sort col a unique
    tiebreaker (an id) or the kept rows are order-dependent.
    """
    asc = ascending if ascending is not None else [True] * len(sort_cols)

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        out = _take_topk(batch, key, sort_cols, asc, k).copy()
        h = out[key].to_numpy()
        h = pd.util.hash_array(
            h if h.dtype != object else h.astype(object), categorize=False)
        out["__bkt"] = ((h * _MIX) % np.uint64(n_buckets)).astype(np.int64)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return _take_topk(g, key, sort_cols, asc, k).drop(columns="__bkt")

    return (
        ds.map_batches(pre, batch_format="pandas", runtime_env=_rte())
        .groupby("__bkt")
        .map_groups(finish, batch_format="pandas", runtime_env=_rte())
    )


def stratified_sample(ds, key: str, id_col: str, n_per_group: int,
                      n_buckets: int = 64):
    """Deterministic stratified sample: ``n_per_group`` rows per ``key``,
    chosen by a fixed multiplicative hash of ``id_col`` (order- and
    layout-independent, reproducible, SQL-expressible — the same property
    ``functions.sampling.hash_split`` gives train/test splits).

    ``id_col`` must be int64 in [0, SAMPLE_ID_MAX] (~3.47e9): beyond that
    ``id * MULT`` overflows int64, where numpy wraps silently while SQL
    errors — the two engines would diverge.
    """
    def add_h(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() > SAMPLE_ID_MAX):
            raise ValueError(
                f"stratified_sample ids in '{id_col}' must be in "
                f"[0, {SAMPLE_ID_MAX}] so id * {SAMPLE_HASH_MULT} stays "
                "inside int64 (the SQL-shared hash)")
        batch = batch.copy()
        batch["__h"] = (ids * SAMPLE_HASH_MULT) % SAMPLE_HASH_MOD
        return batch

    out = topk_per_group(
        ds.map_batches(add_h, batch_format="pandas", runtime_env=_rte()),
        key=key, sort_cols=["__h", id_col], ascending=[True, True],
        k=n_per_group, n_buckets=n_buckets,
    )
    return out.map_batches(lambda b: b.drop(columns="__h"),
                           batch_format="pandas", runtime_env=_rte())


def _sum_col_name(value_scale: int) -> str:
    return {100: "sum_e2", 1_000_000: "sum_e6"}.get(int(value_scale),
                                                    "sum_s")


def _grouped_sum_fine(ds, group_cols: list[str], value_col: str,
                      value_scale: int, sum_col: str):
    """ONE corpus scan -> finest-level (group_cols, n_rows, sum) table via
    a per-batch combiner + a single groupby (shared by rollup/cube)."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(group_cols).to_pandas()
        v = np.asarray(batch[value_col], dtype=np.float64)
        df["_s"] = np.floor(v * value_scale + 0.5).astype(np.int64)
        df["_n"] = np.int64(1)
        g = df.groupby(group_cols, sort=False).sum().reset_index()
        cols = {c: pa.array(g[c]) for c in group_cols}
        cols["n_rows"] = pa.array(g["_n"].to_numpy(np.int64), pa.int64())
        cols[sum_col] = pa.array(g["_s"].to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    aggs = [Sum("n_rows", alias_name="n_rows"),
            Sum(sum_col, alias_name=sum_col)]
    fine = (
        ds.select_columns(list(dict.fromkeys([*group_cols, value_col])))
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby(group_cols).aggregate(*aggs)
    )
    return fine, aggs


def _fill_missing(group_cols: list[str], missing: list[str], sum_col: str,
                  all_label: str):
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        for c in missing:
            batch = batch.append_column(
                c, pa.array([all_label] * n, pa.string()))
        return batch.select([*group_cols, "n_rows", sum_col])
    return fn


def _regroup(src, keep: list[str], aggs):
    """Aggregate a (small) level table down to the ``keep`` columns; the
    empty subset uses a constant key (grand total)."""
    import pyarrow as pa

    if keep:
        return src.groupby(keep).aggregate(*aggs)
    return (src.map_batches(
        lambda b: b.append_column("_k", pa.array([0] * len(b), pa.int64())),
        batch_format="pyarrow", runtime_env=_rte())
        .groupby("_k").aggregate(*aggs).drop_columns(["_k"]))


def rollup_sums(ds, group_cols: list[str], value_col: str,
                value_scale: int = 1, all_label: str = "ALL"):
    """GROUP BY ROLLUP(*group_cols): count + exact integer sum at every
    prefix level (finest, each roll-up, grand total), rolled columns filled
    with ``all_label`` (SQL's NULL, published COALESCE'd).

    Scale shape: the corpus is scanned ONCE — a per-batch combiner emits a
    partial row per (batch, finest-level key), one groupby reduces to the
    finest level, and every coarser level re-aggregates the PREVIOUS
    level's (small) result, never the corpus.  Sums are fixed-point int64
    end-to-end, so every level is order-free and hash-stable.

    Output: ``(*group_cols, n_rows, sum_e{scale})`` — the sum column is
    named ``sum_e2`` for scale 100, ``sum_e6`` for 1e6, else ``sum_s``.
    """
    sum_col = _sum_col_name(value_scale)
    fine, aggs = _grouped_sum_fine(ds, group_cols, value_col, value_scale,
                                   sum_col)
    levels = [fine]
    prev = fine
    for k in range(len(group_cols) - 1, -1, -1):
        lvl = _regroup(prev, group_cols[:k], aggs)
        levels.append(lvl.map_batches(
            _fill_missing(group_cols, group_cols[k:], sum_col, all_label),
            batch_format="pyarrow", runtime_env=_rte()))
        prev = lvl
    out = levels[0].map_batches(
        _fill_missing(group_cols, [], sum_col, all_label),
        batch_format="pyarrow", runtime_env=_rte())
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def cube_sums(ds, group_cols: list[str], value_col: str,
              value_scale: int = 1, all_label: str = "ALL"):
    """GROUP BY CUBE(*group_cols): count + exact integer sum for EVERY
    subset of the grouping columns (2^n levels), absent columns filled
    with ``all_label``.

    Scale shape: same single corpus scan as rollup_sums; every one of the
    2^n - 1 other levels re-aggregates the FINE table (cardinality =
    distinct key combinations), never the corpus — CUBE costs 2^n tiny
    groupbys over a combiner output, not 2^n scans.  n is the number of
    grouping columns (user-chosen, small); the operator raises above 10
    columns rather than scheduling 1024 levels silently."""
    if len(group_cols) > 10:
        raise ValueError("cube_sums over >10 columns would schedule "
                         f"2^{len(group_cols)} levels; aggregate a coarser "
                         "key set instead")
    sum_col = _sum_col_name(value_scale)
    fine, aggs = _grouped_sum_fine(ds, group_cols, value_col, value_scale,
                                   sum_col)
    out = fine.map_batches(
        _fill_missing(group_cols, [], sum_col, all_label),
        batch_format="pyarrow", runtime_env=_rte())
    n = len(group_cols)
    for mask in range(2 ** n - 2, -1, -1):  # every proper subset
        keep = [c for i, c in enumerate(group_cols) if mask & (1 << i)]
        missing = [c for i, c in enumerate(group_cols)
                   if not mask & (1 << i)]
        lvl = _regroup(fine, keep, aggs)
        out = out.union(lvl.map_batches(
            _fill_missing(group_cols, missing, sum_col, all_label),
            batch_format="pyarrow", runtime_env=_rte()))
    return out


def pivot_counts_dataset(ds, key_col: str, pivot_col: str,
                         values: list[str]):
    """Pivot/crosstab: one int64 count column per ``values`` entry, keyed by
    ``key_col`` — SQL's ``SUM(CASE WHEN pivot = v THEN 1 END)`` family.

    Scale shape: per-batch combiner collapses the batch to one wide partial
    row per key (np.add.at into a (keys, values) matrix — no Python per
    row), then ONE small groupby sums the wide partials; shuffle volume is
    O(distinct keys per batch), never O(rows).  Values outside ``values``
    are ignored (project the pivot domain up front — at 100 TB the domain
    must be known/bounded anyway; an unbounded pivot is a schema explosion,
    not an operator)."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    vals = sorted(values)
    val_arr = np.asarray(vals, dtype=object)
    cols = [f"n_{v}" for v in vals]

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col])
        pv = np.asarray(batch[pivot_col]).astype(object)
        ukeys, kcode = np.unique(keys, return_inverse=True)
        vcode = np.searchsorted(val_arr, pv)
        vcode_c = np.clip(vcode, 0, len(vals) - 1)
        ok = val_arr[vcode_c] == pv
        mat = np.zeros((len(ukeys), len(vals)), dtype=np.int64)
        np.add.at(mat, (kcode[ok], vcode_c[ok]), 1)
        out = {key_col: pa.array(ukeys)}
        for j, c in enumerate(cols):
            out[c] = pa.array(mat[:, j], pa.int64())
        return pa.table(out)

    parts = ds.select_columns([key_col, pivot_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None, runtime_env=_rte()
    )
    return parts.groupby(key_col).aggregate(
        *[Sum(c, alias_name=c) for c in cols]
    )


def grouped_count_distinct(ds, group_col: str, value_col: str,
                           alias: str = "n_distinct"):
    """Exact count(DISTINCT value) per group — two-level combiner shape:

    1. per-batch (group, value) dedupe (a hot pair costs one row per
       batch, never a hot shuffle key);
    2. groupby the PAIR (distinct pairs materialize once each across the
       cluster);
    3. per-batch partial pair-counts per group -> tiny groupby(group).sum.

    The shuffle moves O(distinct pairs) rows regardless of row count —
    the exact counterpart of the HLL sketch (stages/sketches.py) for when
    the distinct-pair cardinality is shuffle-affordable.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def dedupe_partial(batch: pa.Table) -> pa.Table:
        return batch.select([group_col, value_col]).group_by(
            [group_col, value_col], use_threads=False).aggregate([])

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col]).group_by(
            group_col, use_threads=False).aggregate([([], "count_all")])
        return pa.table({group_col: g[group_col],
                         "c": g["count_all"].cast(pa.int64())})

    pairs = (
        ds.select_columns([group_col, value_col])
        .map_batches(dedupe_partial, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby([group_col, value_col]).count()
    )
    return (
        pairs.map_batches(count_partial, batch_format="pyarrow",
                          runtime_env=_rte())
        .groupby(group_col).aggregate(Sum("c", alias_name=alias))
    )


def grouped_mode(ds, group_col: str, value_col: str,
                 count_alias: str = "n"):
    """Most frequent value per group (deterministic: count desc, value asc
    tie-break) — Dataset(group, value, n).

    Shape: per-batch (group, value) count partials (combiner) -> one
    groupby over the distinct pairs -> ``topk_per_group(k=1)`` over the
    pair-count table (valid as a two-level reduce: a group's global argmax
    survives top-1 within every subset containing it).
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def pair_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, value_col]).group_by(
            [group_col, value_col], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({group_col: g[group_col], value_col: g[value_col],
                         count_alias: g["count_all"].cast(pa.int64())})

    counts = (
        ds.select_columns([group_col, value_col])
        .map_batches(pair_partial, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby([group_col, value_col])
        .aggregate(Sum(count_alias, alias_name=count_alias))
    )
    return topk_per_group(counts, key=group_col,
                          sort_cols=[count_alias, value_col],
                          ascending=[False, True], k=1)


def composite_page(ds, group_cols: list[str], value_col: str,
                   page_size: int, after: tuple | None = None,
                   value_scale: int = 1_000_000) -> pd.DataFrame:
    """ES ``composite`` aggregation page: the first ``page_size`` buckets
    of the (group_cols)-keyed aggregate in ascending key order, strictly
    AFTER the ``after`` cursor tuple (None = from the start).  Returns
    (group_cols..., n_rows, <sum_col>) — the caller chains pages by
    passing the last row's key tuple as the next ``after``.

    Scale shape: the bucket table comes from the shared one-scan combiner
    (``_grouped_sum_fine``); the page then extracts WITHOUT a full sort —
    every output block reduces to its local cursor-filtered first
    ``page_size`` buckets, so only O(blocks * page_size) partial rows
    reach the driver regardless of bucket count (the ES after-key paging
    contract: no deep sort, no offset scan)."""
    if page_size < 1:
        raise ValueError(f"page_size must be >= 1, got {page_size}")
    if after is not None and len(after) != len(group_cols):
        raise ValueError("after cursor must have one value per group col")
    sum_col = _sum_col_name(value_scale)
    fine, _aggs = _grouped_sum_fine(ds, group_cols, value_col,
                                    value_scale, sum_col)

    def _after_mask(df: pd.DataFrame) -> np.ndarray:
        gt = np.zeros(len(df), dtype=bool)
        eq = np.ones(len(df), dtype=bool)
        for c, a in zip(group_cols, after):
            col = df[c].to_numpy()
            gt |= eq & (col > a)
            eq &= col == a
        return gt

    def page_partial(df: pd.DataFrame) -> pd.DataFrame:
        if after is not None and len(df):
            df = df[_after_mask(df)]
        return df.sort_values(group_cols, kind="stable").head(page_size)

    parts = (fine.map_batches(page_partial, batch_format="pandas",
                              runtime_env=_rte()).to_pandas())
    out = (parts.sort_values(group_cols, kind="stable").head(page_size)
           .reset_index(drop=True))
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out[sum_col] = out[sum_col].astype(np.int64)
    return out

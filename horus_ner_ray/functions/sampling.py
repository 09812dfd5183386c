"""Sampling, shuffling, and deterministic train/test splits (SURVEY.md
T4/T5 — the reference shuffles with seeded ``random.shuffle`` /
``df.sample(frac=1)`` and splits on a fixed seed list,
reference: text-classification-module train.py:68-92,
src/.../benchmarking.py:278,348)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def random_sample(ds, fraction: float, seed: int = 42):
    """Seeded Bernoulli sample (wraps Dataset.random_sample)."""
    return ds.random_sample(fraction, seed=seed)


def shuffled(ds, seed: int = 42):
    """Seeded global shuffle (full all-to-all — training-side only)."""
    return ds.random_shuffle(seed=seed)


def hash_split(ds, id_col: str = "doc_id", train_pct: int = 80, buckets: int = 100):
    """Deterministic content-keyed split: doc goes to 'train' iff
    (doc_id % buckets) < train_pct.  Order- and partitioning-independent
    (unlike random_shuffle-based splits), so it's reproducible across
    cluster sizes and SQL-expressible for the oracle."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        split = np.where((ids % buckets) < train_pct, "train", "test")
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          runtime_env=_rte())


def weighted_sample_topk(ds, key_col: str, weight_col: str, k: int,
                         seed: int = 42):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis' A-ES, Inf. Process. Lett. 97(5) 2006): each row draws
    ``u = (splitmix64(key XOR seed) + 1) / 2**64`` in (0, 1] and takes
    priority ``u**(1/w)``; the k largest priorities are exactly a
    weighted sample without replacement.  Pseudorandomness comes from the
    keyed hash, so the sample is a pure function of (keys, weights,
    seed) — order- and partitioning-independent, reproducible across
    cluster sizes, and SQL-expressible for the oracle (the same
    splitmix64 restated in HUGEINT arithmetic; numpy's ``power`` and
    DuckDB's ``pow`` share libm, pinned by the conformance hash).

    Rows with weight <= 0 are excluded (their inclusion probability is
    the A-ES limit 0).  Scale shape: a per-batch top-k combiner (at most
    k rows leave each batch) followed by a sort+limit over the bounded
    partial set — the full table never shuffles.  Ties (possible only
    for duplicate keys) break (priority desc, key asc)."""
    from horus_ner_ray.stages.sketches import splitmix64

    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col], dtype=np.int64)
        w = np.asarray(batch[weight_col], dtype=np.float64)
        ok = w > 0.0
        keys, w = keys[ok], w[ok]
        h = splitmix64(keys.astype(np.uint64) ^ np.uint64(seed))
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        pr = np.power(u, 1.0 / w)
        if len(keys) > k:
            sel = np.lexsort((keys, -pr))[:k]
            keys, w, pr = keys[sel], w[sel], pr[sel]
        return pa.table({key_col: pa.array(keys, pa.int64()),
                         weight_col: pa.array(w, pa.float64()),
                         "priority": pa.array(pr, pa.float64())})

    parts = ds.select_columns([key_col, weight_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())
    return parts.sort(["priority", key_col],
                      descending=[True, False]).limit(k)


def weighted_sample_per_group(ds, group_col: str, key_col: str,
                              weight_col: str, k: int, seed: int = 42,
                              temperature: float = 1.0):
    """Per-group A-ES weighted sampling without replacement — the
    domain-mixture constructor (k docs per source/language/domain,
    weighted by quality or length, deterministic).  Same keyed-hash
    priorities as ``weighted_sample_topk``; the top-k reduction applies
    PER distinct ``group_col`` value.  ``temperature`` T rescales the
    weights to w**(1/T) BEFORE the priority draw (the data-mixture
    temperature knob: T > 1 flattens the weight distribution toward
    uniform, T < 1 sharpens it; T = 1 is a bitwise no-op — libm
    pow(w, 1.0) returns w exactly).  Published weights stay RAW.  Scale shape: a per-batch
    per-group top-k combiner (at most k rows per group leave each
    batch), then one small ``map_groups`` top-k over the bounded
    partials — the table never shuffles whole.  Ties break (priority
    desc, key asc); weight <= 0 rows are excluded."""
    import pandas as pd

    from horus_ner_ray.stages.sketches import splitmix64

    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if not (temperature > 0.0):
        raise ValueError(f"temperature must be > 0, got {temperature}")
    inv_t = 1.0 / float(temperature)

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col], dtype=np.int64)
        w = np.asarray(batch[weight_col], dtype=np.float64)
        grp = np.asarray(batch[group_col], dtype=object)
        ok = w > 0.0
        keys, w, grp = keys[ok], w[ok], grp[ok]
        h = splitmix64(keys.astype(np.uint64) ^ np.uint64(seed))
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        pr = np.power(u, 1.0 / np.power(w, inv_t))
        uniq, codes = np.unique(grp, return_inverse=True)
        order = np.lexsort((keys, -pr, codes))
        cc = codes[order]
        starts = np.flatnonzero(np.r_[True, cc[1:] != cc[:-1]])
        sizes = np.diff(np.r_[starts, len(cc)])
        rank = np.arange(len(cc)) - np.repeat(starts, sizes)
        keep = order[rank < k]
        return pa.table({
            group_col: pa.array(grp[keep].astype(str), pa.string()),
            key_col: pa.array(keys[keep], pa.int64()),
            weight_col: pa.array(w[keep], pa.float64()),
            "priority": pa.array(pr[keep], pa.float64()),
        })

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        sel = np.lexsort((df[key_col].to_numpy(),
                          -df["priority"].to_numpy()))[:k]
        out = df.iloc[np.sort(sel)].copy()
        order = np.lexsort((out[key_col].to_numpy(),
                            -out["priority"].to_numpy()))
        out = out.iloc[order].reset_index(drop=True)
        out["rank"] = np.arange(1, len(out) + 1)
        return out[[group_col, "rank", key_col, weight_col, "priority"]]

    parts = ds.select_columns([group_col, key_col, weight_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())
    return parts.groupby(group_col).map_groups(finish,
                                               batch_format="pandas")


def token_budget_mix(ds, group_col: str, id_col: str, dl_col: str,
                     budget, seed: int = 42, n_buckets: int = 1024):
    """Token-budget mixture selection — the pretraining-data mixing step
    "take AT MOST ``budget`` tokens from each source/domain, chosen
    pseudo-randomly": every row draws ``h = splitmix64(id XOR seed)``
    and each group keeps the maximal prefix, in (h, id) order, whose
    cumulative ``dl_col`` stays <= its budget (exactly the SQL window
    rule ``sum(dl) OVER (PARTITION BY group ORDER BY h, id) <= budget``
    — the oracle).  ``budget`` is one int for every group or a
    ``{group: int}`` dict (missing groups get nothing).

    Scale shape (the quantile histogram-refinement pattern): pass 1 is a
    per-batch combiner of (group, h-prefix-bucket) token sums — at most
    groups x ``n_buckets`` tiny rows leave each task — whose driver-side
    cumsum locates each group's BOUNDARY bucket; pass 2 collects only
    the boundary buckets' rows (~N/n_buckets per group) to resolve the
    exact (h, id) cutoff; pass 3 filters the pool with the broadcast
    cutoff table, a pure map.  The corpus never shuffles and the driver
    never holds more than the boundary buckets.

    Returns the selected rows as a streaming Dataset with the original
    columns of (group_col, id_col, dl_col)."""
    import pandas as pd

    from horus_ner_ray.stages.sketches import splitmix64

    if n_buckets < 2 or (n_buckets & (n_buckets - 1)):
        raise ValueError(f"n_buckets must be a power of two >= 2, "
                         f"got {n_buckets}")
    shift = np.uint64(64 - int(n_buckets).bit_length() + 1)

    def _budget_of(g) -> int:
        if isinstance(budget, dict):
            return int(budget.get(g, 0))
        return int(budget)

    cols = [group_col, id_col, dl_col]

    def _hb(batch: pa.Table):
        ids = np.asarray(batch[id_col], dtype=np.int64)
        h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        return ids, h, (h >> shift).astype(np.int64)

    def pass1(batch: pa.Table) -> pa.Table:
        _ids, _h, b = _hb(batch)
        dl = np.asarray(batch[dl_col], dtype=np.int64)
        grp = np.asarray(batch[group_col], dtype=object)
        uniq, codes = np.unique(grp, return_inverse=True)
        key = codes * n_buckets + b
        sums = np.bincount(key, weights=dl,
                           minlength=len(uniq) * n_buckets)
        nz = np.flatnonzero(sums)
        return pa.table({
            group_col: pa.array(uniq[nz // n_buckets].astype(str)),
            "bucket": pa.array(nz % n_buckets, pa.int64()),
            "tok": pa.array(sums[nz].astype(np.int64), pa.int64())})

    parts = (ds.select_columns(cols)
             .map_batches(pass1, batch_format="pyarrow",
                          zero_copy_batch=True, runtime_env=_rte())
             .to_pandas())
    agg = parts.groupby([group_col, "bucket"], sort=True)["tok"].sum()

    # per group: boundary bucket (where the cumsum crosses the budget)
    # and the budget remaining on entry to it
    boundary: dict = {}   # group -> (b_star, remaining)
    cutoff: dict = {}     # group -> (h_cut uint64, id_cut int64)
    _all = (np.uint64(2**64 - 1), np.int64(2**63 - 1))
    _none = (np.uint64(0), np.int64(-1))
    for g in agg.index.get_level_values(0).unique():
        bud = _budget_of(g)
        s = agg.loc[g]
        cum = s.cumsum()
        over = cum[cum > bud]
        if len(over) == 0:
            cutoff[g] = _all  # whole group fits
            continue
        b_star = int(over.index[0])
        before = int(cum.loc[b_star]) - int(s.loc[b_star])
        boundary[g] = (b_star, bud - before)

    if boundary:
        def pass2(batch: pa.Table) -> pa.Table:
            ids, h, b = _hb(batch)
            dl = np.asarray(batch[dl_col], dtype=np.int64)
            grp = np.asarray(batch[group_col], dtype=object)
            keep = np.zeros(len(ids), dtype=bool)
            for g, (b_star, _rem) in boundary.items():
                keep |= (grp == g) & (b == b_star)
            return pa.table({
                group_col: pa.array(grp[keep].astype(str)),
                id_col: pa.array(ids[keep], pa.int64()),
                "h": pa.array(h[keep], pa.uint64()),
                dl_col: pa.array(dl[keep], pa.int64())})

        edge = (ds.select_columns(cols)
                .map_batches(pass2, batch_format="pyarrow",
                             zero_copy_batch=True, runtime_env=_rte())
                .to_pandas())  # ~N/n_buckets rows per group — bounded
        for g, (b_star, rem) in boundary.items():
            rows = edge[edge[group_col] == g]
            order = np.lexsort((rows[id_col].to_numpy(np.int64),
                                rows["h"].to_numpy(np.uint64)))
            cum = np.cumsum(rows[dl_col].to_numpy(np.int64)[order])
            n_sel = int(np.searchsorted(cum, rem, side="right"))
            if n_sel == 0:
                # nothing in the boundary bucket fits, but every row of
                # the EARLIER buckets is still selected: cut at the
                # bucket base (h < b_star << shift; id -1 never matches)
                cutoff[g] = (np.uint64(b_star) << shift, np.int64(-1))
            else:
                last = order[n_sel - 1]
                cutoff[g] = (rows["h"].to_numpy(np.uint64)[last],
                             np.int64(rows[id_col].to_numpy(np.int64)[last]))

    def pass3(batch: pa.Table) -> pa.Table:
        ids, h, _b = _hb(batch)
        grp = np.asarray(batch[group_col], dtype=object)
        uniq, codes = np.unique(grp, return_inverse=True)
        hc = np.array([cutoff.get(g, _none)[0] for g in uniq],
                      dtype=np.uint64)[codes]
        ic = np.array([cutoff.get(g, _none)[1] for g in uniq],
                      dtype=np.int64)[codes]
        keep = (h < hc) | ((h == hc) & (ids <= ic))
        return batch.filter(pa.array(keep))

    return ds.select_columns(cols).map_batches(
        pass3, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())


def split_proportions(ds, id_col: str = "doc_id", train_pct: int = 80):
    """(split, n) counts for the hash split — combiner + tiny groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        tr = int(((ids % 100) < train_pct).sum())
        return pa.table(
            {"split": pa.array(["train", "test"]),
             "n": pa.array([tr, len(ids) - tr], pa.int64())}
        )

    parts = ds.select_columns([id_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None, runtime_env=_rte(),
    )
    return parts.groupby("split").aggregate(Sum("n", alias_name="n"))


def group_hash_split(ds, group_col: str, train_pct: int = 80,
                     seed: int = 42):
    """Leakage-safe GROUP-aware split (sklearn GroupShuffleSplit's
    contract, deterministic): EVERY row of a group lands in the same
    split — split = 'train' iff splitmix64(group XOR seed) % 100 <
    train_pct.  The hash is keyed on the GROUP value (int64), so the
    assignment is a pure function of (group, seed): order-,
    partitioning- and cluster-size-independent, and SQL-expressible
    (_sql_splitmix64).  Use for user-/conversation-keyed corpora where a
    row-level split would leak near-duplicate context across train and
    test."""
    from horus_ner_ray.stages.sketches import splitmix64

    if not (0 <= int(train_pct) <= 100):
        raise ValueError(f"train_pct must be in [0, 100], got {train_pct}")

    def fn(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch[group_col], dtype=np.int64).astype(np.uint64)
        h = splitmix64(g ^ np.uint64(seed))
        split = np.where((h % np.uint64(100)) < np.uint64(train_pct),
                         "train", "test")
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          runtime_env=_rte())


def negative_pairs(ds, id_col: str = "doc_id", n_ids: int | None = None,
                   k: int = 3, seed: int = 42):
    """Deterministic NEGATIVE sampling (contrastive-training pair
    constructor): for each row, ``k`` pseudo-random OTHER ids drawn by
    the keyed hash — neg_j = splitmix64((id * k + j) XOR seed) % (N-1),
    shifted past the anchor so neg != id always.  A pure function of
    (id, j, seed, N): order-/partitioning-invariant, collision-free with
    the anchor, SQL-replicable (_sql_splitmix64).  Requires the DENSE id
    space 0..N-1 (the docstore doc-id contract); ``n_ids`` defaults to
    ``ds.count()``.

    Scale shape: a pure per-batch map — no shuffle, no broadcast; the
    negatives are arithmetic, not lookups."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from horus_ner_ray.stages.sketches import splitmix64

    n = int(ds.count()) if n_ids is None else int(n_ids)
    if n < 2:
        raise ValueError(f"need >= 2 ids to draw negatives, got {n}")

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        anchor = np.repeat(ids, k)
        j = np.tile(np.arange(k, dtype=np.uint64), len(ids))
        key = anchor.astype(np.uint64) * np.uint64(k) + j
        h = splitmix64(key ^ np.uint64(seed))
        off = (h % np.uint64(n - 1)).astype(np.int64)
        # shift past the anchor: values land in 0..N-1 \ {anchor}
        neg = off + (off >= anchor).astype(np.int64)
        return pa.table({
            id_col: pa.array(anchor, pa.int64()),
            "neg_rank": pa.array(np.tile(np.arange(k, dtype=np.int64),
                                         len(ids)), pa.int64()),
            "neg_id": pa.array(neg, pa.int64()),
        })

    return ds.select_columns([id_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())


def epoch_repeats(ds, group_col: str, id_col: str,
                  factors: dict[str, int]):
    """Deterministic per-source UPSAMPLING by integer repeat factors —
    the 'epochs per dataset' knob of LLM data-mixture recipes (a corpus
    listed at 3 epochs emits every doc 3x, tagged ``repeat_idx``
    0..k-1 so downstream shuffles can interleave copies).  Groups absent
    from ``factors`` default to 1.

    Pure streaming map: each batch expands independently via np.repeat —
    no shuffle, no driver state, partitioning-invariant, and the output
    is a pure function of the rows (SQL-oracle-checkable with
    generate_series)."""

    def fn(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_pandas()
        k = g.map(factors).fillna(1).to_numpy(np.int64)
        idx = np.repeat(np.arange(len(k), dtype=np.int64), k)
        total = int(k.sum())
        starts = np.repeat(np.cumsum(k) - k, k)
        rep = np.arange(total, dtype=np.int64) - starts
        return pa.table({
            id_col: batch[id_col].take(pa.array(idx)),
            group_col: batch[group_col].take(pa.array(idx)),
            "repeat_idx": pa.array(rep, pa.int64()),
        })

    return ds.select_columns([id_col, group_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())

"""Broadcast joins / lookups (SURVEY.md §2.4 J1-J3).

The reference's joins are key lookups against its SQLite term index
(reference: src/core/feature_extraction/util.py:947-1016 term probe;
features.py:283,417 posting FK fetch).  Distributed, the same shapes become:

* **broadcast join** — small side (dimension table, vocab, blocklist) is
  ``ray.put`` once and looked up inside every ``map_batches`` task with a
  vectorized searchsorted; NO shuffle.  Right whenever one side fits in
  memory (the engine's conv-offset table, ANN query matrix, and embedding
  matrix all use this pattern already).
* **semi/anti join** — the same broadcast with a membership mask.

Both-sides-large joins bucket both sides by ``hash(key) % B`` and join
matching buckets pairwise (the pattern minhash/simhash dedup uses for its
pair generation): ``hash_join_dataset`` (general inner equi-join, m:n
keys), ``asof_join_dataset`` / ``interval_join_dataset`` (temporal), and
``bloom_semi_join`` (membership against a non-broadcastable key set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def _broadcast_side(small_df: pd.DataFrame, key: str):
    """Sorted key array + column arrays, ray.put once when Ray is up.

    The small side must be UNIQUE on ``key``: the probe is one searchsorted
    position per big-side row, so duplicate dimension keys would silently
    drop all but one match.  Fail loudly instead (a one-to-many dimension
    needs a shuffle join, not a broadcast lookup)."""
    import ray

    s = small_df.sort_values(key, kind="stable").reset_index(drop=True)
    keys = s[key].to_numpy()
    if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
        raise ValueError(
            f"broadcast join small side has duplicate '{key}' values; "
            "broadcast lookup requires a unique dimension key"
        )
    cols = {c: s[c].to_numpy() for c in s.columns if c != key}
    payload = (keys, cols)
    return ray.put(payload) if ray.is_initialized() else payload


def _resolve(ref):
    import ray

    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _arrow_type(schema, name: str) -> pa.DataType:
    """Field type from a Ray Schema wrapper, Arrow schema, or
    PandasBlockSchema (from_pandas datasets carry the latter)."""
    sch = getattr(schema, "base_schema", schema)
    if isinstance(sch, pa.Schema):
        return sch.field(name).type
    t = sch.types[list(sch.names).index(name)]
    if t == np.dtype("O"):  # pandas object column = strings in this repo
        return pa.string()
    return pa.from_numpy_dtype(t)


def broadcast_inner_join(big_ds, small_df: pd.DataFrame, big_key: str, small_key: str):
    """Dataset ⨝ small pandas table on an integer key -> Dataset with the
    small side's columns appended; rows without a match are dropped.
    Vectorized searchsorted per batch against the broadcast side."""
    ref = _broadcast_side(small_df, small_key)

    def fn(batch: pa.Table) -> pa.Table:
        keys, cols = _resolve(ref)
        bk = np.asarray(batch[big_key])
        pos = np.searchsorted(keys, bk)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = keys[pos_c] == bk
        batch = batch.filter(pa.array(hit))
        sel = pos_c[hit]
        for name, arr in cols.items():
            batch = batch.append_column(name, pa.array(arr[sel]))
        return batch

    return big_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                              runtime_env=_rte())


def asof_join_dataset(left_ds, right_ds, by: str, on: str,
                      left_cols: list[str], right_cols: list[str],
                      n_buckets: int = 64, suffix: str = "_r"):
    """Distributed as-of join (inner, backward, exact matches allowed):
    each left row pairs with the LATEST right row of the same ``by`` key
    whose ``on`` value is <= the left row's — DuckDB ``ASOF JOIN``
    semantics.  Both sides large; no broadcast.

    Shape: both sides are tagged into one unified Arrow schema, bucketed by
    ``hash(by) % n_buckets`` (the coarse-bucket pattern — O(buckets) Python
    group calls, not O(keys)), and each bucket runs one vectorized
    ``pd.merge_asof`` over its co-located keys.  The only shuffle is the
    single bucket groupby; at cluster scale buckets spread across nodes and
    each merge is a C-speed sorted join.

    ``on`` must be int64-comparable (epoch-us timestamps, sequence numbers).
    Integer payload columns ride through a nullable union (pandas converts
    to float64), so they must stay below 2^53 — asserted at tag time; rows
    with equal (by, on) on the right resolve to the payload-sorted last row
    (deterministic, but such ties are better disambiguated upstream).

    Output columns: ``[by, on, *left_cols, on+suffix, *right_cols+suffix]``,
    one row per matched left row.
    """
    on_r = on + suffix
    r_suff = [c + suffix for c in right_cols]
    clash = ({by, on, *left_cols} & {on_r, *r_suff}) | ({by, on} & set(left_cols))
    if clash:
        raise ValueError(
            f"asof join output column collision {sorted(clash)}: suffixed "
            "right columns must not overlap by/on/left columns — pick a "
            "different suffix")
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()

    def _tag(cols_here, schema_here, other_names, other_schema, other_orig,
             side):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            out = {by: pa.array(np.asarray(batch[by], dtype=np.int64)),
                   on: pa.array(np.asarray(batch[on], dtype=np.int64))}
            key = np.asarray(batch[by], dtype=np.int64).astype(np.uint64)
            out["bkt"] = pa.array(
                ((key * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_buckets))
                .astype(np.int64))
            out["side"] = pa.array(np.full(n, side, dtype=np.int8))
            for name, orig in cols_here:
                col = batch[orig]
                if pa.types.is_integer(col.type) and n:
                    v = np.asarray(col, dtype=np.int64)
                    if v.min() < -(2**53) or v.max() >= 2**53:
                        raise ValueError(
                            f"asof join payload '{orig}' exceeds 2^53; "
                            "not exactly representable through the union")
                out[name] = col
            for name, orig in zip(other_names, other_orig):
                out[name] = pa.nulls(n, _arrow_type(other_schema, orig))
            # canonical column order so the two sides' blocks unify cleanly
            order = [by, on, "bkt", "side", *left_cols, on_r, *r_suff]
            return pa.table({c: out[c] for c in order})
        return fn

    left_t = left_ds.map_batches(
        _tag([(c, c) for c in left_cols], l_schema, [on_r, *r_suff],
             r_schema, [on, *right_cols], 0),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
    right_t = right_ds.map_batches(
        _tag([(on_r, on), *[(c + suffix, c) for c in right_cols]], r_schema,
             left_cols, l_schema, left_cols, 1),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())

    out_cols = [by, on, *left_cols, on_r, *r_suff]
    int_like = {c: np.int64 for c, o in
                [(c, c) for c in left_cols] + list(zip(r_suff, right_cols))
                if pa.types.is_integer(
                    _arrow_type(l_schema if c in left_cols else r_schema, o))}
    int_like[on_r] = np.int64
    int_like[by] = np.int64
    int_like[on] = np.int64

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["side"] == 0][[by, on, *left_cols]]
        rf = g[g["side"] == 1][[by, on_r, *r_suff]]
        empty = pd.DataFrame(
            {c: pd.Series([], dtype=int_like.get(c, g[c].dtype))
             for c in out_cols})
        if len(lf) == 0 or len(rf) == 0:
            return empty
        lf = lf.sort_values(on, kind="stable")
        rf = rf.sort_values([on_r, *r_suff], kind="stable")
        rf[on_r] = rf[on_r].astype(np.int64)
        m = pd.merge_asof(lf, rf, left_on=on, right_on=on_r, by=by,
                          direction="backward", allow_exact_matches=True)
        m = m[m[on_r].notna()]
        if len(m) == 0:
            return empty
        for c, dt in int_like.items():
            m[c] = m[c].astype(dt)
        return m[out_cols]

    return (
        left_t.union(right_t)
        .groupby("bkt")
        .map_groups(join_bucket, batch_format="pandas", runtime_env=_rte())
    )


def hash_join_dataset(left_ds, right_ds, key: str,
                      left_cols: list[str], right_cols: list[str],
                      n_buckets: int = 64, suffix: str = "_r",
                      max_bucket_rows: int = 5_000_000,
                      on_overflow: str = "raise",
                      how: str = "inner",
                      left_fill: dict | None = None):
    """General inner equi-join with BOTH sides large: tag each side into a
    unified Arrow schema, one coarse-bucket shuffle on ``hash(key)``, and a
    vectorized ``pd.merge`` per bucket — one-to-many and many-to-many keys
    produce the full cross product per key, standard inner-join semantics
    (unlike ``broadcast_inner_join``, which requires a unique small side).

    Use the broadcast join when one side fits in memory (no shuffle) and
    ``bloom_semi_join`` when only membership is needed; this operator is
    the fallback when both sides are big AND payload columns must cross.
    Integer payloads ride the nullable union -> < 2^53 (asserted).

    SKEW GUARD: before merging, each bucket estimates its exact output
    size from per-key count products.  Above ``max_bucket_rows`` the
    bucket either fails loudly with routing guidance (``on_overflow=
    'raise'``, the default — an m:n hot key's cross product silently
    OOMing a worker is the worst failure mode at scale) or merges in
    bounded chunks (``'chunk'``: key-sliced, and a single monster key is
    further sliced by left rows so no intermediate merge frame exceeds
    the bound; the group's total output still materializes — chunking
    bounds peak intermediates, not the inherent output size).

    Output columns: ``[key, *left_cols, *right_cols+suffix]``.

    ``how='left'`` is the LEFT OUTER join: every left row survives, and
    unmatched rows carry ``left_fill[right_col]`` in the right columns —
    an explicit COALESCE built into the operator (typed fills instead of
    nullable-int promotion, so integer payloads stay int64 end-to-end).
    Both sides bucket by the same key hash, so a left row's matches are
    always co-located; emitting unmatched rows is bucket-local.
    """
    if on_overflow not in ("raise", "chunk"):
        raise ValueError("on_overflow must be 'raise' or 'chunk'")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if how == "left":
        missing = [c for c in right_cols if c not in (left_fill or {})]
        if missing:
            raise ValueError(
                f"how='left' requires left_fill values for every right "
                f"column; missing {missing} — pick the COALESCE value "
                "unmatched rows should carry (e.g. -1, '')")
    r_suff = [c + suffix for c in right_cols]
    clash = ({key, *left_cols} & set(r_suff)) | ({key} & set(left_cols))
    if clash:
        raise ValueError(
            f"hash join output column collision {sorted(clash)}: suffixed "
            f"right columns (suffix={suffix!r}) must not overlap the key "
            "or left columns — pick a different suffix")
    l_schema, r_schema = left_ds.schema(), right_ds.schema()

    def _tag(side: int, cols_here, other, other_schema, other_orig):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            out = {key: pa.array(np.asarray(batch[key], dtype=np.int64))}
            k = np.asarray(batch[key], dtype=np.int64).astype(np.uint64)
            out["__bkt"] = pa.array(
                ((k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_buckets))
                .astype(np.int64))
            out["__side"] = pa.array(np.full(n, side, dtype=np.int8), pa.int8())
            for name, orig in cols_here:
                col = batch[orig]
                if pa.types.is_integer(col.type) and n:
                    v = np.asarray(col, dtype=np.int64)
                    if v.min() < -(2**53) or v.max() >= 2**53:
                        raise ValueError(
                            f"hash join payload '{orig}' exceeds 2^53; not "
                            "exactly representable through the union")
                out[name] = col
            for name, orig in zip(other, other_orig):
                out[name] = pa.nulls(n, _arrow_type(other_schema, orig))
            order = [key, "__bkt", "__side", *left_cols, *r_suff]
            return pa.table({c: out[c] for c in order})
        return fn

    left_t = left_ds.map_batches(
        _tag(0, [(c, c) for c in left_cols], r_suff, r_schema, right_cols),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
    right_t = right_ds.map_batches(
        _tag(1, [(c + suffix, c) for c in right_cols], left_cols, l_schema,
             left_cols),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())

    out_cols = [key, *left_cols, *r_suff]
    int_like = {c: np.int64 for c, o in
                [(c, c) for c in left_cols] + list(zip(r_suff, right_cols))
                if pa.types.is_integer(
                    _arrow_type(l_schema if c in left_cols else r_schema, o))}
    int_like[key] = np.int64

    def _with_fills(lf: pd.DataFrame) -> pd.DataFrame:
        m = lf.copy()
        for c, o in zip(r_suff, right_cols):
            m[c] = left_fill[o]
        return m

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == 0][[key, *left_cols]]
        rf = g[g["__side"] == 1][[key, *r_suff]]
        empty = pd.DataFrame(
            {c: pd.Series([], dtype=int_like.get(c, g[c].dtype))
             for c in out_cols})
        if len(lf) == 0:
            return empty
        if len(rf) == 0:
            if how != "left":
                return empty
            m = _with_fills(lf)
            for c, dt in int_like.items():
                m[c] = m[c].astype(dt)
            return m[out_cols]
        nl = lf[key].value_counts()
        nr = rf[key].value_counts()
        common = nl.index.intersection(nr.index)
        prods = (nl[common] * nr[common]).astype(np.int64)
        est = int(prods.sum())
        if est > max_bucket_rows and on_overflow == "raise":
            hot = prods.idxmax()
            raise ValueError(
                f"hash join bucket would produce {est} rows "
                f"(> max_bucket_rows={max_bucket_rows}); hottest key "
                f"{hot!r} alone contributes {int(prods.max())}. An m:n hot "
                "key's cross product does not shrink with more buckets — "
                "pre-aggregate one side, route through broadcast_inner_join"
                " / bloom_semi_join, or pass on_overflow='chunk' to bound "
                "peak memory (the output itself stays this large).")
        if est > max_bucket_rows:  # chunked merge, bounded intermediates
            out = []
            cur: list = []
            cur_sum = 0
            for k_, p in prods.items():
                if int(p) > max_bucket_rows:
                    # monster key: slice its left rows so each partial
                    # merge stays under the bound
                    lk = lf[lf[key] == k_]
                    rk = rf[rf[key] == k_]
                    step = max(1, max_bucket_rows // max(1, len(rk)))
                    for i in range(0, len(lk), step):
                        out.append(lk.iloc[i:i + step].merge(
                            rk, on=key, how="inner"))
                    continue
                if cur and cur_sum + int(p) > max_bucket_rows:
                    ks = set(cur)
                    out.append(lf[lf[key].isin(ks)].merge(
                        rf[rf[key].isin(ks)], on=key, how="inner"))
                    cur, cur_sum = [], 0
                cur.append(k_)
                cur_sum += int(p)
            if cur:
                ks = set(cur)
                out.append(lf[lf[key].isin(ks)].merge(
                    rf[rf[key].isin(ks)], on=key, how="inner"))
            m = pd.concat(out, ignore_index=True) if out else empty
        else:
            m = lf.merge(rf, on=key, how="inner")
        if how == "left":
            unmatched = lf[~lf[key].isin(nr.index)]
            if len(unmatched):
                m = pd.concat([m, _with_fills(unmatched)],
                              ignore_index=True)
        if len(m) == 0:
            return empty
        for c, dt in int_like.items():
            m[c] = m[c].astype(dt)
        return m[out_cols]

    return (
        left_t.union(right_t)
        .groupby("__bkt")
        .map_groups(join_bucket, batch_format="pandas", runtime_env=_rte())
    )


def interval_join_dataset(points_ds, intervals_ds, by: str, on: str,
                          lo: str, hi: str, left_cols: list[str],
                          right_cols: list[str], n_buckets: int = 64,
                          suffix: str = "_r"):
    """Range (point-in-interval) join for per-key NON-OVERLAPPING
    intervals: each point row pairs with the interval of the same ``by``
    key whose ``[lo, hi]`` contains ``on`` (inclusive both ends); points
    outside every interval drop (inner).

    Composition, not a new shuffle: the latest interval start at or before
    the point (as-of join on ``lo``) is THE only candidate when intervals
    don't overlap, so one ``asof_join_dataset`` plus a vectorized
    ``hi >= on`` filter is exact.  Session windows, validity ranges, and
    versioned dimensions all satisfy the non-overlap precondition; truly
    overlapping intervals need a different plan (each point may match many
    intervals) and are out of scope here.

    Output columns: ``[by, on, *left_cols, lo+suffix, hi+suffix,
    *right_cols+suffix]``.
    """
    def lift(batch: pa.Table) -> pa.Table:
        # present the interval start as the right side's as-of key
        cols = {by: batch[by], on: batch[lo], hi: batch[hi]}
        for c in right_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    right = intervals_ds.map_batches(
        lift, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
    joined = asof_join_dataset(
        points_ds, right, by=by, on=on, left_cols=left_cols,
        right_cols=[hi, *right_cols], n_buckets=n_buckets, suffix=suffix)

    on_r, hi_r = on + suffix, hi + suffix

    def inside(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.greater_equal(batch[hi_r], batch[on]))
        return batch.rename_columns(
            [lo + suffix if c == on_r else c for c in batch.column_names])

    return joined.map_batches(inside, batch_format="pyarrow",
                              zero_copy_batch=True, runtime_env=_rte())


def _bloom_key_hash(v: np.ndarray) -> tuple[np.ndarray, str]:
    """(hashes, kind) with the array NORMALIZED before hashing:
    pd.util.hash_array hashes physical bytes, so int32 vs int64 (or float
    vs int) encodings of the same logical key hash differently — which
    would be a silent bloom false NEGATIVE, the one error class the filter
    must never produce.  All integer widths collapse to int64 and floats
    to float64; the kind tag lets the probe side fail loudly on an
    int-vs-float (or numeric-vs-string) mismatch instead of dropping rows.
    """
    if v.dtype == object:
        kind = "str"
        arr = v.astype(object)
    elif np.issubdtype(v.dtype, np.integer):
        kind = "int"
        arr = v.astype(np.int64)
    elif np.issubdtype(v.dtype, np.floating):
        kind = "float"
        arr = v.astype(np.float64)
    else:
        kind = str(v.dtype)
        arr = v
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64), kind


def _key_kind(ds, key: str) -> str:
    """Normalized hash kind of a key column, from the dataset schema."""
    t = _arrow_type(ds.schema(), key)
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    return str(t)


def _bloom_bits(keys_ds, key: str, n_bits: int, k_hashes: int) -> np.ndarray:
    """Build bloom filter bits from a keys DATASET in one streaming pass:
    per-batch bit arrays OR-reduced driver-side (associative merge, same
    shape as the HLL register reduce).  Driver state = n_bits/8 bytes."""
    import ray

    words = (n_bits + 63) // 64

    def part(batch: pa.Table) -> pa.Table:
        h, _ = _bloom_key_hash(np.asarray(batch[key]))
        bits = np.zeros(words, dtype=np.uint64)
        h1 = h
        h2 = (h * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        for i in range(k_hashes):  # double hashing: h1 + i*h2
            pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tolist()], pa.list_(pa.uint64()))})

    parts = keys_ds.map_batches(part, batch_format="pyarrow",
                                zero_copy_batch=True,
                                runtime_env=_rte()).to_pandas()
    bits = np.zeros(words, dtype=np.uint64)
    for b in parts["bits"]:
        np.bitwise_or(bits, np.asarray(b, dtype=np.uint64), out=bits)
    return bits


def bloom_semi_join(big_ds, keys_ds, big_key: str, small_key: str,
                    n_bits: int = 1 << 24, k_hashes: int = 7,
                    n_buckets: int = 64, exact: bool = True,
                    anti: bool = False):
    """Semi-join (or anti-join) against a key set too large to broadcast
    as a sorted array: a bloom filter of the keys (n_bits/8 bytes,
    OR-merged partials) broadcasts instead, each batch drops definite
    non-members with a vectorized membership test (no false negatives),
    and — when ``exact`` — the survivors alone go through a coarse-bucketed
    hash join against the key set to remove bloom false positives.  Shuffle
    volume is the SURVIVORS, not the big table: with fpp ~0.5-1% the exact
    path moves |matches| * (1 + fpp_overhead) rows where a shuffle join
    moves everything.  ``exact=False`` keeps the one-pass probabilistic
    prune (bounded false-positive rate, zero shuffle) for pre-filters ahead
    of an exact stage.

    ``anti=True`` inverts the semantics exactly: bloom-NEGATIVE rows are
    definite non-members (kept with zero shuffle), only the bloom-positive
    candidates shuffle to verification, and those NOT in the key set join
    the output.  Anti requires ``exact`` — a lone bloom pass would wrongly
    drop its false positives.  Anti deliberately scans the (column-pruned)
    big side twice — once per polarity — rather than materializing a
    membership-tagged copy: at corpus scale a second pruned read is
    cheaper than pinning the whole table in the object store.
    """
    import ray

    if anti and not exact:
        raise ValueError("anti-join requires exact=True: bloom false "
                         "positives would be dropped from the complement")
    kk, bk = _key_kind(keys_ds, small_key), _key_kind(big_ds, big_key)
    if kk != bk:
        raise ValueError(
            f"bloom_semi_join key kinds differ: {small_key!r} is {kk}, "
            f"{big_key!r} is {bk} — mismatched encodings hash differently "
            "and would produce silent false negatives; cast one side first")

    bits = _bloom_bits(keys_ds, small_key, n_bits, k_hashes)
    ref = ray.put(bits) if ray.is_initialized() else bits

    def _probe(polarity: bool):
        def probe(batch: pa.Table) -> pa.Table:
            bb = _resolve(ref)
            h, _ = _bloom_key_hash(np.asarray(batch[big_key]))
            keep = np.ones(len(h), dtype=bool)
            h2 = (h * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
            for i in range(k_hashes):
                pos = (h + np.uint64(i) * h2) % np.uint64(n_bits)
                word = bb[(pos >> np.uint64(6)).astype(np.int64)]
                keep &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
            return batch.filter(pa.array(keep if polarity else ~keep))
        return probe

    pruned = big_ds.map_batches(_probe(True), batch_format="pyarrow",
                                zero_copy_batch=True, runtime_env=_rte())
    if not exact:
        return pruned

    # exact verify: bucketed hash join of survivors vs the true key set
    # (kind 0 = key row, kind 1 = survivor row; same coarse-bucket pattern
    # as the dedup/asof stages — O(buckets) group calls)
    big_schema = big_ds.schema()
    payload_cols = list(getattr(big_schema, "names", None)
                        or big_schema.base_schema.names)

    def tag_keys(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[small_key])
        out = {big_key: pa.array(v), "__kind": pa.array(
            np.zeros(len(v), dtype=np.int8), pa.int8())}
        for c in payload_cols:
            if c != big_key:
                out[c] = pa.nulls(len(v), _arrow_type(big_schema, c))
        return pa.table({c: out[c] for c in [*payload_cols, "__kind"]})

    def tag_big(batch: pa.Table) -> pa.Table:
        for c in int_like:  # same union caveat as asof_join_dataset
            if len(batch):
                v = np.asarray(batch[c], dtype=np.int64)
                if len(v) and (v.min() < -(2**53) or v.max() >= 2**53):
                    raise ValueError(
                        f"bloom_semi_join payload '{c}' exceeds 2^53; not "
                        "exactly representable through the verify union")
        batch = batch.append_column(
            "__kind", pa.array(np.ones(len(batch), dtype=np.int8), pa.int8()))
        return batch.select([*payload_cols, "__kind"])

    def bucket(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[big_key])
        h = pd.util.hash_array(
            v if v.dtype != object else v.astype(object), categorize=False)
        return batch.append_column(
            "__bkt", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    int_like = [c for c in payload_cols
                if pa.types.is_integer(_arrow_type(big_schema, c))]

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(g.loc[g["__kind"] == 0, big_key].to_numpy())
        rows = g[g["__kind"] == 1]
        hit = np.zeros(len(rows), dtype=bool)
        if len(keys) and len(rows):
            rv = rows[big_key].to_numpy()
            pos = np.minimum(np.searchsorted(keys, rv), len(keys) - 1)
            hit = keys[pos] == rv
        out = rows[~hit if anti else hit].drop(columns=["__kind", "__bkt"]).copy()
        for c in int_like:  # survivors have no nulls; undo the union's
            out[c] = out[c].astype(np.int64)  # int->float widening
        return out

    tagged_keys = keys_ds.map_batches(
        tag_keys, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
    tagged_big = pruned.map_batches(
        tag_big, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
    verified = (
        tagged_keys.union(tagged_big)
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("__bkt")
        .map_groups(verify, batch_format="pandas", runtime_env=_rte())
    )
    if not anti:
        return verified
    # anti: bloom-negative rows never shuffled — union them back in
    negatives = big_ds.map_batches(_probe(False), batch_format="pyarrow",
                                   zero_copy_batch=True, runtime_env=_rte())
    neg_pd = negatives.map_batches(lambda b: b, batch_format="pandas",
                                   runtime_env=_rte())
    return neg_pd.union(verified)


def broadcast_semi_join(big_ds, keys: np.ndarray, big_key: str, anti: bool = False):
    """Keep rows whose key is (not, if anti) in the broadcast key set."""
    import ray

    srt = np.sort(np.asarray(keys))
    ref = ray.put(srt) if ray.is_initialized() else srt

    def fn(batch: pa.Table) -> pa.Table:
        ks = _resolve(ref)
        bk = np.asarray(batch[big_key])
        pos = np.minimum(np.searchsorted(ks, bk), len(ks) - 1)
        hit = ks[pos] == bk if len(ks) else np.zeros(len(bk), dtype=bool)
        return batch.filter(pa.array(~hit if anti else hit))

    return big_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                              runtime_env=_rte())

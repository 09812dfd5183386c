"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's only dedup is the exact, case-insensitive UNIQUE term probe
(SURVEY.md D1; reference: horus0.1.5.db.sql:123-127) — re-expressed here as
hash-partitioned groupby + per-group first.  Near-dup (MinHash & friends)
has no reference analogue; it is part of the training-data-pipeline surface
this engine adds (task brief), built on the same combiner/groupby patterns.

Determinism: every hash is seeded and vectorized (pandas hash_array +
uint64 polynomial mixes); no Python ``hash()``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.util import list_column_to_matrix, matrix_to_list_column, worker_runtime_env as _rte
from horus_ner_ray.stages.tokenize import tokenize_column

_MERSENNE = np.uint64((1 << 61) - 1)
_MIX = np.uint64(0x9E3779B97F4A7C15)
_N_BUCKETS = 256  # default coarse shuffle buckets; per-bucket work is vectorized


def buckets_for_rows(n_rows: int, target_rows_per_bucket: int = 100_000) -> int:
    """Coarse-bucket count sized so one group's payload stays bounded
    (~target rows): the shuffle key-space must GROW with the input or each
    bucket's ``map_groups`` call materializes corpus/buckets rows, and must
    SHRINK at small input or each ``map_groups`` stage pays hundreds of
    fixed per-group Python-kernel invocations for near-empty groups
    (measured 3x wall on the 500-doc conformance corpus at the old fixed
    256 floor).  Callers that know the input size (Parquet row counts are
    free metadata) pass the result as ``n_buckets``; results are invariant
    to the choice (routing only) — tests pin that."""
    return max(32, int(np.ceil(n_rows / max(1, target_rows_per_bucket))))


def salts_for_rows(n_rows: int) -> int:
    """Salt width for the replicate-join stages: salting exists to bound a
    hot key's group at ~1/S of its rows, which only matters once groups are
    big; at small input every extra salt just multiplies replicated stat
    rows and per-group kernel calls.  Results are salt-invariant (routing
    only; tests/test_skew.py pins that)."""
    return 2 if n_rows < 100_000 else (8 if n_rows < 10_000_000 else 16)


def _bucket_pairs(g: pd.DataFrame, key_col: str, max_bucket: int,
                  extra: dict | None = None) -> pd.DataFrame:
    """Within one coarse group: emit all intra-bucket (doc_a < doc_b) pairs,
    buckets delimited by equal ``key_col`` values.  Vectorized bucket
    discovery; the Python loop only touches buckets with >= 2 members."""
    keys = g[key_col].to_numpy(dtype=np.int64)
    ids = g["doc_id"].to_numpy(dtype=np.int64)
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    if extra:
        extra_sorted = {k: v.to_numpy()[order] for k, v in extra.items()}
    boundaries = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
    out_a, out_b, out_extra = [], [], {k: [] for k in (extra or {})}
    for i in range(len(boundaries) - 1):
        lo, hi = boundaries[i], boundaries[i + 1]
        if hi - lo < 2:
            continue
        sub = np.unique(ids[lo:hi])[:max_bucket]
        if len(sub) < 2:
            continue
        ia, ib = np.triu_indices(len(sub), k=1)
        out_a.append(sub[ia])
        out_b.append(sub[ib])
        for k in out_extra:
            # carry the first row's value per doc (bucket-constant payloads)
            vals = pd.Series(extra_sorted[k][lo:hi], index=ids[lo:hi])
            vals = vals[~vals.index.duplicated()]
            out_extra[k].append((vals.loc[sub[ia]].to_numpy(), vals.loc[sub[ib]].to_numpy()))
    if not out_a:
        cols = {"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)}
        return pd.DataFrame(cols)
    res = pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    )
    for k in out_extra:
        res[k + "_a"] = np.concatenate([x[0] for x in out_extra[k]])
        res[k + "_b"] = np.concatenate([x[1] for x in out_extra[k]])
    return res


def _distinct_pairs(pairs_ds, n_buckets: int = _N_BUCKETS):
    """Distinct (doc_a, doc_b) rows via coarse pair-hash buckets (a pair can
    surface from several bands); vectorized drop_duplicates per bucket."""
    nb = np.uint64(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["doc_a"], dtype=np.int64)
        b = np.asarray(batch["doc_b"], dtype=np.int64)
        pk = ((a.astype(np.uint64) * _MIX) ^ b.astype(np.uint64)) % nb
        return batch.append_column("pk", pa.array(pk.astype(np.int64), pa.int64()))

    return (
        pairs_ds.map_batches(add_bucket, batch_format="pyarrow",
                             zero_copy_batch=True, runtime_env=_rte())
        .groupby("pk")
        .map_groups(
            lambda g: g.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["pk"]),
            batch_format="pandas", runtime_env=_rte(),
        )
    )


def _hash_strings(arr: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash of a string array (vectorized)."""
    return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False)


# ---------------------------------------------------------------------------
# Exact dedup (SURVEY.md D1)
# ---------------------------------------------------------------------------


def exact_dedup_keep_min(ds, text_col: str = "text", id_col: str = "doc_id",
                         n_buckets: int = _N_BUCKETS):
    """Dataset(docs) -> Dataset(doc_id) of survivors: per distinct text, the
    row with the minimum doc_id survives.

    Plan: vectorized content-hash per batch -> groupby(hash) shuffle (moves
    only (hash, id, text)) -> per-group exact-text group + min.  Comparing
    the actual text inside the group makes 64-bit hash collisions harmless.
    ``n_buckets`` must scale with the input (buckets_for_rows) so one
    group's payload stays bounded; the result is bucket-layout-invariant.
    """
    nb = np.uint64(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = _hash_strings(np.asarray(batch[text_col], dtype=object))
        return pa.table(
            {
                "bucket": pa.array((h % nb).astype(np.int64), pa.int64()),
                "doc_id": batch[id_col],
                text_col: batch[text_col],
            }
        )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        # one group per hash BUCKET (not per text) — a per-distinct-value
        # map_groups costs a Python call per group, which measured ~100x
        # slower; inside the bucket a vectorized pandas groupby finishes it
        out = g.groupby(text_col, sort=False)["doc_id"].min()
        return pd.DataFrame({"doc_id": out.to_numpy(dtype=np.int64)})

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
        .groupby("bucket")
        .map_groups(keep_min, batch_format="pandas", runtime_env=_rte())
        .select_columns(["doc_id"])
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH banding
# ---------------------------------------------------------------------------


def _shingle_hashes(texts: pa.Array, k: int, sentinel: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Per row: hashes of word k-shingles (vectorized polynomial mix of
    token hashes over a sliding window).  Returns (flat_hashes, row_lengths);
    rows with fewer than k tokens get a single sentinel shingle so they can
    still be compared (empty-vs-empty) — unless sentinel=False, where they
    get no shingles (the SQL-oracle-matched all-pairs semantics).

    Fully flat: the sliding-window polynomial runs in k vectorized passes
    over the whole batch's token stream, window validity is a same-row mask
    over the parent index, and per-row uniqueness is one (row, hash)
    lexsort + boundary diff — no per-document Python loop (minhash hot
    path)."""
    import pyarrow.compute as pc

    toks = tokenize_column(texts)
    flat = np.asarray(pc.list_flatten(toks), dtype=object)
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    th = _hash_strings(flat) if len(flat) else np.zeros(0, dtype=np.uint64)
    n_rows = len(lens)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    parents = np.repeat(np.arange(n_rows, dtype=np.int64), lens)

    parts_p: list[np.ndarray] = []
    parts_h: list[np.ndarray] = []
    if len(th) >= k:
        m = len(th) - k + 1  # candidate window starts
        sh = th[:m].copy()
        for j in range(1, k):
            sh = sh * _MIX + th[j : m + j]
        valid = parents[:m] == parents[k - 1 :]  # window within one row
        parts_p.append(parents[:m][valid])
        parts_h.append(sh[valid])
    if sentinel:
        empty = lens == 0
        if empty.any():
            parts_p.append(np.flatnonzero(empty))
            parts_h.append(np.full(int(empty.sum()), np.uint64(0xDEAD), dtype=np.uint64))
        short = (lens > 0) & (lens < k)
        if short.any():
            idx = np.flatnonzero(short)
            parts_p.append(idx)
            parts_h.append((th[offsets[idx]] * _MIX).astype(np.uint64))
    out_n = np.zeros(n_rows, dtype=np.int64)
    if not parts_p:
        return np.zeros(0, np.uint64), out_n
    p = np.concatenate(parts_p)
    h = np.concatenate(parts_h)
    order = np.lexsort((h, p))
    p, h = p[order], h[order]
    keep = np.ones(len(p), dtype=bool)
    keep[1:] = (p[1:] != p[:-1]) | (h[1:] != h[:-1])  # per-row sorted unique
    p, h = p[keep], h[keep]
    out_n = np.bincount(p, minlength=n_rows).astype(np.int64)
    return h, out_n


def _minhash_params(cfg: PipelineConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(cfg.seed)
    a = rng.randint(1, (1 << 61) - 1, size=cfg.minhash_perms).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=cfg.minhash_perms).astype(np.uint64)
    return a, b


def minhash_signatures(cfg: PipelineConfig, text_col: str = "text", id_col: str = "doc_id",
                       n_buckets: int = _N_BUCKETS):
    """map_batches fn: batch -> (doc_id, band, band_hash) rows, P perms
    folded into ``bands`` bands of ``rows_per_band`` each."""
    a, b = _minhash_params(cfg)
    P = cfg.minhash_perms
    nb = cfg.minhash_bands
    rpb = cfg.rows_per_band()
    nbk = np.uint64(n_buckets)

    def fn(batch: pa.Table) -> pa.Table:
        sh, ns = _shingle_hashes(batch[text_col], cfg.shingle_k)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        starts = np.zeros(len(ns), dtype=np.int64)
        np.cumsum(ns[:-1], out=starts[1:])
        # (P, n_shingles) permuted hashes; per-doc min via reduceat
        x = (sh % _MERSENNE).astype(np.uint64)
        sigs = np.empty((len(ns), P), dtype=np.uint64)
        for p in range(P):
            hx = (a[p] * x + b[p]) % _MERSENNE
            sigs[:, p] = np.minimum.reduceat(hx, starts) if len(hx) else 0
        # fold rows into band hashes
        band_h = np.zeros((len(ns), nb), dtype=np.uint64)
        for bi in range(nb):
            acc = np.zeros(len(ns), dtype=np.uint64)
            for r in range(rpb):
                acc = acc * _MIX + sigs[:, bi * rpb + r]
            band_h[:, bi] = acc
        bh = band_h.reshape(-1)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, nb), pa.int64()),
                "band": pa.array(np.tile(np.arange(nb, dtype=np.int32), len(ns)), pa.int32()),
                "band_hash": pa.array(bh.astype(np.int64), pa.int64()),
                "band_bucket": pa.array((bh % nbk).astype(np.int64), pa.int64()),
            }
        )

    return fn


def minhash_candidate_pairs(ds, cfg: PipelineConfig, text_col: str = "text",
                            id_col: str = "doc_id", max_bucket: int = 200,
                            n_buckets: int = _N_BUCKETS):
    """Dataset(docs) -> Dataset(doc_a, doc_b) candidate near-dup pairs.

    shingle -> minhash -> band -> groupby(band, band_hash) -> in-bucket
    pairs.  Buckets larger than ``max_bucket`` are truncated to their
    ``max_bucket`` smallest doc_ids (deterministic) — a hot bucket means a
    degenerate near-identical cluster; pairing its first M members still
    connects the cluster for a later connected-components pass.
    """

    sigs = ds.select_columns([id_col, text_col]).map_batches(
        minhash_signatures(cfg, text_col, id_col, n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True, runtime_env=_rte(),
    )
    # shuffle key is (band, coarse hash bucket): one Python group per COARSE
    # bucket with vectorized intra-bucket pairing — not one map_groups call
    # per LSH bucket, which measured ~100x slower at ~80k tiny buckets
    cand = sigs.groupby(["band", "band_bucket"]).map_groups(
        lambda g: _bucket_pairs(g, "band_hash", max_bucket),
        batch_format="pandas", runtime_env=_rte(),
    )
    return _distinct_pairs(cand, n_buckets)


def ngram_jaccard_pairs_exact(ds, cfg: PipelineConfig, threshold: float = 0.05,
                              text_col: str = "text", id_col: str = "doc_id",
                              n_buckets: int = _N_BUCKETS):
    """EXACT all-pairs shingle-set Jaccard >= threshold (no LSH approximation
    — the brute baseline the SQL oracle can check).

    Plan: distinct (shingle, doc) rows -> coarse-bucket groupby on the
    shingle hash -> within each bucket, every shared shingle emits its doc
    pair -> pair-count groupby = intersection size -> Jaccard with
    broadcast per-doc set sizes.  Docs with fewer than ``shingle_k`` tokens
    have no shingles and never pair.  Cost is sum over shingles of
    (docs-sharing)^2 — fine while shared shingles are rare; the LSH variant
    (minhash_candidate_pairs) is the scale path.
    """
    import ray
    from ray.data.aggregate import Count

    k = cfg.shingle_k
    nbk = np.uint64(n_buckets)

    def explode(batch: pa.Table) -> pa.Table:
        sh, ns = _shingle_hashes(batch[text_col], k, sentinel=False)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        return pa.table(
            {
                "h": pa.array(sh.astype(np.int64), pa.int64()),
                "bucket": pa.array((sh % nbk).astype(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, ns), pa.int64()),
            }
        )

    rows = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
    )

    # per-doc set sizes (combiner; the reduced table is small -> broadcast)
    def size_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("doc_id", use_threads=False).aggregate([([], "count_all")])
        return pa.table({"doc_id": g["doc_id"], "n": g["count_all"]})

    from ray.data.aggregate import Sum

    sizes = (
        rows.map_batches(size_partial, batch_format="pyarrow", zero_copy_batch=True,
                         batch_size=None, runtime_env=_rte())
        .groupby("doc_id").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    if len(sizes) == 0:  # every doc shorter than the shingle width
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )
    size_keys = sizes["doc_id"].to_numpy(np.int64)
    order = np.argsort(size_keys)
    size_keys = size_keys[order]
    size_vals = sizes["n"].to_numpy(np.int64)[order]
    ref = ray.put((size_keys, size_vals)) if ray.is_initialized() else (size_keys, size_vals)

    def co_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one pair row per shared shingle (counting multiplicity = |A ∩ B|)
        keys = g["h"].to_numpy(np.int64)
        ids = g["doc_id"].to_numpy(np.int64)
        o = np.lexsort((ids, keys))
        keys, ids = keys[o], ids[o]
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        out_a, out_b = [], []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            if hi - lo < 2:
                continue
            sub = ids[lo:hi]
            ia, ib = np.triu_indices(len(sub), k=1)
            out_a.append(sub[ia])
            out_b.append(sub[ib])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)})

    co = rows.groupby("bucket").map_groups(co_pairs, batch_format="pandas", runtime_env=_rte())

    def add_pk(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["doc_a"], dtype=np.int64)
        b = np.asarray(batch["doc_b"], dtype=np.int64)
        pk = ((a.astype(np.uint64) * _MIX) ^ b.astype(np.uint64)) % nbk
        return batch.append_column("pk", pa.array(pk.astype(np.int64), pa.int64()))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        keys, vals = _resolve_ref(ref)
        cnt = g.groupby(["doc_a", "doc_b"], sort=False).size().reset_index(name="inter")
        a = cnt["doc_a"].to_numpy(np.int64)
        b = cnt["doc_b"].to_numpy(np.int64)
        na = vals[np.searchsorted(keys, a)]
        nb = vals[np.searchsorted(keys, b)]
        inter = cnt["inter"].to_numpy(np.int64)
        jac = inter / (na + nb - inter)
        keep = jac >= threshold
        return pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep], "jaccard": jac[keep]})

    return (
        co.map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
        .groupby("pk")
        .map_groups(finish, batch_format="pandas", runtime_env=_rte())
    )


def _resolve_ref(ref):
    import ray

    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def exact_jaccard_for_pairs(
    corpus_files: list[str], pairs: pd.DataFrame, cfg: PipelineConfig,
    text_col: str = "text", id_col: str = "doc_id",
) -> pd.DataFrame:
    """Verification stage: exact shingle-set Jaccard for candidate pairs.

    Driver-side convenience (fine while the candidate set is small after
    LSH); ``exact_jaccard_for_pairs_dataset`` below is the scale path —
    the same math as a partitioned two-stage bucketed join, differentially
    tested equal to this helper.
    """
    import pyarrow.parquet as pq

    need = np.unique(np.concatenate([pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()])) if len(pairs) else np.zeros(0, np.int64)
    sets: dict[int, np.ndarray] = {}
    for f in corpus_files:
        t = pq.read_table(f, columns=[id_col, text_col])
        ids = np.asarray(t[id_col], dtype=np.int64)
        mask = np.isin(ids, need)
        if not mask.any():
            continue
        sub = t.filter(pa.array(mask))
        sh, ns = _shingle_hashes(sub[text_col], cfg.shingle_k)
        starts = np.zeros(len(ns) + 1, dtype=np.int64)
        np.cumsum(ns, out=starts[1:])
        for i, d in enumerate(np.asarray(sub[id_col], dtype=np.int64)):
            sets[int(d)] = sh[starts[i] : starts[i + 1]]
    jac = np.zeros(len(pairs))
    for i, (da, db) in enumerate(zip(pairs["doc_a"], pairs["doc_b"])):
        sa, sb = sets[int(da)], sets[int(db)]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        jac[i] = inter / union if union else 1.0
    out = pairs.copy()
    out["jaccard"] = jac
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(text_col: str = "text", id_col: str = "doc_id"):
    """map_batches fn: batch -> (doc_id, simhash int64): 64-bit sign-sum of
    term hashes weighted by tf (vectorized bit unpack, no per-token loop)."""
    import pyarrow.compute as pc

    bits = np.arange(64, dtype=np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        n = len(batch)
        acc = np.zeros((n, 64), dtype=np.int64)
        if len(flat):
            h = _hash_strings(flat)
            bm = ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1
            np.add.at(acc, parents, bm)
        sig = (acc > 0).astype(np.uint64)
        out = np.zeros(n, dtype=np.uint64)
        for j in range(64):
            out |= sig[:, j] << np.uint64(j)
        return pa.table(
            {
                "doc_id": batch[id_col],
                "simhash": pa.array(out.astype(np.int64), pa.int64()),
            }
        )

    return fn


def simhash_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        simhash_signatures(text_col, id_col), batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
    )


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).astype(np.int64).view(np.uint64)) ^ (
        np.asarray(b).astype(np.int64).view(np.uint64)
    )
    cnt = np.zeros(len(x) if x.shape else (), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_candidate_pairs(ds, max_hamming: int = 3, text_col: str = "text",
                            id_col: str = "doc_id", max_bucket: int = 200,
                            n_buckets: int = _N_BUCKETS):
    """SimHash near-dup: band the 64-bit signature into 4 x 16-bit chunks
    (any pair within hamming distance 3 shares at least one exact chunk),
    groupby chunk -> in-bucket pairs -> exact hamming verify."""

    nbk = np.uint64(n_buckets)

    def explode(batch: pa.Table) -> pa.Table:
        sig = np.asarray(batch["simhash"], dtype=np.int64).view(np.uint64)
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        chunks = [(sig >> np.uint64(16 * c)) & np.uint64(0xFFFF) for c in range(4)]
        return pa.table(
            {
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "simhash": pa.array(np.tile(sig.view(np.int64), 4), pa.int64()),
                "chunk": pa.array(np.repeat(np.arange(4, dtype=np.int32), len(ids)), pa.int32()),
                "chunk_val": pa.array(np.concatenate(chunks).astype(np.int64), pa.int64()),
                "chunk_bucket": pa.array(
                    (np.concatenate(chunks) % nbk).astype(np.int64), pa.int64()
                ),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # coarse group per (chunk, chunk_val % buckets); vectorized pairing
        res = _bucket_pairs(g, "chunk_val", max_bucket, extra={"simhash": g["simhash"]})
        if len(res) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in ("doc_a", "doc_b", "hamming")}
            )
        hd = hamming_distance(res["simhash_a"].to_numpy(np.int64),
                              res["simhash_b"].to_numpy(np.int64))
        keep = hd <= max_hamming
        return pd.DataFrame(
            {"doc_a": res["doc_a"][keep], "doc_b": res["doc_b"][keep], "hamming": hd[keep]}
        )

    cand = (
        simhash_dataset(ds, text_col, id_col)
        .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
        .groupby(["chunk", "chunk_bucket"])
        .map_groups(pairs, batch_format="pandas", runtime_env=_rte())
    )
    return _distinct_pairs(cand, n_buckets)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(emb_ds, threshold: float = 0.95, id_col: str = "vec_id",
                        vec_col: str = "embedding", seed: int = 42, planes: int = 8,
                        bands: int = 4, exact: bool = False, max_bucket: int = 4096,
                        n_buckets: int = _N_BUCKETS):
    """Near-dup pairs by cosine >= threshold over an embedding column.

    Default (exact=False) is the scale path and never materializes the
    table on the driver: ``bands`` independent sign-LSH signatures of
    ``planes`` seeded hyperplanes each; a pair is a candidate when it
    shares ANY band's full signature, and candidates are verified with the
    EXACT cosine (raw vectors travel with the shuffle rows, the in-bucket
    compare uses dot/(|a||b|) — the same arithmetic as the exact path, so
    reported cosines agree bitwise).  Recall misses only pairs differing
    in >= 1 plane of every band — banding trades shuffle volume (bands x
    vectors) for recall near the threshold; raise ``bands`` / lower
    ``planes`` for recall, the reverse for cost.

    exact=True is the ORACLE HARNESS ONLY (conformance vs the DuckDB
    all-pairs SQL): it take_all()s the table onto the driver and broadcasts
    the full matrix to every batch — O(N^2) compare, fine at test scale,
    deliberately not the default.
    """
    import ray

    if exact:
        rows = emb_ds.select_columns([id_col, vec_col]).take_all()
        ids = np.array([r[id_col] for r in rows], dtype=np.int64)
        mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        order = np.argsort(ids, kind="stable")
        ids, mat, norms = ids[order], mat[order], norms[order]
        ref = ray.put((ids, mat, norms)) if ray.is_initialized() else (ids, mat, norms)

        def fn(batch: pa.Table) -> pa.Table:
            rids, rmat, rn = ray.get(ref) if ray.is_initialized() else ref
            bids = np.asarray(batch[id_col], dtype=np.int64)
            bmat = list_column_to_matrix(batch[vec_col])
            bn = np.linalg.norm(bmat, axis=1)
            bn[bn == 0] = 1.0
            # dot / (|a||b|): the same arithmetic shape as the SQL oracle's
            # list_cosine_similarity, so *_e6 roundings agree
            sims = (bmat @ rmat.T) / (bn[:, None] * rn[None, :])
            ai, bi = np.nonzero(sims >= threshold)
            da, db = bids[ai], rids[bi]
            keep = da < db
            return pa.table(
                {
                    "doc_a": pa.array(da[keep], pa.int64()),
                    "doc_b": pa.array(db[keep], pa.int64()),
                    "cosine": pa.array(sims[ai, bi][keep], pa.float64()),
                }
            )

        return emb_ds.select_columns([id_col, vec_col]).map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
        )

    # banded sign-LSH (the default): dim probe reads ONE row, not the table
    first = emb_ds.select_columns([vec_col]).limit(1).take(1)
    dim = len(first[0][vec_col]) if first else 0
    rng = np.random.RandomState(seed)
    hp = rng.normal(size=(dim, bands * planes)) if dim else np.zeros((0, bands * planes))
    nbk = np.uint64(n_buckets)

    def bucket(batch: pa.Table) -> pa.Table:
        bids = np.asarray(batch[id_col], dtype=np.int64)
        bmat = list_column_to_matrix(batch[vec_col])
        bn = np.linalg.norm(bmat, axis=1)
        bn[bn == 0] = 1.0
        # sign of the RAW dot (norms are positive, so identical to the
        # normalized sign) — one less divide, and the same expression a SQL
        # oracle can state as list_dot_product(embedding, hyperplane) > 0
        signs = (bmat @ hp) > 0  # (n, bands*planes)
        keys = np.zeros((len(bids), bands), dtype=np.uint64)
        for bi_ in range(bands):
            for j in range(planes):
                keys[:, bi_] |= signs[:, bi_ * planes + j].astype(np.uint64) << np.uint64(j)
            keys[:, bi_] = keys[:, bi_] * _MIX + np.uint64(bi_)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), len(bids)), pa.int32()),
                "band_key": pa.array(keys.T.reshape(-1).astype(np.int64), pa.int64()),
                "band_bucket": pa.array((keys.T.reshape(-1) % nbk).astype(np.int64), pa.int64()),
                "vec_id": pa.array(np.tile(bids, bands), pa.int64()),
                "vec": matrix_to_list_column(np.tile(bmat, (bands, 1))),
                "norm": pa.array(np.tile(bn, bands), pa.float64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one Python call per COARSE (band, bucket) group; inside, vectorized
        # per-signature segments with a small exact-cosine matmul each
        keys = g["band_key"].to_numpy(np.int64)
        ids_ = g["vec_id"].to_numpy(np.int64)
        order = np.lexsort((ids_, keys))
        keys, ids_ = keys[order], ids_[order]
        vecs = np.array(g["vec"].tolist(), dtype=np.float64)[order]
        nn = g["norm"].to_numpy(np.float64)[order]
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        out_a, out_b, out_c = [], [], []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            if hi - lo < 2:
                continue
            hi = min(hi, lo + max_bucket)  # degenerate-cluster cap (deterministic)
            m, n_ = vecs[lo:hi], nn[lo:hi]
            sims = (m @ m.T) / np.outer(n_, n_)
            ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
            if not len(ia):
                continue
            out_a.append(ids_[lo:hi][ia])
            out_b.append(ids_[lo:hi][ib])
            out_c.append(sims[ia, ib])
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=np.int64),
                 "doc_b": pd.Series([], dtype=np.int64),
                 "cosine": pd.Series([], dtype=np.float64)}
            )
        da = np.concatenate(out_a)
        db = np.concatenate(out_b)
        cs = np.concatenate(out_c)
        swap = da > db
        da[swap], db[swap] = db[swap], da[swap]
        return pd.DataFrame({"doc_a": da, "doc_b": db, "cosine": cs})

    cand = (
        emb_ds.select_columns([id_col, vec_col])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
        .groupby(["band", "band_bucket"])
        .map_groups(pairs, batch_format="pandas", runtime_env=_rte())
    )
    return _distinct_pairs(cand, n_buckets)


# ---------------------------------------------------------------------------
# Distributed exact-Jaccard verification of candidate pairs
# ---------------------------------------------------------------------------


def exact_jaccard_for_pairs_dataset(docs_ds, pairs_ds, cfg: PipelineConfig,
                                    threshold: float = 0.0,
                                    text_col: str = "text", id_col: str = "doc_id",
                                    n_buckets: int = _N_BUCKETS):
    """Distributed verify stage: exact shingle-set Jaccard for candidate
    (doc_a, doc_b) pairs — the scale path of ``exact_jaccard_for_pairs``
    (which is driver-side and fine only while the candidate set is small).

    Plan: per-doc sorted shingle-hash arrays travel as an Arrow list
    column; two coarse-bucketed hash joins attach first doc_a's set then
    doc_b's set to each pair (sets and pairs are unioned into one Dataset
    per stage and matched inside a vectorized pandas merge per coarse
    bucket — the engine's standard both-sides-large join shape, SURVEY.md
    §2.4 note).  The per-pair intersection is a C-level ``intersect1d`` on
    the two sorted arrays.  Nothing materializes on the driver.
    """
    k = cfg.shingle_k
    nbk = np.uint64(n_buckets)
    _EMPTY = np.zeros(0, dtype=np.int64)

    def doc_sets(batch: pa.Table) -> pa.Table:
        sh, ns = _shingle_hashes(batch[text_col], k)
        offs = np.zeros(len(ns) + 1, dtype=np.int64)
        np.cumsum(ns, out=offs[1:])
        return pa.table(
            {
                "kind": pa.array(np.zeros(len(ns), dtype=np.int8), pa.int8()),
                "doc_a": batch[id_col],
                "doc_b": pa.array(np.zeros(len(ns), dtype=np.int64), pa.int64()),
                "sh": pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()).cast(pa.int32()),
                    pa.array(sh.astype(np.int64), pa.int64()),
                ),
                "n": pa.array(ns, pa.int64()),
            }
        )

    def tag_pairs(batch: pa.Table) -> pa.Table:
        m = len(batch)
        empty = pa.ListArray.from_arrays(
            pa.array(np.zeros(m + 1, dtype=np.int32)), pa.array([], pa.int64())
        )
        return pa.table(
            {
                "kind": pa.array(np.ones(m, dtype=np.int8), pa.int8()),
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "sh": empty,
                "n": pa.array(np.zeros(m, dtype=np.int64), pa.int64()),
            }
        )

    def bucket_on(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            key = np.asarray(batch[col], dtype=np.int64).astype(np.uint64)
            b = ((key * _MIX) % nbk).astype(np.int64)
            return batch.append_column("bkt", pa.array(b, pa.int64()))
        return fn

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        """Within one bucket: pair rows (kind=1) pick up the set of their
        doc_a from the co-located set rows (kind=0); all rows keep the
        unified schema so stage 2 can union sets and half-joined pairs."""
        sets_g = g[g["kind"] == 0]
        prs_g = g[g["kind"] == 1]
        if len(prs_g) == 0:
            # typed empty frame matching the unified schema — a schema-less
            # DataFrame() makes Ray log block-schema-mismatch warnings and
            # would break under strict schema unification
            return g.drop(columns=["bkt"]).iloc[0:0]
        lut = pd.Series(sets_g["sh"].to_numpy(), index=sets_g["doc_a"].to_numpy())
        nlut = pd.Series(sets_g["n"].to_numpy(), index=sets_g["doc_a"].to_numpy())
        keys = prs_g["doc_a"].to_numpy()
        hit = pd.Index(keys).isin(lut.index)
        vals = np.empty(len(prs_g), dtype=object)
        vals[:] = [
            np.sort(np.asarray(lut.loc[kk], dtype=np.int64)) if h else _EMPTY
            for kk, h in zip(keys, hit)
        ]
        res = prs_g.drop(columns=["bkt"]).copy()
        res["sh"] = vals  # doc_a's set rides in the shared sh column
        res["n"] = np.where(
            hit, nlut.reindex(keys).fillna(0).to_numpy(), 0
        ).astype(np.int64)
        return res

    sets = docs_ds.select_columns([id_col, text_col]).map_batches(
        doc_sets, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
    )
    prs = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow",
                               zero_copy_batch=True, runtime_env=_rte())

    stage1 = (
        sets.union(prs)
        .map_batches(bucket_on("doc_a"), batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby("bkt")
        .map_groups(attach, batch_format="pandas", runtime_env=_rte())
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        sets_g = g[g["kind"] == 0]
        prs_g = g[g["kind"] == 1]
        empty = pd.DataFrame(
            {"doc_a": pd.Series([], dtype=np.int64),
             "doc_b": pd.Series([], dtype=np.int64),
             "jaccard": pd.Series([], dtype=np.float64)}
        )
        if len(prs_g) == 0:
            return empty
        lut = pd.Series(sets_g["sh"].to_numpy(), index=sets_g["doc_a"].to_numpy())
        nlut = pd.Series(sets_g["n"].to_numpy(), index=sets_g["doc_a"].to_numpy())
        keys = prs_g["doc_b"].to_numpy()
        hit = pd.Index(keys).isin(lut.index)
        jac = np.zeros(len(prs_g))
        a_sets = prs_g["sh"].to_numpy()
        n_a = prs_g["n"].to_numpy(dtype=np.int64)
        for i, (kk, h) in enumerate(zip(keys, hit)):
            b = np.sort(np.asarray(lut.loc[kk], dtype=np.int64)) if h else _EMPTY
            a = np.asarray(a_sets[i], dtype=np.int64)
            inter = np.intersect1d(a, b, assume_unique=True).size
            union = int(n_a[i]) + (int(nlut.loc[kk]) if h else 0) - inter
            jac[i] = inter / union if union else 1.0
        out = pd.DataFrame(
            {"doc_a": prs_g["doc_a"].to_numpy(np.int64),
             "doc_b": prs_g["doc_b"].to_numpy(np.int64),
             "jaccard": jac}
        )
        out = out[out["jaccard"] >= threshold]
        return out if len(out) else empty

    # stage 2: sets rebucket on their own id, half-joined pairs on doc_b
    def bucket_b(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        key = np.where(batch["kind"].to_numpy() == 0,
                       batch["doc_a"].to_numpy(np.int64),
                       batch["doc_b"].to_numpy(np.int64)).astype(np.uint64)
        batch["bkt"] = ((key * _MIX) % nbk).astype(np.int64)
        return batch

    sets_pd = sets.map_batches(lambda b: b, batch_format="pandas", runtime_env=_rte())
    return (
        sets_pd.union(stage1)
        .map_batches(bucket_b, batch_format="pandas", runtime_env=_rte())
        .groupby("bkt")
        .map_groups(finish, batch_format="pandas", runtime_env=_rte())
    )


# ---------------------------------------------------------------------------
# cross-document line dedup (C4-style corpus curation)
# ---------------------------------------------------------------------------


def _explode_lines(text_col: str, id_col: str):
    """map_batches fn: docs -> (doc_id, line_idx, line) rows, Arrow-native
    split; shared by the count pass and the filter pass."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        lines = pc.split_pattern(pc.cast(batch[text_col], pa.string()), "\n")
        flat_a = pc.list_flatten(lines)  # stays Arrow for the line column
        lens = np.asarray(pc.list_value_length(lines), dtype=np.int64)
        ids = np.repeat(np.asarray(batch[id_col], dtype=np.int64), lens)
        starts = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        idxs = np.arange(len(flat_a), dtype=np.int64) - np.repeat(starts[:-1], lens)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "line_idx": pa.array(idxs, pa.int64()),
            "line": flat_a,
        })

    return fn


def remove_duplicate_lines(ds, min_count: int = 2, text_col: str = "text",
                           id_col: str = "doc_id", n_buckets: int = _N_BUCKETS,
                           n_salts: int = 16):
    """C4-style line-level corpus dedup: any LINE occurring ``min_count``
    or more times across the whole corpus (boilerplate, navigation chrome,
    license banners) is removed from every document; documents are
    reassembled from their surviving lines in original order.  Documents
    whose every line is removed drop from the output entirely (matching a
    SQL string_agg-over-no-rows reconstruction).

    Skew-proof three-phase shape (the round-2 design routed EVERY
    occurrence of a line to one group — a ubiquitous line put N rows in a
    single pandas frame):

    1. count pass: per-batch (line, cnt) partials -> tiny
       ``groupby(line).sum`` (a hot line costs one partial row per batch —
       the combiner is the skew handling) -> lines with cnt >= min_count
       form the small DUPLICATE-LINE table;
    2. filter pass: re-explode the corpus; data rows group by the SALTED
       key ``(hash(line) % B) * S + (mix(doc_id) % S)`` and each duplicate
       line is replicated to its bucket's S salt groups, so membership is
       tested by EXACT string inside a group holding at most ~1/S of any
       hot line's occurrences;
    3. group survivors by ``hash(doc_id) % n_buckets`` -> per-doc ordered
       rejoin of the kept lines.

    The corpus is exploded twice (the two passes cannot share a streaming
    Dataset without materializing it) — the split is a cheap Arrow kernel
    and both passes stream.  Counting and membership are over the exact
    line string end-to-end; hashes only route.
    """
    import pandas as pd

    nbk = np.int64(n_buckets)
    B, S = np.uint64(n_buckets), np.uint64(n_salts)
    s_int = int(n_salts)
    explode = _explode_lines(text_col, id_col)

    # --- pass 1: corpus-wide line counts (combiner; skew-free) ----------
    def count_partial(batch: pa.Table) -> pa.Table:
        t = explode(batch)
        g = t.select(["line"]).group_by("line", use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"line": g["line"],
                         "cnt": g["count_all"].cast(pa.int64())})

    from ray.data.aggregate import Sum

    dup_lines = (
        ds.select_columns([id_col, text_col])
        .map_batches(count_partial, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby("line").aggregate(Sum("cnt", alias_name="cnt"))
        .filter(expr=f"cnt >= {int(min_count)}")
    )

    # --- pass 2: salted replicate membership filter ---------------------
    def tag_data(batch: pa.Table) -> pa.Table:
        t = explode(batch)
        flat = np.asarray(t["line"], dtype=object)
        h = _hash_strings(flat) if len(flat) else np.zeros(0, dtype=np.uint64)
        dh = np.asarray(t[id_col], dtype=np.int64).astype(np.uint64)
        gbkt = (((h * _MIX) % B) * S + (dh * _MIX) % S).astype(np.int64)
        n = len(t)
        return pa.table({
            id_col: t[id_col],
            "line_idx": t["line_idx"],
            "line": t["line"],
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "gbkt": pa.array(gbkt, pa.int64()),
        })

    def tag_dups(batch: pa.Table) -> pa.Table:
        flat = np.asarray(batch["line"], dtype=object)
        h = _hash_strings(flat) if len(flat) else np.zeros(0, dtype=np.uint64)
        base = ((h * _MIX) % B) * S
        n = len(flat)
        gbkt = (np.repeat(base, s_int)
                + np.tile(np.arange(s_int, dtype=np.uint64), n)).astype(np.int64)
        return pa.table({
            id_col: pa.nulls(n * s_int, pa.int64()),
            "line_idx": pa.nulls(n * s_int, pa.int64()),
            "line": pa.array(np.repeat(flat, s_int), pa.string()),
            "side": pa.array(np.ones(n * s_int, np.int8), pa.int8()),
            "gbkt": pa.array(gbkt, pa.int64()),
        })

    def filter_group(g: pd.DataFrame) -> pd.DataFrame:
        data = g[g["side"] == 0]
        if len(data) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                "line_idx": pd.Series([], dtype=np.int64),
                "line": pd.Series([], dtype=object),
            })
        dup = g.loc[g["side"] == 1, "line"]
        keep = ~data["line"].isin(set(dup))
        return data.loc[keep, [id_col, "line_idx", "line"]]

    data_t = (
        ds.select_columns([id_col, text_col])
        .map_batches(tag_data, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
    )
    dup_t = dup_lines.map_batches(tag_dups, batch_format="pyarrow",
                                  runtime_env=_rte())
    survivors = (
        data_t.union(dup_t)
        .groupby("gbkt")
        .map_groups(lambda g: filter_group(g.drop(columns=["gbkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )

    # --- pass 3: per-doc ordered reassembly -----------------------------
    def rebucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        ids = batch[id_col].to_numpy(np.int64).astype(np.uint64)
        batch["dbkt"] = ((ids * _MIX) % np.uint64(nbk)).astype(np.int64)
        return batch

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "line_idx"], kind="stable")
        joined = g.groupby(id_col, sort=True)["line"].agg("\n".join)
        kept = g.groupby(id_col, sort=True)["line"].size()
        return pd.DataFrame({
            id_col: joined.index.to_numpy(np.int64),
            "clean_text": joined.to_numpy(object),
            "n_kept_lines": kept.to_numpy(np.int64),
        })

    return (
        survivors.map_batches(rebucket, batch_format="pandas", runtime_env=_rte())
        .groupby("dbkt")
        .map_groups(lambda g: reassemble(g.drop(columns=["dbkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )

"""Fuzzy (edit-distance) entity resolution over a key column.

The dedup family's third metric after set-overlap (MinHash/Jaccard,
stages/dedupe.py) and vector cosine (embedding LSH): LEVENSHTEIN distance
between short keys — catalog names, titles, usernames — the classic
record-linkage measure (reference analogue: the lexical normalization +
string-matching passes, src/core/util/definitions.py token tables; here
generalized to an operator).

Semantics: over the DISTINCT values of ``key_col``, every unordered pair
(a < b lexicographically) with ``levenshtein(a, b) <= max_dist``.

Scale shape:
1. **Distinct first.**  The pair space is quadratic, so the operator runs
   over the deduped key table (per-batch Arrow distinct combiner -> one
   groupby), whose cardinality is the vocabulary of the column, not the
   row count — the same bound the term dictionary and the PMI vocab rely
   on.  Exact/near duplicate ROWS are the other operators' job.
2. **Lossless length banding.**  ``levenshtein(a, b) >= |len(a)-len(b)|``,
   so with band ``len // W`` and ``W = max_dist + 1`` every qualifying
   pair has equal or adjacent bands.  Each key is emitted to its home
   band and to ``band + 1`` as a visitor; a band group pairs home x home
   and visitor x home — every candidate exactly once, no post-dedup, no
   all-to-all.
3. **Vectorized DP.**  The classic O(La*Lb) dynamic program runs with the
   PAIR axis vectorized: each DP cell update is one ndarray op over all
   pairs in the bucket (strings become uint32 code matrices via a numpy
   '<U' view — no per-char Python).  Intended for short keys (the DP is
   O(max_len^2) vector ops); a band bigger than ``max_block`` raises with
   guidance rather than silently going quadratic (same contract as the
   hash-join skew guard, stages/joins.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def levenshtein_distances(a, b) -> np.ndarray:
    """Exact Levenshtein distance for each aligned pair (a[i], b[i]).

    Vectorized across pairs: the (La+1) x (Lb+1) DP advances one cell at a
    time, but every update is a whole-ndarray op over the pair axis.
    Strings must not contain NUL (u'\\0' is the numpy '<U' pad)."""
    a = np.asarray(a, dtype="U")
    b = np.asarray(b, dtype="U")
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    La = a.dtype.itemsize // 4
    Lb = b.dtype.itemsize // 4
    Am = (a.view(np.uint32).reshape(n, La) if La
          else np.zeros((n, 0), np.uint32))
    Bm = (b.view(np.uint32).reshape(n, Lb) if Lb
          else np.zeros((n, 0), np.uint32))
    la = (Am != 0).sum(axis=1)
    lb = (Bm != 0).sum(axis=1)
    res = np.where(lb == 0, la, 0).astype(np.int64)
    prev = np.tile(np.arange(La + 1, dtype=np.int64), (n, 1))
    cur = np.empty_like(prev)
    rows = np.arange(n)
    for j in range(1, Lb + 1):
        bj = Bm[:, j - 1]
        cur[:, 0] = j
        for i in range(1, La + 1):
            cost = (Am[:, i - 1] != bj).astype(np.int64)
            np.minimum(cur[:, i - 1] + 1, prev[:, i] + 1, out=cur[:, i])
            np.minimum(cur[:, i], prev[:, i - 1] + cost, out=cur[:, i])
        done = lb == j
        if done.any():
            res[done] = cur[rows[done], la[done]]
        prev, cur = cur, prev
    return res


def osa_distances(a, b) -> np.ndarray:
    """Optimal-string-alignment distance (Damerau restricted: Levenshtein
    + ADJACENT TRANSPOSITION as one edit, no substring re-edit) for each
    aligned pair — Lucene's ``FuzzyQuery(transpositions=true)`` metric.

    Same pair-axis vectorization as ``levenshtein_distances``, with one
    extra DP row kept for the transposition case.  NOTE: OSA, not full
    Damerau-Levenshtein — OSA('ca','abc') = 3 while full DL = 2; the two
    agree for all pairs at distance <= 1 (a single edit never re-edits),
    which is the fuzzy-query operating point."""
    a = np.asarray(a, dtype="U")
    b = np.asarray(b, dtype="U")
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    La = a.dtype.itemsize // 4
    Lb = b.dtype.itemsize // 4
    Am = (a.view(np.uint32).reshape(n, La) if La
          else np.zeros((n, 0), np.uint32))
    Bm = (b.view(np.uint32).reshape(n, Lb) if Lb
          else np.zeros((n, 0), np.uint32))
    la = (Am != 0).sum(axis=1)
    lb = (Bm != 0).sum(axis=1)
    res = np.where(lb == 0, la, 0).astype(np.int64)
    prev2 = np.tile(np.arange(La + 1, dtype=np.int64), (n, 1))  # row j-2
    prev = prev2.copy()                                         # row j-1
    cur = np.empty_like(prev)
    rows = np.arange(n)
    for j in range(1, Lb + 1):
        bj = Bm[:, j - 1]
        cur[:, 0] = j
        for i in range(1, La + 1):
            cost = (Am[:, i - 1] != bj).astype(np.int64)
            np.minimum(cur[:, i - 1] + 1, prev[:, i] + 1, out=cur[:, i])
            np.minimum(cur[:, i], prev[:, i - 1] + cost, out=cur[:, i])
            if i >= 2 and j >= 2:
                tr = (Am[:, i - 1] == Bm[:, j - 2]) \
                    & (Am[:, i - 2] == bj) & (cost == 1)
                if tr.any():
                    cur[tr, i] = np.minimum(cur[tr, i],
                                            prev2[tr, i - 2] + 1)
        done = lb == j
        if done.any():
            res[done] = cur[rows[done], la[done]]
        prev2, prev, cur = prev, cur, prev2
    return res


def _band_pairs(g: pd.DataFrame, key: str, max_dist: int,
                max_block: int) -> pd.DataFrame:
    """One length band: home x home + visitor x home candidate pairs,
    vectorized DP, keep dist <= max_dist.  Ordered (a < b) by string."""
    if len(g) > max_block:
        raise ValueError(
            f"fuzzy band holds {len(g)} distinct keys (> max_block="
            f"{max_block}): the column's vocabulary is too dense per "
            "length band for pairwise edit distance — raise max_block "
            "deliberately, pre-filter the key table, or use the MinHash "
            "path (stages/dedupe.py) for this column")
    home = np.sort(g.loc[g["is_home"] == 1, key].to_numpy(dtype=object))
    vis = np.sort(g.loc[g["is_home"] == 0, key].to_numpy(dtype=object))
    parts_a, parts_b = [], []
    if len(home) >= 2:
        ii, jj = np.triu_indices(len(home), k=1)
        parts_a.append(home[ii])  # sorted, so home[ii] < home[jj]
        parts_b.append(home[jj])
    if len(home) and len(vis):
        va = np.repeat(vis, len(home))
        hb = np.tile(home, len(vis))
        swap = va > hb
        parts_a.append(np.where(swap, hb, va))
        parts_b.append(np.where(swap, va, hb))
    if not parts_a:
        # typed empties: Ray's block size estimator chokes on size-0
        # object columns
        return pd.DataFrame({"name_a": pd.Series([], dtype="string"),
                             "name_b": pd.Series([], dtype="string"),
                             "dist": pd.Series([], dtype=np.int64)})
    pa_ = np.concatenate(parts_a)
    pb_ = np.concatenate(parts_b)
    d = levenshtein_distances(pa_, pb_)
    keep = d <= max_dist
    return pd.DataFrame({"name_a": pa_[keep], "name_b": pb_[keep],
                         "dist": d[keep].astype(np.int64)})


def fuzzy_key_pairs(ds, key_col: str, max_dist: int = 3,
                    max_block: int = 20_000):
    """Dataset -> Dataset(name_a, name_b, dist): unordered distinct-value
    pairs of ``key_col`` within ``max_dist`` edits (name_a < name_b)."""
    import pyarrow.compute as pc

    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    W = max_dist + 1

    def distinct_partial(batch: pa.Table) -> pa.Table:
        return batch.select([key_col]).group_by(
            key_col, use_threads=False).aggregate([])

    def to_bands(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        band = pc.divide(pc.utf8_length(keys), W)
        home = pa.table({key_col: keys,
                         "band": band.cast(pa.int64()),
                         "is_home": pa.array(np.ones(len(keys), np.int8))})
        visitor = pa.table({key_col: keys,
                            "band": pc.add(band, 1).cast(pa.int64()),
                            "is_home": pa.array(np.zeros(len(keys), np.int8))})
        return pa.concat_tables([home, visitor])

    distinct = (
        ds.select_columns([key_col])
        .map_batches(distinct_partial, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby(key_col).count()
        .drop_columns(["count()"])
    )
    return (
        distinct.map_batches(to_bands, batch_format="pyarrow",
                             runtime_env=_rte())
        .groupby("band")
        .map_groups(lambda g: _band_pairs(g, key_col, max_dist, max_block),
                    batch_format="pandas", runtime_env=_rte())
    )


def jaro_winkler_similarities(a, b) -> np.ndarray:
    """Jaro-Winkler similarity for each aligned pair (a[i], b[i]) —
    the standard Winkler variant DuckDB's jaro_winkler_similarity
    implements (probed: boost threshold 0.7 strict, prefix cap 4,
    p = 0.1, match window max(|a|,|b|)//2 - 1).

    Pair-axis vectorized like the edit-distance DPs: the greedy Jaro
    matching advances one (i, j) character cell at a time but every
    update is a whole-ndarray op; transposition counting compacts the
    matched characters with cumsum scatter — no per-pair Python."""
    a = np.asarray(a, dtype="U")
    b = np.asarray(b, dtype="U")
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    La = a.dtype.itemsize // 4
    Lb = b.dtype.itemsize // 4
    Am = (a.view(np.uint32).reshape(n, La) if La
          else np.zeros((n, 0), np.uint32))
    Bm = (b.view(np.uint32).reshape(n, Lb) if Lb
          else np.zeros((n, 0), np.uint32))
    la = (Am != 0).sum(axis=1).astype(np.int64)
    lb = (Bm != 0).sum(axis=1).astype(np.int64)
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    used_b = np.zeros((n, Lb), dtype=bool)
    matched_a = np.zeros((n, La), dtype=bool)
    for i in range(La):
        ai = Am[:, i]
        found = np.zeros(n, dtype=bool)
        lo = np.maximum(i - w, 0)
        hi = np.minimum(i + w + 1, lb)
        for j in range(Lb):
            ok = ((ai != 0) & ~found & (j >= lo) & (j < hi)
                  & (Bm[:, j] == ai) & ~used_b[:, j])
            if ok.any():
                used_b[ok, j] = True
                found |= ok
        matched_a[:, i] = found
    m = matched_a.sum(axis=1).astype(np.int64)
    t = np.zeros(n, dtype=np.float64)
    maxm = int(m.max()) if n else 0
    if maxm:
        ca = np.zeros((n, maxm), dtype=np.uint32)
        cb = np.zeros((n, maxm), dtype=np.uint32)
        idxa = matched_a.cumsum(axis=1) - 1
        rows, cols = np.nonzero(matched_a)
        ca[rows, idxa[rows, cols]] = Am[rows, cols]
        idxb = used_b.cumsum(axis=1) - 1
        rows, cols = np.nonzero(used_b)
        cb[rows, idxb[rows, cols]] = Bm[rows, cols]
        # RapidFuzz (DuckDB's implementation) TRUNCATES: an odd mismatch
        # count floors to mismatches // 2 transpositions (probed: the
        # divergent pairs all have odd mismatch counts)
        t = (((ca != cb) & (ca != 0)).sum(axis=1) // 2).astype(np.float64)
    jaro = np.zeros(n, dtype=np.float64)
    nz = m > 0
    mf = m.astype(np.float64)
    jaro[nz] = (mf[nz] / la[nz] + mf[nz] / lb[nz]
                + (mf[nz] - t[nz]) / mf[nz]) / 3.0
    l = np.zeros(n, dtype=np.int64)
    live = np.ones(n, dtype=bool)
    for i in range(min(4, La, Lb)):
        live = live & (Am[:, i] == Bm[:, i]) & (Am[:, i] != 0)
        l += live
    return np.where(jaro > 0.7, jaro + l * 0.1 * (1.0 - jaro), jaro)


def _jw_block_pairs(g: pd.DataFrame, key: str, min_sim_e6: int,
                    max_block: int) -> pd.DataFrame:
    if len(g) > max_block:
        raise ValueError(
            f"JW block holds {len(g)} distinct keys (> max_block="
            f"{max_block}): the first-character block is too dense for "
            "pairwise similarity — pre-filter the key table or extend "
            "the blocking key")
    keys = np.sort(g[key].to_numpy(dtype=object))
    if len(keys) < 2:
        return pd.DataFrame({"name_a": pd.Series([], dtype="string"),
                             "name_b": pd.Series([], dtype="string"),
                             "jw_e6": pd.Series([], dtype=np.int64)})
    ii, jj = np.triu_indices(len(keys), k=1)
    sim = jaro_winkler_similarities(keys[ii], keys[jj])
    e6 = np.floor(sim * 1e6 + 0.5).astype(np.int64)
    keep = e6 >= min_sim_e6
    return pd.DataFrame({"name_a": keys[ii][keep],
                         "name_b": keys[jj][keep],
                         "jw_e6": e6[keep]})


def jw_key_pairs(ds, key_col: str, min_sim_e6: int = 900_000,
                 max_block: int = 20_000):
    """Dataset -> Dataset(name_a, name_b, jw_e6): unordered distinct-
    value pairs of ``key_col`` with Jaro-Winkler similarity >=
    ``min_sim_e6`` (name_a < name_b) — the record-linkage companion to
    ``fuzzy_key_pairs`` under the similarity metric instead of edit
    distance.

    Blocking: FIRST CHARACTER (JW has no length-band bound like
    Levenshtein's; first-char blocking is the classic ER choice and
    matches Winkler's prefix emphasis — a pair differing in its first
    character is both unboosted and rarely above threshold).  The
    blocking is part of the operator's CONTRACT (the SQL oracle states
    the same predicate), not a silent recall loss."""

    def distinct_partial(batch: pa.Table) -> pa.Table:
        return batch.select([key_col]).group_by(
            key_col, use_threads=False).aggregate([])

    def to_blocks(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pandas().astype(str)
        nonempty = keys.str.len() > 0
        keys = keys[nonempty]
        first = keys.str[0].map(ord).astype(np.int64)
        return pa.table({key_col: pa.array(keys.to_numpy(object),
                                           pa.string()),
                         "blk": pa.array(first.to_numpy(np.int64),
                                         pa.int64())})

    distinct = (
        ds.select_columns([key_col])
        .map_batches(distinct_partial, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby(key_col).count()
        .drop_columns(["count()"])
    )
    return (
        distinct.map_batches(to_blocks, batch_format="pyarrow",
                             runtime_env=_rte())
        .groupby("blk")
        .map_groups(lambda g: _jw_block_pairs(g, key_col, min_sim_e6,
                                              max_block),
                    batch_format="pandas", runtime_env=_rte())
    )

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

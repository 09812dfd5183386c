"""Exact distributed heavy hitters: Misra-Gries candidate sketch + verify.

The classic top-N-frequent question ("which users/terms/URLs dominate the
stream?") done the way a 100 TB engine has to: no global groupby over every
distinct key.  Two streaming passes:

1. **Candidates** — each batch reduces to a Misra-Gries summary of at most
   ``capacity`` keys (vectorized: per-batch value counts, subtract the
   (capacity+1)-th largest count, keep strictly-positive survivors).  A
   per-batch summary under-counts any key by at most batch_rows/(capacity+1),
   and summing summaries keeps the error additive, so the merged estimate of
   any key with TRUE count > total_rows/(capacity+1) stays positive — the
   union of survivors is a guaranteed superset of all such keys (Misra &
   Gries 1982 'Finding repeated elements'; the merge bound is
   Agarwal et al. 2013's mergeable-summaries argument).  The merge is a
   small groupby over <= capacity x n_batches rows.

2. **Verify** — exact counts for the candidate set only: the sorted
   candidate array broadcasts once (``ray.put``), each batch contributes a
   searchsorted + bincount partial (combiner: at most |candidates| rows per
   batch, zero Python per row), a tiny groupby sums them.

The emitted top-``n_top`` (count desc, key asc) therefore carries EXACT
counts, and equals the exact top-N whenever the N-th true count exceeds
total/(capacity+1).  ``strict=True`` checks that bound against the verified
counts and raises when the sketch cannot certify exactness (the fix is a
larger capacity) — the result is never silently approximate.

Reference capability: the vote/term histograms of SURVEY.md G2/G6 at
bounded memory (reference: src/core/feature_extraction/features.py's
term-frequency tallies), re-expressed as a mergeable sketch + verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def _mg_reduce(keys: np.ndarray, counts: np.ndarray, capacity: int):
    """One Misra-Gries reduction: keep <= capacity keys, each decremented
    by the (capacity+1)-th largest count (0 if the table already fits)."""
    if len(keys) <= capacity:
        return keys, counts
    thresh = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1
    ]
    keep = counts > thresh
    return keys[keep], counts[keep] - thresh


def mg_candidates(ds, col: str, capacity: int):
    """Pass 1: Dataset -> merged Misra-Gries summary (key, est, pruned) — a
    superset of every key with true count > total/(capacity+1).  ``pruned``
    (max-aggregated 0/1) records whether ANY batch actually dropped keys:
    when it stays 0 the candidate set is exhaustive (every distinct key),
    which upgrades the exactness certificate unconditionally."""
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch[col])
        keys, counts = np.unique(vals, return_counts=True)
        pruned = len(keys) > capacity
        keys, counts = _mg_reduce(keys, counts.astype(np.int64), capacity)
        return pa.table({
            col: pa.array(keys),
            "est": pa.array(counts, pa.int64()),
            "pruned": pa.array(np.full(len(keys), pruned, dtype=np.int64)),
        })

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby(col)
        .aggregate(Sum("est", alias_name="est"), Max("pruned", alias_name="pruned"))
    )


def heavy_hitters(ds, col: str, n_top: int = 20, capacity: int = 4096,
                  strict: bool = True) -> pd.DataFrame:
    """Top-``n_top`` most frequent values of ``col`` with EXACT counts.

    Returns a DataFrame (col, n_rows) ordered (n_rows desc, key asc).
    ``strict`` raises unless the Misra-Gries bound certifies the result
    equals the exact top-N (n_top-th count > total/(capacity+1))."""
    import ray
    from ray.data.aggregate import Sum

    cand_df = mg_candidates(ds, col, capacity).to_pandas()
    cand = np.sort(np.asarray(cand_df[col]))
    if len(cand) == 0:
        return pd.DataFrame({col: pd.Series([], dtype=object),
                             "n_rows": pd.Series([], dtype=np.int64)})
    cand_ref = ray.put(cand)

    def exact_partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cand_ref) if isinstance(cand_ref, ray.ObjectRef) else cand_ref
        vals = np.asarray(batch[col])
        n_rows = len(vals)
        pos = np.searchsorted(c, vals)
        pos_c = np.minimum(pos, len(c) - 1)
        ok = c[pos_c] == vals
        cnt = np.bincount(pos_c[ok], minlength=len(c))
        nz = np.flatnonzero(cnt)
        # idx -1 carries this batch's row count (for the certify bound)
        return pa.table({
            "idx": pa.array(np.r_[nz, -1].astype(np.int64), pa.int64()),
            "n": pa.array(np.r_[cnt[nz], n_rows].astype(np.int64), pa.int64()),
        })

    got = (
        ds.select_columns([col])
        .map_batches(exact_partial, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("idx")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = int(got.loc[got["idx"] == -1, "n"].sum())
    got = got[got["idx"] >= 0]
    out = pd.DataFrame({col: cand[got["idx"].to_numpy(np.int64)],
                        "n_rows": got["n"].to_numpy(np.int64)})
    out = out.sort_values(["n_rows", col], ascending=[False, True],
                          kind="stable").head(n_top).reset_index(drop=True)
    exhaustive = len(cand_df) == 0 or int(cand_df["pruned"].max()) == 0
    if strict and not exhaustive:
        # exactness certificate: every non-candidate key has true count
        # <= total/(capacity+1), so the returned top-N is the exact top-N
        # iff N certified rows exist and the N-th strictly beats that bound
        # (when no batch ever pruned, candidates are ALL keys — exact
        # unconditionally, including short results)
        bound = total / (capacity + 1)
        if len(out) < n_top or not out["n_rows"].iloc[-1] > bound:
            nth = int(out["n_rows"].iloc[-1]) if len(out) else 0
            raise ValueError(
                f"cannot certify exact top-{n_top}: have {len(out)} "
                f"candidates, n-th count {nth} vs total/(capacity+1) = "
                f"{bound:.1f}; increase capacity")
    return out

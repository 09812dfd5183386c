"""PMI collocation extraction: top-k term pairs by pointwise mutual
information over document co-occurrence.

Reference analogue: the reference's word2vec ``most_similar`` term
association (src/core/feature_extraction/features.py:224-235) is its only
term-association operator; PMI is the corpus-statistics counterpart a
training-data pipeline runs to find collocations / multi-word expressions.

Semantics (presence-based, documents as contexts):
    PMI(a, b) = ln( P(a, b) / (P(a) P(b)) )
              = ln( c_ab * N / (df_a * df_b) )
with N = total documents, df_t = documents containing t, c_ab = documents
containing both.  Terms are filtered to ``min_df <= df <= max_df_ratio*N``
first (drops hapaxes and stopword-ish terms — the standard collocation
move), pairs to ``c_ab >= min_pair_count``.

Distribution shape (round-4 rework — no driver-side vocab dict, no per-doc
Python loop):
- df table from the existing skew-free combiner (one partial row per
  (term, batch)); the ``min_df``/``max_df`` filter runs DISTRIBUTED on that
  dataset, so only the post-filter vocabulary ever reaches the driver;
- the kept vocabulary is broadcast once via ``ray.put`` as a
  lexicographically SORTED Arrow string array + an aligned int64 df vector
  (columnar, not a pickled Python dict); membership + term->index mapping
  inside each batch is ``pyarrow.compute.index_in`` (C++ hash probe), so
  index order == string order and pair (ia < ib) == (ta < tb);
- pair emission is fully vectorized across ALL documents in the batch
  (repeat/cumsum index arithmetic — the joins.py searchsorted family's
  trick), then combined per batch with one ``np.unique`` over the packed
  ``ia*V+ib`` key, so a hot pair costs one row per batch and the global
  ``groupby(ia, ib).sum`` runs over combiner output of integer keys;
- per-doc pair explosion is O(distinct_kept_terms^2); max_df_ratio bounds
  the ubiquitous terms, min_df the rare ones.  Packed keys need V^2 < 2^63,
  i.e. post-filter vocab < ~3e9 terms — far above any realistic corpus.

Publication: pmi_e6 = floor(ln(double(c*N) / double(df_a*df_b)) * 1e6
+ 0.5) — a single ln of the same exact rational on both sides (no float
accumulation), so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte


def kept_vocab(df_ds, min_df: int, max_df: int) -> tuple[pa.Array, np.ndarray]:
    """Filter the (term, df) dataset DISTRIBUTED, then collect only the
    surviving vocabulary as (sorted Arrow string array, aligned int64 df).

    The sort is driver-side but over the post-filter vocab only; index
    order equals lexicographic term order by construction.
    """
    kept = (df_ds.filter(expr=f"df >= {int(min_df)} and df <= {int(max_df)}")
            .to_pandas())
    if len(kept) == 0:
        return pa.array([], pa.string()), np.zeros(0, dtype=np.int64)
    kept = kept.sort_values("term", kind="stable")
    terms = pa.array(kept["term"].to_numpy(object), pa.string())
    return terms, kept["df"].to_numpy(np.int64)


def emit_pair_indices(t_ids: np.ndarray, seg_starts: np.ndarray,
                      seg_lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment ordered pairs (i < j), vectorized across every
    segment at once — no per-document Python loop.

    ``t_ids`` is segment-grouped and ascending within each segment; returns
    (left ids, right ids) with left < right elementwise.
    """
    n = len(t_ids)
    if n == 0:
        return (np.zeros(0, dtype=np.int64),) * 2
    offs = np.arange(n, dtype=np.int64) - np.repeat(seg_starts, seg_lens)
    rep = np.repeat(seg_lens, seg_lens) - offs - 1
    tot = int(rep.sum())
    if tot == 0:
        return (np.zeros(0, dtype=np.int64),) * 2
    ai = np.repeat(np.arange(n, dtype=np.int64), rep)
    cs = np.cumsum(rep)
    bi = ai + 1 + (np.arange(tot, dtype=np.int64) - np.repeat(cs - rep, rep))
    return t_ids[ai], t_ids[bi]


def _empty_pairs() -> pa.Table:
    return pa.table({"ia": pa.array([], pa.int64()),
                     "ib": pa.array([], pa.int64()),
                     "cnt": pa.array([], pa.int64())})


def pmi_pairs(ds, min_df: int = 2, max_df_ratio: float = 0.5,
              min_pair_count: int = 2, top_k: int = 100,
              text_col: str = "text", id_col: str = "doc_id"):
    """-> pandas DataFrame (ta, tb, pair_count, pmi_e6), the ``top_k``
    pairs by (pmi_e6 desc, ta, tb)."""
    import ray
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages.termstats import term_df_dataset

    n_docs = ds.count()
    max_df = int(np.floor(max_df_ratio * n_docs))
    terms_arr, df_vec = kept_vocab(
        term_df_dataset(ds, text_col=text_col, id_col=id_col), min_df, max_df)
    empty_out = pd.DataFrame({
        "ta": pd.Series([], dtype=object),
        "tb": pd.Series([], dtype=object),
        "pair_count": pd.Series([], dtype=np.int64),
        "pmi_e6": pd.Series([], dtype=np.int64)})
    V = len(terms_arr)
    if V == 0:
        return empty_out
    payload = (terms_arr, df_vec)
    ref = ray.put(payload) if ray.is_initialized() else payload

    def pair_partials(batch: pa.Table) -> pa.Table:
        terms, _ = ray.get(ref) if ray.is_initialized() else ref
        toks = tokenize_column(batch[text_col])
        flat = pc.list_flatten(toks)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        ids = pc.index_in(flat, value_set=terms)
        mask = np.asarray(pc.is_valid(ids), dtype=bool)
        if not mask.any():
            return _empty_pairs()
        idv = np.asarray(pc.fill_null(ids, 0), dtype=np.int64)[mask]
        par = parents[mask]
        # distinct (doc, term) presence, grouped by doc and ascending by
        # vocab index (== lexicographic term order) within each doc
        uk = np.unique(par * np.int64(V) + idv)
        p = uk // V
        t = uk % V
        seg_starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        seg_lens = np.diff(np.append(seg_starts, len(uk)))
        ia, ib = emit_pair_indices(t, seg_starts, seg_lens)
        if len(ia) == 0:
            return _empty_pairs()
        upk, cnt = np.unique(ia * np.int64(V) + ib, return_counts=True)
        return pa.table({"ia": pa.array(upk // V, pa.int64()),
                         "ib": pa.array(upk % V, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    pairs = (
        ds.select_columns([id_col, text_col])
        .map_batches(pair_partials, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby(["ia", "ib"]).aggregate(Sum("cnt", alias_name="pair_count"))
        .filter(expr=f"pair_count >= {int(min_pair_count)}")
    )

    def score(batch: pa.Table) -> pa.Table:
        terms, dfv = ray.get(ref) if ray.is_initialized() else ref
        ia = np.asarray(batch["ia"], dtype=np.int64)
        ib = np.asarray(batch["ib"], dtype=np.int64)
        c = np.asarray(batch["pair_count"], dtype=np.int64)
        # single ln of the exact rational — same arithmetic as the oracle's
        # ln(CAST(c*N AS DOUBLE) / CAST(dfa*dfb AS DOUBLE))
        pmi = np.log((c * np.int64(n_docs)).astype(np.float64)
                     / (dfv[ia] * dfv[ib]).astype(np.float64))
        return pa.table({
            "ta": terms.take(pa.array(ia, pa.int64())),
            "tb": terms.take(pa.array(ib, pa.int64())),
            "pair_count": batch["pair_count"],
            "pmi_e6": pa.array(np.floor(pmi * 1e6 + 0.5).astype(np.int64),
                               pa.int64()),
        })

    out = (
        pairs.map_batches(score, batch_format="pyarrow", runtime_env=_rte())
        .sort(["pmi_e6", "ta", "tb"], descending=[True, False, False])
        .limit(top_k)
        .to_pandas()
    )
    if len(out) == 0:
        return empty_out
    return out

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

Distribution shape:
- df table from the existing skew-free combiner (one partial row per
  (term, batch));
- the FILTERED vocabulary (term -> df) is broadcast once via ``ray.put``
  and read per task — a small-side lookup, never a shuffle join.  The
  documented bound: post-filter vocab must fit the object store (true for
  any realistic min_df/max_df; cap further upstream if not);
- pair generation is per-batch and emits COMBINED (a, b, count) partials
  (pandas groupby inside the batch), so a hot pair costs one row per batch
  and the global ``groupby([a, b]).sum`` is over combiner output;
- per-doc pair explosion is O(distinct_kept_terms^2); max_df_ratio bounds
  the ubiquitous terms, min_df the rare ones.  Pair index templates are
  cached per doc length, so the inner loop is numpy adds only.

Publication: pmi_e6 = floor(ln(double(c*N) / double(df_a*df_b)) * 1e6
+ 0.5) — a single ln of the same exact rational on both sides (no float
accumulation), so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte

_PAIR_TMPL: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _pair_idx(n: int) -> tuple[np.ndarray, np.ndarray]:
    t = _PAIR_TMPL.get(n)
    if t is None:
        a, b = np.triu_indices(n, 1)
        _PAIR_TMPL[n] = t = (a.astype(np.int64), b.astype(np.int64))
    return t


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
    df_tbl = term_df_dataset(ds, text_col=text_col, id_col=id_col).to_pandas()
    kept = df_tbl[(df_tbl["df"] >= min_df) & (df_tbl["df"] <= max_df)]
    vocab = dict(zip(kept["term"], kept["df"].astype(np.int64)))
    ref = ray.put(vocab) if ray.is_initialized() else vocab

    def pair_partials(batch: pa.Table) -> pa.Table:
        v = ray.get(ref) if ray.is_initialized() else ref
        import pyarrow.compute as pc

        toks = tokenize_column(batch[text_col])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        df = (pd.DataFrame({"p": parents, "t": flat})
              .drop_duplicates())
        df = df[df["t"].map(v.__contains__)]
        if len(df) == 0:
            return pa.table({"ta": pa.array([], pa.string()),
                             "tb": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        df = df.sort_values(["p", "t"], kind="stable")
        terms = df["t"].to_numpy(object)
        segs = df["p"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, segs[1:] != segs[:-1]])
        lens = np.diff(np.append(starts, len(segs)))
        ta_parts, tb_parts = [], []
        for s, ln_ in zip(starts, lens):
            if ln_ < 2:
                continue
            ai, bi = _pair_idx(int(ln_))
            ta_parts.append(terms[s + ai])
            tb_parts.append(terms[s + bi])
        if not ta_parts:
            return pa.table({"ta": pa.array([], pa.string()),
                             "tb": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        g = (pd.DataFrame({"ta": np.concatenate(ta_parts),
                           "tb": np.concatenate(tb_parts)})
             .groupby(["ta", "tb"], sort=False).size().reset_index(name="cnt"))
        return pa.table({"ta": pa.array(g["ta"], pa.string()),
                         "tb": pa.array(g["tb"], pa.string()),
                         "cnt": pa.array(g["cnt"].to_numpy(np.int64),
                                         pa.int64())})

    pairs = (
        ds.select_columns([id_col, text_col])
        .map_batches(pair_partials, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby(["ta", "tb"]).aggregate(Sum("cnt", alias_name="pair_count"))
        .filter(expr=f"pair_count >= {int(min_pair_count)}")
    )

    def score(batch: pa.Table) -> pa.Table:
        v = ray.get(ref) if ray.is_initialized() else ref
        ta = np.asarray(batch["ta"], dtype=object)
        tb = np.asarray(batch["tb"], dtype=object)
        c = np.asarray(batch["pair_count"], dtype=np.int64)
        dfa = np.array([v[t] for t in ta], dtype=np.int64)
        dfb = np.array([v[t] for t in tb], dtype=np.int64)
        # single ln of the exact rational — same arithmetic as the oracle's
        # ln(CAST(c*N AS DOUBLE) / CAST(dfa*dfb AS DOUBLE))
        pmi = np.log((c * np.int64(n_docs)).astype(np.float64)
                     / (dfa * dfb).astype(np.float64))
        return pa.table({
            "ta": batch["ta"], "tb": batch["tb"],
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
        return pd.DataFrame({
            "ta": pd.Series([], dtype=object),
            "tb": pd.Series([], dtype=object),
            "pair_count": pd.Series([], dtype=np.int64),
            "pmi_e6": pd.Series([], dtype=np.int64)})
    return out

"""Chi-square feature selection over (term, class) — the classic
one-vs-rest 2x2 contingency chi2 used to pick class-discriminative
vocabulary for training-data curation (public technique: Manning/
Schuetze IR ch. 13; sklearn chi2; reference capability: the per-class
term statistics feeding its NER gazetteers, see
src/core/feature_extraction/ — re-expressed Ray-Data-first).

Distributed shape: ONE map_batches pass emits per-batch (term, label)
document-frequency partials (per-doc distinct terms via an in-batch
arrow group_by — no Python row loop), then a vocab x classes-bounded
``groupby().sum`` lands the contingency table driver-side (the PMI /
log-odds broadcast precedent).  Nothing corpus-sized leaves the tasks.

Exactness: chi2 publishes as ``chi2_e6 = N * (ad-bc)^2 * 1e6 //
((a+b)(c+d)(a+c)(b+d))`` over PYTHON ints (arbitrary precision — the
numerator overflows int64 at corpus scale); the SQL oracle restates the
same integer division in HUGEINT.  Degenerate margins (a factor of the
denominator is 0) define chi2 = 0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def term_class_df(ds, label_col: str = "lang", text_col: str = "text"):
    """Dataset of (term, label, df) — documents in `label` whose distinct
    token set contains `term`.  Combiner partials per batch; the final
    groupby is vocab x classes-bounded."""
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages.tokenize import tokenize_column

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokenize_column(batch[text_col])
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        pairs = pa.table({"row": parents, "term": flat})
        # per-doc distinct terms: group by (row, term) once in-batch
        dedup = pairs.group_by(["row", "term"],
                               use_threads=False).aggregate([])
        rows = np.asarray(dedup["row"], dtype=np.int64)
        labels = np.asarray(batch[label_col], dtype=object)[rows]
        t = pa.table({"term": dedup["term"],
                      "label": pa.array(labels, pa.string()),
                      "df": pa.array(np.ones(len(rows), np.int64))})
        g = t.group_by(["term", "label"], use_threads=False).aggregate(
            [("df", "sum")])
        return pa.table({"term": g["term"], "label": g["label"],
                         "df": g["df_sum"]})

    return (ds.select_columns([label_col, text_col])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte())
            .groupby(["term", "label"])
            .aggregate(Sum("df", alias_name="df")))


def chi2_scores(contingency: pd.DataFrame, class_counts: dict[str, int],
                n_docs: int) -> pd.DataFrame:
    """Exact-integer chi2 over the vocab-bounded contingency table
    (columns term, label, df).  Returns (label, term, df_in_class,
    df_total, chi2_e6) sorted (label asc, term asc)."""
    df_total = (contingency.groupby("term")["df"].sum()
                .rename("df_t").reset_index())
    m = contingency.merge(df_total, on="term")
    out_rows = []
    for term, label, a, df_t in zip(m["term"], m["label"],
                                    m["df"], m["df_t"]):
        a = int(a)
        b = int(df_t) - a                 # term docs, other classes
        c = int(class_counts[label]) - a  # class docs without term
        d = int(n_docs) - a - b - c
        denom = (a + b) * (c + d) * (a + c) * (b + d)
        chi2_e6 = (0 if denom == 0 else
                   int(n_docs) * (a * d - b * c) ** 2 * 10**6 // denom)
        out_rows.append((label, term, a, int(df_t), chi2_e6))
    out = pd.DataFrame(out_rows, columns=["label", "term", "df_in_class",
                                          "df_total", "chi2_e6"])
    return (out.sort_values(["label", "term"], kind="stable")
            .reset_index(drop=True))


def chi2_terms(ds, label_col: str = "lang", text_col: str = "text",
               min_df: int = 1) -> pd.DataFrame:
    """End-to-end: distributed contingency build + exact integer chi2.
    Class counts and N come from one tiny groupby over the same source.
    chi2_e6 is object-dtype-safe (Python ints) until the final int64
    cast — callers at corpus scale should keep `min_df` high enough
    that chi2_e6 fits int64 (it always does: chi2 <= N, so chi2_e6 <=
    N * 1e6)."""
    from ray.data.aggregate import Count

    cont = term_class_df(ds, label_col=label_col,
                         text_col=text_col).to_pandas()
    cls = (ds.select_columns([label_col]).groupby(label_col)
           .aggregate(Count(alias_name="n")).to_pandas())
    class_counts = dict(zip(cls[label_col].astype(str), cls["n"]))
    n_docs = int(cls["n"].sum())
    out = chi2_scores(cont, class_counts, n_docs)
    out = out[out["df_total"] >= min_df].reset_index(drop=True)
    out["chi2_e6"] = out["chi2_e6"].astype(np.int64)
    for c in ("df_in_class", "df_total"):
        out[c] = out[c].astype(np.int64)
    return out

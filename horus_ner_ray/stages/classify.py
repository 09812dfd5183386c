"""Trained text-classifier scoring stage (the reference's defining
capability, re-expressed Ray-Data-first).

The reference scores every evidence item with learned models — joblib
TF-IDF+classifier pipelines (reference: src/classifiers/bow_tfidf.py:8-30)
and a final RandomForest layer (reference: src/horusdemo.py:39-85), with
training living in text-classification-module/.  Here the same
train -> broadcast -> score shape is a pair of Ray Data operators:

* ``fit_multinomial_nb`` — distributed fit of a multinomial Naive Bayes
  model over token counts: per-batch (label, term, count) partials (the
  combiner pattern; a hot term costs one partial row per batch) -> one
  small groupby -> a driver-side weight matrix.  The materialized model is
  O(vocab x classes); cap it with ``max_features`` (top global-cf terms)
  when the vocabulary is unbounded.
* ``nb_score_dataset`` — the model broadcast ONCE via ``ray.put`` and read
  inside a stateful map_batches actor (``__init__`` fetches the weights,
  ``__call__`` scores a batch with numpy segment sums — no per-row loop).

All log-likelihood weights are quantized to e9 int64 (``floor(ln(p) * 1e9
+ 0.5)``), so a document's class score ``prior_e9 + sum_t tf_t *
llh_e9[t, c]`` is an exact integer sum: order-free, reproducible, and
expressible verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte


@dataclass
class NBModel:
    """Multinomial NB weights, integer-quantized (see module docstring).

    ``llh_e9[t, c]`` is the e9-quantized ``ln((count(t,c) + alpha) /
    (total_tokens(c) + alpha*V))``; ``default_e9[c]`` the same for a term
    unseen in class c; ``priors_e9[c] = e9(ln(n_docs(c) / n_docs))``.
    """

    classes: np.ndarray      # sorted class labels, object dtype
    terms: np.ndarray        # sorted vocabulary, object dtype
    priors_e9: np.ndarray    # int64 [C]
    llh_e9: np.ndarray       # int64 [T, C]
    default_e9: np.ndarray   # int64 [C]


def _e9_ln(x: np.ndarray) -> np.ndarray:
    return np.floor(np.log(x) * 1e9 + 0.5).astype(np.int64)


def fit_multinomial_nb(ds, label_col: str = "lang", text_col: str = "text",
                       alpha: float = 1.0,
                       max_features: int | None = None) -> NBModel:
    """Distributed multinomial NB fit.  Two combiner aggregations (both
    shuffle only vocab-sized partial rows): (label, term) token counts and
    per-label doc counts.  The weight matrix materializes on the driver —
    that IS the model artifact (SURVEY.md S7); pass ``max_features`` to
    keep it bounded on open-vocabulary corpora."""
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokenize_column(batch[text_col])
        flat = pc.list_flatten(toks)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        labels = np.asarray(batch[label_col], dtype=object)
        t = pa.table({"label": pa.array(labels[parents]), "term": flat})
        g = t.group_by(["label", "term"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"label": g["label"], "term": g["term"],
                         "c": g["count_all"].cast(pa.int64())})

    def doc_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([label_col]).group_by(
            label_col, use_threads=False).aggregate([([], "count_all")])
        return pa.table({"label": g[label_col],
                         "nd": g["count_all"].cast(pa.int64())})

    src = ds.select_columns([label_col, text_col])
    counts = (
        src.map_batches(count_partial, batch_format="pyarrow",
                        zero_copy_batch=True, runtime_env=_rte())
        .groupby(["label", "term"]).aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    ndc = (
        src.map_batches(doc_partial, batch_format="pyarrow",
                        zero_copy_batch=True, runtime_env=_rte())
        .groupby("label").aggregate(Sum("nd", alias_name="nd"))
        .to_pandas()
    )

    return nb_model_from_counts(counts, ndc, alpha=alpha,
                                max_features=max_features)


def nb_model_from_counts(counts: pd.DataFrame, ndc: pd.DataFrame,
                         alpha: float = 1.0,
                         max_features: int | None = None) -> NBModel:
    """Model tail shared by every NB front-end (text tokens, decoded media
    histograms, topic weak labels): reduce the already-aggregated
    ``counts(label, term, c)`` / ``ndc(label, nd)`` tables into the
    integer-quantized weight matrix."""
    # V and the per-class token totals count the FULL corpus even when
    # max_features truncates the scored matrix: the smoothing denominator
    # is a model property, not a storage one
    vocab_full = counts["term"].nunique()
    tot_c = counts.groupby("label", sort=False)["c"].sum()
    if max_features is not None and vocab_full > max_features:
        top = (counts.groupby("term", sort=False)["c"].sum()
               .sort_values(ascending=False, kind="stable"))
        keep = set(top.index[:max_features])
        counts = counts[counts["term"].isin(keep)]

    classes = np.sort(ndc["label"].to_numpy(object))
    cidx = {c: i for i, c in enumerate(classes)}
    terms = np.sort(counts["term"].unique().astype(object))
    tidx = {t: i for i, t in enumerate(terms)}

    nd = ndc.set_index("label")["nd"]
    n_total = float(nd.sum())
    priors_e9 = _e9_ln(np.array([nd[c] / n_total for c in classes]))

    denom = np.array([float(tot_c.get(c, 0)) + alpha * vocab_full
                      for c in classes])
    default_e9 = _e9_ln(alpha / denom)

    llh = np.tile(default_e9, (len(terms), 1))
    ti = counts["term"].map(tidx).to_numpy(np.int64)
    ci = counts["label"].map(cidx).to_numpy(np.int64)
    llh[ti, ci] = _e9_ln(
        (counts["c"].to_numpy(np.float64) + alpha) / denom[ci])
    return NBModel(classes=classes, terms=terms, priors_e9=priors_e9,
                   llh_e9=llh, default_e9=default_e9)


class _NBScorer:
    """map_batches actor: weights fetched from the object store ONCE per
    actor (``ray.put`` broadcast — never re-shipped per batch)."""

    def __init__(self, model_ref):
        import ray

        m: NBModel = ray.get(model_ref)
        self.model = m
        self.terms = m.terms.astype(object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = self.model
        n = len(batch)
        toks = tokenize_column(batch["__nb_text"])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        C = len(m.classes)
        scores = np.tile(m.priors_e9, (n, 1))  # int64 [n, C]
        if len(flat):
            pos = np.searchsorted(self.terms, flat)
            pos_c = np.minimum(pos, len(self.terms) - 1)
            found = self.terms[pos_c] == flat
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            nz = lens > 0
            for c in range(C):
                w = np.where(found, m.llh_e9[pos_c, c], m.default_e9[c])
                if nz.any():
                    scores[nz, c] += np.add.reduceat(w, starts[nz])
        best = np.argmax(scores, axis=1)  # first max = smallest class label
        out = {name: batch[name] for name in batch.schema.names
               if name != "__nb_text"}
        out["pred_label"] = pa.array(m.classes[best].astype(object),
                                     pa.string())
        out["score_e9"] = pa.array(scores[np.arange(n), best], pa.int64())
        return pa.table(out)


def nb_score_dataset(ds, model: NBModel, text_col: str = "text",
                     keep_cols: list[str] | None = None,
                     concurrency: int | tuple[int, int] = 2):
    # concurrency default stays below the smallest test cluster (4 CPUs):
    # an actor pool HOLDS its CPUs while idle, and sizing it to the whole
    # cluster starves the upstream task-pool read/prep stages
    """Score every row: appends ``pred_label`` (argmax class; ties break to
    the lexicographically smallest, matching SQL ``ORDER BY score DESC,
    class``) and ``score_e9`` (the winning class's integer score).
    ``keep_cols`` prunes the carried columns (default: all)."""
    import ray

    model_ref = ray.put(model)
    cols = list(keep_cols) if keep_cols is not None else None

    def prep(batch: pa.Table) -> pa.Table:
        out = {c: batch[c] for c in (cols or batch.schema.names)}
        out["__nb_text"] = batch[text_col]
        return pa.table(out)

    src = ds if cols is None or text_col in cols else ds.select_columns(
        [*cols, text_col])
    return src.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True, runtime_env=_rte()) \
        .map_batches(_NBScorer,
                     fn_constructor_kwargs={"model_ref": model_ref},
                     batch_format="pyarrow", zero_copy_batch=True,
                     concurrency=concurrency, num_cpus=1,
                     runtime_env=_rte())

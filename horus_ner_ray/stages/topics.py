"""Seed-term topic scoring — a real (non-stub) topic-model scorer stage.

Reference analogue: the LDA/topic-modeling scorer the reference wires into
its evidence pipeline (SURVEY.md A2; reference:
src/classifiers/bow_tfidf.py:8-30 scores every evidence text with 5 joblib
TF-IDF+classifier pipelines, and topic features feed the final layer).
Re-expressed as a closed-form, oracle-checkable model: each topic is a set
of seed terms; a document's topic score is the TF-IDF mass its tokens put
on that topic's seeds,

    score(doc, topic) = sum over occurrences of seed terms t in doc of
                        idf_e6(t)        (tf * idf, integer fixed-point)

with ``idf_e6(t) = floor(ln(N / df_t) * 1e6 + 0.5)`` — the same ``tf *
ln(N/df)`` weighting as stages/termstats.tfidf_vectors, scaled to int64 so
accumulation is order-free and the DuckDB oracle hash-matches exactly.

Distribution shape: the {term -> (topic, idf_e6)} map is tiny (seed terms
only) and ships once per actor via the function closure (broadcast-once,
the A6 small-model pattern); scoring is one vectorized map_batches —
tokenize, match via searchsorted over the sorted seed array, scatter-add
into a (rows x topics) int64 matrix.  No shuffle at all: the only
corpus-wide input is the df of the seed terms, a lookup the caller takes
from the existing term_df table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte


def topic_idf_e6(topics: dict[str, list[str]], df_map: dict[str, int],
                 n_docs: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sorted seed-term array, topic index per term, idf_e6 per term).
    Terms absent from ``df_map`` (df == 0) are dropped — they can never
    occur in the corpus.  A term may belong to ONE topic (first claim wins
    in sorted-topic order; overlapping seed lists are a config error)."""
    names = sorted(topics)
    term_topic: dict[str, int] = {}
    for ti, name in enumerate(names):
        for t in topics[name]:
            term_topic.setdefault(t, ti)
    terms = sorted(t for t in term_topic if df_map.get(t, 0) > 0)
    tarr = np.asarray(terms, dtype=object)
    tidx = np.asarray([term_topic[t] for t in terms], dtype=np.int64)
    idf = np.asarray(
        [np.floor(np.log(float(n_docs) / float(df_map[t])) * 1e6 + 0.5)
         for t in terms], dtype=np.int64)
    return tarr, tidx, idf


def topic_score_dataset(ds, topics: dict[str, list[str]],
                        df_map: dict[str, int], n_docs: int,
                        text_col: str = "text", id_col: str = "doc_id",
                        keep_text: bool = False):
    """Dataset(docs) -> Dataset(doc_id, score_<topic>..., top_topic).

    ``top_topic`` is the argmax over topics in sorted-name order with
    first-max-wins (ties break toward the lexicographically smallest
    name); docs scoring 0 everywhere get ''.  ``keep_text`` carries the
    text column through (the weak-label -> NB-fit pipeline trains on it)."""
    names = sorted(topics)
    tarr, tidx, idf = topic_idf_e6(topics, df_map, n_docs)
    name_arr = np.asarray(names, dtype=object)
    k = len(names)

    def score(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        flat = pc.list_flatten(toks)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        n = len(batch)
        mat = np.zeros((n, k), dtype=np.int64)
        if len(flat) and len(tarr):
            ft = np.asarray(flat, dtype=object)
            pos = np.searchsorted(tarr, ft)
            pos_c = np.clip(pos, 0, len(tarr) - 1)
            hit = tarr[pos_c] == ft
            np.add.at(mat, (parents[hit], tidx[pos_c[hit]]), idf[pos_c[hit]])
        top = name_arr[np.argmax(mat, axis=1)]
        top = np.where(mat.max(axis=1) > 0, top, "")
        out = {"doc_id": batch[id_col]}
        if keep_text:
            out["text"] = batch[text_col]
        for j, name in enumerate(names):
            out[f"score_{name}"] = pa.array(mat[:, j], pa.int64())
        out["top_topic"] = pa.array(top.astype(object), pa.string())
        return pa.table(out)

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
    )


def topic_nb_predictions(ds, topics: dict[str, list[str]],
                         df_map: dict[str, int], n_docs: int,
                         text_col: str = "text", id_col: str = "doc_id",
                         alpha: float = 1.0,
                         max_features: int | None = None):
    """TRAINED topic model (SURVEY.md A2 as a learned scorer, round 4):
    bootstrap a multinomial NB from seed-lexicon weak labels and score
    EVERY document with the trained weights.

    1. weak labels: seed-term TF-IDF argmax (``topic_score_dataset``);
       docs matching no seed term are excluded from training;
    2. fit: distributed multinomial-NB over the weak-labeled subset
       (stages/classify.py combiner fit — vocab-sized shuffle, model
       materialized once, ``max_features`` bounds it);
    3. score: weights broadcast via ``ray.put``, vectorized actor scoring
       over the FULL corpus (including docs the lexicon could not label).

    The whole chain is integer-exact (e6 seed scores, e9 NB scores), so a
    DuckDB oracle can restate it verbatim.  Returns Dataset(doc_id,
    pred_topic, score_e9).
    """
    import pyarrow.compute as _pc

    from horus_ner_ray.stages.classify import (
        fit_multinomial_nb,
        nb_score_dataset,
    )

    labeled = topic_score_dataset(ds, topics, df_map, n_docs,
                                  text_col=text_col, id_col=id_col,
                                  keep_text=True)
    train = labeled.map_batches(
        lambda b: b.filter(_pc.not_equal(b["top_topic"], "")).select(
            ["top_topic", "text"]),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
    model = fit_multinomial_nb(train, label_col="top_topic",
                               text_col="text", alpha=alpha,
                               max_features=max_features)
    scored = nb_score_dataset(ds.select_columns([id_col, text_col]), model,
                              text_col=text_col, keep_cols=[id_col])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "pred_topic": batch["pred_label"],
            "score_e9": batch["score_e9"],
        })

    return scored.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True, runtime_env=_rte())

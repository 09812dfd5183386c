"""Collection/term statistics as Ray Data pipelines.

These are the reference's per-term aggregation family re-expressed with the
combiner pattern (SURVEY.md G5-G7): the reference computes term histograms
with ``Counter(chain.from_iterable(docs))`` in one process
(reference: text-classification-module topic_modelling.py:30-33) and corpus
stats with driver-side pandas (features.py:137-168).  Here each batch emits
pre-aggregated partials (one row per term per batch), so the groupby-term
shuffle moves O(vocab x batches) partial rows, never O(total tokens) raw
tokens.  Hot terms (df ~ N) cost one partial row per batch like any other
term — the combiner IS the skew handling for these aggregates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horus_ner_ray.stages.tokenize import token_counts, tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte


def _explode_pairs(batch: pa.Table, text_col: str, id_col: str) -> tuple[pa.Array, np.ndarray]:
    import pyarrow.compute as pc

    toks = tokenize_column(batch[text_col])
    flat = pc.list_flatten(toks)
    parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    ids = np.asarray(batch[id_col], dtype=np.int64)[parents]
    return flat, ids


def term_df_partials(text_col: str = "text", id_col: str = "doc_id"):
    """map_batches fn: batch -> (term, df) partials (distinct docs per term
    within the batch; exact because a doc's tokens never split batches)."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, ids = _explode_pairs(batch, text_col, id_col)
        pairs = pa.table({"term": flat, "doc_id": pa.array(ids, pa.int64())})
        distinct = pairs.group_by(["term", "doc_id"], use_threads=False).aggregate([])
        g = distinct.group_by("term", use_threads=False).aggregate([("doc_id", "count")])
        return pa.table({"term": g["term"], "df": g["doc_id_count"]})

    return fn


def term_cf_partials(text_col: str = "text", id_col: str = "doc_id"):
    """map_batches fn: batch -> (term, cf) partials (total occurrences)."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, _ = _explode_pairs(batch, text_col, id_col)
        g = pa.table({"term": flat}).group_by("term", use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table({"term": g["term"], "cf": g["count_all"]})

    return fn


def term_df_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset(docs) -> Dataset(term, df)."""
    from ray.data.aggregate import Sum

    parts = ds.select_columns([id_col, text_col]).map_batches(
        term_df_partials(text_col, id_col), batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    )
    return parts.groupby("term").aggregate(Sum("df", alias_name="df"))


def term_cf_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    from ray.data.aggregate import Sum

    parts = ds.select_columns([id_col, text_col]).map_batches(
        term_cf_partials(text_col, id_col), batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    )
    return parts.groupby("term").aggregate(Sum("cf", alias_name="cf"))


def doc_lengths_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset(docs) -> Dataset(doc_id, dl) — pure per-batch projection."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch[id_col],
                "dl": pa.array(token_counts(batch[text_col]).astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
    )


def tfidf_vectors(ds, n_docs: int, text_col: str = "text",
                  id_col: str = "doc_id", n_buckets: int = 256):
    """Sparse TF-IDF document vectors: (doc_id, term, tfidf) with
    ``tfidf = tf * ln(N / df)`` — the feature-export face of the term
    statistics family (SURVEY.md S6/G7: the reference exports per-token
    feature matrices, horus_to_conll.py-style; here the features come
    straight off the corpus in one pass + one shuffle).

    ONE shuffle: per-batch (doc_id, term, tf) rows group by
    ``hash(term) % n_buckets``; every (doc, term) row of a term co-locates
    in its term's bucket, so df (distinct docs per term) is computed IN the
    same group that needs it — no df side-table, no join.  ``n_docs`` is
    the corpus row count (one cheap metadata/count pass at the caller).
    """
    import pandas as pd
    import pyarrow.compute as pc

    def tf_rows(batch: pa.Table) -> pa.Table:
        flat, ids = _explode_pairs(batch, text_col, id_col)
        pairs = pa.table({"term": flat, id_col: pa.array(ids, pa.int64())})
        tf = pairs.group_by(["term", id_col], use_threads=False).aggregate(
            [([], "count_all")])
        # pd.util.hash_array is deterministic ACROSS processes — required:
        # every worker must bucket the same term identically
        h = pd.util.hash_array(
            np.asarray(tf["term"], dtype=object), categorize=False)
        return pa.table({
            id_col: tf[id_col],
            "term": tf["term"],
            "tf": tf["count_all"].cast(pa.int64()),
            "bkt": pa.array((h % np.uint64(n_buckets)).astype(np.int64),
                            pa.int64()),
        })

    n = float(n_docs)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        # df per term inside the bucket: each (doc, term) appears once per
        # batch-partial; collapse cross-batch duplicates first (a doc's
        # tokens never split batches in this repo's readers, but stay
        # correct under any batching)
        g = (g.groupby(["term", id_col], sort=False)
             .agg(tf=("tf", "sum")).reset_index())
        df = g.groupby("term", sort=False)["term"].transform("size")
        out = g.copy()
        out["tfidf"] = out["tf"].to_numpy(np.float64) * np.log(
            n / df.to_numpy(np.float64))
        return out[[id_col, "term", "tf", "tfidf"]]

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: score(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )

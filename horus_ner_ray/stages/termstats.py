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


def _tf_bucket_rows(text_col: str, id_col: str, n_buckets: int):
    """map_batches fn: batch -> (doc_id, term, tf, bkt) partials bucketed
    by term hash — the shared front end of tfidf/unigram-LP scoring.
    ``pd.util.hash_array`` is deterministic ACROSS processes — required:
    every worker must bucket the same term identically."""
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        flat, ids = _explode_pairs(batch, text_col, id_col)
        pairs = pa.table({"term": flat, id_col: pa.array(ids, pa.int64())})
        tf = pairs.group_by(["term", id_col], use_threads=False).aggregate(
            [([], "count_all")])
        h = pd.util.hash_array(
            np.asarray(tf["term"], dtype=object), categorize=False)
        return pa.table({
            id_col: tf[id_col],
            "term": tf["term"],
            "tf": tf["count_all"].cast(pa.int64()),
            "bkt": pa.array((h % np.uint64(n_buckets)).astype(np.int64),
                            pa.int64()),
        })

    return fn


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

    tf_rows = _tf_bucket_rows(text_col, id_col, n_buckets)
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


def unigram_logprob_vectors(ds, total_tokens: float | None = None,
                            text_col: str = "text", id_col: str = "doc_id",
                            n_buckets: int = 256):
    """CCNet-style language-model quality score: per-document mean unigram
    log-probability under the corpus's own MLE unigram model,
    ``mean_lp = (1/dl) * sum_t tf_t * ln(cf_t / total_tokens)`` — fluent/
    typical documents score high, gibberish and out-of-distribution noise
    score low (the classic perplexity filter with the model = the corpus).

    Same one-shuffle shape as ``tfidf_vectors``: (doc, term, tf) partials
    bucket by term hash; the corpus frequency cf of a term is the sum of
    its tf inside its OWN bucket group, so scoring needs no cf side-table.
    Per-doc reduction is a second small shuffle over (doc, partial-sum)
    rows pre-combined per bucket.  The constant ``ln(total_tokens)`` is
    applied in the final map (``sum tf*ln(cf) - dl*ln(total) ==
    sum tf*ln(cf/total)``); pass ``total_tokens`` from collection stats
    (the caller usually has it, like ``tfidf_vectors``'s ``n_docs``) —
    left None, one extra column-pruned count pass computes it here.
    """
    import pandas as pd

    tf_rows = _tf_bucket_rows(text_col, id_col, n_buckets)

    def term_scores(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(["term", id_col], sort=False)
             .agg(tf=("tf", "sum")).reset_index())
        cf = g.groupby("term", sort=False)["tf"].transform("sum")
        out = pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            "lp_num": g["tf"].to_numpy(np.float64)
            * np.log(cf.to_numpy(np.float64)),
            "tf": g["tf"].to_numpy(np.int64),
        })
        # pre-combine per doc within the bucket: the second shuffle moves
        # one row per (bucket, doc), not one per (doc, term)
        return (out.groupby(id_col, sort=False)
                .agg(lp_num=("lp_num", "sum"), dl=("tf", "sum"))
                .reset_index())

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.groupby(id_col, sort=True)
             .agg(lp_num=("lp_num", "sum"), dl=("dl", "sum")).reset_index())
        return pd.DataFrame({
            id_col: a[id_col].to_numpy(np.int64),
            "dl": a["dl"].to_numpy(np.int64),
            "lp_num": a["lp_num"].to_numpy(np.float64),
        })

    per_bucket = (
        ds.select_columns([id_col, text_col])
        .map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: term_scores(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )

    def bucket_doc(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        ids = batch[id_col].to_numpy(np.int64).astype(np.uint64)
        batch["dbkt"] = ((ids * np.uint64(0x9E3779B97F4A7C15))
                         % np.uint64(n_buckets)).astype(np.int64)
        return batch

    reduced = (
        per_bucket.map_batches(bucket_doc, batch_format="pandas",
                               runtime_env=_rte())
        .groupby("dbkt")
        .map_groups(lambda g: finish(g.drop(columns=["dbkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )
    if total_tokens is None:
        def _count(batch: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array(
                [int(token_counts(batch[text_col]).sum())], pa.int64())})

        total_tokens = float(
            ds.select_columns([text_col])
            .map_batches(_count, batch_format="pyarrow", zero_copy_batch=True,
                         runtime_env=_rte())
            .to_pandas()["n"].sum())
    ln_total = float(np.log(total_tokens)) if total_tokens > 0 else 0.0

    def apply_total(b: pd.DataFrame) -> pd.DataFrame:
        dl = b["dl"].to_numpy(np.float64)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(np.int64),
            "dl": b["dl"].to_numpy(np.int64),
            "mean_lp": (b["lp_num"].to_numpy(np.float64) - dl * ln_total) / dl,
        })

    return reduced.map_batches(apply_total, batch_format="pandas",
                               runtime_env=_rte())

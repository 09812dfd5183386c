"""DSIR — Data Selection via Importance Resampling (Xie, Santurkar, Ma,
Liang, NeurIPS 2023; public method) over hashed unigram features: fit
tiny bucket models of a TARGET corpus and the RAW pool, weight every raw
document by its log importance ratio, then Gumbel-top-k resample — the
standard pretraining-data curation step "make the pool look like the
target domain".

Scale shape (100 TB honest):
- Bucket models are B integers.  Fitting is a per-batch ``bincount``
  combiner (one B-vector per batch leaves each task) + a driver-side
  add of the bounded partials — the corpus never shuffles.
- The log-ratio table (B float64) broadcasts by closure into one pure
  ``map_batches`` scoring pass — zero shuffle, zero driver state beyond
  the B-vector.
- Selection is the A-ES-style per-batch top-k combiner over the scored
  rows (at most k rows leave each batch), then a bounded final sort.

Determinism / oracle: per-(doc, bucket) contributions quantize to
``lr_e9`` int64 BEFORE summation (order-free — the unigram_logprob
precedent), the bucket hash is the shared seeded SipHash
(``dedupe._hash_strings``, inlined by the SQL oracle as the closed-vocab
VALUES table), and the Gumbel perturbation is a pure function of
(doc_id, seed) through ``splitmix64`` — every float op is a fixed IEEE
expression shared with the DuckDB restatement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from horus_ner_ray.stages.dedupe import _hash_strings
from horus_ner_ray.stages.sketches import splitmix64
from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte

_U64 = 18446744073709551616.0  # 2**64


def bucket_counts(ds, n_buckets: int = 16, text_col: str = "text"
                  ) -> tuple[np.ndarray, int]:
    """Hashed-unigram bucket model of a corpus: token occurrences per
    bucket ``hash(term) % B`` plus the total token count.  Per-batch
    bincount partials; only B-vectors leave the tasks."""
    B = int(n_buckets)

    def part(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        if len(flat):
            b = (_hash_strings(flat).astype(np.uint64)
                 % np.uint64(B)).astype(np.int64)
            cnt = np.bincount(b, minlength=B).astype(np.int64)
        else:
            cnt = np.zeros(B, dtype=np.int64)
        return pa.table({"bucket": pa.array(np.arange(B), pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    parts = (ds.select_columns([text_col])
             .map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True, runtime_env=_rte())
             .to_pandas())  # B rows per batch — bounded, driver-safe
    counts = np.zeros(B, dtype=np.int64)
    np.add.at(counts, parts["bucket"].to_numpy(np.int64),
              parts["n"].to_numpy(np.int64))
    return counts, int(counts.sum())


def log_ratio_table(target_counts: np.ndarray, target_total: int,
                    raw_counts: np.ndarray, raw_total: int) -> np.ndarray:
    """Per-bucket ``ln(p_target(b)) - ln(p_raw(b))`` with add-one
    smoothing over the B buckets — the exact float64 expression the SQL
    oracle restates (DOUBLE division of exact integers, then ln)."""
    B = len(target_counts)
    pt = (target_counts + 1.0) / float(target_total + B)
    pr = (raw_counts + 1.0) / float(raw_total + B)
    return np.log(pt) - np.log(pr)


def dsir_weights(ds, lr: np.ndarray, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Scores every document of the raw pool: ``w_e9 = sum over buckets
    of floor(count_b * lr[b] * 1e9 + 0.5)`` — per-(doc, bucket)
    e9-quantized contributions summed as int64, so the result is
    independent of batch/shuffle order.  Pure map, zero shuffle.
    Output columns: (id_col, dl, w_e9)."""
    B = len(lr)
    lr = np.asarray(lr, dtype=np.float64)

    def score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        toks = tokenize_column(batch[text_col])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        dl = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        w = np.zeros(len(ids), dtype=np.int64)
        if len(flat):
            b = (_hash_strings(flat).astype(np.uint64)
                 % np.uint64(B)).astype(np.int64)
            key = parents * B + b
            cnt = np.bincount(key, minlength=len(ids) * B)
            nz = np.flatnonzero(cnt)
            contrib = np.floor(cnt[nz].astype(np.float64) * lr[nz % B]
                               * 1e9 + 0.5).astype(np.int64)
            np.add.at(w, nz // B, contrib)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "dl": pa.array(dl, pa.int64()),
                         "w_e9": pa.array(w, pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())


def gumbel_topk(weights_ds, k: int, seed: int = 42,
                id_col: str = "doc_id"):
    """Gumbel-top-k importance resampling over the scored pool: each doc
    draws ``u = (splitmix64(doc_id XOR seed) + 1) / 2**64`` and takes key
    ``w_e9/1e9 + (-ln(-ln(u)))`` (sampling WITHOUT replacement with
    probability proportional to exp(w) — the Gumbel-max trick, public);
    the k largest keys are the resample.  Key publishes as ``key_e6``
    ints; ties break (key desc, id asc).  Per-batch top-k combiner — at
    most k rows leave each batch."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    kk = int(k)

    def part(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        w = np.asarray(batch["w_e9"], dtype=np.int64)
        h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        u = (h.astype(np.float64) + 1.0) / _U64
        key = w.astype(np.float64) / 1e9 + (-np.log(-np.log(u)))
        key_e6 = np.floor(key * 1e6 + 0.5).astype(np.int64)
        if len(ids) > kk:
            sel = np.lexsort((ids, -key_e6))[:kk]
            ids, w, key_e6 = ids[sel], w[sel], key_e6[sel]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "w_e9": pa.array(w, pa.int64()),
                         "key_e6": pa.array(key_e6, pa.int64())})

    parts = weights_ds.map_batches(part, batch_format="pyarrow",
                                   zero_copy_batch=True,
                                   runtime_env=_rte()).to_pandas()
    parts = parts.sort_values(["key_e6", id_col], ascending=[False, True],
                              kind="stable").head(kk)
    return parts.reset_index(drop=True)


def bucket_counts_split(ds, target_mask_col: str, n_buckets: int = 16,
                        text_col: str = "text"
                        ) -> tuple[np.ndarray, int, np.ndarray, int]:
    """Both bucket models in ONE pass over the pool: the raw counts from
    every row, the target counts from rows where ``target_mask_col`` is
    true.  Returns (target_counts, target_total, raw_counts, raw_total)."""
    B = int(n_buckets)

    def part(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        tcnt = np.zeros(B, dtype=np.int64)
        rcnt = np.zeros(B, dtype=np.int64)
        if len(flat):
            parents = np.asarray(pc.list_parent_indices(toks),
                                 dtype=np.int64)
            mask = np.asarray(batch[target_mask_col], dtype=bool)
            b = (_hash_strings(flat).astype(np.uint64)
                 % np.uint64(B)).astype(np.int64)
            rcnt = np.bincount(b, minlength=B).astype(np.int64)
            sel = mask[parents]
            if sel.any():
                tcnt = np.bincount(b[sel], minlength=B).astype(np.int64)
        return pa.table({"bucket": pa.array(np.arange(B), pa.int64()),
                         "nt": pa.array(tcnt, pa.int64()),
                         "nr": pa.array(rcnt, pa.int64())})

    parts = (ds.select_columns([text_col, target_mask_col])
             .map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True, runtime_env=_rte())
             .to_pandas())
    tc = np.zeros(B, dtype=np.int64)
    rc = np.zeros(B, dtype=np.int64)
    bk = parts["bucket"].to_numpy(np.int64)
    np.add.at(tc, bk, parts["nt"].to_numpy(np.int64))
    np.add.at(rc, bk, parts["nr"].to_numpy(np.int64))
    return tc, int(tc.sum()), rc, int(rc.sum())


def dsir_select(raw_ds, target_ds=None, k: int = 32, n_buckets: int = 16,
                seed: int = 42, text_col: str = "text",
                id_col: str = "doc_id",
                target_mask_col: str | None = None):
    """The full DSIR flow: fit both bucket models, score the raw pool,
    Gumbel-top-k resample.  When the target is a SLICE of the pool, pass
    ``target_mask_col`` (a bool column on ``raw_ds``) instead of a
    separate ``target_ds`` — both models then fit in ONE corpus pass.
    Returns the selected (id, w_e9, key_e6) frame with rank 1..k."""
    if target_mask_col is not None:
        tc, tn, rc, rn = bucket_counts_split(raw_ds, target_mask_col,
                                             n_buckets, text_col)
    else:
        if target_ds is None:
            raise ValueError("pass target_ds or target_mask_col")
        tc, tn = bucket_counts(target_ds, n_buckets, text_col)
        rc, rn = bucket_counts(raw_ds, n_buckets, text_col)
    lr = log_ratio_table(tc, tn, rc, rn)
    out = gumbel_topk(dsir_weights(raw_ds, lr, text_col, id_col),
                      k, seed=seed, id_col=id_col)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out

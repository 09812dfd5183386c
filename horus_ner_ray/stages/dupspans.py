"""Duplicated k-gram span detection — the within-corpus exact-substring
dedup statistic (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better": substrings repeated across a training corpus are
memorization fuel; the k-gram granularity makes the sweep one shuffle).

Reference analogue: the reference dedupes only whole sentences via its
processed-flag store (SURVEY.md D1/D2); sub-document span dedup is the
LLM-curation extension.

Semantics (token-level, shared tokenizer rule):
    a position p of document d is DUPLICATED iff the k-gram
    ``tokens(d)[p : p+k]`` occurs at >= ``min_count`` positions
    corpus-wide (any document, including d itself).
Output: one row per document that has at least one duplicated position —
    (doc_id, total_kgrams, dup_kgrams, max_dup_run)
where ``max_dup_run`` is the longest stretch of CONSECUTIVE duplicated
start positions (a run of r consecutive starts == a duplicated substring
of r + k - 1 tokens).

Skew-proof three-phase shape (the remove_duplicate_lines design, key =
k-gram string instead of line):

1. count pass: per-batch (kgram, cnt) Arrow group-by partials -> one
   ``groupby(kgram).sum`` -> k-grams with cnt >= min_count form the
   duplicate-key table (a hot k-gram costs one partial row per batch);
2. membership pass: positions group by the SALTED key
   ``(hash(kg) % B) * S + (mix(doc_id) % S)``; each duplicate k-gram is
   replicated to its bucket's S salt groups, so a corpus-wide boilerplate
   k-gram lands ~1/S of its occurrences per group;
3. per-doc aggregation: surviving (doc_id, pos) rows group by
   ``mix(doc_id) % n_buckets`` and each coarse bucket computes counts +
   gaps-and-islands max runs VECTORIZED (no per-doc Python).

K-gram strings are built with one ``pc.binary_join_element_wise`` over k
shifted takes of the flattened token array — no per-row Python; hashes
route only (counting and membership compare the exact string), so results
are independent of bucket/salt counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from horus_ner_ray.stages.dedupe import _hash_strings, _MIX, _N_BUCKETS
from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte


def _explode_kgrams(k: int, text_col: str, id_col: str):
    """batch -> (doc_id, pos, kg) for every k-gram start position."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        flat = pc.list_flatten(toks)
        n_kg = np.maximum(lens - k + 1, 0)
        tot = int(n_kg.sum())
        if tot == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "kg": pa.array([], pa.string())})
        starts = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        pos = (np.arange(tot, dtype=np.int64)
               - np.repeat(np.cumsum(n_kg) - n_kg, n_kg))
        base = np.repeat(starts[:-1], n_kg) + pos
        parts = [flat.take(pa.array(base + j, pa.int64())) for j in range(k)]
        kg = pc.binary_join_element_wise(*parts, " ")
        ids = np.repeat(np.asarray(batch[id_col], dtype=np.int64), n_kg)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "kg": kg})

    return fn


def dup_span_stats(ds, k: int = 3, min_count: int = 2,
                   text_col: str = "text", id_col: str = "doc_id",
                   n_buckets: int = _N_BUCKETS, n_salts: int = 16):
    """-> Ray Dataset (doc_id, total_kgrams, dup_kgrams, max_dup_run),
    one row per document with >= 1 duplicated k-gram position."""
    from ray.data.aggregate import Sum

    explode = _explode_kgrams(k, text_col, id_col)
    B, S = np.uint64(n_buckets), np.uint64(n_salts)
    s_int = int(n_salts)
    nbk = np.int64(n_buckets)

    # --- pass 1: corpus-wide k-gram counts (combiner; skew-free) --------
    def count_partial(batch: pa.Table) -> pa.Table:
        t = explode(batch)
        g = t.select(["kg"]).group_by("kg", use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"kg": g["kg"],
                         "cnt": g["count_all"].cast(pa.int64())})

    src = ds.select_columns([id_col, text_col])
    dup_kg = (
        src.map_batches(count_partial, batch_format="pyarrow",
                        zero_copy_batch=True, runtime_env=_rte())
        .groupby("kg").aggregate(Sum("cnt", alias_name="cnt"))
        .filter(expr=f"cnt >= {int(min_count)}")
    )

    # --- pass 2: salted replicate membership (keep duplicated starts) ---
    def tag_data(batch: pa.Table) -> pa.Table:
        t = explode(batch)
        # total_kgrams rides along as a per-doc constant on every row
        flat = np.asarray(t["kg"], dtype=object)
        h = _hash_strings(flat) if len(flat) else np.zeros(0, dtype=np.uint64)
        dh = np.asarray(t[id_col], dtype=np.int64).astype(np.uint64)
        gbkt = (((h * _MIX) % B) * S + (dh * _MIX) % S).astype(np.int64)
        return t.append_column(
            "side", pa.array(np.zeros(len(t), np.int8), pa.int8())
        ).append_column("gbkt", pa.array(gbkt, pa.int64()))

    def tag_dups(batch: pa.Table) -> pa.Table:
        flat = np.asarray(batch["kg"], dtype=object)
        h = _hash_strings(flat) if len(flat) else np.zeros(0, dtype=np.uint64)
        base = ((h * _MIX) % B) * S
        n = len(flat)
        gbkt = (np.repeat(base, s_int)
                + np.tile(np.arange(s_int, dtype=np.uint64), n)).astype(np.int64)
        return pa.table({
            id_col: pa.nulls(n * s_int, pa.int64()),
            "pos": pa.nulls(n * s_int, pa.int64()),
            "kg": pa.array(np.repeat(flat, s_int), pa.string()),
            "side": pa.array(np.ones(n * s_int, np.int8), pa.int8()),
            "gbkt": pa.array(gbkt, pa.int64()),
        })

    def filter_group(g: pd.DataFrame) -> pd.DataFrame:
        data = g[g["side"] == 0]
        if len(data) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "pos": pd.Series([], dtype=np.int64)})
        dup = set(g.loc[g["side"] == 1, "kg"])
        keep = data["kg"].isin(dup)
        # side-1 rows carry null ids, so pandas held the whole group's id
        # column as float64 — restore int64 on the surviving data rows
        return data.loc[keep, [id_col, "pos"]].astype(np.int64)

    data_t = src.map_batches(tag_data, batch_format="pyarrow",
                             zero_copy_batch=True, runtime_env=_rte())
    dup_t = dup_kg.map_batches(tag_dups, batch_format="pyarrow",
                               runtime_env=_rte())
    dup_pos = (
        data_t.union(dup_t)
        .groupby("gbkt")
        .map_groups(lambda g: filter_group(g.drop(columns=["gbkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )

    # --- totals: per-doc k-gram counts (cheap second tokenize pass) -----
    def totals(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        n_kg = np.maximum(lens - k + 1, 0)
        return pa.table({
            id_col: batch[id_col],
            "pos": pa.array(-np.ones(len(lens), np.int64), pa.int64()),
            "total": pa.array(n_kg, pa.int64()),
        })

    tot_t = src.map_batches(totals, batch_format="pyarrow",
                            zero_copy_batch=True, runtime_env=_rte())

    # --- pass 3: per-doc count + gaps-and-islands max run ---------------
    def rebucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        if "total" not in batch.columns:
            batch["total"] = np.int64(0)
        ids = batch[id_col].to_numpy(np.int64).astype(np.uint64)
        batch["dbkt"] = ((ids * _MIX) % np.uint64(nbk)).astype(np.int64)
        return batch

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "pos"], kind="stable")
        ids = g[id_col].to_numpy(np.int64)
        pos = g["pos"].to_numpy(np.int64)
        tot = g["total"].to_numpy(np.int64)
        is_dup = pos >= 0
        # totals per doc from the sentinel rows
        docs, doc_idx = np.unique(ids, return_inverse=True)
        total_per = np.zeros(len(docs), dtype=np.int64)
        np.add.at(total_per, doc_idx[~is_dup], tot[~is_dup])
        dup_per = np.bincount(doc_idx[is_dup],
                              minlength=len(docs)).astype(np.int64)
        # gaps-and-islands: within each doc, run id = pos - rank-in-doc
        di = doc_idx[is_dup]
        dp = pos[is_dup]
        if len(dp):
            seq = np.arange(len(dp), dtype=np.int64)
            seg_start = np.flatnonzero(np.r_[True, di[1:] != di[:-1]])
            seq -= np.repeat(seg_start, np.diff(np.append(seg_start, len(di))))
            # unique (doc, pos - seq) pairs with counts = run lengths
            packed = di.astype(np.int64) * np.int64(2**40) + (dp - seq)
            uruns, rcnt = np.unique(packed, return_counts=True)
            rdoc = (uruns // np.int64(2**40)).astype(np.int64)
            max_run = np.zeros(len(docs), dtype=np.int64)
            np.maximum.at(max_run, rdoc, rcnt.astype(np.int64))
        else:
            max_run = np.zeros(len(docs), dtype=np.int64)
        keep = dup_per > 0
        return pd.DataFrame({
            id_col: docs[keep],
            "total_kgrams": total_per[keep],
            "dup_kgrams": dup_per[keep],
            "max_dup_run": max_run[keep],
        })

    return (
        dup_pos.map_batches(rebucket, batch_format="pandas",
                            runtime_env=_rte())
        .union(tot_t.map_batches(rebucket, batch_format="pandas",
                                 runtime_env=_rte()))
        .groupby("dbkt")
        .map_groups(lambda g: per_doc(g.drop(columns=["dbkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )

"""Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016) — the
full iterative merge loop, completing the pair-count inner step that
stages/analysis.py exposes (`bpe_pair_counts_dataset`).

Reference analogue: the reference tokenizes with fixed rules (SURVEY.md
M2); training a subword vocabulary is the LLM-pipeline extension every
modern data stack runs before model training.

Algorithm (word-type formulation — the canonical one):
1. DISTRIBUTED: count word-type occurrences over the corpus (per-batch
   Arrow group-by partials -> one ``groupby(word).sum`` — the term_df
   plan).  The word-TYPE table is vocabulary-bounded, so it collects to
   the driver: this is the classic BPE training state (Sennrich's
   ``get_stats`` dict), NOT a corpus materialization.
2. DRIVER (vocab-bounded, vectorized): each word segments as
   ``' c1 c2 ... ck '`` (single spaces, sentinel spaces at both ends).
   For each of ``n_merges`` rounds: count adjacent symbol pairs weighted
   by word frequency (flat numpy adjacency over the exploded symbol
   stream — no per-word Python), pick the best pair by
   (count desc, left asc, right asc), and merge every NON-OVERLAPPING
   LEFT-TO-RIGHT occurrence via plain ``str.replace(' l r ', ' lr ')``.

The segmentation string + ``replace`` formulation is shared VERBATIM
with the DuckDB oracle (__ray_entry__._sql_bpe_merges): SQL's
``replace()`` is the same non-overlapping left-to-right scan, and the
space sentinels make token boundaries unambiguous, so the learned merge
tables compare exactly.  One deliberate variant vs textbook BPE: because
a match consumes its TRAILING sentinel space, a run like ``a a a a``
merges every other occurrence (``aa a a``) in one round instead of both
(``aa aa``) — the skipped pair just merges next time it wins; both sides
of the oracle share the rule exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte


def word_type_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset(docs) -> Dataset(word, n): corpus occurrence counts per
    word type (cf, not df) — per-batch combiner, one small groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        g = pa.table({"word": flat}).group_by(
            "word", use_threads=False).aggregate([("word", "count")])
        return pa.table({"word": g["word"],
                         "n": g["word_count"].cast(pa.int64())})

    return (ds.select_columns([id_col, text_col])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte())
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def _pair_counts(segs: np.ndarray, n: np.ndarray) -> pd.DataFrame:
    """(left, right, c) weighted adjacent-pair counts over the current
    segmentations — flat adjacency over the exploded symbol stream."""
    sp = pd.Series(segs, dtype=object).str.strip().str.split(" ")
    lens = sp.str.len().to_numpy(np.int64)
    if lens.sum() == 0:
        return pd.DataFrame({"left": [], "right": [], "c": []})
    flat = np.concatenate([np.asarray(x, dtype=object) for x in sp])
    owner = np.repeat(np.arange(len(segs), dtype=np.int64), lens)
    same = owner[1:] == owner[:-1]
    if not same.any():
        return pd.DataFrame({"left": [], "right": [], "c": []})
    left = flat[:-1][same]
    right = flat[1:][same]
    w = n[owner[:-1][same]]
    out = (pd.DataFrame({"left": left, "right": right, "c": w})
           .groupby(["left", "right"], sort=False, as_index=False)["c"]
           .sum())
    return out


def bpe_train(ds, n_merges: int = 6, text_col: str = "text",
              id_col: str = "doc_id") -> pd.DataFrame:
    """Train ``n_merges`` BPE merges -> DataFrame
    (step, left, right, pair_count), step 1-based in merge order.

    Raises if the corpus runs out of mergeable pairs before ``n_merges``
    (the caller picked too many merges for the corpus — failing loudly
    beats silently returning a short table the oracle can't predict)."""
    wt = word_type_counts(ds, text_col=text_col, id_col=id_col).to_pandas()
    if len(wt) == 0:
        raise ValueError("empty corpus: no word types to train on")
    words = wt["word"].to_numpy(object)
    n = wt["n"].to_numpy(np.int64)
    segs = np.array([" " + " ".join(w) + " " for w in words], dtype=object)

    rows = []
    for step in range(1, int(n_merges) + 1):
        pc_df = _pair_counts(segs, n)
        if len(pc_df) == 0:
            raise ValueError(
                f"corpus exhausted after {step - 1} merges "
                f"(requested {n_merges})")
        best = pc_df.sort_values(["c", "left", "right"],
                                 ascending=[False, True, True],
                                 kind="stable").iloc[0]
        lft, rgt, cnt = str(best["left"]), str(best["right"]), int(best["c"])
        rows.append((step, lft, rgt, cnt))
        old = f" {lft} {rgt} "
        new = f" {lft}{rgt} "
        segs = (pd.Series(segs, dtype=object)
                .str.replace(old, new, regex=False).to_numpy(object))
    return pd.DataFrame(rows, columns=["step", "left", "right",
                                       "pair_count"]).astype(
        {"step": np.int64, "pair_count": np.int64})


def bpe_encode_stats(ds, merges: list[tuple[str, str]],
                     text_col: str = "text", id_col: str = "doc_id"):
    """APPLY a learned merge table -> Dataset (doc_id, n_tokens,
    n_subwords): tokenize each doc, segment every word type, replay the
    merges IN TRAINING ORDER with the same sentinel-space
    non-overlapping ``replace`` rule as ``bpe_train``, and count the
    resulting subwords.  n_subwords/n_tokens is the compression the
    learned vocabulary achieves — the number every tokenizer-training
    run reports.

    Scale shape: a pure per-batch map (no shuffle): the merge table is a
    small Python list captured in the closure (broadcast once per task),
    and each batch segments only its OWN unique word types, so the
    per-batch work is vocabulary-of-batch bounded."""

    def encode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokenize_column(batch[text_col])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        if len(flat) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_subwords": pa.array([], pa.int64())})
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        segs = pd.Series([" " + " ".join(w) + " " for w in uniq],
                         dtype=object)
        for lft, rgt in merges:
            segs = segs.str.replace(f" {lft} {rgt} ", f" {lft}{rgt} ",
                                    regex=False)
        ns = segs.str.strip().str.split(" ").str.len().to_numpy(np.int64)
        df = pd.DataFrame({id_col: ids[parents], "ns": ns[inv]})
        g = (df.groupby(id_col, sort=False)
             .agg(n_tokens=("ns", "size"), n_subwords=("ns", "sum"))
             .reset_index())
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64),
                                 pa.int64()),
            "n_subwords": pa.array(g["n_subwords"].to_numpy(np.int64),
                                   pa.int64()),
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(encode, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte()))

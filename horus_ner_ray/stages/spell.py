"""Phrase suggestion — multi-word 'did you mean' ranked by a bigram
language model (the Elasticsearch phrase suggester's shape: per-token
candidate generation x sequence-level LM rescoring, instead of the
token-independent rewrite of ``search_corrected``).

Pipeline shape (everything bounded except one streaming scan):
1. vocabulary + df from the standard skew-free combiner
   (``term_df_dataset``) — vocab-bounded, collected (the suggest /
   expand_fuzzy precedent);
2. per query token, CANDIDATES = dictionary terms within Levenshtein
   ``max_dist``, ranked (dist asc, df desc, term asc), first
   ``per_token`` (the pair-axis-vectorized DP of ``stages/fuzzy``);
   a token with no candidate kills the query (no suggestion row);
3. the candidate BIGRAM pair set (all adjacent candidate pairs across
   all queries — request-sized) broadcasts into ONE streaming
   ``map_batches`` over the corpus that counts, per batch, (a) each
   candidate pair's occurrences and (b) each candidate LEFT word's
   followed-by-anything occurrences (= the add-one model's c1); a tiny
   groupby folds the partials — the corpus-sized bigram table is never
   built;
4. driver-side (candidate-product-sized): every candidate sequence
   scores sum_i floor(ln((c12_i + 1) / (c1_i + V)) * 1e9 + 0.5) over
   its adjacent pairs — per-pair e9-int quantization BEFORE summation
   (order-free, the bigram-LM contract) — and the best sequence wins
   by (score desc, sequence asc).

Single-token queries have no bigram evidence: they fall back to the
rank-1 candidate (the ``suggest`` contract's head).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte

from horus_ner_ray.config import TOKEN_PATTERN
import re as _re

_TOKEN_RE = _re.compile(TOKEN_PATTERN)


def _candidates(vocab: np.ndarray, dfs: np.ndarray, token: str,
                max_dist: int, per_token: int) -> list[str]:
    """Ranked candidate terms for one token: Levenshtein <= max_dist,
    (dist asc, df desc, term asc), first per_token."""
    from horus_ner_ray.stages.fuzzy import levenshtein_distances

    lens = np.char.str_len(vocab.astype(str))
    band = np.abs(lens - len(token)) <= max_dist
    cand = vocab[band]
    if len(cand) == 0:
        return []
    d = levenshtein_distances(np.full(len(cand), token, dtype=object),
                              cand.astype(str))
    ok = d <= max_dist
    cand, d, df_c = cand[ok], d[ok], dfs[band][ok]
    order = np.lexsort((cand.astype(str), -df_c, d))
    return [str(t) for t in cand[order][:per_token]]


def phrase_suggest(ds, queries: list[str], max_dist: int = 1,
                   per_token: int = 3, text_col: str = "text",
                   id_col: str = "doc_id") -> pd.DataFrame:
    """-> DataFrame (query_id, suggestion, score_e9): the best candidate
    sequence per query under the add-one bigram LM (see module doc);
    queries with an uncorrectable token emit no row."""
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages.termstats import term_df_dataset

    if max_dist < 0 or per_token < 1:
        raise ValueError("max_dist must be >= 0 and per_token >= 1")
    dfv = term_df_dataset(ds, text_col=text_col, id_col=id_col).to_pandas()
    dfv = dfv.sort_values("term").reset_index(drop=True)
    vocab = dfv["term"].to_numpy(object)
    dfs = dfv["df"].to_numpy(np.int64)
    V = len(vocab)

    per_query: list[list[list[str]]] = []
    for q in queries:
        toks = _TOKEN_RE.findall(q.lower())
        cands = [_candidates(vocab, dfs, t, max_dist, per_token)
                 for t in toks]
        per_query.append(cands)

    # the candidate pair/left-word sets across all queries (request-sized)
    pair_set: set[tuple[str, str]] = set()
    left_set: set[str] = set()
    for cands in per_query:
        for a, b in zip(cands, cands[1:]):
            for x in a:
                left_set.add(x)
                for y in b:
                    pair_set.add((x, y))
    pairs = sorted(pair_set)
    lefts = sorted(left_set)
    pkeys = np.array([f"{a} {b}" for a, b in pairs], dtype=object)
    larr = np.array(lefts, dtype=object)

    def count_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokenize_column(batch[text_col])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        c12 = np.zeros(len(pkeys), dtype=np.int64)
        c1 = np.zeros(len(larr), dtype=np.int64)
        if len(flat) >= 2:
            same = parents[1:] == parents[:-1]
            w1 = flat[:-1][same].astype(str)
            w2 = flat[1:][same].astype(str)
            bg = np.char.add(np.char.add(w1, " "), w2).astype(object)
            if len(pkeys):
                i = np.searchsorted(pkeys.astype(str), bg)
                i_c = np.minimum(i, len(pkeys) - 1)
                hit = pkeys[i_c].astype(str) == bg
                np.add.at(c12, i_c[hit], 1)
            if len(larr):
                j = np.searchsorted(larr.astype(str), w1)
                j_c = np.minimum(j, max(len(larr) - 1, 0))
                hitl = larr[j_c].astype(str) == w1
                np.add.at(c1, j_c[hitl], 1)
        return pa.table({
            "i": pa.array(np.arange(len(pkeys) + len(larr),
                                    dtype=np.int64)),
            "c": pa.array(np.concatenate([c12, c1]), pa.int64()),
        })

    if pairs:
        folded = (ds.select_columns([id_col, text_col])
                  .map_batches(count_partial, batch_format="pyarrow",
                               zero_copy_batch=True, runtime_env=_rte())
                  .groupby("i").aggregate(Sum("c", alias_name="c"))
                  .to_pandas().sort_values("i"))
        cvec = folded["c"].to_numpy(np.int64)
        c12_map = {p: int(cvec[i]) for i, p in enumerate(pairs)}
        c1_map = {w: int(cvec[len(pairs) + i]) for i, w in enumerate(lefts)}
    else:
        c12_map, c1_map = {}, {}

    rows = {"query_id": [], "suggestion": [], "score_e9": []}
    for qid, cands in enumerate(per_query):
        if not cands or any(not c for c in cands):
            continue  # uncorrectable token (or zero-token query)
        if len(cands) == 1:
            rows["query_id"].append(qid)
            rows["suggestion"].append(cands[0][0])
            rows["score_e9"].append(0)
            continue
        best: tuple[int, str] | None = None
        from itertools import product

        for seq in product(*cands):
            sc = 0
            for a, b in zip(seq, seq[1:]):
                c12 = c12_map.get((a, b), 0)
                c1 = c1_map.get(a, 0)
                sc += math.floor(
                    math.log((c12 + 1.0) / (c1 + float(V))) * 1e9 + 0.5)
            s = " ".join(seq)
            if best is None or sc > best[0] or (sc == best[0]
                                               and s < best[1]):
                best = (sc, s)
        rows["query_id"].append(qid)
        rows["suggestion"].append(best[1])
        rows["score_e9"].append(best[0])
    out = pd.DataFrame(rows)
    if len(out):
        out["query_id"] = out["query_id"].astype(np.int64)
        out["score_e9"] = out["score_e9"].astype(np.int64)
    return out

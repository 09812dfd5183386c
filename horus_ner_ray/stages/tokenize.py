"""Vectorized tokenizer + postings explode (the engine's hot stage).

The reference runs three tokenizers (NLTK / Stanford JVM / TweetNLP
subprocess) per sentence at ~4-5 s/sentence (reference:
src/core/feature_extraction/util.py:714-726, 730-734 and
src/core/util/nlp_tools.py:11-51).  Here a single deterministic rule, pure
Arrow C++ (re2) kernels, zero Python in the per-token path:

    term := maximal run of [a-z0-9] in lower(text)

The same rule is expressed in the DuckDB oracle SQL
(``regexp_extract_all(lower(text), '[a-z0-9]+')``), so driver correctness
checks compare identical tokenizations.  Case-folding mirrors the
reference's ``UPPER(term)`` dictionary key (src/horus/db/definitions_sql.py
term probe) — the term dictionary is case-insensitive.

All functions are batch-shaped for ``Dataset.map_batches(...,
batch_format="pyarrow", zero_copy_batch=True)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from horus_ner_ray.config import SPLIT_PATTERN


def tokenize_column(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """string column -> list<string> of lowercase tokens (empties removed).

    Vectorized: utf8_lower + re2 split + list filter, no Python loop.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(pc.fill_null(texts, ""))
    toks = pc.split_pattern_regex(low, SPLIT_PATTERN)
    # split_pattern_regex keeps empty strings at run boundaries; drop them
    # while preserving the list structure.
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parents = parents.filter(keep)
    counts = np.bincount(
        np.asarray(parents, dtype=np.int64), minlength=len(texts)
    ).astype(np.int32)
    offsets = np.zeros(len(texts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets), flat)


def token_counts(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row token count (the BM25 document length dl)."""
    toks = tokenize_column(texts)
    return np.asarray(pc.list_value_length(toks), dtype=np.int32)


def _positions_within_groups(parents: np.ndarray) -> np.ndarray:
    """parents is non-decreasing; return 0-based rank within each run."""
    n = len(parents)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(parents[1:], parents[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    run_len = np.diff(np.append(starts, n))
    return (np.arange(n, dtype=np.int64) - np.repeat(starts, run_len)).astype(np.int32)


def explode_to_postings(
    doc_ids: np.ndarray,
    texts: pa.Array | pa.ChunkedArray,
    with_positions: bool = False,
) -> pa.Table:
    """(doc_id, text) batch -> postings rows (term, doc_id, tf[, positions])."""
    return explode_with_dl(doc_ids, texts, with_positions)[0]


def explode_with_dl(
    doc_ids: np.ndarray,
    texts: pa.Array | pa.ChunkedArray,
    with_positions: bool = False,
    stopwords: tuple[str, ...] = (),
) -> tuple[pa.Table, np.ndarray]:
    """(doc_id, text) batch -> (postings rows, per-row dl) with ONE
    tokenization pass (dl = token count falls out of the same list array).

    One postings row per distinct (doc_id, term); tf and position lists
    aggregated by Arrow's C++ hash group-by.  This is the reference's
    matrix-builder flatMap (util.py:623-712) re-expressed columnar.
    """
    toks = tokenize_column(texts)
    flat = pc.list_flatten(toks)
    parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    pos = _positions_within_groups(parents) if with_positions else None
    if stopwords:
        # M5 gate: drop stopword tokens from the postings stream.  dl then
        # counts only indexed tokens (the filtered stream IS the corpus for
        # BM25 purposes); positions stay original-text-relative so phrase
        # adjacency remains text-faithful.
        keep = pc.invert(pc.is_in(flat, value_set=pa.array(sorted(stopwords))))
        keep_np = np.asarray(keep, dtype=bool)
        flat = flat.filter(keep)
        parents = parents[keep_np]
        if pos is not None:
            pos = pos[keep_np]
    dl = np.bincount(parents, minlength=len(texts)).astype(np.int32)
    did = np.asarray(doc_ids, dtype=np.int64)[parents]
    cols = {"term": flat, "doc_id": pa.array(did, pa.int64())}
    aggs = [("doc_id", "count")]
    if with_positions:
        cols["pos"] = pa.array(pos, pa.int32())
        aggs.append(("pos", "list"))
    pairs = pa.table(cols)
    g = pairs.group_by(["term", "doc_id"], use_threads=False).aggregate(aggs)
    out = {
        "term": g["term"],
        "doc_id": g["doc_id"],
        "tf": g["doc_id_count"].cast(pa.int32()),
    }
    if with_positions:
        out["positions"] = g["pos_list"]
    return pa.table(out), dl


def explode_with_dl_codes(
    doc_ids: np.ndarray,
    texts: pa.Array | pa.ChunkedArray,
    with_positions: bool = False,
    stopwords: tuple[str, ...] = (),
) -> tuple[pa.Table, np.ndarray, pa.Array]:
    """Like :func:`explode_with_dl` but terms leave as ``code`` int32 into a
    returned per-batch vocabulary: each token string is hashed exactly ONCE
    (``dictionary_encode``); the stopword gate, the (term, doc_id) group-by
    and everything downstream run on 4-byte ints.  The build's phase-A hot
    path — strings cost is the tokenize split plus one dictionary pass.

    Returns (postings table (code, doc_id, tf[, positions]), per-row dl,
    vocab StringArray where vocab[code] is the term; vocab may contain
    entries with no surviving rows after the stopword gate — the run
    encoder compacts to used codes).
    """
    toks = tokenize_column(texts)
    flat = pc.list_flatten(toks)
    parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    denc = pc.dictionary_encode(flat)
    codes = np.asarray(denc.indices, dtype=np.int32)
    vocab = denc.dictionary
    pos = _positions_within_groups(parents) if with_positions else None
    if stopwords:
        # gate evaluated once over the (small) vocab, gathered to rows
        sw_v = np.asarray(
            pc.is_in(vocab, value_set=pa.array(sorted(stopwords))), dtype=bool
        )
        keep_np = ~sw_v[codes]
        codes = codes[keep_np]
        parents = parents[keep_np]
        if pos is not None:
            pos = pos[keep_np]
    dl = np.bincount(parents, minlength=len(texts)).astype(np.int32)
    did = np.asarray(doc_ids, dtype=np.int64)[parents]
    cols = {"code": pa.array(codes, pa.int32()),
            "doc_id": pa.array(did, pa.int64())}
    aggs = [("doc_id", "count")]
    if with_positions:
        cols["pos"] = pa.array(pos, pa.int32())
        aggs.append(("pos", "list"))
    pairs = pa.table(cols)
    g = pairs.group_by(["code", "doc_id"], use_threads=False).aggregate(aggs)
    out = {
        "code": g["code"],
        "doc_id": g["doc_id"],
        "tf": g["doc_id_count"].cast(pa.int32()),
    }
    if with_positions:
        out["positions"] = g["pos_list"]
    return pa.table(out), dl, vocab


def doc_lengths_table(batch: pa.Table, doc_id_col: str = "doc_id") -> pa.Table:
    """(doc_id, dl) per row of the input batch."""
    return pa.table(
        {
            "doc_id": batch[doc_id_col],
            "dl": pa.array(token_counts(batch["text"]), pa.int32()),
        }
    )

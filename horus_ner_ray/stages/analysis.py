"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting.

Reference analogues: language detection + translate hook (SURVEY.md M10,
reference: src/core/feature_extraction/features.py:170-222 — langdetect with
``DetectorFactory.seed = 0`` for determinism, language_detection.py:7) and
the derived lexical feature family (M9, horus_to_conll.py:49-85).  Web API
calls are replaced by deterministic local heuristics; everything runs as
vectorized ``map_batches``; the stopword tables are module constants
(broadcast once with the function closure, not per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte

# Tiny per-language stopword profiles (public common-word lists).
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the to a and of in is you that it for on with as are this be have from or at".split()),
    "es": frozenset("el la de que y a en un ser se no haber por con su para como estar tener le lo".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist im dem nicht ein eine als".split()),
    "fr": frozenset("le de un a et être en avoir que pour dans ce il qui ne sur se pas plus par".split()),
}

_STOP_EN = _LANG_STOPWORDS["en"]


# script ranges checked in priority order (first match per char, like the
# old per-char elif chain): (code, lo, hi)
_SCRIPT_RANGES = [("zh", 0x4E00, 0x9FFF), ("ja", 0x3040, 0x30FF),
                  ("ko", 0xAC00, 0xD7AF), ("ru", 0x0400, 0x04FF)]
# descending lexicographic so argmax's first-max-wins reproduces
# max(..., key=(count, lang)) tie-breaking toward the larger lang code
_LANGS_DESC = sorted(_LANG_STOPWORDS, reverse=True)
_STOP_ARRAYS = {lang: pa.array(sorted(sw)) for lang, sw in _LANG_STOPWORDS.items()}


def langid_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Heuristic n-gram/stopword language id: script detection first (CJK ->
    zh, kana -> ja, hangul -> ko, cyrillic -> ru), else the language whose
    stopword profile hits most tokens; 'und' when nothing matches.

    Vectorized: the whole batch's text decodes to a single uint32 codepoint
    array (one C-level join + encode), script histograms are range masks +
    segment sums over row offsets, and stopword hits are ``pc.is_in`` +
    ``np.bincount`` per language — no per-row or per-char Python loop."""
    n = len(batch)
    text_filled = pc.fill_null(batch[text_col], "")
    texts = text_filled.to_pylist()
    # --- script histograms over the first 200 chars of each row ---------
    clens = np.minimum(np.asarray(pc.utf8_length(text_filled), dtype=np.int64), 200)
    joined = "".join(s[:200] for s in texts)  # C-level slicing+join only
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(clens, out=offsets[1:])
    script_counts = np.zeros((len(_SCRIPT_RANGES), n), dtype=np.int64)
    claimed = np.zeros(len(cps), dtype=bool)
    for si, (_, lo, hi) in enumerate(_SCRIPT_RANGES):
        m = (cps >= lo) & (cps <= hi) & ~claimed
        claimed |= m
        if m.any():
            cum = np.zeros(len(cps) + 1, dtype=np.int64)
            np.cumsum(m, out=cum[1:])
            script_counts[si] = cum[offsets[1:]] - cum[offsets[:-1]]
    best_si = np.argmax(script_counts, axis=0)  # first max wins = dict order
    best_script_n = script_counts[best_si, np.arange(n)]
    # --- stopword-profile hits ------------------------------------------
    toks = tokenize_column(batch[text_col])
    flat = pc.list_flatten(toks)
    parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    tok_lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    lang_hits = np.zeros((len(_LANGS_DESC), n), dtype=np.int64)
    if len(flat):
        for li, lang in enumerate(_LANGS_DESC):
            is_sw = np.asarray(pc.is_in(flat, value_set=_STOP_ARRAYS[lang]), dtype=bool)
            lang_hits[li] = np.bincount(parents[is_sw], minlength=n)
    best_li = np.argmax(lang_hits, axis=0)  # first max = largest lang code
    best_lang_n = lang_hits[best_li, np.arange(n)]
    # --- combine (same precedence as the scalar version) ----------------
    script_codes = np.array([c for c, _, _ in _SCRIPT_RANGES], dtype=object)
    lang_codes = np.array(_LANGS_DESC, dtype=object)
    preds = np.where(
        best_script_n >= 3,
        script_codes[best_si],
        np.where((tok_lens > 0) & (best_lang_n > 0), lang_codes[best_li], "und"),
    )
    return pa.table({"doc_id": batch[id_col], "lang_pred": pa.array(preds, pa.string())})


def langid_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: langid_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True, runtime_env=_rte(),
    )


def quality_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-doc quality counters — all integers so the DuckDB oracle matches
    hash-exactly: token count, distinct tokens, English-stopword tokens,
    alphanumeric chars, total chars."""
    toks = tokenize_column(batch[text_col])
    flat = pc.list_flatten(toks)
    parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    n = len(batch)
    n_tokens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    # distinct tokens per doc
    pairs = pa.table({"p": pa.array(parents), "t": flat})
    dg = pairs.group_by(["p", "t"], use_threads=False).aggregate([])
    n_unique = np.bincount(np.asarray(dg["p"], dtype=np.int64), minlength=n).astype(np.int64)
    # stopword occurrences per doc (vectorized membership)
    is_stop = pc.is_in(flat, value_set=pa.array(sorted(_STOP_EN)))
    n_stop = np.bincount(
        parents[np.asarray(is_stop, dtype=bool)] if len(parents) else np.zeros(0, np.int64),
        minlength=n,
    ).astype(np.int64)
    # characters
    text_filled = pc.fill_null(batch[text_col], "")
    n_chars = np.asarray(pc.utf8_length(text_filled), dtype=np.int64)
    alnum_total = np.zeros(n, dtype=np.int64)
    if len(flat):
        tok_lens = pc.utf8_length(flat)
        alnum_total = np.bincount(
            parents, weights=np.asarray(tok_lens, dtype=np.float64), minlength=n
        ).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch[id_col],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_unique": pa.array(n_unique, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "n_alnum_chars": pa.array(alnum_total, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def quality_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: quality_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True, runtime_env=_rte(),
    )


# BPE-ish sub-word-ish token rule, shared verbatim with the DuckDB oracle:
# letter runs, digit runs, or single non-alnum-non-space characters.
BPEISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpeish_count_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc count of BPE-ish tokens (whitespace + regex rule)."""

    def fn2(batch: pa.Table) -> pa.Table:
        # vectorized: count_substring_regex counts non-overlapping matches,
        # exactly re.findall's count, without the per-row Python loop
        counts = pc.count_substring_regex(
            pc.fill_null(batch[text_col], ""), BPEISH_PATTERN
        )
        return pa.table(
            {"doc_id": batch[id_col], "n_bpeish": counts.cast(pa.int64())}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn2, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
    )


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Gopher/C4-style repetition counters per document: total bigrams,
    duplicate bigrams (total - distinct), and the most repeated bigram's
    count.  High duplicate fractions flag boilerplate / degenerate text in
    training-data curation.

    Fully flat: one sliding-window hash over the batch's whole token
    stream, a (doc, bigram-hash) lexsort, then run-length stats via
    ``np.diff``/``reduceat`` — no per-document Python.  Counts are over
    64-bit bigram hashes; an in-document collision would merge two bigram
    counts (deterministic, vanishing at ~doc_len^2 / 2^64 — the same
    reliance as the shingle-hash dedup family).  Docs with < 2 tokens have
    no bigrams and emit no row (matches the SQL oracle's semantics).
    """
    toks = tokenize_column(batch[text_col])
    flat = np.asarray(pc.list_flatten(toks), dtype=object)
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    cols = ("n_bigrams", "n_dup_bigrams", "top_bigram_n")
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      **{c: pa.array([], pa.int64()) for c in cols}})
    if len(flat) < 2:
        return empty
    th = pd.util.hash_array(flat, categorize=False)
    parents = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    bh = th[:-1] * _FP_BASE + th[1:]
    same_doc = parents[:-1] == parents[1:]
    bp, bh = parents[:-1][same_doc], bh[same_doc]
    if len(bp) == 0:
        return empty
    order = np.lexsort((bh, bp))
    bp, bh = bp[order], bh[order]
    # run boundaries over (doc, bigram) pairs -> per-pair counts
    new_run = np.ones(len(bp), dtype=bool)
    new_run[1:] = (bp[1:] != bp[:-1]) | (bh[1:] != bh[:-1])
    rstarts = np.flatnonzero(new_run)
    run_len = np.diff(np.r_[rstarts, len(bp)])
    run_doc = bp[rstarts]
    # per-doc aggregates over the doc-sorted runs
    new_doc = np.ones(len(run_doc), dtype=bool)
    new_doc[1:] = run_doc[1:] != run_doc[:-1]
    dstarts = np.flatnonzero(new_doc)
    n_distinct = np.diff(np.r_[dstarts, len(run_doc)])
    n_total = np.add.reduceat(run_len, dstarts)
    top = np.maximum.reduceat(run_len, dstarts)
    ids = np.asarray(batch[id_col], dtype=np.int64)[run_doc[dstarts]]
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_bigrams": pa.array(n_total.astype(np.int64), pa.int64()),
        "n_dup_bigrams": pa.array((n_total - n_distinct).astype(np.int64), pa.int64()),
        "top_bigram_n": pa.array(top.astype(np.int64), pa.int64()),
    })


def repetition_stats_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: repetition_stats_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True, runtime_env=_rte(),
    )


_FP_BASE = np.uint64(1099511628211)  # FNV-ish multiplier


def fingerprint_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Order-sensitive rolling polynomial hash of the token sequence: two
    docs share a fingerprint iff their token sequences are identical
    (case/punct-insensitive content identity — the content-defined analogue
    of exact_dedup)."""
    toks = tokenize_column(batch[text_col])
    flat = np.asarray(pc.list_flatten(toks), dtype=object)
    n = len(batch)
    seed = np.uint64(0x811C9DC5)
    out = np.full(n, seed, dtype=np.uint64)
    if len(flat):
        th = pd.util.hash_array(flat, categorize=False)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # Horner closed form, fully vectorized (uint64 wraparound is the
        # modulus — overflow intended):
        #   fp = seed * B^L + sum_i h_i * B^(L-1-i)
        with np.errstate(over="ignore"):
            maxL = int(lens.max())
            powB = np.empty(maxL + 1, dtype=np.uint64)
            powB[0] = 1
            np.multiply.accumulate(
                np.full(maxL, _FP_BASE, dtype=np.uint64), out=powB[1:]
            )
            pos = np.arange(len(th), dtype=np.int64) - np.repeat(starts, lens)
            exp = np.repeat(lens, lens) - 1 - pos
            contrib = th * powB[exp]
            out = seed * powB[lens]
            nz = lens > 0
            if nz.any():
                out[nz] += np.add.reduceat(contrib, starts[nz])
    return pa.table(
        {"doc_id": batch[id_col], "fingerprint": pa.array(out.astype(np.int64), pa.int64())}
    )


def fingerprint_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: fingerprint_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True, runtime_env=_rte(),
    )


def chunk_documents_batch(batch: pa.Table, max_tokens: int,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Context-window chunking: split each document's token stream into
    consecutive chunks of at most ``max_tokens`` tokens — the preprocessing
    step embedding/training pipelines run so every unit fits a model
    window.  Chunk text is the token stream rejoined with single spaces
    (tokens ARE the content under this engine's shared rule; original
    inter-token whitespace is not preserved).

    Per-row pure function -> embarrassingly parallel flat-map; fully
    vectorized: chunk boundaries are the token positions where
    ``pos %% max_tokens == 0``, the chunk texts come from ONE
    ``pc.binary_join`` over a rebuilt Arrow ListArray sliced at those
    boundaries — no pandas, no per-chunk Python call.  Docs with zero
    tokens emit no chunks.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    toks = tokenize_column(batch[text_col])
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):  # ListArray.from_arrays needs flat
        flat = flat.combine_chunks()
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    if len(flat) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "chunk_idx": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string()),
                         "n_tokens": pa.array([], pa.int64())})
    doc_of_tok = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts[:-1], lens)
    cstarts = np.flatnonzero(pos % max_tokens == 0)
    offsets = np.r_[cstarts, len(flat)]
    chunk_lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), flat)
    ids = np.asarray(batch[id_col], dtype=np.int64)
    return pa.table({
        id_col: pa.array(ids[doc_of_tok[cstarts]], pa.int64()),
        "chunk_idx": pa.array(pos[cstarts] // max_tokens, pa.int64()),
        "chunk_text": pc.binary_join(chunk_lists, " "),
        "n_tokens": pa.array(np.diff(offsets), pa.int64()),
    })


def chunk_documents_dataset(ds, max_tokens: int = 256, text_col: str = "text",
                            id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: chunk_documents_batch(b, max_tokens, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte(),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality filter
# ---------------------------------------------------------------------------

# Rule thresholds after Rae et al. 2021 ("Scaling Language Models: ...
# Gopher"), Appendix A1.1 — public heuristics for web-scale training-data
# filtering.  All regexes are RE2 (pyarrow and DuckDB share the engine), so
# the SQL oracle reproduces every counter exactly.
GOPHER_WORD_RE = r"\S+"
GOPHER_ALPHA_WORD_RE = r"\S*[a-zA-Z]\S*"
GOPHER_BULLET_RE = r"(?m)^[\-\*•]"
GOPHER_ELLIPSIS_LINE_RE = r"(?m)\.\.\.$"
GOPHER_DEFAULTS = dict(
    min_words=50, max_words=100_000,
    min_mean_word_len_e6=3_000_000, max_mean_word_len_e6=10_000_000,
    min_alpha_frac_e6=800_000, max_bullet_frac_e6=900_000,
    max_ellipsis_frac_e6=300_000, max_symbol_ratio_e6=100_000,
)


def _frac_e6(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """floor(1e6*num/den + 0.5) with 0 where den == 0 — single-expression
    double arithmetic, reproduced verbatim by the SQL oracle."""
    out = np.zeros(len(num), dtype=np.int64)
    nz = den > 0
    out[nz] = np.floor(
        1e6 * num[nz].astype(np.float64) / den[nz].astype(np.float64) + 0.5
    ).astype(np.int64)
    return out


def gopher_quality_batch(batch: pa.Table, text_col: str = "text",
                         id_col: str = "doc_id", **thresholds) -> pa.Table:
    """Per-doc Gopher-rule metrics + keep flag, fully vectorized over Arrow
    (count_substring_regex / utf8_length — zero Python per row).  The
    reference's only quality gate is per-token (horus_to_conll.py:49-85
    lexical features); this is the corpus-level filter a 100-TB training
    corpus needs before tokenization."""
    th = {**GOPHER_DEFAULTS, **thresholds}
    t = pc.fill_null(batch[text_col], "")
    n_words = np.asarray(pc.count_substring_regex(t, GOPHER_WORD_RE), dtype=np.int64)
    word_chars = np.asarray(
        pc.utf8_length(pc.replace_substring_regex(t, r"\s+", "")), dtype=np.int64
    )
    n_alpha = np.asarray(
        pc.count_substring_regex(t, GOPHER_ALPHA_WORD_RE), dtype=np.int64
    )
    n_chars = np.asarray(pc.utf8_length(t), dtype=np.int64)
    chars_no_nl = np.asarray(
        pc.utf8_length(pc.replace_substring(t, "\n", "")), dtype=np.int64
    )
    n_lines = n_chars - chars_no_nl + 1
    n_bullet = np.asarray(pc.count_substring_regex(t, GOPHER_BULLET_RE), dtype=np.int64)
    n_ellipsis = np.asarray(
        pc.count_substring_regex(t, GOPHER_ELLIPSIS_LINE_RE), dtype=np.int64
    )
    chars_no_hash = np.asarray(
        pc.utf8_length(pc.replace_substring(t, "#", "")), dtype=np.int64
    )
    n_symbols = (n_chars - chars_no_hash) + np.asarray(
        pc.count_substring_regex(t, r"\.\.\."), dtype=np.int64
    )
    mean_wl = _frac_e6(word_chars, n_words)
    alpha_frac = _frac_e6(n_alpha, n_words)
    bullet_frac = _frac_e6(n_bullet, n_lines)
    ellipsis_frac = _frac_e6(n_ellipsis, n_lines)
    symbol_ratio = _frac_e6(n_symbols, n_words)
    keep = (
        (n_words >= th["min_words"]) & (n_words <= th["max_words"])
        & (mean_wl >= th["min_mean_word_len_e6"]) & (mean_wl <= th["max_mean_word_len_e6"])
        & (alpha_frac >= th["min_alpha_frac_e6"])
        & (bullet_frac <= th["max_bullet_frac_e6"])
        & (ellipsis_frac <= th["max_ellipsis_frac_e6"])
        & (symbol_ratio <= th["max_symbol_ratio_e6"])
    )
    return pa.table(
        {
            "doc_id": batch[id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len_e6": pa.array(mean_wl, pa.int64()),
            "alpha_frac_e6": pa.array(alpha_frac, pa.int64()),
            "bullet_frac_e6": pa.array(bullet_frac, pa.int64()),
            "ellipsis_frac_e6": pa.array(ellipsis_frac, pa.int64()),
            "symbol_ratio_e6": pa.array(symbol_ratio, pa.int64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        }
    )


def gopher_quality_dataset(ds, text_col: str = "text", id_col: str = "doc_id",
                           **thresholds):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: gopher_quality_batch(b, text_col, id_col, **thresholds),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte(),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (name, RE2 pattern, replacement) applied IN ORDER; counts are taken on the
# text as it stands before that pattern's replacement (so the SQL oracle's
# staged CTEs reproduce them exactly).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[\- ]\d{3}[\- ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Redact emails/phones/IPv4s and count matches per doc — one
    replace_substring_regex pass per pattern, all Arrow kernels.  The
    pattern list is deliberately ordered: earlier replacements cannot
    create later matches (the sentinels contain no digits/@)."""
    t = pc.fill_null(batch[text_col], "")
    cols: dict[str, pa.Array] = {"doc_id": batch[id_col]}
    for name, pat, repl in PII_PATTERNS:
        cols[f"n_{name}"] = pc.count_substring_regex(t, pat).cast(pa.int64())
        t = pc.replace_substring_regex(t, pat, repl)
    cols["redacted"] = t
    return pa.table(cols)


def redact_pii_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: redact_pii_batch(b, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte(),
    )


# ---------------------------------------------------------------------------
# BPE-style adjacent-pair counting (the tokenizer-training inner loop)
# ---------------------------------------------------------------------------

def bpe_pair_partials(text_col: str = "text", id_col: str = "doc_id"):
    """map_batches fn: batch -> partial (pair, n) counts of ADJACENT token
    pairs within each doc (tokenizer rule shared with the index/oracle).
    This is the count step of a BPE merge round (Sennrich et al. 2016) as a
    distributed combiner: per-batch Arrow group-by collapses duplicates
    before the global shuffle, so shuffled bytes scale with distinct pairs
    per batch, not corpus tokens."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        if len(flat) < 2:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = parents[1:] == parents[:-1]
        left = flat.slice(0, len(flat) - 1)
        right = flat.slice(1)
        joined = pc.binary_join_element_wise(left, right, " ")
        pairs = joined.filter(pa.array(same))
        g = pa.table({"pair": pairs}).group_by("pair", use_threads=False) \
            .aggregate([("pair", "count")])
        return pa.table({"pair": g["pair"],
                         "n": g["pair_count"].cast(pa.int64())})

    return fn


def bpe_pair_counts_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset(docs) -> Dataset(pair, n): global adjacent-pair counts.
    One small groupby over per-batch partials (same plan as term_df)."""
    from ray.data.aggregate import Sum

    parts = ds.select_columns([id_col, text_col]).map_batches(
        bpe_pair_partials(text_col, id_col), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    )
    return parts.groupby("pair").aggregate(Sum("n", alias_name="n"))


def json_int_field_dataset(ds, col: str, key: str, out_col: str = "value",
                           id_cols: list[str] | None = None):
    """Extract an integer field from a flat-JSON string column — the
    ETL sidecar-parse step (event properties, tool-call payloads):
    Dataset -> Dataset(id_cols..., <out_col>), null where the key is
    absent or non-integer.

    Vectorized fast path: one compiled regex per batch
    (``"<key>"\\s*:\\s*(-?\\d+)``) instead of a per-row json.loads —
    exact JSON semantics for FLAT objects with integer values (the
    driver oracle checks this contract against DuckDB's real
    json_extract).  Keys are matched as whole JSON strings, so 'k'
    never matches 'kk'."""
    import re as _re

    pat = _re.compile('"' + _re.escape(key) + r'"\s*:\s*(-?\d+)')

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(np.asarray(batch[col], dtype=object), dtype=object)
        ext = s.str.extract(pat, expand=False)
        vals = pd.to_numeric(ext, errors="coerce")
        cols = {}
        for c in (id_cols or []):
            cols[c] = batch[c]
        arr = vals.to_numpy(np.float64)
        miss = np.isnan(arr)
        cols[out_col] = pa.array(
            np.where(miss, 0, arr).astype(np.int64), pa.int64(),
            mask=miss)
        return pa.table(cols)

    keep = list(dict.fromkeys([*(id_cols or []), col]))
    return ds.select_columns(keep).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=_rte())

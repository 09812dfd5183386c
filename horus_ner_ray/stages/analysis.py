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


def langid_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Heuristic n-gram/stopword language id: script detection first (CJK ->
    zh, kana -> ja, hangul -> ko, cyrillic -> ru), else the language whose
    stopword profile hits most tokens; 'und' when nothing matches."""
    toks = tokenize_column(batch[text_col])
    texts = batch[text_col].to_pylist()
    preds: list[str] = []
    for i, tl in enumerate(toks.to_pylist()):
        s = texts[i] or ""
        scripts = {"zh": 0, "ja": 0, "ko": 0, "ru": 0}
        for ch in s[:200]:
            o = ord(ch)
            if 0x4E00 <= o <= 0x9FFF:
                scripts["zh"] += 1
            elif 0x3040 <= o <= 0x30FF:
                scripts["ja"] += 1
            elif 0xAC00 <= o <= 0xD7AF:
                scripts["ko"] += 1
            elif 0x0400 <= o <= 0x04FF:
                scripts["ru"] += 1
        best_script = max(scripts, key=scripts.get)  # type: ignore[arg-type]
        if scripts[best_script] >= 3:
            preds.append(best_script)
            continue
        if not tl:
            preds.append("und")
            continue
        hits = {lang: sum(1 for t in tl if t in sw) for lang, sw in _LANG_STOPWORDS.items()}
        lang, n = max(hits.items(), key=lambda kv: (kv[1], kv[0]))
        preds.append(lang if n > 0 else "und")
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
        import re

        pat = re.compile(BPEISH_PATTERN)
        texts = pc.fill_null(batch[text_col], "").to_pylist()
        counts = np.fromiter(
            (len(pat.findall(s)) for s in texts), dtype=np.int64, count=len(texts)
        )
        return pa.table(
            {"doc_id": batch[id_col], "n_bpeish": pa.array(counts, pa.int64())}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn2, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
    )


_FP_BASE = np.uint64(1099511628211)  # FNV-ish multiplier


def fingerprint_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Order-sensitive rolling polynomial hash of the token sequence: two
    docs share a fingerprint iff their token sequences are identical
    (case/punct-insensitive content identity — the content-defined analogue
    of exact_dedup)."""
    toks = tokenize_column(batch[text_col])
    flat = np.asarray(pc.list_flatten(toks), dtype=object)
    parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    n = len(batch)
    out = np.full(n, np.uint64(0x811C9DC5), dtype=np.uint64)
    if len(flat):
        th = pd.util.hash_array(flat, categorize=False)
        # rolling hash per doc: out = out * B + h, in token order
        # (uint64 wraparound is the modulus — overflow intended)
        with np.errstate(over="ignore"):
            for i in range(len(th)):  # per-token; acceptable: fingerprints
                p = parents[i]        # are an audit stage, not the hot path
                out[p] = out[p] * _FP_BASE + th[i]
    return pa.table(
        {"doc_id": batch[id_col], "fingerprint": pa.array(out.astype(np.int64), pa.int64())}
    )


def fingerprint_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: fingerprint_batch(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True, runtime_env=_rte(),
    )

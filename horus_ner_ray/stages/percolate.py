"""Percolation — REVERSE search (Elasticsearch's percolator): a small
set of STORED queries is registered once, and the document stream is
matched against them — "which alerts does this new doc trigger", the
standing-query/alerting half of a fulltext engine.

Ray-Data shape: the stored queries are request-sized (an alert table,
not a corpus), so they parse once on the driver and ride into every
batch task as plain captured state (tiny — no ray.put needed); the
corpus STREAMS through one ``map_batches`` with NO shuffle and no
tokenization: per distinct stored-query term, ONE vectorized Arrow C++
regex (``match_substring_regex``) computes the per-doc membership bit —
the pattern ``(^|[^a-z0-9])term($|[^a-z0-9])`` is exactly "term occurs
as a maximal [a-z0-9]+ run of lower(text)", i.e. the engine tokenizer's
membership (terms are [a-z0-9]+ by construction, so no escaping).
Per-query AND/OR then combines the term bits with numpy.

At 100 TB this is the ideal stage shape: broadcast-small side, pure
streaming scan, per-batch cost O(#distinct stored terms) C++ kernels.

Semantics shared with the query engine: a query with zero tokens
matches nothing; AND requires every term, OR any.  Oracle: the driver's
``percolate_matches`` SQL restates membership via the shared tokenizer
(unnest + group), so hash conformance checks the regex<->tokenizer
equivalence itself.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from horus_ner_ray.config import TOKEN_PATTERN

_TOKEN_RE = re.compile(TOKEN_PATTERN)
# the boundary regexes below negate the token character class, so they
# must derive from the SAME pattern (CLAUDE.md: the tokenizer rule is
# shared verbatim with the oracle SQL — change both or neither)
assert TOKEN_PATTERN.startswith("[") and TOKEN_PATTERN.endswith("]+"), \
    "percolate boundary regex assumes a '[...]+' token pattern"
_NON_TOKEN = f"[^{TOKEN_PATTERN[1:-2]}]"


def parse_stored_queries(queries: list[dict]) -> list[dict]:
    """Driver-side parse: [{query_id, text, mode}] ->
    [{query_id, terms (sorted distinct), mode}] with modes validated."""
    out = []
    for q in queries:
        mode = q.get("mode", "or")
        if mode not in ("or", "and"):
            raise ValueError(f"stored query mode must be or|and, got {mode!r}")
        out.append({
            "query_id": int(q["query_id"]),
            "terms": sorted(set(_TOKEN_RE.findall(str(q["text"]).lower()))),
            "mode": mode,
            "exclude": sorted(set(_TOKEN_RE.findall(
                str(q.get("exclude", "")).lower()))),
        })
    return out


def _match_batch(batch: pa.Table, parsed: list[dict],
                 id_col: str, text_col: str) -> pa.Table:
    low = pc.utf8_lower(batch[text_col])
    terms = sorted({t for q in parsed for t in q["terms"]}
                   | {t for q in parsed for t in q.get("exclude", ())})
    member: dict[str, np.ndarray] = {}
    for t in terms:
        pat = f"(^|{_NON_TOKEN}){t}($|{_NON_TOKEN})"
        member[t] = np.asarray(
            pc.match_substring_regex(low, pat), dtype=bool)
    n = len(batch)
    ids = np.asarray(batch[id_col], dtype=np.int64)
    out_doc: list[np.ndarray] = []
    out_q: list[np.ndarray] = []
    for q in parsed:
        if not q["terms"]:
            continue  # zero-token query matches nothing (engine semantics)
        acc = None
        for t in q["terms"]:
            m = member[t]
            if acc is None:
                acc = m.copy()
            elif q["mode"] == "and":
                acc &= m
            else:
                acc |= m
        for t in q.get("exclude", ()):  # boolean-NOT stored clause
            acc &= ~member[t]
        hit = np.flatnonzero(acc)
        if len(hit):
            out_doc.append(ids[hit])
            out_q.append(np.full(len(hit), q["query_id"], dtype=np.int64))
    if not out_doc:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64())})
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), pa.int64()),
        "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
    })


def percolate_dataset(docs, queries: list[dict],
                      id_col: str = "doc_id", text_col: str = "text"):
    """docs: Dataset with (id_col, text_col); queries: [{query_id, text,
    mode}].  Returns a Dataset of (query_id, doc_id) match rows."""
    from horus_ner_ray.util import worker_runtime_env

    parsed = parse_stored_queries(queries)

    def fn(batch: pa.Table) -> pa.Table:
        return _match_batch(batch, parsed, id_col, text_col)

    return docs.map_batches(fn, batch_format="pyarrow",
                            zero_copy_batch=True,
                            runtime_env=worker_runtime_env())

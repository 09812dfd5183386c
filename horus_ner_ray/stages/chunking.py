"""Token-window document chunking (RAG / training-context preparation).

Splits each document's token stream into fixed-size windows of ``window``
tokens advancing by ``stride`` (stride < window = overlapping chunks, the
standard RAG chunk-overlap shape).  Chunk ``j`` of a document covers
tokens ``[j*stride, min(j*stride + window, dl))``; a document with ``dl``
tokens yields ``ceil(dl / stride)`` chunks (zero-token documents yield
none), so every token belongs to at least one chunk and chunk starts are
a pure function of (dl, stride) — partitioning-invariant and resumable.

The reference's analogue is its sentence-window feature extraction
(reference: src/core/feature_extraction/features.py:283-311 slides fixed
windows over token streams); here the whole stage is one streaming
``map_batches`` over zero-copy Arrow — tokenize (shared [a-z0-9]+ rule),
vectorized overlap-window gather (one ``take`` on the flat token array,
no per-doc Python), ``binary_join`` to rebuild chunk text.

The DuckDB oracle restates the rule verbatim: ``regexp_extract_all``
tokens + a lateral ``generate_series`` over chunk indexes + 1-based
inclusive list slicing + ``array_to_string``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte


def chunk_tokens_batch(batch: pa.Table, window: int, stride: int,
                       doc_id_col: str = "doc_id",
                       text_col: str = "text") -> pa.Table:
    """One batch -> (doc_id, chunk_idx, n_tokens, chunk_text) rows.

    Overlapping windows cannot be expressed as a monotone list-offset
    slice of the flat token array, so the kernel builds ONE gather-index
    array covering every chunk's token range and does a single ``take``
    — all numpy/Arrow, no Python per document or per chunk.
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1, got {window}/{stride}")
    doc_ids = np.asarray(batch[doc_id_col].combine_chunks(), dtype=np.int64)
    toks = tokenize_column(batch[text_col])
    flat = toks.flatten()
    dl = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    tok_off = np.zeros(len(dl) + 1, dtype=np.int64)
    np.cumsum(dl, out=tok_off[1:])

    n_chunks = (dl + stride - 1) // stride          # 0 chunks for dl == 0
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })
    doc_sel = np.repeat(np.arange(len(dl)), n_chunks)
    # chunk_idx = rank within each doc's run of chunks
    run_starts = np.zeros(len(dl) + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=run_starts[1:])
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
        run_starts[:-1], n_chunks)

    starts = chunk_idx * stride                      # doc-local
    ends = np.minimum(starts + window, dl[doc_sel])
    lens = ends - starts
    out_off = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    # gather index: for token t of chunk c, flat index =
    #   doc_token_offset[doc] + start[c] + (t - chunk_out_offset[c])
    gidx = (np.arange(out_off[-1], dtype=np.int64)
            - np.repeat(out_off[:-1], lens)
            + np.repeat(tok_off[doc_sel] + starts, lens))
    chunk_lists = pa.ListArray.from_arrays(
        pa.array(out_off, pa.int32()), flat.take(pa.array(gidx)))
    return pa.table({
        "doc_id": pa.array(doc_ids[doc_sel]),
        "chunk_idx": pa.array(chunk_idx),
        "n_tokens": pa.array(lens),
        "chunk_text": pc.binary_join(chunk_lists, " "),
    })


def chunk_documents_dataset(ds, window: int = 32, stride: int = 24):
    """documents(doc_id, text) -> chunks(doc_id, chunk_idx, n_tokens,
    chunk_text), streaming — one map_batches, no shuffle; chunk counts
    depend only on each row, so any batching/partitioning gives the same
    rows."""
    return ds.map_batches(
        lambda b: chunk_tokens_batch(b, window, stride),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte(),
    )

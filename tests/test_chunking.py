"""Token-window chunking: vectorized kernel vs a naive per-doc reference,
dataset-level batching invariance, and edge shapes."""

import re

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from horus_ner_ray.stages.chunking import (chunk_documents_dataset,
                                           chunk_tokens_batch)

TOK = re.compile(r"[a-z0-9]+")


def naive_chunks(doc_id, text, window, stride):
    toks = TOK.findall(text.lower())
    out = []
    j = 0
    while j * stride < len(toks):
        w = toks[j * stride: j * stride + window]
        out.append((doc_id, j, len(w), " ".join(w)))
        j += 1
    return out


def _kernel(rows, window, stride):
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    got = chunk_tokens_batch(t, window, stride)
    return list(zip(got["doc_id"].to_pylist(), got["chunk_idx"].to_pylist(),
                    got["n_tokens"].to_pylist(), got["chunk_text"].to_pylist()))


def test_kernel_matches_naive():
    rows = [
        (1, "The quick brown fox jumps over the lazy dog again and again"),
        (2, ""),
        (3, "one"),
        (4, "a b c d e f g h i j k l m n o p"),
        (5, "punct!!! only??? ... 123 go-go"),
    ]
    for window, stride in [(4, 3), (4, 4), (3, 5), (1, 1), (8, 2)]:
        want = [c for d, tx in rows for c in naive_chunks(d, tx, window, stride)]
        assert _kernel(rows, window, stride) == want, (window, stride)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="ab1 .!", max_size=40), min_size=0, max_size=12),
       st.integers(1, 6), st.integers(1, 6))
def test_kernel_fuzz_vs_naive(texts, window, stride):
    rows = [(i, t) for i, t in enumerate(texts)]
    want = [c for d, tx in rows for c in naive_chunks(d, tx, window, stride)]
    assert _kernel(rows, window, stride) == want


def test_every_token_covered_and_overlap():
    text = " ".join(f"t{i}" for i in range(25))
    got = _kernel([(7, text)], 8, 5)
    seen = set()
    for _d, j, n, ct in got:
        toks = ct.split(" ")
        assert len(toks) == n
        seen.update(range(j * 5, j * 5 + n))
    assert seen == set(range(25))
    # overlap: consecutive chunks share window - stride tokens
    assert got[0][3].split(" ")[5:] == got[1][3].split(" ")[:3]


def test_bad_params_raise():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["x"], pa.string())})
    with pytest.raises(ValueError):
        chunk_tokens_batch(t, 0, 1)
    with pytest.raises(ValueError):
        chunk_tokens_batch(t, 4, 0)


def test_dataset_batching_invariance(ray_session):
    import ray.data as rd

    rows = [{"doc_id": i, "text": f"alpha beta {i} " * (i % 7)}
            for i in range(40)]
    a = chunk_documents_dataset(
        rd.from_items(rows).repartition(1), window=5, stride=3).to_pandas()
    b = chunk_documents_dataset(
        rd.from_items(rows).repartition(13), window=5, stride=3).to_pandas()
    key = ["doc_id", "chunk_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    want = [c for r in rows for c in naive_chunks(r["doc_id"], r["text"], 5, 3)]
    assert list(map(tuple, a.itertuples(index=False))) == want

"""Tokenizer unit tests (FIXTURES.md edge cases; SURVEY.md M2-M4)."""

import numpy as np
import pyarrow as pa

from horus_ner_ray.stages.tokenize import (
    explode_to_postings,
    token_counts,
    tokenize_column,
)


def toks(s: str) -> list[str]:
    return tokenize_column(pa.array([s]))[0].as_py()


def test_basic_and_casefold():
    assert toks("Hello, World-42!") == ["hello", "world", "42"]
    assert toks("The THE the tHe") == ["the"] * 4


def test_empty_and_punct_only():
    assert toks("") == []
    assert toks("?!… —;;; ..") == []
    assert token_counts(pa.array(["", "a b", "?!"])).tolist() == [0, 2, 0]


def test_unicode_nonascii_dropped():
    # ASCII-run rule: accented letters split tokens (matches the DuckDB
    # oracle regexp_extract_all(lower(text),'[a-z0-9]+') exactly)
    assert toks("naïve café") == ["na", "ve", "caf"]


def test_null_text():
    assert tokenize_column(pa.array([None, "x"]))[0].as_py() == []


def test_explode_tf_and_positions():
    t = explode_to_postings(
        np.array([7, 9]), pa.array(["alpha beta alpha", "beta"]), with_positions=True
    ).sort_by([("term", "ascending"), ("doc_id", "ascending")])
    rows = list(zip(t["term"].to_pylist(), t["doc_id"].to_pylist(), t["tf"].to_pylist()))
    assert rows == [("alpha", 7, 2), ("beta", 7, 1), ("beta", 9, 1)]
    pos = t["positions"].to_pylist()
    assert pos == [[0, 2], [1], [0]]


def test_explode_skips_empty_docs():
    t = explode_to_postings(np.array([1, 2]), pa.array(["", "x"]))
    assert t["doc_id"].to_pylist() == [2]


def test_matches_python_re_reference():
    import re

    texts = ["Mixed CASE tok-42", "", "a  b\tc\nd", "ünïcödé", "x" * 500]
    got = tokenize_column(pa.array(texts)).to_pylist()
    want = [re.findall(r"[a-z0-9]+", s.lower()) for s in texts]
    assert got == want

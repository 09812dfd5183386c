"""Percolation (reverse search): the vectorized regex membership must
equal tokenizer-set membership exactly — including the token-boundary
case where the stored term is a substring of a larger token."""

import re

import pandas as pd
import pytest

from horus_ner_ray.stages.percolate import parse_stored_queries, percolate_dataset

_TOK = re.compile(r"[a-z0-9]+")


def _reference(docs: pd.DataFrame, queries) -> set[tuple[int, int]]:
    out = set()
    for _i, row in docs.iterrows():
        toks = set(_TOK.findall(str(row["text"]).lower()))
        for q in parse_stored_queries(queries):
            if not q["terms"]:
                continue
            ok = (all(t in toks for t in q["terms"]) if q["mode"] == "and"
                  else any(t in toks for t in q["terms"]))
            if ok and any(t in toks for t in q.get("exclude", ())):
                ok = False
            if ok:
                out.add((q["query_id"], int(row["doc_id"])))
    return out


@pytest.fixture(scope="module")
def doc_frame():
    rows = [
        (0, "The quick brown fox jumps"),
        (1, "partition art gallery"),          # 'art' is a token here
        (2, "parting is such sweet sorrow"),   # ...but only a substring here
        (3, "Fox! fox-trot FOX."),
        (4, "quick2 brown"),                   # term inside alnum run
        (5, ""),
        (6, "art"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


QUERIES = [
    {"query_id": 0, "text": "fox", "mode": "or"},
    {"query_id": 1, "text": "art", "mode": "or"},
    {"query_id": 2, "text": "quick brown", "mode": "and"},
    {"query_id": 3, "text": "quick zzzqabsent", "mode": "and"},
    {"query_id": 4, "text": "quick zzzqabsent", "mode": "or"},
    {"query_id": 5, "text": "!!!", "mode": "or"},   # zero tokens
    # boolean-NOT stored clause: fox docs NOT mentioning trot
    {"query_id": 6, "text": "fox", "mode": "or", "exclude": "trot"},
    # exclusion of an absent term == plain query
    {"query_id": 7, "text": "art", "mode": "or", "exclude": "zzqx"},
]


def test_percolate_matches_tokenizer_membership(doc_frame, ray_session):
    import ray.data as rd

    got = percolate_dataset(rd.from_pandas(doc_frame), QUERIES).to_pandas()
    got_set = {(int(q), int(d))
               for q, d in zip(got["query_id"], got["doc_id"])}
    assert got_set == _reference(doc_frame, QUERIES)
    # the boundary cases specifically:
    assert (1, 1) in got_set and (1, 6) in got_set   # 'art' as a token
    assert (1, 2) not in got_set                     # 'parting' != art
    assert (0, 3) in got_set                         # fox-trot separators
    assert (2, 4) not in got_set                     # 'quick2' != quick
    assert all(q != 5 for q, _ in got_set)           # zero-token matches none
    assert all(q != 3 for q, _ in got_set)           # AND with absent term


def test_parse_stored_queries_validates():
    with pytest.raises(ValueError, match="or\\|and"):
        parse_stored_queries([{"query_id": 0, "text": "x", "mode": "not"}])

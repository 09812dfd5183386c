"""Driver-contract conformance at sf0.001: every queries() entry runs and
SQL-expressible ones match their DuckDB oracle (full sweep at sf0.01 lives
in tools/conformance.py; the driver runs the real gate)."""

import os
from pathlib import Path

import duckdb
import pytest

# transcript-corpus oracles pin their synth corpus via GRAFT_ORACLE_SF
# (tools/conformance.py sets it from its sf_dir; the driver's default is
# 0.01) — this suite runs queries() at sf0.001, so the SQL must read the
# SAME corpus or whole-match-set aggregates (ts_field_stats) diverge
os.environ.setdefault("GRAFT_ORACLE_SF", "0.001")

import __ray_entry__ as E  # noqa: E402
from tools.conformance import TABLES, canon, to_pandas  # noqa: E402

SF = "/root/testdata/sf0.001"

# fast subset for pytest; the full sweep runs in tools/conformance.py
ORACLE_SUBSET = [
    "term_df",
    "collection_stats",
    "doc_lengths",
    "top_terms",
    "bm25_topk",
    "bm25_topk_and",
    "exact_dedup",
    "quality",
    "bpeish_counts",
    "ann_topk",
    # round-5 session-3 additions (sf-agnostic oracles)
    "bm25_after_delete",
    "bm25_after_compact",
    "bm25_near",
    "bm25_explain",
    "bm25_page2",
    "curation_pipeline",
    "decontaminate",
    # round-5 session-4 additions
    "suggest_terms",
    "bm25_snippet_text",
    "significant_terms",
    "bm25_after_merge",
    "bm25_boolean_msm",
    "match_counts",
    "bm25_sorted_by_time",
    "lm_topk",
    "percolate_matches",
    "regex_topk",
    "ts_field_stats",
    "synonym_topk",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = Path(SF) / f"{t}.parquet"
        if p.exists():
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def test_entry_smoke(ray_session):
    out = to_pandas(E.entry())
    assert len(out) >= 0
    assert list(out.columns) == ["query_id", "rank", "doc_id", "score_e6"]
    assert len(out) > 0  # corpus terms exist in the doc queries


def test_queries_and_oracles_align():
    qs, sqls = E.queries(), E.oracle_sql()
    assert set(sqls).issubset(set(qs))
    for name in ORACLE_SUBSET:
        assert name in sqls


@pytest.mark.parametrize("name", ORACLE_SUBSET)
def test_oracle_conformance(name, con, ray_session):
    mine = canon(to_pandas(E.queries()[name](SF)))
    oracle = canon(con.execute(E.oracle_sql()[name]).df())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    assert mine.equals(oracle), f"{name} values differ"


def test_rows_only_queries_run(ray_session):
    qs, sqls = E.queries(), E.oracle_sql()
    for name in set(qs) - set(sqls):
        out = to_pandas(qs[name](SF))
        assert out is not None and len(out) >= 0, name

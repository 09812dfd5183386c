"""Field-scoped search (role=/tool= filters): engine vs brute-force
rank-identity, AND/phrase paths, serving pass-through, docstore columns."""

import numpy as np
import pytest

from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def engines(built_index, small_corpus):
    idx, _res = built_index
    return QueryEngine(idx), BruteForceBM25.from_corpus_files(small_corpus)


def test_role_filter_rank_identical_to_bruteforce(engines):
    eng, bf = engines
    for role in ("user", "assistant", "tool"):
        for q in reference_queries(k=10):
            got = eng.search(q["text"], k=10, role=role)
            want = bf.search(q["text"], k=10, role=role)
            assert got == want, (role, q["text"])


def test_tool_filter_and_combined(engines):
    eng, bf = engines
    # tool turns exist in the synth corpus (role='tool' rows carry a tool)
    tools = {t for _, t in bf.attrs.values() if t}
    assert tools, "fixture should contain tool turns"
    tool = sorted(tools)[0]
    for q in reference_queries(k=10)[:5]:
        got = eng.search(q["text"], k=10, tool=tool)
        want = bf.search(q["text"], k=10, tool=tool)
        assert got == want
        got2 = eng.search(q["text"], k=10, role="tool", tool=tool)
        want2 = bf.search(q["text"], k=10, role="tool", tool=tool)
        assert got2 == want2


def test_role_filter_and_mode(engines):
    eng, bf = engines
    for q in reference_queries(k=10)[:6]:
        got = eng.search(q["text"], k=10, mode="and", role="assistant")
        want = bf.search(q["text"], k=10, mode="and", role="assistant")
        assert got == want


def test_role_filter_results_actually_filtered(engines, built_index):
    from horus_ner_ray.pipelines.query import fetch_docs

    eng, _bf = engines
    idx, _ = built_index
    hits = eng.search("the session data", k=20, role="user")
    assert hits
    rows = fetch_docs(idx, [d for d, _ in hits], columns=["doc_id", "role"])
    assert (rows["role"] == "user").all()


def test_filtered_topk_not_truncated_prefilter(engines):
    """The filter must apply BEFORE top-k selection: filtered top-10 can
    contain docs outside the unfiltered top-10."""
    eng, bf = engines
    found_difference = False
    for q in reference_queries(k=10):
        unfiltered = {d for d, _ in eng.search(q["text"], k=10)}
        filtered = [d for d, _ in eng.search(q["text"], k=10, role="user")]
        if any(d not in unfiltered for d in filtered):
            found_difference = True
            break
    assert found_difference, "fixture too small to exercise the pre-filter"


def test_filter_on_missing_column_raises(tmp_path, ray_session):
    """A provided-mode index over (doc_id, text) has no role column: the
    filter must fail loudly, not silently return everything."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index

    f = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(20, dtype=np.int64)),
        "text": pa.array([f"alpha beta w{i}" for i in range(20)]),
    }), f)
    idx = tmp_path / "idx"
    build_index([str(f)], idx,
                PipelineConfig(num_shards=2, doc_id_mode="provided"))
    eng = QueryEngine(str(idx))
    assert eng.search("alpha", k=3)  # unfiltered works
    with pytest.raises(ValueError, match="role"):
        eng.search("alpha", k=3, role="user")


def test_docstore_carries_tool_and_ts(built_index):
    import pyarrow.parquet as pq

    from horus_ner_ray.state.shards import IndexPaths

    idx, _ = built_index
    part = sorted(IndexPaths(idx).docstore.glob("part-*.parquet"))[0]
    names = pq.ParquetFile(part).schema_arrow.names
    assert "tool" in names and "ts" in names


def test_serving_role_param(built_index, ray_session):
    from horus_ner_ray.serve import QueryService

    idx, _ = built_index
    svc = QueryService(idx, n_actors=2)
    try:
        eng = QueryEngine(idx)
        for q in reference_queries(k=10)[:4]:
            got = svc.search(q["text"], k=10, role="assistant")
            want = eng.search(q["text"], k=10, role="assistant")
            assert [(h["doc_id"], h["score"]) for h in got] == [
                (int(d), float(s)) for d, s in want]
    finally:
        svc.close()


def test_phrase_role_filter(small_corpus, tmp_path_factory, ray_session):
    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import fetch_docs

    idx = tmp_path_factory.mktemp("posidx") / "idx"
    build_index(small_corpus, idx,
                PipelineConfig(num_shards=4, with_positions=True))
    eng = QueryEngine(str(idx))
    # edge conv 0 plants "The THE the tHe" -> phrase "the the" exists;
    # k large enough to hold EVERY match so the subset check is exact
    base = eng.search_phrase("the the", k=100_000)
    assert base, "fixture should contain the planted phrase"
    flt = eng.search_phrase("the the", k=100_000, role="user")
    assert set(d for d, _ in flt) <= set(d for d, _ in base)
    if flt:
        rows = fetch_docs(str(idx), [d for d, _ in flt],
                          columns=["doc_id", "role"])
        assert (rows["role"] == "user").all()


def test_ts_window_filter_rank_identical(engines):
    eng, bf = engines
    # synth ts = 2025-06-01 + conv_idx*3600s + turn*13s; 60 convs span 60h
    lo, hi = "2025-06-01T10:00:00", "2025-06-02T08:00:00"
    found = False
    for q in reference_queries(k=10):
        got = eng.search(q["text"], k=10, ts_min=lo, ts_max=hi)
        want = bf.search(q["text"], k=10, ts_min=lo, ts_max=hi)
        assert got == want
        found = found or bool(got)
    assert found, "window should contain matches"
    # combined role + window
    for q in reference_queries(k=10)[:4]:
        got = eng.search(q["text"], k=10, role="user", ts_min=lo, ts_max=hi)
        want = bf.search(q["text"], k=10, role="user", ts_min=lo, ts_max=hi)
        assert got == want


def test_role_weights_rank_identical(engines):
    eng, bf = engines
    w = {"user": 2.0, "assistant": 1.0, "tool": 0.5}
    reranked = False
    for q in reference_queries(k=10):
        got = eng.search(q["text"], k=10, role_weights=w)
        want = bf.search(q["text"], k=10, role_weights=w)
        assert got == want
        plain = eng.search(q["text"], k=10)
        if [d for d, _ in got] != [d for d, _ in plain]:
            reranked = True
    assert reranked, "weights should change at least one ranking"
    # weights compose with filters
    for q in reference_queries(k=10)[:4]:
        got = eng.search(q["text"], k=10, role_weights=w, tool=None,
                         ts_min="2025-06-01T05:00:00")
        want = bf.search(q["text"], k=10, role_weights=w,
                         ts_min="2025-06-01T05:00:00")
        assert got == want


def test_facet_counts_match_bruteforce(engines):
    eng, bf = engines
    from horus_ner_ray.synth import reference_queries

    for q in reference_queries(k=10):
        assert eng.facet_counts(q["text"], "role") == bf.facet_counts(q["text"], "role")
    # full-match-set semantics: facet total == number of matching docs
    q = reference_queries(k=10)[0]["text"]
    total = sum(eng.facet_counts(q, "role").values())
    terms = [t for t in q.lower().split() if t in bf.postings]
    docs = set()
    for t in terms:
        docs.update(d for d, _ in bf.postings[t])
    assert total == len(docs)


def test_facet_counts_missing_field_raises(engines):
    import pytest as _pytest

    eng, _bf = engines
    with _pytest.raises(ValueError, match="facet"):
        eng.facet_counts("the data", "nonexistent_field")


def test_date_histogram_matches_bruteforce(engines):
    """Time-bucketed facet over the full match set: engine == oracle at
    hourly and daily intervals; synth ts spans ~60h so both produce
    multiple buckets."""
    eng, bf = engines
    for q in ["the session data", "alpha", "sessionmark"]:
        for iv in (3_600_000_000, 86_400_000_000):
            got = eng.date_histogram(q, interval_us=iv)
            want = bf.date_histogram(q, interval_us=iv)
            assert got == want, (q, iv)
    assert len(eng.date_histogram("sessionmark", interval_us=3_600_000_000)) > 1
    assert eng.date_histogram("zzzqabsent") == {}
    with pytest.raises(ValueError, match="positive"):
        eng.date_histogram("the", interval_us=0)


def test_date_histogram_respects_tombstones(small_corpus, tmp_path_factory,
                                            ray_session):
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.delete import delete_docs
    from horus_ner_ray.config import PipelineConfig

    idx = tmp_path_factory.mktemp("histdel") / "idx"
    build_index(small_corpus, idx, PipelineConfig(num_shards=3))
    deleted = list(range(0, 60, 3))
    delete_docs(idx, deleted)
    bf = BruteForceBM25.from_corpus_files(small_corpus)
    bf.delete_docs(deleted)
    eng = QueryEngine(idx)
    assert (eng.date_histogram("the sessionmark")
            == bf.date_histogram("the sessionmark"))


def test_explain_sums_to_search_score_bitwise(engines):
    """The explain API's listed-order (ascending-term) contribution sum
    reproduces the doc's search() score with NO float tolerance."""
    eng, _bf = engines
    for q in ["the session data", "alpha sessionmark", "tok00042"]:
        hits = eng.search(q, 5)
        assert hits
        for doc, score in hits:
            rows = eng.explain(q, doc)
            assert rows == sorted(rows, key=lambda r: r["term"])
            acc = 0.0
            for r in rows:
                acc += r["contribution"]
            assert acc == score, (q, doc)
    assert eng.explain("zzzqabsent", 0) == []


def test_explain_tombstoned_doc_is_empty(small_corpus, tmp_path_factory,
                                         ray_session):
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.delete import delete_docs
    from horus_ner_ray.config import PipelineConfig

    idx = tmp_path_factory.mktemp("expldel") / "idx"
    build_index(small_corpus, idx, PipelineConfig(num_shards=3))
    eng0 = QueryEngine(idx)
    doc = eng0.search("the", 1)[0][0]
    assert eng0.explain("the", doc)
    delete_docs(idx, [doc])
    assert QueryEngine(idx).explain("the", doc) == []


def test_search_after_pagination_rank_identity(engines):
    """Cursor pagination: page chains are float-exact vs the oracle, and
    concatenating pages reproduces the single big top-k exactly (stable,
    stateless deep paging)."""
    eng, bf = engines
    for q in ["the session data", "alpha sessionmark", "the"]:
        full = eng.search(q, 30)
        pages, cursor = [], None
        for _ in range(3):
            p_e = eng.search_after(q, 10, cursor=cursor)
            p_b = bf.search_after(q, 10, cursor=cursor)
            assert p_e == p_b, (q, cursor)
            if not p_e:
                break
            pages.extend(p_e)
            cursor = p_e[-1]
        assert pages == full[:len(pages)], q
    # cursor past the end -> empty
    last = eng.search("the", 10**6)[-1]
    assert eng.search_after("the", 10, cursor=last) == []
    # AND mode pages too
    p1 = eng.search_after("alpha beta", 2, mode="and")
    assert p1, "fixture should contain conjunctive matches"
    p2 = eng.search_after("alpha beta", 2, cursor=p1[-1], mode="and")
    assert p1 + p2 == eng.search("alpha beta", 4, mode="and")


def test_search_after_respects_tombstones(small_corpus, tmp_path_factory,
                                          ray_session):
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.delete import delete_docs
    from horus_ner_ray.config import PipelineConfig

    idx = tmp_path_factory.mktemp("pagedel") / "idx"
    build_index(small_corpus, idx, PipelineConfig(num_shards=3))
    deleted = list(range(2, 60, 5))
    delete_docs(idx, deleted)
    bf = BruteForceBM25.from_corpus_files(small_corpus)
    bf.delete_docs(deleted)
    eng = QueryEngine(idx)
    p1 = eng.search("the sessionmark", 10)
    assert eng.search_after("the sessionmark", 10, cursor=p1[-1]) \
        == bf.search_after("the sessionmark", 10, cursor=p1[-1])


def test_sql_floor_division_matches_numpy_for_negative_epochs():
    """The date-histogram oracle's integer floor-division restatement:
    DuckDB's // truncates toward zero, so the SQL uses
    (x - nonneg_mod(x, iv)) // iv — must equal np.floor_divide for
    negative epochs too (code-review regression)."""
    import duckdb
    import numpy as np

    iv = 3_600_000_000
    xs = [-7, -1, 0, 1, 7, -iv, -iv - 1, -iv + 1, iv, iv + 1,
          -123456789012345, 1750000000000000]
    con = duckdb.connect()
    for x in xs:
        got = con.execute(
            f"SELECT (({x} - (({x} % {iv} + {iv}) % {iv})) // {iv})::BIGINT"
        ).fetchone()[0]
        assert got == int(np.floor_divide(x, iv)), x

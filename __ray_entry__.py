"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (inverted-index build + BM25 top-k)
on /root/testdata/sf0.001 documents.  ``queries()`` exposes one callable
per implemented operator family from SURVEY.md section 2; ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible one (same
column names; floats are published as ``*_e6`` integers via
CAST(FLOOR(x*1e6+0.5) AS BIGINT) on BOTH sides so value hashes compare
exactly).

Ray is initialised by the driver before this module is imported — nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import hashlib
import os
import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from horus_ner_ray.config import BM25_B, BM25_K1, PipelineConfig  # noqa: E402

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

_TOKRE = "[a-z0-9]+"  # keep in sync with horus_ner_ray.config.TOKEN_PATTERN

# fixed reference query sets over the documents vocabulary
DOC_QUERIES = [
    "batch join",
    "customer window slow",
    "scan",
    "data stream filter sort",
    "spark merge",
    "zzzqnotfound",
]
DOC_AND_QUERIES = ["batch join", "customer slow", "spark merge window", "scan zzzqnotfound"]
# trailing-wildcard queries: s* expands to 6 terms, xyzq* to none
PREFIX_QUERIES = ["s* filter", "qu* wind*", "gr* merge ta*", "xyzq*"]
# query-by-example source docs (documents.doc_id spans 0..499 at every sf)
MLT_DOC_IDS = [3, 57, 123, 321]
MLT_TERMS = 5
# typo'd queries: each token expands to its Levenshtein<=1 neighborhood
FUZZY_QUERIES = ["batck join", "scann", "streem filtr", "qzqzq"]
# infix substring patterns over the dictionary ('usto' -> customer, ...)
INFIX_QUERIES = ["usto", "art", "zzz"]
# stem-expansion queries: plurals stem to corpus singulars (queries ->
# query, tables -> table, ...); 'bus'/'class' exercise the us/ss guards
STEM_QUERIES = ["queries tables", "sorts merges windows",
                "customers streams", "bus class"]
# span-first queries scored with the first_n=5 position gate
FIRST_QUERIES = ["window merge", "customer query sort", "the big table",
                 "zzzqnotfound"]
FIRST_N = 5
# 'did you mean' queries: absent terms rewrite to their best suggestion
# (distance asc, df desc, term asc); qqqqqqzz has no dist<=2 neighborhood
CORRECTED_QUERIES = ["batcj joib", "custoner slww", "merge streajm",
                     "qqqqqqzz scan", "datx filtr sost"]
# (query, boolean-NOT clause): docs containing any excluded term drop
NOT_QUERIES = [
    ("batch join", "slow"),
    ("data stream filter", "sort merge"),
    ("scan", "zzzqnotfound"),   # absent exclusion == plain search
    ("window", "window"),       # self-exclusion == empty result
]
TOPK = 10
# (query, per-term boost map) — Lucene term^boost; weights are powers of
# two so idf*boost is IEEE-exact on both the numpy and the SQL side
BOOSTED_QUERIES = [
    ("batch join", {"batch": 4.0}),
    ("data stream filter sort", {"stream": 0.5, "sort": 8.0}),
    ("customer window slow", {"window": 0.25}),
    ("spark merge", {"zzzqnotfound": 2.0}),  # absent-term boost == no-op
]
# boosting query (positive, negative, negative_boost): negative matches
# DEMOTE (one multiply after accumulation) — nb powers of two keep the
# multiply IEEE-exact on both sides
BOOSTING_QUERIES = [
    ("batch join", "slow", 0.5),
    ("data stream filter sort", "merge", 0.25),
    ("customer window slow", "zzzqnotfound", 0.5),  # absent neg == plain
    ("scan", "scan", 0.5),                          # every match demoted
]
# dis_max subquery pairs (q1, q2, tie_breaker): per doc, the better
# subquery score + tie * the other (first-argmax tie rule; tb powers of
# two keep the combine IEEE-exact)
DISMAX_QUERIES = [
    ("batch join", "customer slow", 0.5),
    ("data stream", "filter sort", 0.25),
    ("zzzqnotfound", "spark merge", 0.5),  # one empty subquery
]
# match_phrase_prefix (text, max_expansions): last token is a prefix;
# fixed terms must be adjacent, followed by any of the first
# max_expansions dictionary terms with that prefix
PP_QUERIES_DRV = [
    ("batch jo", 50),
    ("data st", 50),
    ("customer sl", 2),     # tight expansion cap
    ("the zzzqxx", 50),     # prefix expands to nothing -> empty
]

_STOPLIST = (
    "the to a and of in is you that it for on with as are this be have from or at"
).split()


def _docs(sf_dir: str) -> str:
    return str(Path(sf_dir) / "documents.parquet")


def _read_docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(_docs(sf_dir), columns=["doc_id", "text"])


def _e6(x: np.ndarray | pd.Series) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)


def _doc_index_dir(sf_dir: str, positions: bool = False) -> str:
    """Build (once, cached) the inverted index over sf_dir's documents."""
    from horus_ner_ray.pipelines.build_index import build_index

    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION

    key = hashlib.sha256(str(Path(sf_dir).resolve()).encode()).hexdigest()[:12]
    tag = "p" if positions else ""
    idx = Path(os.environ.get("GRAFT_TMP", "/tmp")) / (
        f"horus_docidx{tag}_v{INDEX_FORMAT_VERSION}_{key}"
    )
    if not (idx / "stats.json").exists():
        cfg = PipelineConfig(num_shards=4, doc_id_mode="provided", with_positions=positions)
        build_index([_docs(sf_dir)], idx, cfg)
    return str(idx)


def _doc_index_dir_deleted(sf_dir: str, compacted: bool = False) -> str:
    """Build (once, cached) a SEPARATE documents index carrying the
    deterministic tombstone set ``doc_id % 7 == 3`` — optionally folded in
    by ``compact_index``.  Its own tree (not ``_doc_index_dir``): deletes
    and compaction mutate index state, and the undeleted index backs every
    other bm25 query."""
    import shutil

    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.delete import compact_index, delete_docs
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION

    key = hashlib.sha256(str(Path(sf_dir).resolve()).encode()).hexdigest()[:12]
    tag = "c" if compacted else "d"
    idx = Path(os.environ.get("GRAFT_TMP", "/tmp")) / (
        f"horus_docidx_{tag}el_v{INDEX_FORMAT_VERSION}_{key}"
    )
    marker = idx / "state.done"
    if not marker.exists():
        shutil.rmtree(idx, ignore_errors=True)  # never resume a half-mutated tree
        cfg = PipelineConfig(num_shards=4, doc_id_mode="provided")
        build_index([_docs(sf_dir)], idx, cfg)
        import pyarrow.parquet as pq

        ids = np.asarray(
            pq.read_table(_docs(sf_dir), columns=["doc_id"])["doc_id"],
            dtype=np.int64,
        )
        delete_docs(idx, ids[ids % 7 == 3])
        if compacted:
            compact_index(idx)
        marker.write_text("ok")
    return str(idx)


def _transcript_corpus(sf: str) -> tuple[list[str], str]:
    """Deterministic synthetic transcript corpus for scale factor ``sf``
    (pure function of (sf, seed); synthesized on first use — no Ray needed).
    Returns (part files, glob) — the SAME files both the Ray pipeline and
    the DuckDB oracle read."""
    from horus_ner_ray.synth import synth_transcripts, transcript_files

    n_convs = max(100, int(float(sf) * 50000))
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    corpus = synth_transcripts(tmp / f"horus_tr_{sf}", n_convs=n_convs, seed=42)
    files = transcript_files(corpus)
    return files, str(Path(corpus) / "part-*.parquet")


def _e6_rerank(df: pd.DataFrame, score_col: str, id_col: str,
               out_score: str) -> pd.DataFrame:
    """Padded candidate rows -> top-TOPK per query under the oracle's
    integer-rounded order (e6 desc, id asc).  THE one implementation of
    the boundary-tie rule: every scored driver query fetches a 3k+20
    padded candidate set and reranks through here, so a change to the tie
    handling lands everywhere at once."""
    cols = ["query_id", "rank", id_col, out_score]
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    out = []
    for _qid, g in df.groupby("query_id", sort=True):
        g = g.assign(**{out_score: _e6(g[score_col])})
        g = g.sort_values([out_score, id_col], ascending=[False, True],
                          kind="stable").head(TOPK)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g[cols])
    return pd.concat(out, ignore_index=True).astype(np.int64)


def _hits_frame(hits_per_query: list[list[tuple[int, float]]]) -> pd.DataFrame:
    rows = {"query_id": [], "doc_id": [], "score": []}
    for qid, hits in enumerate(hits_per_query):
        for doc, score in hits:
            rows["query_id"].append(qid)
            rows["doc_id"].append(doc)
            rows["score"].append(score)
    return pd.DataFrame(rows)


def _bm25_topk_frame(sf_dir: str, texts: list[str], mode: str) -> pd.DataFrame:
    """Engine top-k, padded fetch + shared e6 rerank (_e6_rerank)."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search(t, TOPK * 3 + 20, mode=mode) for t in texts]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: index-build + BM25 top-k over sf0.001 documents."""
    return _bm25_topk_frame("/root/testdata/sf0.001", DOC_QUERIES, "or")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_term_df(sf_dir: str):
    from horus_ner_ray.stages.termstats import term_df_dataset

    return term_df_dataset(_read_docs(sf_dir))


def _q_vocab_growth(sf_dir: str):
    """Vocabulary growth curve (Heaps'-law diagnostic,
    stages/termstats.vocab_growth) over the TRANSCRIPT corpus (the
    documents table's 31-term vocabulary saturates in 9 docs — no curve):
    distinct terms among turns with rank doc_id < checkpoint, every 200
    turns.  The input is the transcript index's own DOCSTORE (rank ids +
    text already materialized); per-term first-doc combiner partials, one
    vocab-sized groupby Min, tiny driver cumsum.  Exact integers; the SQL
    re-derives the rank rule over the same part files."""
    import ray.data as rd

    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION, IndexPaths
    from horus_ner_ray.stages.termstats import vocab_growth

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    store = sorted(str(p)
                   for p in IndexPaths(str(idx)).docstore.glob("part-*.parquet"))
    out = vocab_growth(rd.read_parquet(store, columns=["doc_id", "text"]),
                       every=200)
    return out.astype(np.int64)


def _sql_vocab_growth() -> str:
    """Heaps-curve oracle: rank-rule doc ids over the synth transcript
    files, per-term first doc, 200-turn checkpoint buckets densified
    with generate_series, cumulative sum."""
    _files, glob = _transcript_corpus(_oracle_sf())
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
docs AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, text FROM raw JOIN offs USING (conv_id)
),
tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM docs),
f AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY 1),
b AS (SELECT fd // 200 AS bucket, count(*)::BIGINT AS n_new
      FROM f GROUP BY 1),
dense AS (
  SELECT unnest(generate_series(0, (SELECT max(bucket) FROM b))) AS bucket
),
c AS (SELECT d.bucket, coalesce(b.n_new, 0) AS n
      FROM dense d LEFT JOIN b USING (bucket))
SELECT ((bucket + 1) * 200)::BIGINT AS checkpoint,
       (sum(n) OVER (ORDER BY bucket))::BIGINT AS vocab
FROM c ORDER BY bucket
"""


def _q_event_gap_quantiles(sf_dir: str):
    """Inter-arrival cadence (stages/windows.event_gaps_dataset + exact
    distributed quantiles): per-user consecutive-event gaps in int64
    microseconds, then the EXACT 25/50/75th percentiles over all gaps
    (quantile_disc — order statistics over integers, no float anywhere).
    The sessionization-threshold calibration every event pipeline runs."""
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_disc
    from horus_ner_ray.stages.windows import event_gaps_dataset

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["event_id", "user_id", "ts"])
    gaps = event_gaps_dataset(ev)
    out = quantile_disc(gaps, "gap_us", [0.25, 0.5, 0.75])
    return pd.DataFrame({
        "q_pct": np.array([25, 50, 75], dtype=np.int64),
        "gap_us": out["value"].to_numpy(np.float64).astype(np.int64),
    })


def _sql_event_gap_quantiles() -> str:
    return """
WITH g AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
gg AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL)
SELECT 25::BIGINT AS q_pct, quantile_disc(gap_us, 0.25)::BIGINT AS gap_us FROM gg
UNION ALL
SELECT 50::BIGINT, quantile_disc(gap_us, 0.5)::BIGINT FROM gg
UNION ALL
SELECT 75::BIGINT, quantile_disc(gap_us, 0.75)::BIGINT FROM gg
ORDER BY q_pct
"""


def _q_term_burstiness(sf_dir: str):
    """Term burstiness (Church & Gale: the variance-to-mean ratio of tf
    over the docs CONTAINING the term — bursty content words score >> 1,
    evenly-spread function words ~= 1): per term the exact integer
    sufficient statistics (df, cf, sum tf^2) from one combiner pass +
    vocab-bounded groupby, finished by the ONE float division
    vmr = (sumsq*df - cf^2) / (df*cf) — bitwise the SQL's arithmetic."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages.tokenize import tokenize_column
    from horus_ner_ray.util import worker_runtime_env

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokenize_column(batch["text"])
        flat = pc.list_flatten(toks)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        ids = np.asarray(batch["doc_id"], dtype=np.int64)[parents]
        t = pa.table({"term": flat, "doc_id": pa.array(ids, pa.int64())})
        g = t.group_by(["term", "doc_id"], use_threads=False).aggregate(
            [([], "count_all")])
        tf = np.asarray(g["count_all"], dtype=np.int64)
        p = pa.table({"term": g["term"],
                      "df": pa.array(np.ones(len(tf), np.int64), pa.int64()),
                      "cf": pa.array(tf, pa.int64()),
                      "sumsq": pa.array(tf * tf, pa.int64())})
        q = p.group_by("term", use_threads=False).aggregate(
            [("df", "sum"), ("cf", "sum"), ("sumsq", "sum")])
        return pa.table({"term": q["term"], "df": q["df_sum"],
                         "cf": q["cf_sum"], "sumsq": q["sumsq_sum"]})

    env = worker_runtime_env()
    kw = {"runtime_env": env} if env else {}
    cnt = (_read_docs(sf_dir)
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True, **kw)
           .groupby("term")
           .aggregate(Sum("df", alias_name="df"),
                      Sum("cf", alias_name="cf"),
                      Sum("sumsq", alias_name="sumsq"))
           .to_pandas())  # vocab-bounded
    df = cnt["df"].to_numpy(np.int64)
    cf = cnt["cf"].to_numpy(np.int64)
    sq = cnt["sumsq"].to_numpy(np.int64)
    vmr = (sq * df - cf * cf).astype(np.float64) / (df * cf).astype(
        np.float64)
    out = pd.DataFrame({"term": cnt["term"].astype(str), "df": df,
                        "cf": cf, "vmr_e6": _e6(vmr)})
    return out.sort_values("term").reset_index(drop=True)


def _sql_term_burstiness() -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
s AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf,
         sum(tf * tf)::BIGINT AS sumsq
  FROM tf GROUP BY 1
)
SELECT term, df, cf,
       CAST(FLOOR(CAST(sumsq * df - cf * cf AS DOUBLE)
                  / CAST(df * cf AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
         AS vmr_e6
FROM s ORDER BY term
"""


def _q_collection_stats(sf_dir: str):
    from horus_ner_ray.stages.docstore import collection_stats_from_dataset

    s = collection_stats_from_dataset(_read_docs(sf_dir))
    return pd.DataFrame(
        {
            "n_docs": pd.Series([s.n_docs], dtype=np.int64),
            "total_tokens": pd.Series([s.total_tokens], dtype=np.int64),
            "avgdl": pd.Series([s.avgdl], dtype=np.float64),
        }
    )


def _q_doc_lengths(sf_dir: str):
    from horus_ner_ray.stages.termstats import doc_lengths_dataset

    return doc_lengths_dataset(_read_docs(sf_dir))


def _q_top_terms(sf_dir: str):
    from horus_ner_ray.stages.termstats import term_cf_dataset

    df = term_cf_dataset(_read_docs(sf_dir)).to_pandas()
    df = df.sort_values(["cf", "term"], ascending=[False, True], kind="stable").head(100)
    return df.reset_index(drop=True)


def _q_bm25_topk(sf_dir: str):
    return _bm25_topk_frame(sf_dir, DOC_QUERIES, "or")


def _q_bm25_topk_and(sf_dir: str):
    return _bm25_topk_frame(sf_dir, DOC_AND_QUERIES, "and")


def _q_bm25_topk_prefix(sf_dir: str):
    """Trailing-wildcard search: ``s*`` expands over the sorted dictionary
    (one binary-search range), the union scores as a plain OR query.  The
    SQL oracle performs the same expansion with LIKE over its df table —
    the expansion itself is checked, not inlined."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_prefix(t, TOPK * 3 + 20) for t in PREFIX_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_stemmed(sf_dir: str):
    """Stem-expansion search (QueryEngine.search_stemmed): each query
    term's S-stem selects every dictionary term sharing that stem (the
    vocab stem table is engine state, one vectorized pass); the union
    scores as plain OR.  ORACLE: the same three-rule CASE expression
    stems BOTH the dfv dictionary and the raw query-term VALUES in SQL,
    so the expansion rule itself is checked."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_stemmed(t, TOPK * 3 + 20) for t in STEM_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_span_first(sf_dir: str):
    """Span-first search (QueryEngine.search_span_first, Lucene
    SpanFirstQuery as a filter): only docs where some query term occurs
    within the first FIRST_N token positions survive (first occurrence
    read straight from the positional index); survivors score as plain
    OR, stats global.  ORACLE: EXISTS over the list-sliced first-N token
    stream."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir, positions=True))
    hits = [eng.search_span_first(t, TOPK * 3 + 20, first_n=FIRST_N)
            for t in FIRST_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_topk_not(sf_dir: str):
    """Boolean-NOT search: docs containing any excluded term are masked
    before top-k (one postings decode per excluded term); survivor scores
    are untouched, so ranks stay bitwise oracle-identical."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search(t, TOPK * 3 + 20, exclude=ex) for t, ex in NOT_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_boosted(sf_dir: str):
    """Per-term query boosts (Lucene ``term^boost``): each boosted term's
    idf is multiplied ONCE before accumulation, scaling its contribution
    while the ascending-term accumulation order (and bitwise brute-force
    parity, tests/test_boosts.py) is untouched.  The SQL oracle carries
    the boost as a q-relation column and multiplies it into the idf at
    the same arithmetic point; power-of-two weights make the multiply
    IEEE-exact on both sides."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search(t, TOPK * 3 + 20, boosts=b) for t, b in BOOSTED_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_boosting(sf_dir: str):
    """Boosting query (Lucene BoostingQuery / ES ``boosting``,
    QueryEngine.search_boosting): positive-match docs rank by BM25, docs
    also containing a negative term have the FINAL score multiplied by
    negative_boost — demotion, not exclusion.  Exhaustive per shard
    (demotion breaks the pruning bounds), brute-parity-tested in
    tests/test_dismax_boosting.py.  SQL: same CASE-EXISTS multiply at
    the same arithmetic point."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_boosting(p, n, TOPK * 3 + 20, negative_boost=nb)
            for p, n, nb in BOOSTING_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_dismax(sf_dir: str):
    """dis_max (Lucene DisjunctionMaxQuery, QueryEngine.search_dismax):
    per doc the BEST subquery score + tie_breaker * the other subquery's
    score; the max slot is the FIRST index achieving it (np.argmax ==
    SQL's CASE a >= b).  SQL: two scored CTEs FULL OUTER JOINed with
    COALESCE 0."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_dismax([a, b], TOPK * 3 + 20, tie_breaker=tb)
            for a, b, tb in DISMAX_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_phrase_prefix(sf_dir: str):
    """match_phrase_prefix (ES, QueryEngine.search_phrase_prefix): the
    last token expands to the first max_expansions dictionary terms with
    that prefix (term order); fixed terms must appear adjacently followed
    by any expansion; scored as BM25 over the distinct FIXED terms only.
    SQL: position-chain join + an expansion join over the LIMITed
    LIKE-expansion of dfv — the expansion rule itself is checked in
    SQL."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir, positions=True))
    hits = [eng.search_phrase_prefix(t, TOPK * 3 + 20, max_expansions=mx)
            for t, mx in PP_QUERIES_DRV]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


# ordered sloppy-phrase driver queries: (phrase, slop) — distinct terms,
# 2 and 3 labels so the SQL ordered-min-span joins stay tractable
SLOP_QUERIES_DRV = [
    ("batch join", 2),
    ("join batch", 3),
    ("data filter sort", 4),
    ("customer slow", 1),
    ("scan zzzqnotfound", 5),   # absent term -> empty result
]


def _q_bm25_phrase_slop(sf_dir: str):
    """Ordered sloppy phrase (Lucene phrase slop): one occurrence per
    term IN PHRASE ORDER with minimal stretch last-first-(n-1) <= slop;
    matches score as conjunctive BM25.  The engine evaluates it as a
    vectorized last-valid-predecessor chain sweep over the positional
    index (tests/test_slop_phrase.py pins it to an explicit-max DP and a
    cubic enumerator); the SQL oracle restates the predicate as an
    ordered position self-join with HAVING min(stretch) <= slop."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir, positions=True))
    hits = [eng.search_phrase(t, TOPK * 3 + 20, slop=s)
            for t, s in SLOP_QUERIES_DRV]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _tr_index_dir(sf_dir: str) -> str:
    """Build (once, cached) the transcript-corpus index — shared with
    _q_transcripts_bm25 and the field-scoped bm25 queries."""
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    idx = Path(os.environ.get("GRAFT_TMP", "/tmp")) / (
        f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}")
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    return str(idx)


def _exhaustive_e6_matches(idx: str, texts: list[str],
                           attr: str) -> pd.DataFrame:
    """FULL match set per query as (query_id, doc_id, score_e6, <attr>)
    — the grouping-query head.  Scores come from the engine's exhaustive
    ascending-term accumulation (search with k = N); the group reductions
    happen downstream in the INTEGER e6 domain on both the Ray and the
    SQL side, so per-group argmax ties resolve identically (the library's
    float-domain search_collapse/search_grouped are brute-force-parity
    tested in tests/test_collapse.py instead)."""
    import pyarrow.dataset as pads

    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import IndexPaths

    eng = QueryEngine(idx)
    rows = {"query_id": [], "doc_id": [], "score": []}
    for qid, t in enumerate(texts):
        for d, s in eng.search(t, k=max(eng.n_docs, 1)):
            rows["query_id"].append(qid)
            rows["doc_id"].append(d)
            rows["score"].append(s)
    df = pd.DataFrame(rows)
    df["score_e6"] = _e6(df["score"]) if len(df) else pd.Series([], dtype=np.int64)
    parts = sorted(str(p) for p in
                   IndexPaths(idx).docstore.glob("part-*.parquet"))
    amap = pads.dataset(parts).to_table(
        columns=["doc_id", attr]).to_pandas()
    out = df.merge(amap, on="doc_id", how="left")
    return out[["query_id", "doc_id", "score_e6", attr]]


def _q_bm25_collapse(sf_dir: str):
    """Field collapsing (Lucene/ES collapse): one best doc per
    conversation, conversations ranked by their representative.  Reduction
    runs in the exact e6 integer domain ((score_e6 desc, doc_id asc) for
    both the in-conv argmax and the conv ranking); SQL restates it with
    two row_number windows over the same rank-rule doc ids."""
    texts = [q["text"] for q in _sq().reference_queries()]
    m = _exhaustive_e6_matches(_tr_index_dir(sf_dir), texts, "conv_id")
    m = m.sort_values(["query_id", "conv_id", "score_e6", "doc_id"],
                      ascending=[True, True, False, True], kind="stable")
    best = m.groupby(["query_id", "conv_id"], sort=True).head(1)
    out = []
    for qid, g in best.groupby("query_id", sort=True):
        g = g.sort_values(["score_e6", "doc_id"],
                          ascending=[False, True], kind="stable").head(TOPK)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g[["query_id", "rank", "conv_id", "doc_id", "score_e6"]])
    res = pd.concat(out, ignore_index=True)
    for c in ("query_id", "rank", "doc_id", "score_e6"):
        res[c] = res[c].astype(np.int64)
    return res


def _q_bm25_top_per_role(sf_dir: str):
    """Grouped top hits (terms aggregation + top_hits): per role, that
    group's top-3 docs by (score_e6 desc, doc_id asc) — the e6-domain
    restatement of QueryEngine.search_grouped."""
    texts = [q["text"] for q in _sq().reference_queries()]
    m = _exhaustive_e6_matches(_tr_index_dir(sf_dir), texts, "role")
    m = m.sort_values(["query_id", "role", "score_e6", "doc_id"],
                      ascending=[True, True, False, True], kind="stable")
    g = m.groupby(["query_id", "role"], sort=True)
    res = m.loc[g.cumcount() < 3].copy()
    res["rank"] = g.cumcount()[g.cumcount() < 3] + 1
    res = res[["query_id", "role", "rank", "doc_id", "score_e6"]].reset_index(drop=True)
    for c in ("query_id", "rank", "doc_id", "score_e6"):
        res[c] = res[c].astype(np.int64)
    return res


def _sq():
    from horus_ner_ray import synth

    return synth


def _q_bm25_snippets(sf_dir: str):
    """Top-k + snippet anchors: each ranked doc carries the smallest token
    position of any query term, decoded from the POSITIONAL index (the
    phrase machinery's coordinate space) — no text access.  Oracle: the
    SQL re-derives anchors with list_position over the token array."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir, positions=True))
    hits = [eng.search(t, TOPK * 3 + 20) for t in DOC_QUERIES]
    out = _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")
    anchors = np.zeros(len(out), dtype=np.int64)
    for qid, text in enumerate(DOC_QUERIES):
        m = (out["query_id"] == qid).to_numpy()
        if not m.any():
            continue
        amap = eng.match_anchors(text, out.loc[m, "doc_id"].tolist())
        anchors[m] = [amap[int(d)] for d in out.loc[m, "doc_id"]]
    out["anchor_pos"] = anchors
    return out


# misspelled dictionary probes for the spell-suggestion query — "dat"/"joi"
# have multi-term neighborhoods (distance-2 ties resolved by df desc),
# "zzzz" is empty-result coverage
SUGGEST_WORDS = ["custmer", "dat", "joi", "sprk", "batc", "zzzz"]
SUGGEST_K = 5
SUGGEST_DIST = 2
SNIPPET_WINDOW = 3
SIG_K = 10
SIG_MIN_FG = 2


def _q_suggest_terms(sf_dir: str):
    """Spell suggestion ('did you mean'): per misspelled word, the top
    dictionary terms within Levenshtein 2, ranked (distance asc, df desc,
    term asc) — Lucene DirectSpellChecker's contract, all-integer keys.
    Oracle: DuckDB's native levenshtein() over the derived df table."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    rows = {"query_id": [], "rank": [], "term": [], "dist": [], "df": []}
    for qid, w in enumerate(SUGGEST_WORDS):
        for r, (t, d, df) in enumerate(
                eng.suggest(w, SUGGEST_K, SUGGEST_DIST), 1):
            rows["query_id"].append(qid)
            rows["rank"].append(r)
            rows["term"].append(t)
            rows["dist"].append(d)
            rows["df"].append(df)
    out = pd.DataFrame(rows)
    return out.astype({c: np.int64 for c in
                       ("query_id", "rank", "dist", "df")})


def _sql_suggest_terms() -> str:
    qw = ", ".join(f"({i}, '{w}')" for i, w in enumerate(SUGGEST_WORDS))
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
dfv AS (SELECT term, count(DISTINCT doc_id)::BIGINT df FROM tok GROUP BY 1),
qw(query_id, w) AS (VALUES {qw}),
cand AS (
  SELECT qw.query_id, dfv.term,
         levenshtein(dfv.term, qw.w)::BIGINT AS dist, dfv.df
  FROM qw CROSS JOIN dfv
  WHERE levenshtein(dfv.term, qw.w) <= {SUGGEST_DIST} AND dfv.term <> qw.w
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY dist, df DESC, term) rk
  FROM cand
)
SELECT query_id, rk::BIGINT AS rank, term, dist, df
FROM ranked WHERE rk <= {SUGGEST_K}
"""


def _q_bm25_snippet_text(sf_dir: str):
    """Top-k with the actual snippet STRING: the token window around each
    hit's anchor (smallest query-term position from the positional index),
    sliced from the unfiltered [a-z0-9]+ stream by the shared
    ``snippet_text`` rule.  Oracle: the SQL re-derives the anchor with
    list_position and slices the same token array (1-based inclusive
    list slicing)."""
    from horus_ner_ray.pipelines.query import (
        QueryEngine,
        fetch_docs,
        snippet_text,
    )

    eng = QueryEngine(_doc_index_dir(sf_dir, positions=True))
    hits = [eng.search(t, TOPK * 3 + 20) for t in DOC_QUERIES]
    out = _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")
    texts = fetch_docs(eng.paths.root, out["doc_id"].unique().tolist(),
                       columns=["doc_id", "text"])
    tmap = {int(d): str(t) for d, t in zip(texts["doc_id"], texts["text"])}
    snips = [""] * len(out)
    for qid, text in enumerate(DOC_QUERIES):
        m = (out["query_id"] == qid).to_numpy()
        if not m.any():
            continue
        amap = eng.match_anchors(text, out.loc[m, "doc_id"].tolist())
        for i in np.flatnonzero(m):
            d = int(out["doc_id"].iloc[i])
            snips[i] = snippet_text(tmap[d], amap[d], SNIPPET_WINDOW)
    out["snippet"] = snips
    return out


def _sql_bm25_snippet_text() -> str:
    w = SNIPPET_WINDOW
    return f"""
WITH base AS ({_sql_bm25(DOC_QUERIES, conjunctive=False)}),
toka AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
q2(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
anch AS (
  SELECT q2.query_id, t.doc_id,
         (min(list_position(t.arr, q2.term)) - 1)::BIGINT AS a
  FROM q2 JOIN toka t ON list_contains(t.arr, q2.term)
  GROUP BY 1, 2
)
SELECT b.query_id, b.rank, b.doc_id, b.score_e6,
       array_to_string(
         t.arr[greatest(1, a.a - {w} + 1) : a.a + {w} + 1], ' ') AS snippet
FROM base b
JOIN anch a ON a.query_id = b.query_id AND a.doc_id = b.doc_id
JOIN toka t ON t.doc_id = b.doc_id
"""


# span-not driver queries: (query, not-clause, dist) — a doc matches iff
# some query-term occurrence sits > dist positions from EVERY not-term
# occurrence; survivors score as plain OR
SPAN_NOT_QUERIES = [
    ("scan", "slow", 2),
    ("batch join", "data", 1),
    ("window", "zzzqnotfound", 2),   # absent B == plain OR
    ("merge", "merge", 0),           # self-exclusion at dist 0 == empty
]


def _q_bm25_span_not(sf_dir: str):
    """Span-not search (QueryEngine.search_span_not, Lucene SpanNotQuery
    with slop): positional complement of NEAR — 'A away from B'.  The
    engine probes each A-occurrence's two B-neighbors in the composite
    (cand, pos) key space; SQL restates the predicate as NOT EXISTS over
    the position table."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir, positions=True))
    hits = [eng.search_span_not(a, b, TOPK * 3 + 20, dist=d)
            for a, b, d in SPAN_NOT_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_bm25_span_not() -> str:
    import re

    q_rows: list[str] = []
    matched: list[str] = []
    for qid, (a, b, dist) in enumerate(SPAN_NOT_QUERIES):
        aterms = sorted(set(re.findall(_TOKRE, a.lower())))
        bterms = sorted(set(re.findall(_TOKRE, b.lower())))
        for t in aterms:
            q_rows.append(f"({qid}, '{t}')")
        a_in = ", ".join(f"'{t}'" for t in aterms)
        b_in = ", ".join(f"'{t}'" for t in bterms) or "''"
        matched.append(
            f"SELECT DISTINCT {qid} AS query_id, p.doc_id FROM positions p "
            f"WHERE p.term IN ({a_in}) AND NOT EXISTS ("
            f"SELECT 1 FROM positions b WHERE b.doc_id = p.doc_id "
            f"AND b.term IN ({b_in}) AND abs(b.pos - p.pos) <= {dist})")
    matched_sql = "\n  UNION ALL ".join(matched)
    return f"""
WITH tok AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
positions AS (
  SELECT doc_id, unnest(arr) AS term,
         (generate_subscripts(arr, 1) - 1)::BIGINT AS pos
  FROM tok
),
flat AS (SELECT doc_id, unnest(arr) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM flat GROUP BY 1, 2),
dl AS (SELECT doc_id, len(arr)::BIGINT dl FROM tok),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {", ".join(q_rows)}),
matched AS (
  {matched_sql}
),
scored AS (
  SELECT m.query_id, m.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM matched m
  JOIN q ON q.query_id = m.query_id
  JOIN tf ON tf.doc_id = m.doc_id AND tf.term = q.term
  JOIN dfv ON dfv.term = q.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM scored
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


_FRAG_WINDOW = 3
_FRAG_N = 3


def _q_bm25_fragments(sf_dir: str):
    """Multi-fragment highlighter (QueryEngine.search_fragments / the ES
    highlighter's number_of_fragments): up to {_FRAG_N} NON-OVERLAPPING
    token windows per hit — anchors are ALL query-term positions from the
    positional index, selected by the shared greedy rule
    (select_fragment_anchors: a_1 = min pos, a_{{i+1}} = min pos >
    a_i + 2*window).  Fragments publish '||'-joined.  Oracle: the SQL
    unrolls the greedy chain (a1/a2/a3 CTEs) and slices the same token
    array."""
    from horus_ner_ray.pipelines.query import (
        QueryEngine,
        fetch_docs,
        select_fragment_anchors,
        snippet_text,
    )

    eng = QueryEngine(_doc_index_dir(sf_dir, positions=True))
    hits = [eng.search(t, TOPK * 3 + 20) for t in DOC_QUERIES]
    out = _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")
    texts = fetch_docs(eng.paths.root, out["doc_id"].unique().tolist(),
                       columns=["doc_id", "text"])
    tmap = {int(d): str(t) for d, t in zip(texts["doc_id"], texts["text"])}
    frags = [""] * len(out)
    for qid, text in enumerate(DOC_QUERIES):
        m = (out["query_id"] == qid).to_numpy()
        if not m.any():
            continue
        pmap = eng.match_positions(text, out.loc[m, "doc_id"].tolist())
        for i in np.flatnonzero(m):
            d = int(out["doc_id"].iloc[i])
            anchors = select_fragment_anchors(pmap.get(d, ()),
                                              _FRAG_WINDOW, _FRAG_N)
            frags[i] = "||".join(snippet_text(tmap[d], a, _FRAG_WINDOW)
                                 for a in anchors)
    out["fragments"] = frags
    return out


def _sql_bm25_fragments() -> str:
    w, gap = _FRAG_WINDOW, 2 * _FRAG_WINDOW
    return f"""
WITH base AS ({_sql_bm25(DOC_QUERIES, conjunctive=False)}),
toka AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
q2(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
pos AS (
  SELECT q2.query_id, t.doc_id,
         (generate_subscripts(t.arr, 1) - 1)::BIGINT AS p,
         unnest(t.arr) AS tk
  FROM q2 JOIN toka t ON list_contains(t.arr, q2.term)
),
anch AS (
  SELECT DISTINCT pos.query_id, pos.doc_id, pos.p
  FROM pos JOIN q2 ON q2.query_id = pos.query_id AND q2.term = pos.tk
),
a1 AS (SELECT query_id, doc_id, min(p) AS p FROM anch GROUP BY 1, 2),
a2 AS (SELECT an.query_id, an.doc_id, min(an.p) AS p
       FROM anch an JOIN a1 ON a1.query_id = an.query_id
            AND a1.doc_id = an.doc_id AND an.p > a1.p + {gap}
       GROUP BY 1, 2),
a3 AS (SELECT an.query_id, an.doc_id, min(an.p) AS p
       FROM anch an JOIN a2 ON a2.query_id = an.query_id
            AND a2.doc_id = an.doc_id AND an.p > a2.p + {gap}
       GROUP BY 1, 2),
sel AS (
  SELECT query_id, doc_id, p, 1 AS fi FROM a1
  UNION ALL SELECT query_id, doc_id, p, 2 FROM a2
  UNION ALL SELECT query_id, doc_id, p, 3 FROM a3
),
fr AS (
  SELECT s.query_id, s.doc_id,
         string_agg(array_to_string(
           t.arr[greatest(1, s.p - {w} + 1) : s.p + {w} + 1], ' '),
           '||' ORDER BY s.fi) AS fragments
  FROM sel s JOIN toka t ON t.doc_id = s.doc_id
  GROUP BY 1, 2
)
SELECT b.query_id, b.rank, b.doc_id, b.score_e6, fr.fragments
FROM base b
JOIN fr ON fr.query_id = b.query_id AND fr.doc_id = b.doc_id
"""


def _q_significant_terms(sf_dir: str):
    """Significant-terms aggregation (the Elasticsearch sampler shape):
    foreground = each query's e6-reranked top-{TOPK} docs; per term,
    fg (distinct foreground docs containing it) vs the global df, ranked
    by exact-integer lift_e6 = floor((fg/n_fg)/(df/N)*1e6 + 0.5) with
    (fg desc, term asc) tie-breaks.  Background stats come from the
    prebuilt df table; the foreground is a k-sized docstore point-read."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search(t, TOPK * 3 + 20) for t in DOC_QUERIES]
    top = _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")
    rows = {"query_id": [], "rank": [], "term": [], "fg": [], "df": [],
            "lift_e6": []}
    for qid in sorted(top["query_id"].unique()):
        ids = top.loc[top["query_id"] == qid, "doc_id"].tolist()
        for r, (t, f, df, lift) in enumerate(
                eng.significant_terms(ids, k=SIG_K, min_fg=SIG_MIN_FG), 1):
            rows["query_id"].append(int(qid))
            rows["rank"].append(r)
            rows["term"].append(t)
            rows["fg"].append(f)
            rows["df"].append(df)
            rows["lift_e6"].append(lift)
    out = pd.DataFrame(rows)
    return out.astype({c: np.int64 for c in
                       ("query_id", "rank", "fg", "df", "lift_e6")})


def _sql_significant_terms() -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
rankedq AS (
  SELECT query_id, doc_id, row_number() OVER (
    PARTITION BY query_id
    ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id) rk
  FROM scored
),
fgset AS (SELECT query_id, doc_id FROM rankedq WHERE rk <= {TOPK}),
nfg AS (SELECT query_id, count(*)::BIGINT n_fg FROM fgset GROUP BY 1),
fgt AS (
  SELECT f.query_id, t.term, count(DISTINCT t.doc_id)::BIGINT fg
  FROM fgset f JOIN tok t USING (doc_id)
  GROUP BY 1, 2
),
cand AS (
  SELECT fgt.query_id, fgt.term, fgt.fg, dfv.df,
         (2 * fgt.fg * (SELECT n_docs FROM stats) * 1000000
          + dfv.df * n.n_fg) // (2 * dfv.df * n.n_fg) AS lift_e6
  FROM fgt
  JOIN dfv USING (term)
  JOIN nfg n ON n.query_id = fgt.query_id
  WHERE fgt.fg >= {SIG_MIN_FG}
),
rnk AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY lift_e6 DESC, fg DESC, term) rk
  FROM cand
)
SELECT query_id, rk::BIGINT AS rank, term, fg, df, lift_e6
FROM rnk WHERE rk <= {SIG_K}
"""


def _merge_tree(sf_dir: str) -> tuple[str, str, str]:
    """Build (once, cached) the even/odd half-corpus index pair and their
    merged union — shared by ``bm25_after_merge`` (offline merge) and
    ``bm25_federated`` (query-time federation over the SAME halves).
    Returns (idx_a, idx_b, merged)."""
    import pyarrow.parquet as pq

    from horus_ner_ray.pipelines.merge import merge_indexes
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION

    key = hashlib.sha256(str(Path(sf_dir).resolve()).encode()).hexdigest()[:12]
    base = Path(os.environ.get("GRAFT_TMP", "/tmp")) / (
        f"horus_docidx_merged_v{INDEX_FORMAT_VERSION}_{key}")
    merged = base / "merged"
    idx_a, idx_b = base / "a", base / "b"
    marker = base / "state.done"
    if not marker.exists():
        import shutil

        from horus_ner_ray.pipelines.build_index import build_index

        shutil.rmtree(base, ignore_errors=True)
        base.mkdir(parents=True)
        t = pq.read_table(_docs(sf_dir), columns=["doc_id", "text"])
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        halves = []
        for tag, keep in (("even", ids % 2 == 0), ("odd", ids % 2 == 1)):
            f = base / f"docs_{tag}.parquet"
            import pyarrow as _pa

            pq.write_table(t.filter(_pa.array(keep)), f)
            halves.append(str(f))
        cfg = PipelineConfig(num_shards=4, doc_id_mode="provided")
        build_index([halves[0]], idx_a, cfg)
        build_index([halves[1]], idx_b, cfg)
        merge_indexes([idx_a, idx_b], merged)
        marker.write_text("ok")
    return str(idx_a), str(idx_b), str(merged)


def _q_bm25_after_merge(sf_dir: str):
    """Index MERGE (the Lucene addIndexes maintenance op): the documents
    table splits into even/odd doc_id halves, each half builds its OWN
    index, and merge_indexes combines them WITHOUT re-tokenizing —
    fragment runs re-route under the union id space (provided mode) and
    phase B re-merges.  The merged index answers DOC_QUERIES; the oracle
    is the ordinary BM25 SQL over the FULL documents table, so the merge's
    stats/postings composition is what's actually checked.  (Byte-identity
    of the merged tree vs a fresh union build is pinned in
    tests/test_merge_indexes.py.)"""
    from horus_ner_ray.pipelines.query import QueryEngine

    _a, _b, merged = _merge_tree(sf_dir)
    eng = QueryEngine(merged)
    hits = [eng.search(q, TOPK * 3 + 20) for q in DOC_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_federated(sf_dir: str):
    """Query-time FEDERATION over the same half-corpus index pair
    (pipelines/federate.py — Lucene MultiReader / ES
    dfs_query_then_fetch): each member's in-memory statistics rewrite to
    the federation-combined N/avgdl/df/cf, every member scores its own
    shards, and the exact per-member top-k merge under (score desc,
    doc_id asc).  Bitwise identical to searching the merged index
    (tests/test_federate.py), so the oracle is the same full-corpus BM25
    SQL as ``bm25_after_merge`` — what's checked is that two independent
    indexes rank as one without any offline merge."""
    from horus_ner_ray.pipelines.federate import FederatedEngine

    idx_a, idx_b, _merged = _merge_tree(sf_dir)
    fed = FederatedEngine([idx_a, idx_b])
    hits = [fed.search(q, TOPK * 3 + 20) for q in DOC_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


BOOLEAN_QUERIES = [  # (must, should, must_not)
    ("batch join", "data stream", "scan"),
    ("customer", "window slow", ""),
    ("data", "filter sort merge", "customer"),
    ("scan batch", "", "zzzqnotfound"),
]


def _q_bm25_boolean(sf_dir: str):
    """Lucene-style boolean query (must/should/must_not in ONE scored
    pass): candidacy = every must term present; score = BM25 over the
    distinct (must + should) terms present in the doc; must_not docs
    dropped before top-k.  The SQL oracle counts must hits per doc,
    filters on the full must count, and bans must_not docs with NOT
    EXISTS."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_boolean(m, s, n, TOPK * 3 + 20)
            for m, s, n in BOOLEAN_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_bm25_boolean() -> str:
    import re

    q_rows: list[str] = []
    ex_rows: list[str] = []
    nm_rows: list[str] = []
    for qid, (must, should, must_not) in enumerate(BOOLEAN_QUERIES):
        mt = sorted(set(re.findall(_TOKRE, must.lower())))
        stt = sorted(set(re.findall(_TOKRE, should.lower())) - set(mt))
        # empty must = empty result (engine semantics): a never-tokenizing
        # sentinel must row keeps nm > 0 so nothing passes vacuously
        mt_sql = mt or ["###none###"]
        for t in mt_sql:
            q_rows.append(f"({qid}, '{t}', TRUE)")
        for t in stt:
            q_rows.append(f"({qid}, '{t}', FALSE)")
        nm_rows.append(f"({qid}, {len(mt_sql)})")
        nts = sorted(set(re.findall(_TOKRE, must_not.lower())))
        for t in (nts or ["###none###"]):  # never tokenizes -> never joins
            ex_rows.append(f"({qid}, '{t}')")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term, is_must) AS (VALUES {", ".join(q_rows)}),
nmq(query_id, nm) AS (VALUES {", ".join(nm_rows)}),
qex(query_id, term) AS (VALUES {", ".join(ex_rows)}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score,
         sum(CASE WHEN q.is_must THEN 1 ELSE 0 END) nmust
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
filt AS (
  SELECT scored.query_id, scored.doc_id, scored.score
  FROM scored JOIN nmq USING (query_id)
  WHERE scored.nmust = nmq.nm
    AND NOT EXISTS (SELECT 1 FROM qex e JOIN tf x ON x.term = e.term
                    AND x.doc_id = scored.doc_id
                    WHERE e.query_id = scored.query_id)
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM filt
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


# query-time synonym map over the documents vocabulary ("chunk" is
# absent from the dictionary — coverage for a mapping to nothing)
SYNONYM_MAP = {
    "join": ["merge"],
    "batch": ["data chunk"],
    "slow": ["fast"],
    "scan": ["sort row"],
}


def _q_synonym_topk(sf_dir: str):
    """Query-time synonym expansion (the index untouched): each query
    term unions with its mapped synonyms, the expanded set scores as OR.
    The SQL performs the SAME expansion — the map inlines as a VALUES
    relation joined to the base query terms — so the expansion itself is
    what's checked."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_synonyms(t, SYNONYM_MAP, TOPK * 3 + 20)
            for t in DOC_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_synonym_topk() -> str:
    import re

    base = _sql_values_queries(DOC_QUERIES)
    syn_rows = []
    for t, vals in sorted(SYNONYM_MAP.items()):
        for v in sorted(set(re.findall(_TOKRE, " ".join(vals).lower()))):
            syn_rows.append(f"('{t}', '{v}')")
    q_sql = f"""
SELECT * FROM (VALUES {base}) qb(query_id, term)
UNION
SELECT qb.query_id, s.syn_term AS term
FROM (VALUES {base}) qb(query_id, term)
JOIN (VALUES {", ".join(syn_rows)}) s(term, syn_term) USING (term)
"""
    return _sql_bm25([], conjunctive=False, q_sql=q_sql)


# regexp term queries (anchored fullmatch; RE2 subset so Python re and
# DuckDB regexp_full_match agree); last one matches nothing
REGEX_QUERIES = ["cust.* jo.n", "[a-z]*an", "(scan|sort) fast",
                 "da?ta", "zzz.*"]


def _q_regex_topk(sf_dir: str):
    """Regexp term query (Lucene RegexpQuery): each pattern expands to
    the dictionary terms it fully matches; the union scores as OR.  The
    SQL performs the SAME expansion with regexp_full_match over its df
    table, so the expansion itself is what's checked."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_regex(p, TOPK * 3 + 20) for p in REGEX_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_regex_topk() -> str:
    parts = []
    for qid, text in enumerate(REGEX_QUERIES):
        for p in text.split():
            parts.append(f"SELECT {qid} AS query_id, term FROM dfv "
                         f"WHERE regexp_full_match(term, '{p}')")
    return _sql_bm25([], conjunctive=False, q_sql=" UNION ".join(parts))


def _q_ts_field_stats(sf_dir: str):
    """Match-set field statistics (the stats aggregation): count / min /
    max / floor-mean of the stored turn timestamp over each query's OR
    match set on the transcript index — exact integer arithmetic on both
    sides (Python ints for the sum; SQL uses HUGEINT then floors)."""
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    eng = QueryEngine(str(idx))
    rows = {"query_id": [], "n": [], "ts_min": [], "ts_max": [],
            "ts_avg": []}
    for qid, q in enumerate(reference_queries()):
        st = eng.field_stats(q["text"], field="ts", mode="or")
        rows["query_id"].append(qid)
        rows["n"].append(st["count"])
        rows["ts_min"].append(st["min"])
        rows["ts_max"].append(st["max"])
        rows["ts_avg"].append(st["avg"])
    return pd.DataFrame(rows).astype(np.int64)


def _sql_ts_field_stats() -> str:
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    texts = [q["text"] for q in reference_queries()]
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, ts, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
docs AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, ts, text
  FROM raw JOIN offs USING (conv_id)
),
tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM docs),
q(query_id, term) AS (VALUES {_sql_values_queries(texts)}),
qids AS (SELECT DISTINCT query_id FROM q),
m AS (SELECT DISTINCT q.query_id, tok.doc_id FROM q JOIN tok USING (term)),
v AS (
  SELECT m.query_id, epoch_us(d.ts)::BIGINT AS ts_us
  FROM m JOIN docs d ON d.doc_id = m.doc_id
  WHERE d.ts IS NOT NULL
),
agg AS (
  SELECT query_id, count(*)::BIGINT n, min(ts_us) ts_min, max(ts_us) ts_max,
         (sum(ts_us::HUGEINT) // count(*))::BIGINT ts_avg
  FROM v GROUP BY 1
)
SELECT qids.query_id, coalesce(agg.n, 0)::BIGINT n,
       coalesce(agg.ts_min, 0)::BIGINT ts_min,
       coalesce(agg.ts_max, 0)::BIGINT ts_max,
       coalesce(agg.ts_avg, 0)::BIGINT ts_avg
FROM qids LEFT JOIN agg USING (query_id)
"""


# stored-query table for the percolator: OR alerts (ids 0..) + AND
# alerts (ids 100..); the zero-token and absent-term rows are coverage
PERCOLATE_QUERIES = (
    [{"query_id": i, "text": t, "mode": "or"}
     for i, t in enumerate(DOC_QUERIES)]
    + [{"query_id": 100 + i, "text": t, "mode": "and"}
       for i, t in enumerate(DOC_AND_QUERIES)]
    # boolean-NOT stored clauses: alert unless the exclude term appears
    + [{"query_id": 200, "text": "batch join", "mode": "or",
        "exclude": "slow"},
       {"query_id": 201, "text": "scan", "mode": "or",
        "exclude": "zzzqnotfound"}]   # absent exclusion == plain alert
)


def _q_percolate(sf_dir: str):
    """Percolation (reverse search / standing-query alerting): the stored
    query table broadcasts into one streaming map_batches; per distinct
    stored term ONE vectorized Arrow regex computes membership — no
    shuffle, no tokenize.  The SQL restates membership via the shared
    tokenizer (unnest + group), so the hash checks the regex<->tokenizer
    equivalence itself."""
    from horus_ner_ray.stages.percolate import percolate_dataset

    out = percolate_dataset(_read_docs(sf_dir), PERCOLATE_QUERIES).to_pandas()
    return (out.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
            .astype(np.int64))


def _sql_percolate() -> str:
    import re

    rows = []
    nt_rows = []
    ex_rows = []
    for q in PERCOLATE_QUERIES:
        terms = sorted(set(re.findall(_TOKRE, q["text"].lower())))
        for t in terms:
            rows.append(f"({q['query_id']}, '{t}')")
        for t in sorted(set(re.findall(_TOKRE,
                                       q.get("exclude", "").lower()))):
            ex_rows.append(f"({q['query_id']}, '{t}')")
        # OR queries need 1 hit; AND queries need every term
        need = len(terms) if q["mode"] == "and" else (1 if terms else 0)
        if terms:
            nt_rows.append(f"({q['query_id']}, {need})")
    ex_sql = ", ".join(ex_rows) or "(-1, '')"
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tfd AS (SELECT DISTINCT doc_id, term FROM tok),
q(query_id, term) AS (VALUES {", ".join(rows)}),
qex(query_id, term) AS (VALUES {ex_sql}),
need(query_id, nt) AS (VALUES {", ".join(nt_rows)}),
hit AS (
  SELECT q.query_id, tfd.doc_id, count(*)::BIGINT nhit
  FROM q JOIN tfd USING (term) GROUP BY 1, 2
)
SELECT h.query_id, h.doc_id
FROM hit h JOIN need USING (query_id)
WHERE h.nhit >= need.nt
  AND NOT EXISTS (SELECT 1 FROM qex e JOIN tfd x
                  ON x.term = e.term AND x.doc_id = h.doc_id
                  WHERE e.query_id = h.query_id)
ORDER BY 1, 2
"""


LM_MU = 1000.0


def _q_lm_topk(sf_dir: str):
    """Dirichlet-smoothed query-likelihood ranking (the pluggable second
    similarity beside BM25; Lucene LMDirichletSimilarity / Zhai &
    Lafferty): per matching term ln(1 + tf/(mu*cf/T)) + ln(mu/(dl+mu)),
    collection stats from the prebuilt df table.  The SQL restates the
    formula verbatim (same division order; engine uses ln(1+x), not
    log1p, so the floats match before the e6 round)."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_lm(t, TOPK * 3 + 20, mu=LM_MU) for t in DOC_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _ipc_export_dir(sf_dir: str) -> str:
    """Deterministic Arrow IPC export of the transcript corpus (written
    once under GRAFT_TMP; the Ray reader consumes these bytes while the
    oracle reads the ORIGINAL parquet parts — losslessness IS the
    check)."""
    import ray.data as rd

    from horus_ner_ray.sources.ipc import write_ipc

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    out = Path(os.environ.get("GRAFT_TMP", "/tmp")) / f"horus_ipc_{sf}"
    marker = out / "state.done"
    if not marker.exists():
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        write_ipc(rd.read_parquet(files), out)
        marker.write_text("ok")
    return str(out)


def _q_ipc_source(sf_dir: str):
    """Arrow IPC transcript source (sources/ipc.py — the zero-parse
    binary interchange; S2/S6 pair with write_ipc): the corpus exports
    to one .arrow container per conversation, the reader decodes them
    back, and the ORACLE reads the ORIGINAL parquet parts — any byte the
    IPC round-trip loses or mangles breaks the hash.  Published as
    per-turn (conv_id, turn_idx, role, n_chars, ts_us)."""
    from horus_ner_ray.sources.ipc import read_ipc_transcripts

    d = _ipc_export_dir(sf_dir)
    files = sorted(str(p) for p in Path(d).glob("*.arrow"))
    df = read_ipc_transcripts(files).to_pandas()
    out = pd.DataFrame({
        "conv_id": df["conv_id"].astype(str),
        "turn_idx": df["turn_idx"].astype(np.int64),
        "role": df["role"].astype(str),
        "n_chars": df["text"].str.len().astype(np.int64),
        "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
    })
    return (out.sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))


def _sql_ipc_source() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    return f"""
SELECT conv_id, turn_idx::BIGINT AS turn_idx, role,
       length(text)::BIGINT AS n_chars,
       epoch_us(ts)::BIGINT AS ts_us
FROM read_parquet('{glob}')
ORDER BY conv_id, turn_idx
"""


def _q_dedup_keep_best(sf_dir: str):
    """SemDeDup keep-rule: embedding near-dup clusters (the dup_components
    composition) each keep their HIGHEST-QUALITY member (vocab richness
    n_unique desc, doc asc) — dedup that preserves the best copy instead
    of an arbitrary one (stages/clustering.keep_best_per_component: one
    hash join + an associative per-component arg-max combiner).
    embeddings.vec_id aligns 1:1 with documents.doc_id."""
    import ray.data as rd

    from horus_ner_ray.stages.analysis import quality_dataset
    from horus_ner_ray.stages.clustering import (keep_best_per_component,
                                                 semantic_dup_components)
    from horus_ner_ray.stages.dedupe import buckets_for_rows, salts_for_rows
    from horus_ner_ray.util import worker_runtime_env as _rte

    n = _n_rows(str(Path(sf_dir) / "embeddings.parquet"))
    emb = rd.read_parquet(str(Path(sf_dir) / "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    comps = semantic_dup_components(emb, threshold=0.4, exact=True,
                                    n_buckets=buckets_for_rows(n),
                                    n_salts=salts_for_rows(n))
    q = quality_dataset(_read_docs(sf_dir)).select_columns(
        ["doc_id", "n_unique"])
    q = q.map_batches(lambda b: b.rename_columns(["vec_id", "n_unique"]),
                      batch_format="pyarrow", zero_copy_batch=True,
                      runtime_env=_rte())
    return keep_best_per_component(comps, q, id_col="vec_id")


def _sql_dedup_keep_best() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.4
),
edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
reach(node, lab) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.node = e.v
),
comp AS (SELECT node AS doc_id, min(lab) AS component
         FROM reach GROUP BY node),
qual AS (SELECT doc_id,
                len(list_distinct({_sql_tok()}))::BIGINT AS n_unique
         FROM documents),
j AS (
  SELECT c.component, c.doc_id, q.n_unique,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.n_unique DESC, c.doc_id) rk,
         count(*) OVER (PARTITION BY c.component) cnt
  FROM comp c JOIN qual q USING (doc_id)
)
SELECT component::BIGINT AS component, doc_id::BIGINT AS kept_doc,
       n_unique, cnt::BIGINT AS n_members
FROM j WHERE rk = 1 ORDER BY component
"""


WILDCARD_QUERIES = ["cust*", "t?ble *alue", "s??n gr*p", "w*d?w"]


def _q_bm25_wildcard(sf_dir: str):
    """Wildcard term query (Lucene WildcardQuery / ES wildcard: * = any
    run, ? = one char, mid-pattern allowed): dictionary expansion via the
    shared wildcard_to_regex translation, union scored as OR.  The SQL
    performs the SAME expansion with LIKE (* -> %, ? -> _) over its df
    table — the translation rule itself is what the oracle pins."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_wildcard(t, TOPK * 3 + 20)
            for t in WILDCARD_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_bm25_wildcard() -> str:
    parts: list[str] = []
    for qid, text in enumerate(WILDCARD_QUERIES):
        for pat in sorted(set(text.split())):
            like = pat.replace("*", "%").replace("?", "_")
            parts.append(f"SELECT {qid} AS query_id, term FROM dfv "
                         f"WHERE term LIKE '{like}'")
    return _sql_bm25([], conjunctive=False, q_sql=" UNION ".join(parts))


OSA_QUERIES = ["bacth jion", "qeury", "straem tabel", "vecotr"]


def _q_fuzzy_osa_topk(sf_dir: str):
    """Transposition-aware fuzzy search (Lucene FuzzyQuery's default
    transpositions=true — the OSA metric counts an adjacent swap as ONE
    edit, so 'bacth' reaches 'batch' at distance 1 where plain
    Levenshtein needs 2).  max_dist=1 is the operating point where OSA
    and full Damerau-Levenshtein coincide, so DuckDB's native
    damerau_levenshtein() is an exact oracle for the expansion."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_fuzzy(t, TOPK * 3 + 20, transpositions=True)
            for t in OSA_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_fuzzy_osa() -> str:
    import re

    parts: list[str] = []
    for qid, text in enumerate(OSA_QUERIES):
        for tok in sorted(set(re.findall(_TOKRE, text.lower()))):
            parts.append(
                f"SELECT {qid} AS query_id, term FROM dfv "
                f"WHERE damerau_levenshtein(term, '{tok}') <= 1")
    return _sql_bm25([], conjunctive=False, q_sql=" UNION ".join(parts))


def _q_classic_topk(sf_dir: str):
    """Lucene ClassicSimilarity ranking (vector-space TF-IDF, the
    pluggable third similarity beside BM25 and Dirichlet-LM): per
    matching term sqrt(tf) * idf^2 / sqrt(dl), idf = 1 + ln(N/(df+1)),
    queryNorm dropped (rank-neutral constant).  The SQL restates the
    formula with the identical association (sqrt is IEEE-correctly
    rounded on both sides; ln follows the lm_topk precedent)."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_classic(t, TOPK * 3 + 20) for t in DOC_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_classic_topk() -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
nd AS (SELECT count(*)::DOUBLE n FROM documents),
dfi AS (
  SELECT term,
         (1 + ln((SELECT n FROM nd) / (count(DISTINCT doc_id) + 1.0))) idf
  FROM tok GROUP BY term
),
q(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( (sqrt(tf.tf) * (dfi.idf * dfi.idf)) / sqrt(dl.dl) ) score
  FROM q
  JOIN dfi USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM scored
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _sql_bm25_rescore() -> str:
    """Rescore oracle: the shared BM25 body picks the e6-domain top-20
    window per query; the shared LM body scores exactly the window rows;
    the final row_number ranks by (lm_e6 desc, doc asc)."""
    mu = LM_MU
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
tt AS (SELECT sum(dl)::DOUBLE t FROM dl),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
cfv AS (SELECT term, sum(tf)::BIGINT cf FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
bm AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
win AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
           ) rk
    FROM bm
  ) WHERE rk <= {RESCORE_WINDOW}
),
lm AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + tf.tf / ({mu!r} * (cfv.cf / tt.t)))
              + ln({mu!r} / (dl.dl + {mu!r})) ) score
  FROM q
  JOIN cfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN tt
  GROUP BY 1, 2
),
ranked AS (
  SELECT w.query_id, w.doc_id,
         CAST(FLOOR(lm.score * 1e6 + 0.5) AS BIGINT) lm_e6,
         row_number() OVER (
           PARTITION BY w.query_id
           ORDER BY CAST(FLOOR(lm.score * 1e6 + 0.5) AS BIGINT) DESC, w.doc_id
         ) rk
  FROM win w JOIN lm ON lm.query_id = w.query_id AND lm.doc_id = w.doc_id
)
SELECT query_id, rk AS rank, doc_id, lm_e6 FROM ranked WHERE rk <= {TOPK}
"""


RRF_K = 60

CHUNK_WINDOW, CHUNK_STRIDE = 32, 24

MMR_POOL, MMR_K, MMR_LAM10 = 15, 5, 7


def _q_bm25_diverse(sf_dir: str):
    """MMR result diversification: the e6-reranked BM25 top-15 pool
    re-orders greedily by 0.7 * rank-relevance - 0.3 * max-Jaccard-to-
    selected, all exact integers (pipelines/query.py mmr_select; brute
    parity in tests/test_rrf.py).  The SQL unrolls the k-step greedy
    selection as chained CTEs — each step an anti-joined argmax window
    over the candidate pairs relation."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    rows = {"query_id": [], "rank": [], "doc_id": []}
    for qid, text in enumerate(DOC_QUERIES):
        picked = eng.search_diverse(text, k=MMR_K, pool_n=MMR_POOL,
                                    lam10=MMR_LAM10)
        for r, d in enumerate(picked, start=1):
            rows["query_id"].append(qid)
            rows["rank"].append(r)
            rows["doc_id"].append(d)
    return pd.DataFrame(rows).astype(np.int64)


def _sql_bm25_diverse() -> str:
    lam, mal = MMR_LAM10, 10 - MMR_LAM10
    steps = []
    for s in range(2, MMR_K + 1):
        steps.append(f""",
p{s} AS MATERIALIZED (
  SELECT c.query_id, c.doc_id,
         {lam} * c.rel_e6 - {mal} * max(p.sim_e6) AS mmr
  FROM cand c
  JOIN sel{s - 1} s0 ON s0.query_id = c.query_id
  JOIN pairs p ON p.query_id = c.query_id AND p.da = c.doc_id
              AND p.db = s0.doc_id
  LEFT JOIN sel{s - 1} sx ON sx.query_id = c.query_id
                         AND sx.doc_id = c.doc_id
  WHERE sx.doc_id IS NULL
  GROUP BY c.query_id, c.doc_id, c.rel_e6
),
sel{s} AS MATERIALIZED (
  SELECT query_id, doc_id, rank FROM sel{s - 1}
  UNION ALL
  SELECT query_id, doc_id, {s} FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY mmr DESC, doc_id) rn
    FROM p{s}) WHERE rn = 1
)""")
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
scored AS MATERIALIZED (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
cand AS MATERIALIZED (
  SELECT query_id, doc_id, rn,
         (({MMR_POOL} - rn + 1) * 1000000) // {MMR_POOL} AS rel_e6
  FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id) rn
    FROM scored)
  WHERE rn <= {MMR_POOL}
),
dt AS MATERIALIZED (
  SELECT doc_id, list_distinct({_sql_tok()}) AS toks FROM documents
  WHERE doc_id IN (SELECT doc_id FROM cand)
),
pairs AS MATERIALIZED (
  SELECT query_id, da, db,
         CASE WHEN ua + ub - inter = 0 THEN 0
              ELSE inter * 1000000 // (ua + ub - inter) END AS sim_e6
  FROM (
    SELECT ca.query_id, ca.doc_id da, cb.doc_id db,
           len(list_intersect(ta.toks, tb.toks))::BIGINT AS inter,
           len(ta.toks)::BIGINT ua, len(tb.toks)::BIGINT ub
    FROM cand ca
    JOIN cand cb ON ca.query_id = cb.query_id AND ca.doc_id <> cb.doc_id
    JOIN dt ta ON ta.doc_id = ca.doc_id
    JOIN dt tb ON tb.doc_id = cb.doc_id)
),
sel1 AS MATERIALIZED (SELECT query_id, doc_id, 1 AS rank FROM cand WHERE rn = 1){"".join(steps)}
SELECT query_id, rank, doc_id FROM sel{MMR_K}
"""


# recency function-score constants: NOW past every synth timestamp at any
# sf, horizon wide enough that boosts vary across the corpus (10 years,
# seconds granularity keeps boost_e6 * horizon_s far inside int64)
RECENCY_NOW_US = 1_893_456_000_000_000   # 2030-01-01T00:00:00 epoch us
RECENCY_HORIZON_S = 315_360_000          # 10 * 365 days
RECENCY_BOOST_E6 = 5_000_000


def _q_bm25_recency(sf_dir: str):
    """Recency function-score (ES function_score linear decay): BM25
    moves to the e6 integer domain and adds the shared integer decay
    boost over the stored turn timestamp (pipelines/query.py
    recency_boost_e6); ranking (final desc, doc asc) is exact-integer on
    both sides, so top-k compares directly — no boundary padding.
    Brute-force parity in tests/test_recency.py."""
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.synth import reference_queries

    eng = QueryEngine(_tr_index_dir(sf_dir))
    rows = {"query_id": [], "rank": [], "doc_id": [], "score_e6": []}
    for qid, q in enumerate(reference_queries()):
        hits = eng.search_recency(q["text"], k=TOPK, now_us=RECENCY_NOW_US,
                                  horizon_s=RECENCY_HORIZON_S,
                                  boost_e6=RECENCY_BOOST_E6)
        for r, (d, v) in enumerate(hits, start=1):
            rows["query_id"].append(qid)
            rows["rank"].append(r)
            rows["doc_id"].append(d)
            rows["score_e6"].append(v)
    return pd.DataFrame(rows).astype(np.int64)


def _sql_bm25_recency() -> str:
    """Recency oracle: the shared transcripts BM25 body, then the exact
    integer decay — age_s = max(now - ts, 0) // 1e6, boost =
    boost_e6 * max(horizon_s - age_s, 0) // horizon_s — added to the e6
    BM25 score before ranking."""
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    now, hz, be = RECENCY_NOW_US, RECENCY_HORIZON_S, RECENCY_BOOST_E6
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, ts, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, ts, text
  FROM raw JOIN offs USING (conv_id)
),
tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries([q["text"] for q in reference_queries()])}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
boosted AS (
  SELECT sc.query_id, sc.doc_id,
         CAST(FLOOR(sc.score * 1e6 + 0.5) AS BIGINT)
         + (CASE WHEN dm.ts IS NULL THEN 0
                 ELSE {be} * greatest(
                        {hz} - (greatest({now} - epoch_us(dm.ts), 0) // 1000000),
                        0) // {hz}
            END) AS score_e6
  FROM scored sc JOIN documents dm USING (doc_id)
),
ranked AS (
  SELECT query_id, doc_id, score_e6,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score_e6 DESC, doc_id
         ) rk
  FROM boosted
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _q_chunked_docs(sf_dir: str):
    """RAG-style token-window chunking: each document's token stream
    (shared [a-z0-9]+ rule) splits into 32-token windows advancing by 24
    (8-token overlap); chunk j covers tokens [j*24, min(j*24+32, dl)).
    One streaming map_batches — tokenize + a single vectorized
    overlap-window gather, no per-doc Python (stages/chunking.py).  The
    SQL restates the rule with regexp_extract_all + generate_series +
    1-based inclusive list slicing."""
    from horus_ner_ray.stages.chunking import chunk_documents_dataset

    df = chunk_documents_dataset(
        _read_docs(sf_dir), window=CHUNK_WINDOW, stride=CHUNK_STRIDE
    ).to_pandas()
    return df.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def _sql_chunked_docs() -> str:
    w, s = CHUNK_WINDOW, CHUNK_STRIDE
    return f"""
WITH tok AS (
  SELECT doc_id, {_sql_tok()} AS toks FROM documents
),
idx AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, (len(toks) + {s - 1}) // {s} - 1)) AS i
  FROM tok
)
SELECT doc_id, i AS chunk_idx,
       least(i*{s} + {w}, len(toks)) - i*{s} AS n_tokens,
       array_to_string(toks[i*{s} + 1 : least(i*{s} + {w}, len(toks))], ' ')
         AS chunk_text
FROM idx
ORDER BY doc_id, chunk_idx
"""


def _q_bm25_rrf(sf_dir: str):
    """Hybrid reciprocal-rank fusion (the ES/Lucene RRF retriever): the
    BM25 and Dirichlet-QL rankings fuse by the shared integer rule
    (``rrf_fuse``: ranks assigned in the e6 domain, contribution =
    1e6 // (60 + rank), top-``RESCORE_WINDOW`` of each leg) — fused
    scores are exact integer sums, bit-identical between the engine and
    the SQL restatement.  Both phase rankings are brute-parity tested in
    tests/test_rrf.py."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    rows = {"query_id": [], "rank": [], "doc_id": [], "rrf": []}
    for qid, text in enumerate(DOC_QUERIES):
        fused = eng.search_fused(text, k=TOPK, window=RESCORE_WINDOW,
                                 k_rrf=RRF_K, mu=LM_MU)
        for r, (d, s) in enumerate(fused, start=1):
            rows["query_id"].append(qid)
            rows["rank"].append(r)
            rows["doc_id"].append(d)
            rows["rrf"].append(s)
    return pd.DataFrame(rows).astype(np.int64)


def _sql_bm25_rrf() -> str:
    """RRF oracle: the shared BM25 and LM bodies each rank in the e6
    integer domain; the top-window ranks of each leg contribute the
    exact integer 1e6 // (RRF_K + rank); the fused ranking orders
    (rrf desc, doc asc)."""
    mu = LM_MU
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
tt AS (SELECT sum(dl)::DOUBLE t FROM dl),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
cfv AS (SELECT term, sum(tf)::BIGINT cf FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
bm AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
lm AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + tf.tf / ({mu!r} * (cfv.cf / tt.t)))
              + ln({mu!r} / (dl.dl + {mu!r})) ) score
  FROM q
  JOIN cfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN tt
  GROUP BY 1, 2
),
bmrank AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM bm
),
lmrank AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM lm
),
contrib AS (
  SELECT query_id, doc_id, 1000000 // ({RRF_K} + rk) AS c
  FROM bmrank WHERE rk <= {RESCORE_WINDOW}
  UNION ALL
  SELECT query_id, doc_id, 1000000 // ({RRF_K} + rk)
  FROM lmrank WHERE rk <= {RESCORE_WINDOW}
),
fused AS (
  SELECT query_id, doc_id, sum(c)::BIGINT rrf FROM contrib GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, rrf,
         row_number() OVER (
           PARTITION BY query_id ORDER BY rrf DESC, doc_id
         ) rk
  FROM fused
)
SELECT query_id, rk AS rank, doc_id, rrf FROM ranked WHERE rk <= {TOPK}
"""


def _q_hybrid_rrf(sf_dir: str):
    """TEXT + VECTOR hybrid retrieval (the ES 8 hybrid-search shape:
    lexical BM25 leg + dense-embedding kNN leg fused by RRF): query i
    pairs DOC_QUERIES[i] with the embedding of vec_id = i (embeddings
    align 1:1 with documents), both legs fetch padded candidate lists,
    and the shared ``rrf_fuse`` integer rule fuses them — contributions
    1e6 // (60 + e6-domain rank), exact integer sums on both sides."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.pipelines.query import QueryEngine, rrf_fuse
    from horus_ner_ray.stages.similarity import ann_topk_bruteforce

    pad = RESCORE_WINDOW * 3 + 20
    eng = QueryEngine(_doc_index_dir(sf_dir))
    epath = str(Path(sf_dir) / "embeddings.parquet")
    qt = pq.read_table(epath, columns=["vec_id", "embedding"]).to_pandas()
    qt = qt[qt.vec_id < len(DOC_QUERIES)].sort_values("vec_id")
    ann = ann_topk_bruteforce(
        rd.read_parquet(epath),
        qt["vec_id"].to_numpy(np.int64),
        np.array(qt["embedding"].tolist(), dtype=np.float64),
        k=pad,
    )
    rows = {"query_id": [], "rank": [], "doc_id": [], "rrf": []}
    for qid, text in enumerate(DOC_QUERIES):
        bm = eng.search(text, k=pad)
        g = ann[ann.query_id == qid]
        vec = list(zip(g["vec_id"].astype(int), g["cosine"].astype(float)))
        fused = rrf_fuse([bm, vec], k=TOPK, window=RESCORE_WINDOW,
                         k_rrf=RRF_K)
        for r, (d, s) in enumerate(fused, start=1):
            rows["query_id"].append(qid)
            rows["rank"].append(r)
            rows["doc_id"].append(d)
            rows["rrf"].append(s)
    return pd.DataFrame(rows).astype(np.int64)


def _sql_hybrid_rrf() -> str:
    """Hybrid oracle: the shared BM25 body ranks the lexical leg, a
    cosine cross-join over embeddings ranks the dense leg (vec_id IS the
    doc id), both in the e6 integer domain; contributions and the fused
    ordering restate ``rrf_fuse`` verbatim."""
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
bm AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
vq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       WHERE vec_id < {len(DOC_QUERIES)}),
ann AS (
  SELECT vq.query_id, e.vec_id AS doc_id,
         list_cosine_similarity(CAST(vq.qe AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS score
  FROM vq CROSS JOIN embeddings e
),
bmrank AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM bm
),
annrank AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM ann
),
contrib AS (
  SELECT query_id, doc_id, 1000000 // ({RRF_K} + rk) AS c
  FROM bmrank WHERE rk <= {RESCORE_WINDOW}
  UNION ALL
  SELECT query_id, doc_id, 1000000 // ({RRF_K} + rk)
  FROM annrank WHERE rk <= {RESCORE_WINDOW}
),
fused AS (
  SELECT query_id, doc_id, sum(c)::BIGINT rrf FROM contrib GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, rrf,
         row_number() OVER (
           PARTITION BY query_id ORDER BY rrf DESC, doc_id
         ) rk
  FROM fused
)
SELECT query_id, rk AS rank, doc_id, rrf FROM ranked WHERE rk <= {TOPK}
"""


def _sql_lm_topk() -> str:
    mu = LM_MU
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
tt AS (SELECT sum(dl)::DOUBLE t FROM dl),
cfv AS (SELECT term, sum(tf)::BIGINT cf FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + tf.tf / ({mu!r} * (cfv.cf / tt.t)))
              + ln({mu!r} / (dl.dl + {mu!r})) ) score
  FROM q
  JOIN cfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN tt
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM scored
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _q_lm_ranking_eval(sf_dir: str):
    """IR retrieval-quality evaluation (stages/evalmetrics
    ranking_metrics_row — the TREC counters): the Dirichlet-LM top-10
    judged against the BM25 e6-top-10 as binary qrels, per query:
    n_rel / n_hit / mrr_e6 / dcg_e9 / ndcg_e6 / recall_e6.  Exact-int
    contract: each relevant rank contributes floor(1e9/log2(p+1)+0.5)
    BEFORE summation (order-free), every ratio floors from int inputs.
    SQL re-derives BOTH rankings (the bm25 + lm oracle bodies) and
    restates the counters."""
    from horus_ner_ray.stages.evalmetrics import ranking_metrics_row

    bm = _bm25_topk_frame(sf_dir, DOC_QUERIES, "or")
    lm = _q_lm_topk(sf_dir)
    rows = {c: [] for c in ("query_id", "n_rel", "n_hit", "mrr_e6",
                            "dcg_e9", "ndcg_e6", "recall_e6")}
    for qid in range(len(DOC_QUERIES)):
        qrels = bm.loc[bm["query_id"] == qid].sort_values("rank")[
            "doc_id"].tolist()
        run = lm.loc[lm["query_id"] == qid].sort_values("rank")[
            "doc_id"].tolist()
        m = ranking_metrics_row(run, qrels, k=TOPK)
        rows["query_id"].append(qid)
        for c in ("n_rel", "n_hit", "mrr_e6", "dcg_e9", "ndcg_e6",
                  "recall_e6"):
            rows[c].append(m[c])
    return pd.DataFrame(rows).astype(np.int64)


def _sql_lm_ranking_eval() -> str:
    return f"""
WITH bm AS ({_sql_bm25(DOC_QUERIES, conjunctive=False)}),
lmr AS ({_sql_lm_topk()}),
qids(query_id) AS (VALUES {", ".join(f"({i})" for i in range(len(DOC_QUERIES)))}),
nrel AS (SELECT query_id, count(*)::BIGINT AS n_rel FROM bm GROUP BY 1),
hits AS (
  SELECT l.query_id, l.rank AS p
  FROM lmr l JOIN bm ON bm.query_id = l.query_id AND bm.doc_id = l.doc_id
),
agg AS (
  SELECT query_id, count(*)::BIGINT AS n_hit,
         CAST(FLOOR(1e6 / min(p) + 0.5) AS BIGINT) AS mrr_e6,
         sum(CAST(FLOOR(1e9 / log2(p + 1) + 0.5) AS BIGINT))::BIGINT
           AS dcg_e9
  FROM hits GROUP BY 1
),
ideal AS (
  SELECT n.query_id,
         sum(CAST(FLOOR(1e9 / log2(p + 1) + 0.5) AS BIGINT))::BIGINT
           AS idcg_e9
  FROM nrel n
  JOIN (SELECT unnest(generate_series(1, {TOPK})) AS p) s
    ON s.p <= least({TOPK}, n.n_rel)
  GROUP BY 1
)
SELECT q.query_id,
       coalesce(n.n_rel, 0)::BIGINT AS n_rel,
       coalesce(a.n_hit, 0)::BIGINT AS n_hit,
       coalesce(a.mrr_e6, 0)::BIGINT AS mrr_e6,
       coalesce(a.dcg_e9, 0)::BIGINT AS dcg_e9,
       CASE WHEN coalesce(a.dcg_e9, 0) = 0 OR coalesce(i.idcg_e9, 0) = 0
            THEN 0
            ELSE CAST(FLOOR(CAST(a.dcg_e9 AS DOUBLE) / i.idcg_e9
                            * 1e6 + 0.5) AS BIGINT)
       END AS ndcg_e6,
       CASE WHEN coalesce(n.n_rel, 0) = 0 THEN 0
            ELSE CAST(FLOOR(CAST(coalesce(a.n_hit, 0) AS DOUBLE) / n.n_rel
                            * 1e6 + 0.5) AS BIGINT)
       END AS recall_e6
FROM qids q
LEFT JOIN nrel n USING (query_id)
LEFT JOIN agg a USING (query_id)
LEFT JOIN ideal i USING (query_id)
ORDER BY q.query_id
"""


BOOLEAN_MSM_QUERIES = [  # (must, should, min_should_match)
    ("data", "filter sort merge", 2),
    ("customer", "window slow scan", 1),
    ("batch", "join stream zzzqnotfound", 2),
    ("scan", "merge table", 0),   # msm=0 == plain boolean
]


def _q_bm25_boolean_msm(sf_dir: str):
    """Boolean query with Lucene's min_should_match: candidacy = every
    must term AND >= m distinct should terms present; scoring unchanged
    (BM25 over present must+should terms).  SQL counts per-doc should
    hits and filters on the per-query m."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_boolean(m, s, "", TOPK * 3 + 20, min_should_match=n)
            for m, s, n in BOOLEAN_MSM_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_bm25_boolean_msm() -> str:
    import re

    q_rows: list[str] = []
    nm_rows: list[str] = []
    msm_rows: list[str] = []
    for qid, (must, should, msm) in enumerate(BOOLEAN_MSM_QUERIES):
        mt = sorted(set(re.findall(_TOKRE, must.lower())))
        stt = sorted(set(re.findall(_TOKRE, should.lower())) - set(mt))
        mt_sql = mt or ["###none###"]
        for t in mt_sql:
            q_rows.append(f"({qid}, '{t}', TRUE)")
        for t in stt:
            q_rows.append(f"({qid}, '{t}', FALSE)")
        nm_rows.append(f"({qid}, {len(mt_sql)})")
        msm_rows.append(f"({qid}, {int(msm)})")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term, is_must) AS (VALUES {", ".join(q_rows)}),
nmq(query_id, nm) AS (VALUES {", ".join(nm_rows)}),
msmq(query_id, msm) AS (VALUES {", ".join(msm_rows)}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score,
         sum(CASE WHEN q.is_must THEN 1 ELSE 0 END) nmust,
         sum(CASE WHEN q.is_must THEN 0 ELSE 1 END) nshould
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
filt AS (
  SELECT scored.query_id, scored.doc_id, scored.score
  FROM scored JOIN nmq USING (query_id) JOIN msmq USING (query_id)
  WHERE scored.nmust = nmq.nm AND scored.nshould >= msmq.msm
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM filt
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _q_match_counts(sf_dir: str):
    """Total-hits counts (the count API): per query, the OR match count
    (any term) and the AND match count (every term) over live docs — no
    scoring, one postings decode per (term, shard)."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    rows = {"query_id": [], "n_or": [], "n_and": []}
    for qid, q in enumerate(DOC_QUERIES):
        rows["query_id"].append(qid)
        rows["n_or"].append(eng.match_count(q, "or"))
        rows["n_and"].append(eng.match_count(q, "and"))
    return pd.DataFrame(rows).astype(np.int64)


def _sql_match_counts() -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tfd AS (SELECT DISTINCT doc_id, term FROM tok),
q(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
qn AS (SELECT query_id, count(*)::BIGINT nt FROM q GROUP BY 1),
hit AS (
  SELECT q.query_id, tfd.doc_id, count(*)::BIGINT nhit
  FROM q JOIN tfd USING (term) GROUP BY 1, 2
),
agg AS (
  SELECT h.query_id, count(*)::BIGINT n_or,
         sum(CASE WHEN h.nhit = qn.nt THEN 1 ELSE 0 END)::BIGINT n_and
  FROM hit h JOIN qn USING (query_id) GROUP BY 1
)
SELECT qn.query_id, coalesce(agg.n_or, 0)::BIGINT AS n_or,
       coalesce(agg.n_and, 0)::BIGINT AS n_and
FROM qn LEFT JOIN agg USING (query_id)
"""


def _q_conv_turns(sf_dir: str):
    """Conversation multi-get from the DOCSTORE (fetch_conv_docs): every
    stored turn of three deterministically chosen conversations (first /
    middle / last in sorted conv order), doc_id-ordered.  This states the
    north-star per-turn text-equality invariant inside the driver gate:
    the SQL reads the SAME corpus files and re-derives the rank doc-id
    rule, so the docstore's (doc_id, conv_id, turn_idx, role, text) rows
    must match the source table exactly."""
    import pyarrow.parquet as pq

    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import fetch_conv_docs
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    convs = np.unique(np.asarray(
        pq.read_table(files, columns=["conv_id"])["conv_id"], dtype=str))
    pick = [str(convs[0]), str(convs[len(convs) // 2]), str(convs[-1])]
    df = fetch_conv_docs(str(idx), pick,
                         columns=["doc_id", "conv_id", "turn_idx",
                                  "role", "text"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["turn_idx"] = df["turn_idx"].astype(np.int64)
    return df[["doc_id", "conv_id", "turn_idx", "role", "text"]]


def _sql_conv_turns() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, role, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
docs AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, conv_id,
         turn_idx::BIGINT AS turn_idx, role, text
  FROM raw JOIN offs USING (conv_id)
),
sel AS (
  SELECT conv_id,
         row_number() OVER (ORDER BY conv_id) - 1 AS r,
         count(*) OVER () AS c
  FROM (SELECT DISTINCT conv_id FROM raw)
),
chosen AS (SELECT conv_id FROM sel WHERE r = 0 OR r = c // 2 OR r = c - 1)
SELECT d.doc_id, d.conv_id, d.turn_idx, d.role, d.text
FROM docs d JOIN chosen USING (conv_id)
ORDER BY d.doc_id
"""


def _q_bm25_conv_topk(sf_dir: str):
    """CONVERSATION-granularity retrieval (the granularity switch: doc =
    whole conversation, not one turn): stages/docstore.conv_text_dataset
    joins every conversation's turns in turn order (one bucket shuffle +
    vectorized binary_join), conv rank order assigns provided doc ids,
    and an ordinary index builds over the conversation documents.  The
    SQL re-derives the same concatenation with string_agg ORDER BY
    turn_idx and the same row_number ids, then runs the shared BM25
    body."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.stages.docstore import conv_text_dataset
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_convidx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "text"])
        ct = conv_text_dataset(ds).to_pandas()  # conv-bounded (one row/conv)
        ct = ct.sort_values("conv_id").reset_index(drop=True)
        f = tmp / f"horus_convdocs_{sf}.parquet"
        pq.write_table(
            pa.table({"doc_id": pa.array(np.arange(len(ct), dtype=np.int64),
                                         pa.int64()),
                      "text": pa.array(ct["text"].tolist(), pa.string())}),
            f)
        build_index([str(f)], idx,
                    PipelineConfig(num_shards=4, doc_id_mode="provided"))
    eng = QueryEngine(str(idx))
    hits = [eng.search(q["text"], TOPK * 3 + 20) for q in reference_queries()]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_bm25_conv() -> str:
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    # AS MATERIALIZED is load-bearing: the string_agg/window chain
    # propagates no statistics, and the inlined form drove DuckDB's join
    # order into a ~91M-row cross product (52 s at sf0.001 -> 0.1 s)
    pre = f"""raw AS (
  SELECT conv_id, turn_idx, text FROM read_parquet('{glob}')
),
conv AS MATERIALIZED (
  SELECT conv_id, string_agg(text, ' ' ORDER BY turn_idx) AS text
  FROM raw GROUP BY 1
),
documents AS MATERIALIZED (
  SELECT (row_number() OVER (ORDER BY conv_id) - 1)::BIGINT AS doc_id, text
  FROM conv
),
"""
    return _sql_bm25([q["text"] for q in reference_queries()],
                     conjunctive=False, pre=pre)


def _q_bm25_common_terms(sf_dir: str):
    """Lucene CommonTermsQuery over the transcript index (true stopword
    structure: 'the'/'sessionmark'/role tokens sit in ~every turn, the
    tokNNNNN vocabulary is rare): terms with df*100 >= 50*N only SCORE,
    candidacy needs >= 1 low-frequency term; all-high queries fall back
    to plain OR.  The SQL restates the integer split predicate from its
    own df table, the DISTINCT low-term candidacy, and the shared scoring
    body."""
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    eng = QueryEngine(str(idx))
    hits = [eng.search_common_terms(q["text"], TOPK * 3 + 20,
                                    cutoff_pct=50)
            for q in reference_queries()]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_bm25_common_terms() -> str:
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    texts = [q["text"] for q in reference_queries()]
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS MATERIALIZED (
  SELECT (off + turn_idx)::BIGINT AS doc_id, text FROM raw JOIN offs USING (conv_id)
),
tok AS MATERIALIZED (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS MATERIALIZED (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS MATERIALIZED (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(texts)}),
qlow AS (
  SELECT q.query_id, q.term
  FROM q JOIN dfv USING (term) CROSS JOIN stats s
  WHERE dfv.df * 100 < 50 * s.n_docs
),
nlow AS (SELECT query_id, count(*)::BIGINT c FROM qlow GROUP BY 1),
cand AS (
  SELECT DISTINCT qlow.query_id, tf.doc_id
  FROM qlow JOIN tf USING (term)
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
kept AS (
  SELECT sc.query_id, sc.doc_id, sc.score
  FROM scored sc
  LEFT JOIN nlow USING (query_id)
  LEFT JOIN cand ON cand.query_id = sc.query_id
                AND cand.doc_id = sc.doc_id
  WHERE nlow.c IS NULL OR cand.doc_id IS NOT NULL
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM kept
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _q_bm25_sorted_by_time(sf_dir: str):
    """Field-sorted retrieval (Lucene Sort-by-field): each query's match
    set over the transcript index ordered by the stored turn timestamp
    (ts asc, doc_id tie-break) instead of relevance — no scoring, so the
    rows are all-integer and the oracle compares exactly."""
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    eng = QueryEngine(str(idx))
    rows = {"query_id": [], "rank": [], "doc_id": [], "ts_us": []}
    for qid, q in enumerate(reference_queries()):
        for r, (d, v) in enumerate(
                eng.search_sorted_by(q["text"], TOPK, field="ts",
                                     ascending=True), 1):
            rows["query_id"].append(qid)
            rows["rank"].append(r)
            rows["doc_id"].append(d)
            rows["ts_us"].append(v)
    return pd.DataFrame(rows).astype(np.int64)


def _sql_bm25_sorted_by_time() -> str:
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    texts = [q["text"] for q in reference_queries()]
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, ts, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
docs AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, ts, text
  FROM raw JOIN offs USING (conv_id)
),
tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM docs),
q(query_id, term) AS (VALUES {_sql_values_queries(texts)}),
m AS (SELECT DISTINCT q.query_id, tok.doc_id FROM q JOIN tok USING (term)),
v AS (
  SELECT m.query_id, m.doc_id, epoch_us(d.ts)::BIGINT AS ts_us
  FROM m JOIN docs d ON d.doc_id = m.doc_id
  WHERE d.ts IS NOT NULL
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY ts_us, doc_id) rk
  FROM v
)
SELECT query_id, rk::BIGINT AS rank, doc_id, ts_us FROM r WHERE rk <= {TOPK}
"""


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination (the cross-set n-gram sweep an LLM data
    pipeline runs before release; distinct from dedup — a small held-out
    right side, per-doc overlap counts out): docs with doc_id % 17 == 5
    form the benchmark; every other doc sharing a word 3-gram with it is
    flagged with its distinct-shared-shingle count.  The benchmark's
    shingle-hash set broadcasts once; the corpus streams through one
    map_batches — no shuffle (stages/decontam.py).  Oracle: SQL joins
    the distinct shingle STRINGS (hash-vs-string equality modulo 64-bit
    collisions — the fingerprint equivalence argument)."""
    import pyarrow as _pa

    from horus_ner_ray.stages.decontam import decontaminate_dataset
    from horus_ner_ray.util import worker_runtime_env

    def mod_filter(eq: bool):
        def f(b: "_pa.Table") -> "_pa.Table":
            ids = np.asarray(b["doc_id"], dtype=np.int64)
            m = (ids % 17 == 5) if eq else (ids % 17 != 5)
            return b.filter(_pa.array(m))
        return f

    rte = worker_runtime_env()
    bench = _read_docs(sf_dir).map_batches(
        mod_filter(True), batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=rte)
    corpus = _read_docs(sf_dir).map_batches(
        mod_filter(False), batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=rte)
    out = decontaminate_dataset(corpus, bench, k=3).to_pandas()
    return (out.sort_values("doc_id").reset_index(drop=True)
            .astype({"doc_id": np.int64, "n_shared": np.int64}))


def _sql_decontaminate() -> str:
    return f"""
WITH tok AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
win AS (
  SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 2)) AS i
  FROM tok WHERE len(arr) >= 3
),
sh AS (
  SELECT DISTINCT doc_id,
         arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
  FROM win
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 17 = 5)
SELECT sh.doc_id, count(DISTINCT sh.s)::BIGINT AS n_shared
FROM sh JOIN bench USING (s)
WHERE sh.doc_id % 17 <> 5
GROUP BY 1
"""


def _q_bm25_page2(sf_dir: str):
    """Cursor pagination (search_after deep paging), page 2: page 1 under
    the shared e6 rerank; the cursor is its last hit's (doc_id, bitwise
    FLOAT score); the engine's search_after returns the strict
    successors, padded and e6-reranked to global ranks 11-20.  SQL: the
    standard scoring body at rk BETWEEN 11 AND 20.  Boundary caveat
    (same class as every scored oracle's): a float-vs-e6 order
    disagreement exactly at the page boundary could swap a doc across
    pages; exact-equality ties (duplicate texts) order identically on
    both sides, and padding absorbs within-page ties."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    frames = []
    for qid, text in enumerate(DOC_QUERIES):
        p_all = eng.search(text, TOPK * 3 + 20)
        page1 = _e6_rerank(_hits_frame([p_all]), "score", "doc_id", "score_e6")
        if len(page1) < TOPK:
            continue  # fewer than a full page: no page 2 either side
        last_doc = int(page1["doc_id"].iloc[TOPK - 1])
        smap = dict(p_all)
        p2 = eng.search_after(text, TOPK * 3 + 20,
                              cursor=(last_doc, smap[last_doc]))
        df = _e6_rerank(_hits_frame([p2]), "score", "doc_id",
                        "score_e6").head(TOPK)
        df["query_id"] = qid
        df["rank"] = df["rank"] + TOPK
        frames.append(df)
    cols = ["query_id", "rank", "doc_id", "score_e6"]
    if not frames:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    return pd.concat(frames, ignore_index=True)[cols].astype(np.int64)


def _q_curation_pipeline(sf_dir: str):
    """End-to-end curation COMPOSITION as one Ray Data flow — the chain a
    training-data pipeline actually runs: exact dedup (keep min doc_id
    per text) -> quality gate (n_tokens >= 5 AND n_unique >= 3) ->
    content-group fingerprint over the survivors -> deterministic 80/20
    split.  One fused metrics pass (the quality + fingerprint batch
    kernels share a single map_batches), one dedup groupby, one
    fingerprint-bucket groupby; the keeper id set broadcasts once as the
    semi-join small side (the bloom joins of stages/joins.py are the
    beyond-broadcast escalation).  Every stage is an independently
    oracle-checked operator — this entry checks their composition (the
    SQL chains the same derivations as CTEs)."""
    import pyarrow as _pa
    import ray

    from horus_ner_ray.stages.analysis import fingerprint_batch, quality_batch
    from horus_ner_ray.stages.dedupe import (
        buckets_for_rows,
        exact_dedup_keep_min,
    )
    from horus_ner_ray.util import worker_runtime_env

    nbk = buckets_for_rows(_n_rows(_docs(sf_dir)))
    keep = exact_dedup_keep_min(_read_docs(sf_dir), n_buckets=nbk).to_pandas()
    keep_ids = np.sort(keep["doc_id"].to_numpy(np.int64))
    keep_ref = ray.put(keep_ids) if ray.is_initialized() else keep_ids

    def fused_metrics(batch: "_pa.Table") -> "_pa.Table":
        ks = ray.get(keep_ref) if ray.is_initialized() else keep_ref
        q = quality_batch(batch)
        f = fingerprint_batch(batch)
        ids = np.asarray(q["doc_id"], dtype=np.int64)
        nt = np.asarray(q["n_tokens"], dtype=np.int64)
        nu = np.asarray(q["n_unique"], dtype=np.int64)
        fpv = np.asarray(f["fingerprint"], dtype=np.int64)
        kept = np.zeros(len(ids), dtype=bool)
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, ids), len(ks) - 1)
            kept = ks[pos] == ids
        m = kept & (nt >= 5) & (nu >= 3)
        return _pa.table({
            "doc_id": _pa.array(ids[m], _pa.int64()),
            "n_tokens": _pa.array(nt[m], _pa.int64()),
            "fingerprint": _pa.array(fpv[m], _pa.int64()),
        })

    surv = _read_docs(sf_dir).map_batches(
        fused_metrics, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=worker_runtime_env())

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        h = b["fingerprint"].to_numpy(np.int64).astype(np.uint64)
        b["fbkt"] = ((h * np.uint64(0x9E3779B97F4A7C15))
                     % np.uint64(nbk)).astype(np.int64)
        return b

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["fp_group"] = g.groupby("fingerprint")["doc_id"].transform("min")
        return g[["doc_id", "n_tokens", "fp_group"]]

    out = (
        surv.map_batches(bucket, batch_format="pandas",
                         runtime_env=worker_runtime_env())
        .groupby("fbkt")
        .map_groups(lambda g: assign(g.drop(columns=["fbkt"])),
                    batch_format="pandas", runtime_env=worker_runtime_env())
        .to_pandas()
    )
    out["split"] = np.where(
        out["doc_id"].to_numpy(np.int64) % 100 < 80, "train", "test")
    out = out.astype({"doc_id": np.int64, "n_tokens": np.int64,
                      "fp_group": np.int64})
    return out.sort_values("doc_id").reset_index(drop=True)


def _sql_curation_pipeline() -> str:
    """Oracle: the same chain as CTEs — dedup keepers, quality gate,
    token-sequence fp_group window min (fingerprint equality == identical
    token sequence, the `fingerprint` query's documented equivalence),
    mod-100 split."""
    return f"""
WITH tokd AS (
  SELECT doc_id, text, {_sql_tok()} AS tok FROM documents
),
keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
q AS (
  SELECT doc_id, len(tok)::BIGINT AS n_tokens,
         len(list_distinct(tok))::BIGINT AS n_unique,
         array_to_string(tok, ' ') AS seq
  FROM tokd
),
surv AS (
  SELECT q.doc_id, q.n_tokens, q.seq
  FROM q JOIN keep USING (doc_id)
  WHERE q.n_tokens >= 5 AND q.n_unique >= 3
)
SELECT doc_id, n_tokens,
       min(doc_id) OVER (PARTITION BY seq) AS fp_group,
       CASE WHEN doc_id % 100 < 80 THEN 'train' ELSE 'test' END AS split
FROM surv
"""


def _q_bm25_explain(sf_dir: str):
    """Score explanation (Lucene-explain analogue): for each query's top-3
    docs (under the shared e6 rerank), the exact per-term BM25
    contributions from QueryEngine.explain — summing them in listed
    (ascending-term) order reproduces the search() score bitwise.  The
    SQL oracle restates each factor (tf, df, dl, idf, contribution) from
    first principles."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    rows = {"query_id": [], "doc_id": [], "term": [], "tf": [], "df": [],
            "dl": [], "idf_e6": [], "contrib_e6": []}
    for qid, text in enumerate(DOC_QUERIES):
        top = _e6_rerank(_hits_frame([eng.search(text, TOPK * 3 + 20)]),
                         "score", "doc_id", "score_e6").head(3)
        for d in top["doc_id"]:
            for e in eng.explain(text, int(d)):
                rows["query_id"].append(qid)
                rows["doc_id"].append(int(d))
                rows["term"].append(e["term"])
                rows["tf"].append(e["tf"])
                rows["df"].append(e["df"])
                rows["dl"].append(e["dl"])
                rows["idf_e6"].append(int(_e6(np.array([e["idf"]]))[0]))
                rows["contrib_e6"].append(
                    int(_e6(np.array([e["contribution"]]))[0]))
    out = pd.DataFrame(rows)
    for c in out.columns:
        if c != "term":
            out[c] = out[c].astype(np.int64)
    return out


def _sql_bm25_explain() -> str:
    """Explain oracle: the top-3 docs per query under the e6 rerank, then
    one row per (query, doc, present term) with every BM25 factor
    re-derived in SQL."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
topd AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
           ) rk
    FROM scored
  ) WHERE rk <= 3
)
SELECT t.query_id, t.doc_id, q.term, tf.tf, dfv.df, dl.dl,
       CAST(FLOOR(ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5)) * 1e6 + 0.5)
            AS BIGINT) AS idf_e6,
       CAST(FLOOR( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
                   * tf.tf * ({BM25_K1} + 1)
                   / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
                   * 1e6 + 0.5) AS BIGINT) AS contrib_e6
FROM topd t
JOIN q ON q.query_id = t.query_id
JOIN tf ON tf.doc_id = t.doc_id AND tf.term = q.term
JOIN dfv ON dfv.term = q.term
JOIN dl ON dl.doc_id = t.doc_id
CROSS JOIN stats s
"""


NEAR_QUERIES = [  # (two-term query, window) — 2 terms keeps the SQL oracle
    ("batch join", 3),  # a plain position cross-join (n-term needs a cover scan)
    ("customer window", 6),
    ("data filter", 4),
    ("scan batch", 8),
    ("zzzqnotfound scan", 5),
]


def _q_bm25_near(sf_dir: str):
    """Proximity (NEAR/window) search: both query terms must co-occur
    within a token window (minimal cover span <= window, positions from
    the positional index); matches score as conjunctive BM25.  The SQL
    oracle re-derives the window predicate with a position cross-join
    (min |p_a - p_b| per doc)."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir, positions=True))
    hits = [eng.search_near(t, TOPK * 3 + 20, window=w)
            for t, w in NEAR_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_after_delete(sf_dir: str):
    """Tombstone deletion (pipelines/delete.py — the reference's
    ``processed``-flag store mutation re-expressed as immutable-segment
    live-docs): docs with ``doc_id % 7 == 3`` are deleted; every search
    masks them BEFORE top-k while collection statistics (N, avgdl, df)
    stay STALE until compaction — Lucene semantics, shared with
    BruteForceBM25.  The SQL oracle states exactly that: full-corpus
    scoring with deleted docs dropped at rank time."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir_deleted(sf_dir))
    hits = [eng.search(t, TOPK * 3 + 20) for t in DOC_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_after_compact(sf_dir: str):
    """The same tombstone set folded in by ``compact_index``: shards and
    docstore rewritten without the deleted docs, N/avgdl/df REBUILT over
    the survivors (in hash mode byte-identical to a fresh filtered build,
    tested).  Against ``bm25_after_delete`` this pair pins the semantic
    line between masking (stale stats) and merging (fresh stats) — the
    SQL oracle here is plain BM25 over the filtered corpus."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir_deleted(sf_dir, compacted=True))
    hits = [eng.search(t, TOPK * 3 + 20) for t in DOC_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


DELETE_QUERY_TERMS = ("batch", "join")  # delete_by_query("batch join")


def _q_bm25_after_delete_query(sf_dir: str):
    """delete_by_query (the ES ``_delete_by_query`` maintenance op): every
    doc matching 'batch join' (OR — either term) tombstones via the
    distributed match-set scorer, then DOC_QUERIES search with stale
    statistics and the live-docs mask.  The SQL oracle restates the
    outcome with the boolean-NOT machinery: full-corpus scoring, ranked
    docs containing either deleted term dropped before top-k."""
    import shutil

    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.delete import delete_by_query
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION

    key = hashlib.sha256(str(Path(sf_dir).resolve()).encode()).hexdigest()[:12]
    idx = Path(os.environ.get("GRAFT_TMP", "/tmp")) / (
        f"horus_docidx_qdel_v{INDEX_FORMAT_VERSION}_{key}")
    marker = idx / "state.done"
    if not marker.exists():
        shutil.rmtree(idx, ignore_errors=True)  # never resume a half-mutated tree
        build_index([_docs(sf_dir)], idx,
                    PipelineConfig(num_shards=4, doc_id_mode="provided"))
        delete_by_query(idx, " ".join(DELETE_QUERY_TERMS), mode="or")
        marker.write_text("ok")
    eng = QueryEngine(str(idx))
    hits = [eng.search(t, TOPK * 3 + 20) for t in DOC_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _ttl_cutoff_us(files: list[str]) -> int:
    """Deterministic retention cutoff shared by the Ray side and the SQL
    builder: min_ts + 30% of the corpus ts span, exact int64 microsecond
    arithmetic over the SAME part files both sides read."""
    import pyarrow as _pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    t = _pq.read_table(list(files), columns=["ts"])
    v = np.asarray(_pc.cast(t["ts"], _pa.int64()), dtype=np.int64)
    lo, hi = int(v.min()), int(v.max())
    return lo + (hi - lo) * 3 // 10


def _q_bm25_after_ttl(sf_dir: str):
    """TTL / retention deletion (``delete_older_than``): every doc whose
    STORED timestamp is strictly older than the deterministic cutoff
    (min + 30% of the corpus ts span) is tombstoned via a column-pruned
    distributed docstore scan; searches mask them BEFORE top-k while
    collection statistics stay STALE (the live-docs contract shared with
    ``bm25_after_delete``).  The SQL oracle states the expected outcome
    directly: full-corpus BM25 with a rank-time ts >= cutoff filter and
    global statistics."""
    import shutil

    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.delete import delete_older_than
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_ttl_v{INDEX_FORMAT_VERSION}_{sf}"
    marker = idx / "state.done"
    if not marker.exists():
        shutil.rmtree(idx, ignore_errors=True)  # never resume a half-mutated tree
        build_index(files, idx, PipelineConfig(num_shards=8))
        delete_older_than(idx, _ttl_cutoff_us(files))
        marker.write_text("ok")
    eng = QueryEngine(str(idx))
    hits = [eng.search(q["text"], TOPK * 3 + 20) for q in reference_queries()]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_bm25_after_ttl() -> str:
    """TTL-delete oracle: the transcripts pre carries ts; ranked docs
    post-filter on ts >= cutoff (survivor set of a strict < delete) while
    every collection statistic stays full-corpus — stale-stats masking."""
    from horus_ner_ray.synth import reference_queries

    files, glob = _transcript_corpus(_oracle_sf())
    cutoff = pd.Timestamp(_ttl_cutoff_us(files), unit="us")
    lo = cutoff.strftime("%Y-%m-%d %H:%M:%S.%f")
    pre = f"""raw AS (
  SELECT conv_id, turn_idx, ts, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, ts, text
  FROM raw JOIN offs USING (conv_id)
),
"""
    return _sql_bm25([q["text"] for q in reference_queries()],
                     conjunctive=False, pre=pre,
                     ts_window=(lo, "9999-12-31 00:00:00"))


def _q_bm25_matches_export(sf_dir: str):
    """The search -> Dataset bridge (functions/export.matches_dataset):
    each query's FULL match set scored shard-by-shard inside an actor
    pool and returned as a streaming Dataset — retrieval feeding a
    pipeline, no top-k, nothing driver-materialized until this small
    driver collect.  Scores are the exhaustive exact path, so the SQL
    scored relation IS the oracle (no rank cut)."""
    from horus_ner_ray.functions.export import matches_dataset

    idx = _doc_index_dir(sf_dir)
    frames = []
    for qid, text in enumerate(DOC_QUERIES[:3]):
        df = matches_dataset(idx, text).to_pandas()
        df["query_id"] = qid
        frames.append(df)
    out = pd.concat(frames, ignore_index=True)
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("query_id", "doc_id", "score_e6")})
    out["score_e6"] = _e6(out["score"])
    return (out[["query_id", "doc_id", "score_e6"]]
            .sort_values(["query_id", "doc_id"])
            .reset_index(drop=True).astype(np.int64))


def _sql_bm25_matches_export() -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES[:3])}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, doc_id,
       CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) AS score_e6
FROM scored ORDER BY query_id, doc_id
"""


def _q_bm25_topk_fuzzy(sf_dir: str):
    """Typo-tolerant ('did you mean') search: each query token expands to
    its edit-distance-1 dictionary neighborhood (length-banded vocab scan
    + the pair-axis-vectorized DP of stages/fuzzy); the union scores as a
    plain OR.  The SQL oracle performs the same expansion with DuckDB's
    native levenshtein() over its df table."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_fuzzy(t, TOPK * 3 + 20) for t in FUZZY_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_topk_infix(sf_dir: str):
    """Infix-wildcard search (*sub*): linear dictionary scan per pattern
    (no sorted-range shortcut exists for infix — documented O(|vocab|)),
    union scored as OR.  Oracle expansion: LIKE '%sub%' over dfv."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_contains(t, TOPK * 3 + 20) for t in INFIX_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_more_like_this(sf_dir: str):
    """Query-by-example: each source doc's top tf*ln(N/df) terms (one
    docstore point-read for the forward lookup) become an OR query; the
    source drops from its own ranking.  The SQL oracle re-derives the
    same term selection from its tf/df tables — selection checked in SQL,
    not inlined."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.more_like_this(d, TOPK * 3 + 20, m_terms=MLT_TERMS)
            for d in MLT_DOC_IDS]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")



def _n_rows(path: str) -> int:
    """Parquet footer row count — free metadata, sizes the coarse shuffle
    bucket count (dedupe.buckets_for_rows) so per-group payloads stay
    bounded at any scale."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _q_exact_dedup(sf_dir: str):
    from horus_ner_ray.stages.dedupe import buckets_for_rows, exact_dedup_keep_min

    return exact_dedup_keep_min(
        _read_docs(sf_dir), n_buckets=buckets_for_rows(_n_rows(_docs(sf_dir)))
    )


def _q_quality(sf_dir: str):
    from horus_ner_ray.stages.analysis import quality_dataset

    return quality_dataset(_read_docs(sf_dir))


def _q_bpeish(sf_dir: str):
    from horus_ner_ray.stages.analysis import bpeish_count_dataset

    return bpeish_count_dataset(_read_docs(sf_dir))


def _q_events_tumbling(sf_dir: str):
    import ray.data as rd

    from horus_ner_ray.stages.windows import tumbling_window_dataset

    ds = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id", "ts", "value"])
    # val_scale: per-row e6 ints summed exactly — order-free on both sides
    # (SUM of BIGINT in the oracle), immune to float-accumulation-order ulps
    out = tumbling_window_dataset(ds, window_s=3600, val_scale=1_000_000).to_pandas()
    out["sum_value_e6"] = out["sum_value"].astype(np.int64)
    return out[["user_id", "window_start", "n_events", "sum_value_e6"]]


def _q_events_hopping(sf_dir: str):
    import ray.data as rd

    from horus_ner_ray.stages.windows import hopping_window_dataset

    ds = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id", "ts", "value"])
    out = hopping_window_dataset(ds, window_s=3600, hop_s=900,
                                 val_scale=1_000_000).to_pandas()
    out["sum_value_e6"] = out["sum_value"].astype(np.int64)
    return out[["user_id", "window_start", "n_events", "sum_value_e6"]]


def _q_tool_propagation(sf_dir: str):
    """Per-conversation forward label propagation over the synth transcript
    corpus (reference: horusdemo.py:110-126 compound->token propagation):
    each turn gets the most recent tool invocation at or before it."""
    import ray.data as rd

    from horus_ner_ray.stages.windows import propagate_last_dataset

    from horus_ner_ray.stages.dedupe import buckets_for_rows

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    n = sum(_n_rows(f) for f in files)
    ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "tool"])
    return propagate_last_dataset(ds, n_buckets=buckets_for_rows(n)).select_columns(
        ["conv_id", "turn_idx", "tool_ctx"]
    )


def _q_tool_transitions(sf_dir: str):
    """Markov tool-transition table over the transcript corpus (round 5;
    stages/windows.transition_counts_dataset): successive non-empty tool
    invocations within a conversation form (src, dst) transitions,
    counted corpus-wide — the "which tool follows which" analytic."""
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import buckets_for_rows
    from horus_ner_ray.stages.windows import transition_counts_dataset

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    n = sum(_n_rows(f) for f in files)
    ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "tool"])
    out = transition_counts_dataset(
        ds, n_buckets=buckets_for_rows(n)).to_pandas()
    return (out.astype({"n": np.int64})
            .sort_values(["src", "dst"]).reset_index(drop=True))


def _sql_tool_transitions() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    return f"""
        WITH t AS (
          SELECT conv_id, turn_idx, tool
          FROM read_parquet('{glob}') WHERE tool <> ''
        ),
        nxt AS (
          SELECT tool AS src,
                 lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst
          FROM t
        )
        SELECT src, dst, count(*)::BIGINT AS n
        FROM nxt WHERE dst IS NOT NULL GROUP BY 1, 2
    """


def _q_sessions(sf_dir: str):
    import ray.data as rd

    from horus_ner_ray.stages.windows import session_windows_dataset

    from horus_ner_ray.stages.dedupe import buckets_for_rows

    path = str(Path(sf_dir) / "events.parquet")
    ds = rd.read_parquet(path, columns=["user_id", "ts"])
    return session_windows_dataset(ds, gap_s=1800, n_buckets=buckets_for_rows(_n_rows(path)))


def _lineitem_bloom_frame(sf_dir: str, anti: bool) -> pd.DataFrame:
    """Shared semi/anti harness: bloom (prune or keep-negatives) + bucketed
    exact verify of lineitem against the 'F'-status order key DATASET (too
    large to broadcast as an array at corpus scale), then a small grouped
    count.  Exact semantics either way -> oracle-checkable."""
    import pyarrow.compute as pc_
    import ray.data as rd

    from horus_ner_ray.stages.joins import bloom_semi_join

    orders = rd.read_parquet(
        str(Path(sf_dir) / "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus"],
    ).map_batches(
        lambda b: b.filter(pc_.equal(b["o_orderstatus"], "F")).select(["o_orderkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_orderkey", "l_returnflag"])
    sj = bloom_semi_join(li, orders, big_key="l_orderkey",
                         small_key="o_orderkey", n_bits=1 << 16, anti=anti)
    out = sj.groupby("l_returnflag").count().to_pandas()
    cnt_col = [c for c in out.columns if c != "l_returnflag"][0]
    return (out.rename(columns={cnt_col: "n"})
            .astype({"n": np.int64})
            .sort_values("l_returnflag").reset_index(drop=True))


def _q_lineitem_semi_bloom(sf_dir: str):
    return _lineitem_bloom_frame(sf_dir, anti=False)


def _q_lineitem_anti_bloom(sf_dir: str):
    return _lineitem_bloom_frame(sf_dir, anti=True)


def _q_lineitem_orders_join(sf_dir: str):
    """Both-sides-large inner hash join (lineitem x orders on orderkey),
    then a small grouped rollup — the fallback when neither side fits a
    broadcast and payload columns must cross."""
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import buckets_for_rows
    from horus_ner_ray.stages.joins import hash_join_dataset

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_orderkey", "l_returnflag", "l_extendedprice"])
    li = li.map_batches(lambda b: b.rename_columns(
        ["k", "l_returnflag", "l_extendedprice"]), batch_format="pyarrow",
        zero_copy_batch=True)
    orders = rd.read_parquet(str(Path(sf_dir) / "orders.parquet"),
                             columns=["o_orderkey", "o_orderstatus"])
    orders = orders.map_batches(lambda b: b.rename_columns(
        ["k", "o_orderstatus"]), batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join_dataset(
        li, orders, key="k",
        left_cols=["l_returnflag", "l_extendedprice"],
        right_cols=["o_orderstatus"],
        n_buckets=buckets_for_rows(_n_rows(str(Path(sf_dir) / "lineitem.parquet"))),
    )

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        # per-row integer cents BEFORE summing: float sums are order-
        # dependent (Ray's block partials vs SQL's sequential scan) and the
        # discrepancy on a corpus-sized aggregate can cross any fixed
        # rounding margin; integer sums are order-free and exact forever
        g = g.assign(cents=np.floor(
            g["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64))
        return g.groupby(["l_returnflag", "o_orderstatus_r"], sort=True).agg(
            n=("k", "size"), rev_r2=("cents", "sum")).reset_index()

    # partial rollups per block -> tiny second-stage combine on the driver
    parts = j.map_batches(rollup, batch_format="pandas").to_pandas()
    out = parts.groupby(["l_returnflag", "o_orderstatus_r"], sort=True).agg(
        n=("n", "sum"), rev_r2=("rev_r2", "sum")).reset_index()
    out = out.rename(columns={"o_orderstatus_r": "o_orderstatus"})
    out["n"] = out["n"].astype(np.int64)
    out["rev_r2"] = out["rev_r2"].astype(np.int64)
    return out[["l_returnflag", "o_orderstatus", "n", "rev_r2"]]


def _q_price_quantiles(sf_dir: str):
    """Distributed exact discrete quantiles of l_extendedprice.  The small
    gather_limit forces the histogram-refinement path (the 100-TB shape:
    streaming passes + O(bins) driver state), not a gather-everything."""
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_disc

    out = quantile_disc(
        rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                        columns=["l_extendedprice"]),
        "l_extendedprice", [0.25, 0.5, 0.75], n_bins=64, gather_limit=1000,
    )
    return pd.DataFrame({
        "q_pct": (out["q"] * 100).astype(np.int64),
        "value_e6": _e6(out["value"]).astype(np.int64),
    })


def _q_tfidf(sf_dir: str):
    """Sparse TF-IDF doc vectors (feature export): one shuffle, df computed
    inside the term's own bucket group."""
    from horus_ner_ray.stages.dedupe import buckets_for_rows, salts_for_rows
    from horus_ner_ray.stages.termstats import tfidf_vectors

    n = _n_rows(_docs(sf_dir))
    out = tfidf_vectors(_read_docs(sf_dir), n_docs=n,
                        n_buckets=buckets_for_rows(n),
                        n_salts=salts_for_rows(n)).to_pandas()
    out["tfidf_e6"] = _e6(out["tfidf"])
    return (out[["doc_id", "term", "tf", "tfidf_e6"]]
            .astype({"doc_id": np.int64, "tf": np.int64, "tfidf_e6": np.int64})
            .reset_index(drop=True))


def _q_chunks(sf_dir: str):
    """Context-window chunking: docs split into <=32-token chunks."""
    from horus_ner_ray.stages.analysis import chunk_documents_dataset

    return chunk_documents_dataset(_read_docs(sf_dir), max_tokens=32)


def _q_unigram_lp(sf_dir: str):
    """CCNet-style quality score: per-doc mean unigram log-prob under the
    corpus's own MLE unigram model."""
    from horus_ner_ray.stages.dedupe import buckets_for_rows, salts_for_rows
    from horus_ner_ray.stages.termstats import unigram_logprob_vectors

    n = _n_rows(_docs(sf_dir))
    out = unigram_logprob_vectors(
        _read_docs(sf_dir), n_buckets=buckets_for_rows(n),
        n_salts=salts_for_rows(n)).to_pandas()
    out["mean_lp_e6"] = _e6(out["mean_lp"])
    return (out[["doc_id", "dl", "mean_lp_e6"]]
            .astype(np.int64)
            .sort_values("doc_id").reset_index(drop=True))


def _q_line_dedup(sf_dir: str):
    """C4-style cross-document line dedup: corpus-wide duplicate lines
    removed, docs reassembled (fully-deduped docs drop)."""
    from horus_ner_ray.stages.dedupe import (
        buckets_for_rows, remove_duplicate_lines, salts_for_rows)

    n = _n_rows(_docs(sf_dir))
    return remove_duplicate_lines(
        _read_docs(sf_dir), min_count=2,
        n_buckets=buckets_for_rows(n), n_salts=salts_for_rows(n),
    )


def _q_value_quantiles_by_type(sf_dir: str):
    """Per-group discrete quantiles of event value by event_type (the
    wide-key complement of the streaming quantile_disc)."""
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_disc_by_group

    out = quantile_disc_by_group(
        rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                        columns=["event_type", "value"]),
        key="event_type", col="value", qs=[0.25, 0.5, 0.75], n_buckets=8,
    ).to_pandas()
    out["q_pct"] = (out["q"] * 100).astype(np.int64)
    out["value_e6"] = _e6(out["value"]).astype(np.int64)
    return (out[["event_type", "q_pct", "value_e6"]]
            .sort_values(["event_type", "q_pct"]).reset_index(drop=True))


def _q_repetition(sf_dir: str):
    """Gopher/C4-style repetition counters (training-data quality gate)."""
    from horus_ner_ray.stages.analysis import repetition_stats_dataset

    return repetition_stats_dataset(_read_docs(sf_dir))


def _q_orders_topk_per_cust(sf_dir: str):
    """Generic group-wise top-k: each customer's 3 priciest orders
    (combiner pre-reduction -> coarse-bucket shuffle -> vectorized take)."""
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import buckets_for_rows
    from horus_ner_ray.stages.groupwise import topk_per_group

    path = str(Path(sf_dir) / "orders.parquet")
    out = topk_per_group(
        rd.read_parquet(path, columns=["o_custkey", "o_orderkey", "o_totalprice"]),
        key="o_custkey", sort_cols=["o_totalprice", "o_orderkey"],
        ascending=[False, True], k=3,
        n_buckets=buckets_for_rows(_n_rows(path)),
    ).to_pandas()
    # rank selection happens on the full-precision double on BOTH sides
    # (same input column), so only the published value needs e6
    out["price_e6"] = _e6(out["o_totalprice"])
    return out[["o_custkey", "o_orderkey", "price_e6"]].astype(np.int64)


def _q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: 5 documents per language by the
    SQL-shared multiplicative hash of doc_id."""
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import buckets_for_rows
    from horus_ner_ray.stages.groupwise import stratified_sample

    path = str(Path(sf_dir) / "documents.parquet")
    out = stratified_sample(
        rd.read_parquet(path, columns=["doc_id", "lang"]),
        key="lang", id_col="doc_id", n_per_group=5,
        n_buckets=buckets_for_rows(_n_rows(path)),
    ).to_pandas()
    return (out[["lang", "doc_id"]]
            .astype({"doc_id": np.int64})
            .reset_index(drop=True))


def _q_events_asof(sf_dir: str):
    """As-of join: each purchase pairs with the user's latest click at or
    before the purchase time (DuckDB ASOF JOIN semantics, inner/backward).
    Both sides large -> coarse-bucketed merge_asof, no broadcast."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import buckets_for_rows
    from horus_ner_ray.stages.joins import asof_join_dataset

    path = str(Path(sf_dir) / "events.parquet")

    def side(etype: str):
        ds = rd.read_parquet(path, columns=["event_id", "ts", "user_id", "event_type"])

        def fn(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["event_type"], etype))
            return pa.table({
                "event_id": b["event_id"],
                "ts": b["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "user_id": b["user_id"],
            })

        return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    out = asof_join_dataset(
        side("purchase"), side("click"), by="user_id", on="ts",
        left_cols=["event_id"], right_cols=["event_id"],
        n_buckets=buckets_for_rows(_n_rows(path)),
    ).to_pandas()
    out = out.rename(columns={
        "event_id": "purchase_id", "ts": "purchase_ts_us",
        "event_id_r": "click_id", "ts_r": "click_ts_us",
    })
    cols = ["user_id", "purchase_id", "purchase_ts_us", "click_id", "click_ts_us"]
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    return out[cols].astype(np.int64)


def _q_events_in_sessions(sf_dir: str):
    """Range join: tag every event with its session window (per-user
    non-overlapping intervals from session_windows_dataset).  The interval
    join composes the as-of join (latest session start <= ts) with a
    vectorized end-bound filter — exact for non-overlapping intervals."""
    import pyarrow as pa
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import buckets_for_rows
    from horus_ner_ray.stages.joins import interval_join_dataset
    from horus_ner_ray.stages.windows import session_windows_dataset

    path = str(Path(sf_dir) / "events.parquet")
    nb = buckets_for_rows(_n_rows(path))

    def to_us(col: str, out: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.set_column(
                b.column_names.index(col), out,
                b[col].cast(pa.timestamp("us")).cast(pa.int64()))
        return fn

    sessions = session_windows_dataset(
        rd.read_parquet(path, columns=["user_id", "ts"]), gap_s=1800,
        n_buckets=nb,
    ).map_batches(
        to_us("session_start", "start_us"), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        to_us("session_end", "end_us"), batch_format="pyarrow", zero_copy_batch=True
    )
    points = rd.read_parquet(path, columns=["event_id", "ts", "user_id"]).map_batches(
        to_us("ts", "ts"), batch_format="pyarrow", zero_copy_batch=True
    )
    out = interval_join_dataset(
        points, sessions, by="user_id", on="ts", lo="start_us", hi="end_us",
        left_cols=["event_id"], right_cols=["n_events"], n_buckets=nb,
    ).to_pandas()
    out = out.rename(columns={
        "ts": "ts_us", "start_us_r": "session_start_us",
        "end_us_r": "session_end_us", "n_events_r": "n_events",
    })
    cols = ["user_id", "event_id", "ts_us", "session_start_us",
            "session_end_us", "n_events"]
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    return out[cols].astype(np.int64)


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.stages.similarity import ann_topk_bruteforce

    path = str(Path(sf_dir) / "embeddings.parquet")
    qt = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    # fetch a padded candidate set (3k+20, mirroring _bm25_topk_frame) so an
    # e6 tie at the rank-k boundary resolves by the oracle's (e6 desc,
    # vec_id asc) order, not by full-precision order
    res = ann_topk_bruteforce(
        rd.read_parquet(path),
        qt["vec_id"].to_numpy(np.int64),
        np.array(qt["embedding"].tolist(), dtype=np.float64),
        k=TOPK * 3 + 20,
    )
    # integer-rounded rerank to match the SQL oracle exactly
    return _e6_rerank(res, "cosine", "vec_id", "cosine_e6")


def _q_sq_ann(sf_dir: str):
    """Scalar-quantization ANN (stages/sq.py — FAISS SQ8 / Lucene int8
    quantization): per-dimension min/max fit, 8-bit codes via one shared
    float64 floor/clamp expression, EXACT int64 squared-L2 ranking over
    the codes (dist asc, vec_id asc) — the whole publication is
    integers.  SQL restates the fit, the quantization expression and the
    integer distances over the unnested dimension table."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.stages.sq import sq_ann

    path = str(Path(sf_dir) / "embeddings.parquet")
    qt = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    return sq_ann(rd.read_parquet(path),
                  qt["vec_id"].to_numpy(np.int64),
                  np.array(qt["embedding"].tolist(), dtype=np.float64),
                  k=TOPK)


def _sql_sq_ann() -> str:
    code = ("LEAST(255, GREATEST(0, CAST(FLOOR((x - mn) / den * 255 + 0.5)"
            " AS BIGINT)))")
    return f"""
WITH dims AS (
  SELECT vec_id,
         unnest(CAST(embedding AS DOUBLE[])) AS x,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings
),
mm AS (
  SELECT d, min(x) mn, max(x) mx,
         CASE WHEN max(x) = min(x) THEN 1.0 ELSE max(x) - min(x) END den
  FROM dims GROUP BY 1
),
codes AS (
  SELECT dims.vec_id, dims.d, {code} AS c
  FROM dims JOIN mm USING (d)
),
qc AS (SELECT vec_id AS query_id, d, c FROM codes WHERE vec_id < 5),
dist AS (
  SELECT qc.query_id, codes.vec_id,
         sum((qc.c - codes.c) * (qc.c - codes.c))::BIGINT AS dist
  FROM qc JOIN codes USING (d)
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist, vec_id) rk
  FROM dist
)
SELECT query_id, rk AS rank, vec_id, dist FROM ranked WHERE rk <= {TOPK}
"""


def _q_ann_filtered(sf_dir: str):
    """FILTERED vector search (ES ``knn`` with ``filter``; pre-filter
    semantics): each query vector's exact cosine top-k restricted to
    vectors sharing ITS OWN label — the predicate masks inside each batch
    BEFORE the partial top-k, so the result is exactly top-k of the
    filtered universe.  Oracle: the cosine cross-join with the same
    equality predicate."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.stages.similarity import ann_topk_bruteforce

    path = str(Path(sf_dir) / "embeddings.parquet")
    qt = pq.read_table(
        path, columns=["vec_id", "embedding", "label"]).to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    res = ann_topk_bruteforce(
        rd.read_parquet(path),
        qt["vec_id"].to_numpy(np.int64),
        np.array(qt["embedding"].tolist(), dtype=np.float64),
        k=TOPK * 3 + 20,
        filter_col="label",
        query_filter_vals=qt["label"].to_numpy(np.int64),
    )
    return _e6_rerank(res, "cosine", "vec_id", "cosine_e6")


def _q_embedding_dups(sf_dir: str):
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import embedding_dup_pairs

    # exact=True is the documented oracle harness (DuckDB all-pairs SQL);
    # the library default is the banded-LSH scale path
    out = embedding_dup_pairs(
        rd.read_parquet(str(Path(sf_dir) / "embeddings.parquet")), threshold=0.4,
        exact=True,
    ).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype=np.int64) for c in ("doc_a", "doc_b", "cosine_e6")}
        )
    out["cosine_e6"] = _e6(out["cosine"])
    return out[["doc_a", "doc_b", "cosine_e6"]].astype(np.int64)


def _q_embedding_dups_lsh(sf_dir: str):
    """The banded sign-LSH SCALE path (exact=False — the code a cluster
    actually runs; round-4 verdict item): candidates share >=1 band's full
    signature, verified with the exact cosine.  The oracle replicates the
    LSH itself in SQL (hyperplane constants inlined, signatures via
    list_dot_product sign bits), so rows+hash compare the genuine
    candidate generation, not just a containment bound."""
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import embedding_dup_pairs

    out = embedding_dup_pairs(
        rd.read_parquet(str(Path(sf_dir) / "embeddings.parquet")),
        threshold=0.4, seed=42, planes=8, bands=4,
    ).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype=np.int64) for c in ("doc_a", "doc_b", "cosine_e6")}
        )
    out["cosine_e6"] = _e6(out["cosine"])
    return out[["doc_a", "doc_b", "cosine_e6"]].astype(np.int64)


def _sql_embedding_lsh(threshold: float = 0.4, seed: int = 42,
                       planes: int = 8, bands: int = 4, dim: int = 64) -> str:
    """SQL replica of the banded sign-LSH: the same seeded hyperplanes the
    library draws (np.random.RandomState(seed).normal(size=(dim, b*p)))
    are inlined as DOUBLE[] constants; sign(raw dot) == sign(normalized
    dot) since norms are positive, so both sides state the same predicate.

    Known fragility (accepted, documented): numpy's matmul dot (blocked /
    pairwise summation) and DuckDB's list_dot_product (sequential
    summation) can differ in the last ulps, so a dot product straddling
    zero within ~1e-13 of the boundary could flip one signature bit on one
    side only.  Quantizing before the sign test would merely relocate the
    boundary, not remove it — two different summation orders always have
    one.  Against seeded N(0,1) hyperplanes the dot is a continuous
    variable with density ~O(1) near 0, so a flip needs |dot| below the
    cross-implementation ulp gap (~1e-13 relative): probability ~1e-13 per
    (vector, plane) pair, ~1e-8 over this corpus family's full sweep.  If
    a future sf/seed ever trips it, regenerate with a different seed and
    note the collision here."""
    rng = np.random.RandomState(seed)
    hp = rng.normal(size=(dim, bands * planes))
    vals = ", ".join(
        f"({j}, [" + ", ".join(repr(float(x)) for x in hp[:, j]) + "]::DOUBLE[])"
        for j in range(bands * planes)
    )
    return f"""
        WITH hp(j, h) AS (VALUES {vals}),
        sig AS (
          SELECT e.vec_id, hp.j // {planes} AS band,
                 SUM(CASE WHEN list_dot_product(
                              CAST(e.embedding AS DOUBLE[]), hp.h) > 0
                          THEN CAST(1 AS BIGINT) << (hp.j % {planes})
                          ELSE 0 END) AS sigv
          FROM embeddings e CROSS JOIN hp
          GROUP BY e.vec_id, hp.j // {planes}
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
          FROM sig a JOIN sig b
            ON a.band = b.band AND a.sigv = b.sigv AND a.vec_id < b.vec_id
        )
        SELECT c.doc_a, c.doc_b,
               CAST(FLOOR(list_cosine_similarity(
                     CAST(ea.embedding AS DOUBLE[]),
                     CAST(eb.embedding AS DOUBLE[])) * 1e6 + 0.5) AS BIGINT)
                 AS cosine_e6
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.doc_a
        JOIN embeddings eb ON eb.vec_id = c.doc_b
        WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                     CAST(eb.embedding AS DOUBLE[]))
              >= {threshold}
    """


def _doc_vocab_hash_values() -> str:
    """(term, hash64) VALUES rows for the full tokenizer vocabulary of the
    oracle sf's documents table (31 terms on the synth corpus family) —
    the seeded-constant-inlining precedent of ``_sql_embedding_lsh``: the
    one non-SQL primitive (pandas' SipHash in ``dedupe._hash_strings``) is
    evaluated in Python over the closed vocabulary and inlined; every
    downstream step (shingle polynomial, permutations, banding, bit votes)
    is restated in SQL proper."""
    import re

    import pyarrow.parquet as pq

    from horus_ner_ray.stages.dedupe import _hash_strings

    path = f"/root/testdata/sf{_oracle_sf()}/documents.parquet"
    vocab: set[str] = set()
    for s in pq.read_table(path, columns=["text"])["text"].to_pylist():
        vocab.update(re.findall(_TOKRE, s.lower()))
    terms = sorted(vocab)
    h = _hash_strings(np.asarray(terms, dtype=object))
    return ", ".join(f"('{w}', {int(x)}::UBIGINT)" for w, x in zip(terms, h))


def _sql_simhash() -> str:
    """SQL replica of ``dedupe.simhash_signatures``: per doc, every token
    OCCURRENCE votes +1/-1 on each of 64 bits of its term hash; bit j of
    the signature is set iff the vote sum is strictly positive; zero-token
    docs get signature 0.  Term hashes come from ``_doc_vocab_hash_values``
    (inlined seeded constants); the uint64 signature is re-signed to the
    engine's int64 view via the two's-complement CASE."""
    return f"""
        WITH th(term, h) AS (VALUES {_doc_vocab_hash_values()}),
        tok AS (
          SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
        ),
        bits AS (SELECT unnest(generate_series(0, 63)) AS bit),
        votes AS (
          SELECT t.doc_id, b.bit,
                 sum(CASE WHEN (th.h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM tok t JOIN th USING (term) CROSS JOIN bits b
          GROUP BY 1, 2
        ),
        sigu AS (
          SELECT doc_id,
                 sum(CASE WHEN v > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS s
          FROM votes GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(CASE WHEN coalesce(g.s, 0) >= (1::HUGEINT << 63)
                         THEN coalesce(g.s, 0) - (1::HUGEINT << 64)
                         ELSE coalesce(g.s, 0) END AS BIGINT) AS simhash
        FROM documents d LEFT JOIN sigu g USING (doc_id)
    """


def _sql_minhash_pairs(max_bucket: int = 200) -> str:
    """SQL replica of ``dedupe.minhash_candidate_pairs`` (default config:
    64 perms x 16 bands x 4 rows, k=3 word shingles).  All mod-2^64
    wraparound arithmetic (the shingle polynomial ``sh*MIX + th`` and the
    band fold) is restated exactly with a 32-bit-split multiply in HUGEINT
    (``a*MIX mod 2^64`` = hi-cross terms mod 2^32, shifted, plus lo*lo);
    the (a_p*x + b_p) universal hash wraps mod 2^64 BEFORE the Mersenne
    mod, matching numpy's uint64 overflow semantics.  Sentinels: 0-token
    docs shingle to 0xDEAD, 1-2-token docs to hash(first)*MIX.  Pair
    emission replicates the deterministic ``max_bucket`` smallest-doc-ids
    truncation and the cross-band distinct.  Seeded constants inlined:
    term hashes (``_doc_vocab_hash_values``) and the RandomState(seed)
    permutation params — the ``_sql_embedding_lsh`` precedent."""
    from horus_ner_ray.stages.dedupe import _MERSENNE, _MIX, _minhash_params

    cfg = PipelineConfig()
    a, b = _minhash_params(cfg)
    rpb = cfg.rows_per_band()
    assert rpb == 4, "SQL band-fold pivot is written for rows_per_band == 4"
    perm_vals = ", ".join(
        f"({p}, {int(a[p])}::HUGEINT, {int(b[p])}::HUGEINT)"
        for p in range(cfg.minhash_perms)
    )
    mix = int(_MIX)
    mers = int(_MERSENNE)
    m64 = 1 << 64
    bl, bh = mix & 0xFFFFFFFF, mix >> 32

    def mul64(col: str) -> str:
        # (col * MIX) mod 2^64 for col in [0, 2^64): split MIX into 32-bit
        # halves so no intermediate product exceeds HUGEINT's 2^127 range
        return (
            f"((((({col} >> 32) * {bl} + ({col} & 4294967295) * {bh}) % 4294967296)"
            f" * 4294967296 + ({col} & 4294967295) * {bl}) % {m64})"
        )

    return f"""
        WITH th(term, h) AS (VALUES {_doc_vocab_hash_values()}),
        perms(p, pa, pb) AS (VALUES {perm_vals}),
        arrs AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
        tokh AS (
          SELECT a.doc_id, i.i, th.h::HUGEINT AS h
          FROM arrs a, unnest(generate_series(1, len(a.arr))) AS i(i)
          JOIN th ON th.term = a.arr[i.i]
        ),
        w1 AS (
          SELECT t0.doc_id, t0.i, ({mul64('t0.h')} + t1.h) % {m64} AS v
          FROM tokh t0 JOIN tokh t1 ON t1.doc_id = t0.doc_id AND t1.i = t0.i + 1
        ),
        w2 AS (
          SELECT w1.doc_id, ({mul64('w1.v')} + t2.h) % {m64} AS sh
          FROM w1 JOIN tokh t2 ON t2.doc_id = w1.doc_id AND t2.i = w1.i + 2
        ),
        lens AS (SELECT doc_id, len(arr) AS n, arr FROM arrs),
        sent AS (
          SELECT doc_id, 57005::HUGEINT AS sh FROM lens WHERE n = 0
          UNION ALL
          SELECT l.doc_id, {mul64('th.h::HUGEINT')} AS sh
          FROM lens l JOIN th ON th.term = l.arr[1] WHERE l.n > 0 AND l.n < 3
        ),
        shing AS (
          SELECT DISTINCT doc_id, sh
          FROM (SELECT doc_id, sh FROM w2 UNION ALL SELECT doc_id, sh FROM sent)
        ),
        hx AS (
          SELECT s.doc_id, pr.p,
                 (((pr.pa * (s.sh % {mers})) % {m64} + pr.pb) % {m64}) % {mers} AS v
          FROM shing s CROSS JOIN perms pr
        ),
        sig AS (SELECT doc_id, p, min(v) AS v FROM hx GROUP BY 1, 2),
        piv AS (
          SELECT doc_id, p // {rpb} AS band,
                 max(CASE WHEN p % {rpb} = 0 THEN v END) AS s0,
                 max(CASE WHEN p % {rpb} = 1 THEN v END) AS s1,
                 max(CASE WHEN p % {rpb} = 2 THEN v END) AS s2,
                 max(CASE WHEN p % {rpb} = 3 THEN v END) AS s3
          FROM sig GROUP BY 1, 2
        ),
        f1 AS (SELECT doc_id, band, s2, s3, ({mul64('s0')} + s1) % {m64} AS acc FROM piv),
        f2 AS (SELECT doc_id, band, s3, ({mul64('acc')} + s2) % {m64} AS acc FROM f1),
        f3 AS (SELECT doc_id, band, ({mul64('acc')} + s3) % {m64} AS bh FROM f2),
        ranked AS (
          SELECT band, bh, doc_id,
                 row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rk
          FROM f3
        ),
        kept AS (SELECT * FROM ranked WHERE rk <= {max_bucket})
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM kept x JOIN kept y
          ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
    """


# --- rows-only checks (non-SQL-expressible; see SURVEY.md section 5) -------


def _q_orders_by_segment(sf_dir: str):
    """Broadcast inner join (SURVEY.md J1): orders ⨝ customer (small side
    broadcast via ray.put, vectorized searchsorted per batch) -> combiner
    pre-aggregation -> tiny groupby on market segment."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages.joins import broadcast_inner_join
    from horus_ner_ray.util import worker_runtime_env

    cust = pq.read_table(
        str(Path(sf_dir) / "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    orders = rd.read_parquet(
        str(Path(sf_dir) / "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    joined = broadcast_inner_join(orders, cust, "o_custkey", "c_custkey")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("c_mktsegment", use_threads=False).aggregate(
            [([], "count_all"), ("o_totalprice", "sum")]
        )
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "n_orders": g["count_all"],
                "total": g["o_totalprice_sum"],
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None, runtime_env=worker_runtime_env())
        .groupby("c_mktsegment")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("total", alias_name="total"))
        .to_pandas()
    )
    # totals are ~1e8: whole-unit rounding keeps the int well inside double
    # ulp; *_e6 here would flip on summation-order ulps
    agg["total_r"] = np.floor(agg["total"].to_numpy(dtype=np.float64) + 0.5).astype(np.int64)
    agg["n_orders"] = agg["n_orders"].astype(np.int64)
    return agg[["c_mktsegment", "n_orders", "total_r"]]


def _q_orders_anti_join(sf_dir: str):
    """Broadcast ANTI join: orders whose customer has negative account
    balance are excluded; returns the surviving order count per status."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.stages.joins import broadcast_semi_join
    from horus_ner_ray.stages.termstats import _explode_pairs  # noqa: F401 (module warm)

    cust = pq.read_table(
        str(Path(sf_dir) / "customer.parquet"), columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    bad = cust[cust.c_acctbal < 0]["c_custkey"].to_numpy()
    orders = rd.read_parquet(
        str(Path(sf_dir) / "orders.parquet"), columns=["o_custkey", "o_orderstatus"]
    )
    kept = broadcast_semi_join(orders, bad, "o_custkey", anti=True)
    out = kept.groupby("o_orderstatus").count().to_pandas()
    out.columns = ["o_orderstatus", "n"]
    out["n"] = out["n"].astype(np.int64)
    return out


def _q_bm25_corrected(sf_dir: str):
    """'Did you mean' search: absent query terms rewrite to their best
    spell suggestion under the suggest contract (distance asc, df desc,
    term asc — integer keys, deterministic), then the corrected set runs
    as a plain OR query.  The SQL performs the SAME rewrite itself
    (levenshtein + row_number over dfv), so the correction rule — not an
    inlined expansion — is what's checked."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    hits = [eng.search_corrected(t, TOPK * 3 + 20)[1]
            for t in CORRECTED_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_bm25_corrected() -> str:
    import re

    rows = []
    for qid, t in enumerate(CORRECTED_QUERIES):
        for term in sorted(set(re.findall(_TOKRE, t.lower()))):
            rows.append(f"({qid}, '{term}')")
    vals = ", ".join(rows)
    q_sql = f"""
SELECT DISTINCT query_id, term FROM (
  SELECT r.query_id, r.term
  FROM (VALUES {vals}) r(query_id, term) JOIN dfv USING (term)
  UNION ALL
  SELECT query_id, term FROM (
    SELECT a.query_id, a.orig, d.term,
           row_number() OVER (
             PARTITION BY a.query_id, a.orig
             ORDER BY levenshtein(a.orig, d.term), d.df DESC, d.term) rn
    FROM (SELECT r2.query_id, r2.term AS orig
          FROM (VALUES {vals}) r2(query_id, term)
          WHERE NOT EXISTS (SELECT 1 FROM dfv dd WHERE dd.term = r2.term)) a
    JOIN dfv d ON levenshtein(a.orig, d.term) <= 2
  ) WHERE rn = 1
)"""
    return _sql_bm25([], conjunctive=False, q_sql=q_sql)


# relaxation-cascade queries: one per tier + one all-empty
RELAX_QUERIES = ["batch join",            # AND matches -> tier 'and'
                 "batch zzzqnotfound",    # AND empty -> tier 'or'
                 "batcj joib",            # OR empty -> tier 'corrected'
                 "qqqqqqzz"]              # nothing anywhere -> no rows


def _q_bm25_relaxed(sf_dir: str):
    """Zero-results relaxation cascade: strict AND, then OR, then the
    'did you mean' corrected query — first non-empty tier wins.  The SQL
    re-derives all three rankings over the shared scoring core and picks
    the minimum non-empty tier per query."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    rows = {"query_id": [], "tier": [], "doc_id": [], "score": []}
    for qid, t in enumerate(RELAX_QUERIES):
        tier, hits = eng.search_relaxed(t, k=TOPK * 3 + 20)
        for d, s in hits:
            rows["query_id"].append(qid)
            rows["tier"].append(tier)
            rows["doc_id"].append(d)
            rows["score"].append(s)
    df = pd.DataFrame(rows)
    out = _e6_rerank(df, "score", "doc_id", "score_e6")
    tmap = df.drop_duplicates("query_id").set_index("query_id")["tier"]
    out["tier"] = out["query_id"].map(tmap)
    return out


def _sql_bm25_relaxed() -> str:
    import re

    vals = ", ".join(
        f"({qid}, '{term}')"
        for qid, t in enumerate(RELAX_QUERIES)
        for term in sorted(set(re.findall(_TOKRE, t.lower()))))
    corr_q = f"""
SELECT DISTINCT query_id, term FROM (
  SELECT r.query_id, r.term
  FROM qraw r JOIN dfv USING (term)
  UNION ALL
  SELECT query_id, term FROM (
    SELECT a.query_id, a.orig, d.term,
           row_number() OVER (
             PARTITION BY a.query_id, a.orig
             ORDER BY levenshtein(a.orig, d.term), d.df DESC, d.term) rn
    FROM (SELECT r2.query_id, r2.term AS orig FROM qraw r2
          WHERE NOT EXISTS (SELECT 1 FROM dfv dd WHERE dd.term = r2.term)) a
    JOIN dfv d ON levenshtein(a.orig, d.term) <= 2
  ) WHERE rn = 1
)"""

    def scored(name: str, qrel: str, conj: bool) -> str:
        having = ("HAVING count(*) = any_value(qn.nt)" if conj else "")
        join_nt = ("JOIN (SELECT query_id, count(*) nt FROM qraw "
                   "GROUP BY query_id) qn USING (query_id)" if conj else "")
        return f"""
{name} AS (
  SELECT q.query_id, tf.doc_id,
         CAST(FLOOR(sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) )
              * 1e6 + 0.5) AS BIGINT) score_e6
  FROM {qrel} q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  {join_nt}
  GROUP BY q.query_id, tf.doc_id
  {having}
)"""

    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
qraw(query_id, term) AS (VALUES {vals}),
qcorr AS ({corr_q}),
{scored("sc_and", "qraw", True).lstrip()},
{scored("sc_or", "qraw", False).lstrip()},
{scored("sc_corr", "qcorr", False).lstrip()},
alltiers AS (
  SELECT 1 AS t, 'and' AS tier, query_id, doc_id, score_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_e6 DESC, doc_id) rk
  FROM sc_and
  UNION ALL
  SELECT 2, 'or', query_id, doc_id, score_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_e6 DESC, doc_id) rk
  FROM sc_or
  UNION ALL
  SELECT 3, 'corrected', query_id, doc_id, score_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_e6 DESC, doc_id) rk
  FROM sc_corr
),
best AS (SELECT query_id, min(t) t FROM alltiers GROUP BY 1)
SELECT a.query_id, a.rank, a.doc_id, a.score_e6, a.tier FROM (
  SELECT alltiers.*, rk AS rank FROM alltiers
  JOIN best USING (query_id) WHERE alltiers.t = best.t
) a WHERE a.rank <= {TOPK}
"""


RESCORE_WINDOW = 20


def _q_bm25_rescore(sf_dir: str):
    """Two-phase rescoring (Lucene Rescorer / ES rescore window): the
    BM25 top-20 window reranks by Dirichlet query likelihood.  Window
    selection AND the final rerank run in the e6 integer domain on both
    sides (the library's float-domain rescore_lm is brute-force-parity
    tested in tests/test_rescore.py); the LM leg reuses lm_topk's
    np.log-vs-SQL-ln agreement."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    out = []
    for qid, text in enumerate(DOC_QUERIES):
        cand = eng.search(text, k=RESCORE_WINDOW * 3 + 20)
        if not cand:
            continue
        df = pd.DataFrame({"doc_id": [d for d, _ in cand],
                           "score": [s for _, s in cand]})
        df["bm_e6"] = _e6(df["score"])
        win = df.sort_values(["bm_e6", "doc_id"], ascending=[False, True],
                             kind="stable").head(RESCORE_WINDOW)
        lm = eng.lm_scores(text, win["doc_id"].tolist(), mu=LM_MU)
        g = pd.DataFrame({
            "doc_id": win["doc_id"].to_numpy(np.int64),
            "lm_e6": _e6(np.array([lm[int(d)] for d in win["doc_id"]])),
        }).sort_values(["lm_e6", "doc_id"], ascending=[False, True],
                       kind="stable").head(TOPK)
        g = g.assign(query_id=qid, rank=np.arange(1, len(g) + 1))
        out.append(g[["query_id", "rank", "doc_id", "lm_e6"]])
    res = pd.concat(out, ignore_index=True)
    return res.astype(np.int64)


# binary-exact quantiles only (0.9 * n in float can cross an integer the
# exact 9n/10 doesn't; powers of two can't) — the SQL computes
# k = (pct*n + 99) // 100 in integers, equal iff q is float-exact
_PCT_POINTS = [(25, 0.25), (50, 0.5), (75, 0.75)]


def _q_ts_percentiles(sf_dir: str):
    """EXACT match-set percentiles (the ES percentiles aggregation,
    exact instead of t-digest): percentile_disc semantics (k-th smallest
    stored ts, k = ceil(q*n)), computed by distributed histogram
    refinement — per round one mergeable count vector per shard, values
    never leave their shards.  The SQL sorts the match set and picks
    row_number == (pct*n+99)//100."""
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.synth import reference_queries

    eng = QueryEngine(_tr_index_dir(sf_dir))
    rows = {"query_id": [], "pct": [], "n": [], "value": []}
    for qid, t in enumerate(q["text"] for q in reference_queries()):
        for pct, qf in _PCT_POINTS:
            r = eng.field_percentile(t, q=qf)
            rows["query_id"].append(qid)
            rows["pct"].append(pct)
            rows["n"].append(r["count"])
            rows["value"].append(r["value"])
    return pd.DataFrame(rows).astype(np.int64)


def _sql_ts_percentiles() -> str:
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    texts = [q["text"] for q in reference_queries()]
    pcts = ", ".join(f"({p})" for p, _ in _PCT_POINTS)
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, ts, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
docs AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, ts, text
  FROM raw JOIN offs USING (conv_id)
),
tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM docs),
q(query_id, term) AS (VALUES {_sql_values_queries(texts)}),
qids AS (SELECT DISTINCT query_id FROM q),
pcts(pct) AS (VALUES {pcts}),
m AS (SELECT DISTINCT q.query_id, tok.doc_id FROM q JOIN tok USING (term)),
v AS (
  SELECT m.query_id, epoch_us(d.ts)::BIGINT AS ts_us,
         row_number() OVER (PARTITION BY m.query_id
                            ORDER BY epoch_us(d.ts)::BIGINT) AS rn,
         count(*) OVER (PARTITION BY m.query_id) AS n
  FROM m JOIN docs d ON d.doc_id = m.doc_id
  WHERE d.ts IS NOT NULL
),
hit AS (
  SELECT v.query_id, p.pct, v.n, v.ts_us
  FROM v JOIN pcts p
    ON v.rn = greatest(1, (p.pct * v.n + 99) // 100)
)
SELECT qids.query_id, p.pct::BIGINT AS pct,
       coalesce(h.n, 0)::BIGINT AS n,
       coalesce(h.ts_us, 0)::BIGINT AS value
FROM qids CROSS JOIN pcts p
LEFT JOIN hit h ON h.query_id = qids.query_id AND h.pct = p.pct
"""


def _q_conversion_times(sf_dir: str):
    """Funnel time-to-convert (stages/funnel.conversion_delays): per
    converting user the microseconds from their first 'click' to the
    first 'purchase' strictly after it ((ts, event_id) lexicographic
    order, the funnel_counts contract).  SQL restates first-A / first-B
    with row_number windows."""
    import ray.data as rd

    from horus_ner_ray.stages.funnel import conversion_delays

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["event_id", "user_id", "event_type",
                                  "ts"])
    return (conversion_delays(ev, "click", "purchase")
            .to_pandas().astype(np.int64)
            .sort_values("user_id").reset_index(drop=True))


_SQL_CONVERSION_TIMES = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts)::BIGINT AS t
  FROM events
),
fa AS (
  SELECT user_id, t, event_id FROM (
    SELECT user_id, t, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY t, event_id) AS rn
    FROM e WHERE event_type = 'click'
  ) WHERE rn = 1
),
fb AS (
  SELECT user_id, t AS tb FROM (
    SELECT b.user_id, b.t,
           row_number() OVER (PARTITION BY b.user_id
                              ORDER BY b.t, b.event_id) AS rn
    FROM e b JOIN fa ON fa.user_id = b.user_id
    WHERE b.event_type = 'purchase'
      AND (b.t > fa.t OR (b.t = fa.t AND b.event_id > fa.event_id))
  ) WHERE rn = 1
)
SELECT fa.user_id, (fb.tb - fa.t)::BIGINT AS delta_us
FROM fa JOIN fb USING (user_id)
ORDER BY user_id
"""


_SUBSTR_PROBES = ["error", "scan", "data st", "Batch", "zzq"]


def _q_substring_counts(sf_dir: str):
    """Raw-substring occurrence counts (CASE-SENSITIVE, non-overlapping
    left-to-right — Arrow's count_substring == SQL's replace-length
    trick): per probe, total occurrences and matching-doc count over
    the RAW text (no tokenizer) — the grep-style probe the tokenized
    index can't answer (multi-word and case-sensitive probes
    included)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from horus_ner_ray.util import worker_runtime_env

    docs = rd.read_parquet(_docs(sf_dir), columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        rows = {"probe": [], "n_occ": [], "n_docs": []}
        for p in _SUBSTR_PROBES:
            c = pc.count_substring(batch["text"], p)
            cv = np.asarray(c, dtype=np.int64)
            rows["probe"].append(p)
            rows["n_occ"].append(int(cv.sum()))
            rows["n_docs"].append(int((cv > 0).sum()))
        return pa.table({"probe": pa.array(rows["probe"], pa.string()),
                         "n_occ": pa.array(rows["n_occ"], pa.int64()),
                         "n_docs": pa.array(rows["n_docs"], pa.int64())})

    out = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True,
                            runtime_env=worker_runtime_env())
           .groupby("probe")
           .aggregate(Sum("n_occ", alias_name="n_occ"),
                      Sum("n_docs", alias_name="n_docs"))
           .to_pandas().sort_values("probe").reset_index(drop=True))
    for c in ("n_occ", "n_docs"):
        out[c] = out[c].astype(np.int64)
    return out


def _sql_substring_counts() -> str:
    rows = []
    for p in _SUBSTR_PROBES:
        esc = p.replace("'", "''")
        rows.append(f"""
  SELECT '{esc}' AS probe,
         sum((length(text) - length(replace(text, '{esc}', '')))
             // {len(p)})::BIGINT AS n_occ,
         count(*) FILTER (text LIKE '%' || '{esc}' || '%')::BIGINT
           AS n_docs
  FROM documents""")
    return " UNION ALL ".join(rows) + " ORDER BY probe"


_TDI_K = 10
_TDI_SEED = 7


def _tdi_schedule(qid: int, k: int) -> list[str]:
    """The team-draft coin schedule — a pure function of (qid, round,
    seed), precomputed identically for the Ray run and the SQL builder
    (the engine test pins the splitmix64 rule)."""
    from horus_ner_ray.stages.sketches import splitmix64

    teams = []
    for i in range(2 * k):
        rnd = i // 2
        h = int(splitmix64(np.array(
            [np.uint64(qid * 1024 + rnd) ^ np.uint64(_TDI_SEED)],
            dtype=np.uint64))[0])
        first = "a" if h % 2 == 0 else "b"
        teams.append(first if i % 2 == 0 else
                     ("b" if first == "a" else "a"))
    return teams


def _q_interleaved(sf_dir: str):
    """Team-draft interleaving (stages/evalmetrics
    team_draft_interleave): the BM25 e6-top-10 (team a) mixed with the
    Dirichlet-LM e6-top-10 (team b) under the deterministic splitmix64
    coin schedule — the online-eval mixer.  SQL replays the picks as an
    unrolled NOT-IN chain under the same precomputed schedule."""
    from horus_ner_ray.stages.evalmetrics import team_draft_interleave

    bm = _bm25_topk_frame(sf_dir, DOC_QUERIES, "or")
    lm = _q_lm_topk(sf_dir)
    rows = {"query_id": [], "rank": [], "doc_id": [], "team": []}
    for qid in range(len(DOC_QUERIES)):
        a = bm.loc[bm["query_id"] == qid].sort_values("rank")[
            "doc_id"].tolist()
        b = lm.loc[lm["query_id"] == qid].sort_values("rank")[
            "doc_id"].tolist()
        for r, d, t in team_draft_interleave(a, b, qid, k=_TDI_K,
                                             seed=_TDI_SEED):
            rows["query_id"].append(qid)
            rows["rank"].append(r)
            rows["doc_id"].append(d)
            rows["team"].append(t)
    out = pd.DataFrame(rows)
    return out.astype({c: np.int64 for c in ("query_id", "rank",
                                             "doc_id")})


def _sql_interleaved() -> str:
    ctes = []
    selects = []
    for qid in range(len(DOC_QUERIES)):
        sched = _tdi_schedule(qid, _TDI_K)
        prev: list[str] = []
        for i, team in enumerate(sched):
            src = "bm" if team == "a" else "lmr"
            notin = (f"AND doc_id NOT IN (SELECT doc_id FROM "
                     f"({' UNION ALL '.join(f'SELECT doc_id FROM {p}' for p in prev)}))"
                     if prev else "")
            name = f"s{qid}_{i}"
            # MATERIALIZED is load-bearing: later steps' NOT-IN chains
            # reference every earlier step — inlined CTEs re-execute
            # exponentially (the pq_codes lesson)
            ctes.append(f"""
{name} AS MATERIALIZED (
  SELECT {qid} AS query_id, doc_id, {i} AS step, '{team}' AS team
  FROM {src} WHERE query_id = {qid} {notin}
  ORDER BY rank LIMIT 1
)""")
            prev.append(name)
        selects.extend(f"SELECT * FROM s{qid}_{i}"
                       for i in range(len(sched)))
    return f"""
WITH bm AS MATERIALIZED ({_sql_bm25(DOC_QUERIES, conjunctive=False)}),
lmr AS MATERIALIZED ({_sql_lm_topk()}),
{",".join(ctes)},
allp AS ({" UNION ALL ".join(selects)}),
ranked AS (
  SELECT query_id, doc_id, team,
         row_number() OVER (PARTITION BY query_id ORDER BY step) AS rank
  FROM allp
)
SELECT query_id, rank, doc_id, team FROM ranked
WHERE rank <= {_TDI_K}
ORDER BY query_id, rank
"""


_CHURN_IV = 86_400_000_000  # daily buckets


def _q_bucket_churn(sf_dir: str):
    """Per-day churn (stages/cohort.bucket_churn): active users per day,
    retained = also active the NEXT day (strict adjacency), churned =
    active - retained.  Distinct (day, user) pairs from a combiner;
    coarse user groups vectorize the adjacency flag.  SQL: distinct
    pairs LEFT JOINed to their next-day row."""
    import ray.data as rd

    from horus_ner_ray.stages.cohort import bucket_churn

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id", "ts"])
    out = (bucket_churn(ev, _CHURN_IV).to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    out["n_churned"] = out["n_active"] - out["n_retained"]
    return out.astype(np.int64)


_SQL_BUCKET_CHURN = f"""
WITH p AS (
  SELECT DISTINCT user_id,
         ((epoch_us(ts)
           - ((epoch_us(ts) % {_CHURN_IV} + {_CHURN_IV}) % {_CHURN_IV}))
          // {_CHURN_IV})::BIGINT AS b
  FROM events
)
SELECT p.b AS bucket, count(*)::BIGINT AS n_active,
       count(n.user_id)::BIGINT AS n_retained,
       (count(*) - count(n.user_id))::BIGINT AS n_churned
FROM p LEFT JOIN p n ON n.user_id = p.user_id AND n.b = p.b + 1
GROUP BY p.b ORDER BY bucket
"""


_ROLE_TERMS_K = 20


def _q_role_log_odds(sf_dir: str):
    """Corpus-comparison log-odds (Monroe et al. 'fightin' words' with a
    flat add-one prior): per term, ln((yu+1)/(nu-yu+1)) -
    ln((ya+1)/(na-ya+1)) between user and assistant token counts — which
    vocabulary each side of the conversation over-uses.  One (term,
    yu, ya) combiner pass + a vocab-bounded groupby sum; the
    vocab-bounded table finishes driver-side vectorized (the PMI
    broadcast precedent).  Terms with total count < 5 drop; rows sort by
    term so no ranking fragility enters the hash."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages.tokenize import tokenize_column
    from horus_ner_ray.util import worker_runtime_env

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    tr = rd.read_parquet(files, columns=["role", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokenize_column(batch["text"])
        flat = pc.list_flatten(toks)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        roles = np.asarray(batch["role"], dtype=object)[parents]
        t = pa.table({
            "term": flat,
            "yu": pa.array((roles == "user").astype(np.int64), pa.int64()),
            "ya": pa.array((roles == "assistant").astype(np.int64),
                           pa.int64()),
        })
        g = t.group_by("term", use_threads=False).aggregate(
            [("yu", "sum"), ("ya", "sum")])
        return pa.table({"term": g["term"], "yu": g["yu_sum"],
                         "ya": g["ya_sum"]})

    env = worker_runtime_env()
    kw = {"runtime_env": env} if env else {}
    cnt = (tr.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True, **kw)
           .groupby("term")
           .aggregate(Sum("yu", alias_name="yu"),
                      Sum("ya", alias_name="ya"))
           .to_pandas())  # vocab-bounded
    yu = cnt["yu"].to_numpy(np.int64)
    ya = cnt["ya"].to_numpy(np.int64)
    nu, na = int(yu.sum()), int(ya.sum())
    delta = (np.log((yu + 1.0) / (nu - yu + 1.0))
             - np.log((ya + 1.0) / (na - ya + 1.0)))
    out = pd.DataFrame({"term": cnt["term"].astype(str), "yu": yu,
                        "ya": ya, "delta_e6": _e6(delta)})
    out = out[(yu + ya) >= 5]
    return out.sort_values("term").reset_index(drop=True)


def _sql_role_log_odds() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    return f"""
WITH raw AS (SELECT role, text FROM read_parquet('{glob}')),
tok AS (SELECT role, unnest({_sql_tok()}) AS term FROM raw),
c AS (
  SELECT term,
         sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS yu,
         sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT AS ya
  FROM tok GROUP BY 1
),
n AS (SELECT sum(yu)::BIGINT AS nu, sum(ya)::BIGINT AS na FROM c)
SELECT term, yu, ya,
       CAST(FLOOR((ln((yu + 1.0) / (nu - yu + 1.0))
                   - ln((ya + 1.0) / (na - ya + 1.0))) * 1e6 + 0.5)
            AS BIGINT) AS delta_e6
FROM c, n WHERE yu + ya >= 5 ORDER BY term
"""


def _q_role_term_stats(sf_dir: str):
    """Per-field term statistics (the per-channel dictionary split): per
    role, the top-20 terms by within-role document frequency — a
    (role, term)-keyed df combiner + the shared per-group top-k
    reduction (stages/groupwise.topk_per_group).  Ties (df desc, term
    asc)."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages.groupwise import topk_per_group
    from horus_ner_ray.stages.tokenize import tokenize_column
    from horus_ner_ray.util import worker_runtime_env

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    tr = rd.read_parquet(files, columns=["conv_id", "turn_idx", "role",
                                         "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as _pd
        import pyarrow.compute as pc

        toks = tokenize_column(batch["text"])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        role = np.asarray(batch["role"], dtype=object)[parents]
        conv = np.asarray(batch["conv_id"], dtype=object)[parents]
        tix = np.asarray(batch["turn_idx"], dtype=np.int64)[parents]
        df = (_pd.DataFrame({"role": role, "term": flat, "c": conv,
                             "t": tix})
              .drop_duplicates(["role", "term", "c", "t"])
              .groupby(["role", "term"], sort=False)
              .size().reset_index(name="df"))
        return pa.table({
            "role": pa.array(df["role"].to_numpy(object), pa.string()),
            "term": pa.array(df["term"].to_numpy(object), pa.string()),
            "df": pa.array(df["df"].to_numpy(np.int64), pa.int64()),
        })

    fine = (tr.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True,
                           runtime_env=worker_runtime_env())
            .groupby(["role", "term"]).aggregate(Sum("df",
                                                     alias_name="df")))
    top = topk_per_group(fine, "role", ["df", "term"],
                         ascending=[False, True], k=_ROLE_TERMS_K)
    out = (top.to_pandas().sort_values(["role", "term"])
           .reset_index(drop=True))
    out["df"] = out["df"].astype(np.int64)
    return out[["role", "term", "df"]]


def _sql_role_term_stats() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    return f"""
WITH tok AS (
  SELECT DISTINCT role, conv_id, turn_idx, unnest({_sql_tok()}) AS term
  FROM read_parquet('{glob}')
),
dfv AS (SELECT role, term, count(*)::BIGINT AS df
        FROM tok GROUP BY 1, 2),
r AS (
  SELECT role, term, df,
         row_number() OVER (PARTITION BY role
                            ORDER BY df DESC, term) AS rk
  FROM dfv
)
SELECT role, term, df FROM r WHERE rk <= {_ROLE_TERMS_K}
ORDER BY role, term
"""


def _q_winsorized_price(sf_dir: str):
    """Winsorized mean of o_totalprice (stages/stats.winsorized_mean):
    cents-quantized values clipped at the EXACT binary-exact
    1/16 and 15/16 percentile_disc bounds, then one exact-int clipped
    sum.  SQL restates the rank rule as (k*n+15)//16 and the clip with
    least/greatest."""
    import ray.data as rd

    from horus_ner_ray.stages.stats import winsorized_mean

    ds = rd.read_parquet(str(Path(sf_dir) / "orders.parquet"),
                         columns=["o_totalprice"])
    r = winsorized_mean(ds, "o_totalprice", scale=100)
    return pd.DataFrame({k: pd.Series([v], dtype=np.int64)
                         for k, v in r.items()})


_SQL_WINSORIZED_PRICE = """
WITH q AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS qv
  FROM orders
),
n AS (SELECT count(*)::BIGINT AS n FROM q),
r AS (
  SELECT qv, row_number() OVER (ORDER BY qv) AS rn FROM q
),
b AS (
  SELECT max(CASE WHEN rn = greatest(1, ((SELECT n FROM n) + 15) // 16)
                  THEN qv END) AS lo,
         max(CASE WHEN rn = greatest(1, (15 * (SELECT n FROM n) + 15) // 16)
                  THEN qv END) AS hi
  FROM r
)
SELECT (SELECT n FROM n) AS n, b.lo, b.hi,
       CAST(FLOOR(CAST((SELECT sum(least(greatest(qv, b.lo), b.hi))
                        FROM q) AS DOUBLE)
                  / (SELECT n FROM n) / 100.0 * 1e6 + 0.5) AS BIGINT)
         AS mean_e6
FROM b
"""


def _q_conv_profiles(sf_dir: str):
    """Per-conversation profile (stages/windows.conversation_profiles —
    the transcript-domain summary): turn count, user/assistant token
    totals under the shared tokenizer, tool-turn count.  Combiner +
    one groupby; all exact integers."""
    import ray.data as rd

    from horus_ner_ray.stages.windows import conversation_profiles

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    tr = rd.read_parquet(files,
                         columns=["conv_id", "role", "text", "tool"])
    out = (conversation_profiles(tr).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    out["conv_id"] = out["conv_id"].astype(str)
    for c in ("n_turns", "user_tokens", "assistant_tokens", "tool_turns",
              "total_tokens"):
        out[c] = out[c].astype(np.int64)
    return out


def _sql_conv_profiles() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    return f"""
SELECT conv_id, count(*)::BIGINT AS n_turns,
       sum(CASE WHEN role = 'user' THEN len({_sql_tok()}) ELSE 0
           END)::BIGINT AS user_tokens,
       sum(CASE WHEN role = 'assistant' THEN len({_sql_tok()}) ELSE 0
           END)::BIGINT AS assistant_tokens,
       sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END)::BIGINT AS tool_turns,
       sum(len({_sql_tok()}))::BIGINT AS total_tokens
FROM read_parquet('{glob}')
GROUP BY conv_id ORDER BY conv_id
"""


def _q_rocchio_predictions(sf_dir: str):
    """Nearest-centroid (Rocchio) classifier over the labeled embedding
    table (stages/clustering.nearest_centroid_classify): e6-quantized
    vectors, exact-int FLOOR-mean centroids, exact int64 squared-L2
    argmin (ties -> smaller label).  SQL restates the floor-mean with
    the nonneg-mod divisibility trick (DuckDB // truncates, Python //
    floors) and the integer distances in HUGEINT."""
    import ray.data as rd

    from horus_ner_ray.stages.clustering import nearest_centroid_classify

    emb = rd.read_parquet(str(Path(sf_dir) / "embeddings.parquet"),
                          columns=["vec_id", "embedding", "label"])
    out = (nearest_centroid_classify(emb).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    for c in ("vec_id", "label", "pred"):
        out[c] = out[c].astype(np.int64)
    return out


_SQL_ROCCHIO = """
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS qv
  FROM embeddings
),
s AS (
  SELECT label, i, sum(qv)::BIGINT AS sv,
         count(DISTINCT vec_id)::BIGINT AS n
  FROM e GROUP BY 1, 2
),
cent AS (
  -- Python floor division: make the numerator divisible first
  SELECT label, i,
         ((sv - ((sv % n + n) % n)) // n)::BIGINT AS cv
  FROM s
),
dist AS (
  SELECT e.vec_id, cent.label AS clabel,
         sum(CAST(e.qv - cent.cv AS HUGEINT)
             * CAST(e.qv - cent.cv AS HUGEINT)) AS d2
  FROM e JOIN cent ON cent.i = e.i
  GROUP BY 1, 2
),
best AS (
  SELECT vec_id, clabel,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2, clabel) AS rn
  FROM dist
)
SELECT e2.vec_id, CAST(e2.label AS BIGINT) AS label,
       b.clabel::BIGINT AS pred
FROM (SELECT DISTINCT vec_id, label FROM embeddings) e2
JOIN best b ON b.vec_id = e2.vec_id AND b.rn = 1
ORDER BY e2.vec_id
"""


_TREND_MIN = 5
_TREND_K = 5


def _q_trending_terms(sf_dir: str):
    """Trending terms (stages/termstats.trending_terms): per hour
    bucket, the top-5 terms by occurrence-count INCREASE over the
    strictly preceding bucket (gap resets baseline to 0), among terms
    with >= 5 occurrences — the trending-topics report, all exact
    integers.  SQL: lag over term partitions with a strict-adjacency
    CASE + per-bucket row_number."""
    import ray.data as rd

    from horus_ner_ray.stages.termstats import trending_terms

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    tr = rd.read_parquet(files, columns=["ts", "text"])
    out = (trending_terms(tr, _HISTO_INTERVAL_US, min_count=_TREND_MIN,
                          top_k=_TREND_K)
           .to_pandas().sort_values(["bucket", "rank"])
           .reset_index(drop=True))
    out["term"] = out["term"].astype(str)
    for c in ("bucket", "rank", "n", "prev_n", "delta"):
        out[c] = out[c].astype(np.int64)
    return out


def _sql_trending_terms() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    iv = _HISTO_INTERVAL_US
    return f"""
WITH raw AS (SELECT ts, text FROM read_parquet('{glob}')),
tok AS (
  SELECT ((epoch_us(ts)
           - ((epoch_us(ts) % {iv} + {iv}) % {iv})) // {iv})::BIGINT
           AS bucket,
         unnest({_sql_tok()}) AS term
  FROM raw
),
fine AS (SELECT bucket, term, count(*)::BIGINT AS n
         FROM tok GROUP BY 1, 2),
d AS (
  SELECT bucket, term, n,
         CASE WHEN lag(bucket) OVER w = bucket - 1
              THEN lag(n) OVER w ELSE 0 END AS prev_n
  FROM fine
  WINDOW w AS (PARTITION BY term ORDER BY bucket)
),
r AS (
  SELECT bucket, term, n, prev_n, (n - prev_n)::BIGINT AS delta,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY n - prev_n DESC, term) AS rank
  FROM d WHERE n >= {_TREND_MIN}
)
SELECT bucket, rank::BIGINT AS rank, term, n, prev_n::BIGINT AS prev_n,
       delta
FROM r WHERE rank <= {_TREND_K}
ORDER BY bucket, rank
"""


_NEG_K = 3
_NEG_SEED = 9


def _q_negative_pairs(sf_dir: str):
    """Deterministic negative sampling (functions/sampling
    negative_pairs — the contrastive-pair constructor): per doc, k
    pseudo-random OTHER doc ids from splitmix64((id*k+j) XOR seed) %
    (N-1) shifted past the anchor — pure arithmetic map, no shuffle.
    SQL re-derives every draw with _sql_splitmix64."""
    import ray.data as rd

    from horus_ner_ray.functions.sampling import negative_pairs

    docs = rd.read_parquet(_docs(sf_dir), columns=["doc_id"])
    return (negative_pairs(docs, k=_NEG_K, seed=_NEG_SEED)
            .to_pandas().astype(np.int64)
            .sort_values(["doc_id", "neg_rank"]).reset_index(drop=True))


def _sql_negative_pairs() -> str:
    h = _sql_splitmix64(
        f"xor(CAST(doc_id * {_NEG_K} + j AS UBIGINT), "
        f"CAST({_NEG_SEED} AS UBIGINT))")
    return f"""
WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
j AS (SELECT unnest(generate_series(0, {_NEG_K - 1})) AS j),
d AS (
  SELECT doc_id, j.j AS neg_rank,
         CAST(({h}) % CAST((SELECT n FROM n) - 1 AS UBIGINT) AS BIGINT)
           AS off
  FROM documents CROSS JOIN j
)
SELECT doc_id, neg_rank,
       (off + CASE WHEN off >= doc_id THEN 1 ELSE 0 END)::BIGINT AS neg_id
FROM d ORDER BY doc_id, neg_rank
"""


PHRASE_SUGGEST_QUERIES = ["batck join", "custoner slow scan", "filtr",
                          "qqqqqqzz stream", "datx strem"]
_PSUG_DIST = 1
_PSUG_PER = 3


def _q_phrase_suggest(sf_dir: str):
    """Phrase suggester (stages/spell.phrase_suggest — the ES phrase
    suggester's shape): per-token Levenshtein candidates ranked
    (dist, df desc, term), candidate SEQUENCES rescored by the add-one
    bigram LM with per-pair e9-int contributions, best by (score desc,
    sequence asc).  The corpus-sized bigram table is never built — one
    streaming combiner counts only the candidate pairs.  SQL restates
    candidates (native levenshtein), the LM counts, the cross-joined
    sequences and the argmax."""
    import ray.data as rd

    from horus_ner_ray.stages.spell import phrase_suggest

    docs = rd.read_parquet(_docs(sf_dir), columns=["doc_id", "text"])
    out = phrase_suggest(docs, PHRASE_SUGGEST_QUERIES,
                         max_dist=_PSUG_DIST, per_token=_PSUG_PER)
    return out.sort_values("query_id").reset_index(drop=True)


def _sql_phrase_suggest() -> str:
    import re

    parts = []
    for qid, q in enumerate(PHRASE_SUGGEST_QUERIES):
        toks = re.findall(_TOKRE, q.lower())
        if not toks:
            continue
        cand_ctes = []
        for s, t in enumerate(toks):
            cand_ctes.append(f"""
cand{qid}_{s} AS (
  SELECT term FROM (
    SELECT term,
           row_number() OVER (ORDER BY levenshtein(term, '{t}'),
                              df DESC, term) AS rn
    FROM dfv WHERE levenshtein(term, '{t}') <= {_PSUG_DIST}
  ) WHERE rn <= {_PSUG_PER}
)""")
        if len(toks) == 1:
            body = (f"SELECT {qid} AS query_id, term AS suggestion, "
                    f"0::BIGINT AS score_e9 FROM cand{qid}_0 "
                    f"ORDER BY term LIMIT 1")
            # rank-1 candidate: the window above already ordered by
            # (dist, df desc, term); re-select it
            body = (f"SELECT {qid} AS query_id, term AS suggestion, "
                    f"0::BIGINT AS score_e9 FROM (SELECT term, "
                    f"row_number() OVER (ORDER BY levenshtein(term, "
                    f"'{toks[0]}'), df DESC, term) AS rn FROM dfv "
                    f"WHERE levenshtein(term, '{toks[0]}') <= "
                    f"{_PSUG_DIST}) WHERE rn = 1")
            parts.append((",".join(cand_ctes), body))
            continue
        froms = [f"cand{qid}_0 c0"]
        joins = []
        score_terms = []
        sugg = "c0.term"
        for s in range(1, len(toks)):
            froms.append(f"CROSS JOIN cand{qid}_{s} c{s}")
            joins.append(
                f"LEFT JOIN c12 p{s} ON p{s}.w1 = c{s-1}.term "
                f"AND p{s}.w2 = c{s}.term")
            joins.append(
                f"LEFT JOIN c1 l{s} ON l{s}.w1 = c{s-1}.term")
            score_terms.append(
                f"CAST(FLOOR(ln((coalesce(p{s}.c, 0) + 1.0)"
                f" / (coalesce(l{s}.c, 0)"
                f" + (SELECT count(*) FROM dfv))) * 1e9 + 0.5) AS BIGINT)")
            sugg += f" || ' ' || c{s}.term"
        body = f"""
  SELECT * FROM (
    SELECT {qid} AS query_id, {sugg} AS suggestion,
           ({" + ".join(score_terms)})::BIGINT AS score_e9
    FROM {" ".join(froms)} {" ".join(joins)}
  ) ORDER BY score_e9 DESC, suggestion LIMIT 1"""
        parts.append((",".join(cand_ctes), body))
    all_ctes = ",".join(p[0] for p in parts).lstrip(",")
    union = "\nUNION ALL\n".join(f"SELECT * FROM ({p[1]})" for p in parts)
    return f"""
WITH tok AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
uni AS (
  SELECT doc_id, unnest(arr) AS term,
         generate_subscripts(arr, 1) AS pos
  FROM tok
),
flat AS (SELECT doc_id, unnest(arr) AS term FROM tok),
dfv AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
        FROM flat GROUP BY term),
big AS (
  SELECT a.term AS w1, b.term AS w2
  FROM uni a JOIN uni b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
c12 AS (SELECT w1, w2, count(*)::BIGINT AS c FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, count(*)::BIGINT AS c FROM big GROUP BY 1),
{all_ctes}
{union}
ORDER BY query_id
"""


_PROFILE_COLS = ["o_custkey", "o_orderstatus", "o_orderpriority",
                 "o_orderdate"]


def _q_orders_profile(sf_dir: str):
    """Column profiler (stages/stats.profile_columns): per column row /
    null / EXACT distinct counts — the ETL pre-flight report.  Distinct
    counts shuffle batch-distinct partials, never raw rows."""
    import ray.data as rd

    from horus_ner_ray.stages.stats import profile_columns

    ds = rd.read_parquet(str(Path(sf_dir) / "orders.parquet"),
                         columns=_PROFILE_COLS)
    return profile_columns(ds, _PROFILE_COLS)


def _sql_orders_profile() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
  SELECT '{c}' AS column, count(*)::BIGINT AS n_rows,
         count(*) FILTER ({c} IS NULL)::BIGINT AS n_null,
         count(DISTINCT {c})::BIGINT AS n_distinct
  FROM orders""")
    return " UNION ALL ".join(parts)


def _q_props_field_stats(sf_dir: str):
    """JSON sidecar-field extraction (stages/analysis
    json_int_field_dataset): the integer 'k' property parsed out of the
    events.props JSON strings with ONE compiled regex per batch (exact
    JSON semantics for flat integer fields), then aggregated per event
    type.  ORACLE: DuckDB's REAL json_extract parses the same strings —
    the regex fast path is checked against a full JSON parser."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    from horus_ner_ray.stages.analysis import json_int_field_dataset

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["event_type", "props"])
    k = json_int_field_dataset(ev, "props", "k", out_col="k",
                               id_cols=["event_type"])
    def drop_null(b):
        import pyarrow.compute as pc

        return b.filter(pc.is_valid(b["k"]))

    from horus_ner_ray.util import worker_runtime_env

    out = (k.map_batches(drop_null, batch_format="pyarrow",
                         zero_copy_batch=True,
                         runtime_env=worker_runtime_env())
           .groupby("event_type")
           .aggregate(Count(alias_name="n_rows"),
                      Sum("k", alias_name="sum_k"),
                      Min("k", alias_name="min_k"),
                      Max("k", alias_name="max_k"))
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    for c in ("n_rows", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype(np.int64)
    return out


_SQL_PROPS_FIELD_STATS = """
SELECT event_type, count(*)::BIGINT AS n_rows,
       sum(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       min(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS max_k
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def _q_qty_skew_kurt(sf_dir: str):
    """Population skewness + excess kurtosis per return flag
    (stages/stats.grouped_skew_kurt): exact integer raw moments s1..s4
    (powers hi/lo-split in the combiner), float only in the O(groups)
    finish — SQL restates the same numerators in HUGEINT and the same
    pow points."""
    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_skew_kurt

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_returnflag", "l_quantity"])
    return (grouped_skew_kurt(li, "l_returnflag", "l_quantity", scale=1)
            .sort_values("l_returnflag").reset_index(drop=True))


_SQL_QTY_SKEW_KURT = """
WITH q AS (
  SELECT l_returnflag AS k,
         CAST(FLOOR(l_quantity * 1 + 0.5) AS HUGEINT) AS x
  FROM lineitem
),
s AS (
  SELECT k, count(*)::HUGEINT AS n, sum(x) AS s1, sum(x*x) AS s2,
         sum(x*x*x) AS s3, sum((x*x)*(x*x)) AS s4
  FROM q GROUP BY k
)
SELECT k AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
       CASE WHEN n*s2 - s1*s1 <= 0 THEN 0
            ELSE CAST(FLOOR(
              (CAST(n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS DOUBLE)
               / CAST(n*n*n AS DOUBLE))
              / pow(CAST(n*s2 - s1*s1 AS DOUBLE) / CAST(n*n AS DOUBLE),
                    1.5)
              * 1e6 + 0.5) AS BIGINT)
       END AS skew_e6,
       CASE WHEN n*s2 - s1*s1 <= 0 THEN 0
            ELSE CAST(FLOOR(
              ((CAST(n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2
                     - 3*s1*s1*s1*s1 AS DOUBLE)
                / CAST(n*n*n*n AS DOUBLE))
               / ((CAST(n*s2 - s1*s1 AS DOUBLE) / CAST(n*n AS DOUBLE))
                  * (CAST(n*s2 - s1*s1 AS DOUBLE) / CAST(n*n AS DOUBLE)))
               - 3.0)
              * 1e6 + 0.5) AS BIGINT)
       END AS kurt_e6
FROM s ORDER BY l_returnflag
"""


_COMPLETE_PREFIXES = ["s", "st", "wi", "ta", "zzzq"]
_COMPLETE_K = 8


def _q_completions(sf_dir: str):
    """Completion suggester (QueryEngine.complete): dictionary terms
    with each prefix ranked (df desc, term asc), first k — popularity-
    ordered autocomplete off the sorted global vocab.  SQL: LIKE over
    dfv + row_number."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    rows = {"query_id": [], "rank": [], "term": [], "df": []}
    for qid, p in enumerate(_COMPLETE_PREFIXES):
        for r, (t, df) in enumerate(eng.complete(p, k=_COMPLETE_K), 1):
            rows["query_id"].append(qid)
            rows["rank"].append(r)
            rows["term"].append(t)
            rows["df"].append(df)
    out = pd.DataFrame(rows)
    return out.astype({c: np.int64 for c in ("query_id", "rank", "df")})


def _sql_completions() -> str:
    parts = []
    for qid, p in enumerate(_COMPLETE_PREFIXES):
        parts.append(f"""
  SELECT * FROM (
    SELECT {qid} AS query_id,
           row_number() OVER (ORDER BY df DESC, term) AS rank,
           term, df
    FROM dfv WHERE term LIKE '{p}%'
  ) WHERE rank <= {_COMPLETE_K}""")
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
dfv AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
        FROM tok GROUP BY term)
{" UNION ALL ".join(parts)}
ORDER BY query_id, rank
"""


_ADJ_FILTERS = {"batchq": "batch", "joinish": "join merge",
                "slowwin": "slow window", "noneq": "zzzqnotfound"}


def _q_adjacency_cells(sf_dir: str):
    """ES adjacency_matrix aggregation (QueryEngine.adjacency_matrix):
    named term-filters, live-doc count of every pairwise intersection
    (diagonal = each filter's own count).  Per shard each filter's doc
    set decodes once; pairwise np.intersect1d; counts sum across shards.
    SQL: per-filter DISTINCT doc sets self-joined on doc_id, zero cells
    filled from the name-pair universe."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    rows = eng.adjacency_matrix(_ADJ_FILTERS)
    return pd.DataFrame({
        "name_a": [a for a, _b, _c in rows],
        "name_b": [b for _a, b, _c in rows],
        "n_docs": pd.Series([c for _a, _b, c in rows], dtype=np.int64),
    })


def _sql_adjacency_cells() -> str:
    import re

    sets = []
    for name in sorted(_ADJ_FILTERS):
        terms = sorted(set(re.findall(_TOKRE, _ADJ_FILTERS[name].lower())))
        t_in = ", ".join(f"'{t}'" for t in terms)
        sets.append(f"SELECT '{name}' AS name, doc_id FROM tok "
                    f"WHERE term IN ({t_in}) GROUP BY 1, 2")
    names = ", ".join(f"('{n}')" for n in sorted(_ADJ_FILTERS))
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents),
fdocs AS (
  {" UNION ALL ".join(sets)}
),
nm(name) AS (VALUES {names}),
cnt AS (
  SELECT a.name AS name_a, b.name AS name_b, count(*)::BIGINT AS n
  FROM fdocs a JOIN fdocs b USING (doc_id)
  WHERE a.name <= b.name
  GROUP BY 1, 2
)
SELECT x.name AS name_a, y.name AS name_b,
       coalesce(cnt.n, 0)::BIGINT AS n_docs
FROM nm x JOIN nm y ON x.name <= y.name
LEFT JOIN cnt ON cnt.name_a = x.name AND cnt.name_b = y.name
ORDER BY name_a, name_b
"""


_RANK_PROBE_OFFS_S = [0, 100_000, 450_000, 1_000_000, 1_800_000]


def _rank_probe_values() -> list[int]:
    base = int(np.datetime64("2025-06-01T00:00:00", "us").astype(np.int64))
    return [base + o * 1_000_000 for o in _RANK_PROBE_OFFS_S]


def _q_ts_percentile_ranks(sf_dir: str):
    """ES percentile_ranks aggregation, EXACT
    (QueryEngine.field_percentile_ranks): for each probe timestamp, the
    inclusive-CDF fraction of the match set's stored ts <= it,
    rank_e6 = floor(count_le / count * 1e6 + 0.5).  One pass per shard,
    only a probes-sized count vector merges.  SQL: count FILTER per
    probe over the same derived doc table."""
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.synth import reference_queries

    eng = QueryEngine(_tr_index_dir(sf_dir))
    probes = _rank_probe_values()
    rows = {"query_id": [], "value": [], "count_le": [], "n": [],
            "rank_e6": []}
    for qid, t in enumerate(q["text"] for q in reference_queries()):
        for r in eng.field_percentile_ranks(t, probes):
            rows["query_id"].append(qid)
            rows["value"].append(r["value"])
            rows["count_le"].append(r["count_le"])
            rows["n"].append(r["count"])
            rows["rank_e6"].append(r["rank_e6"])
    return pd.DataFrame(rows).astype(np.int64)


def _sql_ts_percentile_ranks() -> str:
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    texts = [q["text"] for q in reference_queries()]
    probes = ", ".join(f"({v})" for v in _rank_probe_values())
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, ts, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
docs AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, ts, text
  FROM raw JOIN offs USING (conv_id)
),
tok AS (SELECT doc_id, unnest({_sql_tok()}) AS term FROM docs),
q(query_id, term) AS (VALUES {_sql_values_queries(texts)}),
qids AS (SELECT DISTINCT query_id FROM q),
probes(value) AS (VALUES {probes}),
m AS (SELECT DISTINCT q.query_id, tok.doc_id FROM q JOIN tok USING (term)),
r AS (
  SELECT m.query_id, p.value,
         count(*) FILTER (WHERE epoch_us(d.ts)::BIGINT <= p.value)::BIGINT
           AS count_le,
         count(*)::BIGINT AS n
  FROM m JOIN docs d ON d.doc_id = m.doc_id
  CROSS JOIN probes p
  WHERE d.ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT qids.query_id, p.value::BIGINT AS value,
       coalesce(r.count_le, 0)::BIGINT AS count_le,
       coalesce(r.n, 0)::BIGINT AS n,
       CASE WHEN coalesce(r.n, 0) = 0 THEN 0
            ELSE CAST(FLOOR(CAST(r.count_le AS DOUBLE)
                            / CAST(r.n AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
       END AS rank_e6
FROM qids CROSS JOIN probes p
LEFT JOIN r ON r.query_id = qids.query_id AND r.value = p.value
"""


def _q_doc_term_vectors(sf_dir: str):
    """Term-vectors API (ES termvectors): per stored doc the (term, tf,
    global df) rows under the shared tokenizer rule — one docstore
    point-read + dictionary lookups; SQL re-derives tf from the selected
    docs and df from the WHOLE corpus."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir))
    rows = {"doc_id": [], "term": [], "tf": [], "df": []}
    for d in MLT_DOC_IDS:
        for t, f, df in eng.term_vector(d):
            rows["doc_id"].append(d)
            rows["term"].append(t)
            rows["tf"].append(f)
            rows["df"].append(df)
    out = pd.DataFrame(rows)
    for c in ("doc_id", "tf", "df"):
        out[c] = out[c].astype(np.int64)
    return out


def _sql_doc_term_vectors() -> str:
    ids = ", ".join(str(i) for i in MLT_DOC_IDS)
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
        ),
        dfv AS (
          SELECT term, count(DISTINCT doc_id)::BIGINT df FROM tok GROUP BY 1
        )
        SELECT t.doc_id, t.term, count(*)::BIGINT AS tf, any_value(dfv.df) AS df
        FROM tok t JOIN dfv USING (term)
        WHERE t.doc_id IN ({ids})
        GROUP BY t.doc_id, t.term
    """


_PACK_CAP, _PACK_RANGE = 256, 128


def _q_sample_by_source(sf_dir: str):
    """Domain-mixture sampling: k docs PER source, weighted by document
    length (A-ES priorities from the keyed splitmix64 hash — the same
    deterministic machinery as weighted_sample, reduced per group).
    SQL: row_number over (PARTITION BY source ORDER BY priority DESC,
    doc_id)."""
    import ray.data as rd

    from horus_ner_ray.functions.sampling import weighted_sample_per_group

    ds = rd.read_parquet(_docs(sf_dir),
                         columns=["doc_id", "source", "n_chars"])
    out = weighted_sample_per_group(ds, "source", "doc_id", "n_chars",
                                    k=8, seed=13).to_pandas()
    out = out.sort_values(["source", "rank"]).reset_index(drop=True)
    return pd.DataFrame({
        "source": out["source"].astype(str),
        "rank": out["rank"].astype(np.int64),
        "doc_id": out["doc_id"].astype(np.int64),
        "n_chars": out["n_chars"].astype(np.int64),
    })


def _q_sample_by_source_temp(sf_dir: str):
    """Temperature-scaled domain-mixture sampling (the multilingual-
    corpus temperature knob, T = 2): weights rescale to w**(1/T) before
    the A-ES priority draw, flattening the length bias toward uniform;
    everything else identical to sample_by_source.  SQL: the same
    pow(u, 1/pow(w, 0.5)) priorities."""
    import ray.data as rd

    from horus_ner_ray.functions.sampling import weighted_sample_per_group

    ds = rd.read_parquet(_docs(sf_dir),
                         columns=["doc_id", "source", "n_chars"])
    out = weighted_sample_per_group(ds, "source", "doc_id", "n_chars",
                                    k=8, seed=13,
                                    temperature=2.0).to_pandas()
    out = out.sort_values(["source", "rank"]).reset_index(drop=True)
    return pd.DataFrame({
        "source": out["source"].astype(str),
        "rank": out["rank"].astype(np.int64),
        "doc_id": out["doc_id"].astype(np.int64),
        "n_chars": out["n_chars"].astype(np.int64),
    })


def _q_packed_sequences(sf_dir: str):
    """Greedy sequence packing (the LLM-training batch constructor):
    docs walk in id order within fixed doc-id ranges, first-fit into
    token-capacity bins (oversized docs get a bin alone, bins never
    span ranges — the embarrassingly-parallel partitioning assumption).
    The SQL re-derives the sequential walk as a per-range recursive
    CTE."""
    from horus_ner_ray.stages.packing import pack_sequences

    out = pack_sequences(_read_docs(sf_dir), capacity=_PACK_CAP,
                         range_size=_PACK_RANGE).to_pandas()
    return (out.sort_values("doc_id").reset_index(drop=True)
            .astype(np.int64))


def _q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): priority = u**(1/w) with u drawn from the keyed
    splitmix64 hash — a pure function of (key, weight, seed), so the
    top-k IS the sample and the SQL oracle replicates it bit-for-bit
    (HUGEINT splitmix64 + libm pow on both sides; exactness also pinned
    in tests/test_functions.py).  Weight = o_totalprice over orders."""
    import ray.data as rd

    from horus_ner_ray.functions.sampling import weighted_sample_topk

    ds = rd.read_parquet(str(Path(sf_dir) / "orders.parquet"),
                         columns=["o_orderkey", "o_totalprice"])
    out = weighted_sample_topk(ds, "o_orderkey", "o_totalprice",
                               k=50, seed=7).to_pandas()
    return pd.DataFrame({
        "rank": pd.Series(np.arange(1, len(out) + 1), dtype=np.int64),
        "o_orderkey": out["o_orderkey"].astype(np.int64),
        "price_c": pd.Series(
            np.floor(out["o_totalprice"].to_numpy(np.float64) * 100 + 0.5),
            dtype=np.int64),
    })


def _q_train_test_split(sf_dir: str):
    from horus_ner_ray.functions.sampling import hash_split

    ds = hash_split(_read_docs(sf_dir), train_pct=80)
    return ds.select_columns(["doc_id", "split"])


def _q_split_counts(sf_dir: str):
    from horus_ner_ray.functions.sampling import split_proportions

    return split_proportions(_read_docs(sf_dir), train_pct=80)


def _q_minhash_pairs(sf_dir: str):
    from horus_ner_ray.stages.dedupe import buckets_for_rows, minhash_candidate_pairs

    cfg = PipelineConfig()
    return minhash_candidate_pairs(
        _read_docs(sf_dir), cfg, n_buckets=buckets_for_rows(_n_rows(_docs(sf_dir)))
    )


def _q_jaccard_allpairs(sf_dir: str):
    """EXACT all-pairs word-3-gram Jaccard >= 0.05 — the brute-force
    baseline the DuckDB oracle verifies (LSH variants are the scale path)."""
    from horus_ner_ray.stages.dedupe import ngram_jaccard_pairs_exact

    out = ngram_jaccard_pairs_exact(_read_docs(sf_dir), PipelineConfig(), threshold=0.05)
    df = out.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype=np.int64) for c in ("doc_a", "doc_b", "jaccard_e6")}
        )
    df["jaccard_e6"] = _e6(df["jaccard"])
    return df[["doc_a", "doc_b", "jaccard_e6"]].astype(np.int64)


def _q_jaccard_dups(sf_dir: str):
    """n-gram (shingle) Jaccard near-dup: MinHash-LSH candidates verified
    with exact shingle-set Jaccard (threshold 0.5) — fully distributed:
    the verify is a two-stage bucketed join of the pair list against
    per-doc shingle sets (no driver materialization).

    Oracle-checked: the exact verify prunes every false candidate, so the
    output equals the exact all-pairs J >= 0.5 set whenever LSH recall is 1.
    With 32 bands x 2 rows (seeded, deterministic) and this corpus family's
    dup structure — every true pair sits at J >= 0.9, nothing in (0.3, 0.9)
    — a miss would need (1 - J^2)^32 <= 0.19^32 ~ 1e-23; the conformance
    run is over the same seeded hashes, so the equality is reproducible,
    not probabilistic per run."""
    from horus_ner_ray.stages.dedupe import (
        exact_jaccard_for_pairs_dataset,
        minhash_candidate_pairs,
    )

    # wider banding (r=2) trades candidate precision for near-certain
    # recall; the distributed exact verify absorbs the extra candidates
    from horus_ner_ray.stages.dedupe import buckets_for_rows

    cfg = PipelineConfig(minhash_bands=32)
    nb = buckets_for_rows(_n_rows(_docs(sf_dir)))
    cand = minhash_candidate_pairs(_read_docs(sf_dir), cfg, n_buckets=nb)
    ver = exact_jaccard_for_pairs_dataset(
        _read_docs(sf_dir), cand, cfg, threshold=0.5, n_buckets=nb
    ).to_pandas()
    if len(ver) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype=np.int64) for c in ("doc_a", "doc_b", "jaccard_e6")}
        )
    ver["jaccard_e6"] = _e6(ver["jaccard"])
    return ver[["doc_a", "doc_b", "jaccard_e6"]].astype(np.int64)


_IVF_K = 8
_IVF_ITERS = 2
_IVF_NPROBE = 3


_PQ_M, _PQ_KS, _PQ_ITERS = 4, 16, 2
_PQ_CACHE: dict[str, Any] = {}


def _pq_fitted(sf_dir: str):
    import ray.data as rd

    from horus_ner_ray.stages.pq import PQIndex

    path = str(Path(sf_dir) / "embeddings.parquet")
    emb = rd.read_parquet(path, columns=["vec_id", "embedding"])
    key = str(Path(sf_dir).resolve())
    if key not in _PQ_CACHE:  # deterministic fit: share across queries
        _PQ_CACHE[key] = PQIndex(m=_PQ_M, ks=_PQ_KS, n_iter=_PQ_ITERS).fit(emb)
    return _PQ_CACHE[key], emb


def _q_pq_codes(sf_dir: str):
    """Product-quantization codes (Jégou et al. 2011): per subspace the
    deterministic Lloyd's codebook (the kmeans_clusters-oracle fit over
    the sub-slice) and the argmin-L2 code assignment.  The SQL unrolls
    one independent k-means chain per subspace and joins the four final
    assignments — the COMPRESSION itself is hash-checked, not a recall
    bound."""
    pqi, emb = _pq_fitted(sf_dir)
    out = pqi.encode(emb).to_pandas().sort_values("vec_id")
    res = pd.DataFrame({"vec_id": out["vec_id"].astype(np.int64)})
    for mi in range(_PQ_M):
        res[f"code_{mi}"] = out[f"code_{mi}"].astype(np.int64).to_numpy()
    return res.reset_index(drop=True)


def _q_pq_ann(sf_dir: str):
    """PQ asymmetric-distance (ADC) top-k: approximate distance = the
    sum of per-subspace exact query-to-assigned-centroid distances,
    accumulated in subspace order (the SQL's explicit left-associated
    d0+d1+d2+d3).  Ranks by (adist_e6 asc, vec_id asc) on both sides."""
    import pyarrow.parquet as pq

    pqi, emb = _pq_fitted(sf_dir)
    path = str(Path(sf_dir) / "embeddings.parquet")
    qt = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    qm = np.array(qt["embedding"].tolist(), dtype=np.float64)
    raw = pqi.search(pqi.encode(emb), qt["vec_id"].to_numpy(np.int64),
                     qm, k=TOPK * 3 + 20)
    raw["adist_e6"] = _e6(raw["adist"])
    out = []
    for qid, g in raw.groupby("query_id", sort=True):
        g = g.sort_values(["adist_e6", "vec_id"],
                          ascending=[True, True], kind="stable").head(TOPK)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g[["query_id", "rank", "vec_id", "adist_e6"]])
    return pd.concat(out, ignore_index=True).astype(np.int64)


def _q_ivfpq_ann(sf_dir: str):
    """IVF + PQ composed (the FAISS IVFPQ shape): the deterministic
    coarse k-means prunes each query to its nprobe nearest partitions
    and candidates rank by PQ asymmetric distance over their codes —
    the scan touches nprobe/n_centroids of the (already compressed)
    codes table and never decodes an embedding.  The SQL chains the two
    existing oracle builders (coarse kmeans chain + per-subspace PQ
    chains), so pruning AND compression are hash-checked together."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.stages.pq import ivfpq_search

    path = str(Path(sf_dir) / "embeddings.parquet")
    qt = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    qm = np.array(qt["embedding"].tolist(), dtype=np.float64)
    pqi, _emb = _pq_fitted(sf_dir)  # deterministic fit: shared cache
    raw = ivfpq_search(rd.read_parquet(path, columns=["vec_id", "embedding"]),
                       qt["vec_id"].to_numpy(np.int64), qm,
                       k=TOPK * 3 + 20, n_centroids=_IVF_K,
                       nprobe=_IVF_NPROBE, m=_PQ_M, ks=_PQ_KS,
                       n_iter=_PQ_ITERS, pq=pqi)
    raw["adist_e6"] = _e6(raw["adist"])
    out = []
    for qid, g in raw.groupby("query_id", sort=True):
        g = g.sort_values(["adist_e6", "vec_id"],
                          ascending=[True, True], kind="stable").head(TOPK)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g[["query_id", "rank", "vec_id", "adist_e6"]])
    return pd.concat(out, ignore_index=True).astype(np.int64)


def _q_ann_ivf(sf_dir: str):
    """IVF pruned-probe ANN, ORACLE-checked (round 5; was rows-only):
    the coarse quantizer is the deterministic distributed k-means the
    ``kmeans_clusters`` oracle already hash-matches (fit_kmeans: init = k
    smallest vec_ids, e6-int order-free centroid sums, argmin-L2 assign);
    probes are the nprobe nearest centroids under the same L2 expansion;
    the exact cosine ranks candidates within the probed partitions only.
    The SQL replicates fit, assignment, pruning, and ranking verbatim, so
    a partial-probe recall bug can no longer hide behind 'approximate by
    design'."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.stages.similarity import IVFIndex

    path = str(Path(sf_dir) / "embeddings.parquet")
    qt = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    ivf = IVFIndex(n_centroids=_IVF_K, nprobe=_IVF_NPROBE).fit_kmeans(
        rd.read_parquet(path), n_iter=_IVF_ITERS)
    qm = np.array(qt["embedding"].tolist(), dtype=np.float64)
    rows = {"query_id": [], "rank": [], "vec_id": [], "cosine": []}
    # padded candidate fetch + e6 rerank: rank-k boundary ties resolve by
    # the oracle's (cosine_e6 desc, vec_id asc) order (same as ann_topk)
    for qid, hits in zip(qt["vec_id"], ivf.search(qm, k=TOPK * 3 + 20)):
        for rank, (vid, c) in enumerate(hits, 1):
            rows["query_id"].append(int(qid))
            rows["rank"].append(rank)
            rows["vec_id"].append(int(vid))
            rows["cosine"].append(float(c))
    return _e6_rerank(pd.DataFrame(rows), "cosine", "vec_id", "cosine_e6")


def _q_ann_ivf_full(sf_dir: str):
    """IVF at full probe (nprobe = n_centroids) — every partition is
    visited, so the result is EXACT and oracle-checkable against the same
    cosine-top-k SQL as ann_topk.  This pins the IVF machinery itself
    (sampled fit, map_batches assign, partitioned lists, probe merge):
    partial-probe recall bugs hide behind "approximate by design", a
    full-probe mismatch cannot."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.stages.similarity import IVFIndex

    path = str(Path(sf_dir) / "embeddings.parquet")
    qt = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    ivf = IVFIndex(n_centroids=16, nprobe=16, seed=42).fit(rd.read_parquet(path))
    qm = np.array(qt["embedding"].tolist(), dtype=np.float64)
    rows = {"query_id": [], "rank": [], "vec_id": [], "cosine": []}
    for qid, hits in zip(qt["vec_id"], ivf.search(qm, k=TOPK * 3 + 20)):
        for rank, (vid, c) in enumerate(hits, 1):
            rows["query_id"].append(int(qid))
            rows["rank"].append(rank)
            rows["vec_id"].append(int(vid))
            rows["cosine"].append(float(c))
    return _e6_rerank(pd.DataFrame(rows), "cosine", "vec_id", "cosine_e6")


def _q_hll_users(sf_dir: str):
    """HyperLogLog distinct-count sketch, ORACLE-checked end to end
    (round 5): the hash is splitmix64 over the int64 user ids, the
    harmonic sum is an exact integer (stages/sketches._estimate), and the
    SQL replicates hash -> registers -> estimate bit-for-bit
    (_sql_hll_users; the ln() agreement for the linear-counting branch is
    exhaustively verified over all 16383 possible inputs in
    tests/test_sketches.py)."""
    import math

    import ray.data as rd

    from horus_ner_ray.stages.sketches import hll_count_distinct

    ds = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id"])
    est = hll_count_distinct(ds, "user_id", p=14, hash64="splitmix64")
    return pd.DataFrame({"column": ["user_id"],
                         "hll_estimate": pd.Series([math.floor(est + 0.5)],
                                                   dtype=np.int64)})


def _sql_splitmix64(z: str) -> str:
    """DuckDB expression computing splitmix64({z}) for a UBIGINT operand.
    64x64-bit multiplies run as HUGEINT split-multiplies mod 2^64 (the
    low-32 x full product plus the low 32 bits of the high-32 x low-32
    product — INT128 never overflows)."""
    M64 = "18446744073709551616"

    def mulmod(expr: str, c: int) -> str:
        c_lo = c & 0xFFFFFFFF
        return (f"CAST((((CAST(({expr}) >> 32 AS HUGEINT) * {c_lo}) % 4294967296)"
                f" * 4294967296 + CAST((({expr}) & 4294967295) AS HUGEINT) * {c})"
                f" % {M64} AS UBIGINT)")

    s1 = f"CAST((CAST(({z}) AS HUGEINT) + 11400714819323198485) % {M64} AS UBIGINT)"
    s2 = mulmod(f"xor({s1}, {s1} >> 30)", 0xBF58476D1CE4E5B9)
    s3 = mulmod(f"xor({s2}, {s2} >> 27)", 0x94D049BB133111EB)
    return f"xor({s3}, {s3} >> 31)"


def _sql_hll_users(p: int = 14) -> str:
    """DuckDB oracle replicating the ENTIRE HyperLogLog estimate of
    _q_hll_users bit-for-bit: splitmix64 hash (_sql_splitmix64), register
    index/rho extraction (the same 6-step binary-halving CLZ as the numpy
    kernel), per-register max, the exact-integer harmonic sum, and the
    same float tail (K/s -> linear counting when est <= 2.5m and zero
    registers exist; ln() agreement over all possible zero-counts is
    pytest-verified exhaustively)."""
    m = 1 << p
    rmax = 64 - p + 1
    am = 0.7213 / (1 + 1.079 / m)
    k_num = am * m * m * float(1 << rmax)
    # 6-step binary-halving count-leading-zeros over the 64-bit lane,
    # identical to stages/sketches._registers_for_batch
    steps = ""
    prev = "c0"
    for i, s in enumerate((32, 16, 8, 4, 2, 1), start=1):
        lim = 1 << (64 - s)
        steps += f""",
        c{i} AS (
          SELECT idx,
                 lz + CASE WHEN cur < {lim} THEN {s} ELSE 0 END AS lz,
                 CASE WHEN cur < {lim}
                      THEN CAST(CAST(cur AS HUGEINT) * {1 << s} AS UBIGINT)
                      ELSE cur END AS cur
          FROM {prev}
        )"""
        prev = f"c{i}"
    return f"""
        WITH u AS (SELECT DISTINCT CAST(user_id AS UBIGINT) AS x FROM events),
        hh AS (SELECT {_sql_splitmix64("x")} AS h FROM u),
        c0 AS (
          SELECT h >> {64 - p} AS idx,
                 0 AS lz,
                 CAST((CAST(h AS HUGEINT) * {m}) % 18446744073709551616
                      AS UBIGINT) | {m - 1} AS cur
          FROM hh
        ){steps},
        regs AS (
          SELECT idx, max(least(lz + 1, {rmax})) AS rho FROM {prev} GROUP BY idx
        ),
        agg AS (
          SELECT count(*) AS nz,
                 sum(CAST({1 << rmax} AS HUGEINT) >> rho) AS s_nz
          FROM regs
        ),
        est AS (
          SELECT {m} - nz AS zeros,
                 {k_num!r} / CAST(s_nz + ({m} - nz) * CAST({1 << rmax} AS HUGEINT)
                                  AS DOUBLE) AS raw
          FROM agg
        )
        SELECT 'user_id' AS "column",
               CAST(FLOOR(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                               THEN {float(m)!r} * ln({float(m)!r} / zeros)
                               ELSE raw END + 0.5) AS BIGINT) AS hll_estimate
        FROM est
    """


def _q_simhash(sf_dir: str):
    from horus_ner_ray.stages.dedupe import simhash_dataset

    return simhash_dataset(_read_docs(sf_dir))


def _q_langid(sf_dir: str):
    from horus_ner_ray.stages.analysis import langid_dataset

    return langid_dataset(_read_docs(sf_dir))


def _sql_langid() -> str:
    """DuckDB oracle for langid: the heuristic is fully deterministic —
    script-range codepoint counts over the first 200 chars (disjoint
    ranges, so the Python path's first-claim masking is a no-op), else
    per-language stopword-occurrence counts over the shared tokenizer,
    with the exact argmax tie-breaks of ``langid_batch`` (script order
    zh>ja>ko>ru, language order fr>es>en>de = first-max-wins over
    ``_LANGS_DESC``)."""
    from horus_ner_ray.stages.analysis import _LANG_STOPWORDS, _SCRIPT_RANGES

    script_cols = ", ".join(
        f"length(head) - length(regexp_replace(head, "
        f"'[\\x{{{lo:04X}}}-\\x{{{hi:04X}}}]', '', 'g')) AS n_{code}"
        for code, lo, hi in _SCRIPT_RANGES
    )
    lang_cols = ", ".join(
        "len(list_filter(toks, t -> t IN ({lst}))) AS n_{lang}".format(
            lst=", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang])),
            lang=lang,
        )
        for lang in _LANG_STOPWORDS
    )
    return f"""
        WITH base AS (
          SELECT doc_id, substr(coalesce(text, ''), 1, 200) AS head,
                 {_sql_tok("coalesce(text, '')")} AS toks
          FROM documents
        ),
        counts AS (
          SELECT doc_id, len(toks) AS n_tok, {script_cols}, {lang_cols}
          FROM base
        )
        SELECT doc_id,
               CASE
                 WHEN greatest(n_zh, n_ja, n_ko, n_ru) >= 3 THEN
                   CASE
                     WHEN n_zh >= n_ja AND n_zh >= n_ko AND n_zh >= n_ru THEN 'zh'
                     WHEN n_ja >= n_ko AND n_ja >= n_ru THEN 'ja'
                     WHEN n_ko >= n_ru THEN 'ko'
                     ELSE 'ru'
                   END
                 WHEN n_tok > 0 AND greatest(n_fr, n_es, n_en, n_de) > 0 THEN
                   CASE
                     WHEN n_fr >= n_es AND n_fr >= n_en AND n_fr >= n_de THEN 'fr'
                     WHEN n_es >= n_en AND n_es >= n_de THEN 'es'
                     WHEN n_en >= n_de THEN 'en'
                     ELSE 'de'
                   END
                 ELSE 'und'
               END AS lang_pred
        FROM counts
    """


def _q_fingerprint(sf_dir: str):
    """Document fingerprinting published as CONTENT GROUPS: the rolling
    hash itself is not SQL-expressible, but two docs share a fingerprint
    iff their token sequences are identical, so ``fp_group = min doc_id
    with the same fingerprint`` IS (a window min over the token-sequence
    string) — the group structure oracle-checks the fingerprint exactly
    (modulo 64-bit collisions, absent at sf scale)."""
    import pandas as _pd

    from horus_ner_ray.stages.analysis import fingerprint_dataset
    from horus_ner_ray.stages.dedupe import buckets_for_rows

    fp = fingerprint_dataset(_read_docs(sf_dir))
    nbk = buckets_for_rows(_n_rows(_docs(sf_dir)))

    def bucket(b: _pd.DataFrame) -> _pd.DataFrame:
        b = b.copy()
        h = b["fingerprint"].to_numpy(np.int64).astype(np.uint64)
        b["fbkt"] = ((h * np.uint64(0x9E3779B97F4A7C15))
                     % np.uint64(nbk)).astype(np.int64)
        return b

    def assign(g: _pd.DataFrame) -> _pd.DataFrame:
        g = g.copy()
        g["fp_group"] = g.groupby("fingerprint")["doc_id"].transform("min")
        return g[["doc_id", "fp_group"]]

    return (
        fp.map_batches(bucket, batch_format="pandas")
        .groupby("fbkt")
        .map_groups(lambda g: assign(g.drop(columns=["fbkt"])),
                    batch_format="pandas")
    )


def _q_transcripts_bm25(sf_dir: str):
    """Flagship over the synthetic transcript corpus (input_hint schema):
    synth -> build (rank doc ids, salted runs, k-way merge) -> actor-pool
    scoring -> e6 rerank.  DuckDB-oracle-checked: the SQL reproduces the
    rank doc-id rule (conv-offset + turn_idx) over the SAME part files;
    rank-identity vs the brute-force oracle is additionally asserted in
    pytest."""
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import score_queries
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION

    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    raw = score_queries(
        str(idx), reference_queries(k=TOPK * 3 + 20), concurrency=2
    ).to_pandas()
    return _e6_rerank(raw, "score", "doc_id", "score_e6")


def _q_bm25_topk_role(sf_dir: str):
    """Field-scoped BM25 (round 4): role='user' filter over the transcript
    index — the stored docstore role column becomes a query-time doc mask
    applied before top-k selection, with GLOBAL collection statistics
    (standard filtered-search semantics).  Reference analogue: the two
    per-channel evidence tables (horus0.1.5.db.sql:59-109)."""
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    eng = QueryEngine(str(idx))
    hits = [eng.search(q["text"], TOPK * 3 + 20, role="user")
            for q in reference_queries()]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _q_bm25_facets(sf_dir: str):
    """Facet panel over the transcript index: per (query, role), how many
    docs contain >= 1 query term — the full match set, not top-k (one
    postings decode per term/shard + the cached attribute arrays)."""
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    eng = QueryEngine(str(idx))
    rows = {"query_id": [], "role": [], "n_docs": []}
    for qid, q in enumerate(reference_queries()):
        for role, n in sorted(eng.facet_counts(q["text"], "role").items()):
            rows["query_id"].append(qid)
            rows["role"].append(role)
            rows["n_docs"].append(n)
    out = pd.DataFrame(rows)
    out["query_id"] = out["query_id"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out


_HISTO_INTERVAL_US = 3_600_000_000  # 1 hour


def _q_bm25_date_histogram(sf_dir: str):
    """Date-histogram aggregation over the FULL match set (the classic
    search-engine time facet): per query, matching docs bucketed by
    floor(ts_us / 1h).  Same cached transcript index and attribute-array
    access pattern as bm25_facets; null-ts docs omitted."""
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    eng = QueryEngine(str(idx))
    rows = {"query_id": [], "bucket": [], "n_docs": []}
    for qid, q in enumerate(reference_queries()):
        hist = eng.date_histogram(q["text"], interval_us=_HISTO_INTERVAL_US)
        for b, n in sorted(hist.items()):
            rows["query_id"].append(qid)
            rows["bucket"].append(b)
            rows["n_docs"].append(n)
    return pd.DataFrame({k: pd.Series(v, dtype=np.int64)
                         for k, v in rows.items()})


def _sql_bm25_date_histogram() -> str:
    """Date-histogram oracle: DISTINCT matching docs per (query, hour
    bucket) over the same transcript derivation.  Floor division is
    restated in pure integers — DuckDB's ``//`` truncates toward ZERO
    (verified: -7 // 2 = -3) while the engine's np.floor_divide floors
    toward -inf, so the SQL computes (x - nonneg_mod(x, iv)) / iv, which
    matches for negative epochs too."""
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    texts = [q["text"] for q in reference_queries()]
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, ts, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, ts, text
  FROM raw JOIN offs USING (conv_id)
),
tok AS (
  SELECT DISTINCT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
q(query_id, term) AS (VALUES {_sql_values_queries(texts)}),
matched AS (
  SELECT DISTINCT q.query_id, t.doc_id FROM q JOIN tok t USING (term)
)
SELECT m.query_id,
       ((epoch_us(d.ts)
         - ((epoch_us(d.ts) % {_HISTO_INTERVAL_US} + {_HISTO_INTERVAL_US})
            % {_HISTO_INTERVAL_US}))
        // {_HISTO_INTERVAL_US})::BIGINT AS bucket,
       count(*)::BIGINT AS n_docs
FROM matched m JOIN documents d USING (doc_id)
WHERE d.ts IS NOT NULL
GROUP BY 1, 2
"""


def _q_date_histogram_pipeline(sf_dir: str):
    """ES pipeline aggregations (cumulative_sum + derivative) over the
    date histogram: buckets densified min..max (min_doc_count=0), each
    row carrying the running total and the delta vs the previous bucket
    (first bucket's delta = its own count) — the shared
    ``histogram_pipeline`` rule.  SQL: generate_series densification +
    window sum/lag."""
    from horus_ner_ray.pipelines.query import QueryEngine, histogram_pipeline
    from horus_ner_ray.synth import reference_queries

    eng = QueryEngine(_tr_index_dir(sf_dir))
    rows = {"query_id": [], "bucket": [], "n_docs": [], "cum_docs": [],
            "delta": []}
    for qid, q in enumerate(reference_queries()):
        hist = eng.date_histogram(q["text"], interval_us=_HISTO_INTERVAL_US)
        for b, n, c, d in histogram_pipeline(hist):
            rows["query_id"].append(qid)
            rows["bucket"].append(b)
            rows["n_docs"].append(n)
            rows["cum_docs"].append(c)
            rows["delta"].append(d)
    return pd.DataFrame({k: pd.Series(v, dtype=np.int64)
                         for k, v in rows.items()})


def _sql_date_histogram_pipeline() -> str:
    base = _sql_bm25_date_histogram().strip()
    return f"""
WITH hist AS ({base}),
bounds AS (SELECT query_id, min(bucket) lo, max(bucket) hi
           FROM hist GROUP BY 1),
series AS (
  SELECT b.query_id, unnest(generate_series(b.lo, b.hi)) AS bucket
  FROM bounds b
),
dense AS (
  SELECT s.query_id, s.bucket, coalesce(h.n_docs, 0)::BIGINT AS n_docs
  FROM series s LEFT JOIN hist h USING (query_id, bucket)
)
SELECT query_id, bucket, n_docs,
       sum(n_docs) OVER (PARTITION BY query_id ORDER BY bucket)::BIGINT
         AS cum_docs,
       (n_docs - coalesce(lag(n_docs) OVER (PARTITION BY query_id
                                            ORDER BY bucket), 0))::BIGINT
         AS delta
FROM dense
ORDER BY query_id, bucket
"""


_AUTO_HISTO_TARGET = 24
_MOVING_W = 3


def _q_auto_date_histogram(sf_dir: str):
    """auto_date_histogram (ES aggregation): the interval is CHOSEN by
    the shared ladder rule (choose_auto_interval — smallest of 1s..365d
    whose densified span over the match set's ts bounds fits the target
    bucket count), then the ordinary date histogram at that interval.
    SQL restates the bounds, the ladder choice and the nonneg-mod floor
    bucketing."""
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.synth import reference_queries

    eng = QueryEngine(_tr_index_dir(sf_dir))
    rows = {"query_id": [], "interval_us": [], "bucket": [], "n_docs": []}
    for qid, q in enumerate(reference_queries()):
        iv, hist = eng.auto_date_histogram(q["text"],
                                           target_buckets=_AUTO_HISTO_TARGET)
        for b, n in sorted(hist.items()):
            rows["query_id"].append(qid)
            rows["interval_us"].append(iv)
            rows["bucket"].append(b)
            rows["n_docs"].append(n)
    return pd.DataFrame({k: pd.Series(v, dtype=np.int64)
                         for k, v in rows.items()})


def _sql_auto_date_histogram() -> str:
    from horus_ner_ray.pipelines.query import AUTO_HISTO_LADDER_US
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    texts = [q["text"] for q in reference_queries()]
    ladder = ", ".join(f"({iv})" for iv in AUTO_HISTO_LADDER_US)

    def fdiv(x: str, iv: str) -> str:  # floor division via nonneg mod
        return f"(({x} - (({x} % {iv} + {iv}) % {iv})) // {iv})"

    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, ts, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, ts, text
  FROM raw JOIN offs USING (conv_id)
),
tok AS (
  SELECT DISTINCT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
q(query_id, term) AS (VALUES {_sql_values_queries(texts)}),
matched AS (
  SELECT DISTINCT q.query_id, t.doc_id FROM q JOIN tok t USING (term)
),
mts AS (
  SELECT m.query_id, epoch_us(d.ts) AS t
  FROM matched m JOIN documents d USING (doc_id) WHERE d.ts IS NOT NULL
),
bounds AS (SELECT query_id, min(t) lo, max(t) hi FROM mts GROUP BY 1),
ladder(iv) AS (VALUES {ladder}),
feas AS (
  SELECT b.query_id, l.iv,
         {fdiv('b.hi', 'l.iv')} - {fdiv('b.lo', 'l.iv')} + 1 AS span
  FROM bounds b CROSS JOIN ladder l
),
chosen AS (
  SELECT query_id,
         coalesce(min(iv) FILTER (WHERE span <= {_AUTO_HISTO_TARGET}),
                  (SELECT max(iv) FROM ladder)) AS iv
  FROM feas GROUP BY 1
)
SELECT mts.query_id, c.iv::BIGINT AS interval_us,
       {fdiv('mts.t', 'c.iv')}::BIGINT AS bucket,
       count(*)::BIGINT AS n_docs
FROM mts JOIN chosen c USING (query_id)
GROUP BY 1, 2, 3
"""


def _q_moving_avg_histogram(sf_dir: str):
    """ES moving-function average over the date histogram: densified
    buckets, trailing-{_MOVING_W}-bucket count sum and its exact integer
    floor-mean (the shared histogram_moving rule; w_eff = min(W, buckets
    so far) keeps the warm-up exact).  SQL = window sum/count over ROWS
    W-1 PRECEDING with integer division."""
    from horus_ner_ray.pipelines.query import QueryEngine, histogram_moving
    from horus_ner_ray.synth import reference_queries

    eng = QueryEngine(_tr_index_dir(sf_dir))
    rows = {"query_id": [], "bucket": [], "n_docs": [], "mov_sum": [],
            "mavg_e6": []}
    for qid, q in enumerate(reference_queries()):
        hist = eng.date_histogram(q["text"], interval_us=_HISTO_INTERVAL_US)
        for b, n, s, a in histogram_moving(hist, _MOVING_W):
            rows["query_id"].append(qid)
            rows["bucket"].append(b)
            rows["n_docs"].append(n)
            rows["mov_sum"].append(s)
            rows["mavg_e6"].append(a)
    return pd.DataFrame({k: pd.Series(v, dtype=np.int64)
                         for k, v in rows.items()})


def _sql_moving_avg_histogram() -> str:
    base = _sql_bm25_date_histogram().strip()
    w = _MOVING_W
    return f"""
WITH hist AS ({base}),
bounds AS (SELECT query_id, min(bucket) lo, max(bucket) hi
           FROM hist GROUP BY 1),
series AS (
  SELECT b.query_id, unnest(generate_series(b.lo, b.hi)) AS bucket
  FROM bounds b
),
dense AS (
  SELECT s.query_id, s.bucket, coalesce(h.n_docs, 0)::BIGINT AS n_docs
  FROM series s LEFT JOIN hist h USING (query_id, bucket)
),
win AS (
  SELECT query_id, bucket, n_docs,
         sum(n_docs) OVER (PARTITION BY query_id ORDER BY bucket
                           ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW
                           )::BIGINT AS mov_sum,
         count(*) OVER (PARTITION BY query_id ORDER BY bucket
                        ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW
                        )::BIGINT AS w_eff
  FROM dense
)
SELECT query_id, bucket, n_docs, mov_sum,
       ((mov_sum * 1000000) // w_eff)::BIGINT AS mavg_e6
FROM win ORDER BY query_id, bucket
"""


def _sql_bm25_facets() -> str:
    """Facet oracle: DISTINCT matching docs per (query, role) over the
    same transcript derivation as the role-scoped BM25 oracle."""
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    texts = [q["text"] for q in reference_queries()]
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, role, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, role, text
  FROM raw JOIN offs USING (conv_id)
),
tok AS (
  SELECT DISTINCT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
q(query_id, term) AS (VALUES {_sql_values_queries(texts)}),
matched AS (
  SELECT DISTINCT q.query_id, t.doc_id FROM q JOIN tok t USING (term)
)
SELECT m.query_id, d.role, count(*)::BIGINT AS n_docs
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


_TS_WINDOW = ("2025-06-05T00:00:00", "2025-06-12T00:00:00")
_ROLE_WEIGHTS = {"user": 2.0, "assistant": 1.0, "tool": 0.5}


def _q_bm25_topk_weighted(sf_dir: str):
    """Field-WEIGHTED BM25 (round 4): each doc's accumulated score is
    multiplied once by its role's weight (user turns boosted, tool turns
    damped) — per-field weighting over the reference's evidence channels,
    rank order re-derived under the weighted scores."""
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    eng = QueryEngine(str(idx))
    hits = [eng.search(q["text"], TOPK * 3 + 20, role_weights=_ROLE_WEIGHTS)
            for q in reference_queries()]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_transcripts_bm25_weighted() -> str:
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    pre = f"""raw AS (
  SELECT conv_id, turn_idx, role, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, role, text
  FROM raw JOIN offs USING (conv_id)
),
"""
    return _sql_bm25([q["text"] for q in reference_queries()],
                     conjunctive=False, pre=pre, role_weights=_ROLE_WEIGHTS)


def _q_bm25_topk_time(sf_dir: str):
    """Time-scoped BM25 (round 4): inclusive ts window over the stored
    turn timestamps, mask applied before top-k, stats global — the
    time-partition filter any transcript-retention pipeline needs."""
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    files, _glob = _transcript_corpus(sf)
    idx = tmp / f"horus_tridx_v{INDEX_FORMAT_VERSION}_{sf}"
    if not (idx / "stats.json").exists():
        build_index(files, idx, PipelineConfig(num_shards=8))
    eng = QueryEngine(str(idx))
    hits = [eng.search(q["text"], TOPK * 3 + 20,
                       ts_min=_TS_WINDOW[0], ts_max=_TS_WINDOW[1])
            for q in reference_queries()]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_transcripts_bm25_time() -> str:
    """Time-window oracle: ts rides the documents CTE; ranked docs
    post-filter on the inclusive window, statistics stay global."""
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    lo, hi = _TS_WINDOW
    pre = f"""raw AS (
  SELECT conv_id, turn_idx, ts, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, ts, text
  FROM raw JOIN offs USING (conv_id)
),
"""
    return _sql_bm25([q["text"] for q in reference_queries()],
                     conjunctive=False, pre=pre, ts_window=(lo, hi))


# fixed phrase query set over the documents vocabulary (adjacent-pair
# semantics; last one is absent -> empty result)
PHRASE_QUERIES = ["batch join", "data stream", "table part value", "zzzqnotfound scan"]


def _q_bm25_phrase(sf_dir: str):
    """Exact phrase search (positions index, M6): candidates from posting
    intersection, positional adjacency verify, BM25 over member terms;
    e6-reranked like every scored driver query."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir, positions=True))
    hits = [eng.search_phrase(t, TOPK * 3 + 20) for t in PHRASE_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


QS_QUERIES = [
    '+data s* -dup "table hash"',     # must + prefix expansion + NOT + phrase
    "merge group fasx~1",             # OR with a fuzzy expansion clause
    "+scan +filter slow",             # conjunctive musts + should boost
    '"customer join" -small que*',    # phrase-only candidacy + NOT + prefix
    '-"table hash" table hash',       # banned phrase over an OR match set
]


def _q_bm25_query_string(sf_dir: str):
    """One-box query-string search (mode=qs; the Lucene-QueryParser
    subset of pipelines/query.parse_query_string): must/not terms,
    required and banned exact phrases, trailing-wildcard and fuzzy
    dictionary expansions — one flat clause algebra, BM25 over the
    distinct clause terms.  The SQL oracle re-parses the SAME strings
    through parse_query_string and restates candidacy (must counts,
    phrase adjacency, NOT-exists) plus the dfv-side expansions (LIKE /
    levenshtein), so the dialect's semantics are what's checked."""
    from horus_ner_ray.pipelines.query import QueryEngine

    eng = QueryEngine(_doc_index_dir(sf_dir, positions=True))
    hits = [eng.search_querystring(q, TOPK * 3 + 20) for q in QS_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_bm25_query_string() -> str:
    """Query-string oracle: clause sets come from the SHARED parser
    (parse_query_string — the spec under test is the resolution rule,
    like _sql_bm25_prefix's reuse of parse_prefix_query); expansion,
    candidacy and scoring all restate in SQL."""
    from horus_ner_ray.pipelines.query import parse_query_string

    qm_rows = ["(-1, '###none###')"]   # sentinels keep VALUES non-empty
    qex_rows = ["(-1, '###none###')"]
    qph_rows = ["(-1, '###none###')"]
    meta_rows: list[str] = []
    qs_parts: list[str] = []
    ph_parts: list[str] = []
    phban_parts: list[str] = []

    def _adj_select(qid: int, pidx: int, words: list[str]) -> str:
        n = len(words)
        cond = " AND ".join(f"arr[i+{j}] = '{t}'"
                            for j, t in enumerate(words))
        return (f"SELECT {qid} AS query_id, {pidx} AS ph, doc_id FROM tok "
                f"WHERE len(arr) >= {n} AND list_contains(list_transform("
                f"generate_series(1, len(arr) - {n - 1}), i -> {cond}), true)")

    for qid, qs in enumerate(QS_QUERIES):
        spec = parse_query_string(qs)
        must = sorted(spec["must"])
        for t in must:
            qm_rows.append(f"({qid}, '{t}')")
        meta_rows.append(f"({qid}, {len(must)}, {len(spec['phrases'])})")
        for t in sorted(spec["must_not"]):
            qex_rows.append(f"({qid}, '{t}')")
        lits = sorted(spec["should"])
        if lits:
            rows = ", ".join(f"({qid}, '{t}')" for t in lits)
            qs_parts.append(
                f"SELECT * FROM (VALUES {rows}) v(query_id, term)")
        for p in sorted(spec["prefixes"]):
            qs_parts.append(f"SELECT {qid} AS query_id, term FROM dfv "
                            f"WHERE term LIKE '{p}%'")
        for w, d in sorted(spec["fuzzies"]):
            qs_parts.append(f"SELECT {qid} AS query_id, term FROM dfv "
                            f"WHERE levenshtein(term, '{w}') <= {d}")
        for pidx, words in enumerate(spec["phrases"]):
            ph_parts.append(_adj_select(qid, pidx, words))
            for t in sorted(set(words)):
                qph_rows.append(f"({qid}, '{t}')")
        for words in spec["not_phrases"]:
            phban_parts.append(_adj_select(qid, 0, words))
    empty = ("SELECT -1 AS query_id, 0 AS ph, -1 AS doc_id WHERE 1 = 0")
    qs_sql = " UNION ".join(qs_parts) if qs_parts else (
        "SELECT -1 AS query_id, '###none###' AS term WHERE 1 = 0")
    ph_sql = "\n  UNION ALL ".join(ph_parts) if ph_parts else empty
    phban_sql = "\n  UNION ALL ".join(phban_parts) if phban_parts else empty
    return f"""
WITH tok AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
flat AS (SELECT doc_id, unnest(arr) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM flat GROUP BY 1, 2),
dl AS (SELECT doc_id, len(arr)::BIGINT dl FROM tok),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
qm(query_id, term) AS (VALUES {", ".join(qm_rows)}),
qex(query_id, term) AS (VALUES {", ".join(qex_rows)}),
qph(query_id, term) AS (VALUES {", ".join(qph_rows)}),
meta(query_id, nm, np) AS (VALUES {", ".join(meta_rows)}),
qsraw AS ({qs_sql}),
qsd AS (  -- SHOULD = literals + expansions, minus the MUST overlap
  SELECT DISTINCT u.query_id, u.term FROM qsraw u
  WHERE NOT EXISTS (SELECT 1 FROM qm
                    WHERE qm.query_id = u.query_id AND qm.term = u.term)
),
qall AS (  -- the distinct scoring set: must + should + phrase members
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, term FROM qm WHERE query_id >= 0
    UNION ALL SELECT query_id, term FROM qsd
    UNION ALL SELECT query_id, term FROM qph WHERE query_id >= 0)
),
must_hit AS (
  SELECT qm.query_id, tf.doc_id, count(DISTINCT qm.term) mc
  FROM qm JOIN tf USING (term) WHERE qm.query_id >= 0 GROUP BY 1, 2
),
ph_hit AS (
  SELECT query_id, doc_id, count(DISTINCT ph) pc FROM (
  {ph_sql}
  ) GROUP BY 1, 2
),
should_hit AS (
  SELECT qsd.query_id, tf.doc_id FROM qsd JOIN tf USING (term) GROUP BY 1, 2
),
phban AS (
  SELECT DISTINCT query_id, doc_id FROM (
  {phban_sql}
  )
),
base AS (
  SELECT query_id, doc_id FROM must_hit
  UNION SELECT query_id, doc_id FROM ph_hit
  UNION SELECT query_id, doc_id FROM should_hit
),
cand AS (
  SELECT b.query_id, b.doc_id
  FROM base b
  JOIN meta USING (query_id)
  LEFT JOIN must_hit mh ON mh.query_id = b.query_id AND mh.doc_id = b.doc_id
  LEFT JOIN ph_hit ph ON ph.query_id = b.query_id AND ph.doc_id = b.doc_id
  LEFT JOIN should_hit sh ON sh.query_id = b.query_id AND sh.doc_id = b.doc_id
  WHERE coalesce(mh.mc, 0) = meta.nm
    AND coalesce(ph.pc, 0) = meta.np
    AND (meta.nm + meta.np > 0 OR sh.doc_id IS NOT NULL)
    AND NOT EXISTS (SELECT 1 FROM qex e JOIN tf x ON x.term = e.term
                    AND x.doc_id = b.doc_id WHERE e.query_id = b.query_id)
    AND NOT EXISTS (SELECT 1 FROM phban pb WHERE pb.query_id = b.query_id
                    AND pb.doc_id = b.doc_id)
),
scored AS (
  SELECT c.query_id, c.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM cand c
  JOIN qall a ON a.query_id = c.query_id
  JOIN tf ON tf.doc_id = c.doc_id AND tf.term = a.term
  JOIN dfv ON dfv.term = a.term
  JOIN dl ON dl.doc_id = c.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM scored
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


_DSIR_K = 40
_DSIR_B = 16
_DSIR_SEED = 7
_DSIR_TARGET = "src0"


def _q_dsir_select(sf_dir: str):
    """DSIR data selection (stages/dsir.py — Xie et al., NeurIPS 2023):
    hashed-unigram bucket models (B=16, the shared SipHash term hash) of
    the TARGET slice (source='src0') vs the RAW pool, per-doc log
    importance weights as order-free e9-int sums, Gumbel-top-k resample
    keyed by splitmix64(doc_id XOR seed).  SQL restates the bucket
    models, the smoothing/ln arithmetic, the e9 quantization and the
    Gumbel draw; term hashes inline via _doc_vocab_hash_values (the
    closed-vocab precedent)."""
    import pyarrow.compute as pc_
    import ray.data as rd

    from horus_ner_ray.stages.dsir import dsir_select

    raw = rd.read_parquet(_docs(sf_dir), columns=["doc_id", "text", "source"])
    raw = raw.map_batches(
        lambda b: b.append_column(
            "is_target", pc_.equal(b["source"], _DSIR_TARGET)),
        batch_format="pyarrow", zero_copy_batch=True)
    out = dsir_select(raw, k=_DSIR_K, n_buckets=_DSIR_B, seed=_DSIR_SEED,
                      target_mask_col="is_target")
    return out[["rank", "doc_id", "w_e9", "key_e6"]].astype(np.int64)


def _sql_dsir_select() -> str:
    B = _DSIR_B
    h = _sql_splitmix64(f"xor(CAST(doc_id AS UBIGINT), "
                        f"CAST({_DSIR_SEED} AS UBIGINT))")
    return f"""
WITH th(term, h) AS (VALUES {_doc_vocab_hash_values()}),
tok AS (
  SELECT doc_id, source, unnest({_sql_tok()}) AS term FROM documents
),
tb AS (
  SELECT t.doc_id, t.source, CAST(th.h % {B} AS BIGINT) AS b
  FROM tok t JOIN th USING (term)
),
tcnt AS (SELECT b, count(*)::BIGINT n FROM tb
         WHERE source = '{_DSIR_TARGET}' GROUP BY 1),
rcnt AS (SELECT b, count(*)::BIGINT n FROM tb GROUP BY 1),
tt AS (SELECT coalesce(sum(n), 0)::BIGINT n FROM tcnt),
rt AS (SELECT coalesce(sum(n), 0)::BIGINT n FROM rcnt),
lr AS (
  SELECT bb.b,
         ln((coalesce(tc.n, 0) + 1.0) / ((SELECT n FROM tt) + {B}))
         - ln((coalesce(rc.n, 0) + 1.0) / ((SELECT n FROM rt) + {B})) AS lr
  FROM (SELECT unnest(generate_series(0, {B - 1}))::BIGINT AS b) bb
  LEFT JOIN tcnt tc USING (b) LEFT JOIN rcnt rc USING (b)
),
docb AS (SELECT doc_id, b, count(*)::DOUBLE c FROM tb GROUP BY 1, 2),
w AS (
  SELECT d.doc_id,
         sum(CAST(FLOOR(docb.c * lr.lr * 1e9 + 0.5) AS BIGINT)) AS w_e9
  FROM documents d
  LEFT JOIN docb ON docb.doc_id = d.doc_id
  LEFT JOIN lr ON lr.b = docb.b
  GROUP BY 1
),
g AS (
  SELECT doc_id, CAST(coalesce(w_e9, 0) AS BIGINT) AS w_e9,
         CAST(FLOOR((coalesce(w_e9, 0)::DOUBLE / 1e9
                     + (-ln(-ln((CAST(({h}) AS DOUBLE) + 1.0)
                                / 18446744073709551616.0))))
                    * 1e6 + 0.5) AS BIGINT) AS key_e6
  FROM w
),
ranked AS (
  SELECT row_number() OVER (ORDER BY key_e6 DESC, doc_id) AS rank,
         doc_id, w_e9, key_e6
  FROM g
)
SELECT rank, doc_id, w_e9, key_e6 FROM ranked WHERE rank <= {_DSIR_K}
"""


_TBM_BUDGET = 1500
_TBM_SEED = 13


def _q_token_budget_mix(sf_dir: str):
    """Token-budget mixture (functions/sampling.token_budget_mix — "take
    at most B tokens per source, pseudo-randomly"): maximal per-source
    prefix in splitmix64(doc_id XOR seed) hash order whose cumulative
    token count stays <= the budget.  Distributed as histogram
    refinement (bucketed token-sum combiner -> boundary-bucket resolve
    -> broadcast-cutoff filter map); the SQL states the defining window
    rule directly — sum(dl) OVER (PARTITION BY source ORDER BY h,
    doc_id) <= B."""
    import pyarrow as pa_
    import ray.data as rd

    from horus_ner_ray.functions.sampling import token_budget_mix
    from horus_ner_ray.stages.tokenize import token_counts

    docs = rd.read_parquet(_docs(sf_dir), columns=["doc_id", "text", "source"])

    def add_dl(b: pa_.Table) -> pa_.Table:
        return pa_.table({"source": b["source"], "doc_id": b["doc_id"],
                          "dl": pa_.array(token_counts(b["text"])
                                          .astype(np.int64), pa_.int64())})

    withdl = docs.map_batches(add_dl, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = token_budget_mix(withdl, "source", "doc_id", "dl",
                           budget=_TBM_BUDGET, seed=_TBM_SEED,
                           n_buckets=64).to_pandas()
    return (out[["source", "doc_id", "dl"]].astype({"doc_id": np.int64,
                                                    "dl": np.int64})
            .sort_values(["source", "doc_id"]).reset_index(drop=True))


def _sql_token_budget_mix() -> str:
    h = _sql_splitmix64(f"xor(CAST(doc_id AS UBIGINT), "
                        f"CAST({_TBM_SEED} AS UBIGINT))")
    return f"""
WITH d AS (
  SELECT doc_id, source, len({_sql_tok()})::BIGINT AS dl,
         {h} AS h
  FROM documents
),
c AS (
  SELECT source, doc_id, dl,
         sum(dl) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum
  FROM d
)
SELECT source, doc_id, dl FROM c WHERE cum <= {_TBM_BUDGET}
ORDER BY source, doc_id
"""


def _conll_sample_files() -> tuple[str, str, str]:
    """Deterministic CoNLL sample files (idempotent; written under
    GRAFT_TMP so the SQL oracle's read_text glob sees the SAME bytes).
    Returns (path_a, path_b, glob)."""
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp")) / "horus_conll_sample"
    tmp.mkdir(parents=True, exist_ok=True)
    a = tmp / "doc_a.conll"
    if not a.exists():
        a.write_bytes(b"Jim\tB-PER\nbought\tO\nshares\tO\n\n-DOCSTART-\tO\n\nEmpire\tB-ORG\nState\tI-ORG\n")
    b = tmp / "doc_b.conll"
    if not b.exists():
        b.write_bytes(b"hello\tO\nworld\tO\n")
    return str(a), str(b), str(tmp / "*.conll")


def _q_conll_source(sf_dir: str):
    """CoNLL/Ritter token-per-line source (SURVEY.md S2 non-Parquet half):
    deterministic sample files -> read_conll Dataset in the transcript
    schema; oracle-checked against DuckDB read_text + the same blank-line
    sentence grouping in SQL."""
    from horus_ner_ray.sources.conll import read_conll

    a, b, _glob = _conll_sample_files()
    out = read_conll([a, b], tag_index=1).to_pandas()
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _q_conll_roundtrip(sf_dir: str):
    """CoNLL writer (S7 sink half of the source/sink pair, reference
    src/horus_to_conll.py:117-164): parse the sample corpus, export it
    with write_conll, re-read the exported files.  Lossless round-trip ->
    the re-read answers to the SAME SQL oracle as conll_source."""
    import shutil

    from horus_ner_ray.sources.conll import read_conll, write_conll

    a, b, _glob = _conll_sample_files()
    out_dir = Path(os.environ.get("GRAFT_TMP", "/tmp")) / "horus_conll_export"
    shutil.rmtree(out_dir, ignore_errors=True)
    paths = write_conll(read_conll([a, b], tag_index=1), out_dir)
    out = read_conll(paths, tag_index=1).to_pandas()
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


GREP_CONTEXT_PATTERN = "tok00042"  # case-sensitive substring probe
# ("sessionmark" sits in ~all turns — no context structure to check)


def _q_grep_context(sf_dir: str):
    """Distributed grep with context (stages/windows.grep_context_dataset
    — ``grep -C 1`` over conversations): matching turns plus their ±1
    neighbors in the same conversation, flagged is_match.  One bucket
    shuffle + vectorized match/shift masks; the SQL restates the
    predicate with EXISTS over |turn distance| <= window."""
    import ray.data as rd

    from horus_ner_ray.stages.windows import grep_context_dataset

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "role",
                                         "text"])
    out = grep_context_dataset(ds, GREP_CONTEXT_PATTERN,
                               window=1).to_pandas()
    out["turn_idx"] = out["turn_idx"].astype(np.int64)
    out["n_chars"] = out["text"].str.len().astype(np.int64)
    return (out[["conv_id", "turn_idx", "role", "n_chars", "is_match"]]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def _sql_grep_context() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    p = GREP_CONTEXT_PATTERN
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, role, text FROM read_parquet('{glob}')
),
m AS (SELECT conv_id, turn_idx FROM raw WHERE contains(text, '{p}'))
SELECT r.conv_id, r.turn_idx::BIGINT AS turn_idx, r.role,
       length(r.text)::BIGINT AS n_chars,
       CASE WHEN contains(r.text, '{p}') THEN 1 ELSE 0 END::BIGINT
         AS is_match
FROM raw r
WHERE EXISTS (SELECT 1 FROM m
              WHERE m.conv_id = r.conv_id
                AND abs(m.turn_idx - r.turn_idx) <= 1)
ORDER BY r.conv_id, r.turn_idx
"""


def _jsonl_export_dir(sf_dir: str) -> str:
    """Deterministic JSONL export of the transcript corpus (written once
    under GRAFT_TMP; the SQL oracle reads the SAME bytes)."""
    import ray.data as rd

    from horus_ner_ray.sources.jsonl import write_jsonl

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    out = Path(os.environ.get("GRAFT_TMP", "/tmp")) / f"horus_jsonl_{sf}"
    marker = out / "state.done"
    if not marker.exists():
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        write_jsonl(rd.read_parquet(files), out)
        marker.write_text("ok")
    return str(out)


def _q_jsonl_source(sf_dir: str):
    """JSONL transcript source (sources/jsonl.py — the line-delimited
    interchange format; S2/S6 pair with write_jsonl): the corpus exports
    to one JSONL file per conversation (lossless, ISO-8601 ts), the
    reader parses it back into the transcript schema, and the oracle
    reads the SAME bytes with DuckDB read_json.  Published as per-turn
    (conv_id, turn_idx, role, n_chars, ts_us) — integers + strings, no
    float fragility."""
    from horus_ner_ray.sources.jsonl import read_jsonl_transcripts

    d = _jsonl_export_dir(sf_dir)
    files = sorted(str(p) for p in Path(d).glob("*.jsonl"))
    df = read_jsonl_transcripts(files).to_pandas()
    out = pd.DataFrame({
        "conv_id": df["conv_id"].astype(str),
        "turn_idx": df["turn_idx"].astype(np.int64),
        "role": df["role"].astype(str),
        "n_chars": df["text"].str.len().astype(np.int64),
        "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
    })
    return (out.sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))


def _sql_jsonl_source() -> str:
    d = _jsonl_export_dir(f"sf{_oracle_sf()}")
    return f"""
SELECT conv_id, turn_idx::BIGINT AS turn_idx, role,
       length(text)::BIGINT AS n_chars,
       epoch_us(CAST(ts AS TIMESTAMP))::BIGINT AS ts_us
FROM read_json('{d}/*.jsonl',
               columns={{'conv_id': 'VARCHAR', 'turn_idx': 'BIGINT',
                         'role': 'VARCHAR', 'text': 'VARCHAR',
                         'tool': 'VARCHAR', 'ts': 'VARCHAR'}},
               format='newline_delimited')
ORDER BY conv_id, turn_idx
"""


def _csv_export_dir(sf_dir: str) -> str:
    """Deterministic CSV export of the transcript corpus (written once
    under GRAFT_TMP; the SQL oracle reads the SAME bytes)."""
    import ray.data as rd

    from horus_ner_ray.sources.csvfile import write_csv

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    out = Path(os.environ.get("GRAFT_TMP", "/tmp")) / f"horus_csv_{sf}"
    marker = out / "state.done"
    if not marker.exists():
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        write_csv(rd.read_parquet(files), out)
        marker.write_text("ok")
    return str(out)


def _q_csv_source(sf_dir: str):
    """CSV transcript source (sources/csvfile.py — S2/S6 pair with
    write_csv): the corpus exports to one quoted CSV per conversation
    (lossless, ISO-8601 ts), the reader parses it back into the
    transcript schema, and the oracle reads the SAME bytes with DuckDB
    read_csv.  Published as per-turn (conv_id, turn_idx, role, n_chars,
    ts_us) — integers + strings, no float fragility."""
    from horus_ner_ray.sources.csvfile import read_csv_transcripts

    d = _csv_export_dir(sf_dir)
    files = sorted(str(p) for p in Path(d).glob("*.csv"))
    df = read_csv_transcripts(files).to_pandas()
    out = pd.DataFrame({
        "conv_id": df["conv_id"].astype(str),
        "turn_idx": df["turn_idx"].astype(np.int64),
        "role": df["role"].astype(str),
        "n_chars": df["text"].str.len().astype(np.int64),
        "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
    })
    return (out.sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))


def _sql_csv_source() -> str:
    d = _csv_export_dir(f"sf{_oracle_sf()}")
    return f"""
SELECT conv_id, turn_idx::BIGINT AS turn_idx, role,
       -- DuckDB reads an UNQUOTED empty CSV field as NULL where the
       -- Arrow reader keeps '' (both are faithful CSV; the writer only
       -- quotes when needed) — normalize to the empty string
       length(coalesce(text, ''))::BIGINT AS n_chars,
       epoch_us(CAST(ts AS TIMESTAMP))::BIGINT AS ts_us
FROM read_csv('{d}/*.csv', header=true,
              columns={{'conv_id': 'VARCHAR', 'turn_idx': 'BIGINT',
                        'role': 'VARCHAR', 'text': 'VARCHAR',
                        'tool': 'VARCHAR', 'ts': 'VARCHAR'}})
ORDER BY conv_id, turn_idx
"""


_TRANSLATE_MAP = {"el": "the", "la": "the", "der": "the", "die": "the"}
_TRANSLATE_LANGS = ("de", "es", "fr")


def _q_translate_hook(sf_dir: str):
    """Translate seam (SURVEY.md M10): lang-gated DictTranslator actor
    stage.  Gated on the documents table's OWN lang column (the langid-
    heuristic-gated variant stays in pytest) so the whole hook — gate,
    whitespace-normalizing word map, pass-through rows — oracle-checks
    against SQL regexp_split + list_transform."""
    from horus_ner_ray.stages.translate import DictTranslator, translate_dataset

    import ray.data as rd

    docs = rd.read_parquet(_docs(sf_dir), columns=["doc_id", "lang", "text"])
    out = translate_dataset(
        docs,
        translator_cls=DictTranslator,
        ctor_kwargs={"mapping": dict(_TRANSLATE_MAP)},
        lang_col="lang",
        langs=_TRANSLATE_LANGS,
    )
    return out.select_columns(["doc_id", "lang", "text_translated"])


_NB_CACHE: dict[str, pd.DataFrame] = {}


def _nb_scored_frame(sf_dir: str) -> pd.DataFrame:
    """Shared by the classifier/eval queries: fit multinomial NB on the
    documents corpus (label = lang), broadcast the weight matrix, score
    every doc.  Cached per sf_dir so the three queries fit once."""
    if sf_dir not in _NB_CACHE:
        import ray.data as rd

        from horus_ner_ray.stages.classify import fit_multinomial_nb, nb_score_dataset

        ds = rd.read_parquet(_docs(sf_dir), columns=["doc_id", "lang", "text"])
        model = fit_multinomial_nb(ds, label_col="lang")
        out = nb_score_dataset(ds, model, keep_cols=["doc_id", "lang"]).to_pandas()
        _NB_CACHE[sf_dir] = (out.rename(columns={"pred_label": "pred_lang"})
                             .sort_values("doc_id").reset_index(drop=True))
    return _NB_CACHE[sf_dir]


def _q_nb_predictions(sf_dir: str):
    """Trained-classifier scoring stage (reference's core value-add,
    src/classifiers/bow_tfidf.py:8-30 / horusdemo.py:39-85): distributed
    multinomial-NB fit -> ray.put broadcast -> vectorized actor scoring.
    Integer e9 log-scores make the argmax and score exactly SQL-checkable."""
    out = _nb_scored_frame(sf_dir)
    return (out[["doc_id", "pred_lang", "score_e9"]]
            .astype({"doc_id": np.int64, "score_e9": np.int64})
            .reset_index(drop=True))


_CV_K = 3
_CV_SEED = 17


def _q_cv_predictions(sf_dir: str):
    """k-fold cross-validated NB (stages/crossval.py — the reference's
    benchmark-split evaluation loop, deterministic + distributed):
    content-keyed folds splitmix64(doc_id XOR seed) % k, per-fold fit on
    the complement, out-of-fold scoring, streaming union.  The SQL
    re-derives the folds and restates per-fold counts/vocab/priors plus
    the e9-int NB arithmetic — what's checked is that every fold's model
    really saw only its training complement."""
    import ray.data as rd

    from horus_ner_ray.stages.crossval import nb_cross_val

    docs = rd.read_parquet(_docs(sf_dir), columns=["doc_id", "lang", "text"])
    out = nb_cross_val(docs, k_folds=_CV_K, seed=_CV_SEED).to_pandas()
    out = out.rename(columns={"pred_label": "pred_lang"})
    return (out[["doc_id", "fold", "lang", "pred_lang", "score_e9"]]
            .astype({"doc_id": np.int64, "fold": np.int64,
                     "score_e9": np.int64})
            .sort_values("doc_id").reset_index(drop=True))


def _sql_cv_predictions() -> str:
    h = _sql_splitmix64(f"xor(CAST(doc_id AS UBIGINT), "
                        f"CAST({_CV_SEED} AS UBIGINT))")
    return f"""
WITH docs AS (
  SELECT doc_id, lang, text,
         CAST(({h}) % {_CV_K} AS BIGINT) AS fold
  FROM documents
),
toks AS (
  SELECT doc_id, lang, fold, unnest({_sql_tok()}) AS term FROM docs
),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM toks GROUP BY 1, 2),
folds AS (SELECT DISTINCT fold FROM docs),
-- per held-out fold f: training statistics over fold <> f
cnt AS (
  SELECT f.fold, t.lang, t.term, count(*)::BIGINT c
  FROM folds f JOIN toks t ON t.fold <> f.fold GROUP BY 1, 2, 3
),
tot AS (SELECT fold, lang, sum(c)::BIGINT tot FROM cnt GROUP BY 1, 2),
vq AS (
  SELECT f.fold, count(DISTINCT t.term)::BIGINT v
  FROM folds f JOIN toks t ON t.fold <> f.fold GROUP BY 1
),
ndq AS (
  SELECT f.fold, count(*)::BIGINT n
  FROM folds f JOIN docs d ON d.fold <> f.fold GROUP BY 1
),
ndc AS (
  SELECT f.fold, d.lang, count(*)::BIGINT nc
  FROM folds f JOIN docs d ON d.fold <> f.fold GROUP BY 1, 2
),
contrib AS (
  SELECT d.doc_id, cl.lang AS cls,
         sum(tf.tf * CAST(FLOOR(ln(
             (coalesce(cnt.c, 0) + 1)::DOUBLE / (tot.tot + vq.v)
           ) * 1e9 + 0.5) AS BIGINT))::BIGINT AS sum_llh
  FROM tf
  JOIN docs d USING (doc_id)
  JOIN ndc cl ON cl.fold = d.fold
  JOIN tot ON tot.fold = d.fold AND tot.lang = cl.lang
  JOIN vq ON vq.fold = d.fold
  LEFT JOIN cnt ON cnt.fold = d.fold AND cnt.lang = cl.lang
              AND cnt.term = tf.term
  GROUP BY 1, 2
),
scores AS (
  SELECT d.doc_id, d.fold, d.lang AS lang_true, cl.lang AS cls,
         coalesce(co.sum_llh, 0)
         + CAST(FLOOR(ln(cl.nc::DOUBLE / ndq.n) * 1e9 + 0.5) AS BIGINT)
           AS score_e9
  FROM docs d
  JOIN ndc cl ON cl.fold = d.fold
  JOIN ndq ON ndq.fold = d.fold
  LEFT JOIN contrib co ON co.doc_id = d.doc_id AND co.cls = cl.lang
)
SELECT doc_id, fold, lang_true AS lang, cls AS pred_lang, score_e9
FROM scores
QUALIFY row_number() OVER (
  PARTITION BY doc_id ORDER BY score_e9 DESC, cls) = 1
ORDER BY doc_id
"""


def _q_chi2_terms(sf_dir: str):
    """Chi-square term selection by class (stages/chisq.py — Manning/
    Schuetze one-vs-rest 2x2 chi2; the class-discriminative-vocabulary
    pass of a curation pipeline).  One combiner map_batches builds the
    (term, label) document-frequency contingency (per-doc distinct via
    in-batch arrow group_by), the vocab x classes-bounded table finishes
    driver-side with PYTHON-int exact ``chi2_e6 = N(ad-bc)^2 * 1e6 //
    ((a+b)(c+d)(a+c)(b+d))``; the SQL restates the same integer division
    in HUGEINT.  Degenerate margins publish 0."""
    import ray.data as rd

    from horus_ner_ray.stages.chisq import chi2_terms

    docs = rd.read_parquet(_docs(sf_dir), columns=["lang", "text"])
    return chi2_terms(docs, label_col="lang", text_col="text")


def _sql_chi2_terms() -> str:
    h = "CAST(a AS HUGEINT)"
    return f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(list_distinct({_sql_tok()})) AS term
  FROM documents
),
cont AS (
  SELECT term, lang AS label, count(*)::BIGINT AS a FROM toks GROUP BY 1, 2
),
dft AS (SELECT term, sum(a)::BIGINT AS df_t FROM cont GROUP BY 1),
cls AS (SELECT lang AS label, count(*)::BIGINT AS nc
        FROM documents GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS nn FROM documents),
wide AS (
  SELECT cont.label, cont.term, {h} AS a,
         CAST(df_t - a AS HUGEINT) AS b,
         CAST(nc - a AS HUGEINT) AS c,
         CAST(nn - nc - (df_t - a) AS HUGEINT) AS d,
         CAST(nn AS HUGEINT) AS nn, df_t
  FROM cont JOIN dft USING (term) JOIN cls USING (label), n
)
SELECT label, term, CAST(a AS BIGINT) AS df_in_class, df_t AS df_total,
       CAST(CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) = 0 THEN 0
            ELSE nn * (a*d - b*c) * (a*d - b*c) * 1000000
                 // ((a+b)*(c+d)*(a+c)*(b+d)) END AS BIGINT) AS chi2_e6
FROM wide ORDER BY label, term
"""


def _q_eval_confusion(sf_dir: str):
    """Confusion matrix (reference src/eval.py:67-134): groupby over
    (true label, predicted label) via the combiner pattern."""
    import ray.data as rd

    from horus_ner_ray.stages.evalmetrics import confusion_matrix_dataset

    scored = _nb_scored_frame(sf_dir)
    cm = confusion_matrix_dataset(
        rd.from_pandas(scored[["lang", "pred_lang"]]),
        label_col="lang", pred_col="pred_lang").to_pandas()
    return (cm.astype({"n": np.int64})
            .sort_values(["label", "pred"]).reset_index(drop=True))


def _q_eval_metrics(sf_dir: str):
    """Per-class precision/recall/F1 from the confusion matrix
    (reference simple_indicators/report.py:17-50)."""
    import ray.data as rd

    from horus_ner_ray.stages.evalmetrics import (
        confusion_matrix_dataset,
        precision_recall_frame,
    )

    scored = _nb_scored_frame(sf_dir)
    cm = confusion_matrix_dataset(
        rd.from_pandas(scored[["lang", "pred_lang"]]),
        label_col="lang", pred_col="pred_lang").to_pandas()
    pr = precision_recall_frame(cm)
    for c in ("precision", "recall", "f1"):
        pr[c + "_e6"] = _e6(pr[c])
    return (pr[["cls", "tp", "fp", "fn", "precision_e6", "recall_e6", "f1_e6"]]
            .sort_values("cls").reset_index(drop=True))


def _hist_wide(out: pd.DataFrame) -> pd.DataFrame:
    """(media_id, n_px, hist-list) -> exact-int wide histogram rows."""
    hist = np.stack(out["hist"].to_numpy()).astype(np.int64)
    cols = {"media_id": out["media_id"].to_numpy(np.int64),
            "n_px": out["n_px"].to_numpy(np.int64)}
    for b in range(hist.shape[1]):
        cols[f"h{b:02d}"] = hist[:, b]
    return (pd.DataFrame(cols).sort_values("media_id")
            .reset_index(drop=True))


def _q_media_features(sf_dir: str):
    """REAL multimodal decode (round 4): genuine PNG/BMP containers decoded
    by the pure-stdlib codec (zlib IDAT + vectorized scanline unfilter,
    stages/media_codecs.py) in an actor pool; features are the exact-int
    16-bin intensity histograms of the decoded samples (the normalized
    float feature vectors of ``decode_features_dataset`` stay the library
    surface, pytest-covered — the driver emits the integer sufficient
    statistics so the oracle hash compares exactly).  ORACLE: the decoded
    PIXELS inline as SQL VALUES (the one non-SQL primitive, zlib inflate
    — the `_doc_vocab_hash_values` precedent) and the binning/counting
    restates entirely in SQL."""
    import pyarrow.compute as pc
    import ray.data as rd

    from horus_ner_ray.stages.media_classify import media_hist_dataset
    from horus_ner_ray.stages.multimodal import synth_real_media_table

    tbl = synth_real_media_table(n=48, seed=42)
    imgs = tbl.filter(pc.not_equal(tbl["media_type"], "audio/wav"))
    out = media_hist_dataset(rd.from_arrow(imgs), keep_label=False).to_pandas()
    return _hist_wide(out)


def _q_media_predictions(sf_dir: str):
    """TRAINED classifier over DECODED media content (round 5; reference
    A4 residual — sift.py:7-37 SVM+BoW, cnn.py:71-159): real stdlib pixel
    decode -> exact int64 intensity histograms (the bag-of-visual-words
    analogue) -> distributed multinomial-NB fit -> broadcast-once int64
    matmul scoring.  ORACLE: the deterministic histograms inline as SQL
    VALUES and the entire fit + argmax re-derives in DuckDB (the decode
    itself is covered by media_codecs' byte-exact round-trip pytests)."""
    import shutil
    import tempfile

    import ray.data as rd

    from horus_ner_ray.stages.media_classify import (
        media_nb_predictions,
        synth_labeled_media_table,
    )

    ds = rd.from_arrow(synth_labeled_media_table(n=96, seed=42))
    ckpt = tempfile.mkdtemp(prefix="horus_media_hist_")
    try:
        out = media_nb_predictions(ds, checkpoint_dir=ckpt).to_pandas()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    out = out.rename(columns={"label": "label_true"})
    return (out[["media_id", "label_true", "pred_label", "score_e9"]]
            .astype({"media_id": np.int64, "score_e9": np.int64})
            .sort_values("media_id").reset_index(drop=True))


def _sql_media_nb(n: int = 96, seed: int = 42) -> str:
    """DuckDB oracle for media_predictions: the per-image quantized
    histograms (pure function of the seeded synth corpus; decode covered
    by codec round-trip pytests) inline as VALUES, then the closed-form
    multinomial NB — e9-int log-likelihoods, integer score sums, argmax
    tie to the smallest class — re-derives ENTIRELY in SQL, mirroring
    _sql_nb_pred's arithmetic points exactly."""
    from horus_ner_ray.stages.media_classify import synth_labeled_media_table
    from horus_ner_ray.stages.media_codecs import decode_image

    t = synth_labeled_media_table(n=n, seed=seed)
    tf_rows, doc_rows = [], []
    for mid, lab, pay in zip(t["media_id"].to_pylist(),
                             t["label"].to_pylist(),
                             t["payload"].to_pylist()):
        px = decode_image(pay).reshape(-1)
        h = np.bincount(px.astype(np.int64) >> 4, minlength=16)[:16]
        doc_rows.append(f"({mid}, '{lab}')")
        for b in np.flatnonzero(h):
            tf_rows.append(f"({mid}, 'b{b:02d}', {int(h[b])})")
    return f"""
        WITH tf(media_id, term, tf) AS (VALUES {", ".join(tf_rows)}),
        doc(media_id, label) AS (VALUES {", ".join(doc_rows)}),
        cnt AS (SELECT d.label, tf.term, sum(tf.tf)::BIGINT AS c
                FROM tf JOIN doc d USING (media_id) GROUP BY 1, 2),
        tot AS (SELECT label, sum(c)::BIGINT AS tot FROM cnt GROUP BY 1),
        vq AS (SELECT count(DISTINCT term)::BIGINT AS v FROM tf),
        ndq AS (SELECT count(*)::BIGINT AS n FROM doc),
        ndc AS (SELECT label, count(*)::BIGINT AS nc FROM doc GROUP BY 1),
        classes AS (SELECT label AS cls FROM ndc),
        contrib AS (
          SELECT tf.media_id, cl.cls,
                 sum(tf.tf * CAST(FLOOR(ln(
                     (coalesce(cnt.c, 0) + 1)::DOUBLE
                     / (tot.tot + (SELECT v FROM vq))
                   ) * 1e9 + 0.5) AS BIGINT))::BIGINT AS sum_llh
          FROM tf CROSS JOIN classes cl
          JOIN tot ON tot.label = cl.cls
          LEFT JOIN cnt ON cnt.label = cl.cls AND cnt.term = tf.term
          GROUP BY 1, 2
        ),
        scores AS (
          SELECT d.media_id, d.label AS label_true, cl.cls,
                 coalesce(co.sum_llh, 0)
                 + CAST(FLOOR(ln(ndc.nc::DOUBLE / (SELECT n FROM ndq))
                              * 1e9 + 0.5) AS BIGINT) AS score_e9
          FROM doc d CROSS JOIN classes cl
          JOIN ndc ON ndc.label = cl.cls
          LEFT JOIN contrib co ON co.media_id = d.media_id AND co.cls = cl.cls
        )
        SELECT media_id, label_true, cls AS pred_label, score_e9
        FROM scores
        QUALIFY row_number() OVER (
          PARTITION BY media_id ORDER BY score_e9 DESC, cls) = 1
    """


def _sql_hexbyte(pos: str) -> str:
    """SQL expression: byte value at 0-based position ``pos`` of a
    hex-string column ``hx`` (two lowercase hex chars per byte)."""
    return (f"((strpos('0123456789abcdef', substr(hx, 2*({pos})+1, 1))-1)*16"
            f" + strpos('0123456789abcdef', substr(hx, 2*({pos})+2, 1))-1)")


def _sql_le16(p: str) -> str:
    return f"({_sql_hexbyte(p)} + 256*{_sql_hexbyte(f'({p})+1')})"


def _sql_be16(p: str) -> str:
    return f"(256*{_sql_hexbyte(p)} + {_sql_hexbyte(f'({p})+1')})"


def _sql_le32(p: str) -> str:
    return (f"({_sql_hexbyte(p)} + 256*{_sql_hexbyte(f'({p})+1')}"
            f" + 65536*{_sql_hexbyte(f'({p})+2')}"
            f" + 16777216*{_sql_hexbyte(f'({p})+3')})")


def _sql_be32(p: str) -> str:
    return (f"(16777216*{_sql_hexbyte(p)} + 65536*{_sql_hexbyte(f'({p})+1')}"
            f" + 256*{_sql_hexbyte(f'({p})+2')} + {_sql_hexbyte(f'({p})+3')})")


def _sql_le32s(p: str) -> str:
    u = _sql_le32(p)
    return f"(CASE WHEN {u} >= 2147483648 THEN {u} - 4294967296 ELSE {u} END)"


def _sql_wav_stats(n: int = 48, seed: int = 42) -> str:
    """DuckDB oracle for wav_stats (round 5; was rows-only): the raw
    payload BYTES inline as hex VALUES and the SQL itself parses the RIFF/
    WAVE container — header fields at their spec offsets, then every
    16-bit little-endian PCM sample via generate_series + substr — and
    re-derives duration/RMS/peak.  Exactness: samples q are integers, so
    sum(q*q) is an exact BIGINT and numpy's pairwise mean of q^2/2^30
    (<= 42 significant bits over the synth's <=2000 samples) equals the
    single float64 division SQL performs; sqrt/multiply are IEEE
    correctly-rounded on both sides, so the e6 quantization agrees
    bitwise.  Non-RIFF rows (the PNG/BMP payloads) only need the magic,
    so their hex inlines truncate to a 16-byte prefix."""
    from horus_ner_ray.stages.multimodal import synth_real_media_table

    t = synth_real_media_table(n=n, seed=seed)
    vals = ", ".join(
        f"({mid}, '{(pay if pay[:4] == b'RIFF' else pay[:16]).hex()}')"
        for mid, pay in zip(t["media_id"].to_pylist(),
                            t["payload"].to_pylist())
    )
    return f"""
        WITH pay(media_id, hx) AS (VALUES {vals}),
        wav AS (
          SELECT media_id::BIGINT AS media_id, hx FROM pay
          WHERE substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645'
                AND substr(hx, 25, 8) = '666d7420' AND substr(hx, 73, 8) = '64617461'
        ),
        hdr AS (
          SELECT media_id, hx,
                 {_sql_le16('22')}::BIGINT AS n_channels,
                 {_sql_le32('24')}::BIGINT AS sample_rate,
                 {_sql_le32('40')}::BIGINT AS data_bytes
          FROM wav
        ),
        smp AS (
          SELECT media_id, n_channels, sample_rate, data_bytes,
                 unnest(generate_series(0, data_bytes // 2 - 1)) AS i
          FROM hdr
        ),
        q AS (
          SELECT media_id, n_channels, sample_rate, data_bytes,
                 CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS q
          FROM (SELECT *, {_sql_le16('44 + 2*i')} AS v
                FROM smp JOIN hdr USING (media_id, n_channels, sample_rate, data_bytes))
        ),
        st AS (
          SELECT media_id, any_value(sample_rate) AS sample_rate,
                 any_value(n_channels) AS n_channels,
                 (any_value(data_bytes) // (2 * any_value(n_channels)))::BIGINT AS n_samples,
                 count(*)::BIGINT AS n,
                 sum(q*q)::BIGINT AS ss, max(abs(q))::BIGINT AS mx
          FROM q GROUP BY media_id
        )
        SELECT media_id, sample_rate, n_channels, n_samples,
               CAST(FLOOR((n_samples::DOUBLE / sample_rate) * 1e6 + 0.5) AS BIGINT) AS duration_e6,
               CAST(FLOOR(sqrt((ss::DOUBLE / 1073741824.0) / n) * 1e6 + 0.5) AS BIGINT) AS rms_e6,
               CAST(FLOOR((mx::DOUBLE / 32768.0) * 1e6 + 0.5) AS BIGINT) AS peak_e6,
               TRUE AS ok
        FROM st
        UNION ALL
        SELECT media_id::BIGINT, 0, 0, 0, 0, 0, 0, FALSE
        FROM pay WHERE media_id NOT IN (SELECT media_id FROM wav)
    """


def _sql_image_meta(n: int = 64, seed: int = 11) -> str:
    """DuckDB oracle for image_meta (round 5; was rows-only): payload
    bytes inline as hex VALUES and the SQL re-implements the header
    sniffers — PNG signature + IHDR big-endian dims, GIF87a/89a
    little-endian dims, BMP signed little-endian dims (non-positive width
    -> unknown, negative height -> abs), and the genuine JPEG marker walk
    (fill-byte skipping, no-payload markers, segment-length hops, first
    SOFn frame header) as a recursive CTE — with the byte parser's
    priority order (stages/multimodal.py:192-277)."""
    from horus_ner_ray.stages.multimodal import synth_image_headers

    t = synth_image_headers(n=n, seed=seed)
    vals = ", ".join(
        f"({mid}, '{pay.hex()}')"
        for mid, pay in zip(t["media_id"].to_pylist(),
                            t["payload"].to_pylist())
    )
    hp1 = _sql_hexbyte("j.i+1")
    is_png = ("L >= 24 AND substr(hx, 1, 16) = '89504e470d0a1a0a' "
              "AND substr(hx, 25, 8) = '49484452'")
    is_gif = ("L >= 10 AND (substr(hx, 1, 12) = '474946383761' "
              "OR substr(hx, 1, 12) = '474946383961')")
    is_bmp = f"L >= 26 AND substr(hx, 1, 4) = '424d' AND {_sql_le32s('18')} > 0"
    return f"""
        WITH RECURSIVE pay(media_id, hx) AS (VALUES {vals}),
        p AS (SELECT media_id::BIGINT AS media_id, hx,
                     (length(hx) // 2)::BIGINT AS L FROM pay),
        jw(media_id, i, w, h) AS (
          SELECT media_id, 2::BIGINT, NULL::BIGINT, NULL::BIGINT
          FROM p WHERE L >= 4 AND substr(hx, 1, 4) = 'ffd8'
          UNION ALL
          SELECT j.media_id,
                 CASE
                   WHEN {hp1} = 255 THEN j.i + 1
                   WHEN {hp1} IN (216, 1) OR {hp1} BETWEEN 208 AND 215
                     THEN j.i + 2
                   ELSE j.i + 2 + {_sql_be16('j.i+2')}
                 END,
                 CASE WHEN {hp1} BETWEEN 192 AND 207
                           AND {hp1} NOT IN (196, 200, 204)
                      THEN {_sql_be16('j.i+7')} END,
                 CASE WHEN {hp1} BETWEEN 192 AND 207
                           AND {hp1} NOT IN (196, 200, 204)
                      THEN {_sql_be16('j.i+5')} END
          FROM jw j JOIN p USING (media_id)
          WHERE j.w IS NULL AND j.i + 9 <= p.L AND {_sql_hexbyte('j.i')} = 255
        ),
        jres AS (
          SELECT media_id, any_value(w) AS w, any_value(h) AS h
          FROM jw WHERE w IS NOT NULL GROUP BY media_id
        )
        SELECT p.media_id,
          CASE WHEN {is_png} THEN 'png'
               WHEN j.w IS NOT NULL THEN 'jpeg'
               WHEN {is_gif} THEN 'gif'
               WHEN {is_bmp} THEN 'bmp'
               ELSE 'unknown' END AS format,
          CASE WHEN {is_png} THEN {_sql_be32('16')}
               WHEN j.w IS NOT NULL THEN j.w
               WHEN {is_gif} THEN {_sql_le16('6')}
               WHEN {is_bmp} THEN {_sql_le32s('18')}
               ELSE 0 END::BIGINT AS width,
          CASE WHEN {is_png} THEN {_sql_be32('20')}
               WHEN j.w IS NOT NULL THEN j.h
               WHEN {is_gif} THEN {_sql_le16('8')}
               WHEN {is_bmp} THEN abs({_sql_le32s('22')})
               ELSE 0 END::BIGINT AS height,
          L AS n_bytes
        FROM p LEFT JOIN jres j USING (media_id)
    """


def _q_wav_stats(sf_dir: str):
    """REAL WAV/PCM audio features (stdlib wave + numpy): sample rate,
    counts, e6-int duration/RMS/peak per payload.  ORACLE (round 5): the
    SQL parses the same payload bytes itself — see _sql_wav_stats."""
    import ray.data as rd

    from horus_ner_ray.stages.multimodal import (
        audio_features_dataset,
        synth_real_media_table,
    )

    media = rd.from_arrow(synth_real_media_table(n=48, seed=42))
    return audio_features_dataset(media)


def _q_image_meta(sf_dir: str):
    """REAL image container parsing (no codec libs): sniff PNG/JPEG/GIF/BMP
    and read width/height from the genuine header byte layouts.  ORACLE
    (round 5): the SQL re-parses the same bytes, including a recursive-CTE
    JPEG marker walk — see _sql_image_meta."""
    import ray.data as rd

    from horus_ner_ray.stages.multimodal import (
        image_header_meta_dataset,
        synth_image_headers,
    )

    media = rd.from_arrow(synth_image_headers(n=64, seed=11))
    return image_header_meta_dataset(media)


def _q_jpeg_features(sf_dir: str):
    """REAL baseline-JPEG entropy decode (round 5; stages/jpeg.py — spec
    FDCT/Huffman both directions, the encoder supplying conforming test
    vectors): genuine JPEG payloads -> exact int64 intensity histograms
    through the load-once actor pool.  ORACLE: the decoded pixels inline
    as SQL VALUES (Huffman+IDCT is the one non-SQL primitive, evaluated
    in Python per the `_doc_vocab_hash_values` precedent) and the
    binning/counting restates in SQL; the decode itself is additionally
    pinned by tolerance + hash regression pytests (tests/test_jpeg.py)."""
    import ray.data as rd

    from horus_ner_ray.stages.media_classify import media_hist_dataset
    from horus_ner_ray.stages.multimodal import synth_jpeg_media_table

    ds = rd.from_arrow(synth_jpeg_media_table(n=32, seed=19))
    out = media_hist_dataset(ds, keep_label=False).to_pandas()
    return _hist_wide(out)


def _sql_pixel_hist(table: "pa.Table") -> str:
    """Pixel-histogram oracle shared by media_features / jpeg_features:
    each payload's DECODED samples inline as one (media_id, INTEGER[])
    VALUES row — the single non-SQL primitive (zlib inflate for PNG,
    Huffman+IDCT for JPEG, row unfiltering for BMP) evaluated in Python
    over the seeded synth corpus, the `_doc_vocab_hash_values` precedent
    — while the 16-bin quantization, per-bin counts and sample totals
    restate entirely in SQL."""
    from horus_ner_ray.stages.media_codecs import decode_image

    rows = []
    for mid, pay in zip(table["media_id"].to_pylist(),
                        table["payload"].to_pylist()):
        px = decode_image(pay).reshape(-1)
        lst = ", ".join(str(int(x)) for x in px)
        rows.append(f"({mid}, [{lst}]::INTEGER[])")
    hcols = ",\n       ".join(
        f"coalesce(max(CASE WHEN b = {b} THEN c END), 0)::BIGINT AS h{b:02d}"
        for b in range(16))
    return f"""
WITH px(media_id, pxs) AS (VALUES {", ".join(rows)}),
flat AS (SELECT media_id, unnest(pxs) AS p FROM px),
hist AS (SELECT media_id, p // 16 AS b, count(*)::BIGINT c
         FROM flat GROUP BY 1, 2),
n AS (SELECT media_id, count(*)::BIGINT n_px FROM flat GROUP BY 1)
SELECT n.media_id, n.n_px,
       {hcols}
FROM n LEFT JOIN hist USING (media_id)
GROUP BY 1, 2
"""


def _sql_media_features() -> str:
    import pyarrow.compute as _pc

    from horus_ner_ray.stages.multimodal import synth_real_media_table

    t = synth_real_media_table(n=48, seed=42)
    return _sql_pixel_hist(
        t.filter(_pc.not_equal(t["media_type"], "audio/wav")))


def _sql_jpeg_features() -> str:
    from horus_ner_ray.stages.multimodal import synth_jpeg_media_table

    return _sql_pixel_hist(synth_jpeg_media_table(n=32, seed=19))


def _q_gif_pixels(sf_dir: str):
    """REAL GIF LZW decode (round 5; stages/gif.py — variable-width LZW
    both directions, color tables, 4-pass interlace): genuine GIF89a
    payloads -> exact per-image pixel stats (count, 16-bin histogram,
    position-weighted sum) through the load-once actor pool.  ORACLE:
    GIF is lossless and the synth pixels are a closed form in
    (media_id, row, col[, channel]), so the SQL re-derives the expected
    decoded raster with generate_series arithmetic — the wsum term pins
    every sample to its exact position, so LZW/deinterlace defects break
    the hash even when the histogram would survive them."""
    import ray.data as rd

    from horus_ner_ray.stages.multimodal import (
        decode_pixel_stats_dataset,
        synth_gif_media_table,
    )

    ds = rd.from_arrow(synth_gif_media_table(n=30))
    out = decode_pixel_stats_dataset(ds).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def _sql_gif_pixels(n: int = 30) -> str:
    """DuckDB oracle for gif_pixels: re-derives the closed-form raster of
    synth_gif_media_table / gif_pattern_pixels (multimodal.py) purely in
    SQL — image dims and per-pixel values are integer arithmetic in
    (media_id, row, col[, channel]) — and aggregates the same count /
    position-weighted sum / 16-bin histogram the Ray side computes from
    the ACTUAL decoded LZW bytes.  Losslessness of GIF is the bridge:
    decode(encode(pattern)) == pattern, so any codec or row-order defect
    on the Ray side diverges from this SQL."""
    hist_cols = ",\n               ".join(
        f"SUM(CASE WHEN val // 16 = {b} THEN 1 ELSE 0 END)::BIGINT AS h{b:02d}"
        for b in range(16))
    return f"""
        WITH imgs AS (
          SELECT i::BIGINT AS media_id,
                 (5 + (i*7) % 29)::BIGINT AS h,
                 (5 + (i*11) % 31)::BIGINT AS w
          FROM (SELECT unnest(generate_series(0, {n - 1})) AS i)
        ),
        rws AS (SELECT media_id, h, w, unnest(generate_series(0, h - 1)) AS r FROM imgs),
        cells AS (SELECT media_id, h, w, r, unnest(generate_series(0, w - 1)) AS c FROM rws),
        gray AS (
          SELECT media_id, r*w + c + 1 AS pos,
                 ((1 + media_id % 5)*r + (1 + media_id % 7)*c + (media_id*13) % 256) % 256 AS val
          FROM cells WHERE media_id % 2 = 0
        ),
        rgbc AS (
          SELECT media_id, w, r, c, unnest(generate_series(0, 2)) AS ch
          FROM cells WHERE media_id % 2 = 1
        ),
        rgb AS (
          SELECT media_id, (r*w + c)*3 + ch + 1 AS pos,
                 CASE ch
                   WHEN 0 THEN (((r + 3*c + media_id) % (7 + media_id % 9))*37 + media_id) % 256
                   WHEN 1 THEN (((r + 3*c + media_id) % (7 + media_id % 9))*59 + 2*media_id) % 256
                   ELSE        (((r + 3*c + media_id) % (7 + media_id % 9))*83 + 3*media_id) % 256
                 END AS val
          FROM rgbc
        ),
        allpx AS (SELECT * FROM gray UNION ALL SELECT * FROM rgb)
        SELECT media_id,
               COUNT(*)::BIGINT AS n_px,
               SUM(val * pos)::BIGINT AS wsum,
               {hist_cols}
        FROM allpx GROUP BY media_id ORDER BY media_id
    """


def _q_window_analytics(sf_dir: str):
    """SQL window-function family (row_number/lag/running-sum/rank/
    dense_rank) over PARTITION BY user ORDER BY (ts, event_id) — the
    reference's sequential per-sentence passes (horusdemo.py:110-126)
    generalised to the standard analytic-clause operator."""
    import ray.data as rd

    from horus_ner_ray.stages.analytic import window_functions_dataset
    from horus_ner_ray.stages.dedupe import buckets_for_rows

    path = str(Path(sf_dir) / "events.parquet")
    ds = rd.read_parquet(path, columns=["event_id", "user_id", "ts", "value"])
    out = window_functions_dataset(
        ds, n_buckets=buckets_for_rows(_n_rows(path))
    ).to_pandas()
    cols = ["event_id", "user_id", "rn", "prev_value_e6",
            "running_value_e6", "value_rank", "value_dense_rank"]
    return out[cols].astype(np.int64)


def _q_gopher_filter(sf_dir: str):
    """Gopher-rule (Rae et al. 2021, App. A1.1) corpus quality filter:
    per-doc rule metrics (e6 fixed-point fracs) + keep flag."""
    from horus_ner_ray.stages.analysis import gopher_quality_dataset

    return gopher_quality_dataset(_read_docs(sf_dir))


def _pii_aug_batch(batch):
    """Deterministic synthetic-PII augmentation (every third doc gains an
    email/phone/IPv4 suffix derived from its id) — shared by pii_redact
    and the transform-then-reindex query; the SQL restates it verbatim."""
    import pyarrow as pa
    import pyarrow.compute as pc

    did = np.asarray(batch["doc_id"], dtype=np.int64)
    text = np.asarray(pc.fill_null(batch["text"], ""), dtype=object).astype(str)
    ds = did.astype(str)
    full = np.char.add(
        np.char.add(np.char.add(" contact user", ds),
                    "@example.com or 555-123-4567 at 10.0."),
        np.char.add((did % 256).astype(str), ".77"),
    )
    suffix = np.where(did % 3 == 0, full, "")
    return pa.table({"doc_id": batch["doc_id"],
                     "text": pa.array(np.char.add(text, suffix))})


def _q_pii_redact(sf_dir: str):
    """PII redaction (email/phone/IPv4 -> sentinels) with per-doc match
    counts.  The corpus carries no natural PII, so every third doc is
    deterministically augmented with synthetic PII derived from its doc_id
    — the SQL oracle applies the identical augmentation, so counts AND the
    redacted text hash-match."""
    from horus_ner_ray.stages.analysis import redact_pii_dataset

    aug = _pii_aug_batch

    docs = _read_docs(sf_dir).map_batches(aug, batch_format="pyarrow",
                                          zero_copy_batch=True)
    return redact_pii_dataset(docs)


def _q_bm25_redacted(sf_dir: str):
    """TRANSFORM-THEN-REINDEX (the curation composition a production
    pipeline runs before serving): augment -> redact PII
    (stages/analysis.redact_pii_dataset) -> land the redacted corpus as a
    fragment -> ordinary provided-mode build -> BM25.  The SQL chains the
    identical augmentation + regexp_replace stack into a documents CTE
    and runs the shared scoring body, so what's checked is that the
    SERVED index reflects the transform exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine
    from horus_ner_ray.stages.analysis import redact_pii_dataset
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION

    key = hashlib.sha256(str(Path(sf_dir).resolve()).encode()).hexdigest()[:12]
    tmp = Path(os.environ.get("GRAFT_TMP", "/tmp"))
    idx = tmp / f"horus_docidx_red_v{INDEX_FORMAT_VERSION}_{key}"
    marker = idx / "state.done"
    if not marker.exists():
        import shutil

        shutil.rmtree(idx, ignore_errors=True)
        docs = _read_docs(sf_dir).map_batches(
            _pii_aug_batch, batch_format="pyarrow", zero_copy_batch=True)
        red = redact_pii_dataset(docs).to_pandas()  # sf-test-sized
        red = red.sort_values("doc_id").reset_index(drop=True)
        f = tmp / f"horus_red_docs_{key}.parquet"
        pq.write_table(
            pa.table({"doc_id": pa.array(red["doc_id"].to_numpy(np.int64),
                                         pa.int64()),
                      "text": pa.array(red["redacted"].astype(str),
                                       pa.string())}), f)
        build_index([str(f)], idx,
                    PipelineConfig(num_shards=4, doc_id_mode="provided"))
        marker.write_text("ok")
    eng = QueryEngine(str(idx))
    hits = [eng.search(t, TOPK * 3 + 20) for t in DOC_QUERIES]
    return _e6_rerank(_hits_frame(hits), "score", "doc_id", "score_e6")


def _sql_bm25_redacted() -> str:
    """The redaction chain (same regex stack as the pii_redact oracle)
    becomes the documents CTE; MATERIALIZED so the scoring body's many
    references don't re-run the regexp_replace stack."""
    pre = r"""aug AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0
         THEN text || ' contact user' || doc_id
              || '@example.com or 555-123-4567 at 10.0.'
              || (doc_id % 256) || '.77'
         ELSE text END AS t
  FROM main.documents
),
documents AS MATERIALIZED (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(t,
          '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b\d{3}[\- ]\d{3}[\- ]\d{4}\b', '<PHONE>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text
  FROM aug
),
"""
    return _sql_bm25(DOC_QUERIES, conjunctive=False, pre=pre)


def _q_bpe_pairs(sf_dir: str):
    """Top-100 adjacent token pairs (one BPE merge-count round, Sennrich
    et al. 2016) over the documents table."""
    from horus_ner_ray.stages.analysis import bpe_pair_counts_dataset

    df = bpe_pair_counts_dataset(_read_docs(sf_dir)).to_pandas()
    df = df.sort_values(["n", "pair"], ascending=[False, True],
                        kind="stable").head(100)
    return df.reset_index(drop=True)


def _q_price_quantiles_cont(sf_dir: str):
    """Interpolated (percentile_cont) quantiles via the same streaming
    histogram-refinement selection as price_quantiles — two order stats
    per q, DuckDB's exact interpolation arithmetic."""
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_cont

    ds = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_extendedprice"])
    out = quantile_cont(ds, "l_extendedprice",
                        [0.1, 0.25, 0.5, 0.75, 0.9, 0.99], gather_limit=100_000)
    out["q_pct"] = (out["q"] * 100).astype(np.int64)
    out["value_e6"] = _e6(out["value"])
    return out[["q_pct", "value_e6"]]


_PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_events_pivot(sf_dir: str):
    """Crosstab: per-user event-type counts as wide int columns."""
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import pivot_counts_dataset

    ds = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id", "event_type"])
    return pivot_counts_dataset(ds, "user_id", "event_type",
                                _PIVOT_EVENT_TYPES)


_TOPICS = {
    "data": ["data", "table", "column", "row"],
    "perf": ["fast", "slow", "big", "small"],
    "query": ["query", "filter", "scan", "sort"],
}


def _sql_kmeans_ctes(k: int, n_iter: int, dim: int = 64,
                     prefix: str = "", src: str | None = None):
    """Unrolled Lloyd's k-means as DuckDB CTEs — same deterministic init
    (k smallest vec_ids), same squared-L2 inner-product expansion, same
    order-free e6-integer centroid sums as stages/clustering.py.  Shared
    by the kmeans_clusters and ann_ivf oracles; ``prefix``/``src`` let
    the PQ oracle run one independent chain per subspace over a
    sub-sliced embedding source."""
    e = f"{prefix}emb"
    dims = f"{prefix}dims"
    if src is None:
        src = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings"

    def dist_cte(name: str, cents: str) -> str:
        return f"""
        {name} AS MATERIALIZED (
          SELECT {e}.vec_id, {cents}.cluster,
                 list_inner_product({e}.e, {e}.e)
                 - 2 * list_inner_product({e}.e, {cents}.c)
                 + list_inner_product({cents}.c, {cents}.c) AS dist
          FROM {e} CROSS JOIN {cents}
        )"""

    def argmin_cte(name: str, dists: str) -> str:
        return f"""
        {name} AS MATERIALIZED (
          SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (
                     PARTITION BY vec_id ORDER BY dist, cluster) AS rk
            FROM {dists}) WHERE rk = 1
        )"""

    def update_cte(mname: str, cname: str, assign: str, prev: str) -> str:
        return f"""
        {mname} AS MATERIALIZED (
          SELECT {assign}.cluster, {dims}.i,
                 sum(CAST(FLOOR({e}.e[{dims}.i] * 1e6 + 0.5) AS BIGINT)) AS s,
                 count(*) AS cnt
          FROM {e} JOIN {assign} USING (vec_id) CROSS JOIN {dims}
          GROUP BY 1, 2
        ),
        {cname} AS MATERIALIZED (
          SELECT {prev}.cluster,
                 CASE WHEN count({mname}.i) = 0 THEN any_value({prev}.c)
                      ELSE list({mname}.s / ({mname}.cnt * 1e6)
                                ORDER BY {mname}.i) END AS c
          FROM {prev} LEFT JOIN {mname} USING (cluster)
          GROUP BY {prev}.cluster
        )"""

    ctes = [f"""
        {e} AS MATERIALIZED ({src}),
        {dims} AS (SELECT unnest(range(1, {dim + 1})) AS i),
        {prefix}c0 AS MATERIALIZED (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, e AS c
          FROM {e} ORDER BY vec_id LIMIT {k}
        )"""]
    prev = f"{prefix}c0"
    for it in range(1, n_iter + 1):
        ctes.append(dist_cte(f"{prefix}d{it}", prev))
        ctes.append(argmin_cte(f"{prefix}a{it}", f"{prefix}d{it}"))
        ctes.append(update_cte(f"{prefix}m{it}", f"{prefix}c{it}",
                               f"{prefix}a{it}", prev))
        prev = f"{prefix}c{it}"
    ctes.append(dist_cte(f"{prefix}dfin", prev))
    ctes.append(argmin_cte(f"{prefix}afin", f"{prefix}dfin"))
    # callers get the chain plus the names of the final assignment CTE
    # ('afin': vec_id -> cluster) and the final centroid CTE
    return ctes, f"{prefix}afin", prev


def _sql_kmeans(k: int, n_iter: int, dim: int = 64) -> str:
    ctes, assign, _cent = _sql_kmeans_ctes(k, n_iter, dim)
    return ("WITH " + ",".join(ctes)
            + f"\nSELECT vec_id, cluster::BIGINT AS cluster FROM {assign}")


def _sql_pq_chains(dim: int = 64):
    """One unrolled per-subspace k-means chain per PQ subspace (prefixes
    p0_..p{M-1}_), each over the 1-based-inclusive list slice of its
    dims.  Returns (all ctes, [assign names], [centroid names])."""
    dsub = dim // _PQ_M
    ctes: list[str] = []
    assigns: list[str] = []
    cents: list[str] = []
    for mi in range(_PQ_M):
        lo, hi = mi * dsub + 1, (mi + 1) * dsub
        src = (f"SELECT vec_id, (CAST(embedding AS DOUBLE[]))[{lo}:{hi}] "
               f"AS e FROM embeddings")
        c, a, ce = _sql_kmeans_ctes(_PQ_KS, _PQ_ITERS, dim=dsub,
                                    prefix=f"p{mi}_", src=src)
        ctes.extend(c)
        assigns.append(a)
        cents.append(ce)
    return ctes, assigns, cents


def _sql_pq_codes(dim: int = 64) -> str:
    ctes, assigns, _cents = _sql_pq_chains(dim)
    joins = " ".join(f"JOIN {a} a{i} USING (vec_id)"
                     for i, a in enumerate(assigns[1:], start=1))
    cols = ", ".join(f"a{i}.cluster::BIGINT AS code_{i}"
                     for i in range(_PQ_M))
    return ("WITH " + ",".join(ctes) + f"""
        SELECT a0.vec_id, {cols}
        FROM {assigns[0]} a0 {joins}""")


def _sql_pq_ann(topk: int, dim: int = 64) -> str:
    """ADC oracle: per query and subspace, the exact squared distance
    from the query's sub-slice to EVERY centroid (the same inner-product
    expansion as the fit); each vector's approximate distance joins its
    four assigned codes to those tables and sums left-associated —
    the engine's accumulation order."""
    dsub = dim // _PQ_M
    ctes, assigns, cents = _sql_pq_chains(dim)
    q_ctes = []
    for mi in range(_PQ_M):
        lo, hi = mi * dsub + 1, (mi + 1) * dsub
        q_ctes.append(f"""
        q{mi} AS (
          SELECT vec_id AS query_id,
                 (CAST(embedding AS DOUBLE[]))[{lo}:{hi}] AS e
          FROM embeddings WHERE vec_id < 5
        ),
        qd{mi} AS (
          SELECT q.query_id, {cents[mi]}.cluster,
                 list_inner_product(q.e, q.e)
                 - 2 * list_inner_product(q.e, {cents[mi]}.c)
                 + list_inner_product({cents[mi]}.c, {cents[mi]}.c) AS dist
          FROM q{mi} q CROSS JOIN {cents[mi]}
        )""")
    code_joins = " ".join(f"JOIN {a} a{i} USING (vec_id)"
                          for i, a in enumerate(assigns[1:], start=1))
    qd_joins = " ".join(
        f"JOIN qd{i} ON qd{i}.query_id = qd0.query_id "
        f"AND qd{i}.cluster = a{i}.cluster"
        for i in range(1, _PQ_M))
    adist = " + ".join(f"qd{i}.dist" for i in range(_PQ_M))
    return ("WITH " + ",".join(ctes) + "," + ",".join(q_ctes) + f""",
        scored AS (
          SELECT qd0.query_id, a0.vec_id, {adist} AS adist
          FROM {assigns[0]} a0 {code_joins}
          JOIN qd0 ON qd0.cluster = a0.cluster
          {qd_joins}
        ),
        ranked AS (
          SELECT query_id, vec_id,
                 CAST(FLOOR(adist * 1e6 + 0.5) AS BIGINT) AS adist_e6,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY CAST(FLOOR(adist * 1e6 + 0.5) AS BIGINT),
                            vec_id) AS rk
          FROM scored
        )
        SELECT query_id, rk AS rank, vec_id, adist_e6
        FROM ranked WHERE rk <= {topk}""")


def _sql_ivfpq_ann(topk: int, dim: int = 64) -> str:
    """IVFPQ oracle: the coarse kmeans chain (prefix g_) gives partition
    assignment + per-query probes; the per-subspace PQ chains give codes
    + ADC tables; candidates = vectors whose coarse cluster is probed,
    ranked by the explicit left-associated ADC sum."""
    dsub = dim // _PQ_M
    gc, g_assign, g_cent = _sql_kmeans_ctes(_IVF_K, _IVF_ITERS, dim=dim,
                                            prefix="g_")
    pctes, assigns, cents = _sql_pq_chains(dim)
    q_ctes = [f"""
        gq AS (SELECT vec_id AS query_id, e FROM g_emb WHERE vec_id < 5),
        gqd AS (
          SELECT gq.query_id, {g_cent}.cluster,
                 list_inner_product(gq.e, gq.e)
                 - 2 * list_inner_product(gq.e, {g_cent}.c)
                 + list_inner_product({g_cent}.c, {g_cent}.c) AS dist
          FROM gq CROSS JOIN {g_cent}
        ),
        probes AS (
          SELECT query_id, cluster FROM (
            SELECT query_id, cluster,
                   row_number() OVER (
                     PARTITION BY query_id ORDER BY dist, cluster) AS rk
            FROM gqd) WHERE rk <= {_IVF_NPROBE}
        )"""]
    for mi in range(_PQ_M):
        lo, hi = mi * dsub + 1, (mi + 1) * dsub
        q_ctes.append(f"""
        q{mi} AS (
          SELECT vec_id AS query_id,
                 (CAST(embedding AS DOUBLE[]))[{lo}:{hi}] AS e
          FROM embeddings WHERE vec_id < 5
        ),
        qd{mi} AS (
          SELECT q.query_id, {cents[mi]}.cluster,
                 list_inner_product(q.e, q.e)
                 - 2 * list_inner_product(q.e, {cents[mi]}.c)
                 + list_inner_product({cents[mi]}.c, {cents[mi]}.c) AS dist
          FROM q{mi} q CROSS JOIN {cents[mi]}
        )""")
    code_joins = " ".join(f"JOIN {a} a{i} USING (vec_id)"
                          for i, a in enumerate(assigns[1:], start=1))
    qd_joins = " ".join(
        f"JOIN qd{i} ON qd{i}.query_id = pb.query_id "
        f"AND qd{i}.cluster = a{i}.cluster"
        for i in range(1, _PQ_M))
    adist = " + ".join(f"qd{i}.dist" for i in range(_PQ_M))
    return ("WITH " + ",".join(gc + pctes) + "," + ",".join(q_ctes) + f""",
        scored AS (
          SELECT pb.query_id, a0.vec_id, {adist} AS adist
          FROM {assigns[0]} a0 {code_joins}
          JOIN {g_assign} ga USING (vec_id)
          JOIN probes pb ON pb.cluster = ga.cluster
          JOIN qd0 ON qd0.query_id = pb.query_id
                  AND qd0.cluster = a0.cluster
          {qd_joins}
        ),
        ranked AS (
          SELECT query_id, vec_id,
                 CAST(FLOOR(adist * 1e6 + 0.5) AS BIGINT) AS adist_e6,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY CAST(FLOOR(adist * 1e6 + 0.5) AS BIGINT),
                            vec_id) AS rk
          FROM scored
        )
        SELECT query_id, rk AS rank, vec_id, adist_e6
        FROM ranked WHERE rk <= {topk}""")


def _sql_ann_ivf(k_centroids: int, n_iter: int, nprobe: int, topk: int,
                 dim: int = 64) -> str:
    """Pruned-probe IVF oracle: the SAME unrolled deterministic k-means
    chain the ``kmeans_clusters`` query hash-matches gives the coarse
    quantizer and assignment; per query (vec_id < 5), the nprobe nearest
    centroids by the identical squared-L2 expansion (ties -> lowest
    cluster) select the candidate partitions, and the exact cosine top-k
    within the union of probed lists ranks by (cosine_e6 DESC, vec_id) —
    so the conformance hash checks the PRUNING itself, not a recall
    bound."""
    ctes, assign, cent = _sql_kmeans_ctes(k_centroids, n_iter, dim)
    return ("WITH " + ",".join(ctes) + f""",
        q AS (SELECT vec_id AS query_id, e FROM emb WHERE vec_id < 5),
        qd AS (
          SELECT q.query_id, {cent}.cluster,
                 list_inner_product(q.e, q.e)
                 - 2 * list_inner_product(q.e, {cent}.c)
                 + list_inner_product({cent}.c, {cent}.c) AS dist
          FROM q CROSS JOIN {cent}
        ),
        probes AS (
          SELECT query_id, cluster FROM (
            SELECT query_id, cluster,
                   row_number() OVER (
                     PARTITION BY query_id ORDER BY dist, cluster) AS rk
            FROM qd) WHERE rk <= {nprobe}
        ),
        cand AS (
          SELECT p.query_id, a.vec_id
          FROM probes p JOIN {assign} a USING (cluster)
        ),
        scored AS (
          SELECT c.query_id, c.vec_id,
                 CAST(FLOOR(list_cosine_similarity(qe.e, ve.e) * 1e6 + 0.5)
                      AS BIGINT) AS cosine_e6
          FROM cand c
          JOIN emb qe ON qe.vec_id = c.query_id
          JOIN emb ve ON ve.vec_id = c.vec_id
        ),
        ranked AS (
          SELECT query_id, vec_id, cosine_e6,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine_e6 DESC, vec_id) AS rk
          FROM scored
        )
        SELECT query_id, rk AS rank, vec_id, cosine_e6
        FROM ranked WHERE rk <= {topk}""")


def _sql_topic_seed_values() -> str:
    return ", ".join(f"('{t}', '{name}')"
                     for name in sorted(_TOPICS)
                     for t in _TOPICS[name])


def _q_topic_scores(sf_dir: str):
    """Seed-term topic scorer (reference A2 topic-model scorer as a
    closed-form TF-IDF-mass model): integer e6 scores + argmax topic."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from horus_ner_ray.stages.termstats import term_df_dataset
    from horus_ner_ray.stages.topics import topic_score_dataset

    seed = sorted({t for ts in _TOPICS.values() for t in ts})
    seed_arr = pa.array(seed)
    dfs = (
        term_df_dataset(_read_docs(sf_dir))
        .map_batches(lambda b: b.filter(pc.is_in(b["term"], value_set=seed_arr)),
                     batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    df_map = dict(zip(dfs["term"], dfs["df"].astype(int)))
    return topic_score_dataset(_read_docs(sf_dir), _TOPICS, df_map,
                               n_docs=_n_rows(_docs(sf_dir)))


def _q_consecutive_events(sf_dir: str):
    """Per-user consecutive-repeat collapse (stream dedup before counting):
    hash-bucket shuffle, one sort + vectorized previous-row compare per
    bucket (stages/windows.collapse_repeats_dataset)."""
    import ray.data as rd

    from horus_ner_ray.stages.windows import collapse_repeats_dataset

    ds = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["event_id", "user_id", "ts", "event_type"])
    return collapse_repeats_dataset(ds)


def _q_auto_stopwords(sf_dir: str):
    """Corpus-driven stoplist discovery: terms present in >= 79% of docs
    (integer cross-multiplication — exact, no float threshold).  The
    classic index-construction preamble; feeds PipelineConfig.stopwords."""
    from horus_ner_ray.stages.termstats import term_df_dataset

    n = _n_rows(_docs(sf_dir))
    df = term_df_dataset(_read_docs(sf_dir)).to_pandas()
    out = df[df["df"] * 100 >= 79 * n].sort_values("term").reset_index(drop=True)
    return out


def _q_doc_keywords(sf_dir: str):
    """Per-document keyword extraction: top-3 TF-IDF terms (exact-int
    weights, deterministic (w desc, term asc) cut) via the simjoin weight
    head + one doc-bucket co-group (stages/simjoin.doc_keywords)."""
    from horus_ner_ray.stages.simjoin import doc_keywords

    n = _n_rows(_docs(sf_dir))
    out = doc_keywords(_read_docs(sf_dir), n_docs=n, k=3).to_pandas()
    return (out.sort_values(["doc_id", "kw_rank"]).reset_index(drop=True)
            [["doc_id", "kw_rank", "term", "w"]])


def _q_tfidf_cosine_pairs(sf_dir: str):
    """Sparse TF-IDF cosine document-similarity join (stages/simjoin.py):
    term-wise pair generation (no all-pairs), exact integer dots/norms,
    float tail mirrored verbatim by the oracle.  The partial table
    checkpoints to a query-owned tempdir, removed after consumption."""
    import shutil
    import tempfile

    from horus_ner_ray.stages.simjoin import tfidf_cosine_pairs

    n = _n_rows(_docs(sf_dir))
    ckpt = tempfile.mkdtemp(prefix="horus_simjoin_q_")
    try:
        out = tfidf_cosine_pairs(
            _read_docs(sf_dir), n_docs=n, threshold=0.9,
            checkpoint_dir=ckpt).to_pandas()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("doc_a", "doc_b", "cosine_e6")})
    return (out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
            .astype(np.int64))


def _q_heavy_hitters(sf_dir: str):
    """Top-20 most frequent user_ids with EXACT counts via the two-pass
    Misra-Gries candidates + verify sketch (stages/heavyhitters.py): no
    global per-key groupby — per-batch bounded summaries, a broadcast
    candidate array and a combiner-sized exact pass.  strict=True means
    the result carries an exactness certificate (n-th count strictly
    beats total/(capacity+1)), so the DuckDB exact-top-20 oracle is a
    true equality, not an approximation check."""
    import ray.data as rd

    from horus_ner_ray.stages.heavyhitters import heavy_hitters

    ds = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id"])
    out = heavy_hitters(ds, "user_id", n_top=20, capacity=256)
    return out.astype(np.int64)


def _q_users_per_type(sf_dir: str):
    """Exact grouped count-distinct (stages/groupwise.py
    grouped_count_distinct): per-batch pair dedupe -> pair groupby ->
    per-group partial sums; shuffle volume is O(distinct pairs).  The
    exact counterpart of the HLL sketch query."""
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import grouped_count_distinct

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["event_type", "user_id"])
    out = grouped_count_distinct(ev, "event_type", "user_id",
                                 alias="n_users").to_pandas()
    return (out.astype({"n_users": np.int64})
            .sort_values("event_type").reset_index(drop=True))


def _q_top_event_per_user(sf_dir: str):
    """Most frequent event_type per user (stages/groupwise.py
    grouped_mode): combiner pair counts -> pair groupby -> top-1 per
    group with (count desc, value asc) tie-break."""
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import grouped_mode

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id", "event_type"])
    out = grouped_mode(ev, "user_id", "event_type").to_pandas()
    return (out.astype({"user_id": np.int64, "n": np.int64})
            .sort_values("user_id").reset_index(drop=True))


def _q_topic_predictions(sf_dir: str):
    """TRAINED topic model (A2 as a learned scorer, round 4): seed-lexicon
    weak labels bootstrap a distributed multinomial-NB fit; the broadcast
    weights then score EVERY document (including docs the lexicon could
    not label).  e6/e9 integer arithmetic end-to-end -> SQL-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from horus_ner_ray.stages.termstats import term_df_dataset
    from horus_ner_ray.stages.topics import topic_nb_predictions

    seed = sorted({t for ts in _TOPICS.values() for t in ts})
    seed_arr = pa.array(seed)
    dfs = (
        term_df_dataset(_read_docs(sf_dir))
        .map_batches(lambda b: b.filter(pc.is_in(b["term"], value_set=seed_arr)),
                     batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    df_map = dict(zip(dfs["term"], dfs["df"].astype(int)))
    out = topic_nb_predictions(_read_docs(sf_dir), _TOPICS, df_map,
                               n_docs=_n_rows(_docs(sf_dir))).to_pandas()
    return (out.astype({"doc_id": np.int64, "score_e9": np.int64})
            .sort_values("doc_id").reset_index(drop=True))


def _sql_topic_predictions() -> str:
    """Weak-label bootstrap + multinomial NB, stated verbatim in SQL: the
    seed-TF-IDF argmax labels (same CTEs as topic_scores), then the
    stages/classify.py integer NB arithmetic (same CTEs as
    nb_predictions) fit on the labeled subset and scoring every doc."""
    names = sorted(_TOPICS)
    s_cols = ",\n                 ".join(
        f"coalesce(sum(CASE WHEN i.topic = '{n}' THEN i.idf_e6 END), 0)"
        f"::BIGINT AS s_{n}" for n in names)
    # first-max-wins in sorted-name order == the library's np.argmax
    case = "CASE "
    for i, n in enumerate(names[:-1]):
        conds = " AND ".join(f"s_{n} >= s_{m}" for m in names[i + 1:])
        case += f"WHEN {conds} THEN '{n}' "
    case += f"ELSE '{names[-1]}' END"
    greatest = ", ".join(f"s_{n}" for n in names)
    return f"""
        WITH seed(term, topic) AS (VALUES {_sql_topic_seed_values()}),
        toks AS (
          SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
        ),
        dfq AS (
          SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM toks
          WHERE term IN (SELECT term FROM seed) GROUP BY term
        ),
        nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        idf AS (
          SELECT s.term, s.topic,
                 CAST(FLOOR(ln(nn.n / dfq.df) * 1e6 + 0.5) AS BIGINT) AS idf_e6
          FROM seed s JOIN dfq USING (term), nn
        ),
        agg AS (
          SELECT t.doc_id,
                 {s_cols}
          FROM toks t JOIN idf i USING (term) GROUP BY t.doc_id
        ),
        lab AS (
          SELECT doc_id, {case} AS topic
          FROM agg WHERE greatest({greatest}) > 0
        ),
        ltoks AS (
          SELECT t.doc_id, l.topic, t.term FROM toks t JOIN lab l USING (doc_id)
        ),
        cnt AS (SELECT topic, term, count(*)::BIGINT AS c FROM ltoks GROUP BY 1, 2),
        tot AS (SELECT topic, sum(c)::BIGINT AS tot FROM cnt GROUP BY 1),
        vq AS (SELECT count(DISTINCT term)::BIGINT AS v FROM ltoks),
        ndq AS (SELECT count(*)::BIGINT AS n FROM lab),
        ndc AS (SELECT topic, count(*)::BIGINT AS nc FROM lab GROUP BY 1),
        classes AS (SELECT topic AS cls FROM ndc),
        tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        contrib AS (
          SELECT tf.doc_id, cl.cls,
                 sum(tf.tf * CAST(FLOOR(ln(
                     (coalesce(cnt.c, 0) + 1)::DOUBLE
                     / (tot.tot + (SELECT v FROM vq))
                   ) * 1e9 + 0.5) AS BIGINT))::BIGINT AS sum_llh
          FROM tf CROSS JOIN classes cl
          JOIN tot ON tot.topic = cl.cls
          LEFT JOIN cnt ON cnt.topic = cl.cls AND cnt.term = tf.term
          GROUP BY 1, 2
        ),
        scores AS (
          SELECT d.doc_id, cl.cls,
                 coalesce(co.sum_llh, 0)
                 + CAST(FLOOR(ln(ndc.nc::DOUBLE / (SELECT n FROM ndq)) * 1e9 + 0.5) AS BIGINT) AS score_e9
          FROM documents d CROSS JOIN classes cl
          JOIN ndc ON ndc.topic = cl.cls
          LEFT JOIN contrib co ON co.doc_id = d.doc_id AND co.cls = cl.cls
        )
        SELECT doc_id, cls AS pred_topic, score_e9
        FROM scores
        QUALIFY row_number() OVER (
          PARTITION BY doc_id ORDER BY score_e9 DESC, cls) = 1
        ORDER BY doc_id
    """


def _q_price_histogram(sf_dir: str):
    """Fixed-width value histogram (stages/stats.py value_histogram):
    per-batch bincount combiner, O(occupied bins) shuffle; bin boundary =
    the identical float64 floor(x / w) as the SQL."""
    import ray.data as rd

    from horus_ner_ray.stages.stats import value_histogram

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_extendedprice"])
    out = value_histogram(li, "l_extendedprice", 5000.0).to_pandas()
    return (out.astype(np.int64).sort_values("bin_idx")
            .reset_index(drop=True))


def _q_cohort_retention(sf_dir: str):
    """Weekly cohort retention (stages/cohort.py): per-batch (user, week)
    min-ts combiner, user-bucketed vectorized resolution, tiny count
    fold.  All-integer arithmetic, ISO-week truncation shared with the
    SQL oracle's date_trunc('week', ...)."""
    import ray.data as rd

    from horus_ner_ray.stages.cohort import cohort_retention

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id", "ts"])
    out = cohort_retention(ev).to_pandas()
    return (out.astype(np.int64)
            .sort_values(["cohort_week_us", "week_offset"])
            .reset_index(drop=True))


def _q_funnel(sf_dir: str):
    """view -> click -> purchase funnel (stages/funnel.py): greedy
    earliest-chain match per user in strict (ts, event_id) order, whole
    user history in one coarse bucket, per-step vectorized resolution."""
    import ray.data as rd

    from horus_ner_ray.stages.funnel import funnel_counts

    ev = rd.read_parquet(
        str(Path(sf_dir) / "events.parquet"),
        columns=["user_id", "event_type", "ts", "event_id"])
    return funnel_counts(ev, ["view", "click", "purchase"])


def _q_bigram_logprob(sf_dir: str):
    """Order-aware bigram LM quality score (stages/ngram.py): add-one-
    smoothed conditional bigram log-probs under the corpus's own model,
    every contribution e9-int-quantized before summation (order-free)."""
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import buckets_for_rows, salts_for_rows
    from horus_ner_ray.stages.ngram import bigram_logprob_vectors

    n = _n_rows(_docs(sf_dir))
    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["doc_id", "text"])
    # own the c12 checkpoint dir: consume fully, then remove (a None
    # default would leak one corpus-bigram-sized tempdir per run)
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="horus_bigram_c12_")
    try:
        out = bigram_logprob_vectors(
            docs, n_buckets=buckets_for_rows(n), n_salts=salts_for_rows(n),
            checkpoint_dir=ckpt).to_pandas()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return (out.astype(np.int64).sort_values("doc_id")
            .reset_index(drop=True))


_PROJ_DIM = 8
_PROJ_SEED = 2025


def _q_jl_projection(sf_dir: str):
    """Sparse sign JL projection (stages/projection.py — Achlioptas 2003
    {+1,0,-1} density-1/3 matrix from the oracle-shared splitmix64):
    embeddings e6-quantize then int64-matmul — EXACT integers, pure
    per-batch map, no shuffle.  SQL re-derives every matrix entry with
    _sql_splitmix64 and re-sums per (vec_id, dim)."""
    import ray.data as rd

    from horus_ner_ray.stages.projection import sparse_sign_projection

    emb = rd.read_parquet(str(Path(sf_dir) / "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    out = (sparse_sign_projection(emb, out_dim=_PROJ_DIM, seed=_PROJ_SEED)
           .to_pandas().astype(np.int64)
           .sort_values(["vec_id", "dim"]).reset_index(drop=True))
    return out


def _sql_jl_projection() -> str:
    h = _sql_splitmix64(
        f"xor(CAST((e.i - 1) * {_PROJ_DIM} + d.j AS UBIGINT), "
        f"CAST({_PROJ_SEED} AS UBIGINT))")
    return f"""
WITH e AS (
  SELECT vec_id, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
d AS (SELECT unnest(generate_series(0, {_PROJ_DIM - 1})) AS j),
m AS (
  SELECT e.vec_id, d.j AS dim,
         CAST(FLOOR(CAST(e.x AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS qv,
         ({h}) % 6 AS r
  FROM e CROSS JOIN d
)
SELECT vec_id, dim,
       sum(CASE WHEN r = 0 THEN qv WHEN r = 1 THEN -qv ELSE 0 END)::BIGINT
         AS value
FROM m GROUP BY 1, 2 ORDER BY vec_id, dim
"""


_RARE_MAX_DF = 3
_RARE_K = 100
_GSPLIT_PCT = 80
_GSPLIT_SEED = 42


def _q_rare_terms(sf_dir: str):
    """ES rare_terms aggregation (stages/termstats.rare_terms): the
    long-tail mirror of top_terms — terms with df <= max_df ranked
    (df asc, term asc), page extracted via per-block bottom-k partials
    (no full sort).  Runs over the TRANSCRIPT corpus (each turn is a
    doc; its seeded rare terms give the aggregation a real long tail —
    the documents table has none); the turn id derives as
    conv_number * 1000 + turn_idx on both sides."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from horus_ner_ray.stages.termstats import rare_terms

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    tr = rd.read_parquet(files, columns=["conv_id", "turn_idx", "text"])

    def add_id(b: pa.Table) -> pa.Table:
        conv = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(b["conv_id"], pa.string()), 5, 32), pa.int64())
        did = pc.add(pc.multiply(conv, pa.scalar(1000, pa.int64())),
                     pc.cast(b["turn_idx"], pa.int64()))
        return pa.table({"doc_id": did, "text": b["text"]})

    from horus_ner_ray.util import worker_runtime_env

    docs = tr.map_batches(add_id, batch_format="pyarrow",
                          zero_copy_batch=True,
                          runtime_env=worker_runtime_env())
    out = rare_terms(docs, max_df=_RARE_MAX_DF, k=_RARE_K)
    out["df"] = out["df"].astype(np.int64)
    return out


def _sql_rare_terms() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    return f"""
WITH tok AS (
  SELECT CAST(substr(conv_id, 6) AS BIGINT) * 1000 + turn_idx AS did,
         unnest({_sql_tok()}) AS term
  FROM read_parquet('{glob}')
),
dfv AS (SELECT term, count(DISTINCT did)::BIGINT AS df
        FROM tok GROUP BY term)
SELECT term, df FROM dfv WHERE df <= {_RARE_MAX_DF}
ORDER BY df, term LIMIT {_RARE_K}
"""


def _q_group_split(sf_dir: str):
    """Leakage-safe group-aware split (functions/sampling
    group_hash_split, the GroupShuffleSplit contract): every event of a
    user lands in one split via splitmix64(user XOR seed) % 100.  The
    published frame aggregates per split (row count, distinct users,
    exact value_e6 sum) — the SQL derives the SAME hash per user with
    _sql_splitmix64, so both the rule and the group atomicity are
    checked."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from horus_ner_ray.functions.sampling import group_hash_split

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id", "value"])
    tagged = group_hash_split(ev, "user_id", train_pct=_GSPLIT_PCT,
                              seed=_GSPLIT_SEED)

    def partial(b):
        import pyarrow as pa

        v = np.floor(np.asarray(b["value"], dtype=np.float64) * 1e6
                     + 0.5).astype(np.int64)
        df = pd.DataFrame({"split": np.asarray(b["split"], dtype=object),
                           "user_id": np.asarray(b["user_id"],
                                                 dtype=np.int64),
                           "v": v})
        g = (df.groupby(["split", "user_id"], sort=False)
             .agg(n=("v", "size"), s=("v", "sum")).reset_index())
        return pa.table({"split": pa.array(g["split"], pa.string()),
                         "user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64)),
                         "s": pa.array(g["s"].to_numpy(np.int64))})

    from horus_ner_ray.util import worker_runtime_env

    per_user = (tagged.map_batches(partial, batch_format="pyarrow",
                                   runtime_env=worker_runtime_env())
                .groupby(["split", "user_id"])
                .aggregate(Sum("n", alias_name="n"),
                           Sum("s", alias_name="s")).to_pandas())
    out = (per_user.groupby("split", as_index=False)
           .agg(n_rows=("n", "sum"), n_users=("user_id", "nunique"),
                sum_e6=("s", "sum"))
           .sort_values("split").reset_index(drop=True))
    for c in ("n_rows", "n_users", "sum_e6"):
        out[c] = out[c].astype(np.int64)
    return out


def _sql_group_split() -> str:
    h = _sql_splitmix64(
        f"xor(CAST(user_id AS UBIGINT), CAST({_GSPLIT_SEED} AS UBIGINT))")
    return f"""
WITH t AS (
  SELECT CASE WHEN ({h}) % 100 < {_GSPLIT_PCT} THEN 'train' ELSE 'test' END
           AS split,
         user_id,
         CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS v
  FROM events
)
SELECT split, count(*)::BIGINT AS n_rows,
       count(DISTINCT user_id)::BIGINT AS n_users,
       sum(v)::BIGINT AS sum_e6
FROM t GROUP BY split ORDER BY split
"""


_COMPOSITE_PAGE = 25


def _q_composite_pages(sf_dir: str):
    """ES composite aggregation with after-key paging (stages/groupwise
    composite_page): key-ordered (user_id, event_type) buckets, two
    chained pages — page 2's cursor is page 1's last key, exactly the ES
    after_key contract.  Page extraction never sorts the full bucket
    table (per-block cursor-filtered first-P partials).  SQL restates the
    cursor with the same lexicographic predicate."""
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import composite_page

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id", "event_type", "value"])
    p1 = composite_page(ev, ["user_id", "event_type"], "value",
                        page_size=_COMPOSITE_PAGE)
    after = tuple(p1.iloc[-1][["user_id", "event_type"]])
    p2 = composite_page(ev, ["user_id", "event_type"], "value",
                        page_size=_COMPOSITE_PAGE, after=after)
    p1.insert(0, "page", np.int64(1))
    p2.insert(0, "page", np.int64(2))
    out = pd.concat([p1, p2], ignore_index=True)
    out["page"] = out["page"].astype(np.int64)
    out["user_id"] = out["user_id"].astype(np.int64)
    return out


def _sql_composite_pages() -> str:
    p = _COMPOSITE_PAGE
    return f"""
WITH b AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n_rows,
         sum(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT))::BIGINT AS sum_e6
  FROM events GROUP BY 1, 2
),
p1 AS (SELECT * FROM b ORDER BY user_id, event_type LIMIT {p}),
lastk AS (SELECT user_id AS u, event_type AS t FROM p1
          ORDER BY user_id DESC, event_type DESC LIMIT 1),
p2 AS (
  SELECT b.* FROM b, lastk
  WHERE b.user_id > lastk.u
     OR (b.user_id = lastk.u AND b.event_type > lastk.t)
  ORDER BY user_id, event_type LIMIT {p}
)
SELECT 1::BIGINT AS page, * FROM p1
UNION ALL
SELECT 2::BIGINT AS page, * FROM p2
ORDER BY page, user_id, event_type
"""


_MATRIX_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_MATRIX_SCALES = [1, 100, 100, 100]


def _q_matrix_stats(sf_dir: str):
    """ES matrix_stats aggregation (stages/stats.py matrix_stats): the
    full pairwise covariance/correlation matrix over lineitem numerics
    from ONE streaming combiner scan — exact hi/lo-split integer moments,
    float casts only in the O(pairs) finish.  SQL mirrors with HUGEINT
    sums and the same CAST points."""
    import ray.data as rd

    from horus_ner_ray.stages.stats import matrix_stats

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=_MATRIX_COLS)
    return (matrix_stats(li, _MATRIX_COLS, _MATRIX_SCALES)
            .sort_values(["col_x", "col_y"]).reset_index(drop=True))


def _sql_matrix_stats() -> str:
    k = len(_MATRIX_COLS)
    qcols = ", ".join(
        f"CAST(FLOOR({c} * {s} + 0.5) AS HUGEINT) AS q{i}"
        for i, (c, s) in enumerate(zip(_MATRIX_COLS, _MATRIX_SCALES)))
    pairs = [(i, j) for i in range(k) for j in range(i, k)]
    sums = (["count(*)::HUGEINT AS n"]
            + [f"sum(q{i}) AS s{i}" for i in range(k)]
            + [f"sum(q{i} * q{j}) AS p{i}_{j}" for i, j in pairs])
    rows = []
    for i, j in pairs:
        si, sj = float(_MATRIX_SCALES[i]), float(_MATRIX_SCALES[j])
        num = f"(n * p{i}_{j} - s{i} * s{j})"
        dx = f"(n * p{i}_{i} - s{i} * s{i})"
        dy = f"(n * p{j}_{j} - s{j} * s{j})"
        rows.append(f"""
  SELECT '{_MATRIX_COLS[i]}' AS col_x, '{_MATRIX_COLS[j]}' AS col_y,
         CAST(n AS BIGINT) AS n_rows,
         CAST(FLOOR(CAST(s{i} AS DOUBLE) / CAST(n AS DOUBLE) / {si!r}
                    * 1e6 + 0.5) AS BIGINT) AS mean_x_e6,
         CAST(FLOOR(CAST(s{j} AS DOUBLE) / CAST(n AS DOUBLE) / {sj!r}
                    * 1e6 + 0.5) AS BIGINT) AS mean_y_e6,
         CAST(FLOOR(CAST({num} AS DOUBLE) / CAST(n * n AS DOUBLE)
                    / {si * sj!r} * 1e6 + 0.5) AS BIGINT) AS cov_e6,
         CASE WHEN {dx} <= 0 OR {dy} <= 0 THEN 0
              ELSE CAST(FLOOR(CAST({num} AS DOUBLE)
                   / (sqrt(CAST({dx} AS DOUBLE)) * sqrt(CAST({dy} AS DOUBLE)))
                   * 1e6 + 0.5) AS BIGINT)
         END AS corr_e6
  FROM s""")
    return f"""
WITH q AS (SELECT {qcols} FROM lineitem),
s AS (SELECT {", ".join(sums)} FROM q)
{" UNION ALL ".join(rows)}
ORDER BY col_x, col_y
"""


def _q_kn_bigram(sf_dir: str):
    """Interpolated Kneser-Ney bigram LM (stages/ngram.py
    kn_bigram_logprob_vectors — Kneser & Ney 1995): P(w2|w1) =
    (max(c12-D,0) + ((D*nf)*np)/nt)/c1 with continuation counts nf/np/nt
    from the distinct-bigram table, D=0.75; per-(doc,bigram)
    contributions e9-int-quantized before summation (order-free).  SQL
    restates the continuation counts and the exact float association."""
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import buckets_for_rows, salts_for_rows
    from horus_ner_ray.stages.ngram import kn_bigram_logprob_vectors

    n = _n_rows(_docs(sf_dir))
    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["doc_id", "text"])
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="horus_kn_c12_")
    try:
        out = kn_bigram_logprob_vectors(
            docs, n_buckets=buckets_for_rows(n), n_salts=salts_for_rows(n),
            checkpoint_dir=ckpt).to_pandas()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return (out.astype(np.int64).sort_values("doc_id")
            .reset_index(drop=True))


def _q_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(flag, status) (stages/groupwise.py rollup_sums):
    one corpus scan builds the finest level via a combiner; every coarser
    level re-aggregates the previous level's small result.  Cents-int sums
    are exact at every level."""
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import rollup_sums

    li = rd.read_parquet(
        str(Path(sf_dir) / "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"])
    return rollup_sums(li, ["l_returnflag", "l_linestatus"],
                       "l_extendedprice", value_scale=100)


def _q_cube_revenue(sf_dir: str):
    """GROUP BY CUBE(flag, status) (stages/groupwise.py cube_sums): one
    corpus scan builds the finest level via a combiner; all 2^n - 1 other
    subsets re-aggregate that small table.  Cents-int sums exact at every
    level."""
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import cube_sums

    li = rd.read_parquet(
        str(Path(sf_dir) / "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"])
    return cube_sums(li, ["l_returnflag", "l_linestatus"],
                     "l_extendedprice", value_scale=100)


def _q_event_paths(sf_dir: str):
    """Top user-journey prefixes (stages/funnel.py event_paths/top_paths):
    each user's first 3 events in (ts, event_id) order joined into a path
    string — per-bucket lexsort + ListArray + pc.binary_join, no per-user
    Python — then the distinct-path table (bounded by vocab^3) counts and
    ranks."""
    import ray.data as rd

    from horus_ner_ray.stages.funnel import top_paths

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["event_id", "ts", "user_id", "event_type"])
    return top_paths(ev, k=50, prefix_len=3)


def _q_fuzzy_name_pairs(sf_dir: str):
    """Edit-distance entity resolution (stages/fuzzy.py): distinct p_name
    values within 3 Levenshtein edits, found via lossless length banding
    (lev >= |len diff|) and a pair-axis-vectorized DP.  ORACLE: DuckDB's
    native levenshtein() over the same distinct-value cross join."""
    import ray.data as rd

    from horus_ner_ray.stages.fuzzy import fuzzy_key_pairs

    part = rd.read_parquet(str(Path(sf_dir) / "part.parquet"),
                           columns=["p_name"])
    return fuzzy_key_pairs(part, "p_name", max_dist=3)


def _q_ranking_analytics(sf_dir: str):
    """ntile / percent_rank / cume_dist over PARTITION BY user (stages/
    analytic.py extended=True): tile boundaries, (rank-1)/(cnt-1) and
    peers-inclusive fractions all derive from the same int-valued run
    layout as rank/dense_rank, so the e6 publication is order-free."""
    import ray.data as rd

    from horus_ner_ray.stages.analytic import window_functions_dataset

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["event_id", "ts", "user_id", "value"])
    out = window_functions_dataset(ev, extended=True).to_pandas()
    return (out[["event_id", "user_id", "tile", "prank_e6", "cume_e6"]]
            .astype(np.int64).sort_values("event_id").reset_index(drop=True))


def _q_pmi_top(sf_dir: str):
    """Top-100 PMI collocations (stages/collocations.py): df-filtered vocab
    broadcast once, per-batch combined pair counts, one pair groupby, a
    single ln per pair (no float accumulation) -> deterministic top-k by
    (pmi_e6 desc, ta, tb)."""
    import ray.data as rd

    from horus_ner_ray.stages.collocations import pmi_pairs

    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["doc_id", "text"])
    return pmi_pairs(docs, min_df=2, max_df_ratio=0.9, min_pair_count=2,
                     top_k=100)


def _q_term_pagerank(sf_dir: str):
    """TextRank keywords (stages/graph.py term_pagerank): weighted
    PageRank over the df-filtered document co-occurrence graph, 5
    exact-integer fixed-point iterations (contributions are single
    HUGEINT-safe floor divisions, order-free sums), arcs checkpointed to
    Parquet so iterations never re-tokenize, rank vector O(vocab)
    broadcast per round.  ORACLE: the recurrence unrolled as 5 chained
    MATERIALIZED CTEs over the same pair derivation as pmi_top."""
    import ray.data as rd

    from horus_ner_ray.stages.graph import term_pagerank

    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["doc_id", "text"])
    return term_pagerank(docs, min_df=2, max_df_ratio=0.9, min_pair_count=2,
                         n_iter=5, top_k=100)


def _q_cooc_triangles(sf_dir: str):
    """Triangle census of the co-occurrence graph (stages/graph.py
    cooc_triangles): sorted packed edge keys broadcast once, per-batch
    searchsorted neighbor-range intersection — each triangle counted at
    its least edge.  ORACLE: three-way self-join with ta < tb < tc."""
    import ray.data as rd

    from horus_ner_ray.stages.graph import cooc_triangles

    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["doc_id", "text"])
    return cooc_triangles(docs, min_df=2, max_df_ratio=0.9, min_pair_count=2)


def _q_dup_spans(sf_dir: str):
    """Duplicated k-gram spans (stages/dupspans.py): exact-substring dedup
    statistic at 4-gram granularity — per doc, how many start positions
    carry a corpus-duplicated 4-gram and the longest consecutive run
    (= longest duplicated substring, Lee et al. 2022).  Salted replicate
    membership + vectorized gaps-and-islands.  ORACLE: list-sliced
    k-grams, HAVING count>=2, row_number gaps-and-islands."""
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import buckets_for_rows, salts_for_rows
    from horus_ner_ray.stages.dupspans import dup_span_stats

    n = _n_rows(str(Path(sf_dir) / "documents.parquet"))
    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["doc_id", "text"])
    return dup_span_stats(docs, k=4, min_count=2,
                          n_buckets=buckets_for_rows(n),
                          n_salts=salts_for_rows(n))


_BPE_MERGES = 8


def _q_bpe_merges(sf_dir: str):
    """Full BPE tokenizer training (stages/bpe.py): distributed word-type
    counts, then the iterative merge loop on the vocab-bounded type table
    — best pair by (count desc, left, right), merges applied as
    non-overlapping left-to-right replaces on space-sentineled
    segmentations.  ORACLE: the identical loop unrolled as chained
    MATERIALIZED CTEs (SQL replace() shares the scan semantics)."""
    import ray.data as rd

    from horus_ner_ray.stages.bpe import bpe_train

    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["doc_id", "text"])
    return bpe_train(docs, n_merges=_BPE_MERGES)


def _q_bpe_encoded(sf_dir: str):
    """BPE APPLICATION (stages/bpe.bpe_encode_stats): train the merge
    table, then replay it over the corpus — per doc the token count and
    post-merge subword count (the compression a learned vocabulary
    achieves; the train -> tokenize loop every LLM pipeline runs).
    ORACLE: the merge chain re-derives in SQL with the word carried
    through, then joins back to each doc's token instances."""
    import ray.data as rd

    from horus_ner_ray.stages.bpe import bpe_encode_stats, bpe_train

    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["doc_id", "text"])
    merges = [(l, r) for _s, l, r, _c in map(
        tuple, bpe_train(docs, n_merges=_BPE_MERGES)
        .itertuples(index=False))]
    return (bpe_encode_stats(docs, merges).to_pandas().astype(np.int64)
            .sort_values("doc_id").reset_index(drop=True))


def _q_rolling_windows(sf_dir: str):
    """5-row moving aggregates per user ordered by (ts, event_id)
    (stages/analytic.py rolling_aggregates_dataset): exact int rolling sum
    via per-segment cumsum difference, count/avg/min/max vectorized."""
    import ray.data as rd

    from horus_ner_ray.stages.analytic import rolling_aggregates_dataset

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["event_id", "ts", "user_id", "value"])
    return rolling_aggregates_dataset(ev, window=5)


def _q_price_zscore(sf_dir: str):
    """Per-row z-score of l_extendedprice within its l_returnflag group
    (stages/stats.grouped_zscore): exact integer sufficient statistics,
    one broadcast of the tiny per-group table, one vectorized streaming
    pass — the feature-scaling staple, hash-exact vs the HUGEINT SQL."""
    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_zscore

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_orderkey", "l_linenumber",
                                  "l_returnflag", "l_extendedprice"])
    return grouped_zscore(li, "l_returnflag", "l_extendedprice",
                          id_cols=["l_orderkey", "l_linenumber"], scale=100)


def _q_price_stats_by_flag(sf_dir: str):
    """Exact per-group mean/variance/stddev (stages/stats.py): cents-
    quantized int sums with base-2**30 square splits — order-free, so the
    e6 publication hash-matches the HUGEINT SQL oracle bit-for-bit."""
    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_variance

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_returnflag", "l_extendedprice"])
    out = grouped_variance(li, "l_returnflag", "l_extendedprice", scale=100,
                           out_prefix="price")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def _q_price_ttest(sf_dir: str):
    """ES t_test aggregation (Welch, heteroscedastic): is the mean
    extended price of returned lineitems (flag A) different from flag R?
    One combiner pass of exact split-integer (n, Sx, Sxx) per group
    (stages/stats.welch_ttest); t and the Welch-Satterthwaite df finish
    in float divisions of exactly-representable bigints, so both publish
    e6-hash-stable against the HUGEINT/DOUBLE SQL restatement."""
    import math

    import ray.data as rd

    from horus_ner_ray.stages.stats import welch_ttest

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_returnflag", "l_extendedprice"])
    r = welch_ttest(li, "l_returnflag", "l_extendedprice", "A", "R")
    return pd.DataFrame({
        "n_a": pd.Series([r["n_a"]], dtype=np.int64),
        "n_b": pd.Series([r["n_b"]], dtype=np.int64),
        "t_e6": pd.Series([math.floor(r["t"] * 1e6 + 0.5)], dtype=np.int64),
        "df_e6": pd.Series([math.floor(r["df"] * 1e6 + 0.5)], dtype=np.int64),
    })


def _q_value_boxplot(sf_dir: str):
    """ES boxplot aggregation over events.value, EXACT where ES settles
    for TDigest (stages/quantiles.boxplot): interpolated quartiles from
    the histogram-refinement engine, Tukey fences q1/q3 -+ 1.5*IQR, and
    whiskers = actual stored values at the fence clip (the upper whisker
    genuinely clips on this long-tailed column).  Three bounded streaming
    passes; the e6 publication hash-matches DuckDB's quantile_cont +
    FILTER min/max restatement with zero tolerance."""
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import boxplot

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["value"])
    out = boxplot(ev, "value")
    res = {"n": out["n"].astype(np.int64)}
    for c in ["min", "max", "q1", "q2", "q3", "lo_whisker", "hi_whisker"]:
        res[f"{c}_e6"] = _e6(out[c]).astype(np.int64)
    return pd.DataFrame(res)


def _q_price_mad(sf_dir: str):
    """Grouped MEDIAN ABSOLUTE DEVIATION (stages/quantiles.mad_by_group —
    the robust dispersion complement to grouped variance): exact group
    medians, broadcast searchsorted attach of |x - median|, exact group
    medians of the deviations.  DISC medians are order statistics (stored
    floats, never averages), so both sides' abs/subtract chains are
    identical IEEE ops and the e6 publication hash-matches DuckDB's
    quantile_disc/abs restatement exactly."""
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import mad_by_group

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_returnflag", "l_extendedprice"])
    out = mad_by_group(li, "l_returnflag", "l_extendedprice")
    out["median_e6"] = _e6(out["median"])
    out["mad_e6"] = _e6(out["mad"])
    return (out[["l_returnflag", "median_e6", "mad_e6"]]
            .sort_values("l_returnflag").reset_index(drop=True))


def _q_qty_price_corr(sf_dir: str):
    """Exact per-group Pearson correlation of quantity vs extended price
    (stages/stats.py grouped_corr): five integer sufficient statistics per
    group from one combiner pass, finished in big-int/double arithmetic
    mirrored by the oracle."""
    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_corr

    li = rd.read_parquet(
        str(Path(sf_dir) / "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    out = grouped_corr(li, "l_returnflag", "l_quantity", "l_extendedprice",
                       x_scale=1, y_scale=100)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def _q_dup_components(sf_dir: str):
    """SemDeDup-style duplicate clustering: embedding near-dup pairs closed
    into connected components by distributed min-label propagation
    (stages/clustering.py); component = min vec_id of the duplicate
    cluster, singletons map to themselves.  exact=True pair generation is
    the documented oracle-harness path (same as embedding_dups)."""
    import ray.data as rd

    from horus_ner_ray.stages.clustering import semantic_dup_components
    from horus_ner_ray.stages.dedupe import buckets_for_rows, salts_for_rows

    n = _n_rows(str(Path(sf_dir) / "embeddings.parquet"))
    emb = rd.read_parquet(str(Path(sf_dir) / "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    return semantic_dup_components(emb, threshold=0.4, exact=True,
                                   n_buckets=buckets_for_rows(n),
                                   n_salts=salts_for_rows(n))


_KMEANS_K = 8
_KMEANS_ITERS = 2


def _q_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding table (semantic-
    clustering pass of a curation pipeline): deterministic init (k
    smallest vec_ids), 2 iterations with order-free e6-integer centroid
    sums, final assignment published.  Oracle = the same algorithm
    unrolled as SQL."""
    import ray.data as rd

    from horus_ner_ray.stages.clustering import kmeans_assign, kmeans_fit

    ds = rd.read_parquet(str(Path(sf_dir) / "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    cent = kmeans_fit(ds, _KMEANS_K, n_iter=_KMEANS_ITERS)
    return kmeans_assign(ds, cent)


_DAY_US = 86400 * 10**6


def _q_weighted_avg_price(sf_dir: str):
    """ES weighted_avg aggregation: per return flag, the quantity-weighted
    mean extended price (stages/aggs.grouped_weighted_avg).  One streaming
    combiner pass of exact split-int sums; wavg publishes as a pure
    big-int floor division both sides compute identically."""
    import ray.data as rd

    from horus_ner_ray.stages.aggs import grouped_weighted_avg

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_returnflag", "l_extendedprice",
                                  "l_quantity"])
    return grouped_weighted_avg(li, "l_returnflag", "l_extendedprice",
                                "l_quantity", x_scale=100, w_scale=1)


def _q_string_stats_docs(sf_dir: str):
    """ES string_stats aggregation: per source, count/min/max/total/avg
    code-point length of the document text (stages/aggs.
    grouped_string_stats) — exact ints, avg as big-int floor division."""
    import ray.data as rd

    from horus_ner_ray.stages.aggs import grouped_string_stats

    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["source", "text"])
    return grouped_string_stats(docs, "source", "text")


def _q_top_metrics_events(sf_dir: str):
    """ES top_metrics aggregation (size=1, sort=ts desc): per event type,
    the value carried by the LATEST event (tie-break max event_id) —
    an associative arg-max reduced from per-batch partials
    (stages/aggs.top_metrics)."""
    import ray.data as rd

    from horus_ner_ray.stages.aggs import top_metrics

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["event_type", "ts", "event_id", "value"])
    out = top_metrics(ev, "event_type", "ts", "event_id", ["value"])
    return pd.DataFrame({
        "event_type": out["event_type"],
        "ts_us": out["ts"].astype(np.int64),
        "event_id": out["event_id"].astype(np.int64),
        "value_e6": _e6(out["value"]).astype(np.int64),
    })


def _q_daily_new_users(sf_dir: str):
    """ES cumulative_cardinality pipeline agg, EXACT where ES settles for
    a sketch: per day, users appearing for the first time + the running
    distinct-user total (stages/aggs.cumulative_new_keys: one
    groupby-min shuffle, O(buckets) finish)."""
    import ray.data as rd

    from horus_ner_ray.stages.aggs import cumulative_new_keys

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["user_id", "ts"])
    return cumulative_new_keys(ev, "user_id", "ts", _DAY_US)


def _q_weekday_profile(sf_dir: str):
    """Seasonality profile: event counts + exact e6 value sums per ISO
    weekday (1=Mon..7=Sun) — the day-of-week facet every activity
    dashboard carries.  Weekday derives from the raw epoch
    ((days + 3) % 7 + 1; 1970-01-01 was a Thursday), so both sides
    compute pure integer arithmetic."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from horus_ner_ray.util import worker_runtime_env as _rte

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        dow = (ts // _DAY_US + 3) % 7 + 1
        v = _e6(np.asarray(batch["value"], dtype=np.float64))
        df = pd.DataFrame({"dow": dow.astype(np.int64), "n": np.int64(1),
                           "s": v})
        g = df.groupby("dow", sort=False).sum().reset_index()
        return pa.table({
            "isodow": pa.array(g["dow"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "s": pa.array(g["s"].to_numpy(np.int64), pa.int64()),
        })

    out = (ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True, runtime_env=_rte())
           .groupby("isodow")
           .aggregate(Sum("n", alias_name="n_events"),
                      Sum("s", alias_name="sum_value_e6"))).to_pandas()
    out = out.astype(np.int64)
    return out.sort_values("isodow").reset_index(drop=True)


_SQL_WEEKDAY_PROFILE = """
SELECT isodow(ts)::BIGINT AS isodow, count(*)::BIGINT AS n_events,
       sum(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT))::BIGINT
         AS sum_value_e6
FROM events GROUP BY 1 ORDER BY 1
"""


_FRAME_SAMPLE_N = 20
_FRAME_SAMPLE_K = 2


def _q_gif_frame_sample(sf_dir: str):
    """Frame sampling over REAL animated GIFs (the brief's frame-sample
    multimodal op): genuine multi-frame GIF89a payloads decode in a
    load-once actor pool and every 2nd frame publishes exact integer
    stats (stages/multimodal.frame_sample_stats_dataset).  ORACLE: the
    frame patterns are a closed form in (media_id, frame, row, col), so
    the SQL re-derives every SAMPLED frame with generate_series — the
    position-weighted sum pins deinterlace and frame order."""
    import ray.data as rd

    from horus_ner_ray.stages.multimodal import (
        frame_sample_stats_dataset,
        synth_animated_gif_table,
    )

    ds = rd.from_arrow(synth_animated_gif_table(n=_FRAME_SAMPLE_N))
    out = frame_sample_stats_dataset(ds, every_k=_FRAME_SAMPLE_K).to_pandas()
    return (out.sort_values(["media_id", "frame_idx"])
            .reset_index(drop=True))


def _sql_gif_frame_sample() -> str:
    n, k = _FRAME_SAMPLE_N, _FRAME_SAMPLE_K
    return f"""
WITH imgs AS (
  SELECT i::BIGINT AS media_id,
         (5 + (i*7) % 13)::BIGINT AS h,
         (5 + (i*11) % 17)::BIGINT AS w,
         (2 + i % 4)::BIGINT AS nf,
         (1 + i % 5)::BIGINT AS a,
         (1 + i % 7)::BIGINT AS b
  FROM (SELECT unnest(generate_series(0, {n - 1})) AS i)
),
frames AS (
  SELECT media_id, h, w, a, b, unnest(generate_series(0, nf - 1)) AS f
  FROM imgs
),
kept AS (SELECT * FROM frames WHERE f % {k} = 0),
px AS (
  SELECT media_id, f, w,
         unnest(generate_series(0, h - 1)) AS r
  FROM kept
),
cells AS (
  SELECT p.media_id, p.f, p.r, p.w,
         unnest(generate_series(0, p.w - 1)) AS c
  FROM px p
),
vals AS (
  SELECT cl.media_id, cl.f,
         ((k2.a * cl.r + k2.b * cl.c) + 17 * cl.f + 13 * cl.media_id)
           % 256 AS val,
         cl.r * cl.w + cl.c + 1 AS pos
  FROM cells cl
  JOIN kept k2 ON k2.media_id = cl.media_id AND k2.f = cl.f
)
SELECT media_id, f AS frame_idx, count(*)::BIGINT AS n_px,
       sum(val)::BIGINT AS vsum, sum(val * pos)::BIGINT AS wsum
FROM vals GROUP BY 1, 2 ORDER BY media_id, frame_idx
"""


def _q_hourly_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the densified hourly event-count series
    (stages/aggs.lag1_autocorr_dense): exact big-int sufficient stats,
    float finish at the SQL oracle's CAST points."""
    import ray.data as rd

    from horus_ner_ray.stages.aggs import lag1_autocorr_dense

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["ts"])
    return lag1_autocorr_dense(ev, "ts", 3600 * 10**6)


_SQL_HOURLY_AUTOCORR = """
WITH c AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS b,
         count(*)::HUGEINT n
  FROM events GROUP BY 1
),
series AS (
  SELECT unnest(generate_series((SELECT min(b) FROM c),
                                (SELECT max(b) FROM c),
                                3600000000)) AS b
),
dense AS (
  SELECT s.b, coalesce(c.n, 0)::HUGEINT n
  FROM series s LEFT JOIN c USING (b)
),
p AS (
  SELECT n AS x, lead(n) OVER (ORDER BY b) AS y
  FROM dense QUALIFY y IS NOT NULL
),
s AS (
  SELECT count(*)::HUGEINT n, sum(x) sx, sum(y) sy,
         sum(x*x) sxx, sum(y*y) syy, sum(x*y) sxy
  FROM p
)
SELECT n::BIGINT AS n_pairs,
       CAST(FLOOR(CAST(n*sxy - sx*sy AS DOUBLE)
                  / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                     * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) * 1e6 + 0.5)
            AS BIGINT) AS r_e6
FROM s
"""


def _q_price_quartile_bins(sf_dir: str):
    """Equal-frequency discretization (the ML preprocessing staple):
    per-row quartile bin of l_extendedprice against the EXACT
    distributed disc quantiles (stages/quantiles.quantile_disc — values
    never leave shards), bin = 1 + #(boundaries < x-or-equal rule x >
    q).  Comparisons are on stored floats, nothing to round."""
    import pyarrow as pa
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_disc
    from horus_ner_ray.util import worker_runtime_env as _rte

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_orderkey", "l_linenumber",
                                  "l_extendedprice"])
    qs = quantile_disc(li, "l_extendedprice", [0.25, 0.5, 0.75])
    q25, q50, q75 = [float(v) for v in qs["value"]]

    def bin_rows(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["l_extendedprice"], dtype=np.float64)
        b = 1 + (x > q25).astype(np.int64) + (x > q50) + (x > q75)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_linenumber": batch["l_linenumber"],
                         "bin": pa.array(b.astype(np.int64), pa.int64())})

    return li.map_batches(bin_rows, batch_format="pyarrow",
                          zero_copy_batch=True, runtime_env=_rte())


_SQL_PRICE_QUARTILE_BINS = """
WITH q AS (
  SELECT quantile_disc(l_extendedprice, [0.25, 0.5, 0.75]) AS qs
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       (1 + CASE WHEN l_extendedprice > qs[1] THEN 1 ELSE 0 END
          + CASE WHEN l_extendedprice > qs[2] THEN 1 ELSE 0 END
          + CASE WHEN l_extendedprice > qs[3] THEN 1 ELSE 0 END)::BIGINT
         AS bin
FROM lineitem, q
"""


def _q_soundex_terms(sf_dir: str):
    """Phonetic encoding (American Soundex, the US-Census h/w-
    transparent variant) of every distinct document-vocabulary term —
    stages/phonetic.soundex_batch, vectorized over the name axis with
    the cumsum-scatter compactions of the fuzzy family (digits are
    dropped like h/w).  The SQL restates all four rule steps with
    generate_series + lag() + a FILTERed string_agg."""
    import pyarrow as pa
    import ray.data as rd

    from horus_ner_ray.stages.phonetic import soundex_dataset
    from horus_ner_ray.stages.tokenize import tokenize_column
    from horus_ner_ray.util import worker_runtime_env as _rte

    def terms(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokenize_column(batch["text"])
        flat = pc.list_flatten(toks)
        return pa.table({"term": flat})

    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["text"])
    vocab = docs.map_batches(terms, batch_format="pyarrow",
                             zero_copy_batch=True, runtime_env=_rte())
    out = soundex_dataset(vocab, "term").to_pandas()
    return out.sort_values("term").reset_index(drop=True)


def _sql_soundex_terms() -> str:
    return f"""
WITH v AS (SELECT DISTINCT unnest({_sql_tok()}) AS term FROM documents),
ch AS (
  SELECT term, i, substr(term, i, 1) AS c
  FROM v, unnest(generate_series(1, length(term))) AS g(i)
),
m AS (
  SELECT term, i,
         CASE WHEN c IN ('b','f','p','v') THEN 1
              WHEN c IN ('c','g','j','k','q','s','x','z') THEN 2
              WHEN c IN ('d','t') THEN 3
              WHEN c = 'l' THEN 4
              WHEN c IN ('m','n') THEN 5
              WHEN c = 'r' THEN 6
              ELSE 0 END AS code
  FROM ch
  WHERE c BETWEEN 'a' AND 'z' AND c NOT IN ('h', 'w')
),
r AS (SELECT term, i, code,
             lag(code) OVER (PARTITION BY term ORDER BY i) prev
      FROM m),
k AS (SELECT term, i, code FROM r
      WHERE (prev IS NULL OR code != prev) AND i > 1 AND code > 0),
k2 AS (SELECT term, i, code,
              row_number() OVER (PARTITION BY term ORDER BY i) rn
       FROM k),
d AS (SELECT term,
             string_agg(code::VARCHAR, '' ORDER BY i)
               FILTER (WHERE rn <= 3) AS s
      FROM k2 GROUP BY term)
SELECT v.term,
       upper(substr(v.term, 1, 1))
         || substr(coalesce(d.s, '') || '000', 1, 3) AS soundex
FROM v LEFT JOIN d USING (term)
ORDER BY term
"""


_JW_MIN_E6 = 800_000


def _q_jw_name_pairs(sf_dir: str):
    """Record linkage under Jaro-Winkler (the dedup family's 4th metric
    after set-overlap / cosine / Levenshtein): distinct part names
    blocked by FIRST CHARACTER, pairwise JW >= 0.8 — stages/fuzzy.
    jw_key_pairs (pair-axis-vectorized greedy Jaro matching + cumsum-
    scatter transposition count, probed bitwise against DuckDB's
    jaro_winkler_similarity: boost threshold 0.7 strict, prefix cap 4,
    transpositions = mismatches // 2 truncated).
    The blocking predicate is part of the contract and stated in the
    SQL."""
    import ray.data as rd

    from horus_ner_ray.stages.fuzzy import jw_key_pairs

    part = rd.read_parquet(str(Path(sf_dir) / "part.parquet"),
                           columns=["p_name"])
    out = jw_key_pairs(part, "p_name", min_sim_e6=_JW_MIN_E6).to_pandas()
    if not len(out):
        return pd.DataFrame({"name_a": pd.Series([], dtype="string"),
                             "name_b": pd.Series([], dtype="string"),
                             "jw_e6": pd.Series([], dtype=np.int64)})
    return (out.sort_values(["name_a", "name_b"])
            .reset_index(drop=True))


_SQL_JW_NAME_PAIRS = f"""
WITH d AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(FLOOR(jaro_winkler_similarity(a.p_name, b.p_name) * 1e6
                  + 0.5) AS BIGINT) AS jw_e6
FROM d a JOIN d b
  ON a.p_name < b.p_name
 AND substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
WHERE CAST(FLOOR(jaro_winkler_similarity(a.p_name, b.p_name) * 1e6
                 + 0.5) AS BIGINT) >= {_JW_MIN_E6}
ORDER BY name_a, name_b
"""


_CTX_PREFIXES = ["th", "re", "ba", "con"]
_CTX_COMPLETE_K = 5


def _q_complete_by_role(sf_dir: str):
    """Context-filtered completion (the ES context suggester): prefix
    autocomplete ranked by document frequency WITHIN a role — the
    per-channel dictionary split applied to the suggest surface.  The
    (role, term) df combiner is role_term_stats'; each (role, prefix)
    cell keeps its top-5 (df desc, term asc) through the shared
    per-group top-k reduction."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages.groupwise import topk_per_group
    from horus_ner_ray.stages.tokenize import tokenize_column
    from horus_ner_ray.util import worker_runtime_env

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    tr = rd.read_parquet(files, columns=["conv_id", "turn_idx", "role",
                                         "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as _pd
        import pyarrow.compute as pc

        toks = tokenize_column(batch["text"])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        role = np.asarray(batch["role"], dtype=object)[parents]
        conv = np.asarray(batch["conv_id"], dtype=object)[parents]
        tix = np.asarray(batch["turn_idx"], dtype=np.int64)[parents]
        df = (_pd.DataFrame({"role": role, "term": flat, "c": conv,
                             "t": tix})
              .drop_duplicates(["role", "term", "c", "t"])
              .groupby(["role", "term"], sort=False)
              .size().reset_index(name="df"))
        return pa.table({
            "role": pa.array(df["role"].to_numpy(object), pa.string()),
            "term": pa.array(df["term"].to_numpy(object), pa.string()),
            "df": pa.array(df["df"].to_numpy(np.int64), pa.int64()),
        })

    fine = (tr.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True,
                           runtime_env=worker_runtime_env())
            .groupby(["role", "term"]).aggregate(Sum("df",
                                                     alias_name="df")))

    def tag(batch: pa.Table) -> pa.Table:
        import pandas as _pd

        df = batch.to_pandas()
        parts = []
        for p in _CTX_PREFIXES:
            m = df[df["term"].str.startswith(p)].copy()
            m["prefix"] = p
            parts.append(m)
        out = (_pd.concat(parts, ignore_index=True) if parts
               else df.head(0).assign(prefix=""))
        out["rp"] = out["role"] + "|" + out["prefix"]
        return pa.Table.from_pandas(out, preserve_index=False)

    from horus_ner_ray.util import worker_runtime_env as _rte

    tagged = fine.map_batches(tag, batch_format="pyarrow",
                              runtime_env=_rte())
    top = topk_per_group(tagged, "rp", ["df", "term"],
                         ascending=[False, True], k=_CTX_COMPLETE_K)
    out = top.to_pandas()
    out["df"] = out["df"].astype(np.int64)
    return (out[["role", "prefix", "term", "df"]]
            .sort_values(["role", "prefix", "df", "term"],
                         ascending=[True, True, False, True])
            .reset_index(drop=True))


def _sql_complete_by_role() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    pf = ", ".join(f"('{p}')" for p in _CTX_PREFIXES)
    return f"""
WITH d AS (
  SELECT role, unnest(list_distinct({_sql_tok()})) AS term
  FROM read_parquet('{glob}')
),
dfv AS (SELECT role, term, count(*)::BIGINT df FROM d GROUP BY 1, 2),
p(prefix) AS (VALUES {pf}),
m AS (
  SELECT dfv.role, p.prefix, dfv.term, dfv.df,
         row_number() OVER (
           PARTITION BY dfv.role, p.prefix
           ORDER BY dfv.df DESC, dfv.term) rk
  FROM dfv JOIN p ON dfv.term LIKE p.prefix || '%'
)
SELECT role, prefix, term, df FROM m WHERE rk <= {_CTX_COMPLETE_K}
ORDER BY role, prefix, df DESC, term
"""


_TOPIC_BOUNDARY_E6 = 200_000


def _q_topic_boundaries(sf_dir: str):
    """TextTiling-style topic-shift segmentation (stages/windows.
    adjacent_turn_jaccard): exact integer Jaccard of adjacent turns'
    distinct token sets per conversation; a pair under 0.2 flags a
    boundary.  Conv-bucketed shuffle + relational intersection — no
    per-pair Python.  The SQL restates the exploded self-join."""
    import ray.data as rd

    from horus_ner_ray.stages.windows import adjacent_turn_jaccard

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "text"])
    out = adjacent_turn_jaccard(
        ds, boundary_below_e6=_TOPIC_BOUNDARY_E6).to_pandas()
    return (out.sort_values(["conv_id", "turn"])
            .reset_index(drop=True))


def _sql_topic_boundaries() -> str:
    _files, glob = _transcript_corpus(_oracle_sf())
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, {_sql_tok()} AS arr
  FROM read_parquet('{glob}')
),
sz AS (SELECT conv_id, turn_idx,
              len(list_distinct(arr))::HUGEINT s
       FROM t),
d AS (SELECT conv_id, turn_idx, unnest(list_distinct(arr)) AS term
      FROM t),
ix AS (
  SELECT a.conv_id, a.turn_idx, count(*)::HUGEINT i
  FROM d a JOIN d b ON b.conv_id = a.conv_id
                   AND b.turn_idx = a.turn_idx + 1
                   AND b.term = a.term
  GROUP BY 1, 2
),
p AS (
  SELECT a.conv_id, a.turn_idx, a.s sa, b.s sb, coalesce(ix.i, 0) i
  FROM sz a
  JOIN sz b ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
  LEFT JOIN ix ON ix.conv_id = a.conv_id AND ix.turn_idx = a.turn_idx
)
SELECT conv_id, turn_idx::BIGINT AS turn,
       (CASE WHEN sa + sb - i > 0
             THEN (i * 1000000) // (sa + sb - i) ELSE 0 END)::BIGINT
         AS jaccard_e6,
       (CASE WHEN (CASE WHEN sa + sb - i > 0
                        THEN (i * 1000000) // (sa + sb - i)
                        ELSE 0 END) < {_TOPIC_BOUNDARY_E6}
             THEN 1 ELSE 0 END)::BIGINT AS boundary
FROM p ORDER BY conv_id, turn
"""


def _q_anomalous_hours(sf_dir: str):
    """Histogram anomaly detection with ZERO float ops (stages/aggs.
    anomalous_buckets): hourly buckets whose count deviates from the
    mean by > k sigma, decided by the exact integer inequality
    (B*n - S)^2 > k^2 (B*Sxx - S^2) — no division, no sqrt, nothing to
    round; the SQL states the identical HUGEINT inequality."""
    import ray.data as rd

    from horus_ner_ray.stages.aggs import anomalous_buckets

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["ts"])
    return anomalous_buckets(ev, "ts", 3600 * 10**6, k_sigma=1)


_SQL_ANOMALOUS_HOURS = """
WITH c AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
         count(*)::HUGEINT n
  FROM events GROUP BY 1
),
t AS (SELECT count(*)::HUGEINT b, sum(n) s, sum(n*n) sxx FROM c)
SELECT c.bucket_us::BIGINT AS bucket_us, c.n::BIGINT AS n_docs,
       (CASE WHEN t.b * c.n - t.s > 0 THEN 1 ELSE -1 END)::BIGINT
         AS dev_sign
FROM c, t
WHERE (t.b * c.n - t.s) * (t.b * c.n - t.s)
      > 1 * (t.b * t.sxx - t.s * t.s)
ORDER BY bucket_us
"""


def _q_price_robust_scaled(sf_dir: str):
    """Per-row robust scaling ((x - median) / MAD within l_returnflag —
    sklearn RobustScaler; stages/stats.grouped_robust_scale): median/MAD
    are exact order statistics from the MAD engine, the row expression
    is three IEEE ops, e6-published.  The SQL chains quantile_disc
    medians + deviation medians + the same expression."""
    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_robust_scale

    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_orderkey", "l_linenumber",
                                  "l_returnflag", "l_extendedprice"])
    return grouped_robust_scale(li, "l_returnflag", "l_extendedprice",
                                id_cols=["l_orderkey", "l_linenumber"])


_SQL_PRICE_ROBUST = """
WITH med AS (
  SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS m
  FROM lineitem GROUP BY 1
),
dev AS (
  SELECT l.l_returnflag, abs(l.l_extendedprice - med.m) AS d
  FROM lineitem l JOIN med USING (l_returnflag)
),
mad AS (
  SELECT l_returnflag, quantile_disc(d, 0.5) AS md
  FROM dev GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber,
       CASE WHEN mad.md > 0
            THEN CAST(FLOOR((l.l_extendedprice - med.m) / mad.md * 1e6
                            + 0.5) AS BIGINT)
            ELSE 0 END AS r_e6
FROM lineitem l
JOIN med USING (l_returnflag)
JOIN mad USING (l_returnflag)
"""


def _q_partitioned_export(sf_dir: str):
    """Hive-partitioned Parquet sink + PRUNED read-back (functions/
    export.write_partitioned_parquet: one source=<v>/ dir per partition,
    atomic + skip-if-exists — the resumable-output layout; the reader
    opens ONLY the requested partitions).  Round-trips three sources
    and publishes their rows; the oracle selects the same slice from
    the original table — any row the layout loses or duplicates breaks
    the hash."""
    import ray.data as rd

    from horus_ner_ray.functions.export import (read_partitioned_parquet,
                                                write_partitioned_parquet)

    sf = Path(sf_dir).name.replace("sf", "")
    out = Path(os.environ.get("GRAFT_TMP", "/tmp")) / f"horus_part_{sf}"
    marker = out / "state.done"
    if not marker.exists():
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                               columns=["doc_id", "text", "source"])
        write_partitioned_parquet(docs, out, "source")
        marker.write_text("ok")
    want = ["src3", "src7", "src15"]
    back = read_partitioned_parquet(out, "source", values=want).to_pandas()
    res = pd.DataFrame({
        "doc_id": back["doc_id"].astype(np.int64),
        "source": back["source"].astype(str),
        "n_chars": back["text"].str.len().astype(np.int64),
    })
    return res.sort_values("doc_id").reset_index(drop=True)


_SQL_PARTITIONED_EXPORT = """
SELECT doc_id, source, length(text)::BIGINT AS n_chars
FROM documents
WHERE source IN ('src3', 'src7', 'src15')
ORDER BY doc_id
"""


_INGEST_STEPS = [
    {"op": "extract", "field": "text", "pattern": "[0-9]+",
     "target": "first_num"},
    {"op": "gsub", "field": "text", "pattern": r"\s+",
     "replacement": " "},
    {"op": "trim", "field": "text"},
    {"op": "uppercase", "field": "lang"},
    {"op": "rename", "field": "lang", "target": "lang_uc"},
    {"op": "set", "field": "pipeline", "value": "v1"},
    {"op": "length", "field": "text", "target": "clean_len"},
]


def _q_ingest_processors(sf_dir: str):
    """Declarative ingest-processor chain (the ES ingest-pipeline shape,
    stages/ingest.apply_ingest): extract-first-number, whitespace
    collapse, trim, uppercase+rename, constant tag, post-clean length —
    ONE streaming map_batches of columnar Arrow kernels; the SQL
    restates the chain processor by processor."""
    import ray.data as rd

    from horus_ner_ray.stages.ingest import apply_ingest

    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["doc_id", "text", "lang"])
    out = apply_ingest(docs, _INGEST_STEPS).to_pandas()
    cols = ["doc_id", "first_num", "text", "lang_uc", "pipeline",
            "clean_len"]
    out = out[cols]
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["clean_len"] = out["clean_len"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _sql_ingest_processors() -> str:
    return r"""
SELECT doc_id,
       regexp_extract(text, '[0-9]+') AS first_num,
       trim(regexp_replace(text, '\s+', ' ', 'g')) AS text,
       upper(lang) AS lang_uc,
       'v1' AS pipeline,
       length(trim(regexp_replace(text, '\s+', ' ', 'g')))::BIGINT
         AS clean_len
FROM documents ORDER BY doc_id
"""


def _q_curriculum_order(sf_dir: str):
    """Curriculum ordering: every document globally ranked by an exact
    integer difficulty score (vocabulary-richness ratio
    (n_unique * 1e6) // n_tokens, ascending -> easiest-first) WITHOUT
    driver collection (stages/analytic.global_rank_by: order-preserving
    range buckets + O(B) prefix offsets + bucket-local sort — the
    distributed row_number() OVER (ORDER BY ...))."""
    from horus_ner_ray.stages.analysis import quality_dataset
    from horus_ner_ray.stages.analytic import global_rank_by
    from horus_ner_ray.util import worker_runtime_env as _rte

    q = quality_dataset(_read_docs(sf_dir))

    def score(batch):
        import pyarrow as pa

        u = np.asarray(batch["n_unique"], dtype=np.int64)
        t = np.asarray(batch["n_tokens"], dtype=np.int64)
        s = np.where(t > 0, (u * 10**6) // np.maximum(t, 1), 0)
        return pa.table({"doc_id": batch["doc_id"],
                         "score": pa.array(s, pa.int64())})

    scored = q.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True, runtime_env=_rte())
    out = global_rank_by(scored, ["score"], "doc_id",
                         bounds=[0, 10**6 + 1]).to_pandas()
    out = out[["doc_id", "score", "rank"]].astype(np.int64)
    return out.sort_values("rank").reset_index(drop=True)


def _sql_curriculum_order() -> str:
    return f"""
WITH q AS (
  SELECT doc_id,
         len(list_distinct({_sql_tok()}))::BIGINT u,
         len({_sql_tok()})::BIGINT t
  FROM documents
),
s AS (
  SELECT doc_id,
         CASE WHEN t > 0 THEN (u * 1000000) // t ELSE 0 END::BIGINT
           AS score
  FROM q
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score, doc_id)::BIGINT AS rank
FROM s ORDER BY rank
"""


def _q_percentiles_bucket(sf_dir: str):
    """ES percentiles_bucket pipeline agg over the daily event
    histogram: exact discrete percentiles of the bucket counts
    (stages/aggs.percentiles_bucket, the shared 1-based ceil(p*n/100)
    order-statistic rule)."""
    import ray.data as rd

    from horus_ner_ray.stages.aggs import percentiles_bucket

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["ts"])
    return percentiles_bucket(ev, "ts", _DAY_US, [25, 50, 75, 99])


def _q_ann_refine(sf_dir: str):
    """Two-stage ANN with exact refinement (FAISS IndexRefineFlat over
    IVFPQ): PQ asymmetric distance proposes each query's top-20, the
    exact cosine re-scores ONLY those candidates in one masked streaming
    pass (stages/pq.ivfpq_refine) — the recall-repair step after lossy
    compression.  The SQL chains the full IVFPQ oracle for the candidate
    window, then re-ranks with list_cosine_similarity."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from horus_ner_ray.stages.pq import ivfpq_refine

    path = str(Path(sf_dir) / "embeddings.parquet")
    qt = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
    qt = qt[qt.vec_id < 5].sort_values("vec_id")
    qm = np.array(qt["embedding"].tolist(), dtype=np.float64)
    pqi, _emb = _pq_fitted(sf_dir)
    return ivfpq_refine(
        rd.read_parquet(path, columns=["vec_id", "embedding"]),
        qt["vec_id"].to_numpy(np.int64), qm, k=TOPK, r=20,
        n_centroids=_IVF_K, nprobe=_IVF_NPROBE, m=_PQ_M, ks=_PQ_KS,
        n_iter=_PQ_ITERS, pq=pqi)


def _sql_ann_refine() -> str:
    return f"""
WITH cand AS (SELECT * FROM ({_sql_ivfpq_ann(20)})),
s AS (
  SELECT c.query_id, c.vec_id,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS cs
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings q ON q.vec_id = c.query_id
),
r AS (
  SELECT query_id, vec_id,
         CAST(FLOOR(cs * 1e6 + 0.5) AS BIGINT) AS cosine_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(cs * 1e6 + 0.5) AS BIGINT) DESC, vec_id
         ) AS rk
  FROM s
)
SELECT query_id, rk AS rank, vec_id, cosine_e6 FROM r WHERE rk <= {TOPK}
"""


def _q_orders_left_join(sf_dir: str):
    """LEFT OUTER hash join (orders x high-quantity lineitems on
    orderkey) with explicit COALESCE fills — unmatched orders survive
    carrying -1 (stages/joins.hash_join_dataset(how='left'): both sides
    bucket by the same key hash, so emitting unmatched rows is
    bucket-local; int payloads stay int64, no nullable promotion)."""
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import buckets_for_rows
    from horus_ner_ray.stages.joins import hash_join_dataset

    orders = rd.read_parquet(str(Path(sf_dir) / "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    orders = orders.map_batches(
        lambda b: b.rename_columns(["k", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    li = rd.read_parquet(str(Path(sf_dir) / "lineitem.parquet"),
                         columns=["l_orderkey", "l_linenumber",
                                  "l_quantity"])
    li = (li.filter(expr="l_quantity >= 49")
          .select_columns(["l_orderkey", "l_linenumber"])
          .map_batches(lambda b: b.rename_columns(["k", "l_linenumber"]),
                       batch_format="pyarrow", zero_copy_batch=True))
    j = hash_join_dataset(
        orders, li, key="k",
        left_cols=["o_custkey"], right_cols=["l_linenumber"],
        n_buckets=buckets_for_rows(
            _n_rows(str(Path(sf_dir) / "orders.parquet"))),
        how="left", left_fill={"l_linenumber": -1})
    out = j.to_pandas()
    out = out.rename(columns={"k": "o_orderkey",
                              "l_linenumber_r": "line_no"})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["o_orderkey", "line_no"])
            .reset_index(drop=True))


def _q_bucket_stats_pipeline(sf_dir: str):
    """ES sibling pipeline aggs (stats_bucket / avg_bucket / min_bucket /
    max_bucket / sum_bucket) over the daily event histogram: statistics
    OF the bucket counts, argmin/argmax bucket keys tie-broken earliest,
    mean as an exact big-int floor division
    (stages/aggs.sibling_bucket_stats)."""
    import ray.data as rd

    from horus_ner_ray.stages.aggs import sibling_bucket_stats

    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["ts"])
    return sibling_bucket_stats(ev, "ts", _DAY_US)


def _q_histogram_top_buckets(sf_dir: str):
    """ES bucket_selector + bucket_sort pipeline aggs over a daily
    date_histogram: drop buckets below total//40 docs, rank the rest by
    (count desc, day asc), keep 10 (stages/aggs.bucket_sort_histogram).
    The threshold derives from the row count on BOTH sides, so the
    selector genuinely splits at every scale factor."""
    import ray.data as rd

    from horus_ner_ray.stages.aggs import bucket_sort_histogram

    n = _n_rows(str(Path(sf_dir) / "events.parquet"))
    ev = rd.read_parquet(str(Path(sf_dir) / "events.parquet"),
                         columns=["ts"])
    return bucket_sort_histogram(ev, "ts", _DAY_US,
                                 min_count=n // 40, limit=10)


_EPOCH_FACTORS = {"src1": 3, "src7": 2, "src13": 4}


def _q_epoch_repeats(sf_dir: str):
    """Per-source epoch upsampling for data mixtures (functions/
    sampling.epoch_repeats): sources at k epochs emit every doc k times
    tagged repeat_idx 0..k-1 — a pure streaming map, no shuffle.  The
    SQL replays the factor table with generate_series."""
    import ray.data as rd

    from horus_ner_ray.functions.sampling import epoch_repeats

    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["doc_id", "source"])
    return epoch_repeats(docs, "source", "doc_id", _EPOCH_FACTORS)


def _sql_epoch_repeats() -> str:
    vals = ", ".join(f"('{s}', {k})" for s, k in _EPOCH_FACTORS.items())
    return f"""
WITH f(source, k) AS (VALUES {vals})
SELECT d.doc_id, d.source,
       unnest(generate_series(0, coalesce(f.k, 1) - 1))::BIGINT
         AS repeat_idx
FROM documents d LEFT JOIN f USING (source)
"""


def _q_token_fertility(sf_dir: str):
    """Tokenizer fertility by source (stages/aggs.fertility_by_group):
    docs / tokens (shared [a-z0-9]+ rule) / chars / tokens-per-1000-
    chars as an exact big-int floor division — the pre-training
    mixture health check."""
    import ray.data as rd

    from horus_ner_ray.stages.aggs import fertility_by_group

    docs = rd.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                           columns=["source", "text"])
    return fertility_by_group(docs, "source", "text")


def _sql_token_fertility() -> str:
    return f"""
WITH d AS (
  SELECT source, len({_sql_tok()})::BIGINT tok,
         length(text)::HUGEINT ch
  FROM documents
)
SELECT source, count(*)::BIGINT n_docs, sum(tok)::BIGINT n_tokens,
       sum(ch)::BIGINT n_chars,
       ((sum(tok)::HUGEINT * 1000 * 1000000) // sum(ch))::BIGINT
         AS tok_per_kchar_e6
FROM d GROUP BY 1 ORDER BY 1
"""


def queries() -> dict[str, Callable[[str], Any]]:
    # Registry ORDER is deliberate: the driver's correctness gate walks it
    # front to back under a budget (round 4's file truncated at entry 50),
    # so entries that have never appeared in a driver-side CORRECTNESS file
    # (round-3/4/5 additions) run FIRST; the 50 entries already verified by
    # the r04 driver run follow.
    return {
        # --- never driver-checked (r04 truncated before these) + round-5 --
        "epoch_repeats": _q_epoch_repeats,
        "token_fertility": _q_token_fertility,
        "weekday_profile": _q_weekday_profile,
        "gif_frame_sample": _q_gif_frame_sample,
        "hourly_autocorr": _q_hourly_autocorr,
        "price_quartile_bins": _q_price_quartile_bins,
        "soundex_terms": _q_soundex_terms,
        "jw_name_pairs": _q_jw_name_pairs,
        "complete_by_role": _q_complete_by_role,
        "topic_boundaries": _q_topic_boundaries,
        "anomalous_hours": _q_anomalous_hours,
        "price_robust_scaled": _q_price_robust_scaled,
        "partitioned_export": _q_partitioned_export,
        "ingest_processors": _q_ingest_processors,
        "curriculum_order": _q_curriculum_order,
        "percentiles_bucket": _q_percentiles_bucket,
        "ann_refine": _q_ann_refine,
        "orders_left_join": _q_orders_left_join,
        "bucket_stats_pipeline": _q_bucket_stats_pipeline,
        "bm25_wildcard": _q_bm25_wildcard,
        "ipc_source": _q_ipc_source,
        "dedup_keep_best": _q_dedup_keep_best,
        "fuzzy_osa_topk": _q_fuzzy_osa_topk,
        "classic_topk": _q_classic_topk,
        "weighted_avg_price": _q_weighted_avg_price,
        "string_stats_docs": _q_string_stats_docs,
        "top_metrics_events": _q_top_metrics_events,
        "daily_new_users": _q_daily_new_users,
        "histogram_top_buckets": _q_histogram_top_buckets,
        "bm25_query_string": _q_bm25_query_string,
        "dsir_select": _q_dsir_select,
        "token_budget_mix": _q_token_budget_mix,
        "auto_date_histogram": _q_auto_date_histogram,
        "moving_avg_histogram": _q_moving_avg_histogram,
        "csv_source": _q_csv_source,
        "bm25_rollover": _q_bm25_rollover,
        "sq_ann": _q_sq_ann,
        "cv_predictions": _q_cv_predictions,
        "chi2_terms": _q_chi2_terms,
        "price_ttest": _q_price_ttest,
        "value_boxplot": _q_value_boxplot,
        "bm25_after_ttl": _q_bm25_after_ttl,
        "bm25_federated": _q_bm25_federated,
        "ann_filtered": _q_ann_filtered,
        "hybrid_rrf": _q_hybrid_rrf,
        "conv_turns": _q_conv_turns,
        "bm25_matches_export": _q_bm25_matches_export,
        "price_mad": _q_price_mad,
        "bm25_after_delete_query": _q_bm25_after_delete_query,
        "vocab_growth": _q_vocab_growth,
        "role_log_odds": _q_role_log_odds,
        "bm25_conv_topk": _q_bm25_conv_topk,
        "jsonl_source": _q_jsonl_source,
        "grep_context": _q_grep_context,
        "bm25_redacted": _q_bm25_redacted,
        "bm25_common_terms": _q_bm25_common_terms,
        "term_burstiness": _q_term_burstiness,
        "event_gap_quantiles": _q_event_gap_quantiles,
        "bm25_boosting": _q_bm25_boosting,
        "bm25_dismax": _q_bm25_dismax,
        "bm25_phrase_prefix": _q_bm25_phrase_prefix,
        "kn_bigram_logprob": _q_kn_bigram,
        "jl_projection": _q_jl_projection,
        "matrix_stats": _q_matrix_stats,
        "composite_pages": _q_composite_pages,
        "bm25_fragments": _q_bm25_fragments,
        "bm25_span_not": _q_bm25_span_not,
        "ts_percentile_ranks": _q_ts_percentile_ranks,
        "bpe_encoded": _q_bpe_encoded,
        "adjacency_cells": _q_adjacency_cells,
        "conversion_times": _q_conversion_times,
        "lm_ranking_eval": _q_lm_ranking_eval,
        "date_histogram_pipeline": _q_date_histogram_pipeline,
        "completions": _q_completions,
        "qty_skew_kurt": _q_qty_skew_kurt,
        "props_field_stats": _q_props_field_stats,
        "sample_by_source_temp": _q_sample_by_source_temp,
        "orders_profile": _q_orders_profile,
        "phrase_suggestions": _q_phrase_suggest,
        "negative_pairs": _q_negative_pairs,
        "trending_terms": _q_trending_terms,
        "rocchio_predictions": _q_rocchio_predictions,
        "conv_profiles": _q_conv_profiles,
        "winsorized_price": _q_winsorized_price,
        "role_term_stats": _q_role_term_stats,
        "bucket_churn": _q_bucket_churn,
        "interleaved_eval": _q_interleaved,
        "substring_counts": _q_substring_counts,
        "rare_terms": _q_rare_terms,
        "group_split": _q_group_split,
        "term_pagerank": _q_term_pagerank,
        "cooc_triangles": _q_cooc_triangles,
        "dup_spans": _q_dup_spans,
        "bm25_stemmed": _q_bm25_stemmed,
        "bpe_merges": _q_bpe_merges,
        "bm25_span_first": _q_bm25_span_first,
        "bm25_rrf": _q_bm25_rrf,
        "chunked_docs": _q_chunked_docs,
        "bm25_recency": _q_bm25_recency,
        "bm25_diverse": _q_bm25_diverse,
        "bm25_boosted": _q_bm25_boosted,
        "bm25_collapse": _q_bm25_collapse,
        "bm25_phrase_slop": _q_bm25_phrase_slop,
        "weighted_sample": _q_weighted_sample,
        "packed_sequences": _q_packed_sequences,
        "sample_by_source": _q_sample_by_source,
        "doc_term_vectors": _q_doc_term_vectors,
        "ts_percentiles": _q_ts_percentiles,
        "bm25_rescore": _q_bm25_rescore,
        "bm25_corrected": _q_bm25_corrected,
        "pq_codes": _q_pq_codes,
        "pq_ann": _q_pq_ann,
        "ivfpq_ann": _q_ivfpq_ann,
        "bm25_relaxed": _q_bm25_relaxed,
        "bm25_top_per_role": _q_bm25_top_per_role,
        "suggest_terms": _q_suggest_terms,
        "bm25_snippet_text": _q_bm25_snippet_text,
        "significant_terms": _q_significant_terms,
        "bm25_after_merge": _q_bm25_after_merge,
        "bm25_boolean_msm": _q_bm25_boolean_msm,
        "match_counts": _q_match_counts,
        "bm25_sorted_by_time": _q_bm25_sorted_by_time,
        "lm_topk": _q_lm_topk,
        "percolate_matches": _q_percolate,
        "regex_topk": _q_regex_topk,
        "ts_field_stats": _q_ts_field_stats,
        "synonym_topk": _q_synonym_topk,
        "bm25_after_delete": _q_bm25_after_delete,
        "bm25_after_compact": _q_bm25_after_compact,
        "bm25_near": _q_bm25_near,
        "bm25_date_histogram": _q_bm25_date_histogram,
        "bm25_explain": _q_bm25_explain,
        "curation_pipeline": _q_curation_pipeline,
        "bm25_page2": _q_bm25_page2,
        "decontaminate": _q_decontaminate,
        "bm25_boolean": _q_bm25_boolean,
        "bm25_topk_prefix": _q_bm25_topk_prefix,
        "bm25_topk_not": _q_bm25_topk_not,
        "bm25_topk_fuzzy": _q_bm25_topk_fuzzy,
        "bm25_topk_infix": _q_bm25_topk_infix,
        "more_like_this": _q_more_like_this,
        "bm25_snippets": _q_bm25_snippets,
        "heavy_hitters": _q_heavy_hitters,
        "consecutive_events": _q_consecutive_events,
        "auto_stopwords": _q_auto_stopwords,
        "bm25_facets": _q_bm25_facets,
        "tfidf_cosine_pairs": _q_tfidf_cosine_pairs,
        "doc_keywords": _q_doc_keywords,
        "price_zscore": _q_price_zscore,
        "translate_hook": _q_translate_hook,
        "nb_predictions": _q_nb_predictions,
        "eval_confusion": _q_eval_confusion,
        "eval_metrics": _q_eval_metrics,
        "media_predictions": _q_media_predictions,
        "tool_transitions": _q_tool_transitions,
        "cube_revenue": _q_cube_revenue,
        "event_paths_top": _q_event_paths,
        "fuzzy_name_pairs": _q_fuzzy_name_pairs,
        "jpeg_features": _q_jpeg_features,
        "gif_pixels": _q_gif_pixels,
        "media_features": _q_media_features,
        "wav_stats": _q_wav_stats,
        "image_meta": _q_image_meta,
        "window_analytics": _q_window_analytics,
        "gopher_filter": _q_gopher_filter,
        "pii_redact": _q_pii_redact,
        "bpe_pairs": _q_bpe_pairs,
        "price_quantiles_cont": _q_price_quantiles_cont,
        "events_pivot": _q_events_pivot,
        "topic_scores": _q_topic_scores,
        "topic_predictions": _q_topic_predictions,
        "users_per_type": _q_users_per_type,
        "top_event_per_user": _q_top_event_per_user,
        "kmeans_clusters": _q_kmeans,
        "dup_components": _q_dup_components,
        "price_stats_by_flag": _q_price_stats_by_flag,
        "qty_price_corr": _q_qty_price_corr,
        "pmi_top": _q_pmi_top,
        "rolling_windows": _q_rolling_windows,
        "ranking_analytics": _q_ranking_analytics,
        "rollup_revenue": _q_rollup_revenue,
        "bigram_logprob": _q_bigram_logprob,
        "funnel_counts": _q_funnel,
        "cohort_retention": _q_cohort_retention,
        "price_histogram": _q_price_histogram,
        # --- verified by the r04 driver run (all green there) -------------
        "term_df": _q_term_df,
        "collection_stats": _q_collection_stats,
        "doc_lengths": _q_doc_lengths,
        "top_terms": _q_top_terms,
        "bm25_topk": _q_bm25_topk,
        "bm25_topk_and": _q_bm25_topk_and,
        "exact_dedup": _q_exact_dedup,
        "quality": _q_quality,
        "bpeish_counts": _q_bpeish,
        "events_tumbling": _q_events_tumbling,
        "events_hopping": _q_events_hopping,
        "session_windows": _q_sessions,
        "events_asof": _q_events_asof,
        "events_in_sessions": _q_events_in_sessions,
        "orders_topk_per_cust": _q_orders_topk_per_cust,
        "repetition_stats": _q_repetition,
        "line_dedup": _q_line_dedup,
        "tfidf_vectors": _q_tfidf,
        "unigram_logprob": _q_unigram_lp,
        "doc_chunks": _q_chunks,
        "value_quantiles_by_type": _q_value_quantiles_by_type,
        "price_quantiles": _q_price_quantiles,
        "lineitem_semi_bloom": _q_lineitem_semi_bloom,
        "lineitem_orders_join": _q_lineitem_orders_join,
        "lineitem_anti_bloom": _q_lineitem_anti_bloom,
        "stratified_sample": _q_stratified_sample,
        "tool_propagation": _q_tool_propagation,
        "ann_topk": _q_ann_topk,
        "embedding_dups": _q_embedding_dups,
        "embedding_dups_lsh": _q_embedding_dups_lsh,
        "orders_by_segment": _q_orders_by_segment,
        "orders_anti_join": _q_orders_anti_join,
        "train_test_split": _q_train_test_split,
        "split_counts": _q_split_counts,
        "minhash_pairs": _q_minhash_pairs,
        "jaccard_allpairs": _q_jaccard_allpairs,
        "jaccard_dups": _q_jaccard_dups,
        "ann_ivf": _q_ann_ivf,
        "ann_ivf_full": _q_ann_ivf_full,
        "simhash": _q_simhash,
        "hll_users": _q_hll_users,
        "langid": _q_langid,
        "fingerprint": _q_fingerprint,
        "transcripts_bm25": _q_transcripts_bm25,
        "bm25_topk_role": _q_bm25_topk_role,
        "bm25_topk_time": _q_bm25_topk_time,
        "bm25_topk_weighted": _q_bm25_topk_weighted,
        "bm25_phrase": _q_bm25_phrase,
        "conll_source": _q_conll_source,
        "conll_roundtrip": _q_conll_roundtrip,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------


def _sql_tok(col: str = "text") -> str:
    return f"regexp_extract_all(lower({col}), '{_TOKRE}')"


def _sql_values_queries(texts: list[str]) -> str:
    """Deduplicated (query_id, term) VALUES rows — set semantics, matching
    horus_ner_ray.pipelines.query.query_terms."""
    import re

    rows = []
    for qid, t in enumerate(texts):
        for term in sorted(set(re.findall(_TOKRE, t.lower()))):
            rows.append(f"({qid}, '{term}')")
    return ", ".join(rows)


def _sql_bm25(texts: list[str], conjunctive: bool, pre: str = "",
              role: str | None = None,
              ts_window: tuple[str, str] | None = None,
              role_weights: dict[str, float] | None = None,
              q_sql: str | None = None,
              exclude_rows: str | None = None,
              extra_where: str | None = None,
              rank_range: tuple[int, int] | None = None,
              boosts_list: list[dict[str, float]] | None = None,
              demote_rows: str | None = None,
              demote_nb_rows: str | None = None) -> str:
    """BM25 top-k SQL over a ``documents(doc_id, text)`` relation; ``pre``
    optionally prepends CTEs (ending with one named ``documents``) so the
    same scoring body runs over a derived doc table (transcripts).
    ``role`` / ``ts_window`` post-filter ranked docs by documents.role /
    documents.ts — collection statistics stay global, matching the
    engine's filtered-search semantics.

    ``q_sql`` replaces the (query_id, term) VALUES body — the wildcard
    oracle derives its expansions from ``dfv`` with LIKE there, keeping
    the expansion itself in SQL.  ``exclude_rows`` is a (query_id, term)
    VALUES list of boolean-NOT terms: any ranked doc containing one of
    its query's excluded terms is dropped before top-k (NOT EXISTS over
    tf), scores of survivors untouched — the engine's ``exclude=``
    semantics.

    ``boosts_list`` (one per-term weight map per query, aligned with
    ``texts``) restates the engine's Lucene ``term^boost``: the q relation
    carries a boost column and each term's idf is multiplied by it FIRST
    — ``(ln(...) * boost)`` — the engine's arithmetic point
    (``QueryEngine.search`` scales idfs before accumulation).  Driver
    boosts are powers of two, so the multiply is IEEE-exact on both
    sides."""
    joins: list[str] = []
    wheres: list[str] = []
    if conjunctive:
        joins.append("JOIN (SELECT query_id, count(*) nt FROM q "
                     "GROUP BY query_id) qn USING (query_id)")
        wheres.append("nhit = nt")
    if role is not None or ts_window is not None or role_weights is not None:
        joins.append("JOIN documents dm USING (doc_id)")
    if role is not None:
        wheres.append(f"dm.role = '{role}'")
    if ts_window is not None:
        wheres.append(f"dm.ts >= TIMESTAMP '{ts_window[0]}'")
        wheres.append(f"dm.ts <= TIMESTAMP '{ts_window[1]}'")
    sexpr = "score"
    if role_weights is not None:
        # one multiply of the accumulated double — the engine's exact
        # arithmetic point (QueryEngine._score_shard_*' wvec multiply)
        case = " ".join(f"WHEN '{r}' THEN {float(w)!r}"
                        for r, w in sorted(role_weights.items()))
        sexpr = f"(score * (CASE dm.role {case} ELSE 1.0 END))"
    if extra_where is not None:
        # arbitrary rank-time predicate over ``scored`` — the tombstone
        # oracle drops deleted docs here while stats stay full-corpus
        wheres.append(extra_where)
    qex = ""
    if exclude_rows is not None:
        qex = f"qex(query_id, term) AS (VALUES {exclude_rows}),\n"
        wheres.append(
            "NOT EXISTS (SELECT 1 FROM qex e JOIN tf x ON x.term = e.term"
            " AND x.doc_id = scored.doc_id WHERE e.query_id = scored.query_id)"
        )
    if demote_rows is not None:
        # boosting query: negative-term matches multiply the accumulated
        # double by the query's negative_boost ONCE — the engine's exact
        # arithmetic point (search_boosting's np.where multiply)
        qex += (f"qneg(query_id, term) AS (VALUES {demote_rows}),\n"
                f"qnb(query_id, nb) AS (VALUES {demote_nb_rows}),\n")
        joins.append("JOIN qnb USING (query_id)")
        sexpr = ("(score * (CASE WHEN EXISTS (SELECT 1 FROM qneg e "
                 "JOIN tf x ON x.term = e.term AND x.doc_id = scored.doc_id "
                 "WHERE e.query_id = scored.query_id) "
                 "THEN qnb.nb ELSE 1.0 END))")
    idf_expr = "ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))"
    if boosts_list is not None:
        import re

        rows = []
        for qid, (t, bmap) in enumerate(zip(texts, boosts_list)):
            for term in sorted(set(re.findall(_TOKRE, t.lower()))):
                rows.append(f"({qid}, '{term}', {float(bmap.get(term, 1.0))!r})")
        q_body = f"q(query_id, term, boost) AS (VALUES {', '.join(rows)})"
        idf_expr = f"({idf_expr} * q.boost)"
    else:
        q_body = (f"q(query_id, term) AS (VALUES {_sql_values_queries(texts)})"
                  if q_sql is None else f"q AS ({q_sql})")
    and_filter = " ".join(joins)
    if wheres:
        and_filter += " WHERE " + " AND ".join(wheres)
    return f"""
WITH {pre}tok AS (
  SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
{qex}{q_body},
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( {idf_expr}
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score,
         count(*) nhit
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR({sexpr} * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR({sexpr} * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM scored {and_filter}
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked
WHERE rk BETWEEN {rank_range[0] if rank_range else 1} AND {rank_range[1] if rank_range else TOPK}
"""


def _sql_bm25_prefix() -> str:
    """Wildcard oracle: the per-query term set is the UNION (set
    semantics, matching the engine's sorted-set expansion) of literal
    VALUES rows and LIKE-prefix selections from ``dfv`` — the dictionary
    expansion happens in SQL, so the oracle checks it rather than
    inlining it."""
    from horus_ner_ray.pipelines.query import parse_prefix_query

    parts: list[str] = []
    for qid, text in enumerate(PREFIX_QUERIES):
        lits, pres = parse_prefix_query(text)
        if lits:
            rows = ", ".join(f"({qid}, '{t}')" for t in lits)
            parts.append(f"SELECT * FROM (VALUES {rows}) v(query_id, term)")
        for p in pres:
            parts.append(
                f"SELECT {qid} AS query_id, term FROM dfv WHERE term LIKE '{p}%'")
    return _sql_bm25([], conjunctive=False, q_sql=" UNION ".join(parts))


def _sql_stem_case(col: str) -> str:
    """The Harman S-stemmer as a SQL CASE — the VERBATIM twin of
    horus_ner_ray.pipelines.query.s_stem (three ordered suffix rules with
    the same exception endings); change both or neither."""
    return f"""CASE
      WHEN {col} LIKE '%ies' AND {col} NOT LIKE '%eies'
           AND {col} NOT LIKE '%aies'
        THEN substr({col}, 1, length({col}) - 3) || 'y'
      WHEN {col} LIKE '%es' AND {col} NOT LIKE '%aes'
           AND {col} NOT LIKE '%ees' AND {col} NOT LIKE '%oes'
        THEN substr({col}, 1, length({col}) - 1)
      WHEN {col} LIKE '%s' AND {col} NOT LIKE '%us'
           AND {col} NOT LIKE '%ss'
        THEN substr({col}, 1, length({col}) - 1)
      ELSE {col} END"""


def _sql_bm25_stemmed() -> str:
    """Stem-expansion oracle: per query, the term set is every dfv term
    whose SQL-stem appears among the SQL-stems of the query's raw term
    VALUES — both sides of the stem rule run in SQL, so the rule itself
    is checked (the search_corrected precedent)."""
    import re

    parts: list[str] = []
    for qid, text in enumerate(STEM_QUERIES):
        raw = sorted(set(re.findall(_TOKRE, text.lower())))
        vals = ", ".join(f"('{t}')" for t in raw)
        parts.append(f"""SELECT {qid} AS query_id, term FROM dfv
            WHERE ({_sql_stem_case('term')}) IN (
              SELECT {_sql_stem_case('w')}
              FROM (VALUES {vals}) qr(w))""")
    return _sql_bm25([], conjunctive=False, q_sql=" UNION ".join(parts))


def _sql_bm25_span_first() -> str:
    """Span-first oracle: the standard OR scoring body plus a rank-time
    EXISTS over the first-FIRST_N token stream (1-based inclusive list
    slice of the shared tokenizer's output) — mask before top-k, stats
    global, exactly the engine's filter point."""
    pre = f"""firstpos AS (
      SELECT doc_id, unnest(({_sql_tok()})[1:{FIRST_N}]) AS term
      FROM documents
    ), """
    extra = ("EXISTS (SELECT 1 FROM firstpos fp JOIN q q2 "
             "ON q2.term = fp.term WHERE q2.query_id = scored.query_id "
             "AND fp.doc_id = scored.doc_id)")
    return _sql_bm25(FIRST_QUERIES, conjunctive=False, pre=pre,
                     extra_where=extra)


def _sql_bm25_snippets() -> str:
    """Snippet-anchor oracle: the standard BM25 ranking as a subquery,
    anchors re-derived as min(list_position(token_array, term)) - 1 over
    each query's terms (list_position is 1-based first occurrence; the
    engine's positions are 0-based unfiltered-stream indices)."""
    return f"""
WITH base AS ({_sql_bm25(DOC_QUERIES, conjunctive=False)}),
toka AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
q2(query_id, term) AS (VALUES {_sql_values_queries(DOC_QUERIES)}),
anch AS (
  SELECT q2.query_id, t.doc_id,
         (min(list_position(t.arr, q2.term)) - 1)::BIGINT AS anchor_pos
  FROM q2 JOIN toka t ON list_contains(t.arr, q2.term)
  GROUP BY 1, 2
)
SELECT b.query_id, b.rank, b.doc_id, b.score_e6, a.anchor_pos
FROM base b JOIN anch a ON a.query_id = b.query_id AND a.doc_id = b.doc_id
"""


def _sql_mlt() -> str:
    """Query-by-example oracle: per source doc, the top-``MLT_TERMS``
    tf*ln(N/df) terms (weight desc, term asc — identical float operands on
    both sides, so the cut agrees) feed the shared BM25 scoring body; the
    source doc is excluded from its own ranking."""
    src_vals = ", ".join(f"({i}, {d})" for i, d in enumerate(MLT_DOC_IDS))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
src(query_id, src_doc) AS (VALUES {src_vals}),
w AS (
  SELECT s.query_id, t.term,
         t.tf * ln((SELECT n_docs FROM stats)::DOUBLE / dfv.df) AS w
  FROM src s JOIN tf t ON t.doc_id = s.src_doc JOIN dfv USING (term)
),
q AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id ORDER BY w DESC, term) rk
    FROM w
  ) WHERE rk <= {MLT_TERMS}
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT sc.query_id, sc.doc_id,
         CAST(FLOOR(sc.score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY sc.query_id
           ORDER BY CAST(FLOOR(sc.score * 1e6 + 0.5) AS BIGINT) DESC, sc.doc_id
         ) rk
  FROM scored sc JOIN src s USING (query_id)
  WHERE sc.doc_id <> s.src_doc
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _sql_bm25_fuzzy(max_dist: int = 1) -> str:
    import re

    parts: list[str] = []
    for qid, text in enumerate(FUZZY_QUERIES):
        for tok in sorted(set(re.findall(_TOKRE, text.lower()))):
            parts.append(
                f"SELECT {qid} AS query_id, term FROM dfv "
                f"WHERE levenshtein(term, '{tok}') <= {max_dist}")
    return _sql_bm25([], conjunctive=False, q_sql=" UNION ".join(parts))


def _sql_bm25_infix() -> str:
    parts = [f"SELECT {qid} AS query_id, term FROM dfv "
             f"WHERE term LIKE '%{sub}%'"
             for qid, sub in enumerate(INFIX_QUERIES)]
    return _sql_bm25([], conjunctive=False, q_sql=" UNION ".join(parts))


def _sql_bm25_not() -> str:
    import re

    ex_rows: list[str] = []
    for qid, (_t, ex) in enumerate(NOT_QUERIES):
        for term in sorted(set(re.findall(_TOKRE, ex.lower()))):
            ex_rows.append(f"({qid}, '{term}')")
    return _sql_bm25([t for t, _ in NOT_QUERIES], conjunctive=False,
                     exclude_rows=", ".join(ex_rows))


def _oracle_sf() -> str:
    """The scale factor the oracle SQL pins for the synth-corpus queries.
    The driver compares at sf=0.01 (the default); a local conformance run
    against another sf dir sets GRAFT_ORACLE_SF so the read_parquet paths
    in the SQL match the queries() side."""
    return os.environ.get("GRAFT_ORACLE_SF", "0.01")


def _sql_transcripts_bm25() -> str:
    """DuckDB oracle for the flagship transcripts pipeline: reproduces the
    rank doc-id rule (doc_id = cumulative turn count of conv_ids sorting
    before + turn_idx) over the SAME deterministic synth part files the Ray
    pipeline indexes (conv ids are ASCII, so DuckDB's ORDER BY and numpy's
    sort agree), then runs the shared BM25 scoring body.  The driver
    compares at sf=0.01; synthesis is a cheap pure-Python pure function."""
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    pre = f"""raw AS (
  SELECT conv_id, turn_idx, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, text FROM raw JOIN offs USING (conv_id)
),
"""
    return _sql_bm25([q["text"] for q in reference_queries()], conjunctive=False, pre=pre)


_ROLLOVER_CAP = 1600


def _rollover_root(sf_dir: str) -> str:
    """Build (once, cached) a rollover TARGET over the transcript corpus:
    fragments ingest in order under the max_docs policy, so the target
    holds several sealed generations plus the active one, with at least
    one append event per generation."""
    from horus_ner_ray.pipelines.rollover import rollover_ingest
    from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION

    sf = Path(sf_dir).name.replace("sf", "")
    files, _glob = _transcript_corpus(sf)
    root = Path(os.environ.get("GRAFT_TMP", "/tmp")) / (
        f"horus_rollover_v{INDEX_FORMAT_VERSION}_{sf}")
    marker = root / "state.done"
    if not marker.exists():
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        cfg = PipelineConfig(num_shards=2, doc_id_mode="hash")
        rollover_ingest(root, files, max_docs=_ROLLOVER_CAP, cfg=cfg)
        marker.write_text("ok")
    return str(root)


def _q_bm25_rollover(sf_dir: str):
    """Index rollover / ILM write path (pipelines/rollover.py — ES
    _rollover max_docs): the transcript corpus ingests fragment by
    fragment, appending to the active generation until the cap seals it
    and a new index starts; the whole target then queries as ONE through
    rollover_engine (FederatedEngine — combined stats, merged-index
    parity).  Hash-mode doc ids aren't SQL-derivable, so hits translate
    to (conv_id, turn_idx) via per-generation docstore point reads and
    BOTH sides rank by (score_e6 desc, conv_id, turn_idx); the oracle is
    plain full-corpus BM25 — what's checked is that the rolled-over
    sequence answers exactly like the unpartitioned corpus."""
    from horus_ner_ray.pipelines.query import fetch_docs
    from horus_ner_ray.pipelines.rollover import (
        rollover_engine,
        rollover_indexes,
    )
    from horus_ner_ray.synth import reference_queries

    sf = Path(sf_dir).name.replace("sf", "")
    root = _rollover_root(sf_dir)
    fed = rollover_engine(root)
    texts = [q["text"] for q in reference_queries()]
    hits = [fed.search(t, TOPK * 3 + 20) for t in texts]
    ids = sorted({d for h in hits for d, _s in h})
    key: dict[int, tuple[str, int]] = {}
    for gdir in rollover_indexes(root):  # point reads, k-bounded
        rows = fetch_docs(gdir, ids, columns=["doc_id", "conv_id",
                                              "turn_idx"])
        for r in rows.itertuples():
            key[int(r.doc_id)] = (str(r.conv_id), int(r.turn_idx))
    out = []
    for qid, h in enumerate(hits):
        g = pd.DataFrame({
            "query_id": qid,
            "conv_id": [key[d][0] for d, _s in h],
            "turn_idx": np.array([key[d][1] for d, _s in h], np.int64),
            "score_e6": _e6(np.array([s for _d, s in h], np.float64)),
        })
        g = g.sort_values(["score_e6", "conv_id", "turn_idx"],
                          ascending=[False, True, True],
                          kind="stable").head(TOPK)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g[["query_id", "rank", "conv_id", "turn_idx",
                      "score_e6"]])
    return pd.concat(out, ignore_index=True)


def _sql_bm25_rollover() -> str:
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    texts = [q["text"] for q in reference_queries()]
    return f"""
WITH documents AS (
  SELECT conv_id, turn_idx, text FROM read_parquet('{glob}')
),
tok AS (
  SELECT conv_id, turn_idx, unnest({_sql_tok()}) AS term FROM documents
),
tf AS (SELECT conv_id, turn_idx, term, count(*)::BIGINT tf
       FROM tok GROUP BY 1, 2, 3),
dl AS (SELECT conv_id, turn_idx, count(*)::BIGINT dl
       FROM tok GROUP BY 1, 2),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE
           / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(texts)}),
scored AS (
  SELECT q.query_id, tf.conv_id, tf.turn_idx,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.conv_id = tf.conv_id AND dl.turn_idx = tf.turn_idx
  CROSS JOIN stats s
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT query_id, conv_id, turn_idx::BIGINT AS turn_idx,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC,
                    conv_id, turn_idx
         ) rk
  FROM scored
)
SELECT query_id, rk AS rank, conv_id, turn_idx, score_e6
FROM ranked WHERE rk <= {TOPK}
"""


def _sql_grouping_core(attr: str) -> str:
    """Shared CTE chain for the grouping oracles: rank-rule doc ids over
    the synth transcript files with ``attr`` riding the documents CTE,
    the standard BM25 scoring body, and an e6 relation ready for window
    reductions (the Ray side reduces in the same integer domain)."""
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    texts = [q["text"] for q in reference_queries()]
    return f"""raw AS (
  SELECT conv_id, turn_idx, role, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, {attr}, text
  FROM raw JOIN offs USING (conv_id)
),
tok AS (
  SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {_sql_values_queries(texts)}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM q
  JOIN dfv USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
e6 AS (
  SELECT sc.query_id, sc.doc_id, d.{attr},
         CAST(FLOOR(sc.score * 1e6 + 0.5) AS BIGINT) score_e6
  FROM scored sc JOIN documents d USING (doc_id)
)"""


def _sql_bm25_collapse() -> str:
    return f"""
WITH {_sql_grouping_core("conv_id")},
coll AS (
  SELECT query_id, conv_id, doc_id, score_e6,
         row_number() OVER (PARTITION BY query_id, conv_id
                            ORDER BY score_e6 DESC, doc_id) rin
  FROM e6
),
ranked AS (
  SELECT query_id, conv_id, doc_id, score_e6,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_e6 DESC, doc_id) rk
  FROM coll WHERE rin = 1
)
SELECT query_id, rk AS rank, conv_id, doc_id, score_e6
FROM ranked WHERE rk <= {TOPK}
"""


def _sql_bm25_top_per_role() -> str:
    return f"""
WITH {_sql_grouping_core("role")},
ranked AS (
  SELECT query_id, role, doc_id, score_e6,
         row_number() OVER (PARTITION BY query_id, role
                            ORDER BY score_e6 DESC, doc_id) rk
  FROM e6
)
SELECT query_id, role, rk AS rank, doc_id, score_e6
FROM ranked WHERE rk <= 3
"""


def _sql_transcripts_bm25_role(role: str = "user") -> str:
    """Field-scoped BM25 oracle: the transcripts pre additionally carries
    the role column; ranked docs post-filter on it while every collection
    statistic stays global (the engine's filtered-search semantics)."""
    from horus_ner_ray.synth import reference_queries

    _files, glob = _transcript_corpus(_oracle_sf())
    pre = f"""raw AS (
  SELECT conv_id, turn_idx, role, text FROM read_parquet('{glob}')
),
convs AS (SELECT conv_id, count(*) n FROM raw GROUP BY 1),
offs AS (
  SELECT conv_id,
         coalesce(sum(n) OVER (ORDER BY conv_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM convs
),
documents AS (
  SELECT (off + turn_idx)::BIGINT AS doc_id, role, text
  FROM raw JOIN offs USING (conv_id)
),
"""
    return _sql_bm25([q["text"] for q in reference_queries()],
                     conjunctive=False, pre=pre, role=role)


def _sql_bm25_near() -> str:
    """NEAR/window proximity over per-term position sets: a doc matches
    when min |p_a - p_b| over the two terms' occurrence cross-join is
    within the window — the SQL mirror of QueryEngine.search_near's
    minimal-cover predicate for 2 distinct terms (for two labels the
    minimal cover IS the closest cross-label pair).  Matches score with
    the same conjunctive BM25 body as the phrase oracle."""
    import re

    q_rows: list[str] = []
    matched: list[str] = []
    for qid, (text, w) in enumerate(NEAR_QUERIES):
        a, b = sorted(set(re.findall(_TOKRE, text.lower())))
        q_rows.append(f"({qid}, '{a}')")
        q_rows.append(f"({qid}, '{b}')")
        matched.append(
            f"SELECT {qid} AS query_id, a.doc_id FROM posr a "
            f"JOIN posr b ON b.doc_id = a.doc_id "
            f"WHERE a.term = '{a}' AND b.term = '{b}' "
            f"GROUP BY a.doc_id HAVING min(abs(a.pos - b.pos)) <= {w}"
        )
    matched_sql = "\n  UNION ALL ".join(matched)
    return f"""
WITH tok AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
posr AS (
  SELECT doc_id, unnest(arr) AS term,
         unnest(generate_series(1, len(arr))) AS pos
  FROM tok
),
flat AS (SELECT doc_id, unnest(arr) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM flat GROUP BY 1, 2),
dl AS (SELECT doc_id, len(arr)::BIGINT dl FROM tok),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {", ".join(q_rows)}),
matched AS (
  {matched_sql}
),
scored AS (
  SELECT m.query_id, m.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM matched m
  JOIN q ON q.query_id = m.query_id
  JOIN tf ON tf.doc_id = m.doc_id AND tf.term = q.term
  JOIN dfv ON dfv.term = q.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM scored
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _sql_bm25_phrase_slop() -> str:
    """Ordered sloppy phrase: per query an ordered position self-join
    (one posr alias per phrase label, ``a.pos < b.pos < ...``) with
    ``HAVING min(last - first - (n-1)) <= slop``; matches score with the
    shared conjunctive BM25 body (position base offsets cancel in the
    stretch, so 1-based SQL positions match the engine's 0-based ones)."""
    import re

    q_rows: list[str] = []
    matched: list[str] = []
    for qid, (text, slop) in enumerate(SLOP_QUERIES_DRV):
        terms = re.findall(_TOKRE, text.lower())
        for t in sorted(set(terms)):
            q_rows.append(f"({qid}, '{t}')")
        n = len(terms)
        aliases = [chr(ord("a") + i) for i in range(n)]
        joins = " ".join(
            f"JOIN posr {al} ON {al}.doc_id = a.doc_id"
            for al in aliases[1:])
        conds = [f"{al}.term = '{t}'" for al, t in zip(aliases, terms)]
        conds += [f"{x}.pos < {y}.pos"
                  for x, y in zip(aliases, aliases[1:])]
        matched.append(
            f"SELECT {qid} AS query_id, a.doc_id FROM posr a {joins} "
            f"WHERE {' AND '.join(conds)} "
            f"GROUP BY a.doc_id "
            f"HAVING min({aliases[-1]}.pos - a.pos - {n - 1}) <= {slop}"
        )
    matched_sql = "\n  UNION ALL ".join(matched)
    return f"""
WITH tok AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
posr AS (
  SELECT doc_id, unnest(arr) AS term,
         unnest(generate_series(1, len(arr))) AS pos
  FROM tok
),
flat AS (SELECT doc_id, unnest(arr) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM flat GROUP BY 1, 2),
dl AS (SELECT doc_id, len(arr)::BIGINT dl FROM tok),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {", ".join(q_rows)}),
matched AS (
  {matched_sql}
),
scored AS (
  SELECT m.query_id, m.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM matched m
  JOIN q ON q.query_id = m.query_id
  JOIN tf ON tf.doc_id = m.doc_id AND tf.term = q.term
  JOIN dfv ON dfv.term = q.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM scored
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _sql_bm25_phrase() -> str:
    """Phrase adjacency over the token array (list_transform sliding-window
    conjunction), scored with the same BM25 body over each phrase's member
    terms — the SQL mirror of QueryEngine.search_phrase."""
    import re

    q_rows: list[str] = []
    matched: list[str] = []
    for qid, text in enumerate(PHRASE_QUERIES):
        terms = re.findall(_TOKRE, text.lower())
        for t in sorted(set(terms)):
            q_rows.append(f"({qid}, '{t}')")
        n = len(terms)
        cond = " AND ".join(f"arr[i+{j}] = '{t}'" for j, t in enumerate(terms))
        matched.append(
            f"SELECT {qid} AS query_id, doc_id FROM tok WHERE len(arr) >= {n} "
            f"AND list_contains(list_transform(generate_series(1, len(arr) - {n - 1}), "
            f"i -> {cond}), true)"
        )
    matched_sql = "\n  UNION ALL ".join(matched)
    return f"""
WITH tok AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
flat AS (SELECT doc_id, unnest(arr) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM flat GROUP BY 1, 2),
dl AS (SELECT doc_id, len(arr)::BIGINT dl FROM tok),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {", ".join(q_rows)}),
matched AS (
  {matched_sql}
),
scored AS (
  SELECT m.query_id, m.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM matched m
  JOIN q ON q.query_id = m.query_id
  JOIN tf ON tf.doc_id = m.doc_id AND tf.term = q.term
  JOIN dfv ON dfv.term = q.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM scored
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _sql_bm25_boosting() -> str:
    """Negative-boost demotion through the shared BM25 body: qneg carries
    each query's negative terms, qnb its negative_boost, and the ranked
    score multiplies by nb exactly when a negative term's tf row exists
    for the doc — QueryEngine.search_boosting's arithmetic point."""
    import re

    neg_rows, nb_rows = [], []
    for qid, (_p, n, nb) in enumerate(BOOSTING_QUERIES):
        for t in sorted(set(re.findall(_TOKRE, n.lower()))):
            neg_rows.append(f"({qid}, '{t}')")
        nb_rows.append(f"({qid}, {float(nb)!r}::DOUBLE)")
    return _sql_bm25([p for p, _n, _nb in BOOSTING_QUERIES],
                     conjunctive=False,
                     demote_rows=", ".join(neg_rows),
                     demote_nb_rows=", ".join(nb_rows))


def _sql_bm25_dismax() -> str:
    """dis_max over two subqueries: per-subquery BM25 scored CTEs, FULL
    OUTER JOIN with COALESCE 0, then CASE a >= b THEN a + tb*b ELSE
    b + tb*a — the engine's first-argmax + ordered rest-sum rule
    (np.argmax picks the first max; tb powers of two keep the combine
    IEEE-exact)."""
    import re

    def _q_rows(texts_i: list[str]) -> str:
        rows = []
        for qid, t in enumerate(texts_i):
            for term in sorted(set(re.findall(_TOKRE, t.lower()))):
                rows.append(f"({qid}, '{term}')")
        return ", ".join(rows)

    q1 = _q_rows([a for a, _b, _t in DISMAX_QUERIES])
    q2 = _q_rows([b for _a, b, _t in DISMAX_QUERIES])
    tb = ", ".join(f"({qid}, {float(t)!r}::DOUBLE)"
                   for qid, (_a, _b, t) in enumerate(DISMAX_QUERIES))
    body = """
  SELECT {Q}.query_id, tf.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) score
  FROM {Q}
  JOIN dfv USING (term)
  JOIN tf ON tf.term = {Q}.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
""".replace("{K1}", str(BM25_K1)).replace("{B}", str(BM25_B))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT dl FROM tok GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
q1(query_id, term) AS (VALUES {q1}),
q2(query_id, term) AS (VALUES {q2}),
qtb(query_id, tb) AS (VALUES {tb}),
s1 AS ({body.replace("{Q}", "q1")}),
s2 AS ({body.replace("{Q}", "q2")}),
comb AS (
  SELECT coalesce(s1.query_id, s2.query_id) AS query_id,
         coalesce(s1.doc_id, s2.doc_id) AS doc_id,
         coalesce(s1.score, 0.0) AS a, coalesce(s2.score, 0.0) AS b
  FROM s1 FULL OUTER JOIN s2
    ON s1.query_id = s2.query_id AND s1.doc_id = s2.doc_id
),
final AS (
  SELECT c.query_id, c.doc_id,
         CASE WHEN a >= b THEN a + qtb.tb * b ELSE b + qtb.tb * a END AS score
  FROM comb c JOIN qtb ON qtb.query_id = c.query_id
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM final
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _sql_bm25_phrase_prefix() -> str:
    """match_phrase_prefix: per query, the prefix expands IN SQL (LIKE
    over dfv, term order, LIMIT max_expansions — the engine's
    first-max_expansions global-dictionary rule), candidacy is a
    position-chain join (fixed terms adjacent, then any expansion at the
    next position), and scoring is the shared BM25 body over the distinct
    FIXED terms only."""
    import re

    q_rows: list[str] = []
    exps: list[str] = []
    matched: list[str] = []
    for qid, (text, mx) in enumerate(PP_QUERIES_DRV):
        toks = re.findall(_TOKRE, text.lower())
        fixed, pref = toks[:-1], toks[-1]
        for t in sorted(set(fixed)):
            q_rows.append(f"({qid}, '{t}')")
        exps.append(
            f"exp{qid} AS (SELECT term FROM dfv WHERE term LIKE '{pref}%' "
            f"ORDER BY term LIMIT {mx})")
        n = len(fixed)
        chain_joins = []
        for j in range(1, n):
            chain_joins.append(
                f"JOIN positions p{j} ON p{j}.doc_id = p0.doc_id "
                f"AND p{j}.pos = p0.pos + {j} AND p{j}.term = '{fixed[j]}'")
        matched.append(
            f"SELECT DISTINCT {qid} AS query_id, p0.doc_id FROM positions p0 "
            + " ".join(chain_joins)
            + f" JOIN positions pe ON pe.doc_id = p0.doc_id "
            f"AND pe.pos = p0.pos + {n} "
            f"JOIN exp{qid} e ON pe.term = e.term "
            f"WHERE p0.term = '{fixed[0]}'")
    matched_sql = "\n  UNION ALL ".join(matched)
    exps_sql = ",\n".join(exps)
    return f"""
WITH tok AS (SELECT doc_id, {_sql_tok()} AS arr FROM documents),
positions AS (
  SELECT doc_id, unnest(arr) AS term,
         unnest(generate_series(1, len(arr))) AS pos
  FROM tok
),
flat AS (SELECT doc_id, unnest(arr) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::BIGINT tf FROM flat GROUP BY 1, 2),
dl AS (SELECT doc_id, len(arr)::BIGINT dl FROM tok),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) avgdl
),
dfv AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
{exps_sql},
q(query_id, term) AS (VALUES {", ".join(q_rows)}),
matched AS (
  {matched_sql}
),
scored AS (
  SELECT m.query_id, m.doc_id,
         sum( ln(1 + (s.n_docs - dfv.df + 0.5) / (dfv.df + 0.5))
              * tf.tf * ({BM25_K1} + 1)
              / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) ) score
  FROM matched m
  JOIN q ON q.query_id = m.query_id
  JOIN tf ON tf.doc_id = m.doc_id AND tf.term = q.term
  JOIN dfv ON dfv.term = q.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) score_e6,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) DESC, doc_id
         ) rk
  FROM scored
)
SELECT query_id, rk AS rank, doc_id, score_e6 FROM ranked WHERE rk <= {TOPK}
"""


def _sql_tool_propagation() -> str:
    """Forward-fill of the last non-empty tool within a conversation over
    the same synth transcript files the Ray pipeline reads."""
    _files, glob = _transcript_corpus(_oracle_sf())
    return f"""
SELECT conv_id, turn_idx,
       coalesce(last_value(nullif(tool, '') IGNORE NULLS) OVER (
         PARTITION BY conv_id ORDER BY turn_idx
         ROWS UNBOUNDED PRECEDING), '') AS tool_ctx
FROM read_parquet('{glob}')
"""


def _sql_jaccard_pairs(threshold: float) -> str:
    """Exact all-pairs word-3-gram Jaccard >= threshold — shared by the
    brute-force baseline (0.05) and the LSH+verify near-dup oracle (0.5;
    equality argument in _q_jaccard_dups's docstring)."""
    return f"""
        WITH toks AS (
          SELECT doc_id, {_sql_tok()} AS arr FROM documents
        ),
        pos AS (
          SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 2)) AS i
          FROM toks WHERE len(arr) >= 3
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
          FROM pos
        ),
        sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        pairs AS (
          SELECT a.doc_id da, b.doc_id db, count(*) inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT da AS doc_a, db AS doc_b,
               CAST(FLOOR(inter::DOUBLE / (sa.n + sb.n - inter) * 1e6 + 0.5) AS BIGINT) AS jaccard_e6
        FROM pairs
        JOIN sizes sa ON sa.doc_id = da
        JOIN sizes sb ON sb.doc_id = db
        WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= {threshold}
    """


def _sql_nb_pred() -> str:
    """Closed-form multinomial NB as CTEs ending in
    ``pred(doc_id, lang_true, pred_lang, score_e9)`` — the exact integer
    arithmetic of stages/classify.py: e9-quantized per-(term, class)
    log-likelihoods, integer score sums, argmax ties to the smallest
    class label."""
    return f"""
        WITH toks AS (
          SELECT doc_id, lang, unnest({_sql_tok()}) AS term FROM documents
        ),
        tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        cnt AS (SELECT lang, term, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
        tot AS (SELECT lang, sum(c)::BIGINT AS tot FROM cnt GROUP BY 1),
        vq AS (SELECT count(DISTINCT term)::BIGINT AS v FROM toks),
        ndq AS (SELECT count(*)::BIGINT AS n FROM documents),
        ndc AS (SELECT lang, count(*)::BIGINT AS nc FROM documents GROUP BY 1),
        classes AS (SELECT lang AS cls FROM ndc),
        contrib AS (
          SELECT tf.doc_id, cl.cls,
                 sum(tf.tf * CAST(FLOOR(ln(
                     (coalesce(cnt.c, 0) + 1)::DOUBLE
                     / (tot.tot + (SELECT v FROM vq))
                   ) * 1e9 + 0.5) AS BIGINT))::BIGINT AS sum_llh
          FROM tf CROSS JOIN classes cl
          JOIN tot ON tot.lang = cl.cls
          LEFT JOIN cnt ON cnt.lang = cl.cls AND cnt.term = tf.term
          GROUP BY 1, 2
        ),
        scores AS (
          SELECT d.doc_id, d.lang AS lang_true, cl.cls,
                 coalesce(co.sum_llh, 0)
                 + CAST(FLOOR(ln(ndc.nc::DOUBLE / (SELECT n FROM ndq)) * 1e9 + 0.5) AS BIGINT) AS score_e9
          FROM documents d CROSS JOIN classes cl
          JOIN ndc ON ndc.lang = cl.cls
          LEFT JOIN contrib co ON co.doc_id = d.doc_id AND co.cls = cl.cls
        ),
        pred AS (
          SELECT doc_id, lang_true, cls AS pred_lang, score_e9
          FROM scores
          QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY score_e9 DESC, cls) = 1
        )
    """


# read_text over the SAME files the Ray source parses; blank lines delimit
# sentences, -DOCSTART- rows are skipped, a missing tag column pads 'O'
# (the sample corpus never puts -DOCSTART- mid-sentence, where the Ray
# parser additionally merges across the following blank line)
_SQL_CONLL = """
    WITH f AS (
      SELECT regexp_extract(filename, '([^/]+)[.]conll$', 1) AS conv_id,
             content
      FROM read_text('{glob}')
    ),
    l AS (
      SELECT conv_id, ln, line, string_split(line, chr(9)) AS parts
      FROM (SELECT conv_id,
                   unnest(string_split(content, chr(10))) AS line,
                   generate_subscripts(string_split(content, chr(10)), 1) AS ln
            FROM f)
    ),
    s AS (
      SELECT conv_id, ln, parts,
             trim(line) <> '' AND parts[1] <> '-DOCSTART-' AS is_tok,
             sum(CASE WHEN trim(line) = '' THEN 1 ELSE 0 END)
               OVER (PARTITION BY conv_id ORDER BY ln
                     ROWS UNBOUNDED PRECEDING) AS grp
      FROM l
    ),
    sent AS (
      SELECT conv_id, grp,
             string_agg(parts[1], ' ' ORDER BY ln) AS text,
             string_agg(CASE WHEN len(parts) >= 2 THEN parts[2] ELSE 'O' END,
                        ' ' ORDER BY ln) AS tags
      FROM s WHERE is_tok GROUP BY conv_id, grp
    )
    SELECT conv_id,
           (row_number() OVER (PARTITION BY conv_id ORDER BY grp) - 1)::INT AS turn_idx,
           'sentence' AS role, text, tags
    FROM sent
"""


_SQL_COOC_EDGES = """
    toks AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, unnest({tok}) AS term FROM documents)
    ),
    dfv AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
    kept AS (
      SELECT term FROM dfv
      WHERE df >= 2
        AND df <= FLOOR(0.9 * (SELECT count(*) FROM documents))
    ),
    kt AS (SELECT t.doc_id, t.term FROM toks t JOIN kept k USING (term)),
    p AS MATERIALIZED (
      SELECT a.term AS ta, b.term AS tb, count(*)::BIGINT AS c
      FROM kt a JOIN kt b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term
      HAVING count(*) >= 2
    )"""


def _sql_term_pagerank(n_iter: int = 5, top_k: int = 100) -> str:
    """The exact-integer PageRank recurrence of stages/graph.py unrolled
    as chained CTEs over the pmi_top pair derivation.  MATERIALIZED is
    load-bearing: DuckDB inlines CTEs by default and would re-execute the
    multi-referenced rank chain exponentially (the pq_codes lesson)."""
    head = _SQL_COOC_EDGES + """,
    arcs AS MATERIALIZED (
      SELECT ta AS src, tb AS dst, c FROM p
      UNION ALL
      SELECT tb AS src, ta AS dst, c FROM p
    ),
    w AS MATERIALIZED (
      SELECT src, CAST(SUM(c) AS HUGEINT) AS wsum FROM arcs GROUP BY src
    ),
    r0 AS MATERIALIZED (
      SELECT src AS node, CAST(1000000000 AS HUGEINT) AS r FROM w
    )"""
    iters = "".join(f""",
    r{i} AS MATERIALIZED (
      SELECT a.dst AS node,
             CAST(150000000 AS HUGEINT)
             + SUM((85 * a.c * r.r) // (100 * w.wsum)) AS r
      FROM arcs a
      JOIN r{i - 1} r ON r.node = a.src
      JOIN w ON w.src = a.src
      GROUP BY a.dst
    )""" for i in range(1, n_iter + 1))
    return ("WITH " + head + iters + f"""
    SELECT node AS term, CAST(r AS BIGINT) AS rank_e9
    FROM r{n_iter}
    ORDER BY rank_e9 DESC, term
    LIMIT {top_k}
    """).replace("{tok}", _sql_tok())


def _sql_bpe_encode(n_merges: int) -> str:
    """The bpe_merges chain with the word CARRIED through every seg CTE,
    finished by the per-doc encode aggregation: n_subwords = sum over a
    doc's token instances of its word type's post-merge segment length
    (stages/bpe.bpe_encode_stats replays the same merges with the same
    sentinel-space replace)."""
    head = f"""
    words AS MATERIALIZED (
      SELECT term AS w, count(*)::BIGINT AS n
      FROM (SELECT unnest({_sql_tok()}) AS term FROM documents)
      GROUP BY term
    ),
    seg0 AS MATERIALIZED (
      SELECT w, n, regexp_replace(w, '(.)', ' \\1', 'g') || ' ' AS seg
      FROM words
    )"""
    steps = []
    for i in range(1, n_merges + 1):
        steps.append(f""",
    pos{i} AS (
      SELECT n, ts, unnest(generate_series(1, len(ts) - 1)) AS j
      FROM (SELECT n, string_split(trim(seg), ' ') AS ts FROM seg{i - 1})
    ),
    p{i} AS MATERIALIZED (
      SELECT ts[j] AS l, ts[j + 1] AS r, SUM(n)::BIGINT AS c
      FROM pos{i} GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (
      SELECT l, r FROM p{i} ORDER BY c DESC, l, r LIMIT 1
    ),
    seg{i} AS MATERIALIZED (
      SELECT w, n, replace(seg,
        ' ' || (SELECT l FROM b{i}) || ' ' || (SELECT r FROM b{i}) || ' ',
        ' ' || (SELECT l FROM b{i}) || (SELECT r FROM b{i}) || ' ') AS seg
      FROM seg{i - 1}
    )""")
    return ("WITH " + head + "".join(steps) + f""",
    docw AS (SELECT doc_id, unnest({_sql_tok()}) AS w FROM documents)
    SELECT d.doc_id, count(*)::BIGINT AS n_tokens,
           sum(len(string_split(trim(s.seg), ' ')))::BIGINT AS n_subwords
    FROM docw d JOIN seg{n_merges} s ON s.w = d.w
    GROUP BY 1 ORDER BY doc_id
    """)


def _sql_bpe_merges(n_merges: int) -> str:
    """The BPE merge loop of stages/bpe.py unrolled: each round counts
    adjacent symbol pairs over the current segmentations (list-indexed,
    the dup_spans position pattern), picks the best by
    (count desc, left, right), and rewrites segs with the same
    non-overlapping left-to-right ``replace()``.  MATERIALIZED is
    load-bearing (the pq_codes lesson)."""
    head = f"""
    words AS MATERIALIZED (
      SELECT term AS w, count(*)::BIGINT AS n
      FROM (SELECT unnest({_sql_tok()}) AS term FROM documents)
      GROUP BY term
    ),
    seg0 AS MATERIALIZED (
      SELECT n, regexp_replace(w, '(.)', ' \\1', 'g') || ' ' AS seg
      FROM words
    )"""
    steps = []
    for i in range(1, n_merges + 1):
        steps.append(f""",
    pos{i} AS (
      SELECT n, ts, unnest(generate_series(1, len(ts) - 1)) AS j
      FROM (SELECT n, string_split(trim(seg), ' ') AS ts FROM seg{i - 1})
    ),
    p{i} AS MATERIALIZED (
      SELECT ts[j] AS l, ts[j + 1] AS r, SUM(n)::BIGINT AS c
      FROM pos{i} GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (
      SELECT {i}::BIGINT AS step, l, r, c FROM p{i}
      ORDER BY c DESC, l, r LIMIT 1
    ),
    seg{i} AS MATERIALIZED (
      SELECT n, replace(seg,
        ' ' || (SELECT l FROM b{i}) || ' ' || (SELECT r FROM b{i}) || ' ',
        ' ' || (SELECT l FROM b{i}) || (SELECT r FROM b{i}) || ' ') AS seg
      FROM seg{i - 1}
    )""")
    union = " UNION ALL ".join(f"SELECT * FROM b{i}"
                               for i in range(1, n_merges + 1))
    return ("WITH " + head + "".join(steps) + f"""
    SELECT step, l AS "left", r AS "right", c AS pair_count
    FROM ({union}) ORDER BY step
    """)


def _sql_cooc_triangles() -> str:
    """Triangle census: each triangle ta < tb < tc counted once via the
    (e1, e2, e3) = ((a,b), (a,c), (b,c)) three-way self-join."""
    return ("WITH " + _SQL_COOC_EDGES + """
    SELECT
      (SELECT count(*) FROM (SELECT ta AS t FROM p
                             UNION SELECT tb FROM p)) ::BIGINT AS n_nodes,
      (SELECT count(*) FROM p)::BIGINT AS n_edges,
      (SELECT count(*) FROM p e1
         JOIN p e2 ON e2.ta = e1.ta AND e2.tb > e1.tb
         JOIN p e3 ON e3.ta = e1.tb AND e3.tb = e2.tb)::BIGINT
        AS n_triangles
    """).replace("{tok}", _sql_tok())


def oracle_sql() -> dict[str, str]:
    stop_sql = ", ".join(f"'{w}'" for w in _STOPLIST)
    _, _, conll_glob = _conll_sample_files()  # oracle reads the same bytes
    tmap = " ".join(f"WHEN w = '{k}' THEN '{v}'"
                    for k, v in _TRANSLATE_MAP.items())
    tlangs = ", ".join(f"'{l}'" for l in _TRANSLATE_LANGS)
    sql_cosine_topk = f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        s AS (
          SELECT q.qid AS query_id, e.vec_id,
                 list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS c
          FROM q CROSS JOIN embeddings e
        ),
        r AS (
          SELECT query_id, vec_id, CAST(FLOOR(c * 1e6 + 0.5) AS BIGINT) AS cosine_e6,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY CAST(FLOOR(c * 1e6 + 0.5) AS BIGINT) DESC, vec_id
                 ) AS rk
          FROM s
        )
        SELECT query_id, rk AS rank, vec_id, cosine_e6 FROM r WHERE rk <= {TOPK}
    """
    sql_cosine_filtered = f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
                   FROM embeddings WHERE vec_id < 5),
        s AS (
          SELECT q.qid AS query_id, e.vec_id,
                 list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS c
          FROM q JOIN embeddings e ON e.label = q.ql
        ),
        r AS (
          SELECT query_id, vec_id, CAST(FLOOR(c * 1e6 + 0.5) AS BIGINT) AS cosine_e6,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY CAST(FLOOR(c * 1e6 + 0.5) AS BIGINT) DESC, vec_id
                 ) AS rk
          FROM s
        )
        SELECT query_id, rk AS rank, vec_id, cosine_e6 FROM r WHERE rk <= {TOPK}
    """
    return {
        "epoch_repeats": _sql_epoch_repeats(),
        "token_fertility": _sql_token_fertility(),
        "weekday_profile": _SQL_WEEKDAY_PROFILE,
        "gif_frame_sample": _sql_gif_frame_sample(),
        "hourly_autocorr": _SQL_HOURLY_AUTOCORR,
        "price_quartile_bins": _SQL_PRICE_QUARTILE_BINS,
        "soundex_terms": _sql_soundex_terms(),
        "jw_name_pairs": _SQL_JW_NAME_PAIRS,
        "complete_by_role": _sql_complete_by_role(),
        "topic_boundaries": _sql_topic_boundaries(),
        "anomalous_hours": _SQL_ANOMALOUS_HOURS,
        "price_robust_scaled": _SQL_PRICE_ROBUST,
        "partitioned_export": _SQL_PARTITIONED_EXPORT,
        "ingest_processors": _sql_ingest_processors(),
        "curriculum_order": _sql_curriculum_order(),
        "percentiles_bucket": """
            WITH c AS (
              SELECT (epoch_us(ts) // 86400000000) * 86400000000
                       AS bucket_us,
                     count(*)::BIGINT n
              FROM events GROUP BY 1
            ),
            o AS (SELECT n, row_number() OVER (ORDER BY n) rn FROM c),
            nb AS (SELECT count(*)::BIGINT nb FROM c),
            p(pct) AS (VALUES (25), (50), (75), (99))
            SELECT p.pct::BIGINT AS pct, nb.nb AS n_buckets,
                   o.n::BIGINT AS value
            FROM p CROSS JOIN nb
            JOIN o ON o.rn = greatest(1, (p.pct * nb.nb + 99) // 100)
            ORDER BY pct
        """,
        "ann_refine": _sql_ann_refine(),
        "orders_left_join": """
            SELECT o.o_orderkey, o.o_custkey,
                   coalesce(l.l_linenumber, -1)::BIGINT AS line_no
            FROM orders o
            LEFT JOIN (SELECT l_orderkey, l_linenumber FROM lineitem
                       WHERE l_quantity >= 49) l
              ON l.l_orderkey = o.o_orderkey
            ORDER BY o.o_orderkey, line_no
        """,
        "bucket_stats_pipeline": """
            WITH c AS (
              SELECT (epoch_us(ts) // 86400000000) * 86400000000
                       AS bucket_us,
                     count(*)::BIGINT n
              FROM events GROUP BY 1
            )
            SELECT count(*)::BIGINT n_buckets, sum(n)::BIGINT sum_docs,
                   (SELECT n FROM c ORDER BY n, bucket_us LIMIT 1)::BIGINT
                     AS min_docs,
                   (SELECT bucket_us FROM c ORDER BY n, bucket_us
                    LIMIT 1)::BIGINT AS min_bucket_us,
                   (SELECT n FROM c ORDER BY n DESC, bucket_us
                    LIMIT 1)::BIGINT AS max_docs,
                   (SELECT bucket_us FROM c ORDER BY n DESC, bucket_us
                    LIMIT 1)::BIGINT AS max_bucket_us,
                   ((sum(n)::HUGEINT * 1000000) // count(*))::BIGINT
                     AS avg_docs_e6
            FROM c
        """,
        "bm25_wildcard": _sql_bm25_wildcard(),
        "ipc_source": _sql_ipc_source(),
        "dedup_keep_best": _sql_dedup_keep_best(),
        "fuzzy_osa_topk": _sql_fuzzy_osa(),
        "classic_topk": _sql_classic_topk(),
        "weighted_avg_price": """
            WITH q AS (
              SELECT l_returnflag,
                     CAST(FLOOR(l_extendedprice * 100 + 0.5) AS HUGEINT) x,
                     CAST(FLOOR(l_quantity + 0.5) AS HUGEINT) w
              FROM lineitem
            )
            SELECT l_returnflag, count(*)::BIGINT n_rows,
                   sum(w)::BIGINT wsum,
                   ((sum(x * w) * 1000000) // (100 * sum(w)))::BIGINT
                     AS wavg_e6
            FROM q GROUP BY 1 ORDER BY 1
        """,
        "string_stats_docs": """
            SELECT source, count(*)::BIGINT n_rows,
                   min(length(text))::BIGINT min_len,
                   max(length(text))::BIGINT max_len,
                   sum(length(text))::BIGINT sum_len,
                   ((sum(length(text)::HUGEINT) * 1000000)
                     // count(*))::BIGINT AS avg_len_e6
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "top_metrics_events": """
            WITH r AS (
              SELECT event_type, epoch_us(ts)::BIGINT ts_us, event_id,
                     CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) value_e6,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY ts DESC, event_id DESC) rk
              FROM events
            )
            SELECT event_type, ts_us, event_id, value_e6
            FROM r WHERE rk = 1 ORDER BY event_type
        """,
        "daily_new_users": """
            WITH f AS (
              SELECT user_id, min(epoch_us(ts))::BIGINT first_us
              FROM events GROUP BY 1
            ),
            c AS (
              SELECT (first_us // 86400000000) * 86400000000 AS bucket_us,
                     count(*)::BIGINT new_keys
              FROM f GROUP BY 1
            )
            SELECT bucket_us, new_keys,
                   sum(new_keys) OVER (ORDER BY bucket_us)::BIGINT
                     AS cum_keys
            FROM c ORDER BY bucket_us
        """,
        "histogram_top_buckets": """
            WITH c AS (
              SELECT (epoch_us(ts) // 86400000000) * 86400000000
                       AS bucket_us,
                     count(*)::BIGINT n_docs
              FROM events GROUP BY 1
            ),
            k AS (
              SELECT bucket_us, n_docs,
                     row_number() OVER (
                       ORDER BY n_docs DESC, bucket_us) rk
              FROM c
              WHERE n_docs >= (SELECT count(*) // 40 FROM events)
            )
            SELECT rk, bucket_us, n_docs FROM k WHERE rk <= 10
            ORDER BY rk
        """,
        "bm25_after_ttl": _sql_bm25_after_ttl(),
        "bm25_federated": _sql_bm25(DOC_QUERIES, conjunctive=False),
        "ann_filtered": sql_cosine_filtered,
        "hybrid_rrf": _sql_hybrid_rrf(),
        "conv_turns": _sql_conv_turns(),
        "bm25_matches_export": _sql_bm25_matches_export(),
        "bm25_after_delete_query": _sql_bm25(
            DOC_QUERIES, conjunctive=False,
            exclude_rows=", ".join(
                f"({qid}, '{t}')" for qid in range(len(DOC_QUERIES))
                for t in DELETE_QUERY_TERMS)),
        "vocab_growth": _sql_vocab_growth(),
        "role_log_odds": _sql_role_log_odds(),
        "bm25_conv_topk": _sql_bm25_conv(),
        "jsonl_source": _sql_jsonl_source(),
        "grep_context": _sql_grep_context(),
        "bm25_redacted": _sql_bm25_redacted(),
        "bm25_common_terms": _sql_bm25_common_terms(),
        "term_burstiness": _sql_term_burstiness(),
        "event_gap_quantiles": _sql_event_gap_quantiles(),
        "bm25_query_string": _sql_bm25_query_string(),
        "dsir_select": _sql_dsir_select(),
        "token_budget_mix": _sql_token_budget_mix(),
        "auto_date_histogram": _sql_auto_date_histogram(),
        "moving_avg_histogram": _sql_moving_avg_histogram(),
        "csv_source": _sql_csv_source(),
        "bm25_rollover": _sql_bm25_rollover(),
        "sq_ann": _sql_sq_ann(),
        "cv_predictions": _sql_cv_predictions(),
        "chi2_terms": _sql_chi2_terms(),
        "price_ttest": """
            WITH q AS (
              SELECT l_returnflag k,
                     CAST(FLOOR(l_extendedprice * 100 + 0.5) AS HUGEINT) x
              FROM lineitem WHERE l_returnflag IN ('A', 'R')
            ),
            s AS (SELECT k, count(*)::HUGEINT n, sum(x) sx, sum(x*x) sxx
                  FROM q GROUP BY 1),
            f AS (SELECT a.n na, b.n nb, a.sx sa, b.sx sb,
                         a.sxx qa, b.sxx qb
                  FROM s a, s b WHERE a.k = 'A' AND b.k = 'R'),
            g AS (SELECT na, nb,
                    CAST(na*qa - sa*sa AS DOUBLE)
                      / CAST(na*na*(na-1) AS DOUBLE) aa,
                    CAST(nb*qb - sb*sb AS DOUBLE)
                      / CAST(nb*nb*(nb-1) AS DOUBLE) ab,
                    CAST(sa*nb - sb*na AS DOUBLE)
                      / CAST(na*nb AS DOUBLE) md
                  FROM f)
            SELECT na::BIGINT n_a, nb::BIGINT n_b,
                   CAST(FLOOR(md / sqrt(aa + ab) * 1e6 + 0.5) AS BIGINT) t_e6,
                   CAST(FLOOR((aa+ab)*(aa+ab)
                        / (aa*aa/CAST(na-1 AS DOUBLE)
                           + ab*ab/CAST(nb-1 AS DOUBLE)) * 1e6 + 0.5)
                        AS BIGINT) df_e6
            FROM g
        """,
        "value_boxplot": """
            WITH q AS (
              SELECT count(*)::BIGINT n, min(value) vmin, max(value) vmax,
                     quantile_cont(value, [0.25, 0.5, 0.75]) qs
              FROM events
            ),
            f AS (
              SELECT n, vmin, vmax, qs[1] q1, qs[2] q2, qs[3] q3,
                     qs[1] - 1.5 * (qs[3] - qs[1]) lo_fence,
                     qs[3] + 1.5 * (qs[3] - qs[1]) hi_fence
              FROM q
            ),
            w AS (
              SELECT min(e.value) FILTER (WHERE e.value >= f.lo_fence) lo_w,
                     max(e.value) FILTER (WHERE e.value <= f.hi_fence) hi_w
              FROM events e CROSS JOIN f
            )
            SELECT f.n,
                   CAST(FLOOR(f.vmin * 1e6 + 0.5) AS BIGINT) min_e6,
                   CAST(FLOOR(f.vmax * 1e6 + 0.5) AS BIGINT) max_e6,
                   CAST(FLOOR(f.q1 * 1e6 + 0.5) AS BIGINT) q1_e6,
                   CAST(FLOOR(f.q2 * 1e6 + 0.5) AS BIGINT) q2_e6,
                   CAST(FLOOR(f.q3 * 1e6 + 0.5) AS BIGINT) q3_e6,
                   CAST(FLOOR(w.lo_w * 1e6 + 0.5) AS BIGINT) lo_whisker_e6,
                   CAST(FLOOR(w.hi_w * 1e6 + 0.5) AS BIGINT) hi_whisker_e6
            FROM f CROSS JOIN w
        """,
        "price_mad": """
            WITH med AS (
              SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS m
              FROM lineitem GROUP BY 1
            ),
            dev AS (
              SELECT l.l_returnflag, med.m,
                     abs(l.l_extendedprice - med.m) AS d
              FROM lineitem l JOIN med USING (l_returnflag)
            )
            SELECT l_returnflag,
                   CAST(FLOOR(any_value(m) * 1e6 + 0.5) AS BIGINT)
                     AS median_e6,
                   CAST(FLOOR(quantile_disc(d, 0.5) * 1e6 + 0.5) AS BIGINT)
                     AS mad_e6
            FROM dev GROUP BY 1 ORDER BY 1
        """,
        "term_df": f"""
            SELECT term, count(*)::BIGINT AS df FROM (
              SELECT doc_id, unnest(list_distinct({_sql_tok()})) AS term FROM documents
            ) GROUP BY term
        """,
        "collection_stats": f"""
            SELECT count(*)::BIGINT AS n_docs,
                   coalesce(sum(len({_sql_tok()})), 0)::BIGINT AS total_tokens,
                   coalesce(sum(len({_sql_tok()})), 0)::DOUBLE / count(*) AS avgdl
            FROM documents
        """,
        "doc_lengths": f"""
            SELECT doc_id, len({_sql_tok()})::BIGINT AS dl FROM documents
        """,
        "top_terms": f"""
            SELECT term, count(*)::BIGINT AS cf FROM (
              SELECT unnest({_sql_tok()}) AS term FROM documents
            ) GROUP BY term ORDER BY cf DESC, term ASC LIMIT 100
        """,
        "bm25_topk": _sql_bm25(DOC_QUERIES, conjunctive=False),
        "bm25_boosted": _sql_bm25(
            [t for t, _ in BOOSTED_QUERIES], conjunctive=False,
            boosts_list=[b for _, b in BOOSTED_QUERIES]),
        "bm25_collapse": _sql_bm25_collapse(),
        "bm25_phrase_slop": _sql_bm25_phrase_slop(),
        "bm25_rescore": _sql_bm25_rescore(),
        "bm25_rrf": _sql_bm25_rrf(),
        "chunked_docs": _sql_chunked_docs(),
        "bm25_recency": _sql_bm25_recency(),
        "bm25_diverse": _sql_bm25_diverse(),
        "bm25_corrected": _sql_bm25_corrected(),
        "doc_term_vectors": _sql_doc_term_vectors(),
        "ts_percentiles": _sql_ts_percentiles(),
        "sample_by_source": f"""
            WITH h AS (
              SELECT source, doc_id, n_chars,
                     {_sql_splitmix64("xor(CAST(doc_id AS UBIGINT), CAST(13 AS UBIGINT))")} AS hh
              FROM documents
            ),
            p AS (
              SELECT source, doc_id, n_chars,
                     pow((CAST(hh AS DOUBLE) + 1.0) / 18446744073709551616.0,
                         1.0 / n_chars) AS pr
              FROM h WHERE n_chars > 0
            ),
            r AS (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY pr DESC, doc_id) AS rk
              FROM p
            )
            SELECT source, rk AS rank, doc_id, n_chars
            FROM r WHERE rk <= 8
        """,
        "pq_codes": _sql_pq_codes(),
        "pq_ann": _sql_pq_ann(TOPK),
        "ivfpq_ann": _sql_ivfpq_ann(TOPK),
        "bm25_relaxed": _sql_bm25_relaxed(),
        "packed_sequences": f"""
            WITH RECURSIVE dl AS (
              SELECT doc_id,
                     len({_sql_tok()})::BIGINT AS dl,
                     doc_id // {_PACK_RANGE} AS rid,
                     row_number() OVER (PARTITION BY doc_id // {_PACK_RANGE}
                                        ORDER BY doc_id) AS rn
              FROM documents
            ),
            pack AS (
              SELECT rid, rn, doc_id, dl, 0::BIGINT AS bin, dl AS fill
              FROM dl WHERE rn = 1
              UNION ALL
              SELECT d.rid, d.rn, d.doc_id, d.dl,
                     CASE WHEN p.fill > 0 AND p.fill + d.dl > {_PACK_CAP}
                          THEN p.bin + 1 ELSE p.bin END,
                     CASE WHEN p.fill > 0 AND p.fill + d.dl > {_PACK_CAP}
                          THEN d.dl ELSE p.fill + d.dl END
              FROM pack p JOIN dl d ON d.rid = p.rid AND d.rn = p.rn + 1
            )
            SELECT doc_id, dl, (rid * {_PACK_RANGE} + bin)::BIGINT AS bin_id
            FROM pack ORDER BY doc_id
        """,
        "weighted_sample": f"""
            WITH h AS (
              SELECT o_orderkey, o_totalprice,
                     {_sql_splitmix64("xor(CAST(o_orderkey AS UBIGINT), CAST(7 AS UBIGINT))")} AS hh
              FROM orders
            ),
            p AS (
              SELECT o_orderkey, o_totalprice,
                     pow((CAST(hh AS DOUBLE) + 1.0) / 18446744073709551616.0,
                         1.0 / o_totalprice) AS pr
              FROM h WHERE o_totalprice > 0
            ),
            r AS (
              SELECT o_orderkey, o_totalprice,
                     row_number() OVER (ORDER BY pr DESC, o_orderkey) AS rk
              FROM p
            )
            SELECT rk AS rank, o_orderkey,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
            FROM r WHERE rk <= 50
        """,
        "bm25_top_per_role": _sql_bm25_top_per_role(),
        # tombstone pair: stale-stats masking vs compacted (rebuilt) stats
        "suggest_terms": _sql_suggest_terms(),
        "bm25_snippet_text": _sql_bm25_snippet_text(),
        "significant_terms": _sql_significant_terms(),
        # merge composes stats/postings from two half-corpus indexes; the
        # oracle scores the full table — plain _sql_bm25 IS the check
        "bm25_after_merge": _sql_bm25(DOC_QUERIES, conjunctive=False),
        "bm25_boolean_msm": _sql_bm25_boolean_msm(),
        "match_counts": _sql_match_counts(),
        "bm25_sorted_by_time": _sql_bm25_sorted_by_time(),
        "lm_topk": _sql_lm_topk(),
        "percolate_matches": _sql_percolate(),
        "regex_topk": _sql_regex_topk(),
        "ts_field_stats": _sql_ts_field_stats(),
        "synonym_topk": _sql_synonym_topk(),
        "bm25_after_delete": _sql_bm25(
            DOC_QUERIES, conjunctive=False,
            extra_where="(scored.doc_id % 7) <> 3"),
        "bm25_near": _sql_bm25_near(),
        "bm25_date_histogram": _sql_bm25_date_histogram(),
        "bm25_explain": _sql_bm25_explain(),
        "curation_pipeline": _sql_curation_pipeline(),
        "bm25_page2": _sql_bm25(DOC_QUERIES, conjunctive=False,
                                rank_range=(TOPK + 1, 2 * TOPK)),
        "decontaminate": _sql_decontaminate(),
        "bm25_boolean": _sql_bm25_boolean(),
        "bm25_after_compact": _sql_bm25(
            DOC_QUERIES, conjunctive=False,
            pre=("documents AS (SELECT * FROM main.documents "
                 "WHERE (doc_id % 7) <> 3), ")),
        "bm25_topk_and": _sql_bm25(DOC_AND_QUERIES, conjunctive=True),
        "bm25_topk_prefix": _sql_bm25_prefix(),
        "bm25_topk_not": _sql_bm25_not(),
        "bm25_topk_fuzzy": _sql_bm25_fuzzy(),
        "bm25_topk_infix": _sql_bm25_infix(),
        "more_like_this": _sql_mlt(),
        "bm25_snippets": _sql_bm25_snippets(),
        "consecutive_events": """
            SELECT event_id, user_id, event_type FROM (
              SELECT event_id, user_id, event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events
            ) WHERE prev IS NULL OR prev <> event_type
        """,
        "auto_stopwords": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
            ),
            dfv AS (
              SELECT term, count(DISTINCT doc_id)::BIGINT AS df
              FROM tok GROUP BY 1
            )
            SELECT term, df FROM dfv
            WHERE df * 100 >= 79 * (SELECT count(*) FROM documents)
        """,
        "doc_keywords": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
            ),
            tfq AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
            dfv AS (SELECT term, count(*)::BIGINT df FROM tfq GROUP BY 1),
            nn AS (SELECT count(*)::BIGINT n FROM documents),
            w AS (
              SELECT t.doc_id, t.term,
                     t.tf * CAST(FLOOR(ln((SELECT n FROM nn)::DOUBLE / d.df)
                                       * 1e6 + 0.5) AS BIGINT) AS w
              FROM tfq t JOIN dfv d USING (term)
            ),
            ranked AS (
              SELECT doc_id, term, w,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY w DESC, term) AS kw_rank
              FROM w WHERE w > 0
            )
            SELECT doc_id, kw_rank, term, w FROM ranked WHERE kw_rank <= 3
        """,
        "tfidf_cosine_pairs": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
            ),
            tfq AS (SELECT doc_id, term, count(*)::BIGINT tf FROM tok GROUP BY 1, 2),
            dfv AS (SELECT term, count(*)::BIGINT df FROM tfq GROUP BY 1),
            nn AS (SELECT count(*)::BIGINT n FROM documents),
            w AS (
              SELECT t.doc_id, t.term,
                     t.tf * CAST(FLOOR(ln((SELECT n FROM nn)::DOUBLE / d.df)
                                       * 1e6 + 0.5) AS BIGINT) AS w
              FROM tfq t JOIN dfv d USING (term)
            ),
            wk AS (SELECT doc_id, term, w FROM w WHERE w > 0),
            norms AS (
              SELECT doc_id, sqrt(CAST(sum(w::HUGEINT * w::HUGEINT) AS DOUBLE)) AS den
              FROM wk GROUP BY 1
            ),
            dots AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(sum(a.w::HUGEINT * b.w::HUGEINT) AS DOUBLE) AS dotf
              FROM wk a JOIN wk b ON a.term = b.term AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            cosv AS (
              SELECT d.doc_a, d.doc_b, d.dotf / (na.den * nb.den) AS cos
              FROM dots d
              JOIN norms na ON na.doc_id = d.doc_a
              JOIN norms nb ON nb.doc_id = d.doc_b
              WHERE na.den * nb.den > 0
            )
            SELECT doc_a, doc_b,
                   CAST(FLOOR(cos * 1e6 + 0.5) AS BIGINT) AS cosine_e6
            FROM cosv WHERE cos >= 0.9
        """,
        "heavy_hitters": """
            SELECT user_id, n_rows FROM (
              SELECT user_id, count(*)::BIGINT AS n_rows,
                     row_number() OVER (ORDER BY count(*) DESC, user_id) AS rk
              FROM events GROUP BY 1
            ) WHERE rk <= 20
        """,
        "price_zscore": """
            WITH q AS (
              SELECT l_orderkey, l_linenumber, l_returnflag,
                     CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS xq
              FROM lineitem
            ),
            s AS (
              SELECT l_returnflag,
                     count(*)::HUGEINT AS n,
                     sum(xq)::HUGEINT AS sx,
                     sum(xq::HUGEINT * xq::HUGEINT) AS sxx
              FROM q GROUP BY 1
            )
            SELECT q.l_orderkey, q.l_linenumber,
                   CAST(FLOOR(
                     CASE WHEN s.n * s.sxx - s.sx * s.sx > 0 THEN
                       CAST(s.n * q.xq::HUGEINT - s.sx AS DOUBLE)
                       / sqrt(CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE))
                     ELSE 0.0 END * 1e6 + 0.5) AS BIGINT) AS z_e6
            FROM q JOIN s USING (l_returnflag)
        """,
        "exact_dedup": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
        "quality": f"""
            SELECT doc_id,
                   len({_sql_tok()})::BIGINT AS n_tokens,
                   len(list_distinct({_sql_tok()}))::BIGINT AS n_unique,
                   len(list_filter({_sql_tok()}, t -> t IN ({stop_sql})))::BIGINT AS n_stopwords,
                   coalesce(list_sum(list_transform({_sql_tok()}, t -> length(t))), 0)::BIGINT AS n_alnum_chars,
                   length(text)::BIGINT AS n_chars
            FROM documents
        """,
        "bpeish_counts": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::BIGINT AS n_bpeish
            FROM documents
        """,
        "events_tumbling": """
            SELECT user_id,
                   make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
                   count(*)::BIGINT AS n_events,
                   sum(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT))::BIGINT AS sum_value_e6
            FROM events GROUP BY 1, 2
        """,
        "events_hopping": """
            SELECT user_id,
                   make_timestamp(ws) AS window_start,
                   count(*)::BIGINT AS n_events,
                   sum(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT))::BIGINT AS sum_value_e6
            FROM (
              SELECT user_id, value,
                     ((epoch_us(ts) // 900000000) - off) * 900000000 AS ws
              FROM events, unnest(generate_series(0, 3)) AS t(off)
            ) GROUP BY 1, 2
        """,
        "tool_propagation": _sql_tool_propagation(),
        "gopher_filter": r"""
            WITH m AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\S+'))::BIGINT AS n_words,
                     length(regexp_replace(text, '\s+', '', 'g'))::BIGINT AS word_chars,
                     len(regexp_extract_all(text, '\S*[a-zA-Z]\S*'))::BIGINT AS n_alpha,
                     (length(text) - length(replace(text, chr(10), '')) + 1)::BIGINT AS n_lines,
                     len(regexp_extract_all(text, '(?m)^[\-\*•]'))::BIGINT AS n_bullet,
                     len(regexp_extract_all(text, '(?m)\.\.\.$'))::BIGINT AS n_ell,
                     (length(text) - length(replace(text, '#', ''))
                      + len(regexp_extract_all(text, '\.\.\.')))::BIGINT AS n_symbols
              FROM documents
            ),
            f AS (
              SELECT doc_id, n_words,
                CASE WHEN n_words > 0 THEN CAST(FLOOR(1e6 * word_chars / n_words + 0.5) AS BIGINT) ELSE 0 END AS mean_word_len_e6,
                CASE WHEN n_words > 0 THEN CAST(FLOOR(1e6 * n_alpha / n_words + 0.5) AS BIGINT) ELSE 0 END AS alpha_frac_e6,
                CASE WHEN n_lines > 0 THEN CAST(FLOOR(1e6 * n_bullet / n_lines + 0.5) AS BIGINT) ELSE 0 END AS bullet_frac_e6,
                CASE WHEN n_lines > 0 THEN CAST(FLOOR(1e6 * n_ell / n_lines + 0.5) AS BIGINT) ELSE 0 END AS ellipsis_frac_e6,
                CASE WHEN n_words > 0 THEN CAST(FLOOR(1e6 * n_symbols / n_words + 0.5) AS BIGINT) ELSE 0 END AS symbol_ratio_e6
              FROM m
            )
            SELECT *,
              CASE WHEN n_words BETWEEN 50 AND 100000
                    AND mean_word_len_e6 BETWEEN 3000000 AND 10000000
                    AND alpha_frac_e6 >= 800000
                    AND bullet_frac_e6 <= 900000
                    AND ellipsis_frac_e6 <= 300000
                    AND symbol_ratio_e6 <= 100000
                   THEN 1 ELSE 0 END::BIGINT AS keep
            FROM f
        """,
        "pii_redact": r"""
            WITH aug AS (
              SELECT doc_id,
                CASE WHEN doc_id % 3 = 0
                     THEN text || ' contact user' || doc_id
                          || '@example.com or 555-123-4567 at 10.0.'
                          || (doc_id % 256) || '.77'
                     ELSE text END AS t
              FROM documents
            ),
            s1 AS (
              SELECT doc_id,
                len(regexp_extract_all(t, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
                regexp_replace(t, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
              FROM aug
            ),
            s2 AS (
              SELECT doc_id, n_email,
                len(regexp_extract_all(t, '\b\d{3}[\- ]\d{3}[\- ]\d{4}\b'))::BIGINT AS n_phone,
                regexp_replace(t, '\b\d{3}[\- ]\d{3}[\- ]\d{4}\b', '<PHONE>', 'g') AS t
              FROM s1
            )
            SELECT doc_id, n_email, n_phone,
              len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ipv4,
              regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
            FROM s2
        """,
        "bpe_pairs": f"""
            WITH tok AS (SELECT doc_id, {_sql_tok()} AS toks FROM documents),
            pairs AS (
              SELECT unnest(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1])) AS pair
              FROM tok
            )
            SELECT pair, count(*)::BIGINT AS n FROM pairs
            GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 100
        """,
        "window_analytics": """
            WITH e AS (
              SELECT event_id, user_id, ts,
                     CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS v
              FROM events
            )
            SELECT event_id, user_id,
                   row_number() OVER w AS rn,
                   coalesce(lag(v) OVER w, -1) AS prev_value_e6,
                   CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS running_value_e6,
                   rank() OVER (PARTITION BY user_id ORDER BY v DESC) AS value_rank,
                   dense_rank() OVER (PARTITION BY user_id ORDER BY v DESC)
                     AS value_dense_rank
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "events_asof": """
            SELECT p.user_id, p.event_id AS purchase_id,
                   epoch_us(p.ts) AS purchase_ts_us,
                   c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (
              -- pin (user_id, ts) ties to max event_id: DuckDB's ASOF
              -- returns an arbitrary tied row, the Ray side's payload-
              -- sorted merge_asof deterministically keeps the max
              SELECT * FROM events WHERE event_type = 'click'
              QUALIFY row_number() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
            ) c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "session_windows": """
            WITH o AS (
              SELECT user_id, epoch_us(ts) tsu,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
            ),
            s AS (
              SELECT user_id, tsu,
                     sum(new) OVER (PARTITION BY user_id ORDER BY tsu
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o
            )
            SELECT user_id,
                   make_timestamp(min(tsu)) AS session_start,
                   make_timestamp(max(tsu)) AS session_end,
                   count(*)::BIGINT AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "lineitem_semi_bloom": """
            SELECT l_returnflag, count(*)::BIGINT AS n
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
            GROUP BY 1
        """,
        "lineitem_orders_join": """
            SELECT l_returnflag, o_orderstatus, count(*)::BIGINT AS n,
                   sum(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT AS rev_r2
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1, 2
        """,
        "lineitem_anti_bloom": """
            SELECT l_returnflag, count(*)::BIGINT AS n
            FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
            GROUP BY 1
        """,
        "price_quantiles": """
            WITH r AS (
              SELECT quantile_disc(l_extendedprice, [0.25, 0.5, 0.75]) AS v
              FROM lineitem
            )
            SELECT unnest([25, 50, 75])::BIGINT AS q_pct,
                   CAST(FLOOR(unnest(v) * 1e6 + 0.5) AS BIGINT) AS value_e6
            FROM r
        """,
        "doc_chunks": f"""
            WITH toks AS (
              SELECT doc_id, {_sql_tok()} AS arr FROM documents
            )
            SELECT doc_id, i AS chunk_idx,
                   array_to_string(arr[i * 32 + 1 : least(len(arr), (i + 1) * 32)], ' ') AS chunk_text,
                   (least(len(arr), (i + 1) * 32) - i * 32)::BIGINT AS n_tokens
            FROM (SELECT doc_id, arr,
                         unnest(generate_series(0, (len(arr) - 1) // 32)) AS i
                  FROM toks WHERE len(arr) >= 1)
        """,
        "unigram_logprob": f"""
            -- per-(doc,term) contributions quantized to e9 ints BEFORE the
            -- per-doc sum (matching the Ray side): integer sums are
            -- order-free, so neither engine's aggregation order can move
            -- the published e6 value by an ulp
            WITH toks AS (
              SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
            cfq AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY 1),
            tot AS (SELECT sum(cf)::DOUBLE AS total FROM cfq),
            lpq AS (
              SELECT tf.doc_id, tf.tf,
                     CAST(FLOOR(tf.tf * ln(cfq.cf / (SELECT total FROM tot)) * 1e9 + 0.5) AS BIGINT) AS lp_e9
              FROM tf JOIN cfq USING (term)
            )
            SELECT doc_id, sum(tf)::BIGINT AS dl,
                   CAST(FLOOR(sum(lp_e9)::DOUBLE / (sum(tf) * 1e9) * 1e6 + 0.5) AS BIGINT) AS mean_lp_e6
            FROM lpq GROUP BY doc_id
        """,
        "value_quantiles_by_type": """
            SELECT event_type,
                   unnest([25, 50, 75])::BIGINT AS q_pct,
                   CAST(FLOOR(unnest(quantile_disc(value, [0.25, 0.5, 0.75])) * 1e6 + 0.5) AS BIGINT) AS value_e6
            FROM events GROUP BY event_type
        """,
        "tfidf_vectors": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
            dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            nn AS (SELECT count(*)::DOUBLE AS n FROM documents)
            SELECT tf.doc_id, tf.term, tf.tf,
                   CAST(FLOOR(tf.tf * ln(nn.n / dfq.df) * 1e6 + 0.5) AS BIGINT) AS tfidf_e6
            FROM tf JOIN dfq USING (term), nn
        """,
        "line_dedup": """
            WITH lines AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS l,
                     generate_subscripts(string_split(text, chr(10)), 1) AS line_idx
              FROM documents
            ),
            cnt AS (SELECT l, count(*) AS c FROM lines GROUP BY l)
            SELECT doc_id,
                   string_agg(lines.l, chr(10) ORDER BY line_idx) AS clean_text,
                   count(*)::BIGINT AS n_kept_lines
            FROM lines JOIN cnt USING (l)
            WHERE cnt.c < 2
            GROUP BY doc_id
        """,
        "repetition_stats": f"""
            WITH toks AS (
              SELECT doc_id, {_sql_tok()} AS arr FROM documents
            ),
            big AS (
              SELECT doc_id, arr[i] || ' ' || arr[i+1] AS bg
              FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 1)) AS i
                    FROM toks WHERE len(arr) >= 2)
            ),
            cnt AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2)
            SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
                   (sum(c) - count(*))::BIGINT AS n_dup_bigrams,
                   max(c)::BIGINT AS top_bigram_n
            FROM cnt GROUP BY doc_id
        """,
        "orders_topk_per_cust": """
            SELECT o_custkey, o_orderkey,
                   CAST(FLOOR(o_totalprice * 1e6 + 0.5) AS BIGINT) AS price_e6
            FROM orders
            QUALIFY row_number() OVER (
              PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey
            ) <= 3
        """,
        "stratified_sample": """
            SELECT lang, doc_id FROM documents
            QUALIFY row_number() OVER (
              PARTITION BY lang
              ORDER BY (doc_id * 2654435761) % 2147483647, doc_id
            ) <= 5
        """,
        "events_in_sessions": """
            WITH o AS (
              SELECT user_id, event_id, epoch_us(ts) tsu,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
            ),
            s AS (
              SELECT user_id, event_id, tsu,
                     sum(new) OVER (PARTITION BY user_id ORDER BY tsu
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o
            ),
            sess AS (
              SELECT user_id, sid, min(tsu) AS start_us, max(tsu) AS end_us,
                     count(*)::BIGINT AS n_events
              FROM s GROUP BY user_id, sid
            )
            SELECT e.user_id, e.event_id, e.tsu AS ts_us,
                   x.start_us AS session_start_us, x.end_us AS session_end_us,
                   x.n_events
            FROM s e JOIN sess x
              ON e.user_id = x.user_id
             AND e.tsu BETWEEN x.start_us AND x.end_us
        """,
        "ann_topk": sql_cosine_topk,
        # full-probe IVF is exact, so it answers to the same SQL
        "ann_ivf_full": sql_cosine_topk,
        # pruned-probe IVF: fit + assignment + pruning + ranking in SQL
        "ann_ivf": _sql_ann_ivf(_IVF_K, _IVF_ITERS, _IVF_NPROBE, TOPK),
        "orders_by_segment": """
            SELECT c.c_mktsegment,
                   count(*)::BIGINT AS n_orders,
                   CAST(FLOOR(sum(o.o_totalprice) + 0.5) AS BIGINT) AS total_r
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "orders_anti_join": """
            SELECT o_orderstatus, count(*)::BIGINT AS n
            FROM orders o
            WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
            GROUP BY 1
        """,
        "jaccard_allpairs": _sql_jaccard_pairs(0.05),
        "jaccard_dups": _sql_jaccard_pairs(0.5),
        "langid": _sql_langid(),
        "hll_users": _sql_hll_users(),
        "train_test_split": """
            SELECT doc_id,
                   CASE WHEN doc_id % 100 < 80 THEN 'train' ELSE 'test' END AS split
            FROM documents
        """,
        "split_counts": """
            SELECT CASE WHEN doc_id % 100 < 80 THEN 'train' ELSE 'test' END AS split,
                   count(*)::BIGINT AS n
            FROM documents GROUP BY 1
        """,
        "fingerprint": f"""
            WITH t AS (
              SELECT doc_id, array_to_string({_sql_tok()}, ' ') AS seq
              FROM documents
            )
            SELECT doc_id, min(doc_id) OVER (PARTITION BY seq) AS fp_group
            FROM t
        """,
        "translate_hook": rf"""
            SELECT doc_id, lang,
                   CASE WHEN lang IN ({tlangs}) THEN
                     array_to_string(
                       list_transform(
                         list_filter(regexp_split_to_array(text, '\s+'),
                                     w -> w <> ''),
                         w -> CASE {tmap} ELSE w END),
                       ' ')
                   ELSE text END AS text_translated
            FROM documents
        """,
        "conll_source": _SQL_CONLL.format(glob=conll_glob),
        # write_conll round-trips losslessly -> the re-read export answers
        # to the same read_text oracle as the source
        "conll_roundtrip": _SQL_CONLL.format(glob=conll_glob),
        "nb_predictions": _sql_nb_pred() + """
            SELECT doc_id, pred_lang, score_e9 FROM pred
        """,
        "eval_confusion": _sql_nb_pred() + """
            SELECT lang_true AS label, pred_lang AS pred, count(*)::BIGINT AS n
            FROM pred GROUP BY 1, 2
        """,
        "eval_metrics": _sql_nb_pred() + """
            , cmat AS (
              SELECT c.cls,
                     sum(CASE WHEN p.lang_true = c.cls AND p.pred_lang = c.cls THEN 1 ELSE 0 END)::BIGINT AS tp,
                     sum(CASE WHEN p.lang_true <> c.cls AND p.pred_lang = c.cls THEN 1 ELSE 0 END)::BIGINT AS fp,
                     sum(CASE WHEN p.lang_true = c.cls AND p.pred_lang <> c.cls THEN 1 ELSE 0 END)::BIGINT AS fn
              FROM classes c CROSS JOIN pred p GROUP BY 1
            ),
            pr AS (
              SELECT cls, tp, fp, fn,
                     CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp) ELSE 0.0 END AS p,
                     CASE WHEN tp + fn > 0 THEN tp::DOUBLE / (tp + fn) ELSE 0.0 END AS r
              FROM cmat
            )
            SELECT cls, tp, fp, fn,
                   CAST(FLOOR(p * 1e6 + 0.5) AS BIGINT) AS precision_e6,
                   CAST(FLOOR(r * 1e6 + 0.5) AS BIGINT) AS recall_e6,
                   CAST(FLOOR(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END * 1e6 + 0.5) AS BIGINT) AS f1_e6
            FROM pr
        """,
        "transcripts_bm25": _sql_transcripts_bm25(),
        "bm25_facets": _sql_bm25_facets(),
        "bm25_topk_role": _sql_transcripts_bm25_role("user"),
        "bm25_topk_time": _sql_transcripts_bm25_time(),
        "bm25_topk_weighted": _sql_transcripts_bm25_weighted(),
        "bm25_phrase": _sql_bm25_phrase(),
        "embedding_dups_lsh": _sql_embedding_lsh(),
        "simhash": _sql_simhash(),
        "minhash_pairs": _sql_minhash_pairs(),
        "embedding_dups": """
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   CAST(FLOOR(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                     CAST(b.embedding AS DOUBLE[])) * 1e6 + 0.5) AS BIGINT) AS cosine_e6
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4
        """,
        "price_quantiles_cont": """
            WITH r AS (
              SELECT quantile_cont(l_extendedprice,
                                   [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS v
              FROM lineitem
            )
            SELECT unnest([10, 25, 50, 75, 90, 99])::BIGINT AS q_pct,
                   CAST(FLOOR(unnest(v) * 1e6 + 0.5) AS BIGINT) AS value_e6
            FROM r
        """,
        "events_pivot": """
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view
            FROM events GROUP BY user_id
        """,
        "topic_scores": f"""
            WITH seed(term, topic) AS (VALUES {_sql_topic_seed_values()}),
            toks AS (
              SELECT doc_id, unnest({_sql_tok()}) AS term FROM documents
            ),
            dfq AS (
              SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM toks
              WHERE term IN (SELECT term FROM seed) GROUP BY term
            ),
            nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
            idf AS (
              SELECT s.term, s.topic,
                     CAST(FLOOR(ln(nn.n / dfq.df) * 1e6 + 0.5) AS BIGINT) AS idf_e6
              FROM seed s JOIN dfq USING (term), nn
            ),
            agg AS (
              SELECT t.doc_id,
                     coalesce(sum(CASE WHEN i.topic = 'data' THEN i.idf_e6 END), 0)::BIGINT AS score_data,
                     coalesce(sum(CASE WHEN i.topic = 'perf' THEN i.idf_e6 END), 0)::BIGINT AS score_perf,
                     coalesce(sum(CASE WHEN i.topic = 'query' THEN i.idf_e6 END), 0)::BIGINT AS score_query
              FROM toks t JOIN idf i USING (term) GROUP BY t.doc_id
            )
            SELECT d.doc_id,
                   coalesce(a.score_data, 0)::BIGINT AS score_data,
                   coalesce(a.score_perf, 0)::BIGINT AS score_perf,
                   coalesce(a.score_query, 0)::BIGINT AS score_query,
                   CASE
                     WHEN greatest(coalesce(a.score_data, 0), coalesce(a.score_perf, 0),
                                   coalesce(a.score_query, 0)) = 0 THEN ''
                     WHEN a.score_data >= a.score_perf AND a.score_data >= a.score_query THEN 'data'
                     WHEN a.score_perf >= a.score_query THEN 'perf'
                     ELSE 'query'
                   END AS top_topic
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "topic_predictions": _sql_topic_predictions(),
        "media_predictions": _sql_media_nb(),
        "wav_stats": _sql_wav_stats(),
        "gif_pixels": _sql_gif_pixels(),
        "media_features": _sql_media_features(),
        "jpeg_features": _sql_jpeg_features(),
        "image_meta": _sql_image_meta(),
        "cube_revenue": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   count(*)::BIGINT AS n_rows,
                   CAST(sum(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS sum_e2
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "event_paths_top": """
            WITH r AS (
              SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events
            ),
            p AS (
              SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
              FROM r WHERE rn <= 3 GROUP BY user_id
            )
            SELECT path, count(*)::BIGINT AS n_users FROM p
            GROUP BY path ORDER BY n_users DESC, path LIMIT 50
        """,
        "fuzzy_name_pairs": """
            WITH n AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   levenshtein(a.p_name, b.p_name)::BIGINT AS dist
            FROM n a JOIN n b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 3
        """,
        "tool_transitions": _sql_tool_transitions(),
        "users_per_type": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "top_event_per_user": """
            WITH c AS (
              SELECT user_id, event_type, count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            )
            SELECT user_id, event_type, n FROM c
            QUALIFY row_number() OVER (
              PARTITION BY user_id ORDER BY n DESC, event_type) = 1
            ORDER BY user_id
        """,
        "kmeans_clusters": _sql_kmeans(_KMEANS_K, _KMEANS_ITERS),
        "dup_components": """
            WITH RECURSIVE pairs AS (
              SELECT a.vec_id AS u, b.vec_id AS v
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) >= 0.4
            ),
            edges AS (
              SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs
            ),
            reach(node, lab) AS (
              SELECT vec_id, vec_id FROM embeddings
              UNION
              SELECT e.u, r.lab FROM edges e JOIN reach r ON r.node = e.v
            )
            SELECT node AS vec_id, min(lab) AS component
            FROM reach GROUP BY node
        """,
        "price_histogram": """
            SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS bin_idx,
                   CAST(FLOOR(FLOOR(l_extendedprice / 5000.0) * 5000.0 * 1e6
                              + 0.5) AS BIGINT) AS bin_lo_e6,
                   count(*)::BIGINT AS n_rows
            FROM lineitem GROUP BY 1, 2 ORDER BY 1
        """,
        "cohort_retention": """
            WITH f AS (
              SELECT user_id, date_trunc('week', min(ts)) AS cw
              FROM events GROUP BY user_id
            ),
            a AS (
              SELECT DISTINCT e.user_id, f.cw,
                     (date_trunc('week', e.ts)::DATE - f.cw::DATE) // 7
                       AS week_offset
              FROM events e JOIN f USING (user_id)
            )
            SELECT epoch_us(cw::TIMESTAMP) AS cohort_week_us,
                   week_offset::BIGINT AS week_offset,
                   count(*)::BIGINT AS n_users
            FROM a GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "funnel_counts": """
            WITH s0 AS (
              SELECT user_id,
                     first(ts ORDER BY ts, event_id) AS t0,
                     first(event_id ORDER BY ts, event_id) AS i0
              FROM events WHERE event_type = 'view' GROUP BY user_id
            ),
            s1 AS (
              SELECT e.user_id,
                     first(e.ts ORDER BY e.ts, e.event_id) AS t1,
                     first(e.event_id ORDER BY e.ts, e.event_id) AS i1
              FROM events e JOIN s0 USING (user_id)
              WHERE e.event_type = 'click'
                AND (e.ts > s0.t0 OR (e.ts = s0.t0 AND e.event_id > s0.i0))
              GROUP BY e.user_id
            ),
            s2 AS (
              SELECT e.user_id
              FROM events e JOIN s1 USING (user_id)
              WHERE e.event_type = 'purchase'
                AND (e.ts > s1.t1 OR (e.ts = s1.t1 AND e.event_id > s1.i1))
              GROUP BY e.user_id
            )
            SELECT 0::BIGINT AS step_idx, 'view' AS step,
                   (SELECT count(*) FROM s0)::BIGINT AS n_users
            UNION ALL
            SELECT 1, 'click', (SELECT count(*) FROM s1)
            UNION ALL
            SELECT 2, 'purchase', (SELECT count(*) FROM s2)
        """,
        "bigram_logprob": """
            WITH tok AS (SELECT doc_id, {tok} AS arr FROM documents),
            uni AS (
              SELECT doc_id, unnest(arr) AS term,
                     generate_subscripts(arr, 1) AS pos
              FROM tok
            ),
            big AS (
              SELECT a.doc_id, a.term AS w1, b.term AS w2
              FROM uni a JOIN uni b
                ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            ),
            c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
            c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
            v AS (SELECT count(DISTINCT term) AS v FROM uni),
            bt AS (
              SELECT doc_id, w1, w2, count(*) AS tf2
              FROM big GROUP BY doc_id, w1, w2
            ),
            sc AS (
              SELECT bt.doc_id,
                     sum(CAST(FLOOR(bt.tf2 * ln(
                           CAST(c12.c12 + 1 AS DOUBLE)
                           / CAST(c1.c1 + (SELECT v FROM v) AS DOUBLE))
                           * 1e9 + 0.5) AS BIGINT)) AS lp2_e9,
                     sum(bt.tf2)::BIGINT AS n_bigrams
              FROM bt JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
              GROUP BY bt.doc_id
            )
            SELECT doc_id, n_bigrams, CAST(lp2_e9 AS BIGINT) AS lp2_e9,
                   CAST(FLOOR(CAST(lp2_e9 AS DOUBLE) / (n_bigrams * 1e9)
                              * 1e6 + 0.5) AS BIGINT) AS mean_lp2_e6
            FROM sc
        """.replace("{tok}", _sql_tok()),
        "rollup_revenue": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   count(*)::BIGINT AS n_rows,
                   CAST(sum(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS sum_e2
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "ranking_analytics": """
            WITH e AS (
              SELECT event_id, user_id, ts,
                     CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS v
              FROM events
            )
            SELECT event_id, user_id,
                   ntile(4) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS tile,
                   CAST(FLOOR(percent_rank() OVER
                          (PARTITION BY user_id ORDER BY v DESC)
                          * 1e6 + 0.5) AS BIGINT) AS prank_e6,
                   CAST(FLOOR(cume_dist() OVER
                          (PARTITION BY user_id ORDER BY v DESC)
                          * 1e6 + 0.5) AS BIGINT) AS cume_e6
            FROM e
        """,
        "bm25_boosting": _sql_bm25_boosting(),
        "bm25_dismax": _sql_bm25_dismax(),
        "bm25_phrase_prefix": _sql_bm25_phrase_prefix(),
        "jl_projection": _sql_jl_projection(),
        "matrix_stats": _sql_matrix_stats(),
        "composite_pages": _sql_composite_pages(),
        "bm25_fragments": _sql_bm25_fragments(),
        "bm25_span_not": _sql_bm25_span_not(),
        "ts_percentile_ranks": _sql_ts_percentile_ranks(),
        "bpe_encoded": _sql_bpe_encode(_BPE_MERGES),
        "adjacency_cells": _sql_adjacency_cells(),
        "conversion_times": _SQL_CONVERSION_TIMES,
        "lm_ranking_eval": _sql_lm_ranking_eval(),
        "date_histogram_pipeline": _sql_date_histogram_pipeline(),
        "completions": _sql_completions(),
        "qty_skew_kurt": _SQL_QTY_SKEW_KURT,
        "props_field_stats": _SQL_PROPS_FIELD_STATS,
        "orders_profile": _sql_orders_profile(),
        "phrase_suggestions": _sql_phrase_suggest(),
        "negative_pairs": _sql_negative_pairs(),
        "trending_terms": _sql_trending_terms(),
        "rocchio_predictions": _SQL_ROCCHIO,
        "conv_profiles": _sql_conv_profiles(),
        "winsorized_price": _SQL_WINSORIZED_PRICE,
        "role_term_stats": _sql_role_term_stats(),
        "bucket_churn": _SQL_BUCKET_CHURN,
        "interleaved_eval": _sql_interleaved(),
        "substring_counts": _sql_substring_counts(),
        "sample_by_source_temp": f"""
            WITH h AS (
              SELECT source, doc_id, n_chars,
                     {_sql_splitmix64("xor(CAST(doc_id AS UBIGINT), CAST(13 AS UBIGINT))")} AS hh
              FROM documents
            ),
            p AS (
              SELECT source, doc_id, n_chars,
                     pow((CAST(hh AS DOUBLE) + 1.0) / 18446744073709551616.0,
                         1.0 / pow(n_chars, 0.5)) AS pr
              FROM h WHERE n_chars > 0
            ),
            r AS (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY pr DESC, doc_id) AS rk
              FROM p
            )
            SELECT source, rk AS rank, doc_id, n_chars
            FROM r WHERE rk <= 8
        """,
        "rare_terms": _sql_rare_terms(),
        "group_split": _sql_group_split(),
        "kn_bigram_logprob": """
            WITH tok AS (SELECT doc_id, {tok} AS arr FROM documents),
            uni AS (
              SELECT doc_id, unnest(arr) AS term,
                     generate_subscripts(arr, 1) AS pos
              FROM tok
            ),
            big AS (
              SELECT a.doc_id, a.term AS w1, b.term AS w2
              FROM uni a JOIN uni b
                ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            ),
            c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
            c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS nf
                   FROM c12 GROUP BY w1),
            w2s AS (SELECT w2, count(*) AS np FROM c12 GROUP BY w2),
            ntv AS (SELECT count(*) AS nt FROM c12),
            bt AS (
              SELECT doc_id, w1, w2, count(*) AS tf2
              FROM big GROUP BY doc_id, w1, w2
            ),
            sc AS (
              SELECT bt.doc_id,
                     sum(CAST(FLOOR(bt.tf2 * ln(
                           (greatest(CAST(c12.c12 AS DOUBLE) - 0.75, 0.0)
                            + ((0.75 * CAST(c1.nf AS DOUBLE))
                               * CAST(w2s.np AS DOUBLE))
                              / CAST((SELECT nt FROM ntv) AS DOUBLE))
                           / CAST(c1.c1 AS DOUBLE))
                           * 1e9 + 0.5) AS BIGINT)) AS kn_lp_e9,
                     sum(bt.tf2)::BIGINT AS n_bigrams
              FROM bt JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
                      JOIN w2s USING (w2)
              GROUP BY bt.doc_id
            )
            SELECT doc_id, n_bigrams, CAST(kn_lp_e9 AS BIGINT) AS kn_lp_e9,
                   CAST(FLOOR(CAST(kn_lp_e9 AS DOUBLE) / (n_bigrams * 1e9)
                              * 1e6 + 0.5) AS BIGINT) AS mean_kn_lp_e6
            FROM sc
        """.replace("{tok}", _sql_tok()),
        "term_pagerank": _sql_term_pagerank(n_iter=5, top_k=100),
        "cooc_triangles": _sql_cooc_triangles(),
        "bm25_stemmed": _sql_bm25_stemmed(),
        "bpe_merges": _sql_bpe_merges(_BPE_MERGES),
        "bm25_span_first": _sql_bm25_span_first(),
        "dup_spans": """
            WITH toks AS (SELECT doc_id, {tok} AS ts FROM documents),
            posi AS (
              SELECT doc_id, ts,
                     unnest(generate_series(1, len(ts) - 3)) AS i
              FROM toks
            ),
            pos AS MATERIALIZED (
              SELECT doc_id, i - 1 AS pos,
                     array_to_string(ts[i:i+3], ' ') AS kg
              FROM posi
            ),
            dupkg AS MATERIALIZED (
              SELECT kg FROM pos GROUP BY kg HAVING count(*) >= 2
            ),
            dup AS MATERIALIZED (
              SELECT p.doc_id, p.pos FROM pos p JOIN dupkg USING (kg)
            ),
            tot AS (
              SELECT doc_id, greatest(len(ts) - 3, 0) AS total FROM toks
            ),
            runs AS (
              SELECT doc_id,
                     pos - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS grp
              FROM dup
            ),
            rlen AS (
              SELECT doc_id, grp, count(*) AS rl
              FROM runs GROUP BY doc_id, grp
            )
            SELECT a.doc_id,
                   any_value(t.total)::BIGINT AS total_kgrams,
                   count(*)::BIGINT AS dup_kgrams,
                   (SELECT max(rl) FROM rlen r
                    WHERE r.doc_id = a.doc_id)::BIGINT AS max_dup_run
            FROM dup a JOIN tot t USING (doc_id)
            GROUP BY a.doc_id
            ORDER BY a.doc_id
        """.replace("{tok}", _sql_tok()),
        "pmi_top": """
            WITH toks AS (
              SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id, unnest({tok}) AS term FROM documents)
            ),
            dfv AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
            kept AS (
              SELECT term, df FROM dfv
              WHERE df >= 2
                AND df <= FLOOR(0.9 * (SELECT count(*) FROM documents))
            ),
            kt AS (
              SELECT t.doc_id, t.term, k.df
              FROM toks t JOIN kept k USING (term)
            ),
            p AS (
              SELECT a.term AS ta, b.term AS tb,
                     any_value(a.df) AS dfa, any_value(b.df) AS dfb,
                     count(*) AS pair_count
              FROM kt a JOIN kt b
                ON a.doc_id = b.doc_id AND a.term < b.term
              GROUP BY a.term, b.term
              HAVING count(*) >= 2
            )
            SELECT ta, tb, pair_count::BIGINT AS pair_count,
                   CAST(FLOOR(ln(
                     CAST(pair_count * (SELECT count(*) FROM documents)
                          AS DOUBLE) / CAST(dfa * dfb AS DOUBLE))
                     * 1e6 + 0.5) AS BIGINT) AS pmi_e6
            FROM p
            ORDER BY pmi_e6 DESC, ta, tb
            LIMIT 100
        """.replace("{tok}", _sql_tok()),
        "rolling_windows": """
            WITH e AS (
              SELECT event_id, user_id, ts,
                     CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS v
              FROM events
            )
            SELECT event_id, user_id,
                   count(*) OVER w AS roll_cnt,
                   CAST(sum(v) OVER w AS BIGINT) AS roll_sum_e6,
                   CAST(FLOOR(CAST(sum(v) OVER w AS DOUBLE)
                              / (count(*) OVER w) + 0.5) AS BIGINT)
                     AS roll_avg_e6,
                   min(v) OVER w AS roll_min_e6,
                   max(v) OVER w AS roll_max_e6
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "price_stats_by_flag": """
            WITH q AS (
              SELECT l_returnflag,
                     CAST(FLOOR(l_extendedprice * 100 + 0.5) AS HUGEINT) AS xq
              FROM lineitem
            ), s AS (
              SELECT l_returnflag, count(*)::HUGEINT AS n,
                     sum(xq) AS sx, sum(xq * xq) AS sxx
              FROM q GROUP BY l_returnflag
            )
            SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
                   CAST(FLOOR(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                              * 1e6 + 0.5) AS BIGINT) AS price_mean_e6,
                   CAST(FLOOR(CAST(n * sxx - sx * sx AS DOUBLE)
                              / CAST(n * n AS DOUBLE) / 10000.0
                              * 1e6 + 0.5) AS BIGINT) AS price_var_e6,
                   CAST(FLOOR(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                   / CAST(n * n AS DOUBLE) / 10000.0)
                              * 1e6 + 0.5) AS BIGINT) AS price_std_e6
            FROM s
        """,
        "qty_price_corr": """
            WITH q AS (
              SELECT l_returnflag,
                     CAST(FLOOR(l_quantity * 1 + 0.5) AS HUGEINT) AS xq,
                     CAST(FLOOR(l_extendedprice * 100 + 0.5) AS HUGEINT) AS yq
              FROM lineitem
            ), s AS (
              SELECT l_returnflag, count(*)::HUGEINT AS n,
                     sum(xq) AS sx, sum(yq) AS sy, sum(xq * xq) AS sxx,
                     sum(yq * yq) AS syy, sum(xq * yq) AS sxy
              FROM q GROUP BY l_returnflag
            )
            SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
                   CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
                        THEN 0
                        ELSE CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                             * 1e6 + 0.5) AS BIGINT)
                   END AS corr_e6
            FROM s
        """,
    }

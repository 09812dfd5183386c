"""Collection/term statistics as Ray Data pipelines.

These are the reference's per-term aggregation family re-expressed with the
combiner pattern (SURVEY.md G5-G7): the reference computes term histograms
with ``Counter(chain.from_iterable(docs))`` in one process
(reference: text-classification-module topic_modelling.py:30-33) and corpus
stats with driver-side pandas (features.py:137-168).  Here each batch emits
pre-aggregated partials (one row per term per batch), so the groupby-term
shuffle moves O(vocab x batches) partial rows, never O(total tokens) raw
tokens.  Hot terms (df ~ N) cost one partial row per batch like any other
term — the combiner IS the skew handling for these aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.tokenize import token_counts, tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte


def _explode_pairs(batch: pa.Table, text_col: str, id_col: str) -> tuple[pa.Array, np.ndarray]:
    import pyarrow.compute as pc

    toks = tokenize_column(batch[text_col])
    flat = pc.list_flatten(toks)
    parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    ids = np.asarray(batch[id_col], dtype=np.int64)[parents]
    return flat, ids


def term_df_partials(text_col: str = "text", id_col: str = "doc_id"):
    """map_batches fn: batch -> (term, df) partials (distinct docs per term
    within the batch; exact because a doc's tokens never split batches)."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, ids = _explode_pairs(batch, text_col, id_col)
        pairs = pa.table({"term": flat, "doc_id": pa.array(ids, pa.int64())})
        distinct = pairs.group_by(["term", "doc_id"], use_threads=False).aggregate([])
        g = distinct.group_by("term", use_threads=False).aggregate([("doc_id", "count")])
        return pa.table({"term": g["term"], "df": g["doc_id_count"]})

    return fn


def term_cf_partials(text_col: str = "text", id_col: str = "doc_id"):
    """map_batches fn: batch -> (term, cf) partials (total occurrences)."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, _ = _explode_pairs(batch, text_col, id_col)
        g = pa.table({"term": flat}).group_by("term", use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table({"term": g["term"], "cf": g["count_all"]})

    return fn


def term_df_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset(docs) -> Dataset(term, df)."""
    from ray.data.aggregate import Sum

    parts = ds.select_columns([id_col, text_col]).map_batches(
        term_df_partials(text_col, id_col), batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    )
    return parts.groupby("term").aggregate(Sum("df", alias_name="df"))


def term_cf_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    from ray.data.aggregate import Sum

    parts = ds.select_columns([id_col, text_col]).map_batches(
        term_cf_partials(text_col, id_col), batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    )
    return parts.groupby("term").aggregate(Sum("cf", alias_name="cf"))


def doc_lengths_dataset(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset(docs) -> Dataset(doc_id, dl) — pure per-batch projection."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch[id_col],
                "dl": pa.array(token_counts(batch[text_col]).astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte()
    )


_SALT_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio doc-id salt mix


def _tf_rows_salted(text_col: str, id_col: str, n_buckets: int,
                    n_salts: int):
    """map_batches fn: batch -> (doc_id, term, tf) data rows routed by the
    SALTED group key ``(hash(term) % B) * S + (mix(doc_id) % S)`` — the
    shared front end of tfidf/unigram-LP scoring.  The doc-id salt is the
    skew fix: a df==N hot term ("the") spreads its rows over S groups
    instead of landing all N in one (the same uniform-salt move the index
    build's doc-range sharding makes).  ``pd.util.hash_array`` is
    deterministic ACROSS processes — required: every worker must bucket
    the same term identically.  Rows carry side=0 and a null ``stat`` so
    they union with the replicated per-term stat rows (side=1)."""
    import pandas as pd

    B, S = np.uint64(n_buckets), np.uint64(n_salts)

    def fn(batch: pa.Table) -> pa.Table:
        flat, ids = _explode_pairs(batch, text_col, id_col)
        pairs = pa.table({"term": flat, id_col: pa.array(ids, pa.int64())})
        tf = pairs.group_by(["term", id_col], use_threads=False).aggregate(
            [([], "count_all")])
        th = pd.util.hash_array(
            np.asarray(tf["term"], dtype=object), categorize=False)
        dh = np.asarray(tf[id_col], dtype=np.int64).astype(np.uint64)
        gbkt = ((th % B) * S + (dh * _SALT_MIX) % S).astype(np.int64)
        n = len(tf)
        return pa.table({
            id_col: tf[id_col],
            "term": tf["term"],
            "tf": tf["count_all"].cast(pa.int64()),
            "stat": pa.nulls(n, pa.int64()),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "gbkt": pa.array(gbkt, pa.int64()),
        })

    return fn


def _replicate_stat_rows(stat_col: str, id_col: str, n_buckets: int,
                         n_salts: int):
    """map_batches fn over a small (term, stat) table: replicate each term's
    stat row to ALL S salt groups of its term bucket (side=1), so the big
    data rows can pick it up inside their own group — a salted broadcast
    join that attaches a per-term scalar without ever shuffling the big
    side by raw term (the hot-key-proof alternative to a term equi-join)."""
    import pandas as pd

    B, S = np.uint64(n_buckets), np.uint64(n_salts)
    s_int = int(n_salts)

    def fn(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch["term"], dtype=object)
        stat = np.asarray(batch[stat_col], dtype=np.int64)
        th = pd.util.hash_array(terms, categorize=False)
        base = (th % B) * S
        n = len(terms)
        gbkt = (np.repeat(base, s_int)
                + np.tile(np.arange(s_int, dtype=np.uint64), n)).astype(np.int64)
        return pa.table({
            id_col: pa.nulls(n * s_int, pa.int64()),
            "term": pa.array(np.repeat(terms, s_int), pa.string()),
            "tf": pa.nulls(n * s_int, pa.int64()),
            "stat": pa.array(np.repeat(stat, s_int), pa.int64()),
            "side": pa.array(np.ones(n * s_int, np.int8), pa.int8()),
            "gbkt": pa.array(gbkt, pa.int64()),
        })

    return fn


def _salted_term_stat_groups(ds, stat_ds, stat_col: str, text_col: str,
                             id_col: str, n_buckets: int, n_salts: int):
    """(corpus, small per-term stat table) -> grouped Dataset where each
    (term-bucket, doc-salt) group holds bounded data rows plus every
    relevant term's stat: group by the salted key after unioning sides."""
    data = ds.select_columns([id_col, text_col]).map_batches(
        _tf_rows_salted(text_col, id_col, n_buckets, n_salts),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
    stat = stat_ds.map_batches(
        _replicate_stat_rows(stat_col, id_col, n_buckets, n_salts),
        batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
    return data.union(stat).groupby("gbkt")


def tfidf_vectors(ds, n_docs: int, text_col: str = "text",
                  id_col: str = "doc_id", n_buckets: int = 256,
                  n_salts: int = 16):
    """Sparse TF-IDF document vectors: (doc_id, term, tfidf) with
    ``tfidf = tf * ln(N / df)`` — the feature-export face of the term
    statistics family (SURVEY.md S6/G7: the reference exports per-token
    feature matrices, horus_to_conll.py-style).

    Skew-proof two-phase shape: the per-term df side-table comes from the
    skew-free combiner pipeline (one partial row per term per batch ->
    tiny groupby), and scoring attaches df to the (doc, term, tf) rows via
    a SALTED replicate join — data rows group by
    ``(hash(term) % B) * S + (mix(doc_id) % S)`` and each term's df row is
    replicated to its bucket's S salt groups.  A df==N hot term therefore
    occupies at most ~N/S rows per group instead of N (the round-2 design
    routed every row of a term to ONE group).  ``n_docs`` is the corpus
    row count (one cheap metadata/count pass at the caller).

    Exactness note: df partials count distinct docs per batch, exact under
    the repo's readers where a doc's tokens never split batches (the same
    invariant term_df_dataset documents); the tf combine itself is
    batching-agnostic (all partials of a (doc, term) share a group).
    """
    import pandas as pd

    n = float(n_docs)
    empty = {id_col: np.int64, "term": object, "tf": np.int64,
             "tfidf": np.float64}

    def score(g: pd.DataFrame) -> pd.DataFrame:
        data = g[g["side"] == 0]
        if len(data) == 0:  # stat-only group (term's docs salted elsewhere)
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in empty.items()})
        data = (data.groupby(["term", id_col], sort=False)
                .agg(tf=("tf", "sum")).reset_index())
        stat = g.loc[g["side"] == 1, ["term", "stat"]]
        m = data.merge(stat, on="term", how="left")
        df_vals = m["stat"].to_numpy(np.float64)
        m["tfidf"] = m["tf"].to_numpy(np.float64) * np.log(n / df_vals)
        m["tf"] = m["tf"].astype(np.int64)
        return m[[id_col, "term", "tf", "tfidf"]]

    df_table = term_df_dataset(ds, text_col, id_col)
    return _salted_term_stat_groups(
        ds, df_table, "df", text_col, id_col, n_buckets, n_salts
    ).map_groups(lambda g: score(g.drop(columns=["gbkt"])),
                 batch_format="pandas", runtime_env=_rte())


def unigram_logprob_vectors(ds, total_tokens: float | None = None,
                            text_col: str = "text", id_col: str = "doc_id",
                            n_buckets: int = 256, n_salts: int = 16):
    """CCNet-style language-model quality score: per-document mean unigram
    log-probability under the corpus's own MLE unigram model,
    ``mean_lp ~= (1/dl) * sum_t tf_t * ln(cf_t / total_tokens)`` — fluent/
    typical documents score high, gibberish and out-of-distribution noise
    score low (the classic perplexity filter with the model = the corpus).

    Skew-proof like ``tfidf_vectors``: the per-term cf table comes from
    the skew-free combiner pipeline, and scoring attaches cf via the same
    SALTED replicate join, so a cf~=total hot term never lands all its
    rows in one group.  Per-doc reduction is a second small shuffle over
    (doc, partial-sum) rows pre-combined per group.

    Accumulation is ORDER-FREE: each (doc, term) contribution is quantized
    to an int64 ``lp_e9 = floor(tf * ln(cf/total) * 1e9 + 0.5)`` before
    summation, so the published score is independent of shuffle/batch
    arrival order (float partial sums are not — an order-dependent last
    bit could flip an e6 publication).  Output: (doc_id, dl, lp_e9,
    mean_lp) with ``mean_lp = lp_e9 / (dl * 1e9)`` (within 1e-9/token of
    the unquantized mean).  Pass ``total_tokens`` from collection stats if
    the caller has it; left None, one extra column-pruned count pass
    computes it here.
    """
    import pandas as pd

    if total_tokens is None:
        def _count(batch: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array(
                [int(token_counts(batch[text_col]).sum())], pa.int64())})

        total_tokens = float(
            ds.select_columns([text_col])
            .map_batches(_count, batch_format="pyarrow", zero_copy_batch=True,
                         runtime_env=_rte())
            .to_pandas()["n"].sum())
    total = float(total_tokens) if total_tokens > 0 else 1.0

    def term_scores(g: pd.DataFrame) -> pd.DataFrame:
        data = g[g["side"] == 0]
        if len(data) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "lp_e9": pd.Series([], dtype=np.int64),
                                 "dl": pd.Series([], dtype=np.int64)})
        data = (data.groupby(["term", id_col], sort=False)
                .agg(tf=("tf", "sum")).reset_index())
        m = data.merge(g.loc[g["side"] == 1, ["term", "stat"]],
                       on="term", how="left")
        tf = m["tf"].to_numpy(np.float64)
        cf = m["stat"].to_numpy(np.float64)
        lp_e9 = np.floor(tf * np.log(cf / total) * 1e9 + 0.5).astype(np.int64)
        out = pd.DataFrame({id_col: m[id_col].to_numpy(np.int64),
                            "lp_e9": lp_e9,
                            "tf": m["tf"].to_numpy(np.int64)})
        # pre-combine per doc within the group: the second shuffle moves
        # one row per (group, doc), not one per (doc, term); int sums are
        # associative -> order-free
        return (out.groupby(id_col, sort=False)
                .agg(lp_e9=("lp_e9", "sum"), dl=("tf", "sum"))
                .reset_index())

    cf_table = term_cf_dataset(ds, text_col, id_col)
    per_group = _salted_term_stat_groups(
        ds, cf_table, "cf", text_col, id_col, n_buckets, n_salts
    ).map_groups(lambda g: term_scores(g.drop(columns=["gbkt"])),
                 batch_format="pandas", runtime_env=_rte())

    def bucket_doc(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        ids = batch[id_col].to_numpy(np.int64).astype(np.uint64)
        batch["dbkt"] = ((ids * _SALT_MIX)
                         % np.uint64(n_buckets)).astype(np.int64)
        return batch

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.groupby(id_col, sort=True)
             .agg(lp_e9=("lp_e9", "sum"), dl=("dl", "sum")).reset_index())
        dl = a["dl"].to_numpy(np.int64)
        lp = a["lp_e9"].to_numpy(np.int64)
        return pd.DataFrame({
            id_col: a[id_col].to_numpy(np.int64),
            "dl": dl,
            "lp_e9": lp,
            "mean_lp": lp.astype(np.float64) / (dl.astype(np.float64) * 1e9),
        })

    return (
        per_group.map_batches(bucket_doc, batch_format="pandas",
                              runtime_env=_rte())
        .groupby("dbkt")
        .map_groups(lambda g: finish(g.drop(columns=["dbkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )


def rare_terms(ds, max_df: int, k: int = 100, text_col: str = "text",
               id_col: str = "doc_id") -> "pd.DataFrame":
    """ES ``rare_terms`` aggregation: terms whose document frequency is
    <= ``max_df``, ranked (df asc, term asc), first ``k``.  The df table
    comes from the standard skew-free combiner (term_df_dataset); the
    page extracts WITHOUT a full sort — each df-table block reduces to
    its local filtered bottom-k, so only O(blocks * k) rows reach the
    driver (the long-tail mirror of the top_terms head)."""
    import pandas as pd

    if k < 1 or max_df < 1:
        raise ValueError("k and max_df must be >= 1")
    df = term_df_dataset(ds, text_col=text_col, id_col=id_col)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["df"] <= max_df]
        return b.sort_values(["df", "term"], kind="stable").head(k)

    parts = (df.map_batches(partial, batch_format="pandas",
                            runtime_env=_rte()).to_pandas())
    if len(parts) == 0:  # nothing under max_df: typed empty frame
        import numpy as np

        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "df": pd.Series([], dtype=np.int64)})
    return (parts.sort_values(["df", "term"], kind="stable").head(k)
            .reset_index(drop=True))


def trending_terms(ds, interval_us: int, min_count: int = 5,
                   top_k: int = 5, text_col: str = "text",
                   ts_col: str = "ts"):
    """Trending-topics report: per time bucket, the ``top_k`` terms with
    the largest occurrence-count INCREASE over the immediately preceding
    bucket (strict adjacency — a gap resets the baseline to 0), among
    terms with >= ``min_count`` occurrences in the bucket.  Rows
    (bucket, rank, term, n, prev_n, delta), all exact integers.

    Shape: one combiner scan -> (bucket, term, n) via groupby (a hot
    term contributes one partial row per batch); deltas join per TERM
    (a term has at most #buckets rows — never a hot group); the final
    per-bucket top-k reduces groupwise.  Bucket = floor-div of epoch
    microseconds (np.floor_divide semantics, shared with the
    date-histogram oracle)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if interval_us <= 0 or top_k < 1 or min_count < 1:
        raise ValueError("interval_us/top_k/min_count must be positive")

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokenize_column(batch[text_col])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        ts = batch[ts_col]
        tsv = np.asarray(pc.cast(ts, pa.int64()), dtype=np.int64)
        bkt = np.floor_divide(tsv, np.int64(interval_us))[parents]
        g = (pd.DataFrame({"bucket": bkt, "term": flat})
             .groupby(["bucket", "term"], sort=False)
             .size().reset_index(name="n"))
        return pa.table({
            "bucket": pa.array(g["bucket"].to_numpy(np.int64), pa.int64()),
            "term": pa.array(g["term"].to_numpy(object), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        })

    fine = (ds.select_columns([ts_col, text_col])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte())
            .groupby(["bucket", "term"])
            .aggregate(Sum("n", alias_name="n")))

    # coarse-bucket the TERM axis so the delta kernel runs vectorized
    # over thousands of terms per group (per-term map_groups would be a
    # Python call per tiny group — the documented anti-pattern)
    import pandas as pd

    def add_tkey(batch: pa.Table) -> pa.Table:
        t = np.asarray(batch["term"], dtype=object)
        h = pd.util.hash_array(t, categorize=False)
        return batch.append_column(
            "tb", pa.array((h % np.uint64(256)).astype(np.int64)))

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        t = g["term"].to_numpy(dtype=str)
        b = g["bucket"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        order = np.lexsort((b, t))
        t, b, n = t[order], b[order], n[order]
        prev = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            adj = (t[1:] == t[:-1]) & (b[1:] == b[:-1] + 1)
            prev[1:][adj] = n[:-1][adj]
        keep = n >= min_count
        return pd.DataFrame({
            "bucket": b[keep], "term": t[keep], "n": n[keep],
            "prev_n": prev[keep], "delta": (n - prev)[keep],
        })

    cand = (fine.map_batches(add_tkey, batch_format="pyarrow",
                             runtime_env=_rte())
            .groupby("tb")
            .map_groups(lambda g: deltas(g.drop(columns=["tb"])),
                        batch_format="pandas", runtime_env=_rte()))

    # per-BUCKET top-k, again over coarse groups with a vectorized
    # rank-take inside (buckets hash-grouped, many per group)
    def add_bkey(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch["bucket"], dtype=np.int64).astype(np.uint64)
        return batch.append_column(
            "bb", pa.array(((b * np.uint64(0x9E3779B97F4A7C15))
                            % np.uint64(64)).astype(np.int64)))

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("bucket", "rank", "term", "n",
                                           "prev_n", "delta")})
        b = g["bucket"].to_numpy(np.int64)
        order = np.lexsort((g["term"].to_numpy(dtype=str),
                            -g["delta"].to_numpy(np.int64), b))
        bb = b[order]
        starts = np.flatnonzero(np.r_[True, bb[1:] != bb[:-1]])
        sizes = np.diff(np.r_[starts, len(bb)])
        rank = np.arange(len(bb)) - np.repeat(starts, sizes)
        keep = order[rank < top_k]
        out = g.iloc[keep].reset_index(drop=True)
        out["rank"] = (rank[rank < top_k] + 1).astype(np.int64)
        return out[["bucket", "rank", "term", "n", "prev_n", "delta"]]

    return (cand.map_batches(add_bkey, batch_format="pyarrow",
                             runtime_env=_rte())
            .groupby("bb")
            .map_groups(lambda g: bucket_topk(g.drop(columns=["bb"])),
                        batch_format="pandas", runtime_env=_rte()))


def vocab_growth(ds, every: int = 100, text_col: str = "text",
                 id_col: str = "doc_id") -> pd.DataFrame:
    """Vocabulary growth curve (the Heaps'-law diagnostic a corpus audit
    wants): DISTINCT terms seen among docs with id < c, at checkpoints
    c = every, 2*every, ...

    One pass of per-batch (term, min doc) combiner partials -> a
    term-keyed groupby Min (the only shuffle, vocab-sized like term_df)
    -> per-term checkpoint bucket counts -> a tiny driver cumsum over
    n_checkpoints rows.  Exact integers end to end; assumes dense
    ascending ids (the documents table contract)."""
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        flat, ids = _explode_pairs(batch, text_col, id_col)
        t = pa.table({"term": flat, "first_doc": pa.array(ids, pa.int64())})
        g = t.group_by("term", use_threads=False).aggregate(
            [("first_doc", "min")])
        return pa.table({"term": g["term"], "first_doc": g["first_doc_min"]})

    firsts = (ds.select_columns([id_col, text_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None,
                           runtime_env=_rte())
              .groupby("term")
              .aggregate(Min("first_doc", alias_name="first_doc")))

    def bucket_counts(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch["first_doc"], dtype=np.int64) // int(every)
        u, c = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "n_new": pa.array(c.astype(np.int64), pa.int64())})

    bc = firsts.map_batches(bucket_counts, batch_format="pyarrow",
                            zero_copy_batch=True,
                            runtime_env=_rte()).to_pandas()  # n_checkpoints rows
    if len(bc) == 0:
        return pd.DataFrame({"checkpoint": pd.Series([], dtype=np.int64),
                             "vocab": pd.Series([], dtype=np.int64)})
    agg = bc.groupby("bucket")["n_new"].sum().sort_index()
    mx = int(agg.index.max())
    dense = np.zeros(mx + 1, dtype=np.int64)
    dense[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)
    return pd.DataFrame({
        "checkpoint": (np.arange(mx + 1, dtype=np.int64) + 1) * int(every),
        "vocab": np.cumsum(dense),
    })

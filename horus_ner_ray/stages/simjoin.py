"""Sparse TF-IDF cosine document-similarity join.

The classic "which documents look alike" operator over the inverted
layout itself — complementary to the dense-embedding near-dup family
(`stages/dedupe.embedding_dup_pairs`) and the shingle families: pairs are
generated TERM-WISE (a pair can only score > 0 if it shares a term), so
no all-pairs pass exists anywhere.

Exactness/oracle story (the integer-moments trick of ``stats.py``): term
weights are exact ints w = tf * idf_e6 (idf_e6 = floor(ln(N/df)*1e6+0.5),
the shared quantizer), so per-pair dot products and per-doc squared norms
are EXACT integer sums (order-free — safe to accumulate in any shuffle
order), and the float tail is three defined conversions mirrored verbatim
by the DuckDB oracle: cos = double(dot) / (sqrt(double(qa)) *
sqrt(double(qb))).  Bit-identical doubles -> the threshold cut and the e6
publication hash-match.

Scale plan: one combiner pass to (term, doc, tf); coarse term-bucket
shuffle; per-term vectorized emission of pair partials (``np.triu``) and
norm partials, pre-combined per bucket; a Parquet checkpoint; then TWO
co-group shuffles — pass 1 routes both kinds by the pair's first
endpoint (combine to exact dots/norms, attach den_a by searchsorted in
place), pass 2 re-routes by the second endpoint (norm rows ride along),
attaches den_b and applies the threshold.  No pd.merge, no O(docs)
broadcast, no mid-pipeline materialize.  Hot terms are bounded by
construction: only terms with df <= ``max_df`` participate (the standard
df cap for similarity joins — a df~N term contributes ~0 weight anyway
and would otherwise emit df^2/2 pairs), and the cap is part of the
OPERATOR DEFINITION, applied identically by the SQL oracle.

Bounds (asserted): w <= 2^29 per (doc, term) keeps every product and any
realistic per-pair sum inside int64; the df cap bounds one term's pair
fan-out at max_df^2/2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte

_MIXC = np.uint64(0x9E3779B97F4A7C15)


def _tf_rows(text_col: str, id_col: str):
    """map_batches fn: batch of docs -> (term, doc_id, tf) rows."""
    import pyarrow.compute as pc

    from horus_ner_ray.stages.tokenize import tokenize_column

    def fn(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        if not len(flat):
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        df = pd.DataFrame({"term": flat, "doc_id": ids[parents]})
        g = df.groupby(["term", "doc_id"], sort=False).size().reset_index(name="tf")
        return pa.table({
            "term": pa.array(g["term"], pa.string()),
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "tf": pa.array(g["tf"].to_numpy(np.int64), pa.int64()),
        })

    return fn


def tfidf_cosine_pairs(ds, n_docs: int, threshold: float = 0.9,
                       max_df: int | None = None, text_col: str = "text",
                       id_col: str = "doc_id", n_buckets: int = 64,
                       checkpoint_dir: str | None = None):
    """Dataset(docs) -> Dataset(doc_a, doc_b, cosine_e6) of pairs with
    TF-IDF cosine >= ``threshold`` over the df-capped vocabulary.

    ``n_docs`` is the total input row count (parquet footer metadata at
    the call site — the idf denominator).  ``max_df`` defaults to
    ``n_docs`` (no cap beyond the w>0 requirement).

    The partial table (norm + pair partials) feeds two consumers (per-doc
    norms, per-pair dots), so it checkpoints to Parquet once instead of
    re-executing the tokenize/emit upstream per consumer or pinning a
    pair-scale table in the object store (the ``ngram`` c12 pattern).
    ``checkpoint_dir`` defaults to a fresh tempdir the CALLER owns —
    remove it after the returned dataset is consumed."""
    import tempfile

    import ray.data

    cap = int(max_df) if max_df is not None else int(n_docs)
    nbk = np.uint64(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = np.asarray(batch["term"], dtype=object)
        h = pd.util.hash_array(t, categorize=False)
        return batch.append_column(
            "bucket", pa.array((h % nbk).astype(np.int64), pa.int64()))

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        # one coarse bucket = many whole terms (all rows of a term share
        # its hash); per-term vectorized weight/pair/norm emission
        g = g.sort_values(["term", "doc_id"], kind="stable")
        terms = g["term"].to_numpy(dtype=object)
        docs = g["doc_id"].to_numpy(np.int64)
        tf = g["tf"].to_numpy(np.int64)
        n = len(g)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = terms[1:] != terms[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        dfs = np.repeat(lens, lens)  # per-row df of its term
        idf_e6 = np.floor(np.log(float(n_docs) / dfs) * 1e6 + 0.5).astype(np.int64)
        w = tf * idf_e6
        keep = (dfs <= cap) & (w > 0)
        if w[keep].size and int(w[keep].max()) >= (1 << 29):
            raise OverflowError(
                "tfidf weight >= 2^29: pair products would risk int64 "
                "overflow; lower the idf quantizer or cap tf")
        out_k: list[np.ndarray] = []
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_v: list[np.ndarray] = []
        # norm partials
        out_k.append(np.zeros(int(keep.sum()), dtype=np.int64))
        out_a.append(docs[keep])
        out_b.append(np.zeros(int(keep.sum()), dtype=np.int64))
        out_v.append(w[keep] * w[keep])
        # pair partials per term block
        for s, l in zip(starts, lens):
            sl = slice(s, s + l)
            m = keep[sl]
            if int(m.sum()) < 2:
                continue
            d = docs[sl][m]
            ww = w[sl][m]
            ia, ib = np.triu_indices(len(d), k=1)
            out_k.append(np.ones(len(ia), dtype=np.int64))
            out_a.append(d[ia])
            out_b.append(d[ib])
            out_v.append(ww[ia] * ww[ib])
        out = pd.DataFrame({
            "kind": np.concatenate(out_k),
            "a": np.concatenate(out_a),
            "b": np.concatenate(out_b),
            "v": np.concatenate(out_v),
        })
        # pre-aggregate within the bucket: the same pair recurs once per
        # shared term in this bucket, the same doc once per term — combine
        # before the pair-keyed exchange
        return (out.groupby(["kind", "a", "b"], sort=False)["v"].sum()
                .reset_index())

    parts = (
        ds.select_columns([id_col, text_col])
        .map_batches(_tf_rows(text_col, id_col), batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bucket")
        .map_groups(emit, batch_format="pandas", runtime_env=_rte())
    )
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="horus_simjoin_")
    parts.write_parquet(ckpt)

    # Downstream is ONE lazy pipeline over the checkpoint, two co-group
    # shuffles total.  Pass 1 routes BOTH kinds by the pair's first
    # endpoint (norm partials are keyed by their doc, same bucket
    # function), so each bucket holds every partial of its pairs AND the
    # complete norm partials of every first endpoint: combine to exact
    # int dots / norms, convert at the defined float points, and attach
    # den_a by searchsorted in place.  Pass 2 re-routes by the second
    # endpoint (norm rows ride along), attaches den_b, and applies the
    # threshold.  No pd.merge, no O(docs) broadcast, no mid-pipeline
    # materialize.
    thr = float(threshold)

    def bucket_first(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"], dtype=np.int64).astype(np.uint64)
        return batch.append_column("bkt", pa.array(
            ((a * _MIXC) % nbk).astype(np.int64), pa.int64()))

    def _norm_lookup(nr_keys: np.ndarray, nr_den: np.ndarray,
                     keys: np.ndarray) -> np.ndarray:
        order = np.argsort(nr_keys)
        nk, nv = nr_keys[order], nr_den[order]
        pos = np.minimum(np.searchsorted(nk, keys), max(len(nk) - 1, 0))
        return nv[pos] if len(nk) else np.zeros(len(keys))

    def pass1(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("kind", "key", "b", "dotf", "den")
        empty = pd.DataFrame({c: pd.Series([], dtype=(
            np.int64 if c in ("kind", "key", "b") else np.float64))
            for c in cols})
        nr = g[g["kind"] == 0]
        pr = g[g["kind"] == 1]
        outs = []
        nkeys = np.zeros(0, np.int64)
        nden = np.zeros(0, np.float64)
        if len(nr):
            q = nr.groupby("a", sort=False)["v"].sum()
            nkeys = q.index.to_numpy(np.int64)
            nden = np.sqrt(q.to_numpy(np.int64).astype(np.float64))
            outs.append(pd.DataFrame({
                "kind": np.int64(0), "key": nkeys, "b": np.int64(0),
                "dotf": np.float64(0.0), "den": nden}))
        if len(pr):
            d = pr.groupby(["a", "b"], sort=False)["v"].sum().reset_index()
            a = d["a"].to_numpy(np.int64)
            den_a = _norm_lookup(nkeys, nden, a)
            # key = b for the pass-2 shuffle; 'b' column carries doc_a
            outs.append(pd.DataFrame({
                "kind": np.int64(1), "key": d["b"].to_numpy(np.int64),
                "b": a, "dotf": d["v"].to_numpy(np.int64).astype(np.float64),
                "den": den_a}))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)[list(cols)]

    def bucket_key(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["key"], dtype=np.int64).astype(np.uint64)
        return batch.append_column("bkt", pa.array(
            ((k * _MIXC) % nbk).astype(np.int64), pa.int64()))

    def pass2(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["kind"] == 1]
        if len(pr) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("doc_a", "doc_b", "cosine_e6")})
        nr = g[g["kind"] == 0]
        den_b = _norm_lookup(nr["key"].to_numpy(np.int64),
                             nr["den"].to_numpy(np.float64),
                             pr["key"].to_numpy(np.int64))
        dotf = pr["dotf"].to_numpy(np.float64)
        den = pr["den"].to_numpy(np.float64) * den_b
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(den > 0, dotf / np.where(den > 0, den, 1.0), 0.0)
        keep = cos >= thr
        return pd.DataFrame({
            "doc_a": pr["b"].to_numpy(np.int64)[keep],
            "doc_b": pr["key"].to_numpy(np.int64)[keep],
            "cosine_e6": np.floor(cos[keep] * 1e6 + 0.5).astype(np.int64),
        })

    return (
        ray.data.read_parquet(ckpt)
        .map_batches(bucket_first, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby("bkt")
        .map_groups(pass1, batch_format="pandas", runtime_env=_rte())
        .map_batches(bucket_key, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby("bkt")
        .map_groups(pass2, batch_format="pandas", runtime_env=_rte())
    )


def tfidf_weight_rows(ds, n_docs: int, max_df: int | None = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      n_buckets: int = 64):
    """Dataset(docs) -> Dataset(doc_id, term, w) of exact-int TF-IDF
    weights (w = tf * idf_e6 > 0, df <= max_df) — the shared head of the
    similarity join, exposed for keyword extraction: tf-rows combiner ->
    term-bucket shuffle (df is exact within its bucket) -> vectorized
    weight emission."""
    cap = int(max_df) if max_df is not None else int(n_docs)
    nbk = np.uint64(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = np.asarray(batch["term"], dtype=object)
        h = pd.util.hash_array(t, categorize=False)
        return batch.append_column(
            "bucket", pa.array((h % nbk).astype(np.int64), pa.int64()))

    def weigh(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"], kind="stable")
        terms = g["term"].to_numpy(dtype=object)
        docs = g["doc_id"].to_numpy(np.int64)
        tf = g["tf"].to_numpy(np.int64)
        n = len(g)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = terms[1:] != terms[:-1]
        lens = np.diff(np.append(np.flatnonzero(new), n))
        dfs = np.repeat(lens, lens)
        idf_e6 = np.floor(np.log(float(n_docs) / dfs) * 1e6 + 0.5).astype(np.int64)
        w = tf * idf_e6
        keep = (dfs <= cap) & (w > 0)
        return pd.DataFrame({"doc_id": docs[keep], "term": terms[keep],
                             "w": w[keep]})

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(_tf_rows(text_col, id_col), batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bucket")
        .map_groups(weigh, batch_format="pandas", runtime_env=_rte())
    )


def doc_keywords(ds, n_docs: int, k: int = 3, max_df: int | None = None,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 64):
    """Keyword extraction: per document, the top-``k`` TF-IDF terms
    (weight desc, term asc tie-break — exact-int weights, so the cut is
    deterministic and SQL-mirrorable).  One doc-bucket co-group after the
    weight stage; per-bucket lexsort + segment-rank, no per-doc Python."""
    nbk = np.uint64(n_buckets)

    def bucket_doc(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"], dtype=np.int64).astype(np.uint64)
        return batch.append_column("bkt", pa.array(
            ((d * _MIXC) % nbk).astype(np.int64), pa.int64()))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        docs = g["doc_id"].to_numpy(np.int64)
        terms = g["term"].to_numpy(dtype=object)
        w = g["w"].to_numpy(np.int64)
        order = np.lexsort((terms.astype(str), -w, docs))
        docs, terms, w = docs[order], terms[order], w[order]
        n = len(docs)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = docs[1:] != docs[:-1]
        seg = np.flatnonzero(new)
        rank = np.arange(n, dtype=np.int64) - np.repeat(
            seg, np.diff(np.append(seg, n)))
        keep = rank < k
        return pd.DataFrame({"doc_id": docs[keep], "term": terms[keep],
                             "w": w[keep],
                             "kw_rank": (rank[keep] + 1).astype(np.int64)})

    return (
        tfidf_weight_rows(ds, n_docs, max_df, text_col, id_col, n_buckets)
        .map_batches(bucket_doc, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bkt")
        .map_groups(topk, batch_format="pandas", runtime_env=_rte())
    )

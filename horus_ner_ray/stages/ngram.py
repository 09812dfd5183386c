"""Bigram language-model quality scoring (CCNet-style, order-aware).

Extends the unigram perplexity filter (stages/termstats.py
unigram_logprob_vectors) to conditional bigram probabilities: per document

    mean_lp2 = (1 / n_bigrams) * sum_{(w1,w2) in doc}
                   ln( (c12 + 1) / (c1 + V) )          [add-one smoothing]

with c12 = corpus count of the bigram, c1 = corpus count of bigrams
starting with w1 (so the conditional normalizes), V = distinct unigram
vocabulary size.  Word order now matters: "the cat sat" and "sat cat the"
get different scores — the signal the unigram filter cannot see.

Skew-proof shape (same moves as tfidf/unigram-LP):
- bigram count table from a per-batch COMBINER (one partial row per
  (bigram, batch); a hot bigram never forms a hot group);
- prefix counts c1 re-aggregate the (already small) bigram table;
- c1 attaches to bigram rows via a SALTED replicate join keyed by w1
  (a hot prefix "the ..." spreads over S salt groups);
- (c12, c1) attach to the per-doc bigram rows via a second salted
  replicate join keyed by the bigram string;
- every (doc, bigram) contribution quantizes to int64 lp2_e9 BEFORE
  summation -> order-free, hash-stable vs the SQL oracle.

Documents with fewer than two tokens produce no bigrams and drop from the
output (mirroring the oracle's inner join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.tokenize import tokenize_column
from horus_ner_ray.util import worker_runtime_env as _rte

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _doc_bigrams(batch: pa.Table, text_col: str, id_col: str):
    """batch -> flat (doc_id, bigram) instance arrays, in-document order.
    Bigram key = 'w1 w2' (tokens are [a-z0-9]+ so the space is unambiguous).
    """
    import pyarrow.compute as pc

    toks = tokenize_column(batch[text_col])
    flat = np.asarray(pc.list_flatten(toks), dtype=object)
    parents = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
    if len(flat) < 2:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=object)
    same = parents[1:] == parents[:-1]
    w1, w2 = flat[:-1][same], flat[1:][same]
    docs = np.asarray(batch[id_col], dtype=np.int64)[parents[:-1][same]]
    bg = np.char.add(np.char.add(w1.astype(str), " "), w2.astype(str))
    return docs, bg.astype(object)


def bigram_logprob_vectors(ds, text_col: str = "text",
                           id_col: str = "doc_id", n_buckets: int = 256,
                           n_salts: int = 16,
                           checkpoint_dir: str | None = None):
    """-> Dataset (doc_id, n_bigrams, lp2_e9, mean_lp2_e6).

    The corpus bigram-count table (which grows superlinearly with corpus
    size) is CHECKPOINTED to Parquet under ``checkpoint_dir`` (a fresh
    tempdir when None) and re-read lazily by each of its two consumers —
    never pinned whole in the object store.  The returned dataset reads
    from that directory LAZILY, so the caller owns cleanup: delete the
    directory only after the result has been fully consumed (pass an
    explicit ``checkpoint_dir`` and remove it, as the driver query does —
    a None tempdir would otherwise leak per run).
    """
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Sum

    B, S = np.uint64(n_buckets), np.uint64(n_salts)
    s_int = int(n_salts)

    # --- corpus bigram counts (combiner; skew-free) ----------------------
    def c12_partial(batch: pa.Table) -> pa.Table:
        docs, bg = _doc_bigrams(batch, text_col, id_col)
        if len(bg) == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(bg.astype(str), return_counts=True)
        return pa.table({"bigram": pa.array(u, pa.string()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    corpus = ds.select_columns([id_col, text_col])
    if checkpoint_dir is None:
        # self-owned checkpoint: the returned dataset is LAZY, so the
        # directory can't be removed here — register process-exit cleanup
        # instead (callers that outlive the result pass their own dir).
        # Without this, every bench/test invocation leaked one
        # corpus-bigram-sized directory in /tmp.
        import atexit
        import shutil

        checkpoint_dir = tempfile.mkdtemp(prefix="horus_bigram_c12_")
        atexit.register(shutil.rmtree, checkpoint_dir, True)
    c12_path = str(checkpoint_dir)
    # consumed twice (prefix counts + stat attach): persist to Parquet and
    # re-read per consumer instead of pinning a corpus-sized object-store
    # materialization
    (corpus.map_batches(c12_partial, batch_format="pyarrow",
                        zero_copy_batch=True, runtime_env=_rte())
     .groupby("bigram").aggregate(Sum("cnt", alias_name="c12"))
     .write_parquet(c12_path))
    from pathlib import Path as _Path

    if not any(_Path(c12_path).glob("*.parquet")):
        # zero bigrams in the corpus (every doc < 2 tokens): the checkpoint
        # directory is empty and read_parquet over it would error — the
        # correct result is an empty per-doc table
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "lp2_e9": pa.array([], pa.int64()),
            "mean_lp2_e6": pa.array([], pa.int64()),
        }))
    c12 = rd.read_parquet(c12_path, columns=["bigram", "c12"])

    # --- vocabulary size (distinct unigrams; combiner) -------------------
    def vocab_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokenize_column(batch[text_col])
        u = np.unique(np.asarray(pc.list_flatten(toks), dtype=str))
        return pa.table({"term": pa.array(u, pa.string())})

    n_vocab = (corpus.map_batches(vocab_partial, batch_format="pyarrow",
                                  zero_copy_batch=True, runtime_env=_rte())
               .groupby("term").count().count())

    # --- prefix counts c1: vocab-bounded broadcast attach ----------------
    # the per-w1 table has one row per distinct word (unigram-vocab
    # bounded), so it BROADCASTS (the KN / pmi_pairs precedent): ray.put
    # once, one searchsorted attach per c12 batch — no shuffle (the
    # bigram-keyed doc join below stays salted: that table is superlinear)
    def c1_partial(batch: pa.Table) -> pa.Table:
        bgs = np.asarray(batch["bigram"], dtype=object)
        w1 = np.array([b.split(" ", 1)[0] for b in bgs], dtype=object)
        g = (pd.DataFrame({"w1": w1,
                           "c": np.asarray(batch["c12"], dtype=np.int64)})
             .groupby("w1", sort=False).sum().reset_index())
        return pa.table({"w1": pa.array(g["w1"], pa.string()),
                         "c": pa.array(g["c"].to_numpy(np.int64),
                                       pa.int64())})

    import ray

    c1df = (c12.map_batches(c1_partial, batch_format="pyarrow",
                            runtime_env=_rte())
            .groupby("w1").aggregate(Sum("c", alias_name="c1"))
            .to_pandas().sort_values("w1"))
    c1_ref = ray.put((c1df["w1"].to_numpy(dtype=str),
                      c1df["c1"].to_numpy(np.int64)))

    def attach_c1(batch: pa.Table) -> pa.Table:
        sw, sc = ray.get(c1_ref)
        bgs = np.asarray(batch["bigram"], dtype=object)
        dw = np.array([b.split(" ", 1)[0] for b in bgs], dtype=str)
        idx = np.searchsorted(sw, dw)
        idx_c = np.minimum(idx, max(len(sw) - 1, 0))
        if len(sw) == 0 or not (sw[idx_c] == dw).all():
            raise AssertionError(
                "bigram prefix stat rows missing — every bigram's left "
                "word must appear in the prefix table by construction")
        return pa.table({
            "bigram": batch["bigram"],
            "c12": batch["c12"],
            "c1": pa.array(sc[idx_c], pa.int64()),
        })

    bg_stats = c12.map_batches(attach_c1, batch_format="pyarrow",
                               runtime_env=_rte())

    # --- per-doc scoring via salted replicate join keyed on the bigram ---
    def data_rows(batch: pa.Table) -> pa.Table:
        docs, bg = _doc_bigrams(batch, text_col, id_col)
        g = (pd.DataFrame({"d": docs, "b": bg})
             .groupby(["d", "b"], sort=False).size().reset_index(name="tf2"))
        bh = pd.util.hash_array(g["b"].to_numpy(object), categorize=False)
        dh = g["d"].to_numpy(np.int64).astype(np.uint64)
        gbkt = ((bh % B) * S + (dh * _MIX) % S).astype(np.int64)
        n = len(g)
        return pa.table({
            id_col: pa.array(g["d"].to_numpy(np.int64), pa.int64()),
            "bigram": pa.array(g["b"].to_numpy(object), pa.string()),
            "tf2": pa.array(g["tf2"].to_numpy(np.int64), pa.int64()),
            "c12": pa.nulls(n, pa.int64()),
            "c1": pa.nulls(n, pa.int64()),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "gbkt": pa.array(gbkt, pa.int64()),
        })

    def stat_rows(batch: pa.Table) -> pa.Table:
        bgs = np.asarray(batch["bigram"], dtype=object)
        bh = pd.util.hash_array(bgs, categorize=False)
        base = (bh % B) * S
        n = len(bgs)
        gbkt = (np.repeat(base, s_int)
                + np.tile(np.arange(s_int, dtype=np.uint64), n)
                ).astype(np.int64)
        rep = lambda col: np.repeat(np.asarray(batch[col], dtype=np.int64),
                                    s_int)
        return pa.table({
            id_col: pa.nulls(n * s_int, pa.int64()),
            "bigram": pa.array(np.repeat(bgs, s_int), pa.string()),
            "tf2": pa.nulls(n * s_int, pa.int64()),
            "c12": pa.array(rep("c12"), pa.int64()),
            "c1": pa.array(rep("c1"), pa.int64()),
            "side": pa.array(np.ones(n * s_int, np.int8), pa.int8()),
            "gbkt": pa.array(gbkt, pa.int64()),
        })

    V = int(n_vocab)

    def score_group(g: pd.DataFrame) -> pa.Table:
        data = g[g["side"] == 0]
        if len(data) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "lp2_e9": pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64())})
        stat = g[g["side"] == 1].drop_duplicates("bigram")
        m = data.merge(stat[["bigram", "c12", "c1"]], on="bigram",
                       how="inner", suffixes=("_x", ""))
        if len(m) != len(data):
            # the replicate-join routing invariant guarantees every data
            # bigram has its stat row in this group; fail loudly instead of
            # silently scoring NaN-derived garbage
            raise AssertionError(
                f"bigram stat rows missing for {len(data) - len(m)} data "
                f"rows in group — salted routing invariant violated")
        tf2 = m["tf2"].to_numpy(np.float64)
        c12v = m["c12"].to_numpy(np.float64)
        c1v = m["c1"].to_numpy(np.float64)
        # same double-conversion points as the oracle's
        # CAST(c12+1 AS DOUBLE) / CAST(c1+V AS DOUBLE)
        lp = np.floor(tf2 * np.log((c12v + 1.0) / (c1v + float(V)))
                      * 1e9 + 0.5).astype(np.int64)
        out = pd.DataFrame({id_col: m[id_col].to_numpy(np.int64),
                            "lp2_e9": lp,
                            "n_bigrams": m["tf2"].to_numpy(np.int64)})
        out = (out.groupby(id_col, sort=False)
               .agg(lp2_e9=("lp2_e9", "sum"),
                    n_bigrams=("n_bigrams", "sum")).reset_index())
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy(np.int64), pa.int64()),
            "lp2_e9": pa.array(out["lp2_e9"].to_numpy(np.int64), pa.int64()),
            "n_bigrams": pa.array(out["n_bigrams"].to_numpy(np.int64),
                                  pa.int64()),
        })

    per_group = (
        corpus.map_batches(data_rows, batch_format="pyarrow",
                           zero_copy_batch=True, runtime_env=_rte())
        .union(bg_stats.map_batches(stat_rows, batch_format="pyarrow",
                                    runtime_env=_rte()))
        .groupby("gbkt")
        .map_groups(lambda g: score_group(g.drop(columns=["gbkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )

    # --- final per-doc reduce + publication ------------------------------
    def finish(batch: pa.Table) -> pa.Table:
        lp = np.asarray(batch["lp2_e9"], dtype=np.int64)
        nb = np.asarray(batch["n_bigrams"], dtype=np.int64)
        mean = np.floor(lp.astype(np.float64) / (nb.astype(np.float64) * 1e9)
                        * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "n_bigrams": batch["n_bigrams"],
            "lp2_e9": batch["lp2_e9"],
            "mean_lp2_e6": pa.array(mean, pa.int64()),
        })

    from ray.data.aggregate import Sum as _Sum

    return (per_group.groupby(id_col)
            .aggregate(_Sum("lp2_e9", alias_name="lp2_e9"),
                       _Sum("n_bigrams", alias_name="n_bigrams"))
            .map_batches(finish, batch_format="pyarrow", runtime_env=_rte()))


def kn_bigram_logprob_vectors(ds, discount: float = 0.75,
                              text_col: str = "text",
                              id_col: str = "doc_id", n_buckets: int = 256,
                              n_salts: int = 16,
                              checkpoint_dir: str | None = None):
    """-> Dataset (doc_id, n_bigrams, kn_lp_e9, mean_kn_lp_e6).

    Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman
    1998's interpolated form) — the standard perplexity-filter LM, one
    step up from the add-one model above:

        P(w2|w1) = (max(c12 - D, 0) + ((D * nf) * np) / nt) / c1

    with c12 = corpus bigram count, c1 = count of bigrams starting with
    w1, nf = N1+(w1, .) distinct continuations of w1, np = N1+(. , w2)
    distinct left-contexts of w2 (the continuation probability's
    numerator — how many contexts w2 COMPLETES, not how often it
    occurs), nt = N1+(. , .) total distinct bigram types, D the absolute
    discount.  The single-division factored form above IS the arithmetic
    contract (float64 ops in exactly that association on both the numpy
    and the SQL side; D defaults to 0.75, exactly representable).

    Same skew-proof shape as ``bigram_logprob_vectors``: checkpointed
    bigram-type table; per-w1 stats (c1, nf) and per-w2 stats (np)
    attach via SALTED replicate joins; per-(doc, bigram) contributions
    quantize to int64 e9 BEFORE summation (order-free, hash-stable).
    Every doc bigram exists in the corpus model by construction, so
    p > 0 and the inner joins are total; docs with < 2 tokens drop.
    """
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    B, S = np.uint64(n_buckets), np.uint64(n_salts)
    s_int = int(n_salts)
    D = float(discount)
    if not (0.0 < D < 1.0):
        raise ValueError(f"discount must be in (0, 1), got {D}")

    def c12_partial(batch: pa.Table) -> pa.Table:
        docs, bg = _doc_bigrams(batch, text_col, id_col)
        if len(bg) == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(bg.astype(str), return_counts=True)
        return pa.table({"bigram": pa.array(u, pa.string()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    corpus = ds.select_columns([id_col, text_col])
    if checkpoint_dir is None:
        import atexit
        import shutil

        checkpoint_dir = tempfile.mkdtemp(prefix="horus_kn_c12_")
        atexit.register(shutil.rmtree, checkpoint_dir, True)
    c12_path = str(checkpoint_dir)
    (corpus.map_batches(c12_partial, batch_format="pyarrow",
                        zero_copy_batch=True, runtime_env=_rte())
     .groupby("bigram").aggregate(Sum("cnt", alias_name="c12"))
     .write_parquet(c12_path))
    from pathlib import Path as _Path

    if not any(_Path(c12_path).glob("*.parquet")):
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "kn_lp_e9": pa.array([], pa.int64()),
            "mean_kn_lp_e6": pa.array([], pa.int64()),
        }))
    c12 = rd.read_parquet(c12_path, columns=["bigram", "c12"])

    # --- per-word stats in ONE pass over the bigram table ---------------
    # left-side stats (c1 = sum c12, nf = distinct continuations) and
    # right-side stats (np = distinct left contexts) share the word key,
    # so one combiner emits both and ONE groupby(word) folds them
    def word_partial(batch: pa.Table) -> pa.Table:
        bgs = np.asarray(batch["bigram"], dtype=object)
        c = np.asarray(batch["c12"], dtype=np.int64)
        w1 = np.array([b.split(" ", 1)[0] for b in bgs], dtype=object)
        w2 = np.array([b.split(" ", 1)[1] for b in bgs], dtype=object)
        g1 = (pd.DataFrame({"w": w1, "c": c}).groupby("w", sort=False)
              .agg(c1=("c", "sum"), nf=("c", "size")).reset_index())
        g1["npre"] = np.int64(0)
        g2 = (pd.DataFrame({"w": w2}).groupby("w", sort=False)
              .size().reset_index(name="npre"))
        g2["c1"] = np.int64(0)
        g2["nf"] = np.int64(0)
        g = pd.concat([g1, g2[["w", "c1", "nf", "npre"]]],
                      ignore_index=True)
        return pa.table({
            "w": pa.array(g["w"].to_numpy(object), pa.string()),
            "c1": pa.array(g["c1"].to_numpy(np.int64), pa.int64()),
            "nf": pa.array(g["nf"].to_numpy(np.int64), pa.int64()),
            "npre": pa.array(g["npre"].to_numpy(np.int64), pa.int64()),
        })

    wstats = (c12.map_batches(word_partial, batch_format="pyarrow",
                              runtime_env=_rte())
              .groupby("w").aggregate(Sum("c1", alias_name="c1"),
                                      Sum("nf", alias_name="nf"),
                                      Sum("npre", alias_name="npre")))

    # --- attach (c1, nf, npre) to the bigram-type rows ------------------
    # The per-w1 and per-w2 stat tables are UNIGRAM-VOCAB-BOUNDED (one
    # row per distinct word), so they BROADCAST (the pmi_pairs
    # sorted-Arrow-array precedent): ray.put once, one searchsorted
    # attach per c12 batch — no shuffle (the bigram-keyed doc join below
    # stays salted because the bigram table is superlinear).
    import ray

    wdf = wstats.to_pandas().sort_values("w")
    # nt = distinct bigram types == sum of continuation counts — free
    # from the already-collected word-stat table, no extra c12 pass
    nt = int(wdf["nf"].sum())
    w_ref = ray.put((
        wdf["w"].to_numpy(dtype=str),
        wdf["c1"].to_numpy(np.int64), wdf["nf"].to_numpy(np.int64),
        wdf["npre"].to_numpy(np.int64),
    ))

    def attach_stats(batch: pa.Table) -> pa.Table:
        sw, c1v_, nfv_, npv_ = ray.get(w_ref)
        bgs = np.asarray(batch["bigram"], dtype=object)
        w1 = np.array([b.split(" ", 1)[0] for b in bgs], dtype=str)
        w2 = np.array([b.split(" ", 1)[1] for b in bgs], dtype=str)
        i1 = np.searchsorted(sw, w1)
        i2 = np.searchsorted(sw, w2)
        if (len(sw) == 0
                or not (sw[np.minimum(i1, len(sw) - 1)] == w1).all()
                or not (sw[np.minimum(i2, len(sw) - 1)] == w2).all()):
            raise AssertionError(
                "KN stat rows missing — every bigram's words must appear "
                "in the vocab stat table by construction")
        return pa.table({
            "bigram": batch["bigram"], "c12": batch["c12"],
            "c1": pa.array(c1v_[i1], pa.int64()),
            "nf": pa.array(nfv_[i1], pa.int64()),
            "npre": pa.array(npv_[i2], pa.int64()),
        })

    bg_stats = c12.map_batches(attach_stats, batch_format="pyarrow",
                               runtime_env=_rte())

    # --- per-doc scoring join keyed on the bigram -----------------------
    stat_cols = ("c12", "c1", "nf", "npre")

    def data_rows(batch: pa.Table) -> pa.Table:
        docs, bg = _doc_bigrams(batch, text_col, id_col)
        g = (pd.DataFrame({"d": docs, "b": bg})
             .groupby(["d", "b"], sort=False).size().reset_index(name="tf2"))
        bh = pd.util.hash_array(g["b"].to_numpy(object), categorize=False)
        dh = g["d"].to_numpy(np.int64).astype(np.uint64)
        gbkt = ((bh % B) * S + (dh * _MIX) % S).astype(np.int64)
        n = len(g)
        cols = {id_col: pa.array(g["d"].to_numpy(np.int64), pa.int64()),
                "bigram": pa.array(g["b"].to_numpy(object), pa.string()),
                "tf2": pa.array(g["tf2"].to_numpy(np.int64), pa.int64())}
        for c in stat_cols:
            cols[c] = pa.nulls(n, pa.int64())
        cols["side"] = pa.array(np.zeros(n, np.int8), pa.int8())
        cols["gbkt"] = pa.array(gbkt, pa.int64())
        return pa.table(cols)

    def stat_rows(batch: pa.Table) -> pa.Table:
        bgs = np.asarray(batch["bigram"], dtype=object)
        bh = pd.util.hash_array(bgs, categorize=False)
        base = (bh % B) * S
        n = len(bgs)
        gbkt = (np.repeat(base, s_int)
                + np.tile(np.arange(s_int, dtype=np.uint64), n)
                ).astype(np.int64)
        cols = {id_col: pa.nulls(n * s_int, pa.int64()),
                "bigram": pa.array(np.repeat(bgs, s_int), pa.string()),
                "tf2": pa.nulls(n * s_int, pa.int64())}
        for c in stat_cols:
            cols[c] = pa.array(
                np.repeat(np.asarray(batch[c], dtype=np.int64), s_int),
                pa.int64())
        cols["side"] = pa.array(np.ones(n * s_int, np.int8), pa.int8())
        cols["gbkt"] = pa.array(gbkt, pa.int64())
        return pa.table(cols)

    ntf = float(nt)

    def score_group(g: pd.DataFrame) -> pa.Table:
        data = g[g["side"] == 0]
        if len(data) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "kn_lp_e9": pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64())})
        stat = g[g["side"] == 1].drop_duplicates("bigram")
        m = data.merge(stat[["bigram", *stat_cols]], on="bigram",
                       how="inner", suffixes=("_x", ""))
        if len(m) != len(data):
            raise AssertionError(
                f"KN stat rows missing for {len(data) - len(m)} data rows "
                f"in group — salted routing invariant violated")
        tf2 = m["tf2"].to_numpy(np.float64)
        c12v = m["c12"].to_numpy(np.float64)
        c1v = m["c1"].to_numpy(np.float64)
        nfv = m["nf"].to_numpy(np.float64)
        npv = m["npre"].to_numpy(np.float64)
        # THE arithmetic contract (docstring) — same association in SQL
        p = (np.maximum(c12v - D, 0.0) + ((D * nfv) * npv) / ntf) / c1v
        lp = np.floor(tf2 * np.log(p) * 1e9 + 0.5).astype(np.int64)
        out = pd.DataFrame({id_col: m[id_col].to_numpy(np.int64),
                            "kn_lp_e9": lp,
                            "n_bigrams": m["tf2"].to_numpy(np.int64)})
        out = (out.groupby(id_col, sort=False)
               .agg(kn_lp_e9=("kn_lp_e9", "sum"),
                    n_bigrams=("n_bigrams", "sum")).reset_index())
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy(np.int64), pa.int64()),
            "kn_lp_e9": pa.array(out["kn_lp_e9"].to_numpy(np.int64),
                                 pa.int64()),
            "n_bigrams": pa.array(out["n_bigrams"].to_numpy(np.int64),
                                  pa.int64()),
        })

    per_group = (
        corpus.map_batches(data_rows, batch_format="pyarrow",
                           zero_copy_batch=True, runtime_env=_rte())
        .union(bg_stats.map_batches(stat_rows, batch_format="pyarrow",
                                    runtime_env=_rte()))
        .groupby("gbkt")
        .map_groups(lambda g: score_group(g.drop(columns=["gbkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )

    def finish(batch: pa.Table) -> pa.Table:
        lp = np.asarray(batch["kn_lp_e9"], dtype=np.int64)
        nb = np.asarray(batch["n_bigrams"], dtype=np.int64)
        mean = np.floor(lp.astype(np.float64) / (nb.astype(np.float64) * 1e9)
                        * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "n_bigrams": batch["n_bigrams"],
            "kn_lp_e9": batch["kn_lp_e9"],
            "mean_kn_lp_e6": pa.array(mean, pa.int64()),
        })

    from ray.data.aggregate import Sum as _Sum

    return (per_group.groupby(id_col)
            .aggregate(_Sum("kn_lp_e9", alias_name="kn_lp_e9"),
                       _Sum("n_bigrams", alias_name="n_bigrams"))
            .map_batches(finish, batch_format="pyarrow", runtime_env=_rte()))

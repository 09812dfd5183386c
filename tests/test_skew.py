"""Hot-key skew stress tests for the salted term/line-bucket operators.

Round-2's tfidf/unigram-LP/line-dedup routed every row of a term (or every
occurrence of a line) to ONE group — a df==N term or a ubiquitous line
meant corpus-sized pandas frames at scale.  The round-3 salted designs
bound any single group by ~hot_rows/S.  These tests pin both properties:

* routing: a term/line present in EVERY doc spreads over >= S*0.6 distinct
  salted groups, and no group holds more than ~2x its fair share (the
  unsalted key, by construction, put ALL hot rows in one group);
* correctness: outputs under heavy skew still match a Python reference.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

N_DOCS = 400
HOT_TERM = "ubiquitous"
HOT_LINE = "COMMON BOILERPLATE LINE"


def _skew_rows():
    rows = []
    for d in range(N_DOCS):
        rows.append({
            "doc_id": d,
            "text": f"{HOT_TERM} unique{d} extra{d % 7}\n{HOT_LINE}\nsolo line {d}",
        })
    return rows


def _salted_spread(hashes: np.ndarray, doc_ids: np.ndarray, n_buckets: int,
                   n_salts: int) -> np.ndarray:
    mix = np.uint64(0x9E3779B97F4A7C15)
    b, s = np.uint64(n_buckets), np.uint64(n_salts)
    dh = doc_ids.astype(np.uint64)
    return ((hashes % b) * s + (dh * mix) % s).astype(np.int64)


def test_tfidf_hot_term_routing_bounded():
    """The df==N term's rows land in >= 0.6*S distinct groups, each holding
    <= 2x fair share; the unsalted key would put all N in one."""
    S, B = 16, 8
    doc_ids = np.arange(N_DOCS, dtype=np.int64)
    th = pd.util.hash_array(np.array([HOT_TERM] * N_DOCS, dtype=object),
                            categorize=False)
    gbkt = _salted_spread(th, doc_ids, B, S)
    counts = Counter(gbkt.tolist())
    assert len(counts) >= int(S * 0.6)
    assert max(counts.values()) <= 2 * N_DOCS / S
    # unsalted: one group takes everything
    unsalted = _salted_spread(th, doc_ids, B, 1)
    assert len(Counter(unsalted.tolist())) == 1


def test_tfidf_correct_under_skew(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.termstats import tfidf_vectors

    rows = _skew_rows()
    got = (
        tfidf_vectors(rd.from_items(rows), n_docs=len(rows), n_buckets=4,
                      n_salts=8)
        .to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    tf = {(r["doc_id"], t): c for r in rows
          for t, c in Counter(re.findall(r"[a-z0-9]+", r["text"].lower())).items()}
    df = Counter(t for (_, t) in tf)
    want = pd.DataFrame(
        [{"doc_id": d, "term": t, "tf": c,
          "tfidf": c * np.log(float(len(rows)) / df[t])}
         for (d, t), c in tf.items()]
    ).sort_values(["doc_id", "term"]).reset_index(drop=True)
    # the hot term's tfidf is exactly 0 (ln N/N) in every doc
    hot = got[got["term"] == HOT_TERM]
    assert len(hot) == N_DOCS
    assert (hot["tfidf"] == 0.0).all()
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": np.int64, "tf": np.int64}),
        want.astype({"doc_id": np.int64, "tf": np.int64}))


def test_unigram_lp_correct_under_skew(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.termstats import unigram_logprob_vectors

    rows = _skew_rows()
    got = (
        unigram_logprob_vectors(rd.from_items(rows), n_buckets=4, n_salts=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    toks = {r["doc_id"]: re.findall(r"[a-z0-9]+", r["text"].lower())
            for r in rows}
    cf = Counter(t for ts in toks.values() for t in ts)
    total = float(sum(cf.values()))
    assert len(got) == N_DOCS
    for _, row in got.iterrows():
        ts = toks[row["doc_id"]]
        tfc = Counter(ts)
        want = sum(c * np.log(cf[t] / total) for t, c in sorted(tfc.items())) / len(ts)
        assert abs(row["mean_lp"] - want) < 1e-8, row["doc_id"]
        assert row["dl"] == len(ts)


def test_line_dedup_correct_under_skew(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.dedupe import remove_duplicate_lines

    rows = _skew_rows()
    got = (
        remove_duplicate_lines(rd.from_items(rows), min_count=2, n_buckets=4,
                               n_salts=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    cnt = Counter(l for r in rows for l in r["text"].split("\n"))
    assert cnt[HOT_LINE] == N_DOCS
    assert len(got) == N_DOCS  # every doc keeps its two unique lines
    for _, row in got.iterrows():
        r = rows[int(row["doc_id"])]
        kept = [l for l in r["text"].split("\n") if cnt[l] < 2]
        assert row["clean_text"] == "\n".join(kept)
        assert row["n_kept_lines"] == len(kept)
        assert HOT_LINE not in row["clean_text"]


def test_unigram_lp_order_free_publication(ray_session):
    """Two runs over differently-batched inputs publish BIT-IDENTICAL
    lp_e9 / mean_lp (the integer-domain accumulation guarantee)."""
    import ray.data as rd

    from horus_ner_ray.stages.termstats import unigram_logprob_vectors

    rows = _skew_rows()
    a = (unigram_logprob_vectors(rd.from_items(rows, override_num_blocks=3),
                                 n_buckets=4, n_salts=8)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (unigram_logprob_vectors(rd.from_items(rows, override_num_blocks=17),
                                 n_buckets=7, n_salts=3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (a["lp_e9"].to_numpy() == b["lp_e9"].to_numpy()).all()
    assert (a["mean_lp"].to_numpy() == b["mean_lp"].to_numpy()).all()

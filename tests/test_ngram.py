"""Bigram LM scoring vs a single-process reference; order sensitivity."""

import math
import re

import numpy as np
import pandas as pd


def _ref_bigram(df):
    tok = re.compile(r"[a-z0-9]+")
    docs = {r.doc_id: tok.findall(r.text.lower()) for r in df.itertuples()}
    c12, c1, vocab = {}, {}, set()
    for ts in docs.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    V = len(vocab)
    rows = []
    for did, ts in docs.items():
        lp = 0
        nb = 0
        per = {}
        for a, b in zip(ts, ts[1:]):
            per[(a, b)] = per.get((a, b), 0) + 1
        for (a, b), tf2 in per.items():
            lp += math.floor(
                tf2 * math.log(float(c12[(a, b)] + 1) / float(c1[a] + V))
                * 1e9 + 0.5)
            nb += tf2
        if nb:
            rows.append((did, nb, lp,
                         math.floor(float(lp) / (nb * 1e9) * 1e6 + 0.5)))
    return sorted(rows)


def _mk(n=150, seed=13):
    rng = np.random.RandomState(seed)
    vocab = [f"t{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.randint(0, 15))) for _ in range(n)]
    texts[7] = ""          # no tokens -> dropped
    texts[11] = "solo"     # one token, no bigram -> dropped
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_bigram_logprob_matches_reference_any_partitioning(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.ngram import bigram_logprob_vectors

    df = _mk()
    want = _ref_bigram(df)
    for parts in (1, 6):
        got = (bigram_logprob_vectors(
            rd.from_pandas(df.sample(frac=1, random_state=parts))
            .repartition(parts), n_buckets=16, n_salts=4)
            .to_pandas().astype(np.int64))
        rows = sorted(map(tuple, got[["doc_id", "n_bigrams", "lp2_e9",
                                      "mean_lp2_e6"]].itertuples(index=False)))
        assert rows == want, parts


def test_bigram_score_is_order_sensitive(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.ngram import bigram_logprob_vectors

    # common phrase repeated vs its reversal: the reversed doc must score
    # strictly lower (its bigrams are rare under the corpus model)
    df = pd.DataFrame({
        "doc_id": np.arange(12, dtype=np.int64),
        "text": ["the cat sat here"] * 10
        + ["the cat sat here", "here sat cat the"],
    })
    got = (bigram_logprob_vectors(rd.from_pandas(df), n_buckets=8, n_salts=2)
           .to_pandas().set_index("doc_id"))
    assert got.loc[11, "mean_lp2_e6"] < got.loc[10, "mean_lp2_e6"]


def _ref_kn(df, D=0.75):
    import math

    tok = re.compile(r"[a-z0-9]+")
    docs = {r.doc_id: tok.findall(r.text.lower()) for r in df.itertuples()}
    c12 = {}
    for ts in docs.values():
        for a, b in zip(ts, ts[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1, nf, npre = {}, {}, {}
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        nf[a] = nf.get(a, 0) + 1
        npre[b] = npre.get(b, 0) + 1
    nt = float(len(c12))
    out = []
    for did, ts in docs.items():
        per = {}
        for a, b in zip(ts, ts[1:]):
            per[(a, b)] = per.get((a, b), 0) + 1
        lp, nb = 0, 0
        for (a, b), tf2 in per.items():
            # the stage's documented arithmetic association, replayed in
            # scalar numpy float64
            p = (np.maximum(np.float64(c12[(a, b)]) - D, 0.0)
                 + ((D * np.float64(nf[a])) * np.float64(npre[b])) / nt
                 ) / np.float64(c1[a])
            lp += math.floor(tf2 * np.log(p) * 1e9 + 0.5)
            nb += tf2
        if nb:
            out.append((did, nb, lp, math.floor(lp / (nb * 1e9) * 1e6 + 0.5)))
    return sorted(out)


def test_kn_bigram_matches_reference_any_partitioning(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.ngram import kn_bigram_logprob_vectors

    df = _mk()
    want = _ref_kn(df)
    for parts in (1, 6):
        got = (kn_bigram_logprob_vectors(
            rd.from_pandas(df.sample(frac=1, random_state=parts))
            .repartition(parts), n_buckets=16, n_salts=4)
            .to_pandas().astype(np.int64))
        rows = sorted(map(tuple, got[["doc_id", "n_bigrams", "kn_lp_e9",
                                      "mean_kn_lp_e6"]]
                          .itertuples(index=False)))
        assert rows == want, parts


def test_kn_discount_validated(ray_session):
    import pytest
    import ray.data as rd

    from horus_ner_ray.stages.ngram import kn_bigram_logprob_vectors

    with pytest.raises(ValueError, match="discount"):
        kn_bigram_logprob_vectors(
            rd.from_pandas(_mk().head(3)), discount=1.0)

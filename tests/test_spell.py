"""Phrase suggester: candidate rule, bigram-LM sequence ranking vs a
dict reference, fallback semantics."""

import math
import re

import numpy as np
import pandas as pd
import pytest


def _mk():
    # corpus where sequence context disambiguates: 'data stream' frequent,
    # 'dada' exists but never precedes 'stream'
    texts = (["data stream filter"] * 30 + ["dada art piece"] * 10
             + ["data table scan"] * 5 + ["stream of thought"] * 5)
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})


def _ref(df, queries, max_dist=1, per_token=3):
    from horus_ner_ray.stages.fuzzy import levenshtein_distances

    tok = re.compile(r"[a-z0-9]+")
    docs = [tok.findall(t.lower()) for t in df["text"]]
    dfc = {}
    for ts in docs:
        for t in set(ts):
            dfc[t] = dfc.get(t, 0) + 1
    vocab = sorted(dfc)
    c12, c1 = {}, {}
    for ts in docs:
        for a, b in zip(ts, ts[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    V = len(vocab)
    out = {}
    for qid, q in enumerate(queries):
        toks = tok.findall(q.lower())
        cands = []
        for t in toks:
            ds_ = levenshtein_distances(
                np.full(len(vocab), t, dtype=object),
                np.array(vocab, dtype=str))
            cs = [(int(d), -dfc[v], v) for v, d in zip(vocab, ds_)
                  if d <= max_dist]
            cands.append([v for _d, _n, v in sorted(cs)[:per_token]])
        if not cands or any(not c for c in cands):
            continue
        if len(cands) == 1:
            out[qid] = (cands[0][0], 0)
            continue
        from itertools import product

        best = None
        for seq in product(*cands):
            sc = sum(math.floor(
                math.log((c12.get((a, b), 0) + 1.0)
                         / (c1.get(a, 0) + float(V))) * 1e9 + 0.5)
                for a, b in zip(seq, seq[1:]))
            s = " ".join(seq)
            if best is None or sc > best[0] or (sc == best[0]
                                               and s < best[1]):
                best = (sc, s)
        out[qid] = (best[1], best[0])
    return out


QUERIES = ["dta stream", "datx tble scan", "strem", "zzzzzz stream",
           "dada strem"]


def test_phrase_suggest_matches_reference(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.spell import phrase_suggest

    df = _mk()
    want = _ref(df, QUERIES)
    for parts in (1, 4):
        got = phrase_suggest(
            rd.from_pandas(df.sample(frac=1, random_state=parts))
            .repartition(parts), QUERIES)
        gmap = {int(r.query_id): (r.suggestion, int(r.score_e9))
                for r in got.itertuples()}
        assert gmap == want, parts
    # context wins: 'dta stream' corrects to 'data stream' (not 'dada')
    assert want[0][0] == "data stream"
    # uncorrectable token -> no row
    assert 3 not in want
    # single-token fallback = rank-1 candidate
    assert want[2][0] == "stream"


def test_phrase_suggest_validation(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.spell import phrase_suggest

    with pytest.raises(ValueError, match="max_dist"):
        phrase_suggest(rd.from_pandas(_mk()), ["x"], max_dist=-1)

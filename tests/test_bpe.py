"""BPE merge training vs a single-process reference; partitioning
invariance; the documented non-overlapping left-to-right merge rule."""

import numpy as np
import pandas as pd
import pytest
import re


def _ref_bpe(df, n_merges):
    """Independent reference: dict word-type counts + an explicit
    left-to-right token-scan merge (NOT str.replace) so the library's
    sentinel-space replace semantics are validated, not mirrored."""
    tok = re.compile(r"[a-z0-9]+")
    wt = {}
    for t in df["text"]:
        for w in tok.findall(t.lower()):
            wt[w] = wt.get(w, 0) + 1
    segs = {w: list(w) for w in wt}
    out = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for w, ts in segs.items():
            for a, b in zip(ts, ts[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wt[w]
        if not pairs:
            raise ValueError("exhausted")
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        out.append((step, l, r, c))
        for w, ts in segs.items():
            res, i = [], 0
            while i < len(ts):
                if i + 1 < len(ts) and ts[i] == l and ts[i + 1] == r:
                    res.append(l + r)
                    # the library's sentinel-space replace consumes the
                    # TRAILING space: token i+2 loses its leading space
                    # and cannot start the next match this round.
                    if i + 2 < len(ts):
                        res.append(ts[i + 2])
                    i += 3
                else:
                    res.append(ts[i])
                    i += 1
            segs[w] = res
    return out


def _mk(n=120, seed=7):
    rng = np.random.RandomState(seed)
    vocab = ["low", "lower", "lowest", "newer", "wider", "new",
             "aaaa", "aaa", "banana", "abcabc"]
    texts = [" ".join(rng.choice(vocab, rng.randint(1, 12)))
             for _ in range(n)]
    texts[3] = "AAAA aaaa!  Banana-banana"   # case/punct via tokenizer
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_bpe_train_matches_reference_any_partitioning(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.bpe import bpe_train

    df = _mk()
    want = _ref_bpe(df, 8)
    for parts in (1, 5):
        got = bpe_train(
            rd.from_pandas(df.sample(frac=1, random_state=parts))
            .repartition(parts), n_merges=8)
        assert list(map(tuple, got.itertuples(index=False))) == want


def test_bpe_merge_rule_trailing_space_consumption(ray_session):
    # ' a a a a ' -> ONE merge in round 1 ('aa a a'): the match consumes
    # its trailing sentinel space, so the following 'a' can't start the
    # next match this round.  Round 2's pairs are (aa,a):1 and (a,a):1 —
    # tie broken by left asc picks ('a','a') -> ' aa aa '.
    import ray.data as rd

    from horus_ner_ray.stages.bpe import bpe_train

    df = pd.DataFrame({"doc_id": [0], "text": ["aaaa"]})
    got = bpe_train(rd.from_pandas(df), n_merges=3)
    rows = list(map(tuple, got.itertuples(index=False)))
    assert rows[0] == (1, "a", "a", 3)
    assert rows[1] == (2, "a", "a", 1)
    assert rows[2] == (3, "aa", "aa", 1)


def test_bpe_exhaustion_raises(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.bpe import bpe_train

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["ab", "ab"]})
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train(rd.from_pandas(df), n_merges=5)


def test_bpe_encode_stats_matches_reference(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.bpe import bpe_encode_stats, bpe_train

    df = _mk()
    merges = [(l, r) for _s, l, r, _c in
              map(tuple, bpe_train(rd.from_pandas(df), n_merges=8)
                  .itertuples(index=False))]
    got = (bpe_encode_stats(rd.from_pandas(df).repartition(5), merges)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # scalar reference: replay the same sentinel-replace rule per doc
    tok = re.compile(r"[a-z0-9]+")
    for r in got.itertuples():
        ws = tok.findall(df.loc[df.doc_id == r.doc_id, "text"].iloc[0]
                         .lower())
        assert r.n_tokens == len(ws)
        total = 0
        for w in ws:
            seg = " " + " ".join(w) + " "
            for l_, r_ in merges:
                seg = seg.replace(f" {l_} {r_} ", f" {l_}{r_} ")
            total += len(seg.split())
        assert r.n_subwords == total, r.doc_id
    # each word is >= 1 subword, and the merges strictly compress vs the
    # no-merge (character-level) encoding somewhere
    assert (got["n_subwords"] >= got["n_tokens"]).all()
    nochars = (bpe_encode_stats(rd.from_pandas(df), [])
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (got["n_subwords"] <= nochars["n_subwords"]).all()
    assert (got["n_subwords"] < nochars["n_subwords"]).any()

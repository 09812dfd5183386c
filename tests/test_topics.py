"""Seed-term topic scorer vs a plain-Python reference."""

import math
import re

import numpy as np
import pandas as pd


DOCS = pd.DataFrame({
    "doc_id": np.arange(6, dtype=np.int64),
    "text": [
        "the data table has a ROW and a column of data",
        "fast query scan, slow sort",
        "nothing relevant here at all",
        "big small big small fast",
        "query filter sort scan query",
        "",
    ],
})
TOPICS = {"data": ["data", "table", "column", "row"],
          "perf": ["fast", "slow", "big", "small"],
          "query": ["query", "filter", "scan", "sort"]}


def _ref_scores():
    tok = lambda s: re.findall(r"[a-z0-9]+", s.lower())
    df = {}
    for t in DOCS["text"]:
        for w in set(tok(t)):
            df[w] = df.get(w, 0) + 1
    n = len(DOCS)
    idf = {}
    topic_of = {}
    for name in sorted(TOPICS):
        for w in TOPICS[name]:
            if df.get(w, 0) > 0 and w not in topic_of:
                topic_of[w] = name
                idf[w] = math.floor(math.log(n / df[w]) * 1e6 + 0.5)
    rows = []
    for did, t in zip(DOCS["doc_id"], DOCS["text"]):
        sc = {name: 0 for name in sorted(TOPICS)}
        for w in tok(t):
            if w in topic_of:
                sc[topic_of[w]] += int(idf[w])
        best = max(sorted(TOPICS), key=lambda nm: sc[nm])
        top = best if sc[best] > 0 else ""
        rows.append((did, sc["data"], sc["perf"], sc["query"], top))
    return rows


def test_topic_scores_match_reference(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.termstats import term_df_dataset
    from horus_ner_ray.stages.topics import topic_score_dataset

    ds = rd.from_pandas(DOCS).repartition(3)
    dfd = term_df_dataset(ds).to_pandas()
    df_map = dict(zip(dfd["term"], dfd["df"].astype(int)))
    got = (topic_score_dataset(rd.from_pandas(DOCS).repartition(3), TOPICS,
                               df_map, n_docs=len(DOCS))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _ref_scores()
    for i, (did, sd, sp, sq, top) in enumerate(want):
        r = got.iloc[i]
        assert (r["doc_id"], r["score_data"], r["score_perf"],
                r["score_query"], r["top_topic"]) == (did, sd, sp, sq, top)


def test_topic_idf_drops_absent_terms():
    from horus_ner_ray.stages.topics import topic_idf_e6

    tarr, tidx, idf = topic_idf_e6({"a": ["x", "y"], "b": ["z"]},
                                   {"x": 3, "z": 1}, 10)
    assert list(tarr) == ["x", "z"]
    assert list(tidx) == [0, 1]
    assert idf[1] == math.floor(math.log(10.0) * 1e6 + 0.5)


def test_topic_nb_predictions_trained_scorer(ray_session):
    """Weak-label bootstrap -> NB fit -> score-all: every doc gets a
    prediction, seed-labeled docs keep their weak label when the seed
    evidence is strong, and the chain is deterministic."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.termstats import term_df_dataset
    from horus_ner_ray.stages.topics import topic_nb_predictions

    topics = {"fruit": ["apple", "banana"], "metal": ["iron", "copper"]}
    texts = (["apple banana pie sweet treat"] * 8
             + ["iron copper forge anvil heat"] * 8
             + ["pie sweet treat"] * 2          # unlabeled, fruit-ish words
             + ["forge anvil heat"] * 2)        # unlabeled, metal-ish words
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = rd.from_pandas(df).repartition(4)
    dfs = term_df_dataset(ds).to_pandas()
    df_map = dict(zip(dfs["term"], dfs["df"].astype(int)))
    out = (topic_nb_predictions(ds, topics, df_map, n_docs=len(df))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(df)
    assert list(out.columns) == ["doc_id", "pred_topic", "score_e9"]
    assert (out.loc[:7, "pred_topic"] == "fruit").all()
    assert (out.loc[8:15, "pred_topic"] == "metal").all()
    # the TRAINED model generalizes to docs with no seed terms at all
    assert (out.loc[16:17, "pred_topic"] == "fruit").all()
    assert (out.loc[18:19, "pred_topic"] == "metal").all()
    out2 = (topic_nb_predictions(ds, topics, df_map, n_docs=len(df))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.equals(out2)

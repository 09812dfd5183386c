"""Round-3 operator tests: hash-join skew guard, query-time ANN term
expansion, langid ground-truth accuracy."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_hash_join_skew_guard_raises(ray_session):
    """A hot m:n key whose cross product exceeds max_bucket_rows fails
    loudly with routing guidance instead of building a giant frame."""
    import ray.data as rd

    from horus_ner_ray.stages.joins import hash_join_dataset

    left = [{"k": 0, "lv": i} for i in range(300)] + [{"k": 1, "lv": -1}]
    right = [{"k": 0, "rv": i} for i in range(300)] + [{"k": 2, "rv": -2}]
    j = hash_join_dataset(rd.from_items(left), rd.from_items(right), "k",
                          ["lv"], ["rv"], n_buckets=4,
                          max_bucket_rows=10_000)
    with pytest.raises(Exception, match="max_bucket_rows"):
        j.to_pandas()


def test_hash_join_skew_guard_chunked_matches_reference(ray_session):
    """on_overflow='chunk' produces the exact inner-join result (including
    a single monster key sliced by left rows)."""
    import ray.data as rd

    from horus_ner_ray.stages.joins import hash_join_dataset

    left = [{"k": 0, "lv": i} for i in range(120)] + [
        {"k": 5, "lv": 1000 + i} for i in range(3)]
    right = [{"k": 0, "rv": i} for i in range(110)] + [
        {"k": 5, "rv": 2000}]
    got = (
        hash_join_dataset(rd.from_items(left), rd.from_items(right), "k",
                          ["lv"], ["rv"], n_buckets=4,
                          max_bucket_rows=1_000, on_overflow="chunk")
        .to_pandas().sort_values(["k", "lv", "rv_r"]).reset_index(drop=True)
    )
    want = (
        pd.DataFrame(left).merge(
            pd.DataFrame(right).rename(columns={"rv": "rv_r"}), on="k")
        .sort_values(["k", "lv", "rv_r"]).reset_index(drop=True)
        .astype(np.int64)[["k", "lv", "rv_r"]]
    )
    pd.testing.assert_frame_equal(got.astype(np.int64)[["k", "lv", "rv_r"]],
                                  want)
    assert len(got) == 120 * 110 + 3


def test_query_expansion_unions_neighbor_terms(tmp_path, ray_session):
    """expand_terms unions each query term's nearest term-vector neighbor
    (the reference's word2vec most_similar union): expanded results equal
    an explicit multi-term query and differ from the unexpanded one."""
    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import QueryEngine

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["cat chases mouse", "feline naps quietly",
                          "dog barks loudly"], pa.string()),
    })
    frag = tmp_path / "docs.parquet"
    pq.write_table(docs, frag)
    idx = tmp_path / "idx"
    build_index([str(frag)], idx,
                PipelineConfig(num_shards=2, doc_id_mode="provided"))
    eng = QueryEngine(str(idx))
    terms = ["cat", "feline", "dog"]
    vecs = np.array([[1.0, 0.05, 0.0],   # cat ~ feline
                     [0.95, 0.1, 0.0],
                     [0.0, 0.0, 1.0]])   # dog far away
    eng.set_term_vectors(terms, vecs)

    plain = eng.search("cat", 10)
    assert [d for d, _ in plain] == [0]
    assert eng.expand_query_terms(["cat"], 1) == ["cat", "feline"]
    expanded = eng.search("cat", 10, expand_terms=1)
    assert expanded == eng.search("cat feline", 10)
    assert {d for d, _ in expanded} == {0, 1}
    # AND mode rejects expansion; terms without vectors pass through
    with pytest.raises(ValueError, match="mode='or'"):
        eng.search("cat", 10, mode="and", expand_terms=1)
    assert eng.expand_query_terms(["mouse"], 2) == ["mouse"]


# deterministic labeled multilingual fixture: stopword-profile languages
# plus script-detected ones (the heuristic's two mechanisms)
_LANGID_FIXTURE = [
    ("en", "the house is on the hill and it is warm in there"),
    ("en", "you have to be at the station from nine or ten"),
    ("en", "this is a test of the language id for english text"),
    ("en", "it is the best of times and the worst of times"),
    ("es", "el perro y el gato estan en la casa de su amigo"),
    ("es", "no se puede estar con un libro por la noche"),
    ("es", "la vida es un camino que se hace al andar"),
    ("es", "el tiempo y la marea no esperan por un hombre"),
    ("de", "der hund und die katze sind mit dem kind im haus"),
    ("de", "das ist nicht die frage von einem tag auf den anderen"),
    ("de", "die sonne ist im sommer als ein feuer auf der haut"),
    ("de", "der weg zu dem ziel ist nicht immer eine gerade"),
    ("fr", "le chien est dans le jardin avec ce chat qui dort"),
    ("fr", "il ne faut pas vendre la peau de un ours pour rien"),
    ("fr", "ce qui se passe dans la nuit ne se voit pas plus"),
    ("fr", "le temps est un grand maitre pour qui sait attendre"),
    ("ru", "собака и кошка живут в доме на холме"),
    ("ru", "это очень хороший день для прогулки"),
    ("zh", "这是一个测试语言识别的句子今天天气很好"),
    ("ko", "오늘은 날씨가 매우 좋습니다 산책하기 좋은 날입니다"),
]


def test_langid_accuracy_on_labeled_fixture(ray_session):
    """The langid heuristic can't silently regress: >= 90% accuracy on a
    fixed labeled fixture covering both detection mechanisms."""
    import ray.data as rd

    from horus_ner_ray.stages.analysis import langid_dataset

    rows = [{"doc_id": i, "lang": l, "text": t}
            for i, (l, t) in enumerate(_LANGID_FIXTURE)]
    got = (langid_dataset(rd.from_items(rows))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = np.array([l for l, _ in _LANGID_FIXTURE], dtype=object)
    acc = float((got["lang_pred"].to_numpy(object) == want).mean())
    assert acc >= 0.9, (acc, list(zip(want, got["lang_pred"])))


def test_ranking_metrics_hand_computed():
    import math

    from horus_ner_ray.stages.evalmetrics import ranking_metrics_row

    # perfect ranking
    m = ranking_metrics_row([1, 2, 3], [1, 2, 3], k=10)
    assert m["ndcg_e6"] == 1_000_000 and m["mrr_e6"] == 1_000_000
    assert m["recall_e6"] == 1_000_000 and m["n_hit"] == 3
    # one relevant at rank 2
    m = ranking_metrics_row([9, 1, 8], [1], k=10)
    assert m["mrr_e6"] == 500_000
    assert m["dcg_e9"] == math.floor(1e9 / math.log2(3) + 0.5)
    assert m["idcg_e9"] == 10**9  # ideal: rank 1, log2(2) == 1
    assert m["recall_e6"] == 1_000_000
    # miss entirely
    m = ranking_metrics_row([9, 8], [1, 2], k=10)
    assert m["n_hit"] == 0 and m["ndcg_e6"] == 0 and m["mrr_e6"] == 0
    assert m["idcg_e9"] > 0
    # empty qrels -> zeros
    assert ranking_metrics_row([1, 2], [], k=10)["idcg_e9"] == 0
    # k truncation: a hit at rank 11 doesn't count with k=10
    m = ranking_metrics_row(list(range(100, 110)) + [1], [1], k=10)
    assert m["n_hit"] == 0


def test_team_draft_interleave_rules():
    from horus_ner_ray.stages.evalmetrics import team_draft_interleave
    from horus_ner_ray.stages.sketches import splitmix64
    import numpy as np

    a = [1, 2, 3, 4]
    b = [3, 4, 5, 6]
    out = team_draft_interleave(a, b, qid=0, k=6, seed=7)
    # every pick unique, ranks sequential, teams alternate within rounds
    docs = [d for _r, d, _t in out]
    assert len(set(docs)) == len(docs)
    assert [r for r, _d, _t in out] == list(range(1, len(out) + 1))
    # the coin schedule is the documented pure function
    h0 = int(splitmix64(np.array([np.uint64(0) ^ np.uint64(7)],
                                 dtype=np.uint64))[0])
    first = "a" if h0 % 2 == 0 else "b"
    assert out[0][2] == first
    other = "b" if first == "a" else "a"
    assert out[1][2] == other
    # each team's picks preserve its own ranking order
    for team, lst in (("a", a), ("b", b)):
        picks = [d for _r, d, t in out if t == team]
        idx = [lst.index(d) for d in picks]
        assert idx == sorted(idx)
    # exhaustion variant: a team with an empty list emits no picks
    out2 = team_draft_interleave([1], [], qid=3, k=4)
    assert [(d, t) for _r, d, t in out2] == [(1, "a")]

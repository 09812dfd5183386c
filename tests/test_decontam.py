"""Benchmark decontamination (stages/decontam.py): known-overlap unit
case, short-doc exclusion, empty benchmark, and the broadcast probe's
distinct-count semantics."""

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _ds(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_decontaminate_known_overlap(ray_session):
    from horus_ner_ray.stages.decontam import decontaminate_dataset

    corpus = _ds([
        (0, "a b c d e"),     # shares 'a b c' and 'b c d' -> 2
        (1, "x y z"),         # no overlap
        (2, "a b c"),         # shares 'a b c' -> 1
        (3, "q w"),           # < 3 tokens: no shingles, never flagged
        (4, "a b c a b c"),   # duplicate shingles count ONCE (distinct)
    ])
    bench = _ds([(10, "a b c d"), (11, "m n o")])
    out = (decontaminate_dataset(corpus, bench, k=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc 4's distinct shingles {'a b c','b c a','c a b'} share only
    # 'a b c' with the bench set {'a b c','b c d','m n o'}
    want = pd.DataFrame({"doc_id": [0, 2, 4], "n_shared": [2, 1, 1]})
    assert out.astype(int).values.tolist() == want.values.tolist()


def test_decontaminate_empty_benchmark(ray_session):
    from horus_ner_ray.stages.decontam import decontaminate_dataset

    corpus = _ds([(0, "a b c d")])
    bench = _ds([(9, "xy")])  # too short: benchmark has no shingles
    assert len(decontaminate_dataset(corpus, bench, k=3).to_pandas()) == 0

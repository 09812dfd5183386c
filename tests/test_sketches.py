"""HyperLogLog: CLZ correctness, accuracy bounds, merge/layout invariance."""

import numpy as np
import pandas as pd
import pytest


def test_clz_vectorization_matches_python():
    from horus_ner_ray.stages.sketches import _registers_for_batch

    p = 4
    rng = np.random.RandomState(0)
    vals = rng.randint(0, 2**62, 500)
    regs = _registers_for_batch(vals, p)
    # python reference over the same hash stream
    h = pd.util.hash_array(vals, categorize=False).astype(np.uint64)
    want = np.zeros(1 << p, dtype=np.uint8)
    for x in h:
        idx = int(x >> np.uint64(64 - p))
        rest = int((x << np.uint64(p)) | np.uint64((1 << p) - 1)) & ((1 << 64) - 1)
        lz = 64 - rest.bit_length()
        rho = min(lz + 1, 64 - p + 1)
        want[idx] = max(want[idx], rho)
    assert (regs == want).all()


@pytest.mark.parametrize("n_true", [50, 5_000, 200_000])
def test_hll_accuracy(ray_session, n_true):
    import ray.data as rd

    from horus_ner_ray.stages.sketches import hll_count_distinct

    # duplicated stream: each value appears ~3x
    vals = np.repeat(np.arange(n_true, dtype=np.int64), 3)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(9)
    est = hll_count_distinct(ds, "v", p=14)
    assert abs(est - n_true) / n_true < 0.03  # 3 sigma at p=14


def test_hll_layout_invariant_and_mergeable(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.sketches import (
        _estimate,
        hll_count_distinct,
        hll_registers,
    )

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 10**9, 30_000)
    df = pd.DataFrame({"v": vals})
    e1 = hll_count_distinct(rd.from_pandas(df), "v", p=12)
    e2 = hll_count_distinct(
        rd.from_pandas(df.sample(frac=1, random_state=3)).repartition(17), "v", p=12)
    assert e1 == e2  # deterministic pure function of the value set

    # union-by-max merges two disjoint streams into the combined estimate
    a, b = df.iloc[:15_000], df.iloc[15_000:]
    ra = hll_registers(rd.from_pandas(a), "v", p=12)
    rb = hll_registers(rd.from_pandas(b), "v", p=12)
    merged = _estimate(np.maximum(ra, rb), 12)
    assert merged == e1


def test_hll_string_column(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.sketches import hll_count_distinct

    df = pd.DataFrame({"s": [f"user-{i % 800}" for i in range(5000)]})
    est = hll_count_distinct(rd.from_pandas(df), "s", p=14)
    assert abs(est - 800) / 800 < 0.03

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


def test_splitmix64_matches_sql():
    """The numpy splitmix64 kernel and the DuckDB expression emitted by
    __ray_entry__._sql_splitmix64 agree bit-for-bit (the foundation of the
    hll_users oracle)."""
    import duckdb

    import __ray_entry__ as entry
    from horus_ner_ray.stages.sketches import splitmix64

    rng = np.random.RandomState(11)
    vals = np.concatenate([
        rng.randint(0, np.iinfo(np.int64).max, 500).astype(np.uint64),
        np.array([0, 1, 2**32, 2**63 - 1, 2**64 - 1], dtype=np.uint64),
    ])
    expected = splitmix64(vals)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    got = con.execute(
        f"SELECT {entry._sql_splitmix64('x')} FROM t"
    ).fetchnumpy()
    got = next(iter(got.values())).astype(np.uint64)
    np.testing.assert_array_equal(got, expected)


def test_hll_oracle_both_branches(ray_session):
    """Ray HLL estimate == full SQL-oracle estimate on BOTH the
    linear-counting branch (few distincts) and the raw harmonic branch
    (distincts >> 2.5m), at a small p so the raw branch is reachable."""
    import math

    import duckdb
    import ray.data as rd

    import __ray_entry__ as entry
    from horus_ner_ray.stages.sketches import hll_count_distinct

    for p, n_distinct in ((6, 20), (6, 5000), (14, 900)):
        rng = np.random.RandomState(p * 1000 + n_distinct)
        ids = rng.randint(0, 10**12, n_distinct)
        vals = np.repeat(ids, 3)  # duplicates must not move the estimate
        est = hll_count_distinct(
            rd.from_pandas(pd.DataFrame({"user_id": vals})), "user_id",
            p=p, hash64="splitmix64")
        con = duckdb.connect()
        con.register("events", pd.DataFrame({"user_id": vals}))
        got = con.execute(entry._sql_hll_users(p=p)).fetchone()[1]
        assert got == math.floor(est + 0.5), (p, n_distinct, got, est)


def test_hll_linear_counting_ln_agreement_exhaustive():
    """Every possible zero-register count at p=14 yields the same rounded
    linear-counting estimate in DuckDB ln() and numpy log() — the one
    libm-dependent step of the hll_users oracle, verified exhaustively."""
    import duckdb

    rows = duckdb.connect().execute("""
        SELECT z, CAST(FLOOR(16384.0 * ln(16384.0 / z) + 0.5) AS BIGINT)
        FROM generate_series(1, 16383) t(z)
    """).fetchall()
    zs = np.array([z for z, _ in rows], dtype=np.float64)
    sql_vals = np.array([v for _, v in rows], dtype=np.int64)
    np_vals = np.floor(16384.0 * np.log(16384.0 / zs) + 0.5).astype(np.int64)
    np.testing.assert_array_equal(sql_vals, np_vals)

"""Distributed exact discrete quantiles vs sorted-array / DuckDB refs."""

import math

import numpy as np
import pandas as pd
import pytest


def _ref(vals, qs):
    v = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(v)
    return [float(v[min(n - 1, max(0, math.ceil(q * n) - 1))]) for q in qs]


QS = [0.0, 0.125, 0.25, 0.5, 0.75, 0.875, 1.0]


@pytest.mark.parametrize("gather_limit,n_bins", [(10**9, 64), (50, 16), (5, 4)])
def test_quantiles_match_reference(ray_session, gather_limit, n_bins):
    """Small gather limits force multi-round histogram refinement; results
    must be identical to the single-shot gather."""
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_disc

    rng = np.random.RandomState(3)
    vals = np.r_[rng.normal(100, 20, 3000), rng.exponential(5, 2000),
                 np.full(500, 42.0)]  # heavy duplicate mass
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(7)
    got = quantile_disc(ds, "x", QS, n_bins=n_bins,
                        gather_limit=gather_limit)
    assert list(got["value"]) == _ref(vals, QS)


def test_quantiles_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_disc

    rng = np.random.RandomState(8)
    vals = rng.rand(4000) * 1000
    got = quantile_disc(rd.from_pandas(pd.DataFrame({"x": vals})), "x", QS,
                        n_bins=32, gather_limit=100)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    want = con.execute(
        "SELECT quantile_disc(x, $1::DOUBLE[]) FROM t", [QS]).fetchone()[0]
    assert list(got["value"]) == [float(w) for w in want]


def test_quantiles_degenerate(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_disc

    # all-equal column stalls histogram refinement -> gather guard
    ds = rd.from_pandas(pd.DataFrame({"x": np.full(1000, 7.5)}))
    got = quantile_disc(ds, "x", [0.5], n_bins=8, gather_limit=10)
    assert list(got["value"]) == [7.5]
    # empty dataset
    e = quantile_disc(
        rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype=np.float64)})),
        "x", [0.5])
    assert np.isnan(e["value"].iloc[0])


def test_quantiles_bin_edge_adversarial(ray_session):
    """Values at exact bin boundaries and one-ulp neighbours: candidate-set
    membership must use the identical floor-division predicate that
    produced the counts, or ranks shift by one at edges."""
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_disc

    edges = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    vals = np.concatenate([
        edges,
        np.nextafter(edges, -np.inf),
        np.nextafter(edges, np.inf),
        np.linspace(0, 1, 101),
    ])
    vals = vals[(vals >= 0) & (vals <= 1)]
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(3)
    got = quantile_disc(ds, "x", QS, n_bins=4, gather_limit=4, max_rounds=30)
    assert list(got["value"]) == _ref(vals, QS)


def test_quantiles_by_group(ray_session):
    import duckdb
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_disc_by_group

    rng = np.random.RandomState(12)
    df = pd.DataFrame({"g": rng.randint(0, 9, 3000),
                       "x": rng.rand(3000).round(2)})  # duplicate-heavy
    got = (
        quantile_disc_by_group(rd.from_pandas(df).repartition(5), "g", "x",
                               [0.25, 0.5, 0.75], n_buckets=4)
        .to_pandas().sort_values(["g", "q"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT g, unnest([0.25, 0.5, 0.75]) AS q,
               unnest(quantile_disc(x, [0.25, 0.5, 0.75])) AS value
        FROM t GROUP BY g ORDER BY g, q
    """).df()
    assert list(got["g"]) == list(want["g"])
    assert np.allclose(got["value"], want["value"], atol=0)

def test_quantile_cont_matches_duckdb(ray_session):
    """Interpolated quantiles: bitwise-equal to DuckDB's quantile_cont
    (same (crn-rn)*lo + (rn-frn)*hi association, float64 throughout)."""
    import duckdb
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_cont

    rng = np.random.RandomState(21)
    vals = np.r_[rng.rand(3000) * 1000, np.full(200, 512.0)]
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = quantile_cont(rd.from_pandas(pd.DataFrame({"x": vals})).repartition(5),
                        "x", qs, n_bins=32, gather_limit=100)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    want = con.execute(
        "SELECT quantile_cont(x, $1::DOUBLE[]) FROM t", [qs]).fetchone()[0]
    assert list(got["value"]) == [float(w) for w in want]


def test_quantile_cont_empty(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import quantile_cont

    e = quantile_cont(
        rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype=np.float64)})),
        "x", [0.5])
    assert np.isnan(e["value"].iloc[0])


def test_mad_by_group(ray_session):
    """Grouped MAD equals the local rank-rule computation exactly (both
    medians are order statistics — no tolerance needed)."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import mad_by_group

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=500),
        "v": rng.normal(100.0, 25.0, size=500),
    })
    got = mad_by_group(rd.from_pandas(df), "g", "v")

    def disc_med(a):
        a = np.sort(np.asarray(a, dtype=np.float64))
        return a[max(0, math.ceil(0.5 * len(a)) - 1)]

    for _, row in got.iterrows():
        vals = df.loc[df.g == row["g"], "v"].to_numpy(np.float64)
        m = disc_med(vals)
        assert row["median"] == m
        assert row["mad"] == disc_med(np.abs(vals - m))
    assert list(got["g"]) == ["a", "b", "c"]


def test_boxplot_clips_whiskers(ray_session):
    """Long-tailed data: whiskers are actual stored values strictly inside
    min/max; every field equals the numpy reference computation."""
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import boxplot

    rng = np.random.RandomState(11)
    vals = np.r_[rng.normal(50, 5, 4000), rng.exponential(200, 100)]
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(5)
    out = boxplot(ds, "x").iloc[0]

    v = np.sort(vals)
    n = len(v)

    def cont(q):
        rn = q * (n - 1)
        f, c = math.floor(rn), math.ceil(rn)
        return v[f] if f == c else (c - rn) * v[f] + (rn - f) * v[c]

    q1, q2, q3 = cont(0.25), cont(0.5), cont(0.75)
    lo_f = q1 - 1.5 * (q3 - q1)
    hi_f = q3 + 1.5 * (q3 - q1)
    assert int(out["n"]) == n
    assert out["min"] == v[0] and out["max"] == v[-1]
    assert (out["q1"], out["q2"], out["q3"]) == (q1, q2, q3)
    assert out["lo_whisker"] == v[v >= lo_f].min()
    assert out["hi_whisker"] == v[v <= hi_f].max()
    # the synthetic tail guarantees a real clip on the high side
    assert out["hi_whisker"] < out["max"]


def test_boxplot_empty(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.quantiles import boxplot

    ds = rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype=np.float64)}))
    out = boxplot(ds, "x").iloc[0]
    assert int(out["n"]) == 0 and np.isnan(out["q2"])

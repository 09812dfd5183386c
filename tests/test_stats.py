"""Exact grouped moments (variance / Pearson corr) vs big-int references."""

import math

import numpy as np
import pandas as pd


def _mk(n=5000, seed=3, big=False):
    rng = np.random.RandomState(seed)
    hi = (1 << 24) - 7 if big else 10_000
    x = rng.randint(1, 51, n).astype(np.float64)
    y = (rng.randint(0, hi, n) / 100.0) + 0.25 * x  # correlated
    k = rng.choice(list("ABC"), n)
    return pd.DataFrame({"k": k, "x": x, "y": y})


def _exact_var_e6(vals, scale):
    q = [int(math.floor(v * scale + 0.5)) for v in vals]
    n, sx, sxx = len(q), sum(q), sum(v * v for v in q)
    mean = float(sx) / float(n) / float(scale)
    var = float(n * sxx - sx * sx) / float(n * n) / float(scale * scale)
    return (math.floor(mean * 1e6 + 0.5), math.floor(var * 1e6 + 0.5),
            math.floor(math.sqrt(var) * 1e6 + 0.5))


def _exact_corr_e6(xs, ys, xsc, ysc):
    xq = [int(math.floor(v * xsc + 0.5)) for v in xs]
    yq = [int(math.floor(v * ysc + 0.5)) for v in ys]
    n = len(xq)
    sx, sy = sum(xq), sum(yq)
    sxx = sum(v * v for v in xq)
    syy = sum(v * v for v in yq)
    sxy = sum(a * b for a, b in zip(xq, yq))
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    if dx <= 0 or dy <= 0:
        return 0
    r = float(n * sxy - sx * sy) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
    return math.floor(r * 1e6 + 0.5)


def test_grouped_variance_exact_any_partitioning(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_variance

    df = _mk(big=True)  # y*100 near 2**24: f64 sum-of-squares would drift
    outs = []
    for parts in (1, 9):
        got = grouped_variance(
            rd.from_pandas(df.sample(frac=1, random_state=parts)
                           ).repartition(parts),
            "k", "y", scale=100, out_prefix="y",
        ).sort_values("k").reset_index(drop=True)
        outs.append(got)
    # order-free integer sums: bit-identical across partitionings
    pd.testing.assert_frame_equal(outs[0], outs[1])
    for _, row in outs[0].iterrows():
        vals = df.loc[df["k"] == row["k"], "y"]
        m, v, s = _exact_var_e6(vals.tolist(), 100)
        assert (row["y_mean_e6"], row["y_var_e6"], row["y_std_e6"]) == (m, v, s)
        assert row["n_rows"] == len(vals)


def test_grouped_corr_exact_and_matches_numpy(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_corr

    df = _mk()
    got = grouped_corr(rd.from_pandas(df).repartition(5), "k", "x", "y",
                       x_scale=1, y_scale=100
                       ).sort_values("k").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["k"] == row["k"]]
        want = _exact_corr_e6(sub["x"].tolist(), sub["y"].tolist(), 1, 100)
        assert row["corr_e6"] == want
        # sanity vs numpy's float corr on the quantized values
        np_r = np.corrcoef(np.floor(sub["x"] + 0.5),
                           np.floor(sub["y"] * 100 + 0.5))[0, 1]
        assert abs(row["corr_e6"] / 1e6 - np_r) < 1e-4


def test_grouped_corr_constant_column_is_zero(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_corr

    df = pd.DataFrame({"k": ["A"] * 10, "x": [3.0] * 10,
                       "y": np.arange(10, dtype=np.float64)})
    got = grouped_corr(rd.from_pandas(df), "k", "x", "y")
    assert got["corr_e6"].tolist() == [0]


def test_value_histogram_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.stats import value_histogram

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"v": rng.uniform(-100, 100, 3000)})
    got = (value_histogram(rd.from_pandas(df).repartition(5), "v", 7.5)
           .to_pandas().astype(np.int64).sort_values("bin_idx")
           .reset_index(drop=True))
    idx = np.floor(df["v"].to_numpy() / 7.5).astype(np.int64)
    want = pd.Series(idx).value_counts().sort_index()
    assert list(got["bin_idx"]) == list(want.index)
    assert list(got["n_rows"]) == list(want.to_numpy())
    assert int(got["n_rows"].sum()) == len(df)
    # negative bins floor toward -inf, boundaries e6-stable
    assert (got["bin_idx"] < 0).any()
    lo = np.floor(got["bin_idx"].to_numpy(np.float64) * 7.5 * 1e6 + 0.5)
    assert list(got["bin_lo_e6"]) == list(lo.astype(np.int64))


def test_grouped_zscore_matches_closed_form(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_zscore

    rng = np.random.RandomState(9)
    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["a", "b", "c"], n),
        "x": np.round(rng.normal(50, 20, n), 2),
    })
    got = (grouped_zscore(rd.from_pandas(df).repartition(6), "g", "x",
                          id_cols=["id"], scale=100)
           .to_pandas().sort_values("id").reset_index(drop=True))
    xq = np.floor(df["x"].to_numpy() * 100 + 0.5).astype(np.int64)
    want = np.zeros(n, dtype=np.int64)
    for g in "abc":
        m = (df["g"] == g).to_numpy()
        ni, sx, sxx = int(m.sum()), int(xq[m].sum()), int((xq[m].astype(object) ** 2).sum())
        den = float(ni * sxx - sx * sx) ** 0.5
        z = (ni * xq[m] - sx).astype(np.float64) / den
        want[m] = np.floor(z * 1e6 + 0.5).astype(np.int64)
    assert list(got["z_e6"]) == list(want)


def test_grouped_zscore_zero_variance_and_layout(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_zscore

    df = pd.DataFrame({
        "id": np.arange(8, dtype=np.int64),
        "g": ["c"] * 4 + ["v"] * 4,
        "x": [5.0] * 4 + [1.0, 2.0, 3.0, 4.0],
    })
    a = (grouped_zscore(rd.from_pandas(df).repartition(2), "g", "x",
                        id_cols=["id"]).to_pandas()
         .sort_values("id").reset_index(drop=True))
    b = (grouped_zscore(rd.from_pandas(df).repartition(7), "g", "x",
                        id_cols=["id"]).to_pandas()
         .sort_values("id").reset_index(drop=True))
    assert (a["z_e6"][:4] == 0).all()  # zero-variance group emits 0
    assert a.equals(b)  # layout-invariant


def test_matrix_stats_matches_pandas(ray_session):
    import math

    import ray.data as rd

    from horus_ner_ray.stages.stats import matrix_stats

    rng = np.random.RandomState(4)
    n = 5000
    df = pd.DataFrame({
        "a": rng.randint(0, 50, n).astype(np.float64),
        "b": np.round(rng.randn(n) * 10 + 100, 2),
        "c": np.round(rng.rand(n), 2),
    })
    got = matrix_stats(rd.from_pandas(df).repartition(7),
                       ["a", "b", "c"], [1, 100, 100])
    qs = {"a": np.floor(df["a"] * 1 + 0.5).astype(np.int64),
          "b": np.floor(df["b"] * 100 + 0.5).astype(np.int64),
          "c": np.floor(df["c"] * 100 + 0.5).astype(np.int64)}
    sc = {"a": 1.0, "b": 100.0, "c": 100.0}
    for r in got.itertuples():
        x, y = qs[r.col_x].astype(object), qs[r.col_y].astype(object)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        num = n * sxy - sx * sy
        cov = float(num) / float(n * n) / (sc[r.col_x] * sc[r.col_y])
        assert r.n_rows == n
        assert r.cov_e6 == math.floor(cov * 1e6 + 0.5)
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        want_corr = math.floor(
            float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
            * 1e6 + 0.5)
        assert r.corr_e6 == want_corr
        assert r.mean_x_e6 == math.floor(
            float(sx) / n / sc[r.col_x] * 1e6 + 0.5)
    # diagonal corr is exactly 1
    diag = got[got.col_x == got.col_y]
    assert (diag.corr_e6 == 1_000_000).all()


def test_matrix_stats_constant_column_zero_corr(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.stats import matrix_stats

    df = pd.DataFrame({"a": np.ones(100), "b": np.arange(100, dtype=float)})
    got = matrix_stats(rd.from_pandas(df), ["a", "b"], [1, 1])
    ab = got[(got.col_x == "a") & (got.col_y == "b")].iloc[0]
    assert ab.corr_e6 == 0 and ab.cov_e6 == 0


def test_grouped_skew_kurt_matches_reference(ray_session):
    import math

    import ray.data as rd

    from horus_ner_ray.stages.stats import grouped_skew_kurt

    rng = np.random.RandomState(3)
    n = 6000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "x": np.round(rng.gamma(2.0, 5.0, n), 2),  # skewed by design
    })
    got = grouped_skew_kurt(rd.from_pandas(df).repartition(7), "k", "x",
                            scale=100)
    for r in got.itertuples():
        xq = np.floor(df.loc[df.k == r.k, "x"].to_numpy() * 100
                      + 0.5).astype(object)
        nn = len(xq)
        s1, s2 = int(xq.sum()), int((xq * xq).sum())
        s3 = int((xq * xq * xq).sum())
        s4 = int(((xq * xq) * (xq * xq)).sum())
        num2 = nn * s2 - s1 * s1
        num3 = nn * nn * s3 - 3 * nn * s1 * s2 + 2 * s1 ** 3
        num4 = (nn ** 3 * s4 - 4 * nn * nn * s1 * s3
                + 6 * nn * s1 * s1 * s2 - 3 * s1 ** 4)
        m2 = float(num2) / float(nn * nn)
        m3 = float(num3) / float(nn ** 3)
        m4 = float(num4) / float(nn ** 4)
        assert r.n_rows == nn
        assert r.skew_e6 == math.floor(m3 / m2 ** 1.5 * 1e6 + 0.5)
        assert r.kurt_e6 == math.floor((m4 / (m2 * m2) - 3.0) * 1e6 + 0.5)
        assert r.skew_e6 > 0  # gamma(2) is right-skewed
    # constant column -> zeros, bound violation raises
    cst = pd.DataFrame({"k": ["z"] * 50, "x": np.ones(50)})
    g = grouped_skew_kurt(rd.from_pandas(cst), "k", "x")
    assert int(g["skew_e6"].iloc[0]) == 0 and int(g["kurt_e6"].iloc[0]) == 0
    import pytest

    big = pd.DataFrame({"k": ["z"], "x": [40000.0]})
    with pytest.raises(Exception, match="bound"):
        grouped_skew_kurt(rd.from_pandas(big), "k", "x").to_string()


def test_profile_columns(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.stats import profile_columns

    df = pd.DataFrame({
        "a": [1, 2, 2, None, 4] * 20,
        "b": ["x", "y", "x", "x", None] * 20,
    })
    got = profile_columns(rd.from_pandas(df).repartition(4), ["a", "b"])
    ga = got[got.column == "a"].iloc[0]
    gb = got[got.column == "b"].iloc[0]
    assert ga.n_rows == 100 and ga.n_null == 20 and ga.n_distinct == 3
    assert gb.n_rows == 100 and gb.n_null == 20 and gb.n_distinct == 2
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(rd.from_pandas(df), [])


def test_trending_terms_matches_pandas(ray_session):
    import re

    import ray.data as rd

    from horus_ner_ray.stages.termstats import trending_terms

    rng = np.random.RandomState(5)
    iv = 3_600_000_000
    base = np.int64(1_700_000_000_000_000)
    rows = []
    for i in range(800):
        b = int(rng.randint(0, 6))
        # 'spike' floods bucket 3 only
        words = ["alpha", "beta", "gamma"]
        if b == 3:
            words += ["spike"] * 3
        rows.append((base + b * iv + int(rng.randint(0, iv)),
                     " ".join(rng.choice(words, 4))))
    df = pd.DataFrame(rows, columns=["ts", "text"])
    got = (trending_terms(rd.from_pandas(df).repartition(5), iv,
                          min_count=5, top_k=3)
           .to_pandas().sort_values(["bucket", "rank"])
           .reset_index(drop=True))
    # pandas reference
    tok = re.compile(r"[a-z0-9]+")
    cnt = {}
    for ts, tx in rows:
        b = ts // iv
        for t in tok.findall(tx.lower()):
            cnt[(b, t)] = cnt.get((b, t), 0) + 1
    ref = []
    for (b, t), n in cnt.items():
        if n < 5:
            continue
        prev = cnt.get((b - 1, t), 0)
        ref.append((b, t, n, prev, n - prev))
    want = {}
    for b in {r[0] for r in ref}:
        rs = sorted([r for r in ref if r[0] == b],
                    key=lambda r: (-r[4], r[1]))[:3]
        for rk, r in enumerate(rs, 1):
            want[(b, rk)] = r[1:]
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.bucket, r.rank)] == (r.term, r.n, r.prev_n,
                                            r.delta)
    # the injected spike tops its bucket
    spike_bucket = int(base // iv) + 3
    top = got[(got.bucket == spike_bucket) & (got["rank"] == 1)]
    assert top.iloc[0]["term"] == "spike" and top.iloc[0]["prev_n"] == 0


def test_welch_ttest_matches_textbook(ray_session):
    """t and df equal the closed-form Welch computation on raw arrays;
    result invariant to partitioning; same-distribution sanity."""
    import math

    import ray.data as rd

    from horus_ner_ray.stages.stats import welch_ttest

    rng = np.random.RandomState(5)
    a = np.round(rng.normal(100, 10, 700), 2)
    b = np.round(rng.normal(103, 25, 450), 2)
    df = pd.DataFrame({"k": ["a"] * len(a) + ["b"] * len(b),
                       "x": np.r_[a, b]})
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        r = welch_ttest(ds, "k", "x", "a", "b", scale=100)
        qa = np.floor(a * 100 + 0.5).astype(np.int64)
        qb = np.floor(b * 100 + 0.5).astype(np.int64)
        na, nb = len(qa), len(qb)
        va = qa.var(ddof=1) / na / 1e4
        vb = qb.var(ddof=1) / nb / 1e4
        md = qa.mean() / 100 - qb.mean() / 100
        t_ref = md / math.sqrt(va + vb)
        df_ref = (va + vb) ** 2 / (va**2 / (na - 1) + vb**2 / (nb - 1))
        assert r["n_a"] == na and r["n_b"] == nb
        assert abs(r["t"] - t_ref) < 1e-9
        assert abs(r["df"] - df_ref) < 1e-6 * df_ref


def test_welch_ttest_guards(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from horus_ner_ray.stages.stats import welch_ttest

    ds = rd.from_pandas(pd.DataFrame({"k": ["a", "a", "b"],
                                      "x": [1.0, 2.0, 3.0]}))
    with _pytest.raises(ValueError):
        welch_ttest(ds, "k", "x", "a", "b")  # n_b < 2
    with _pytest.raises(ValueError):
        welch_ttest(ds, "k", "x", "a", "zz")

"""Group-wise top-k / stratified sampling vs pandas references."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def frame():
    rng = np.random.RandomState(9)
    return pd.DataFrame({
        "k": rng.randint(0, 40, 2000),
        "score": rng.rand(2000).round(3),  # rounded -> real boundary ties
        "rid": np.arange(2000),
    })


def _want_topk(df, k):
    d = df.sort_values(["score", "rid"], ascending=[False, True], kind="stable")
    return (d[d.groupby("k", sort=False).cumcount() < k]
            .sort_values("rid").reset_index(drop=True))


@pytest.mark.parametrize("n_buckets,n_blocks", [(1, 1), (7, 5), (64, 13)])
def test_topk_per_group_layouts(ray_session, frame, n_buckets, n_blocks):
    """Same result at any bucket count and block split (combiner
    pre-reduction must be invisible)."""
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import topk_per_group

    ds = rd.from_pandas(frame).repartition(n_blocks)
    got = (
        topk_per_group(ds, key="k", sort_cols=["score", "rid"],
                       ascending=[False, True], k=4, n_buckets=n_buckets)
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "score", "rid"]], _want_topk(frame, 4))


def test_topk_k_larger_than_groups(ray_session, frame):
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import topk_per_group

    got = topk_per_group(rd.from_pandas(frame), key="k",
                         sort_cols=["score", "rid"], ascending=[False, True],
                         k=10_000, n_buckets=8).to_pandas()
    assert len(got) == len(frame)  # everything kept


def test_stratified_sample_deterministic(ray_session, frame):
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import (
        SAMPLE_HASH_MOD,
        SAMPLE_HASH_MULT,
        stratified_sample,
    )

    df = frame.rename(columns={"rid": "doc_id"})
    got = (
        stratified_sample(rd.from_pandas(df), key="k", id_col="doc_id",
                          n_per_group=3, n_buckets=16)
        .to_pandas().sort_values(["k", "doc_id"]).reset_index(drop=True)
    )
    d = df.copy()
    d["__h"] = (d["doc_id"].to_numpy(np.int64) * SAMPLE_HASH_MULT) % SAMPLE_HASH_MOD
    d = d.sort_values(["__h", "doc_id"], kind="stable")
    want = (d[d.groupby("k", sort=False).cumcount() < 3]
            .drop(columns="__h")
            .sort_values(["k", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # shuffled input -> identical sample (order independence)
    got2 = (
        stratified_sample(rd.from_pandas(df.sample(frac=1, random_state=1)),
                          key="k", id_col="doc_id", n_per_group=3, n_buckets=5)
        .to_pandas().sort_values(["k", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2[want.columns.tolist()], want)


def test_stratified_sample_rejects_overflowing_ids(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import stratified_sample

    df = pd.DataFrame({"k": [1], "doc_id": [2**33]})  # > SAMPLE_ID_MAX ~3.47e9
    with pytest.raises(Exception, match="stays\\s+inside int64|stays"):
        stratified_sample(rd.from_pandas(df), key="k", id_col="doc_id",
                          n_per_group=1).to_pandas()


def test_pivot_counts_matches_pandas(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import pivot_counts_dataset

    rng = np.random.RandomState(4)
    df = pd.DataFrame({
        "u": rng.randint(0, 50, 3000),
        "t": rng.choice(["a", "b", "c", "d"], 3000),
    })
    got = (pivot_counts_dataset(rd.from_pandas(df).repartition(6), "u", "t",
                                ["a", "b", "c", "d"])
           .to_pandas().sort_values("u").reset_index(drop=True))
    want = (pd.crosstab(df["u"], df["t"]).reindex(columns=list("abcd"),
                                                  fill_value=0)
            .reset_index().rename(columns={c: f"n_{c}" for c in "abcd"}))
    want.columns.name = None
    for c in "abcd":
        assert list(got[f"n_{c}"]) == list(want[f"n_{c}"]), c
    assert list(got["u"]) == list(want["u"])


def test_pivot_counts_ignores_out_of_domain(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import pivot_counts_dataset

    df = pd.DataFrame({"u": [1, 1, 2], "t": ["a", "zz", "a"]})
    got = (pivot_counts_dataset(rd.from_pandas(df), "u", "t", ["a", "b"])
           .to_pandas().sort_values("u").reset_index(drop=True))
    assert list(got["n_a"]) == [1, 1]
    assert list(got["n_b"]) == [0, 0]


def test_rollup_sums_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import rollup_sums

    rng = np.random.default_rng(6)
    n = 2000
    df = pd.DataFrame({
        "a": rng.choice(list("XYZ"), n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(0, 10_000, n).astype(np.float64) / 100.0,
    })
    got = (rollup_sums(rd.from_pandas(df).repartition(7), ["a", "b"], "v",
                       value_scale=100)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT coalesce(a, 'ALL') AS a, coalesce(b, 'ALL') AS b,
               count(*)::BIGINT AS n_rows,
               CAST(sum(CAST(FLOOR(v * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_e2
        FROM t GROUP BY ROLLUP(a, b) ORDER BY a, b
    """).df().reset_index(drop=True)
    want["n_rows"] = want["n_rows"].astype(np.int64)
    want["sum_e2"] = want["sum_e2"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_grouped_count_distinct_and_mode(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import (
        grouped_count_distinct,
        grouped_mode,
    )

    rng = np.random.RandomState(3)
    n = 5000
    df = pd.DataFrame({
        "g": rng.randint(0, 7, n).astype(np.int64),
        "v": rng.randint(0, 40, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(8)

    got = (grouped_count_distinct(ds, "g", "v").to_pandas()
           .sort_values("g").reset_index(drop=True))
    want = (df.groupby("g")["v"].nunique().rename("n_distinct")
            .reset_index().astype(np.int64))
    assert got.astype(np.int64).equals(want)

    gm = (grouped_mode(ds, "g", "v").to_pandas()
          .sort_values("g").reset_index(drop=True))
    wm = (df.groupby(["g", "v"]).size().rename("n").reset_index()
          .sort_values(["g", "n", "v"], ascending=[True, False, True],
                       kind="stable")
          .drop_duplicates("g").reset_index(drop=True))
    assert list(gm["g"]) == list(wm["g"])
    assert list(gm["v"]) == list(wm["v"])
    assert list(gm["n"].astype(int)) == list(wm["n"].astype(int))


def test_cube_sums_matches_pandas(ray_session):
    """Every one of the 2^n CUBE levels equals the pandas reference, for
    2 and 3 grouping columns."""
    import itertools

    import ray.data as rd

    from horus_ner_ray.stages.groupwise import cube_sums

    rng = np.random.RandomState(5)
    n = 4000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "c": rng.choice(["m", "n"], n),
        "v": rng.rand(n) * 100,
    })

    for cols in (["a", "b"], ["a", "b", "c"]):
        got = (cube_sums(rd.from_pandas(df).repartition(7), cols, "v",
                         value_scale=100)
               .to_pandas().sort_values(cols).reset_index(drop=True))
        assert len(got) == sum(
            df.groupby(list(sub)).ngroups if sub else 1
            for r in range(len(cols) + 1)
            for sub in itertools.combinations(cols, r))
        cents = np.floor(df["v"].to_numpy() * 100 + 0.5).astype(np.int64)
        ref = df.assign(_c=cents)
        rows = []
        for r in range(len(cols) + 1):
            for sub in itertools.combinations(cols, r):
                if sub:
                    g = ref.groupby(list(sub))["_c"].agg(["count", "sum"])
                    for key, (cnt, s) in g.iterrows():
                        key = (key,) if len(sub) == 1 else key
                        full = {c: "ALL" for c in cols}
                        full.update(dict(zip(sub, key)))
                        rows.append({**full, "n_rows": cnt, "sum_e2": s})
                else:
                    rows.append({**{c: "ALL" for c in cols},
                                 "n_rows": len(ref), "sum_e2": cents.sum()})
        want = (pd.DataFrame(rows).sort_values(cols)
                .reset_index(drop=True)[got.columns])
        pd.testing.assert_frame_equal(
            got.astype({"n_rows": np.int64, "sum_e2": np.int64}),
            want.astype({"n_rows": np.int64, "sum_e2": np.int64}))


def test_composite_paging_matches_pandas(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import composite_page

    rng = np.random.RandomState(8)
    n = 3000
    df = pd.DataFrame({
        "u": rng.randint(0, 40, n).astype(np.int64),
        "t": rng.choice(["click", "view", "buy"], n),
        "v": np.round(rng.rand(n) * 10, 3),
    })
    ref = df.assign(s=np.floor(df["v"] * 1e6 + 0.5).astype(np.int64),
                    one=1)
    ref = (ref.groupby(["u", "t"], as_index=False)
           .agg(n_rows=("one", "sum"), sum_e6=("s", "sum"))
           .sort_values(["u", "t"]).reset_index(drop=True))
    ds = rd.from_pandas(df).repartition(6)
    # walk ALL pages and compare the concatenation to the full aggregate
    pages, after = [], None
    while True:
        p = composite_page(ds, ["u", "t"], "v", page_size=7, after=after)
        if len(p) == 0:
            break
        pages.append(p)
        after = tuple(p.iloc[-1][["u", "t"]])
        if len(p) < 7:
            break
    got = pd.concat(pages, ignore_index=True)
    assert len(got) == len(ref)
    assert (got["u"].to_numpy() == ref["u"].to_numpy()).all()
    assert (got["t"].to_numpy() == ref["t"].to_numpy()).all()
    assert (got["n_rows"].to_numpy() == ref["n_rows"].to_numpy()).all()
    assert (got["sum_e6"].to_numpy() == ref["sum_e6"].to_numpy()).all()


def test_composite_page_validation(ray_session):
    import pytest
    import ray.data as rd

    from horus_ner_ray.stages.groupwise import composite_page

    ds = rd.from_pandas(pd.DataFrame({"u": [1], "t": ["a"], "v": [1.0]}))
    with pytest.raises(ValueError, match="page_size"):
        composite_page(ds, ["u", "t"], "v", page_size=0)
    with pytest.raises(ValueError, match="cursor"):
        composite_page(ds, ["u", "t"], "v", page_size=5, after=(1,))

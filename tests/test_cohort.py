"""Cohort retention vs a single-process pandas reference."""

import numpy as np
import pandas as pd


def _ref(df):
    d = df.copy()
    day = d["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    monday = day - ((day + 3) % 7)
    d["w"] = monday * 86_400_000_000
    first = d.groupby("user_id")["w"].min()
    d["cw"] = d["user_id"].map(first)
    d["off"] = (d["w"] - d["cw"]) // (7 * 86_400_000_000)
    u = d[["user_id", "cw", "off"]].drop_duplicates()
    out = (u.groupby(["cw", "off"]).size().reset_index(name="n")
           .sort_values(["cw", "off"]).reset_index(drop=True))
    return list(map(tuple, out.itertuples(index=False)))


def test_cohort_retention_matches_reference(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.cohort import cohort_retention

    rng = np.random.RandomState(8)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 120, n).astype(np.int64),
        "ts": (np.datetime64("2025-01-06T00:00:00", "us")  # a Monday
               + (rng.randint(0, 70, n) * 86_400_000_000
                  + rng.randint(0, 86_400_000_000, n)).astype("timedelta64[us]")),
    })
    got = (cohort_retention(rd.from_pandas(df).repartition(6), n_buckets=16)
           .to_pandas().astype(np.int64)
           .sort_values(["cohort_week_us", "week_offset"])
           .reset_index(drop=True))
    want = _ref(df)
    assert list(map(tuple, got.itertuples(index=False))) == want
    # offset-0 rows are the cohort sizes and cover every cohort
    z = got[got["week_offset"] == 0]
    assert set(z["cohort_week_us"]) == set(got["cohort_week_us"])


def test_week_start_us_iso_monday():
    from horus_ner_ray.stages.cohort import week_start_us

    # 2025-01-06 is a Monday; any us within that week truncates to it
    mon = np.datetime64("2025-01-06", "us").astype(np.int64)
    for d in range(7):
        t = mon + d * 86_400_000_000 + 123_456
        assert week_start_us(np.array([t]))[0] == mon
    # epoch day 0 (Thursday 1970-01-01) truncates to Monday 1969-12-29
    assert week_start_us(np.array([0], dtype=np.int64))[0] == -3 * 86_400_000_000

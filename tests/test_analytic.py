"""Analytic (OVER-clause) window functions vs a pandas reference."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _reference(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["v"] = np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    g = df.groupby("user_id", sort=False)
    out = pd.DataFrame(
        {
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "rn": g.cumcount().to_numpy() + 1,
            "prev_value_e6": g["v"].shift(1).fillna(-1).to_numpy(dtype=np.int64),
            "running_value_e6": g["v"].cumsum().to_numpy(),
            "value_rank": g["v"].rank(method="min", ascending=False)
            .to_numpy(dtype=np.int64),
            "value_dense_rank": g["v"].rank(method="dense", ascending=False)
            .to_numpy(dtype=np.int64),
        }
    )
    return out.sort_values("event_id").reset_index(drop=True)


def _run(df: pd.DataFrame, n_buckets: int = 8) -> pd.DataFrame:
    import ray.data as rd

    from horus_ner_ray.stages.analytic import window_functions_dataset

    out = window_functions_dataset(
        rd.from_pandas(df), n_buckets=n_buckets
    ).to_pandas()
    cols = ["event_id", "user_id", "rn", "prev_value_e6",
            "running_value_e6", "value_rank", "value_dense_rank"]
    return out[cols].astype(np.int64).sort_values("event_id").reset_index(drop=True)


def test_window_functions_match_pandas_reference(ray_session):
    rng = np.random.default_rng(7)
    n = 2000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 37, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10_000, n), unit="s"
            ),  # deliberate ts collisions -> event_id tiebreak
            # quantized values force rank ties
            "value": rng.integers(0, 25, n).astype(np.float64) / 4.0,
        }
    )
    pd.testing.assert_frame_equal(_run(df), _reference(df))


def test_window_functions_edge_partitions(ray_session):
    """Single-row partitions, one-user corpus, and negative values."""
    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "user_id": np.array([1, 2, 3, 3, 3, 4], dtype=np.int64),
            "ts": pd.to_datetime([5, 4, 3, 3, 1, 0], unit="s"),
            "value": np.array([-1.5, 0.0, 2.25, 2.25, -2.25, 9.0]),
        }
    )
    got = _run(df, n_buckets=2)
    pd.testing.assert_frame_equal(got, _reference(df))
    # user 3 ordered by ts: event 4 (v=-2.25e6) first, then 2,3 tied at rank 1
    u3 = got[got.user_id == 3].set_index("event_id")
    assert u3.loc[4, "rn"] == 1 and u3.loc[4, "prev_value_e6"] == -1
    assert u3.loc[2, "value_rank"] == 1 and u3.loc[3, "value_rank"] == 1
    assert u3.loc[4, "value_rank"] == 3 and u3.loc[4, "value_dense_rank"] == 2


def _dd_ranking(df, n=4):
    import duckdb

    con = duckdb.connect()
    con.register("ev", df)
    return con.execute("""
        WITH e AS (SELECT event_id, user_id, ts,
                          CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS v
                   FROM ev)
        SELECT event_id, user_id,
               ntile(?) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS tile,
               CAST(FLOOR(percent_rank() OVER
                      (PARTITION BY user_id ORDER BY v DESC) * 1e6 + 0.5)
                    AS BIGINT) AS prank_e6,
               CAST(FLOOR(cume_dist() OVER
                      (PARTITION BY user_id ORDER BY v DESC) * 1e6 + 0.5)
                    AS BIGINT) AS cume_e6
        FROM e ORDER BY event_id
    """, [n]).df().astype(np.int64)


def test_extended_ranking_matches_duckdb(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.analytic import window_functions_dataset

    rng = np.random.default_rng(8)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 23, n).astype(np.int64),  # ragged tiles
        "ts": pd.to_datetime(rng.integers(0, 5000, n), unit="s"),
        "value": rng.integers(0, 12, n).astype(np.float64) / 4.0,  # ties
    })
    got = (window_functions_dataset(rd.from_pandas(df).repartition(5),
                                    extended=True, n_buckets=8)
           .to_pandas()[["event_id", "user_id", "tile", "prank_e6",
                         "cume_e6"]]
           .astype(np.int64).sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, _dd_ranking(df))


def test_global_rank_by(ray_session):
    """Distributed global ORDER BY + rank: equals the driver-side sort
    at every block count, including heavy ties and empty buckets."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.analytic import global_rank_by

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "score": rng.integers(0, 9, 500).astype(np.int64),  # heavy ties
        "doc_id": rng.permutation(500).astype(np.int64),
    })
    for blocks in (1, 7):
        out = (global_rank_by(rd.from_pandas(df).repartition(blocks),
                              ["score"], "doc_id", n_buckets=16)
               .to_pandas().sort_values("rank").reset_index(drop=True))
        want = df.sort_values(["score", "doc_id"]).reset_index(drop=True)
        assert list(out["doc_id"]) == list(want["doc_id"])
        assert list(out["rank"]) == list(range(1, len(df) + 1))
    # explicit bounds route identically
    out2 = (global_rank_by(rd.from_pandas(df), ["score"], "doc_id",
                           n_buckets=16, bounds=[0, 9])
            .to_pandas().sort_values("rank").reset_index(drop=True))
    assert list(out2["doc_id"]) == list(
        df.sort_values(["score", "doc_id"])["doc_id"])

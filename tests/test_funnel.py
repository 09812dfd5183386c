"""Funnel sequence matching: hand-built chains, ties, and a random fixture
vs a single-process reference."""

import numpy as np
import pandas as pd


def _ref_funnel(df, steps):
    counts = []
    cur = {}
    for r in (df[df.event_type == steps[0]]
              .sort_values(["ts", "event_id"]).itertuples()):
        cur.setdefault(r.user_id, (r.ts, r.event_id))
    counts.append(len(cur))
    for step in steps[1:]:
        nxt = {}
        for r in (df[df.event_type == step]
                  .sort_values(["ts", "event_id"]).itertuples()):
            if r.user_id in cur and r.user_id not in nxt:
                t0, i0 = cur[r.user_id]
                if (r.ts, r.event_id) > (t0, i0):
                    nxt[r.user_id] = (r.ts, r.event_id)
        cur = nxt
        counts.append(len(cur))
    return counts


def _run(df, steps, **kw):
    import ray.data as rd

    from horus_ner_ray.stages.funnel import funnel_counts

    got = (funnel_counts(rd.from_pandas(df).repartition(4), steps, **kw)
           .to_pandas().sort_values("step_idx"))
    return got["n_users"].tolist()


def test_funnel_hand_cases(ray_session):
    rows = [
        # user 1: full chain
        (1, "view", 10, 1), (1, "click", 20, 2), (1, "purchase", 30, 3),
        # user 2: purchase BEFORE click -> reaches click, fails purchase
        (2, "view", 10, 4), (2, "purchase", 15, 5), (2, "click", 20, 6),
        # user 3: click/view ts tie, click's event_id greater -> counts
        (3, "view", 50, 7), (3, "click", 50, 8),
        # user 4: click at SAME (ts,id-order) but id smaller -> not after
        (4, "click", 60, 9), (4, "view", 60, 10),
        # user 5: never views
        (5, "click", 5, 11), (5, "purchase", 6, 12),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts",
                                     "event_id"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    steps = ["view", "click", "purchase"]
    assert _run(df, steps, n_buckets=4) == [4, 3, 1]
    assert _ref_funnel(df, steps) == [4, 3, 1]


def test_funnel_random_matches_reference(ray_session):
    rng = np.random.RandomState(17)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 120, n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "purchase", "error"], n),
        "ts": pd.to_datetime(rng.randint(0, 500, n), unit="s"),  # many ties
        "event_id": np.arange(n, dtype=np.int64),
    })
    steps = ["view", "click", "purchase"]
    assert _run(df, steps, n_buckets=16) == _ref_funnel(df, steps)


def test_funnel_native_ns_resolution(ray_session):
    """Sub-microsecond timestamps must keep their order (the former us
    truncation tied events the oracle orders): two users, one converts
    only if ns precision survives, the other only if it does NOT."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.funnel import funnel_counts

    base = np.datetime64("2025-01-01T00:00:00.000000000", "ns")
    rows = [
        # user 1: view at t+100ns, click at t+200ns -> strictly after (ns)
        (1, "view", base + np.timedelta64(100, "ns"), 0),
        (1, "click", base + np.timedelta64(200, "ns"), 1),
        # user 2: click BEFORE view at ns resolution, same microsecond;
        # with us truncation they tie and event_id would order them
        # (2 > 1 -> after), wrongly counting a conversion
        (2, "view", base + np.timedelta64(900, "ns"), 1),
        (2, "click", base + np.timedelta64(800, "ns"), 2),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "event_id"])
    out = (funnel_counts(rd.from_pandas(df), ["view", "click"], n_buckets=4)
           .to_pandas().sort_values("step_idx"))
    assert list(out["n_users"]) == [2, 1]


def test_event_paths_and_top_paths(ray_session):
    """Prefix paths match a pandas reference: (ts, id) order, ns ties
    broken by event_id, prefix mask, vectorized join."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.funnel import event_paths, top_paths

    rng = np.random.RandomState(7)
    n = 3000
    base = np.datetime64("2025-01-01", "ns")
    df = pd.DataFrame({
        "user_id": rng.randint(0, 80, n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "buy"], n),
        # coarse ts so ties are common and event_id must break them
        "ts": base + rng.randint(0, 50, n).astype("timedelta64[s]"),
        "event_id": np.arange(n, dtype=np.int64),
    })
    got = (event_paths(rd.from_pandas(df).repartition(6), prefix_len=3,
                       n_buckets=16)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    want = (df.sort_values(["user_id", "ts", "event_id"], kind="stable")
            .groupby("user_id").head(3)
            .groupby("user_id")["event_type"].agg(">".join)
            .rename("path").reset_index())
    assert list(got["user_id"]) == list(want["user_id"])
    assert list(got["path"]) == list(want["path"])

    tp = top_paths(rd.from_pandas(df), k=5, prefix_len=3, n_buckets=16)
    wc = (want.groupby("path").size().rename("n_users").reset_index()
          .sort_values(["n_users", "path"], ascending=[False, True],
                       kind="stable").head(5).reset_index(drop=True))
    assert list(tp["path"]) == list(wc["path"])
    assert list(tp["n_users"].astype(int)) == list(wc["n_users"].astype(int))


def test_conversion_delays_matches_pandas(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.funnel import conversion_delays

    rng = np.random.RandomState(12)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 80, n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "buy"], n,
                                 p=[0.5, 0.3, 0.2]),
        "ts": pd.to_datetime("2025-01-01")
        + pd.to_timedelta(rng.randint(0, 10**7, n), unit="us"),
    })
    got = (conversion_delays(rd.from_pandas(df).repartition(6),
                             "click", "buy")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # reference: plain pandas per-user scan
    want = {}
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        a = g[g.event_type == "click"]
        if not len(a):
            continue
        ta, ia = a.iloc[0]["ts"], a.iloc[0]["event_id"]
        b = g[(g.event_type == "buy")
              & ((g.ts > ta) | ((g.ts == ta) & (g.event_id > ia)))]
        if len(b):
            want[u] = int((b.iloc[0]["ts"] - ta).value // 1000)
    assert dict(zip(got["user_id"], got["delta_us"])) == want
    assert (got["delta_us"] >= 0).all()

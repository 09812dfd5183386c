"""Windowed aggregates over the ``events`` stream table.

Ray Data has no event-time windows (SURVEY.md section 2.9: neither does the
reference — it is strictly batch); stream-shaped workloads are expressed as
an ordered partitioned log: tumbling windows become a combiner map_batches
(one partial row per (key, window) per batch) + a small groupby — the exact
pre-aggregation pattern of stages/termstats.py — and session windows become
``groupby(key).map_groups`` over ts-sorted groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def _scaled_vals(batch: pa.Table, val_col: str, val_scale: int | None):
    """value column for accumulation: raw floats, or (val_scale set)
    round-half-up fixed-point int64 — integer sums are associative, so the
    aggregate is independent of shuffle/batch arrival order (float partial
    sums are not; an order-dependent last bit can flip an e6 publication)."""
    if val_scale is None:
        return batch[val_col]
    v = np.asarray(batch[val_col], dtype=np.float64)
    return pa.array(np.floor(v * float(val_scale) + 0.5).astype(np.int64),
                    pa.int64())


def tumbling_window_dataset(ds, window_s: int = 3600, key_col: str = "user_id",
                            ts_col: str = "ts", val_col: str = "value",
                            val_scale: int | None = None):
    """Dataset(events) -> (user_id, window_start, n_events, sum_value).

    window_start = floor(epoch_us / window) * window, as timestamp[us].
    ``val_scale``: accumulate ``floor(value*scale+0.5)`` int64 instead of
    floats (order-free exact sums; ``sum_value`` comes back scaled).
    """
    from ray.data.aggregate import Sum

    w_us = np.int64(window_s) * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch[ts_col].cast(pa.int64()), dtype=np.int64)
        win = (ts // w_us) * w_us
        t = pa.table(
            {
                key_col: batch[key_col],
                "window_start": pa.array(win, pa.int64()),
                val_col: _scaled_vals(batch, val_col, val_scale),
            }
        )
        g = t.group_by([key_col, "window_start"], use_threads=False).aggregate(
            [([], "count_all"), (val_col, "sum")]
        )
        return pa.table(
            {
                key_col: g[key_col],
                "window_start": g["window_start"],
                "n_events": g["count_all"],
                "sum_value": g[f"{val_col}_sum"],
            }
        )

    parts = ds.select_columns([key_col, ts_col, val_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    )
    agg = parts.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("window_start"),
            "window_start",
            batch["window_start"].cast(pa.timestamp("us")),
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())


def hopping_window_dataset(ds, window_s: int = 3600, hop_s: int = 900,
                           key_col: str = "user_id", ts_col: str = "ts",
                           val_col: str = "value",
                           val_scale: int | None = None):
    """Hopping (sliding) windows: length ``window_s``, advancing every
    ``hop_s`` (must divide it) — every event lands in window_s/hop_s
    overlapping windows.  Same combiner shape as tumbling: the per-batch
    explode-to-(key, window) partial aggregate means the shuffle moves one
    row per (key, window, batch), not one per (event, window)."""
    from ray.data.aggregate import Sum

    if window_s % hop_s:
        raise ValueError("hop_s must divide window_s")
    k = window_s // hop_s
    hop_us = np.int64(hop_s) * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch[ts_col].cast(pa.int64()), dtype=np.int64)
        base = (ts // hop_us) * hop_us
        offs = np.arange(k, dtype=np.int64) * hop_us
        win = np.repeat(base, k) - np.tile(offs, len(ts))
        keys = np.repeat(np.asarray(batch[key_col]), k)
        v1 = _scaled_vals(batch, val_col, val_scale)
        vals = np.repeat(np.asarray(v1), k)
        t = pa.table(
            {
                key_col: pa.array(keys),
                "window_start": pa.array(win, pa.int64()),
                val_col: pa.array(vals,
                                  pa.int64() if val_scale else pa.float64()),
            }
        )
        g = t.group_by([key_col, "window_start"], use_threads=False).aggregate(
            [([], "count_all"), (val_col, "sum")]
        )
        return pa.table(
            {
                key_col: g[key_col],
                "window_start": g["window_start"],
                "n_events": g["count_all"],
                "sum_value": g[f"{val_col}_sum"],
            }
        )

    parts = ds.select_columns([key_col, ts_col, val_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    )
    agg = parts.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("window_start"),
            "window_start",
            batch["window_start"].cast(pa.timestamp("us")),
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())


def propagate_last_dataset(ds, key_col: str = "conv_id", order_col: str = "turn_idx",
                           label_col: str = "tool", out_col: str | None = None,
                           n_buckets: int = 256):
    """Per-group forward propagation: each row gets the most recent
    non-empty ``label_col`` at or before it within its key group under
    ``order_col`` ordering (rows before any label get '').

    Reference analogue: compound-annotation propagation to member tokens
    (reference: horusdemo.py:110-126 — a chunk's label written onto each
    covered token); here the group is a conversation and the label a tool
    invocation.  Same coarse-bucket plan as session windows: hash(key)
    shuffle, ONE sort per bucket, fully vectorized fill (global
    maximum.accumulate of labeled positions, validated against each row's
    segment start — no per-key Python)."""
    out_col = out_col or (label_col + "_ctx")

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col])
        h = pd.util.hash_array(
            keys if keys.dtype != object else keys.astype(object), categorize=False
        )
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="stable")
        keys = g[key_col].to_numpy()
        lab = g[label_col].fillna("").to_numpy(dtype=object)
        n = len(g)
        pos = np.arange(n, dtype=np.int64)
        nonempty = lab != ""
        fidx = np.maximum.accumulate(np.where(nonempty, pos, -1))
        new_key = np.ones(n, dtype=bool)
        if n > 1:
            new_key[1:] = keys[1:] != keys[:-1]
        seg_starts = np.flatnonzero(new_key)
        seg_lens = np.diff(np.append(seg_starts, n))
        seg_of_row = np.repeat(seg_starts, seg_lens)
        valid = fidx >= seg_of_row  # labeled position inside this key's segment
        out = np.where(valid, lab[np.maximum(fidx, 0)], "")
        res = g.drop(columns=["bucket"]).copy()
        res[out_col] = out
        return res

    return (
        ds.select_columns([key_col, order_col, label_col])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
        .groupby("bucket")
        .map_groups(fill, batch_format="pandas", runtime_env=_rte())
    )


def transition_counts_dataset(ds, key_col: str = "conv_id",
                              order_col: str = "turn_idx",
                              label_col: str = "tool",
                              n_buckets: int = 256):
    """Markov transition table over a per-group ordered label channel ->
    Dataset(src, dst, n): within each key group under ``order_col``
    ordering, successive NON-EMPTY labels form a (src, dst) transition;
    counts aggregate corpus-wide.  The tool-usage analytic of an agent-
    transcript pipeline ("which tool follows which"), complementing the
    funnel operator's fixed-sequence matching (stages/funnel.py).

    Shape: the same coarse hash(key) bucket shuffle as the other per-group
    ordered operators (ONE sort per bucket, fully vectorized adjacency),
    with per-bucket pre-combined counts so the global groupby moves
    O(distinct transitions x buckets) rows, never turns."""
    from ray.data.aggregate import Sum

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col])
        h = pd.util.hash_array(
            keys if keys.dtype != object else keys.astype(object),
            categorize=False)
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64),
                               pa.int64()))

    _empty = pd.DataFrame({"src": pd.Series([], dtype=object),
                           "dst": pd.Series([], dtype=object),
                           "n": pd.Series([], dtype=np.int64)})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="stable")
        keys = g[key_col].to_numpy()
        lab = g[label_col].fillna("").to_numpy(dtype=object)
        m = lab != ""
        keys, lab = keys[m], lab[m]
        if len(lab) < 2:
            return _empty
        same = keys[1:] == keys[:-1]
        if not same.any():
            return _empty
        out = (pd.DataFrame({"src": lab[:-1][same], "dst": lab[1:][same]})
               .groupby(["src", "dst"], sort=False).size()
               .reset_index(name="n"))  # pre-combine inside the bucket
        out["n"] = out["n"].astype(np.int64)
        return out

    return (
        ds.select_columns([key_col, order_col, label_col])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas", runtime_env=_rte())
        .groupby(["src", "dst"]).aggregate(Sum("n", alias_name="n"))
    )


def session_windows_dataset(ds, gap_s: int = 1800, key_col: str = "user_id",
                            ts_col: str = "ts", n_buckets: int = 256):
    """Session windows: per key, ts-sorted events split where the gap to the
    previous event exceeds ``gap_s`` -> (key, session_start, session_end,
    n_events).

    Shuffle key is hash(key) % n_buckets — one Python ``map_groups`` call
    per COARSE bucket, not per user (a per-tiny-group call measured ~100x
    slower; same fix as stages/dedupe.py).  Inside a bucket: one sort by
    (key, ts), then a fully vectorized sweep — session boundaries are
    ``user changed OR gap exceeded`` over np.diff, session aggregates read
    straight off the boundary indices.  ``n_buckets`` scales with input
    (dedupe.buckets_for_rows) so a bucket's payload stays bounded; all of
    one user's events land in one bucket by construction."""
    gap = np.int64(gap_s) * 1_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col])
        h = pd.util.hash_array(
            keys if keys.dtype != object else keys.astype(object), categorize=False
        )
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="stable")
        users = g[key_col].to_numpy()
        tsi = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (users[1:] != users[:-1]) | ((tsi[1:] - tsi[:-1]) > gap)
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(g)]
        return pd.DataFrame(
            {
                key_col: users[starts],
                "session_start": tsi[starts].astype("datetime64[us]"),
                "session_end": tsi[ends - 1].astype("datetime64[us]"),
                "n_events": (ends - starts).astype(np.int64),
            }
        )

    return (
        ds.select_columns([key_col, ts_col])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas", runtime_env=_rte())
    )


def collapse_repeats_dataset(ds, key_col: str = "user_id",
                             order_cols: tuple[str, str] = ("ts", "event_id"),
                             val_col: str = "event_type",
                             id_cols: tuple[str, ...] = ("event_id",),
                             n_buckets: int = 256):
    """Per-group consecutive-repeat collapse: within each key group ordered
    by ``order_cols`` (the second column breaks timestamp ties
    deterministically), keep a row only when its ``val_col`` differs from
    the immediately preceding row's — the stream-dedup counterpart of C4's
    cross-doc line dedup (drop stuttered events/turns before counting).

    Same coarse-bucket plan as the other sequential-window stages:
    hash(key) shuffle so one Python call handles many keys, ONE sort per
    bucket, vectorized previous-row compare with segment starts always
    kept — no per-key Python."""

    o1, o2 = order_cols

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col])
        h = pd.util.hash_array(
            keys if keys.dtype != object else keys.astype(object), categorize=False
        )
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, o1, o2], kind="stable")
        keys = g[key_col].to_numpy()
        vals = g[val_col].to_numpy()
        n = len(g)
        keep = np.ones(n, dtype=bool)
        if n > 1:
            keep[1:] = (keys[1:] != keys[:-1]) | (vals[1:] != vals[:-1])
        out_cols = list(dict.fromkeys([*id_cols, key_col, val_col]))
        return g.loc[keep, out_cols]

    return (
        ds.select_columns(list(dict.fromkeys([*id_cols, key_col, o1, o2, val_col])))
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True, runtime_env=_rte())
        .groupby("bucket")
        .map_groups(collapse, batch_format="pandas", runtime_env=_rte())
    )


def conversation_profiles(ds, conv_col: str = "conv_id",
                          role_col: str = "role", text_col: str = "text",
                          tool_col: str = "tool"):
    """Per-conversation profile — the transcript-domain summary table:
    (conv_id, n_turns, user_tokens, assistant_tokens, tool_turns,
    total_tokens).  One combiner scan (per-batch per-conv partials), one
    groupby; token counts under the shared tokenizer rule — all exact
    integers."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from horus_ner_ray.stages.tokenize import token_counts

    def partial(batch: pa.Table) -> pa.Table:
        tc = token_counts(batch[text_col]).astype(np.int64)
        role = np.asarray(batch[role_col], dtype=object)
        tool = np.asarray(batch[tool_col], dtype=object)
        df = pd.DataFrame({
            "conv_id": np.asarray(batch[conv_col], dtype=object),
            "n_turns": np.int64(1),
            "user_tokens": np.where(role == "user", tc, 0),
            "assistant_tokens": np.where(role == "assistant", tc, 0),
            "tool_turns": (tool != "").astype(np.int64),
            "total_tokens": tc,
        })
        g = df.groupby("conv_id", sort=False).sum().reset_index()
        cols = {"conv_id": pa.array(g["conv_id"].to_numpy(object),
                                    pa.string())}
        for c in ("n_turns", "user_tokens", "assistant_tokens",
                  "tool_turns", "total_tokens"):
            cols[c] = pa.array(g[c].to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    aggs = [Sum(c, alias_name=c)
            for c in ("n_turns", "user_tokens", "assistant_tokens",
                      "tool_turns", "total_tokens")]
    return (ds.select_columns([conv_col, role_col, text_col, tool_col])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, runtime_env=_rte())
            .groupby("conv_id").aggregate(*aggs))


def grep_context_dataset(ds, pattern: str, window: int = 1,
                         key_col: str = "conv_id",
                         ord_col: str = "turn_idx",
                         text_col: str = "text",
                         n_buckets: int = 256):
    """Distributed grep with context (the log-investigation primitive:
    ``grep -C`` over conversations): every turn whose text contains
    ``pattern`` (case-sensitive substring), PLUS the turns within
    ``window`` positions of a match in the same conversation, each row
    flagged ``is_match``.

    One coarse hash-bucket shuffle co-locates conversations; per bucket
    one lexsort orders every conversation at once, the match mask comes
    from ``pyarrow.compute.match_substring`` (vectorized, before the
    shuffle would even be needed — but context crosses rows, so the
    neighbor expansion runs on the sorted runs), and the context mask is
    an OR over ±window shifts guarded by run boundaries — no per-row
    Python."""
    import pyarrow.compute as pc

    def bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(batch[key_col]), categorize=False)
        m = pc.match_substring(pc.cast(batch[text_col], pa.string()),
                               pattern)
        return (batch.append_column(
                    "bkt", pa.array((h % np.uint64(n_buckets))
                                    .astype(np.int64), pa.int64()))
                .append_column("m", m))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy(object)
        o = g[ord_col].to_numpy(np.int64)
        order = np.lexsort((o, k))
        g = g.iloc[order]
        k, o = k[order], o[order]
        m = g["m"].to_numpy(bool)
        keep = m.copy()
        # turn_idx is strictly increasing within a conversation, so any
        # row within turn-distance <= window is within row-distance <=
        # window; the guard compares TURN distance, exact under gaps
        for s in range(1, int(window) + 1):
            fwd = np.zeros(len(m), dtype=bool)  # match s rows above
            fwd[s:] = m[:-s] & (k[s:] == k[:-s]) & (o[s:] - o[:-s] <= window)
            bwd = np.zeros(len(m), dtype=bool)  # match s rows below
            bwd[:-s] = m[s:] & (k[:-s] == k[s:]) & (o[s:] - o[:-s] <= window)
            keep |= fwd | bwd
        out = g.loc[keep].drop(columns=["m"]).copy()
        out["is_match"] = m[keep].astype(np.int64)
        return out

    return (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True,
                       runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: per_bucket(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )


def event_gaps_dataset(ds, key_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id", n_buckets: int = 256):
    """Per-key INTER-ARRIVAL GAPS (the latency/cadence primitive behind
    sessionization thresholds and retention models): for each key's
    events in (ts, id) order, the int64-microsecond difference between
    consecutive events — Dataset(key, gap_us), one row per consecutive
    pair.  One coarse hash-bucket shuffle, one lexsort per bucket, one
    vectorized diff guarded by run boundaries."""
    def bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[key_col], dtype=np.int64).astype(np.uint64)
        mix = np.uint64(0x9E3779B97F4A7C15)
        bkt = ((ids * mix) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g[key_col].to_numpy(np.int64)
        tv = g[ts_col].to_numpy()
        t = (tv.view(np.int64) if np.issubdtype(tv.dtype, np.datetime64)
             else tv.astype(np.int64))
        i = g[id_col].to_numpy(np.int64)
        order = np.lexsort((i, t, u))
        us, ts_ = u[order], t[order]
        same = us[1:] == us[:-1]
        gaps = (ts_[1:] - ts_[:-1])[same]
        return pd.DataFrame({key_col: us[1:][same],
                             "gap_us": gaps.astype(np.int64)})

    return (
        ds.select_columns([key_col, ts_col, id_col])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: per_bucket(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )


def adjacent_turn_jaccard(ds, conv_col: str = "conv_id",
                          turn_col: str = "turn_idx",
                          text_col: str = "text",
                          boundary_below_e6: int = 200_000,
                          n_buckets: int = 256):
    """TextTiling-style topic-shift segmentation over conversations:
    for every ADJACENT turn pair (i, i+1) within a conversation, the
    exact integer Jaccard of their distinct token sets (the shared
    ``[a-z0-9]+`` rule) —

        jaccard_e6 = (|A n B| * 10**6) // |A u B|

    — and a boundary flag where it falls below ``boundary_below_e6``
    (low lexical overlap = topic shift; Hearst 1997's block comparison
    at turn granularity).  Empty-union pairs score 0.

    Plan: conv-hash coarse buckets (a conversation's turns co-locate),
    ONE sort per bucket, then a fully relational intersection — explode
    to distinct (conv, turn, term) rows and self-merge on
    (conv, term, turn+1); set sizes come from the same exploded frame.
    No per-pair Python.  Returns (conv, turn, jaccard_e6, boundary)
    where ``turn`` is the EARLIER turn of the pair.
    """
    from horus_ner_ray.stages.tokenize import tokenize_column

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[conv_col])
        h = pd.util.hash_array(
            keys if keys.dtype != object else keys.astype(object),
            categorize=False)
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64),
                               pa.int64()))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as _pa

        g = g.sort_values([conv_col, turn_col],
                          kind="stable").reset_index(drop=True)
        toks = tokenize_column(_pa.array(g[text_col].astype(str)))
        flat = toks.flatten().to_pandas().to_numpy(dtype=object)
        parents = np.repeat(np.arange(len(g)),
                            np.asarray(toks.value_lengths()))
        tt = pd.DataFrame({
            "row": parents,
            conv_col: g[conv_col].to_numpy()[parents],
            "turn": g[turn_col].to_numpy()[parents],
            "term": flat,
        }).drop_duplicates([conv_col, "turn", "term"])
        sizes = tt.groupby([conv_col, "turn"]).size().rename("sz")
        nxt = tt.copy()
        nxt["turn"] = nxt["turn"] - 1
        inter = (tt.merge(nxt, on=[conv_col, "turn", "term"])
                 .groupby([conv_col, "turn"]).size().rename("ix"))
        convs = g[conv_col].to_numpy()
        turns = g[turn_col].to_numpy(np.int64)
        ok = np.zeros(max(len(g) - 1, 0), dtype=bool)
        if len(g) > 1:
            ok = (convs[1:] == convs[:-1]) & (turns[1:] == turns[:-1] + 1)
        if not ok.any():
            return pd.DataFrame({conv_col: pd.Series([], dtype="string"),
                                 "turn": pd.Series([], dtype=np.int64),
                                 "jaccard_e6": pd.Series([], dtype=np.int64),
                                 "boundary": pd.Series([], dtype=np.int64)})
        P = pd.DataFrame({conv_col: convs[:-1][ok],
                          "turn": turns[:-1][ok]})
        sz = sizes.reset_index()
        P = P.merge(sz, on=[conv_col, "turn"], how="left")
        P = P.rename(columns={"sz": "sa"})
        nx = sz.copy()
        nx["turn"] = nx["turn"] - 1
        P = P.merge(nx.rename(columns={"sz": "sb"}),
                    on=[conv_col, "turn"], how="left")
        P = P.merge(inter.reset_index(), on=[conv_col, "turn"],
                    how="left")
        sa = P["sa"].fillna(0).to_numpy(np.int64)
        sb = P["sb"].fillna(0).to_numpy(np.int64)
        ix = P["ix"].fillna(0).to_numpy(np.int64)
        un = sa + sb - ix
        j = np.where(un > 0, (ix * 10**6) // np.maximum(un, 1), 0)
        return pd.DataFrame({
            conv_col: P[conv_col],
            "turn": P["turn"].astype(np.int64),
            "jaccard_e6": j.astype(np.int64),
            "boundary": (j < boundary_below_e6).astype(np.int64),
        })

    return (
        ds.select_columns([conv_col, turn_col, text_col])
        .map_batches(add_bucket, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby("bucket")
        .map_groups(lambda g: pairs(g.drop(columns=["bucket"])),
                    batch_format="pandas", runtime_env=_rte())
    )

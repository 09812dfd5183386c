"""Doc-id assignment, conversation offset table, collection statistics.

The document key is ``(conv_id, turn_idx)`` under stable turn ordering
(BASELINE.json input_hint; SURVEY.md section 2.9): doc_id must be a pure
function of the key, never of block arrival order.  The reference gets the
same invariant implicitly from enumeration order of its sequential loop
(reference: src/core/feature_extraction/util.py:632-706); a distributed
engine has to make it explicit.

Two modes (config.doc_id_mode):

* ``rank``  (default, dense): doc_id = offset(conv_id) + turn_idx where
  offset is the cumulative turn count of all conv_ids sorting before this
  one.  Two backends, selected automatically by corpus size (free Parquet
  footer metadata; see PipelineConfig.conv_offsets_backend), producing
  BYTE-IDENTICAL doc ids:

  - ``broadcast`` (small corpora): one row per conversation, built by a
    pre-aggregated (combiner-style) groupby and broadcast via ``ray.put``.
  - ``disk`` (scale): the offset table never materializes on the driver —
    a distributed groupby counts turns per conv, sampled range bounds
    partition the sorted conv space, each range sorts + prefix-sums its
    own convs inside ``map_groups`` and writes one Parquet file; the
    driver holds only the P range totals, whose exclusive cumsum gives
    each range's base.  Lookup = searchsorted(bounds) -> per-range file
    (cached, budget-bounded) -> searchsorted(convs) + base.  At 10^12
    turns / ~10^10 convs driver state is O(P) ~ 10^4, per-worker memory
    is O(ranges its fragments touch).

* ``hash`` (scale, sparse): doc_id = (h48(conv_id) << 16) | turn_idx with a
  deterministic 46-bit string hash — no global state, collision probability
  ~n^2/2^47 per 16-bit turn space (document and monitor; dense mode is the
  correctness default).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.tokenize import token_counts
from horus_ner_ray.util import worker_runtime_env as _rte


@dataclass
class ConvOffsets:
    """Sorted conv_id -> starting doc_id lookup (vectorized searchsorted)."""

    conv_ids: np.ndarray  # sorted, dtype=<U / object
    offsets: np.ndarray   # int64, same length
    n_docs: int           # total turns

    def lookup(self, conv_id_arr: np.ndarray) -> np.ndarray:
        arr = np.asarray(conv_id_arr, dtype=str)
        idx = np.searchsorted(self.conv_ids, arr)
        if len(idx) and (idx >= len(self.conv_ids)).any():
            raise KeyError("conv_id not present in offset table")
        got = self.conv_ids[idx]
        if not (got == arr).all():
            raise KeyError("conv_id not present in offset table")
        return self.offsets[idx]


def offsets_from_counts(conv_ids: np.ndarray, counts: np.ndarray) -> ConvOffsets:
    # fixed-width unicode ('<U') array, NOT object dtype: the table is
    # ray.put-broadcast to every fragment task, and pickling N Python
    # strings costs seconds at bench scale while '<U' buffers are ~free
    cids_u = np.asarray(conv_ids, dtype=str)
    order = np.argsort(cids_u, kind="stable")
    cids = cids_u[order]
    cnts = np.asarray(counts)[order].astype(np.int64)
    offs = np.zeros(len(cnts), dtype=np.int64)
    np.cumsum(cnts[:-1], out=offs[1:])
    return ConvOffsets(cids, offs, int(cnts.sum()))


def conv_offsets_from_dataset(ds) -> ConvOffsets:
    """Ray Data path: per-batch partial counts (combiner) -> tiny groupby.

    Input dataset needs only the ``conv_id`` column — select it before
    calling so the shuffle moves one small column of partials, not turns.
    """
    import ray.data  # noqa: F401  (ds is a ray.data.Dataset)

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by("conv_id", use_threads=False).aggregate([("conv_id", "count")])
        return pa.table({"conv_id": g["conv_id"], "n": g["conv_id_count"]})

    parts = ds.select_columns(["conv_id"]).map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    )
    from ray.data.aggregate import Sum

    agg = parts.groupby("conv_id").aggregate(Sum("n", alias_name="n_turns")).to_pandas()
    return offsets_from_counts(
        agg["conv_id"].to_numpy(dtype=object), agg["n_turns"].to_numpy()
    )


class DiskConvOffsets:
    """Range-partitioned on-disk conv_id -> starting-doc_id table.

    Same ``lookup`` contract (and identical results) as the broadcast
    ``ConvOffsets``, but the per-conv rows live in ``P`` sorted Parquet
    files under ``dir`` (shared storage, like every other index artifact);
    the object itself carries only the P-1 range bounds and P int64 bases.
    Range files load lazily and are cached FIFO up to ``max_cached_ranges``
    per process, so neither the driver nor any worker ever holds more than
    a bounded slice of the conv space.
    """

    def __init__(self, dir: str, bounds: np.ndarray, bases: np.ndarray,
                 n_docs: int, max_cached_ranges: int = 64):
        self.dir = str(dir)
        self.bounds = np.asarray(bounds, dtype=str)   # P-1 sorted cut points
        self.bases = np.asarray(bases, dtype=np.int64)  # P exclusive prefix
        self.n_docs = int(n_docs)
        self.max_cached_ranges = int(max_cached_ranges)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    # the per-process cache must not travel in pickles / the object store
    def __getstate__(self):
        d = dict(self.__dict__)
        d["_cache"] = {}
        return d

    def _load(self, r: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        got = self._cache.get(r)
        if got is not None:
            return got
        import pyarrow.parquet as pq_

        from pathlib import Path as _Path

        p = _Path(self.dir) / f"range-{int(r):06d}.parquet"
        if not p.exists():
            raise KeyError(f"conv offset range {r} has no file ({p})")
        t = pq_.read_table(str(p))
        got = (
            np.asarray(t["conv_id"], dtype=str),
            np.asarray(t["off"], dtype=np.int64),
            np.asarray(t["n"], dtype=np.int64),
        )
        if len(self._cache) >= self.max_cached_ranges:
            self._cache.pop(next(iter(self._cache)))  # FIFO evict
        self._cache[r] = got
        return got

    def _lookup(self, conv_id_arr: np.ndarray, want_counts: bool):
        arr = np.asarray(conv_id_arr, dtype=str)
        rid = (np.searchsorted(self.bounds, arr, side="right")
               if len(self.bounds) else np.zeros(len(arr), dtype=np.int64))
        out = np.empty(len(arr), dtype=np.int64)
        cnt = np.empty(len(arr), dtype=np.int64) if want_counts else None
        for r in np.unique(rid):
            convs, offs, ns = self._load(int(r))
            m = rid == r
            sub = arr[m]
            idx = np.searchsorted(convs, sub)
            idx_c = np.minimum(idx, max(len(convs) - 1, 0))
            if len(convs) == 0 or not (convs[idx_c] == sub).all():
                raise KeyError("conv_id not present in offset table")
            out[m] = offs[idx_c] + self.bases[int(r)]
            if want_counts:
                cnt[m] = ns[idx_c]
        return (out, cnt) if want_counts else out

    def lookup(self, conv_id_arr: np.ndarray) -> np.ndarray:
        return self._lookup(conv_id_arr, want_counts=False)

    def lookup_with_counts(self, conv_id_arr: np.ndarray):
        """(offsets, total turn counts) per conv — the count turns an
        inclusive conv bound into an exclusive doc bound."""
        return self._lookup(conv_id_arr, want_counts=True)


def build_disk_offsets(corpus_files: list[str], out_dir,
                       target_turns_per_range: int = 4_000_000,
                       sample_per_block: int = 64) -> DiskConvOffsets:
    """Distributed construction of the rank-mode offset table — the driver
    never holds (or broadcasts) one row per conversation.

    Plan: distributed per-batch partial conv counts -> groupby(conv_id)
    sum -> (a) evenly-spaced per-block conv samples give P-1 range bounds
    (driver sees a bounded sample, routing-only choice); (b) each range's
    rows sort + exclusive-cumsum inside ONE ``map_groups`` kernel and write
    their Parquet file (atomic tmp+rename; idempotent on task retry);
    (c) the driver reduces only the P (range, total) rows into bases.
    Offsets are byte-identical to ``offsets_from_counts`` by construction:
    ranges partition the globally sorted conv order, and base(r) =
    sum of totals of ranges before r.
    """
    import shutil
    from pathlib import Path as _Path

    import pyarrow.parquet as pq_
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    total_turns = sum(pq_.ParquetFile(p).metadata.num_rows for p in corpus_files)
    n_ranges = max(4, int(np.ceil(total_turns / max(1, target_turns_per_range))))

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by("conv_id", use_threads=False).aggregate([("conv_id", "count")])
        return pa.table({"conv_id": g["conv_id"], "n": g["conv_id_count"]})

    counts = (
        rd.read_parquet(corpus_files, columns=["conv_id"])
        .map_batches(partial_counts, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None, runtime_env=_rte())
        .groupby("conv_id").aggregate(Sum("n", alias_name="n"))
        .materialize()  # consumed twice (sample + tag); conv-level, not turn-level
    )

    def sample(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["conv_id"], dtype=object)
        if len(c) == 0:
            return pa.table({"conv_id": pa.array([], pa.string())})
        idx = np.linspace(0, len(c) - 1,
                          min(sample_per_block, len(c))).astype(np.int64)
        return pa.table({"conv_id": pa.array(c[np.unique(idx)], pa.string())})

    samples = np.sort(np.asarray(
        counts.map_batches(sample, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None,
                           runtime_env=_rte()).to_pandas()["conv_id"]
        .to_numpy(dtype=str)))
    if len(samples):
        q = np.linspace(0, len(samples), n_ranges + 1)[1:-1].astype(np.int64)
        bounds = np.unique(samples[np.minimum(q, len(samples) - 1)])
    else:
        bounds = np.asarray([], dtype=str)
    P = len(bounds) + 1

    out = _Path(out_dir)
    if out.exists():
        shutil.rmtree(out)  # derived state: rebuilt whole, atomically per file
    out.mkdir(parents=True, exist_ok=True)
    bref = ray.put(bounds) if ray.is_initialized() else bounds

    def tag(batch: pa.Table) -> pa.Table:
        b = ray.get(bref) if ray.is_initialized() else bref
        conv = np.asarray(batch["conv_id"], dtype=str)
        r = (np.searchsorted(b, conv, side="right") if len(b)
             else np.zeros(len(conv), dtype=np.int64))
        return batch.append_column("rg", pa.array(r.astype(np.int64), pa.int64()))

    out_str = str(out)

    def finish_range(g: pd.DataFrame) -> pd.DataFrame:
        import os

        r = int(g["rg"].iloc[0])
        conv = g["conv_id"].to_numpy(dtype=str)
        n = g["n"].to_numpy(np.int64)
        o = np.argsort(conv, kind="stable")
        conv, n = conv[o], n[o]
        offs = np.zeros(len(n), dtype=np.int64)
        np.cumsum(n[:-1], out=offs[1:])
        tbl = pa.table({
            "conv_id": pa.array(conv, pa.string()),
            "n": pa.array(n, pa.int64()),
            "off": pa.array(offs, pa.int64()),
        })
        dst = _Path(out_str) / f"range-{r:06d}.parquet"
        tmp = dst.with_name(dst.name + f".{os.getpid()}.tmp")
        pq_.write_table(tbl, str(tmp), compression="zstd", compression_level=1)
        os.replace(tmp, dst)
        return pd.DataFrame({"rg": [r], "total": [int(n.sum())]})

    totals = (
        counts.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True,
                           runtime_env=_rte())
        .groupby("rg")
        .map_groups(finish_range, batch_format="pandas", runtime_env=_rte())
        .to_pandas()  # P tiny rows
    )
    t = np.zeros(P, dtype=np.int64)
    if len(totals):
        t[totals["rg"].to_numpy(np.int64)] = totals["total"].to_numpy(np.int64)
    bases = np.zeros(P, dtype=np.int64)
    np.cumsum(t[:-1], out=bases[1:])
    return DiskConvOffsets(out_str, bounds, bases, int(t.sum()))


def conv_offsets_from_table(tbl: pa.Table) -> ConvOffsets:
    """Local (no-Ray) path for tests and small fragments."""
    g = tbl.group_by("conv_id", use_threads=False).aggregate([("conv_id", "count")])
    return offsets_from_counts(
        np.asarray(g["conv_id"], dtype=object), np.asarray(g["conv_id_count"])
    )


def assign_doc_ids_rank(batch: pa.Table, offsets: ConvOffsets) -> np.ndarray:
    conv = np.asarray(batch["conv_id"], dtype=object)
    base = offsets.lookup(conv)
    return base + np.asarray(batch["turn_idx"], dtype=np.int64)


_HASH_MASK = (1 << 46) - 1


def assign_doc_ids_hash(batch: pa.Table) -> np.ndarray:
    conv = np.asarray(batch["conv_id"], dtype=object)
    h = pd.util.hash_array(conv, categorize=False)  # deterministic 64-bit
    return (((h & _HASH_MASK) << 16) | np.asarray(batch["turn_idx"], dtype=np.uint64)).astype(
        np.int64
    )


# ---------------------------------------------------------------------------
# Collection statistics (the BM25 N / avgdl; SURVEY.md G5)
# ---------------------------------------------------------------------------


@dataclass
class CollectionStats:
    n_docs: int
    total_tokens: int

    @property
    def avgdl(self) -> float:
        return self.total_tokens / self.n_docs if self.n_docs else 0.0

    def to_dict(self) -> dict:
        return {"n_docs": self.n_docs, "total_tokens": self.total_tokens, "avgdl": self.avgdl}


def collection_stats_from_dataset(ds) -> CollectionStats:
    """Streaming partial-sum reduce: one (n, tokens) row per batch, then a
    driver-side sum of the tiny partials (no all-to-all)."""

    def partial(batch: pa.Table) -> pa.Table:
        dl = token_counts(batch["text"])
        return pa.table(
            {"n": pa.array([len(batch)], pa.int64()), "tok": pa.array([int(dl.sum())], pa.int64())}
        )

    parts = ds.select_columns(["text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None, runtime_env=_rte()
    ).to_pandas()
    return CollectionStats(int(parts["n"].sum()), int(parts["tok"].sum()))


def conv_text_dataset(ds, key_col: str = "conv_id", ord_col: str = "turn_idx",
                      text_col: str = "text", sep: str = " ",
                      n_buckets: int = 256):
    """Granularity switch: per-conversation full text — every turn's text
    joined in ``ord_col`` order — as a Dataset(key, text).  The input to
    CONVERSATION-level indexing/dedup/analysis (doc = conversation
    instead of doc = turn).

    One coarse hash-bucket shuffle co-locates each conversation, then per
    bucket: one lexsort orders every conversation's turns at once, run
    boundaries build a ListArray, and ``pyarrow.compute.binary_join``
    concatenates — no per-conversation Python (the event_paths pattern,
    stages/funnel.py)."""
    import pyarrow.compute as pc

    def bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(batch[key_col]), categorize=False)
        return batch.append_column(
            "bkt", pa.array((h % np.uint64(n_buckets)).astype(np.int64),
                            pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy(object)
        o = g[ord_col].to_numpy(np.int64)
        t = g[text_col].to_numpy(object)
        order = np.lexsort((o, k))
        ks, ts = k[order], t[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        offsets = np.r_[starts, len(ks)].astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets),
                                       pa.array(ts, pa.string()))
        joined = pc.binary_join(lst, sep)
        return pd.DataFrame({key_col: ks[starts],
                             text_col: np.asarray(joined, dtype=object)})

    return (
        ds.select_columns([key_col, ord_col, text_col])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: per_bucket(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )

"""Arrow IPC (Feather V2) transcript source + sink (SURVEY.md S2/S6 —
the zero-parse binary interchange format for Arrow-native pipelines).

Writer: ``write_ipc`` is the lossless export — one ``.arrow`` FILE-format
container per conversation, rows in turn order, written atomically
(tmp+rename) and skip-if-exists so re-runs are resumable (the
write_conll / write_jsonl contract).  IPC preserves the Arrow schema
bit-for-bit (timestamp[us] stays timestamp[us], nulls stay nulls), so
``read(write(ds))`` reproduces the source rows EXACTLY — no text
round-trip ambiguity at all, unlike CSV/JSONL.

Reader: ``read_ipc_transcripts`` parallelizes at file granularity
(``read_binary_files`` → one in-memory IPC open per file inside
``map_batches`` — per-FILE Python, never per-row) and lands the engine's
transcript schema.  ``ipc_to_parquet`` lands one Parquet fragment per
input file (atomic, skip-if-exists) — ``build_index``'s resumable
fragment contract.

Reference analogue: the reference serializes intermediate corpora with
pickle/horus_meta dumps (reference: src/core/util/util.py
process_ds_*/dump family); here the interchange format is a public,
schema-preserving standard instead.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("role", pa.string()), ("text", pa.string()),
    ("tool", pa.string()), ("ts", pa.timestamp("us")),
])


def read_ipc_transcripts(paths: list[str] | str):
    """Dataset over Arrow IPC transcript files in the engine's schema.
    Parallelizes by file; each file decodes once (zero text parsing) and
    casts into the canonical transcript schema (missing tool/ts columns
    become ''/null)."""
    import ray.data as rd

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for buf in batch["bytes"]:
            t = pa.ipc.open_file(pa.BufferReader(buf.as_py())).read_all()
            cols = {}
            n = len(t)
            for f in TRANSCRIPT_SCHEMA:
                if f.name in t.column_names:
                    cols[f.name] = t[f.name].cast(f.type)
                elif f.name == "ts":
                    cols[f.name] = pa.nulls(n, pa.timestamp("us"))
                else:
                    cols[f.name] = pa.array([""] * n, f.type)
            tables.append(pa.table(cols))
        if not tables:
            return TRANSCRIPT_SCHEMA.empty_table()
        return pa.concat_tables(tables).combine_chunks()

    ds = rd.read_binary_files(paths)
    return ds.map_batches(decode, batch_format="pyarrow",
                          runtime_env=_rte())


def ipc_to_parquet(paths: list[str], out_dir: str | Path) -> list[str]:
    """Land one transcript-schema Parquet fragment per IPC file (atomic
    tmp+rename, skip-if-exists) — build_index's resumable fragment
    contract."""
    import pyarrow.parquet as pq

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for p in sorted(str(x) for x in paths):
        dst = out_dir / (Path(p).stem + ".parquet")
        if not dst.exists():
            df = read_ipc_transcripts([p]).to_pandas()
            tbl = pa.Table.from_pandas(df, schema=TRANSCRIPT_SCHEMA,
                                       preserve_index=False)
            tmp = dst.with_name(dst.name + f".tmp-{os.getpid()}")
            pq.write_table(tbl, tmp)
            os.replace(tmp, dst)
        written.append(str(dst))
    return written


def write_ipc(ds, out_dir: str | Path, n_buckets: int = 64) -> int:
    """Lossless Arrow IPC export: one FILE-format ``.arrow`` container
    per conversation, rows in turn order, the canonical transcript
    schema; atomic tmp+rename per file and skip-if-exists make re-runs
    resumable.  Returns the number of conversation files written or
    found."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_str = str(out_dir)

    def bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(batch["conv_id"]),
                               categorize=False)
        return batch.append_column(
            "bkt", pa.array((h % np.uint64(n_buckets)).astype(np.int64),
                            pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        wrote = 0
        for cid, rows in g.sort_values(["conv_id", "turn_idx"]).groupby(
                "conv_id", sort=True):
            dst = Path(out_str) / f"{cid}.arrow"
            if dst.exists():
                wrote += 1
                continue
            cols = {
                "conv_id": rows["conv_id"].astype(str),
                "turn_idx": rows["turn_idx"].astype(np.int32),
                "role": rows["role"].astype(str),
                "text": rows["text"].astype(str),
                "tool": (rows["tool"] if "tool" in rows
                         else pd.Series([""] * len(rows))).fillna(
                             "").astype(str),
            }
            tsv = (rows["ts"] if "ts" in rows
                   else pd.Series([pd.NaT] * len(rows)))
            tbl = pa.Table.from_pydict(
                {**{k: pa.array(v) for k, v in cols.items()},
                 "ts": pa.array(tsv.astype("datetime64[us]"),
                                pa.timestamp("us"))},
                schema=TRANSCRIPT_SCHEMA)
            tmp = dst.with_name(dst.name + f".tmp-{os.getpid()}")
            with pa.ipc.new_file(str(tmp), TRANSCRIPT_SCHEMA) as w:
                w.write_table(tbl)
            os.replace(tmp, dst)
            wrote += 1
        return pd.DataFrame({"n": [wrote]})

    parts = (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True,
                       runtime_env=_rte())
        .groupby("bkt")
        .map_groups(lambda g: per_bucket(g.drop(columns=["bkt"])),
                    batch_format="pandas", runtime_env=_rte())
        .to_pandas()
    )
    return int(parts["n"].sum()) if len(parts) else 0

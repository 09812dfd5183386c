"""JSONL transcript source + sink (SURVEY.md S2/S6 — the line-delimited
JSON interchange format every LLM-data pipeline speaks).

Reader: ``ray.data.read_json`` (JSONL files parallelize by file/block)
followed by one vectorized cast stage into the engine's transcript
schema — (conv_id:string, turn_idx:int32, role, text, tool:string,
ts:timestamp[us] parsed from ISO-8601).  ``jsonl_to_parquet`` lands one
Parquet fragment per input file (atomic tmp+rename, skip-if-exists) so
``build_index`` consumes JSONL corpora through its normal resumable
fragment path — the same contract as ``sources/conll.conll_to_parquet``.

Writer: ``write_jsonl`` is the lossless inverse — one JSONL file per
conversation (atomic + resumable, the write_conll contract), ts
serialized as ISO-8601 microseconds so read(write(ds)) reproduces the
source rows exactly (tested in tests/test_jsonl.py).

Reference analogue: the reference ingests tweet/text corpora from
line-delimited exports (reference: src/core/feature_extraction/util.py
process_ds_* family); here the format is explicit and round-trippable.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte

TRANSCRIPT_FIELDS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def read_jsonl_transcripts(paths: list[str] | str):
    """Dataset over JSONL transcript files in the engine's schema.
    Unknown keys are dropped; missing tool/ts become ''/null; ts parses
    from ISO-8601 (fromisoformat semantics, microsecond precision)."""
    import ray.data as rd

    ds = rd.read_json(paths)

    def cast(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = len(df)
        out = {
            "conv_id": df.get("conv_id", pd.Series([""] * n)).astype(str),
            "turn_idx": df.get("turn_idx",
                               pd.Series(np.zeros(n))).astype(np.int32),
            "role": df.get("role", pd.Series([""] * n)).astype(str),
            "text": df.get("text", pd.Series([""] * n)).astype(str),
            "tool": df.get("tool", pd.Series([""] * n)).fillna("").astype(str),
        }
        ts = df.get("ts")
        if ts is None:
            tsv = pd.Series([pd.NaT] * n, dtype="datetime64[us]")
        else:
            tsv = pd.to_datetime(ts, format="ISO8601",
                                 errors="coerce").astype("datetime64[us]")
        out["ts"] = tsv
        return pa.table({
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "role": pa.array(out["role"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "tool": pa.array(out["tool"], pa.string()),
            "ts": pa.array(out["ts"], pa.timestamp("us")),
        })

    return ds.map_batches(cast, batch_format="pyarrow", runtime_env=_rte())


def jsonl_to_parquet(paths: list[str], out_dir: str | Path) -> list[str]:
    """Land one transcript-schema Parquet fragment per JSONL file (atomic
    tmp+rename, skip-if-exists) — build_index's resumable fragment
    contract."""
    import pyarrow.parquet as pq

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    schema = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                        ("role", pa.string()), ("text", pa.string()),
                        ("tool", pa.string()), ("ts", pa.timestamp("us"))])
    written = []
    for p in sorted(str(x) for x in paths):
        dst = out_dir / (Path(p).stem + ".parquet")
        if not dst.exists():
            df = read_jsonl_transcripts([p]).to_pandas()  # one fragment
            tbl = pa.Table.from_pandas(df, schema=schema,
                                       preserve_index=False)
            tmp = dst.with_name(dst.name + f".tmp-{os.getpid()}")
            pq.write_table(tbl, tmp)
            os.replace(tmp, dst)
        written.append(str(dst))
    return written


def write_jsonl(ds, out_dir: str | Path, n_buckets: int = 64) -> int:
    """Lossless JSONL export: one file per conversation, rows in turn
    order, ts as ISO-8601 microseconds; atomic tmp+rename per file and
    skip-if-exists make re-runs resumable (the write_conll contract).
    Returns the number of conversation files written or found."""
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
            dst = Path(out_str) / f"{cid}.jsonl"
            if dst.exists():
                wrote += 1
                continue
            lines = []
            for r in rows.itertuples():
                ts = getattr(r, "ts", None)
                rec = {
                    "conv_id": str(cid),
                    "turn_idx": int(r.turn_idx),
                    "role": str(r.role),
                    "text": str(r.text),
                    "tool": str(getattr(r, "tool", "") or ""),
                    "ts": (None if ts is None or pd.isna(ts)
                           else pd.Timestamp(ts).isoformat()),
                }
                lines.append(json.dumps(rec, ensure_ascii=False))
            tmp = dst.with_name(dst.name + f".tmp-{os.getpid()}")
            tmp.write_text("\n".join(lines) + "\n", encoding="utf-8")
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

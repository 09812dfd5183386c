"""CSV transcript source + sink (SURVEY.md S2/S6 — the third interchange
format after Parquet/CoNLL/JSONL; every data-exchange pipeline still
speaks CSV).

Reader: ``ray.data.read_csv`` (Arrow CSV, parallel by file) configured
for quoted multi-line values, every column read as string, then one
vectorized cast stage into the engine's transcript schema — the exact
contract of ``sources/jsonl.read_jsonl_transcripts``.

Writer: ``write_csv`` is the lossless inverse — one CSV file per
conversation (atomic + resumable, the write_conll/write_jsonl
contract): header row, stdlib-csv minimal quoting (embedded commas,
quotes and newlines survive), ts serialized as ISO-8601 microseconds,
so read(write(ds)) reproduces the source rows exactly
(tests/test_csv_source.py).

Reference analogue: the reference's corpus loaders read delimiter-
separated exports (reference: src/core/feature_extraction/util.py
process_ds_* family); here the format is explicit and round-trippable.
"""

from __future__ import annotations

import csv
import io
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte

TRANSCRIPT_FIELDS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def read_csv_transcripts(paths: list[str] | str):
    """Dataset over CSV transcript files in the engine's schema.  All
    columns parse as strings first (quoted newlines allowed), then cast:
    turn_idx int32, missing tool -> '', ts from ISO-8601 ('' -> null)."""
    import pyarrow.csv as pacsv
    import ray.data as rd

    ds = rd.read_csv(
        paths,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(
            column_types={f: pa.string() for f in TRANSCRIPT_FIELDS}),
    )

    def cast(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = len(df)
        ts = df.get("ts")
        if ts is None:
            tsv = pd.Series([pd.NaT] * n, dtype="datetime64[us]")
        else:
            tsv = pd.to_datetime(ts.replace("", None), format="ISO8601",
                                 errors="coerce").astype("datetime64[us]")
        return pa.table({
            "conv_id": pa.array(
                df.get("conv_id", pd.Series([""] * n)).fillna("")
                .astype(str), pa.string()),
            "turn_idx": pa.array(
                df.get("turn_idx", pd.Series(np.zeros(n))).fillna(0)
                .astype(np.int64).astype(np.int32), pa.int32()),
            "role": pa.array(df.get("role", pd.Series([""] * n)).fillna("")
                             .astype(str), pa.string()),
            "text": pa.array(df.get("text", pd.Series([""] * n)).fillna("")
                             .astype(str), pa.string()),
            "tool": pa.array(df.get("tool", pd.Series([""] * n)).fillna("")
                             .astype(str), pa.string()),
            "ts": pa.array(tsv, pa.timestamp("us")),
        })

    return ds.map_batches(cast, batch_format="pyarrow", runtime_env=_rte())


def csv_to_parquet(paths: list[str], out_dir: str | Path) -> list[str]:
    """Land one transcript-schema Parquet fragment per CSV file (atomic
    tmp+rename, skip-if-exists) — build_index's resumable fragment
    contract, same as jsonl_to_parquet."""
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
            df = read_csv_transcripts([p]).to_pandas()  # one fragment
            tbl = pa.Table.from_pandas(df, schema=schema,
                                       preserve_index=False)
            tmp = dst.with_name(dst.name + f".tmp-{os.getpid()}")
            pq.write_table(tbl, tmp)
            os.replace(tmp, dst)
        written.append(str(dst))
    return written


def write_csv(ds, out_dir: str | Path, n_buckets: int = 64) -> int:
    """Lossless CSV export: one file per conversation, header row, rows
    in turn order, minimal quoting, ts as ISO-8601 microseconds ('' for
    null); atomic tmp+rename per file and skip-if-exists make re-runs
    resumable (the write_conll contract).  Returns the number of
    conversation files written or found."""
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
            dst = Path(out_str) / f"{cid}.csv"
            if dst.exists():
                wrote += 1
                continue
            buf = io.StringIO()
            w = csv.writer(buf, lineterminator="\n")
            w.writerow(TRANSCRIPT_FIELDS)
            for r in rows.itertuples():
                ts = getattr(r, "ts", None)
                w.writerow([
                    str(cid), int(r.turn_idx), str(r.role), str(r.text),
                    str(getattr(r, "tool", "") or ""),
                    ("" if ts is None or pd.isna(ts)
                     else pd.Timestamp(ts).isoformat()),
                ])
            tmp = dst.with_name(dst.name + f".tmp-{os.getpid()}")
            tmp.write_text(buf.getvalue(), encoding="utf-8")
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

"""CoNLL / Ritter token-per-line text source (SURVEY.md S2's non-Parquet
half).

Reference semantics (reference: src/core/feature_extraction/util.py:816-877
``process_ds_conll_format``): one token per line with ``separator``-split
columns (``token_index`` selects the token, optionally ``tag_index`` a
label), a blank line ends a sentence, and ``-DOCSTART-`` lines are document
markers — skipped, with the blank line that follows them consumed rather
than flushing an (empty) sentence.

Ray-Data-first: the FILE is the parallel unit (``read_binary_files`` one
row per file, include_paths), and a ``map_batches`` stage parses each
file's bytes into sentence rows in the transcript schema the rest of the
engine speaks — (conv_id = file stem, turn_idx = sentence ordinal,
role = 'sentence', text = space-joined tokens[, tags]).  A blank-line
grouping spans lines, so line-granularity readers (``read_text``) would
split sentences at block boundaries; file granularity keeps grouping
correct and the read embarrassingly parallel.

``conll_to_parquet`` lands one transcript-schema Parquet fragment per
input file (atomic tmp+rename, skip-if-exists) so ``build_index`` consumes
CoNLL corpora through its normal resumable fragment path.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def parse_conll_bytes(
    data: bytes,
    conv_id: str,
    token_index: int = 0,
    tag_index: int | None = None,
    separator: str | None = "\t",
) -> pa.Table:
    """One file's bytes -> sentence rows.  separator=None splits on any
    whitespace (the reference's ``separator=''`` hack)."""
    text = data.decode("utf-8", errors="replace")
    conv, turn, sent_text, tags_col = [], [], [], []
    tokens: list[str] = []
    tags: list[str] = []
    docstart = False
    t = 0

    def flush():
        nonlocal tokens, tags, t
        if tokens:
            conv.append(conv_id)
            turn.append(t)
            sent_text.append(" ".join(tokens))
            tags_col.append(" ".join(tags))
            t += 1
            tokens, tags = [], []

    for line in text.split("\n"):
        if line.strip() == "":
            if docstart:
                docstart = False
            else:
                flush()
            continue
        parts = line.split(separator)
        if token_index >= len(parts):
            # malformed short line: skip it rather than IndexError — row
            # error handling (SURVEY.md M11), matching the reference's
            # tolerate-and-continue reading of hand-edited CoNLL files
            continue
        token = parts[token_index]
        if token == "-DOCSTART-":
            docstart = True
            continue
        tokens.append(token)
        if tag_index is not None:
            # placeholder 'O' when the tag column is missing so tokens and
            # tags stay aligned (space-joined columns must zip 1:1)
            tags.append(parts[tag_index].rstrip("\r\n")
                        if tag_index < len(parts) else "O")
    flush()

    cols = {
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
        "role": pa.array(["sentence"] * len(conv), pa.string()),
        "text": pa.array(sent_text, pa.string()),
    }
    if tag_index is not None:
        cols["tags"] = pa.array(tags_col, pa.string())
    return pa.table(cols)


def read_conll(
    paths: list[str],
    token_index: int = 0,
    tag_index: int | None = None,
    separator: str | None = "\t",
):
    """CoNLL files -> Dataset of transcript-schema sentence rows."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_conll_bytes(
                data.as_py(), Path(path.as_py()).stem, token_index, tag_index, separator
            )
            for path, data in zip(batch["path"], batch["bytes"])
        ]
        tables = [t for t in tables if len(t)]
        if not tables:
            return parse_conll_bytes(b"", "empty", token_index, tag_index, separator)
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True,
                          runtime_env=_rte())


def format_conll_bytes(turns: "pa.Table | list[dict]", text_col: str = "text",
                       tags_col: str | None = "tags",
                       separator: str = "\t") -> bytes:
    """Sentence rows (ordered by turn) -> CoNLL bytes: one
    ``token<sep>tag`` line per token, a blank line after each sentence —
    the exact inverse of ``parse_conll_bytes`` (reference:
    src/horus_to_conll.py:117-164 exports the same token-per-line shape).
    Tokens and tags are the space-split columns; they must zip 1:1."""
    rows = turns.to_pylist() if isinstance(turns, pa.Table) else turns
    out: list[str] = []
    for r in rows:
        toks = (r[text_col] or "").split()
        tags = (r.get(tags_col) or "").split() if tags_col else []
        if tags_col and tags and len(tags) != len(toks):
            raise ValueError(
                f"tags/token count mismatch ({len(tags)} vs {len(toks)}) "
                f"in turn {r}")
        for i, t in enumerate(toks):
            out.append(t + separator + tags[i] if tags_col and tags else t)
        out.append("")
    return ("\n".join(out) + "\n" if out else "").encode("utf-8")


def write_conll(ds, out_dir: str | Path, text_col: str = "text",
                tags_col: str | None = "tags", conv_col: str = "conv_id",
                turn_col: str = "turn_idx", separator: str = "\t",
                n_buckets: int = 16) -> "list[str]":
    """Transcript-schema Dataset -> one ``<conv_id>.conll`` file per
    conversation (the round-trippable unit: ``read_conll`` recovers
    conv_id from the file stem).  Ray-Data-first: conversations group by
    ``hash(conv_id) % n_buckets`` and each group's worker writes its
    files (atomic tmp+rename, skip-if-exists — the same resumable
    publish discipline as ``conll_to_parquet``).  Returns the sorted file
    paths.  For corpora with millions of conversations prefer landing
    Parquet and exporting selected convs; one-file-per-conv is the
    interchange format, not the at-scale store."""
    import pandas as pd

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def bucket(batch: pa.Table) -> pa.Table:
        import numpy as np

        h = pd.util.hash_array(
            np.asarray(batch[conv_col], dtype=object), categorize=False)
        return batch.append_column(
            "__cbkt", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        paths = []
        for conv, turns in g.groupby(conv_col, sort=True):
            turns = turns.sort_values(turn_col, kind="stable")
            dest = out / f"{conv}.conll"
            if not dest.exists():
                tmp = dest.with_suffix(".conll.tmp")
                tmp.write_bytes(format_conll_bytes(
                    turns.to_dict("records"), text_col,
                    tags_col if tags_col in turns.columns else None,
                    separator))
                os.replace(tmp, dest)
            paths.append(str(dest))
        return pd.DataFrame({"path": pd.Series(paths, dtype=object)})

    cols = [conv_col, turn_col, text_col] + (
        [tags_col] if tags_col and tags_col in ds.schema().names else [])
    manifest = (
        ds.select_columns(cols)
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby("__cbkt")
        .map_groups(lambda g: write_group(g.drop(columns=["__cbkt"])),
                    batch_format="pandas", runtime_env=_rte())
    )
    return sorted(manifest.to_pandas()["path"].tolist())


def conll_to_parquet(
    paths: list[str],
    out_dir: str | Path,
    token_index: int = 0,
    tag_index: int | None = None,
    separator: str | None = "\t",
) -> list[str]:
    """One transcript-schema Parquet fragment per CoNLL file (resumable:
    existing fragments are skipped; atomic publish).  Returns the fragment
    paths in input order — feed them straight to ``build_index``."""
    import pyarrow.parquet as pq

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    frags = []
    for p in paths:
        frag = out / (Path(p).stem + ".parquet")
        if not frag.exists():
            tbl = parse_conll_bytes(
                Path(p).read_bytes(), Path(p).stem, token_index, tag_index, separator
            )
            tmp = frag.with_suffix(".parquet.tmp")
            pq.write_table(tbl, tmp)
            os.replace(tmp, frag)
        frags.append(str(frag))
    return frags

"""Sharded inverted-index file format, lineage manifests, atomic writes.

The global index is **document-partitioned**: shard ``s`` holds the complete
posting data for a contiguous doc_id range.  This is the load-bearing
skew/scale decision (SURVEY.md section 7.4 "hot-term posting lists"): a term
with df == N ("sessionmark", role-token-class stopwords) is split across all
S shards *by construction* — no single group ever materializes a corpus-wide
posting list, and query-time top-k becomes per-shard heaps + a tiny global
merge.  The doc-range split plays the role the north-star assigns to
"salting" of the groupby-term shuffle: the salt is the doc range, applied
uniformly, and the per-term k-way merge happens inside each shard across the
per-input-fragment sorted runs (pipelines/build_index.py).

Shard directory layout (written to a temp dir, ``os.replace``d into place so
partially-written shards are invisible — SURVEY.md section 7.4 resume):

    shard-00042/
      postings.bin    per term: [FoR gap varints of doc_ids][varints of tfs]
      dict.parquet    term-sorted: term, df, cf, max_tf, offsets/lengths,
                      block_last: list<int64>, block_max: list<float32>
      docids.npy      sorted doc_ids present in this shard (int64)
      dl.npy          document length per docids entry (int32)
      manifest.json   lineage: run files merged, counts, bytes, wall, params

The reference's analogue of this whole module is a single SQLite file acting
as term dictionary + posting store + resume log (reference:
horus0.1.5.db.sql:2-139, src/core/feature_extraction/util.py:947-1016);
here the term dictionary is dict.parquet, postings are the compressed blob,
and resume is the per-shard/per-fragment manifest files.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.state import codec

INDEX_FORMAT_VERSION = 1


def shard_of_rank(doc_ids: np.ndarray, n_docs: int, num_shards: int) -> np.ndarray:
    """Contiguous doc-range sharding for dense (rank-mode) doc ids."""
    return (np.asarray(doc_ids, dtype=np.int64) * num_shards) // max(n_docs, 1)


def shard_of_hash(doc_ids: np.ndarray, num_shards: int) -> np.ndarray:
    """Hash-mode ids: high bits are a conv hash — modulo over those."""
    return (np.asarray(doc_ids, dtype=np.int64) >> 16) % num_shards


class IndexPaths:
    def __init__(self, root: str | Path):
        self.root = Path(root)

    @property
    def runs(self) -> Path:
        return self.root / "runs"

    @property
    def shards(self) -> Path:
        return self.root / "shards"

    @property
    def docstore(self) -> Path:
        return self.root / "docstore"

    @property
    def stats_json(self) -> Path:
        return self.root / "stats.json"

    @property
    def df_parquet(self) -> Path:
        return self.root / "df.parquet"

    def run_dir(self, shard: int) -> Path:
        return self.runs / f"shard-{shard:05d}"

    def frag_manifest(self, frag_id: int) -> Path:
        return self.runs / f"_frag-{frag_id:05d}.json"

    def shard_dir(self, shard: int) -> Path:
        return self.shards / f"shard-{shard:05d}"

    def ensure(self) -> None:
        for p in (self.runs, self.shards, self.docstore):
            p.mkdir(parents=True, exist_ok=True)

    def clean_tmp(self) -> None:
        """Remove partial writes from a killed run (tmp names only)."""
        for p in self.root.rglob("*.tmp"):
            if p.is_dir():
                shutil.rmtree(p, ignore_errors=True)
            else:
                p.unlink(missing_ok=True)


def atomic_write_json(path: Path, obj: dict) -> None:
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(json.dumps(obj, indent=1, sort_keys=True))
    os.replace(tmp, path)


def atomic_write_table(path: Path, tbl: pa.Table, **kw) -> None:
    tmp = path.with_name(path.name + ".tmp")
    pq.write_table(tbl, tmp, **kw)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# Shard writer (used by the merge stage)
# ---------------------------------------------------------------------------


@dataclass
class _DictRows:
    term: list = field(default_factory=list)
    df: list = field(default_factory=list)
    cf: list = field(default_factory=list)
    max_tf: list = field(default_factory=list)
    doc_off: list = field(default_factory=list)
    doc_len: list = field(default_factory=list)
    tf_off: list = field(default_factory=list)
    tf_len: list = field(default_factory=list)
    block_last: list = field(default_factory=list)
    block_max: list = field(default_factory=list)


class ShardWriter:
    """Streams per-term posting blobs into a shard's temp dir; ``finish``
    publishes it atomically.  Terms MUST arrive in ascending order with
    doc_ids sorted ascending (the k-way merge guarantees both)."""

    def __init__(
        self,
        final_dir: Path,
        shard_id: int,
        cfg: PipelineConfig,
        avgdl: float,
        base_doc_id: int,
    ):
        self.final_dir = final_dir
        self.shard_id = shard_id
        self.cfg = cfg
        self.avgdl = max(avgdl, 1e-9)
        self.base = int(base_doc_id)
        self.tmp = final_dir.with_name(final_dir.name + ".tmp")
        if self.tmp.exists():
            shutil.rmtree(self.tmp)
        self.tmp.mkdir(parents=True)
        self._post = open(self.tmp / "postings.bin", "wb")
        self._off = 0
        self._rows = _DictRows()
        self._n_postings = 0
        self._last_term: str | None = None
        self._t0 = time.time()

    def add_term(
        self, term: str, doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
    ) -> None:
        assert self._last_term is None or term > self._last_term, (
            f"terms out of order: {self._last_term!r} -> {term!r}"
        )
        self._last_term = term
        blob_d = codec.encode_doc_ids(doc_ids, self.base)
        blob_t = codec.encode_tfs(tfs)
        r = self._rows
        r.term.append(term)
        r.df.append(len(doc_ids))
        r.cf.append(int(tfs.sum()))
        r.max_tf.append(int(tfs.max()) if len(tfs) else 0)
        r.doc_off.append(self._off)
        r.doc_len.append(len(blob_d))
        self._post.write(blob_d)
        self._off += len(blob_d)
        r.tf_off.append(self._off)
        r.tf_len.append(len(blob_t))
        self._post.write(blob_t)
        self._off += len(blob_t)
        # block-max metadata: per block of B postings, the last doc_id and the
        # max idf-free BM25 partial tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) —
        # multiplied by the term's idf at query time it upper-bounds the
        # block's contribution (WAND-style skipping).
        B = self.cfg.postings_block
        k1, b = self.cfg.k1, self.cfg.b
        part = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / self.avgdl))
        nblk = (len(doc_ids) + B - 1) // B
        lasts = [int(doc_ids[min((i + 1) * B, len(doc_ids)) - 1]) for i in range(nblk)]
        maxes = [float(part[i * B : (i + 1) * B].max()) for i in range(nblk)]
        r.block_last.append(lasts)
        r.block_max.append(maxes)
        self._n_postings += len(doc_ids)

    def finish(
        self, doc_ids: np.ndarray, dl: np.ndarray, lineage: dict
    ) -> dict:
        self._post.close()
        r = self._rows
        dict_tbl = pa.table(
            {
                "term": pa.array(r.term, pa.string()),
                "df": pa.array(r.df, pa.int64()),
                "cf": pa.array(r.cf, pa.int64()),
                "max_tf": pa.array(r.max_tf, pa.int32()),
                "doc_off": pa.array(r.doc_off, pa.int64()),
                "doc_len": pa.array(r.doc_len, pa.int64()),
                "tf_off": pa.array(r.tf_off, pa.int64()),
                "tf_len": pa.array(r.tf_len, pa.int64()),
                "block_last": pa.array(r.block_last, pa.list_(pa.int64())),
                "block_max": pa.array(r.block_max, pa.list_(pa.float32())),
            }
        )
        pq.write_table(dict_tbl, self.tmp / "dict.parquet")
        np.save(self.tmp / "docids.npy", np.asarray(doc_ids, dtype=np.int64))
        np.save(self.tmp / "dl.npy", np.asarray(dl, dtype=np.int32))
        manifest = {
            "version": INDEX_FORMAT_VERSION,
            "codec": codec.CODEC_VERSION,
            "shard_id": self.shard_id,
            "base_doc_id": self.base,
            "n_terms": len(r.term),
            "n_postings": self._n_postings,
            "n_docs": int(len(doc_ids)),
            "postings_bytes": self._off,
            "k1": self.cfg.k1,
            "b": self.cfg.b,
            "avgdl": self.avgdl,
            "postings_block": self.cfg.postings_block,
            "wall_s": round(time.time() - self._t0, 3),
            **lineage,
        }
        atomic_write_json(self.tmp / "manifest.json", manifest)
        if self.final_dir.exists():
            shutil.rmtree(self.final_dir)
        os.replace(self.tmp, self.final_dir)
        return manifest


# ---------------------------------------------------------------------------
# Shard reader (query side; mmap'd — the actor-pool state, SURVEY.md A7)
# ---------------------------------------------------------------------------


class ShardReader:
    def __init__(self, shard_dir: str | Path):
        d = Path(shard_dir)
        self.manifest = json.loads((d / "manifest.json").read_text())
        self.base = int(self.manifest["base_doc_id"])
        self.post = np.memmap(d / "postings.bin", dtype=np.uint8, mode="r") if (
            self.manifest["postings_bytes"] > 0
        ) else np.zeros(0, dtype=np.uint8)
        t = pq.read_table(d / "dict.parquet")
        self.terms = np.asarray(t["term"], dtype=object)
        self.df = np.asarray(t["df"], dtype=np.int64)
        self.cf = np.asarray(t["cf"], dtype=np.int64)
        self.doc_off = np.asarray(t["doc_off"], dtype=np.int64)
        self.doc_len = np.asarray(t["doc_len"], dtype=np.int64)
        self.tf_off = np.asarray(t["tf_off"], dtype=np.int64)
        self.tf_len = np.asarray(t["tf_len"], dtype=np.int64)
        self.block_last = t["block_last"].combine_chunks()
        self.block_max = t["block_max"].combine_chunks()
        self.docids = np.load(d / "docids.npy", mmap_mode="r")
        self.dl = np.load(d / "dl.npy", mmap_mode="r")

    def term_index(self, term: str) -> int | None:
        i = int(np.searchsorted(self.terms, term))
        if i < len(self.terms) and self.terms[i] == term:
            return i
        return None

    def postings(self, ti: int) -> tuple[np.ndarray, np.ndarray]:
        d = codec.decode_doc_ids(
            self.post[self.doc_off[ti] : self.doc_off[ti] + self.doc_len[ti]], self.base
        )
        tf = codec.decode_tfs(self.post[self.tf_off[ti] : self.tf_off[ti] + self.tf_len[ti]])
        return d, tf

    def postings_blocks(self, ti: int, block_sel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Decode only selected blocks — requires full decode of the gap
        stream up to each block in this byte-aligned codec, so we decode all
        and slice; a bit-packed FoR upgrade makes this a true partial decode.
        Used by the AND-mode block skipper for its candidate filtering."""
        d, tf = self.postings(ti)
        B = self.manifest["postings_block"]
        keep = np.zeros(len(d), dtype=bool)
        for bi in block_sel:
            keep[bi * B : (bi + 1) * B] = True
        return d[keep], tf[keep]

    def doc_length(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.docids, doc_ids)
        return np.asarray(self.dl)[idx]

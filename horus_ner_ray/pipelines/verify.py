"""Index integrity verification — the fsck/CheckIndex maintenance
operation (Lucene's ``CheckIndex``; Elasticsearch's corruption checks).

``verify_index`` cross-checks every piece of published metadata against
the data it describes, using footer/metadata reads wherever possible so
the default pass is cheap (O(#files) metadata operations, no postings
decode):

- stats.json vs the published shard set (count, format version, BM25
  params, avgdl consistency with total_tokens/n_docs);
- per-shard manifest (n_terms, n_postings, n_docs, postings_bytes) vs
  the actual dict.parquet / docids.npy / postings.bin sizes;
- the global df table vs a recomputation from the shard dictionaries
  (exact table equality — the same derivation _write_df_table uses);
- docstore row count vs stats n_docs;
- tombstones: sorted, unique, non-empty-file sanity, and with
  ``deep=True`` a membership check that every tombstoned id exists in
  the docstore (column-pruned doc_id scan);
- hygiene: no stray ``*.tmp`` files/dirs, no maintenance markers.

Returns a report dict with ``ok=True`` and the checked counts; raises
``IndexCorruption`` listing every failed check otherwise (all checks
run — the report names everything wrong, not just the first)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

from horus_ner_ray.state.shards import INDEX_FORMAT_VERSION, IndexPaths


class IndexCorruption(RuntimeError):
    """Raised by verify_index; ``problems`` lists every failed check."""

    def __init__(self, problems: list[str]):
        super().__init__(
            f"{len(problems)} integrity problem(s): " + "; ".join(problems))
        self.problems = problems


def verify_index(index_dir: str | Path, deep: bool = False) -> dict:
    paths = IndexPaths(index_dir)
    problems: list[str] = []

    for marker in ("resharding.json", "compacting.json"):
        if (paths.root / marker).exists():
            problems.append(f"maintenance marker {marker} present "
                            "(incomplete index state)")
    if not paths.stats_json.exists():
        raise IndexCorruption(problems + ["stats.json missing"])
    stats = json.loads(paths.stats_json.read_text())

    shard_dirs = paths.published_shards()
    if len(shard_dirs) != int(stats["n_shards"]):
        problems.append(
            f"stats claim {stats['n_shards']} shards, "
            f"{len(shard_dirs)} published shard dirs found")

    n_docs_shards = 0
    n_terms = 0
    import pyarrow as pa

    dict_tables = []
    for d in shard_dirs:
        mpath = d / "manifest.json"
        if not mpath.exists():
            problems.append(f"{d.name}: manifest.json missing")
            continue
        m = json.loads(mpath.read_text())
        if m.get("version") != INDEX_FORMAT_VERSION:
            problems.append(
                f"{d.name}: format version {m.get('version')} != engine "
                f"{INDEX_FORMAT_VERSION}")
        for key, want in (("k1", stats["k1"]), ("b", stats["b"]),
                          ("avgdl", stats["avgdl"])):
            if m.get(key) != want:
                problems.append(
                    f"{d.name}: {key}={m.get(key)} != stats {want} "
                    "(stale shard from an earlier build?)")
        dt = pq.read_table(d / "dict.parquet")
        if len(dt) != int(m["n_terms"]):
            problems.append(
                f"{d.name}: dict has {len(dt)} terms, manifest says "
                f"{m['n_terms']}")
        docids = np.load(d / "docids.npy", mmap_mode="r")
        if len(docids) != int(m["n_docs"]):
            problems.append(
                f"{d.name}: docids has {len(docids)} docs, manifest says "
                f"{m['n_docs']}")
        pb = (d / "postings.bin").stat().st_size
        if pb != int(m["postings_bytes"]):
            problems.append(
                f"{d.name}: postings.bin is {pb} bytes, manifest says "
                f"{m['postings_bytes']}")
        if len(dt):
            sdf = int(pa.compute.sum(dt["df"]).as_py())
            if sdf != int(m["n_postings"]):
                problems.append(
                    f"{d.name}: sum(df)={sdf} != manifest n_postings "
                    f"{m['n_postings']}")
        n_docs_shards += len(docids)
        n_terms += len(dt)
        dict_tables.append(dt.select(["term", "df", "cf"]))

    # global df table == recomputation from the shard dictionaries
    if not paths.df_parquet.exists():
        problems.append("df.parquet missing")
    elif dict_tables:
        import pyarrow as pa

        cat = pa.concat_tables([t for t in dict_tables if len(t)])
        if len(cat):
            g = (cat.group_by("term", use_threads=False)
                 .aggregate([("df", "sum"), ("cf", "sum")])
                 .sort_by([("term", "ascending")]))
            want = pa.table({"term": g["term"], "df": g["df_sum"],
                             "cf": g["cf_sum"]})
            got = pq.read_table(paths.df_parquet)
            if not got.equals(want.cast(got.schema)):
                problems.append(
                    "df.parquet does not match the shard dictionaries")

    # docstore row count vs stats (docstore mirrors EVERY corpus row,
    # including zero-token docs absent from shard docids)
    store_rows = 0
    store_files = sorted(paths.docstore.glob("part-*.parquet"))
    for f in store_files:
        store_rows += pq.ParquetFile(f).metadata.num_rows
    if store_rows != int(stats["n_docs"]):
        problems.append(
            f"docstore holds {store_rows} rows, stats claim "
            f"{stats['n_docs']} docs")

    # tombstone sanity (+ optional deep membership scan)
    from horus_ner_ray.pipelines.delete import read_tombstones

    dead = read_tombstones(paths.root)
    n_dead = 0
    if dead is not None:
        n_dead = int(len(dead))
        if not (np.all(np.diff(dead) > 0)):
            problems.append("tombstones are not sorted-unique")
        if deep and store_files:
            import pyarrow.dataset as pads

            t = pads.dataset([str(f) for f in store_files]).to_table(
                columns=["doc_id"],
                filter=pads.field("doc_id").isin(dead))
            found = np.unique(np.asarray(t["doc_id"], dtype=np.int64))
            if len(found) != n_dead:
                problems.append(
                    f"{n_dead - len(found)} tombstoned ids not present in "
                    "the docstore (stale tombstones?)")

    # hygiene: stray in-flight publishes anywhere in the tree
    stray = [str(p.relative_to(paths.root))
             for p in paths.root.rglob("*.tmp")]
    if stray:
        problems.append(f"stray tmp artifacts: {stray[:5]}")

    if problems:
        raise IndexCorruption(problems)
    return {
        "ok": True,
        "n_shards": len(shard_dirs),
        "n_docs": int(stats["n_docs"]),
        "docstore_rows": store_rows,
        "shard_docids": n_docs_shards,
        "dict_terms_total": n_terms,
        "n_deleted": n_dead,
        "deep": bool(deep),
    }

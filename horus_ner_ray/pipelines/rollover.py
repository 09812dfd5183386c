"""Index rollover / ILM write path (ES ``_rollover`` with the max_docs
condition): a rollover TARGET is a directory holding an ordered
sequence of ordinary indexes ("generations") plus a ``rollover.json``
manifest.  Ingest routes each fragment to the ACTIVE (last) generation
while its doc count stays within ``max_docs`` (``append_fragments`` —
no re-tokenize of what's already there), otherwise SEALS it and starts
a new generation — the standard time-/size-partitioned write path of a
long-lived search deployment.

Query the whole target as one index through ``rollover_engine`` (a
``FederatedEngine`` over the generations — combined statistics, bitwise
merged-index parity per tests/test_federate.py), or open any sealed
generation directly; the ordinary per-index maintenance ops (delete /
compact / snapshot / reshard) apply to each generation unchanged.

Scale notes: a generation is an ordinary resumable two-phase index, so
rolling over is O(1) metadata; the manifest is O(#generations) driver
state; fragment doc counts come from Parquet footer metadata (no data
read on the routing decision).  Requires ``doc_id_mode="hash"`` —
append needs it, and hash ids keep generations' doc spaces disjoint
for the federated merge.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow.parquet as pq

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.state.shards import atomic_write_json

ROLLOVER_MANIFEST = "rollover.json"


def _load_manifest(root: Path) -> dict:
    p = root / ROLLOVER_MANIFEST
    if p.exists():
        return json.loads(p.read_text())
    return {"version": 1, "generations": [], "ingested": []}


def rollover_indexes(root: str | Path) -> list[str]:
    """The target's generation index dirs, oldest first."""
    root = Path(root)
    return [str(root / g["dir"]) for g in
            _load_manifest(root)["generations"]]


def rollover_status(root: str | Path) -> dict:
    """The manifest: generations with doc counts + sealed flags."""
    return _load_manifest(Path(root))


def rollover_ingest(root: str | Path, files: list[str],
                    max_docs: int, cfg: PipelineConfig | None = None
                    ) -> dict:
    """Ingest fragments under the rollover policy: per file (in the
    given order), append to the active generation if its doc count stays
    <= ``max_docs``, else seal it and start a new generation (a single
    fragment larger than ``max_docs`` still lands alone in a fresh
    generation — the condition bounds growth, it can't split a
    fragment).  Already-ingested paths are skipped, so re-offering a
    file list is an idempotent no-op and a crashed ingest resumes by
    re-running (each build/append is itself resumable; the manifest
    publishes only after its generation completes).  Returns the
    manifest."""
    from horus_ner_ray.pipelines.build_index import (
        append_fragments,
        build_index,
    )

    if max_docs <= 0:
        raise ValueError(f"max_docs must be > 0, got {max_docs}")
    cfg = cfg or PipelineConfig(num_shards=2, doc_id_mode="hash")
    if cfg.doc_id_mode != "hash":
        raise ValueError(
            "rollover requires doc_id_mode='hash' (append_fragments needs "
            "it, and hash ids keep generations' doc spaces disjoint)")
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    m = _load_manifest(root)
    done = set(m["ingested"])
    for f in files:
        f = str(f)
        if f in done:
            continue
        rows = pq.ParquetFile(f).metadata.num_rows  # footer only
        gens = m["generations"]
        active = gens[-1] if gens and not gens[-1]["sealed"] else None
        if active is not None and active["n_docs"] + rows <= max_docs:
            res = append_fragments(str(root / active["dir"]), [f])
            active["n_docs"] = int(res.n_docs)
        else:
            if active is not None:
                active["sealed"] = True
            gdir = f"gen-{len(gens):05d}"
            res = build_index([f], root / gdir, cfg)
            gens.append({"dir": gdir, "n_docs": int(res.n_docs),
                         "sealed": False})
        m["ingested"].append(f)
        done.add(f)
        atomic_write_json(root / ROLLOVER_MANIFEST, m)
    return m


def rollover_engine(root: str | Path, cache_postings: int = 0):
    """One query surface over every generation: a FederatedEngine with
    federation-combined statistics — every supported query mode scores
    as the fully merged index would."""
    from horus_ner_ray.pipelines.federate import FederatedEngine

    dirs = rollover_indexes(root)
    if not dirs:
        raise ValueError(f"no generations under {root} — ingest first")
    return FederatedEngine(dirs, cache_postings=cache_postings)

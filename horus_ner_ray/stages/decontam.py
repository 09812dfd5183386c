"""Benchmark decontamination: flag corpus docs sharing any word k-gram
with a held-out benchmark set — the cross-set contamination sweep every
LLM training-data pipeline runs before release (distinct from dedup:
the right side is a different, small corpus and the output is a per-doc
overlap count, not pairs).

Shape (100 TB): the benchmark side reduces to its DISTINCT shingle-hash
set via per-batch partials (benchmark suites are small by nature — the
bound is the benchmark's k-gram vocabulary, not the corpus); that sorted
set broadcasts once (`ray.put`), and the corpus streams through one
`map_batches` whose per-doc overlap counts are final (each doc lives in
exactly one batch) — no shuffle at all.  A corpus-sized right side would
swap the broadcast for the bloom semi-join of stages/joins.py.

Matching is over the 64-bit shingle hashes of stages/dedupe
(`_shingle_hashes` — the minhash hot path's flat vectorized shingler);
the SQL oracle compares the shingle STRINGS, equal modulo hash
collisions (absent at oracle scale — the `fingerprint` equivalence
argument).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horus_ner_ray.stages.dedupe import _shingle_hashes
from horus_ner_ray.util import worker_runtime_env


def decontaminate_dataset(docs_ds, bench_ds, k: int = 3,
                          text_col: str = "text", id_col: str = "doc_id"):
    """One row per CONTAMINATED corpus doc: (doc_id, n_shared) where
    n_shared = number of the doc's distinct k-shingles that occur
    anywhere in the benchmark set.  Docs shorter than k tokens have no
    shingles and cannot be flagged (shared semantics with the SQL
    oracle's generate_series window)."""
    import ray

    def bench_hashes(batch: pa.Table) -> pa.Table:
        h, _lens = _shingle_hashes(batch[text_col], k, sentinel=False)
        return pa.table({"h": pa.array(np.unique(h).astype(np.int64),
                                       pa.int64())})

    parts = (
        bench_ds.select_columns([text_col])
        .map_batches(bench_hashes, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=worker_runtime_env())
        .to_pandas()
    )
    bset = (np.unique(parts["h"].to_numpy(np.int64))
            if len(parts) else np.zeros(0, np.int64))
    ref = ray.put(bset) if ray.is_initialized() else bset

    def probe(batch: pa.Table) -> pa.Table:
        bs = ray.get(ref) if ray.is_initialized() else ref
        ids = np.asarray(batch[id_col], dtype=np.int64)
        h, lens = _shingle_hashes(batch[text_col], k, sentinel=False)
        hh = h.astype(np.int64)
        parents = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        if len(bs) and len(hh):
            pos = np.minimum(np.searchsorted(bs, hh), len(bs) - 1)
            hit = bs[pos] == hh
        else:
            hit = np.zeros(len(hh), dtype=bool)
        cnt = np.bincount(parents[hit], minlength=len(ids))
        m = cnt > 0
        return pa.table({
            "doc_id": pa.array(ids[m], pa.int64()),
            "n_shared": pa.array(cnt[m].astype(np.int64), pa.int64()),
        })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True,
        runtime_env=worker_runtime_env())

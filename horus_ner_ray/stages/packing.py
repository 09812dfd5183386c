"""Greedy sequence packing — the LLM-training batch constructor.

Training pipelines concatenate documents into fixed-capacity context
windows ("sequence packing", e.g. the T5 / GPT data loaders) so short
documents don't waste padding.  This stage assigns every doc a bin id
under the classic greedy first-fit-in-order rule: walk docs in id
order, keep adding to the current bin while the token count fits, open
a new bin when it would overflow (docs longer than the capacity get a
bin of their own — never split).

**Partitioning assumption (the 100-TB design):** packing is sequential
by nature, so bins are scoped to fixed doc-id RANGES of ``range_size``
docs — a bin never spans a range boundary.  Ranges are independent and
embarrassingly parallel (one small ``map_groups`` kernel per range over
its <= range_size metadata rows — the TOKEN data never moves), the
result is a pure function of (doc ids, token counts, capacity,
range_size), and a resumable run can skip finished ranges.  The waste
is at most one underfull bin per range.  The per-range walk is
re-derivable as a recursive CTE, which is what the ``packed_sequences``
conformance query hash-checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.termstats import doc_lengths_dataset
from horus_ner_ray.util import worker_runtime_env as _rte


def pack_sequences(ds, capacity: int, range_size: int = 128,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Dataset(docs) -> Dataset(doc_id, dl, bin_id): token counts via the
    shared tokenizer rule, then per-range greedy first-fit.  Global
    ``bin_id = range_id * range_size + bin_in_range`` (every bin holds
    >= 1 doc, so bins-per-range <= range_size and ids never collide)."""
    if capacity <= 0 or range_size <= 0:
        raise ValueError("capacity and range_size must be > 0")

    dl = doc_lengths_dataset(ds, text_col=text_col, id_col=id_col)

    def add_range(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        return batch.append_column(
            "range_id", pa.array(ids // range_size, pa.int64()))

    def pack_range(df: pd.DataFrame) -> pd.DataFrame:
        # per-range sequential walk over <= range_size METADATA rows
        # (doc_id, dl) — deliberately a scalar loop; the corpus itself
        # never enters this kernel
        df = df.sort_values("doc_id", kind="stable")
        bins = np.empty(len(df), dtype=np.int64)
        fill = 0
        b = 0
        for i, n in enumerate(df["dl"].to_numpy()):
            if fill > 0 and fill + n > capacity:
                b += 1
                fill = 0
            bins[i] = b
            fill += n
        rid = df["range_id"].to_numpy()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "dl": df["dl"].to_numpy(),
            "bin_id": rid * range_size + bins,
        })

    return (dl.map_batches(add_range, batch_format="pyarrow",
                           zero_copy_batch=True, runtime_env=_rte())
            .groupby("range_id")
            .map_groups(pack_range, batch_format="pandas"))


def packing_stats(packed) -> dict:
    """Summary over a packed dataset: bins, docs, tokens, mean fill."""
    df = packed.to_pandas()
    by_bin = df.groupby("bin_id")["dl"].sum()
    return {
        "n_docs": int(len(df)),
        "n_bins": int(df["bin_id"].nunique()),
        "total_tokens": int(df["dl"].sum()),
        "max_bin_tokens": int(by_bin.max()) if len(by_bin) else 0,
    }

"""k-fold cross-validation for the trained classifiers (the evaluation
loop the reference runs over its benchmark splits, reference:
src/.../benchmarking.py:278-348 — here deterministic and distributed).

Folds are content-keyed (``splitmix64(doc_id XOR seed) % k``), so the
assignment is partitioning- and cluster-size-independent and the SQL
oracle re-derives it exactly.  Per fold, a multinomial NB fits on the
OTHER folds (the two vocab-bounded combiner aggregations of
``classify.fit_multinomial_nb``) and scores the held-out fold through
the broadcast actor pool; the k scored datasets UNION into one
streaming result — nothing corpus-sized lands on the driver.

Scale note: the per-fold train/test filters re-read the (column-pruned)
source k times rather than pinning a materialized copy in the object
store — at 100 TB, re-scanning three columns beats holding the corpus
resident; callers with cheap storage can materialize upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.sketches import splitmix64
from horus_ner_ray.util import worker_runtime_env as _rte


def assign_folds(ds, k_folds: int, seed: int = 17,
                 id_col: str = "doc_id"):
    """Appends ``fold = splitmix64(id XOR seed) % k`` — pure map."""
    if k_folds < 2:
        raise ValueError(f"k_folds must be >= 2, got {k_folds}")

    def add(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        f = (splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
             % np.uint64(k_folds)).astype(np.int64)
        return batch.append_column("fold", pa.array(f, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow",
                          zero_copy_batch=True, runtime_env=_rte())


def nb_cross_val(ds, k_folds: int = 3, seed: int = 17,
                 label_col: str = "lang", text_col: str = "text",
                 id_col: str = "doc_id", alpha: float = 1.0):
    """Out-of-fold NB predictions for EVERY row: per fold, fit on the
    complement, score the held-out fold (broadcast model, actor pool),
    union the k streaming results.  Output columns: (id_col, label_col,
    fold, pred_label, score_e9) — exact integers, argmax ties to the
    smallest class label (the classify.py contract)."""
    from horus_ner_ray.stages.classify import (
        fit_multinomial_nb,
        nb_score_dataset,
    )

    base = assign_folds(ds.select_columns([id_col, label_col, text_col]),
                        k_folds, seed=seed, id_col=id_col)

    def keep(fold: int, equal: bool):
        import pyarrow.compute as pc

        def fn(batch: pa.Table) -> pa.Table:
            m = pc.equal(batch["fold"], fold)
            return batch.filter(m if equal else pc.invert(m))

        return fn

    scored = []
    for f in range(k_folds):
        train = base.map_batches(keep(f, False), batch_format="pyarrow",
                                 zero_copy_batch=True, runtime_env=_rte())
        test = base.map_batches(keep(f, True), batch_format="pyarrow",
                                zero_copy_batch=True, runtime_env=_rte())
        model = fit_multinomial_nb(train, label_col=label_col,
                                   text_col=text_col, alpha=alpha)
        # autoscaling pool (min 1): the k scored legs execute as ONE
        # unioned plan, and k fixed-size pools each pinning `concurrency`
        # CPUs deadlock the streaming executor on small clusters (3 folds
        # x 2 actors > a 4-CPU test session leaves no CPU for the task
        # stages).  min=1 keeps every leg schedulable at any width.
        scored.append(nb_score_dataset(
            test, model, text_col=text_col,
            keep_cols=[id_col, label_col, "fold"],
            concurrency=(1, 2)))
    out = scored[0]
    for s in scored[1:]:
        out = out.union(s)
    return out


def cv_fold_accuracy(cv_frame: pd.DataFrame, label_col: str = "lang"
                     ) -> pd.DataFrame:
    """Per-fold (n, n_correct) plus the pooled 'all' row — exact
    integers from the out-of-fold prediction table."""
    rows = []
    for f, g in cv_frame.groupby("fold", sort=True):
        rows.append({"fold": int(f), "n": len(g),
                     "n_correct": int((g[label_col]
                                       == g["pred_label"]).sum())})
    rows.append({"fold": -1, "n": len(cv_frame),
                 "n_correct": int((cv_frame[label_col]
                                   == cv_frame["pred_label"]).sum())})
    return pd.DataFrame(rows).astype(np.int64)

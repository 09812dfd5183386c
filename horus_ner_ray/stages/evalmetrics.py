"""Evaluation / metrics operators (SURVEY.md G8 family).

The reference ships per-class hit counting and confusion matrices
(reference: src/eval.py:67-134, simple_indicators/report.py:17-50,
benchmarking.py:281-290).  Re-expressed as combiner aggregations: the
confusion matrix is a per-batch (label, pred) partial count -> one tiny
groupby (classes^2 rows move, never the dataset), and precision/recall/F1
derive from that matrix on the driver — it is classes^2-sized, the one
structure in this family that is LEGITIMATELY driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def confusion_matrix_dataset(ds, label_col: str = "label",
                             pred_col: str = "pred_label"):
    """Dataset with true/pred columns -> Dataset(label, pred, n)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([label_col, pred_col]).group_by(
            [label_col, pred_col], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"label": g[label_col], "pred": g[pred_col],
                         "n": g["count_all"].cast(pa.int64())})

    return (
        ds.select_columns([label_col, pred_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                     runtime_env=_rte())
        .groupby(["label", "pred"]).aggregate(Sum("n", alias_name="n"))
    )


def precision_recall_frame(cm: pd.DataFrame) -> pd.DataFrame:
    """Confusion matrix rows (label, pred, n) -> per-class metrics:
    (cls, tp, fp, fn, precision, recall, f1).  Classes = union of labels
    and predictions; zero denominators yield 0.0 (the sklearn
    zero_division=0 convention)."""
    classes = sorted(set(cm["label"]) | set(cm["pred"]))
    rows = []
    for c in classes:
        tp = int(cm.loc[(cm["label"] == c) & (cm["pred"] == c), "n"].sum())
        fp = int(cm.loc[(cm["label"] != c) & (cm["pred"] == c), "n"].sum())
        fn = int(cm.loc[(cm["label"] == c) & (cm["pred"] != c), "n"].sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        rows.append({"cls": c, "tp": tp, "fp": fp, "fn": fn,
                     "precision": p, "recall": r, "f1": f1})
    out = pd.DataFrame(rows)
    return out.astype({"tp": np.int64, "fp": np.int64, "fn": np.int64})


def accuracy_from_confusion(cm: pd.DataFrame) -> float:
    total = int(cm["n"].sum())
    if not total:
        return 0.0
    return int(cm.loc[cm["label"] == cm["pred"], "n"].sum()) / total

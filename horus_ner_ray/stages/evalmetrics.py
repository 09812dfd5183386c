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


def ranking_metrics_row(run_ids, qrel_ids, k: int = 10) -> dict:
    """IR eval of one ranked result list vs a binary-relevance qrel set
    (the TREC counters, G8's retrieval-side sibling): returns exact-int
    {n_rel, n_hit, mrr_e6, dcg_e9, idcg_e9, ndcg_e6, recall_e6}.

    The integer contract (order-free, SQL-replicable): each relevant
    rank p contributes floor(1e9 / log2(p+1) + 0.5) to dcg_e9 BEFORE
    summation (the bigram-LM e9 move — float log2 happens per position,
    never in an order-dependent float sum); idcg_e9 is the same series
    over ranks 1..min(k, n_rel); ndcg_e6 = floor(dcg/idcg * 1e6 + 0.5);
    mrr_e6 = floor(1e6 / first_relevant_rank + 0.5); recall_e6 =
    floor(n_hit / n_rel * 1e6 + 0.5).  Empty qrels -> all zeros."""
    import math

    run = [int(d) for d in run_ids][:k]
    rels = {int(d) for d in qrel_ids}
    n_rel = len(rels)
    out = {"n_rel": n_rel, "n_hit": 0, "mrr_e6": 0, "dcg_e9": 0,
           "idcg_e9": 0, "ndcg_e6": 0, "recall_e6": 0}
    if n_rel == 0:
        return out
    hit_ranks = [p for p, d in enumerate(run, 1) if d in rels]
    out["n_hit"] = len(hit_ranks)
    if hit_ranks:
        out["mrr_e6"] = math.floor(1e6 / hit_ranks[0] + 0.5)
    out["dcg_e9"] = sum(math.floor(1e9 / math.log2(p + 1) + 0.5)
                        for p in hit_ranks)
    out["idcg_e9"] = sum(math.floor(1e9 / math.log2(p + 1) + 0.5)
                         for p in range(1, min(k, n_rel) + 1))
    out["ndcg_e6"] = math.floor(out["dcg_e9"] / out["idcg_e9"] * 1e6 + 0.5)
    out["recall_e6"] = math.floor(len(hit_ranks) / n_rel * 1e6 + 0.5)
    return out


def team_draft_interleave(run_a, run_b, qid: int, k: int = 10,
                          seed: int = 7) -> list[tuple[int, int, str]]:
    """Team-draft interleaving (Radlinski et al. 2008) of two ranked
    lists — the online-eval mixer: step i (0-based) belongs to round
    i // 2; the round's FIRST pick goes to team
    ['a', 'b'][splitmix64((qid * 1024 + round) XOR seed) % 2], the
    second to the other; each step picks its team's highest-ranked doc
    not yet interleaved.  Documented variant shared with the SQL oracle:
    a step whose team is exhausted emits NO pick (no cross-team
    fallback).  Returns [(rank, doc_id, team)] with rank = 1-based
    sequence of successful picks, at most k."""
    from horus_ner_ray.stages.sketches import splitmix64

    a = [int(d) for d in run_a]
    b = [int(d) for d in run_b]
    picked: set[int] = set()
    out: list[tuple[int, int, str]] = []
    for i in range(2 * k):
        if len(out) >= k:
            break
        rnd = i // 2
        h = int(splitmix64(np.array(
            [np.uint64(qid * 1024 + rnd) ^ np.uint64(seed)],
            dtype=np.uint64))[0])
        first = "a" if h % 2 == 0 else "b"
        team = first if i % 2 == 0 else ("b" if first == "a" else "a")
        lst = a if team == "a" else b
        pick = next((d for d in lst if d not in picked), None)
        if pick is None:
            continue
        picked.add(pick)
        out.append((len(out) + 1, pick, team))
    return out

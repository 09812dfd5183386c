"""Learned classifier over DECODED media content (SURVEY.md A4 residual).

The reference scores image CONTENT with trained models — 12 SVMs over
SIFT bag-of-visual-words vocabularies (reference:
src/core/feature_extraction/object_detection/sift.py:7-37) and a CNN
scorer (reference: src/core/feature_extraction/object_detection/
cnn.py:71-159, which reloads weights per call — the anti-pattern the
actor-pool shape below fixes).  Here the same capability is
Ray-Data-native and integer-exact end-to-end:

1. REAL stdlib pixel decode (stages/media_codecs.py PNG/BMP) inside an
   actor-pool ``map_batches`` stage — codec state + bin edges once per
   actor in ``__init__``, small batches (binary rows are wide);
2. quantized intensity-histogram features — the bag-of-visual-words
   analogue (each intensity bin is a visual word, the histogram its term
   frequency); counts are exact int64;
3. distributed multinomial-NB fit over the (label, bin, tf) long form —
   per-batch combiner partials, one vocab-sized groupby, the shared
   ``nb_model_from_counts`` tail (e9-int weights);
4. broadcast-once scoring: ``score = prior_e9 + hist @ llh_e9`` is one
   int64 matmul per batch — order-free, reproducible, and replicable
   verbatim in the DuckDB oracle (the histograms inline as VALUES, the
   fit + argmax re-derive in SQL; see __ray_entry__._sql_media_nb).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.stages.classify import NBModel, nb_model_from_counts
from horus_ner_ray.util import worker_runtime_env as _rte

N_BINS = 16
BIN_TERMS = np.array([f"b{i:02d}" for i in range(N_BINS)], dtype=object)
# zero-padded bin names sort lexicographically in bin order, so
# NBModel.terms (sorted) aligns with histogram column order by construction


def synth_labeled_media_table(n: int = 96, seed: int = 42) -> pa.Table:
    """Deterministic LABELED media corpus: four image classes with
    distinct intensity structure, rendered as genuine PNG (mixed scanline
    filters) and BMP containers so the classifier consumes real decoded
    pixels, not metadata.

    dark: low-intensity noise; bright: high-intensity noise; banded:
    alternating dark/bright rows (bimodal histogram); flat: a single
    mid-gray level per image.
    """
    from horus_ner_ray.stages.media_codecs import bmp_encode, png_encode

    rng = np.random.RandomState(seed)
    classes = ("banded", "bright", "dark", "flat")
    mids, labels, types, payloads, ws, hs = [], [], [], [], [], []
    for i in range(n):
        label = classes[i % len(classes)]
        h, w = int(rng.randint(8, 32)), int(rng.randint(8, 32))
        if label == "dark":
            px = rng.randint(0, 80, size=(h, w), dtype=np.uint8)
        elif label == "bright":
            px = rng.randint(176, 256, size=(h, w), dtype=np.uint8)
        elif label == "banded":
            row = np.where(np.arange(h) % 2 == 0, 16, 240).astype(np.uint8)
            px = np.repeat(row[:, None], w, axis=1)
            px = (px.astype(np.int64)
                  + rng.randint(-8, 9, size=(h, w))).clip(0, 255).astype(np.uint8)
        else:  # flat
            px = np.full((h, w), int(rng.randint(96, 160)), dtype=np.uint8)
        if i % 2 == 0:
            payloads.append(png_encode(px, row_filters=rng.randint(0, 5, size=h)))
            types.append("image/png")
        else:
            payloads.append(bmp_encode(np.repeat(px[:, :, None], 3, axis=2)))
            types.append("image/bmp")
        mids.append(i)
        labels.append(label)
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "label": pa.array(labels, pa.string()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    })


class MediaHistFeatures:
    """Actor-pool stage: decode pixels, emit the exact int64 histogram.

    ``__init__`` holds codec + bin state once per actor (the load-once fix
    for the reference's reload-per-call CNN scorer); ``__call__`` decodes
    one small batch.  Output: (media_id, [label,] hist list<int64>[16],
    n_px)."""

    def __init__(self, keep_label: bool = True):
        from horus_ner_ray.stages import media_codecs

        self._decode = media_codecs.decode_image  # bound once per actor
        self.keep_label = keep_label

    def __call__(self, batch: pa.Table) -> pa.Table:
        hists = np.zeros((len(batch), N_BINS), dtype=np.int64)
        n_px = np.zeros(len(batch), dtype=np.int64)
        for i, p in enumerate(batch["payload"]):
            px = self._decode(p.as_py()).reshape(-1)
            n_px[i] = len(px)
            if len(px):
                hists[i] = np.bincount(px.astype(np.int64) >> 4,
                                       minlength=N_BINS)[:N_BINS]
        out = {
            "media_id": batch["media_id"],
            "hist": pa.FixedSizeListArray.from_arrays(
                pa.array(hists.reshape(-1), pa.int64()), N_BINS),
            "n_px": pa.array(n_px, pa.int64()),
        }
        if self.keep_label and "label" in batch.schema.names:
            out["label"] = batch["label"]
        return pa.table(out)


def media_hist_dataset(media_ds, keep_label: bool = True,
                       concurrency: int = 2, batch_size: int = 64):
    cols = ["media_id", "payload"] + (
        ["label"] if keep_label and "label" in media_ds.schema().names else [])
    return media_ds.select_columns(cols).map_batches(
        MediaHistFeatures,
        fn_constructor_kwargs={"keep_label": keep_label},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1,
        runtime_env=_rte(),
    )


def fit_media_nb(hist_ds, alpha: float = 1.0) -> NBModel:
    """Distributed NB fit over histogram rows: per-batch (label, bin, tf)
    combiner partials (<= 16 x classes rows per batch) -> tiny groupby ->
    the shared integer-weight tail."""
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch["label"], dtype=object)
        hist = np.asarray(batch["hist"].combine_chunks().flatten(),
                          dtype=np.int64).reshape(len(batch), N_BINS)
        ul, inv = np.unique(labels.astype(str), return_inverse=True)
        sums = np.zeros((len(ul), N_BINS), dtype=np.int64)
        np.add.at(sums, inv, hist)
        nd = np.bincount(inv, minlength=len(ul)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ul.astype(object), N_BINS + 1)),
            "term": pa.array(
                np.tile(np.r_[BIN_TERMS, ["__nd__"]], len(ul)), pa.string()),
            "c": pa.array(np.c_[sums, nd[:, None]].reshape(-1), pa.int64()),
        })

    parts = (
        hist_ds.map_batches(count_partial, batch_format="pyarrow",
                            zero_copy_batch=True, runtime_env=_rte())
        .groupby(["label", "term"]).aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # <= classes x 17 rows
    )
    nd_rows = parts[parts["term"] == "__nd__"]
    counts = parts[(parts["term"] != "__nd__") & (parts["c"] > 0)]
    ndc = pd.DataFrame({"label": nd_rows["label"].to_numpy(object),
                        "nd": nd_rows["c"].to_numpy(np.int64)})
    return nb_model_from_counts(counts.reset_index(drop=True), ndc,
                                alpha=alpha)


class _MediaNBScorer:
    """map_batches actor: weights fetched once per actor; scoring is one
    int64 matmul (exact) per batch."""

    def __init__(self, model_ref):
        import ray

        m: NBModel = ray.get(model_ref) if not isinstance(model_ref, NBModel) \
            else model_ref
        self.model = m
        # dense [N_BINS, C] weight matrix: bins absent from the fitted
        # vocabulary score at the unseen-term default (they only matter
        # when tf > 0 there)
        full = np.tile(m.default_e9, (N_BINS, 1))
        pos = np.searchsorted(BIN_TERMS, m.terms)
        full[pos] = m.llh_e9
        self.w = full  # int64
        self.classes = m.classes

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.model
        hist = np.asarray(batch["hist"].combine_chunks().flatten(),
                          dtype=np.int64).reshape(len(batch), N_BINS)
        scores = m.priors_e9[None, :] + hist @ self.w  # exact int64
        best = np.argmax(scores, axis=1)  # first max = smallest class label
        out = {n: batch[n] for n in batch.schema.names if n != "hist"}
        out["pred_label"] = pa.array(self.classes[best].astype(object),
                                     pa.string())
        out["score_e9"] = pa.array(scores[np.arange(len(batch)), best],
                                   pa.int64())
        return pa.table(out)


def media_nb_predictions(media_ds, alpha: float = 1.0, concurrency: int = 2,
                         checkpoint_dir: str | None = None):
    """Decode once, fit on the labeled rows, score every row ->
    Dataset(media_id, label, n_px, pred_label, score_e9).

    The decoded feature table (17 ints per row — payload bytes dropped)
    is checkpointed to Parquet and re-read by the fit and score passes, so
    the expensive pixel decode runs exactly once and nothing pins the
    feature table in the object store (the bigram-c12 pattern).  The
    caller owns ``checkpoint_dir`` cleanup after consuming the result."""
    import tempfile

    import ray
    import ray.data as rd

    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="horus_media_hist_")
    media_hist_dataset(media_ds, keep_label=True,
                       concurrency=concurrency).write_parquet(str(checkpoint_dir))
    feats = rd.read_parquet(str(checkpoint_dir))
    model = fit_media_nb(feats, alpha=alpha)
    model_ref = ray.put(model) if ray.is_initialized() else model
    return feats.map_batches(
        _MediaNBScorer, fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, num_cpus=1, runtime_env=_rte(),
    )

"""Translation hook (SURVEY.md M10's second half).

The reference calls an external translation web API per sentence when
lang-id says non-English (reference: src/core/translation/azure.py:26-55,
features.py:170-222).  A web call has no place in this engine; the seam is
kept as a pluggable TRANSLATOR — a callable class instantiated once per
actor (``__init__`` loads whatever model/table it needs) and applied per
batch.  Two built-ins:

* ``IdentityTranslator`` — the default no-op (documents the seam).
* ``DictTranslator`` — deterministic word-map lookup (broadcast once via
  the constructor args Ray ships to each actor), the testable stand-in for
  a real MT model; shows the exact shape a model-backed translator takes
  (weights load in ``__init__``, batched inference in ``__call__``).

Only rows whose ``lang_col`` is in ``langs`` are rewritten (the reference
translates only non-English sentences); others pass through untouched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


class IdentityTranslator:
    def __call__(self, texts: list[str]) -> list[str]:
        return texts


class DictTranslator:
    """Whitespace-token word-map translation; unknown words pass through."""

    def __init__(self, mapping: dict[str, str]):
        self.mapping = mapping

    def __call__(self, texts: list[str]) -> list[str]:
        m = self.mapping
        return [" ".join(m.get(w, w) for w in t.split()) for t in texts]


class _TranslateActor:
    """map_batches callable: translator built ONCE per actor."""

    def __init__(self, translator_cls, ctor_kwargs: dict, text_col: str,
                 lang_col: str | None, langs: tuple[str, ...]):
        self.translator = translator_cls(**ctor_kwargs)
        self.text_col = text_col
        self.lang_col = lang_col
        self.langs = frozenset(langs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if self.lang_col is not None and self.lang_col in batch.schema.names:
            langs = batch[self.lang_col].to_pylist()
            sel = [i for i, l in enumerate(langs) if l in self.langs]
        else:
            sel = list(range(len(texts)))
        if sel:
            translated = self.translator([texts[i] or "" for i in sel])
            for i, t in zip(sel, translated):
                texts[i] = t
        out = pd.DataFrame({c: batch[c].to_pandas() for c in batch.schema.names})
        out[self.text_col + "_translated"] = np.asarray(texts, dtype=object)
        return pa.Table.from_pandas(out, preserve_index=False)


def translate_dataset(
    ds,
    translator_cls=IdentityTranslator,
    ctor_kwargs: dict | None = None,
    text_col: str = "text",
    lang_col: str | None = None,
    langs: tuple[str, ...] = ("es", "de", "fr", "ru", "zh", "ja", "ko"),
    concurrency: int = 2,
):
    """Dataset -> Dataset with ``<text_col>_translated`` appended.  The
    translator is stateful actor-pool style: constructed once per actor,
    applied per batch (SURVEY.md A5 expensive-init-once pattern)."""
    return ds.map_batches(
        _TranslateActor,
        fn_constructor_kwargs={
            "translator_cls": translator_cls,
            "ctor_kwargs": ctor_kwargs or {},
            "text_col": text_col,
            "lang_col": lang_col,
            "langs": langs,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
        runtime_env=_rte(),
    )

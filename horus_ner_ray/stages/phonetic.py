"""Phonetic encoding (American Soundex) — the record-linkage blocking
key that groups names by how they SOUND (Robert/Rupert -> R163), the
fifth matching signal after set-overlap / cosine / edit distance / JW.

Reference analogue: the reference's lexical-normalization token tables
(src/core/util/definitions.py) collapse surface variants before
matching; Soundex is the classic rule-based collapse for names.

Algorithm (the standard American Soundex, h/w-transparent variant —
the one used by US Census / jellyfish):
1. letters map to digit classes (bfpv=1 cgjkqsxz=2 dt=3 l=4 mn=5 r=6),
   vowels+y map to 0, h/w are DROPPED ENTIRELY (they do not break a
   run of equal codes — 'Ashcraft' -> A261, the s/c merge across h);
2. consecutive equal codes collapse to one;
3. the FIRST LETTER's own entry is removed (by original position, so a
   leading h/w keeps the next consonant's code — 'wbite' -> W130);
4. zeros (vowel breaks) are removed, the first three digits survive,
   padded with '0'; the uppercased first letter prefixes them.

Fully vectorized over the name axis: names become a uint32 '<U' code
matrix; the h/w filter and the dedup collapse are cumsum-scatter
compactions (the stages/fuzzy.py pattern) — no per-name Python.
The SQL oracle restates steps 1-4 with generate_series + lag().
"""

from __future__ import annotations

import numpy as np

_CODE = np.zeros(26, dtype=np.uint32)
for _c, _d in (("bfpv", 1), ("cgjkqsxz", 2), ("dt", 3), ("l", 4),
               ("mn", 5), ("r", 6)):
    for _ch in _c:
        _CODE[ord(_ch) - 97] = _d
_DROP = {ord("h") - 97, ord("w") - 97}


def soundex_batch(names) -> np.ndarray:
    """Vectorized American Soundex for an array of lowercase [a-z]+
    names.  Returns '<U4' codes (e.g. 'R163'); empty names return ''."""
    a = np.asarray(names, dtype="U")
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype="U4")
    L = a.dtype.itemsize // 4
    Am = (a.view(np.uint32).reshape(n, L) if L
          else np.zeros((n, 0), np.uint32))
    letters = Am - np.uint32(97)
    valid = (Am >= 97) & (Am <= 122)
    keep = valid.copy()
    for d in _DROP:
        keep &= letters != d
    # original positions ride along through both compactions
    pos = np.tile(np.arange(L, dtype=np.int64), (n, 1))
    codes = np.where(valid, _CODE[np.clip(letters, 0, 25)], 0)
    # compaction 1: drop h/w (and padding)
    idx = keep.cumsum(axis=1) - 1
    width = int(keep.sum(axis=1).max()) if L else 0
    c1 = np.full((n, width), -1, dtype=np.int64)
    p1 = np.full((n, width), -1, dtype=np.int64)
    rows, cols = np.nonzero(keep)
    c1[rows, idx[rows, cols]] = codes[rows, cols]
    p1[rows, idx[rows, cols]] = pos[rows, cols]
    # collapse consecutive equal codes
    first = np.zeros_like(c1, dtype=bool)
    if width:
        first[:, 0] = c1[:, 0] >= 0
        first[:, 1:] = (c1[:, 1:] >= 0) & (c1[:, 1:] != c1[:, :-1])
    # step 3: remove the FIRST LETTER's entry (original position 0)
    first &= p1 != 0
    # step 4: remove zeros
    first &= c1 > 0
    out = np.zeros(n, dtype="U4")
    idx2 = first.cumsum(axis=1) - 1
    digits = np.full((n, 3), 0, dtype=np.int64)
    rows, cols = np.nonzero(first)
    sel = idx2[rows, cols] < 3
    digits[rows[sel], idx2[rows, cols][sel]] = c1[rows, cols][sel]
    heads = np.array([s[:1].upper() if s else "" for s in a], dtype="U1")
    for i in range(n):
        if not heads[i]:
            continue
        out[i] = heads[i] + "".join(str(d) for d in digits[i])
    return out


def soundex_dataset(ds, key_col: str):
    """Dataset -> Dataset(key_col, soundex): the phonetic code of every
    DISTINCT key value (distinct-first, the fuzzy_key_pairs contract) —
    a pure per-value function, so the distinct table maps in one
    streaming pass, no further shuffle."""
    import pandas as pd
    import pyarrow as pa

    from horus_ner_ray.util import worker_runtime_env as _rte

    def distinct_partial(batch: pa.Table) -> pa.Table:
        return batch.select([key_col]).group_by(
            key_col, use_threads=False).aggregate([])

    def encode(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pandas().astype(str).to_numpy(object)
        return pa.table({
            key_col: pa.array(keys, pa.string()),
            "soundex": pa.array(
                pd.Series(soundex_batch(keys)).astype(str), pa.string()),
        })

    return (
        ds.select_columns([key_col])
        .map_batches(distinct_partial, batch_format="pyarrow",
                     zero_copy_batch=True, runtime_env=_rte())
        .groupby(key_col).count().drop_columns(["count()"])
        .map_batches(encode, batch_format="pyarrow", runtime_env=_rte())
    )

"""Deterministic synthetic transcript corpus (the engine's primary input).

BASELINE.json ``input_hint`` fixes the schema:
    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

There is no transcripts table in /root/testdata, so tests and benchmarks
synthesize one deterministically (seeded, pure function of (seed, conv index)
— regenerating with the same params is byte-stable regardless of process or
parallelism).  FIXTURES.md section 1 lists the required edge cases; all are
injected into conv 0-2 below, and the Zipf vocabulary + an every-turn marker
term ("sessionmark", df == N) provide the hot-term skew the index build must
handle (north_rule).

Reference analogue: the reference's corpora are token-per-line CoNLL/Ritter
files (reference: src/core/feature_extraction/util.py:816-877); ours is a
Parquet table of turns.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Most-frequent vocabulary ranks are real English stopwords so the text
# analysis stages (stopword ratio, lang-id) have signal; the tail is
# synthetic tokens.
_STOPWORDS = (
    "the to a and of in is you that it for on with as are this be have "
    "from or at was but not they his her she he we can had what all were "
    "when your said there use each which do how their if will up other "
    "about out many then them these so some would make like him into time"
).split()

VOCAB_SIZE = 20_000
_ZIPF_A = 1.07  # Zipf exponent for term frequencies


def _vocab() -> list[str]:
    toks = list(_STOPWORDS)
    toks += [f"tok{i:05d}" for i in range(VOCAB_SIZE - len(toks))]
    return toks


_VOCAB = _vocab()

# Deterministic Zipf-ish sampling: precomputed cumulative weights.
_RANKS = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_W = 1.0 / _RANKS**_ZIPF_A
_CUMW = np.cumsum(_W / _W.sum())


def _sample_terms(rng: np.random.RandomState, n: int) -> list[str]:
    idx = np.searchsorted(_CUMW, rng.random_sample(n), side="right")
    return [_VOCAB[i] for i in idx]


_PUNCT = [",", ".", "!", "?", ";", ":", " —", "…"]
_ROLES_CYCLE = ["user", "assistant"]
_TOOLS = ["search", "python", "bash"]

_BASE_TS = np.datetime64("2025-06-01T00:00:00", "us")


def gen_conv(conv_idx: int, seed: int = 42) -> dict[str, list]:
    """Generate one conversation; pure function of (conv_idx, seed)."""
    rng = np.random.RandomState((seed * 1_000_003 + conv_idx) % (2**32))
    n_turns = 2 + int(rng.zipf(1.6)) % 39  # 2..40, short-skewed
    conv_id = f"conv-{conv_idx:08d}"
    rows: dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}

    for t in range(n_turns):
        role = _ROLES_CYCLE[t % 2]
        tool = ""
        if role == "assistant" and rng.random_sample() < 0.12:
            role, tool = "tool", _TOOLS[int(rng.randint(len(_TOOLS)))]
        n_tok = 5 + int(rng.lognormal(3.2, 0.9)) % 296  # 5..300
        terms = _sample_terms(rng, n_tok)
        # rare, corpus-unique terms (df=1) on ~15% of turns
        if rng.random_sample() < 0.15:
            terms.append(f"rare{conv_idx:06d}x{t:02d}")
        # casing variants: capitalize ~5% of tokens (tokenizer must case-fold)
        for i in range(len(terms)):
            r = rng.random_sample()
            if r < 0.03:
                terms[i] = terms[i].capitalize()
            elif r < 0.04:
                terms[i] = terms[i].upper()
        # punctuation sprinkled between tokens
        out = []
        for w in terms:
            out.append(w)
            if rng.random_sample() < 0.12:
                out.append(_PUNCT[int(rng.randint(len(_PUNCT)))])
        # the every-turn marker term: df == N (hot-term / stopword skew)
        out.append("sessionmark")
        text = " ".join(out)
        rows["conv_id"].append(conv_id)
        rows["turn_idx"].append(t)
        rows["role"].append(role)
        rows["text"].append(text)
        rows["tool"].append(tool)
        rows["ts"].append(_BASE_TS + np.timedelta64(conv_idx * 3600 + t * 13, "s"))
    return rows


# FIXTURES.md edge cases, injected as fixed conversations 0..2.
_EDGE_CONVS: dict[int, list[tuple[str, str, str]]] = {
    0: [  # (role, text, tool)
        ("user", "", ""),                                    # empty text
        ("assistant", "?!… —;;; ..", ""),                    # punctuation-only
        ("user", "alpha beta alpha beta alpha", ""),          # tf>1 in one turn
        ("assistant", "alpha beta alpha beta alpha", ""),     # identical text, distinct doc
        ("user", "The THE the tHe", ""),                      # case variants of one term
    ],
    1: [
        ("user", "uniqueedge1 appears once", ""),             # df=1 terms
        ("assistant", "the of to and in", ""),                # stopwords only
        ("tool", "{\"result\": 42, \"ok\": true}", "python"),  # json-ish text
    ],
    2: [
        ("user", "naïve café über — ascii only tokens survive", ""),  # unicode
        ("assistant", "alpha beta alpha beta alpha", ""),     # identical text again
    ],
}


def _gen_edge_conv(conv_idx: int) -> dict[str, list]:
    conv_id = f"conv-{conv_idx:08d}"
    rows: dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for t, (role, text, tool) in enumerate(_EDGE_CONVS[conv_idx]):
        rows["conv_id"].append(conv_id)
        rows["turn_idx"].append(t)
        rows["role"].append(role)
        rows["text"].append(text)
        rows["tool"].append(tool)
        rows["ts"].append(_BASE_TS + np.timedelta64(conv_idx * 3600 + t * 13, "s"))
    return rows


SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _convs_to_table(lo: int, hi: int, seed: int) -> pa.Table:
    cols: dict[str, list] = {k: [] for k in SCHEMA.names}
    for c in range(lo, hi):
        rows = _gen_edge_conv(c) if c in _EDGE_CONVS else gen_conv(c, seed)
        for k in cols:
            cols[k].extend(rows[k])
    arrs = {
        "conv_id": pa.array(cols["conv_id"], pa.string()),
        "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
        "role": pa.array(cols["role"], pa.string()),
        "text": pa.array(cols["text"], pa.string()),
        "tool": pa.array(cols["tool"], pa.string()),
        "ts": pa.array(np.array(cols["ts"], dtype="datetime64[us]"), pa.timestamp("us")),
    }
    return pa.table(arrs, schema=SCHEMA)


def synth_transcripts(
    out_dir: str | Path,
    n_convs: int = 500,
    seed: int = 42,
    convs_per_file: int = 2000,
    overwrite: bool = False,
) -> Path:
    """Write the corpus as a directory of Parquet part files, one per
    contiguous conv range (the multi-file layout is what the resumable
    fragment-driven index build consumes).  Cached: if a manifest with the
    same params already exists, the existing corpus is reused.
    """
    out = Path(out_dir)
    manifest = out / "_synth_manifest.json"
    params = {"n_convs": n_convs, "seed": seed, "convs_per_file": convs_per_file, "v": 3}
    if manifest.exists() and not overwrite:
        try:
            if json.loads(manifest.read_text()) == params:
                return out
        except (json.JSONDecodeError, OSError):
            pass
    out.mkdir(parents=True, exist_ok=True)
    for f in out.glob("part-*.parquet"):
        f.unlink()
    ranges = [
        (i, lo, min(lo + convs_per_file, n_convs))
        for i, lo in enumerate(range(0, n_convs, convs_per_file))
    ]
    # parallel across part files — each part is a pure function of
    # (lo, hi, seed), so the corpus is byte-identical at any worker count
    if len(ranges) > 4:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(min(32, os.cpu_count() or 4)) as ex:
            list(ex.map(_write_part, [(str(out), i, lo, hi, seed) for i, lo, hi in ranges]))
    else:
        for i, lo, hi in ranges:
            _write_part((str(out), i, lo, hi, seed))
    manifest.write_text(json.dumps(params))
    return out


def _write_part(args: tuple) -> None:
    out, i, lo, hi, seed = args
    tbl = _convs_to_table(lo, hi, seed)
    tmp = Path(out) / f".part-{i:05d}.parquet.tmp"
    pq.write_table(tbl, tmp, row_group_size=65536)
    os.replace(tmp, Path(out) / f"part-{i:05d}.parquet")


def transcript_files(corpus_dir: str | Path) -> list[str]:
    return sorted(str(p) for p in Path(corpus_dir).glob("part-*.parquet"))


# ---------------------------------------------------------------------------
# Reference query set (FIXTURES.md section 2): hot-only, rare-only, mixed,
# absent, case variants, tf-tie — fixed, not random.
# ---------------------------------------------------------------------------

def reference_queries(k: int = 10) -> list[dict]:
    qs = [
        "sessionmark",                 # hot: df == N
        "the",                         # stopword-hot
        "uniqueedge1",                  # df == 1
        "rare000003x01",                # rare synthetic term (may or may not exist)
        "alpha beta",                   # tf-tie: several identical docs
        "The SESSIONMARK",              # case variants
        "zzzqabsent",                   # absent from corpus -> empty result
        "the tok00042 uniqueedge1",     # mixed hot + mid + rare (WAND-ish mix)
        "tok00007 tok00011 tok00013",   # mid-frequency conjunction-ish
        "of to and",                    # all-stopword multi-term
    ]
    return [{"query_id": i, "text": q, "k": k} for i, q in enumerate(qs)]


def corpus_fingerprint(corpus_dir: str | Path) -> str:
    """Stable content hash of the corpus part files (for cache keys)."""
    h = hashlib.sha256()
    for f in transcript_files(corpus_dir):
        st = os.stat(f)
        h.update(f.encode())
        h.update(str(st.st_size).encode())
    return h.hexdigest()[:16]

"""Gopher quality filter, PII redaction, and BPE pair counting."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa


def _table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_gopher_rules_fire_individually():
    from horus_ner_ray.stages.analysis import gopher_quality_batch

    good = " ".join(["sentence"] * 60)
    docs = [
        good,                                     # passes every rule
        "too short",                              # < 50 words
        " ".join(["a"] * 60),                     # mean word len 1 < 3
        " ".join(["1234"] * 60),                  # alpha frac 0 < 0.8
        "\n".join(f"- item {i}" for i in range(60)),   # all bullet lines
        "\n".join(f"line {i}..." for i in range(60)),  # all ellipsis lines
        " ".join(["word#"] * 60),                 # symbol ratio 1 > 0.1
    ]
    out = gopher_quality_batch(_table(docs)).to_pandas()
    assert out["keep"].tolist() == [1, 0, 0, 0, 0, 0, 0]
    assert out.loc[0, "n_words"] == 60
    assert out.loc[2, "mean_word_len_e6"] == 1_000_000
    assert out.loc[3, "alpha_frac_e6"] == 0
    assert out.loc[4, "bullet_frac_e6"] == 1_000_000
    assert out.loc[5, "ellipsis_frac_e6"] == 1_000_000
    assert out.loc[6, "symbol_ratio_e6"] == 1_000_000


def test_gopher_empty_and_null_text():
    from horus_ner_ray.stages.analysis import gopher_quality_batch

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["", None], pa.string())})
    out = gopher_quality_batch(t).to_pandas()
    assert out["n_words"].tolist() == [0, 0]
    assert out["keep"].tolist() == [0, 0]


def test_pii_redaction_counts_and_text():
    from horus_ner_ray.stages.analysis import redact_pii_batch

    docs = [
        "mail a.b-c_9@sub.example.org now",
        "call 555-123-4567 or 555 987 6543",
        "host 192.168.0.1 and 10.0.0.255 up",
        "none here",
        "combo x@y.io 555-000-1111 1.2.3.4",
    ]
    out = redact_pii_batch(_table(docs)).to_pandas()
    assert out["n_email"].tolist() == [1, 0, 0, 0, 1]
    assert out["n_phone"].tolist() == [0, 2, 0, 0, 1]
    assert out["n_ipv4"].tolist() == [0, 0, 2, 0, 1]
    assert out.loc[0, "redacted"] == "mail <EMAIL> now"
    assert out.loc[2, "redacted"] == "host <IP> and <IP> up"
    assert out.loc[3, "redacted"] == "none here"
    assert out.loc[4, "redacted"] == "combo <EMAIL> <PHONE> <IP>"


def test_bpe_pairs_match_bruteforce(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.analysis import bpe_pair_counts_dataset

    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 12)))
        for _ in range(200)
    ] + ["", "solo"]
    want = Counter()
    for t in texts:
        toks = re.findall(r"[a-z0-9]+", t.lower())
        want.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    got = bpe_pair_counts_dataset(
        rd.from_arrow(_table(texts))
    ).to_pandas().set_index("pair")["n"].to_dict()
    assert got == dict(want)

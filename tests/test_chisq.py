"""Chi-square term selection (stages/chisq.py): exact-integer scores vs
a naive per-pair reference, degenerate margins, min_df gate."""

import numpy as np
import pandas as pd
import ray.data as rd

from horus_ner_ray.stages.chisq import chi2_scores, chi2_terms, term_class_df


def _docs():
    rows = [
        (0, "en", "the cat sat"),
        (1, "en", "the cat ran"),
        (2, "en", "the dog sat"),
        (3, "de", "der katze sass"),
        (4, "de", "der hund sass"),
        (5, "de", "der katze lief"),
        (6, "fr", "le chat assis"),
        (7, "fr", "le chien assis"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def _naive(df):
    import re

    n = len(df)
    cls = df["lang"].value_counts().to_dict()
    docs = [(r.lang, set(re.findall(r"[a-z0-9]+", r.text.lower())))
            for r in df.itertuples()]
    vocab = sorted(set().union(*[s for _, s in docs]))
    rows = []
    for lg in sorted(cls):
        for t in vocab:
            a = sum(1 for l, s in docs if l == lg and t in s)
            if a == 0:
                continue  # stage only emits observed (term, class) pairs
            df_t = sum(1 for _, s in docs if t in s)
            b, c = df_t - a, cls[lg] - a
            d = n - a - b - c
            den = (a + b) * (c + d) * (a + c) * (b + d)
            chi2 = 0 if den == 0 else n * (a * d - b * c) ** 2 * 10**6 // den
            rows.append((lg, t, a, df_t, chi2))
    return pd.DataFrame(rows, columns=["label", "term", "df_in_class",
                                       "df_total", "chi2_e6"])


def test_matches_naive(ray_session):
    df = _docs()
    got = chi2_terms(rd.from_pandas(df))
    want = _naive(df)
    pd.testing.assert_frame_equal(
        got.astype({"chi2_e6": np.int64}), want.astype(got.dtypes.to_dict()))


def test_degenerate_margin_zero(ray_session):
    # a term in EVERY document: c+d margin is 0 -> chi2 defined as 0
    df = _docs()
    df["text"] = df["text"] + " shared"
    got = chi2_terms(rd.from_pandas(df))
    assert (got[got["term"] == "shared"]["chi2_e6"] == 0).all()


def test_min_df_gate_and_partials(ray_session):
    df = _docs()
    got = chi2_terms(rd.from_pandas(df), min_df=3)
    assert (got["df_total"] >= 3).all()
    # contingency partials survive arbitrary batching: 1-row blocks
    cont = term_class_df(rd.from_pandas(df).repartition(8)).to_pandas()
    base = term_class_df(rd.from_pandas(df)).to_pandas()
    key = ["term", "label"]
    pd.testing.assert_frame_equal(
        cont.sort_values(key).reset_index(drop=True),
        base.sort_values(key).reset_index(drop=True))

"""Edit-distance fuzzy ER (stages/fuzzy.py) vs scalar references."""

import numpy as np
import pandas as pd
import pytest


def _lev_scalar(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        for i in range(1, la + 1):
            cur[i] = min(cur[i - 1] + 1, prev[i] + 1,
                         prev[i - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[la]


def test_levenshtein_vectorized_matches_scalar():
    from horus_ner_ray.stages.fuzzy import levenshtein_distances

    rng = np.random.RandomState(3)
    alpha = list("abcde")
    pairs = [("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
             ("kitten", "sitting"), ("flaw", "lawn"),
             ("naïve", "naive"), ("ααβ", "αβ")]
    for _ in range(200):
        la, lb = rng.randint(0, 12), rng.randint(0, 12)
        pairs.append(("".join(rng.choice(alpha, la)),
                      "".join(rng.choice(alpha, lb))))
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = levenshtein_distances(a, b)
    want = np.array([_lev_scalar(x, y) for x, y in pairs], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def _want_pairs(names, max_dist):
    uniq = sorted(set(names))
    rows = []
    for i, x in enumerate(uniq):
        for y in uniq[i + 1:]:
            d = _lev_scalar(x, y)
            if d <= max_dist:
                rows.append((x, y, d))
    return (pd.DataFrame(rows, columns=["name_a", "name_b", "dist"])
            .sort_values(["name_a", "name_b"]).reset_index(drop=True))


@pytest.mark.parametrize("n_blocks", [1, 5])
def test_fuzzy_key_pairs_matches_bruteforce(ray_session, n_blocks):
    """Banded pair generation finds EVERY qualifying pair exactly once —
    including pairs straddling a band boundary (len W-1 vs len W) — for
    any input block layout."""
    import ray.data as rd

    from horus_ner_ray.stages.fuzzy import fuzzy_key_pairs

    rng = np.random.RandomState(11)
    vocab = ["rod", "rodz", "ring", "rings", "wring",  # lens 3..5: bands 0/1
             "widget", "widgets", "gadget", "gizmo", "bolt", "bolts",
             "sprocket", "sprockets"]
    names = [vocab[i % len(vocab)] for i in range(300)]
    rng.shuffle(names)
    ds = rd.from_pandas(pd.DataFrame({"p_name": names})).repartition(n_blocks)
    got = (fuzzy_key_pairs(ds, "p_name", max_dist=3).to_pandas()
           .sort_values(["name_a", "name_b"]).reset_index(drop=True))
    got["name_a"] = got["name_a"].astype(object)
    got["name_b"] = got["name_b"].astype(object)
    want = _want_pairs(names, 3)
    # straddle guard: at least one expected pair crosses a band boundary
    w = 4
    assert any(len(a) // w != len(b) // w
               for a, b in zip(want["name_a"], want["name_b"]))
    pd.testing.assert_frame_equal(got, want)


def test_fuzzy_max_block_raises(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.fuzzy import fuzzy_key_pairs

    names = [f"k{i:03d}" for i in range(50)]  # all in one band
    ds = rd.from_pandas(pd.DataFrame({"p_name": names}))
    with pytest.raises(Exception, match="max_block"):
        fuzzy_key_pairs(ds, "p_name", max_dist=3,
                        max_block=10).to_pandas()


def test_jaro_winkler_vs_duckdb_random():
    """The vectorized JW agrees with DuckDB's jaro_winkler_similarity on
    random short strings (the oracle dependency, pinned)."""
    import duckdb
    import numpy as np

    from horus_ner_ray.stages.fuzzy import jaro_winkler_similarities

    rng = np.random.default_rng(17)
    alphabet = list("abcdef")
    pairs = []
    for _ in range(400):
        la, lb = rng.integers(0, 10, 2)
        pairs.append(("".join(rng.choice(alphabet, la)),
                      "".join(rng.choice(alphabet, lb))))
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = jaro_winkler_similarities(a, b)
    con = duckdb.connect()
    for (x, y), g in zip(pairs, got):
        want = con.sql(
            "select jaro_winkler_similarity(?, ?)", params=[x, y]
        ).fetchall()[0][0]
        assert abs(g - want) < 1e-12, (x, y, g, want)


def test_jw_key_pairs(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from horus_ner_ray.stages.fuzzy import (jaro_winkler_similarities,
                                            jw_key_pairs)

    names = ["martha", "marhta", "marta", "bob", "bobby", "rob", "", "m"]
    df = pd.DataFrame({"k": names * 3})  # duplicates collapse
    out = (jw_key_pairs(rd.from_pandas(df).repartition(3), "k",
                        min_sim_e6=850_000)
           .to_pandas().sort_values(["name_a", "name_b"])
           .reset_index(drop=True))
    # expected: same-first-char pairs above threshold
    import itertools

    cand = [(a, b) for a, b in itertools.combinations(
        sorted(set(names) - {""}), 2) if a[0] == b[0]]
    sims = jaro_winkler_similarities(
        np.array([c[0] for c in cand], dtype=object),
        np.array([c[1] for c in cand], dtype=object))
    want = sorted((a, b, int(np.floor(s * 1e6 + 0.5)))
                  for (a, b), s in zip(cand, sims)
                  if np.floor(s * 1e6 + 0.5) >= 850_000)
    assert [tuple(r) for r in out.itertuples(index=False)] == want

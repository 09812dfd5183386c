"""Randomized end-to-end fuzz: random small corpora (adversarial token
distributions, empty docs, unicode, duplicated texts) and random queries —
engine must stay bitwise rank-identical to the oracle across OR/AND modes
and k values.  Seeded, deterministic."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine

WORDS = (
    ["w%02d" % i for i in range(40)]
    + ["the", "of", "and"]
    + ["Uniq%04d" % i for i in range(200)]
    + ["naïve", "…", "x1", "2x", "a"]
)


def _random_corpus(rng: np.random.RandomState, path, n_docs: int, n_files: int):
    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": []}
    conv = 0
    t = 0
    turns_in_conv = rng.randint(1, 6)
    for i in range(n_docs):
        n = rng.randint(0, 30)
        toks = [WORDS[rng.randint(len(WORDS))] for _ in range(n)]
        if rng.random_sample() < 0.1:
            toks = []  # empty doc
        if rng.random_sample() < 0.1 and i > 0:
            toks = rows["text"][-1].split(" ")  # duplicate text
        rows["conv_id"].append(f"c{conv:05d}")
        rows["turn_idx"].append(t)
        rows["role"].append("user")
        rows["text"].append(" ".join(toks))
        t += 1
        if t >= turns_in_conv:
            conv += 1
            t = 0
            turns_in_conv = rng.randint(1, 6)
    tbl = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"]),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"]),
            "text": pa.array(rows["text"]),
        }
    )
    files = []
    per = max(1, len(tbl) // n_files)
    # split on conversation boundaries (fragments must hold whole convs)
    import pandas as pd

    df = tbl.to_pandas()
    convs = df["conv_id"].unique()
    for fi, lo in enumerate(range(0, len(convs), max(1, len(convs) // n_files))):
        sub = df[df["conv_id"].isin(convs[lo : lo + max(1, len(convs) // n_files)])]
        if len(sub) == 0:
            continue
        f = path / f"part-{fi:03d}.parquet"
        pq.write_table(pa.Table.from_pandas(sub, preserve_index=False), f)
        files.append(str(f))
    return files


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_rank_identity(seed, tmp_path, ray_session):
    rng = np.random.RandomState(seed)
    files = _random_corpus(rng, tmp_path, n_docs=300 + seed * 77, n_files=3)
    cfg = PipelineConfig(num_shards=int(rng.randint(1, 7)), postings_block=int(rng.choice([8, 32, 128])))
    build_index(files, tmp_path / "idx", cfg)
    eng = QueryEngine(tmp_path / "idx")
    bf = BruteForceBM25.from_corpus_files(files)
    for _ in range(30):
        nq = rng.randint(1, 5)
        q = " ".join(WORDS[rng.randint(len(WORDS))] for _ in range(nq))
        k = int(rng.choice([1, 2, 5, 10, 50]))
        assert eng.search(q, k) == bf.search(q, k), (seed, q, k)
        assert eng.search(q, k, mode="and") == bf.search(q, k, mode="and"), (seed, q, k)

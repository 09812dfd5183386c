"""MaxScore pruning stress test: a larger corpus and adversarial query
mixes (hot+rare) where the pruned path actually fires; results must remain
bitwise rank-identical to the oracle."""

import numpy as np
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine
from horus_ner_ray.synth import synth_transcripts, transcript_files


@pytest.fixture(scope="module")
def big_fixture(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("prune") / "corpus"
    synth_transcripts(d, n_convs=800, seed=11, convs_per_file=200)
    files = transcript_files(d)
    idx = tmp_path_factory.mktemp("prune") / "idx"
    build_index(files, idx, PipelineConfig(num_shards=4, postings_block=64))
    return str(idx), files


def test_pruned_or_rank_identical(big_fixture):
    idx, files = big_fixture
    eng = QueryEngine(idx)
    bf = BruteForceBM25.from_corpus_files(files)
    rng = np.random.RandomState(0)
    vocab = sorted(bf.postings, key=lambda t: -len(bf.postings[t]))
    hot, mid, rare = vocab[:5], vocab[20:40], vocab[-50:]
    queries = []
    for i in range(40):
        qterms = (
            [hot[rng.randint(len(hot))] for _ in range(rng.randint(1, 3))]
            + [mid[rng.randint(len(mid))] for _ in range(rng.randint(0, 3))]
            + [rare[rng.randint(len(rare))] for _ in range(rng.randint(0, 2))]
        )
        queries.append(" ".join(qterms))
    queries += ["sessionmark the of to", "sessionmark uniqueedge1 the"]
    for k in (1, 3, 10):
        for q in queries:
            assert eng.search(q, k) == bf.search(q, k), (q, k)
    assert eng.pruned_term_evals > 0, "pruning never fired — stress mix too weak"


def test_champion_lists_single_term(big_fixture):
    """Hot single-term queries answered from champion lists, exactly."""
    idx, files = big_fixture
    eng = QueryEngine(idx)
    bf = BruteForceBM25.from_corpus_files(files)
    # confirm champions exist for the every-turn marker term in some shard
    found = False
    for si in range(len(eng._shard_dirs)):
        r = eng._reader(si)
        ti = r.term_index("sessionmark")
        if ti is not None and len(r.champions(ti)[0]) > 0:
            found = True
    assert found, "fixture too small for champion lists (df <= 4*C)"
    for term in ["sessionmark", "the", "of"]:
        for k in (1, 5, 10, 50):
            assert eng.search(term, k) == bf.search(term, k), (term, k)


def test_pruning_skips_decode_bytes(big_fixture):
    """The restricted path must touch fewer postings than full decode for a
    hot+rare mix (sanity that the optimization is real, not just correct)."""
    idx, files = big_fixture
    eng = QueryEngine(idx)
    before = eng.pruned_term_evals
    eng.search("uniqueedge1 sessionmark the", 3)
    assert eng.pruned_term_evals > before


def test_champion_boundary_tie_exact_fallback(tmp_path, ray_session):
    """Adversarial: every posting of the hot term has the same (tf, dl), so
    ALL scores tie and the champion prefix's kth score equals its last —
    the fast path must detect the float-ambiguous boundary and fall back to
    the exact full scan, ranking by doc_id asc like the oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import BruteForceBM25

    n = 150
    rows = [
        {"doc_id": i, "text": "hotterm filler alpha beta gamma"} for i in range(n)
    ]
    # a few docs with distinct dl so avgdl isn't degenerate but ties remain
    rows += [{"doc_id": n + i, "text": "other words entirely here"} for i in range(5)]
    f = tmp_path / "docs.parquet"
    pq.write_table(pa.Table.from_pylist(rows), f)
    idx = tmp_path / "idx"
    # C=16 so k+8 <= C engages the fast path; df=150 > 4*C builds champions
    cfg = PipelineConfig(num_shards=1, doc_id_mode="provided", champions=16)
    build_index([str(f)], idx, cfg)
    eng = QueryEngine(str(idx))
    # champions must exist (df=60 > 4*8) and the fallback must fire
    assert any(
        (ti := eng._reader(si).term_index("hotterm")) is not None
        and len(eng._reader(si).champions(ti)[0]) > 0
        for si in range(len(eng._shard_dirs))
    )
    bf = BruteForceBM25.from_document_files([str(f)])
    for k in (1, 5, 8):
        assert eng.search("hotterm", k) == bf.search("hotterm", k), k
    assert getattr(eng, "champion_fallbacks", 0) > 0

    # non-tied hot term still takes the fast path (no fallback)
    rows2 = [
        {"doc_id": i, "text": "hotterm " * (1 + i % 7) + "pad " * (i % 11)}
        for i in range(150)
    ]
    f2 = tmp_path / "docs2.parquet"
    pq.write_table(pa.Table.from_pylist(rows2), f2)
    idx2 = tmp_path / "idx2"
    build_index([str(f2)], idx2, cfg)
    eng2 = QueryEngine(str(idx2))
    bf2 = BruteForceBM25.from_document_files([str(f2)])
    for k in (1, 5, 8):
        assert eng2.search("hotterm", k) == bf2.search("hotterm", k), k

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

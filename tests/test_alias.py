"""Index aliases (pipelines/alias.py): atomic repoint, QueryEngine opens
through an alias, the zero-downtime reindex swap, cycle/dangling refusal."""

import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.alias import read_alias, resolve_index, write_alias
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.pipelines.query import QueryEngine
from horus_ner_ray.synth import reference_queries


@pytest.fixture(scope="module")
def two_indexes(small_corpus, tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("aliases")
    a, b = base / "idx_a", base / "idx_b"
    build_index(small_corpus, a, PipelineConfig(num_shards=3))
    build_index(small_corpus[:2], b, PipelineConfig(num_shards=3))
    return base, str(a), str(b)


def test_alias_roundtrip_and_engine_open(two_indexes):
    base, a, _b = two_indexes
    al = base / "current.alias"
    write_alias(al, a)
    assert read_alias(al) == str(resolve_index(a))
    assert resolve_index(al) == str(resolve_index(a))
    eng_al, eng_a = QueryEngine(str(al)), QueryEngine(a)
    for q in reference_queries(k=5):
        assert eng_al.search(q["text"], q["k"]) == eng_a.search(q["text"], q["k"])


def test_alias_swap_is_atomic_repoint(two_indexes):
    """The reindex swap: alias repoints from A to B; engines opened after
    the swap see B, engines opened before keep serving A (searcher
    refresh contract)."""
    base, a, b = two_indexes
    al = base / "swap.alias"
    write_alias(al, a)
    eng_old = QueryEngine(str(al))
    n_a = eng_old.n_docs
    write_alias(al, b)  # atomic repoint
    eng_new = QueryEngine(str(al))
    assert eng_new.n_docs == QueryEngine(b).n_docs
    assert eng_new.n_docs != n_a
    assert eng_old.n_docs == n_a  # pre-swap engine unaffected


def test_alias_chain_and_refusals(two_indexes, tmp_path):
    base, a, _b = two_indexes
    al1 = base / "l1.alias"
    al2 = base / "l2.alias"
    write_alias(al1, a)
    write_alias(al2, al1)  # alias -> alias -> index
    assert resolve_index(al2) == str(resolve_index(a))
    # dangling target refuses at write time
    with pytest.raises(ValueError, match="not a published index"):
        write_alias(base / "bad.alias", tmp_path / "nope")
    # cycle refuses at resolve time
    c1, c2 = base / "c1.alias", base / "c2.alias"
    import json

    c1.write_text(json.dumps({"index_dir": str(c2)}))
    c2.write_text(json.dumps({"index_dir": str(c1)}))
    with pytest.raises(ValueError, match="hops"):
        resolve_index(c1)
    with pytest.raises(FileNotFoundError):
        resolve_index(base / "missing.alias")


def test_restore_snapshot_with_alias_swap(two_indexes, tmp_path):
    """Snapshot -> mutate live -> restore + alias swap: the restored tree
    serves the point-in-time results; the live tree keeps its mutation."""
    from horus_ner_ray.pipelines.delete import delete_by_query
    from horus_ner_ray.pipelines.snapshot import (
        restore_snapshot,
        snapshot_index,
    )

    import shutil

    base, a, _b = two_indexes
    live = tmp_path / "live"
    shutil.copytree(a, live)
    snap = tmp_path / "snap"
    snapshot_index(live, snap)
    before = QueryEngine(str(live)).search("sessionmark", k=10)
    assert before
    delete_by_query(str(live), "sessionmark")
    assert QueryEngine(str(live)).search("sessionmark", k=10) == []
    al = tmp_path / "serving.alias"
    restored = tmp_path / "restored"
    out = restore_snapshot(snap, restored, alias_path=al)
    assert out["alias"] == str(al)
    eng = QueryEngine(str(al))  # opens through the alias
    assert eng.search("sessionmark", k=10) == before

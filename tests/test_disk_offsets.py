"""Rank-mode conv-offset backends (stages/docstore.py DiskConvOffsets):
the distributed disk backend must produce byte-identical indexes to the
driver-broadcast backend, auto-escalation must trigger on the free-metadata
turn threshold, and the lookup contract must match ConvOffsets exactly.
Removes the round-4 verdict's one scale weakness: nothing driver-side may
scale with conversation count on the default rank path.
"""

from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import build_index
from horus_ner_ray.stages import docstore as dstore


def _index_bytes(idx: Path) -> dict[str, bytes]:
    out = {}
    for sub in ("shards", "docstore"):
        for p in sorted((idx / sub).rglob("*")):
            if p.is_file() and p.name != "manifest.json":
                out[str(p.relative_to(idx))] = p.read_bytes()
    return out


def test_disk_backend_byte_identical_index(small_corpus, tmp_path, ray_session):
    a = tmp_path / "bcast"
    b = tmp_path / "disk"
    build_index(small_corpus, a,
                PipelineConfig(num_shards=3, conv_offsets_backend="broadcast"))
    build_index(small_corpus, b,
                PipelineConfig(num_shards=3, conv_offsets_backend="disk"))
    assert _index_bytes(a) == _index_bytes(b)
    # the disk backend actually built its range files
    assert sorted((b / "offsets").glob("range-*.parquet"))
    assert not (a / "offsets").exists()


def test_auto_escalates_above_threshold(small_corpus, tmp_path, ray_session):
    """auto + a tiny threshold -> disk backend (observable via the offsets
    dir); auto + a huge threshold -> broadcast.  The decision reads only
    Parquet footer metadata."""
    lo = tmp_path / "lo"
    hi = tmp_path / "hi"
    build_index(small_corpus, lo,
                PipelineConfig(num_shards=3, conv_offsets_backend="auto",
                               conv_offsets_disk_threshold=10))
    build_index(small_corpus, hi,
                PipelineConfig(num_shards=3, conv_offsets_backend="auto",
                               conv_offsets_disk_threshold=10**12))
    assert sorted((lo / "offsets").glob("range-*.parquet"))
    assert not (hi / "offsets").exists()
    assert _index_bytes(lo) == _index_bytes(hi)


def test_disk_lookup_matches_broadcast(small_corpus, tmp_path, ray_session):
    convs = []
    counts = {}
    for f in small_corpus:
        c = np.asarray(pq.read_table(f, columns=["conv_id"])["conv_id"],
                       dtype=object)
        for x in c:
            counts[x] = counts.get(x, 0) + 1
        convs.extend(c)
    uniq = np.asarray(sorted(set(convs)), dtype=object)
    bcast = dstore.offsets_from_counts(
        uniq, np.asarray([counts[c] for c in uniq], dtype=np.int64))
    disk = dstore.build_disk_offsets(
        small_corpus, tmp_path / "offs",
        target_turns_per_range=200)  # force several ranges
    assert disk.n_docs == bcast.n_docs
    probe = uniq[:: max(1, len(uniq) // 17)]
    np.testing.assert_array_equal(disk.lookup(probe), bcast.lookup(probe))
    offs, ns = disk.lookup_with_counts(probe)
    np.testing.assert_array_equal(offs, bcast.lookup(probe))
    np.testing.assert_array_equal(
        ns, np.asarray([counts[c] for c in probe], dtype=np.int64))
    with pytest.raises(KeyError):
        disk.lookup(np.asarray(["__no_such_conv__"], dtype=object))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_disk_offsets_fuzz_matches_broadcast(seed, tmp_path, ray_session):
    """Adversarial conv-id fuzz: random multisets of awkward string ids
    (shared prefixes, ids equal to likely range bounds, length skew,
    convs split across fragments) must yield identical offsets from both
    backends, under forced multi-range partitioning."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    rng = np.random.RandomState(seed)
    alphabet = list("ab0-_")
    uniq = sorted({
        "".join(rng.choice(alphabet, size=rng.randint(1, 12)))
        for _ in range(rng.randint(5, 120))
    })
    counts = {c: int(rng.randint(1, 9)) for c in uniq}
    # scatter each conv's turns across up to 3 fragment files
    frags: list[list[tuple[str, int]]] = [[] for _ in range(3)]
    for c, n in counts.items():
        split = rng.multinomial(n, [1 / 3] * 3)
        for fi, k in enumerate(split):
            for t in range(int(k)):
                frags[fi].append((c, t))
    files = []
    for fi, rows in enumerate(frags):
        if not rows:
            rows = [(uniq[0], 0)]  # keep every fragment non-empty
            counts[uniq[0]] += 1
        rng.shuffle(rows)
        p = tmp_path / f"frag{seed}_{fi}.parquet"
        pq_.write_table(pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        }), str(p))
        files.append(str(p))
    bcast = dstore.offsets_from_counts(
        np.asarray(uniq, dtype=object),
        np.asarray([counts[c] for c in uniq], dtype=np.int64))
    disk = dstore.build_disk_offsets(files, tmp_path / f"offs{seed}",
                                     target_turns_per_range=7)
    assert disk.n_docs == bcast.n_docs
    probe = np.asarray(uniq, dtype=object)
    np.testing.assert_array_equal(disk.lookup(probe), bcast.lookup(probe))
    offs, ns = disk.lookup_with_counts(probe)
    np.testing.assert_array_equal(
        ns, np.asarray([counts[c] for c in uniq], dtype=np.int64))


def test_disk_cache_is_bounded(small_corpus, tmp_path, ray_session):
    disk = dstore.build_disk_offsets(small_corpus, tmp_path / "offs",
                                     target_turns_per_range=40)
    assert len(list((tmp_path / "offs").glob("range-*.parquet"))) > 4
    disk.max_cached_ranges = 2
    c = np.asarray(pq.read_table(small_corpus[0],
                                 columns=["conv_id"])["conv_id"], dtype=object)
    disk.lookup(np.unique(c))
    assert len(disk._cache) <= 2
    # pickling drops the cache (workers each warm their own)
    import pickle

    clone = pickle.loads(pickle.dumps(disk))
    assert clone._cache == {}
    np.testing.assert_array_equal(clone.lookup(c[:5]), disk.lookup(c[:5]))

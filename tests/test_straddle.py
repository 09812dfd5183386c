"""A conversation split across two Parquet fragments (arbitrary public-API
input — the synth corpus keeps convs file-contiguous, real input need not).

Doc ids are offset(conv) + turn_idx, so the fragment holding the LATER
turns owns doc ids beyond offset + its own turn count; the pipelined
build's shard-dependency analysis must treat it as a dependency of every
shard the full conversation span can touch, or a shard merge can run
before all run files exist (schedule-dependent missing postings)."""

from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import _frag_doc_ranges_rank, build_index
from horus_ner_ray.stages.docstore import offsets_from_counts


def test_frag_ranges_cover_straddling_conversation():
    # conv "a": 10 turns total, 2 in frag0 + 8 in frag1; conv "b": 4 in frag1
    parts = pd.DataFrame(
        {
            "frag_id": [0, 1, 1],
            "conv_id": ["a", "a", "b"],
            "n": [2, 8, 4],
        }
    )
    offsets = offsets_from_counts(["a", "b"], [10, 4])
    rng = _frag_doc_ranges_rank(parts, offsets)
    # frag0 holds turns of conv "a" that may sit anywhere in [0, 10)
    assert rng[0] == (0, 10)
    assert rng[1] == (0, 14)


def _write_split_corpus(d: Path) -> tuple[list[str], str]:
    """20 convs x 12 turns; every conv's turns 0-5 go to part A and 6-11 to
    part B, so ALL conversations straddle the fragment boundary.  Also
    returns a single-file layout of the same corpus."""
    rows = []
    for c in range(20):
        for t in range(12):
            rows.append(
                {
                    "conv_id": f"conv{c:03d}",
                    "turn_idx": t,
                    "role": "user" if t % 2 == 0 else "assistant",
                    "text": f"turn {t} of conv {c} alpha beta term{(c * 7 + t) % 13}",
                }
            )
    tbl = pa.Table.from_pylist(rows)
    lo = tbl.filter(pa.compute.less(tbl["turn_idx"], 6))
    hi = tbl.filter(pa.compute.greater_equal(tbl["turn_idx"], 6))
    pq.write_table(lo, d / "part-a.parquet")
    pq.write_table(hi, d / "part-b.parquet")
    pq.write_table(tbl, d / "whole.parquet")
    return [str(d / "part-a.parquet"), str(d / "part-b.parquet")], str(d / "whole.parquet")


def _index_bytes(idx: Path) -> dict[str, bytes]:
    out = {}
    for p in sorted((idx / "shards").rglob("*")):
        if p.is_file() and p.name != "manifest.json":
            out[str(p.relative_to(idx))] = p.read_bytes()
    return out


def test_straddling_build_matches_single_fragment(tmp_path, ray_session):
    split, whole = _write_split_corpus(tmp_path)
    cfg = PipelineConfig(num_shards=5)
    a = tmp_path / "idx_split"
    b = tmp_path / "idx_whole"
    build_index(split, a, cfg)
    build_index([whole], b, cfg)
    assert _index_bytes(a) == _index_bytes(b)

"""One declared optional docstore column set per build (round-5 advice
fix): a fragment whose schema adds or drops tool/ts relative to the
build's first fragment must FAIL LOUDLY (mixed-schema docstore parts
would break QueryEngine._doc_attrs / fetch_docs, which read every part
through one fixed column list), both at build time and at
append_fragments time."""

from pathlib import Path

import pyarrow.parquet as pq
import pytest

from horus_ner_ray.config import PipelineConfig
from horus_ner_ray.pipelines.build_index import (
    append_fragments,
    build_index,
    optional_store_columns,
)


def _strip_ts(src: str, dst: Path) -> str:
    t = pq.read_table(src)
    pq.write_table(t.drop_columns(["ts"]), str(dst))
    return str(dst)


def test_optional_store_columns_footer_probe(small_corpus, tmp_path):
    assert optional_store_columns(small_corpus[0]) == ("tool", "ts")
    assert optional_store_columns(
        _strip_ts(small_corpus[0], tmp_path / "no_ts.parquet")) == ("tool",)


def test_build_rejects_mixed_fragment_schemas(small_corpus, tmp_path, ray_session):
    mixed = [small_corpus[0],
             _strip_ts(small_corpus[1], tmp_path / "frag1.parquet")]
    with pytest.raises(Exception, match="optional docstore columns"):
        build_index(mixed, tmp_path / "idx", PipelineConfig(num_shards=2))


def test_append_rejects_schema_drift(small_corpus, tmp_path, ray_session):
    idx = tmp_path / "idx"
    build_index(small_corpus[:2], idx,
                PipelineConfig(num_shards=2, doc_id_mode="hash"))
    import json

    stats = json.loads((idx / "stats.json").read_text())
    assert stats["store_columns"] == ["tool", "ts"]
    bad = _strip_ts(small_corpus[2], tmp_path / "new_no_ts.parquet")
    with pytest.raises(ValueError, match="optional docstore columns"):
        append_fragments(idx, [bad])
    # a schema-conforming append still works after the refusal
    append_fragments(idx, [small_corpus[2]])

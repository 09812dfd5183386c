"""CoNLL token-per-line source + translate hook (SURVEY.md S2 non-Parquet
half, M10 translate seam)."""

from pathlib import Path

import pytest

from horus_ner_ray.sources.conll import conll_to_parquet, parse_conll_bytes, read_conll

RITTER = b"""Jim\tB-PER
bought\tO
shares\tO

-DOCSTART-\tO

Empire\tB-ORG
State\tI-ORG
"""


def test_parse_conll_bytes_reference_semantics():
    t = parse_conll_bytes(RITTER, "ritter0", token_index=0, tag_index=1)
    assert t["text"].to_pylist() == ["Jim bought shares", "Empire State"]
    assert t["tags"].to_pylist() == ["B-PER O O", "B-ORG I-ORG"]
    assert t["turn_idx"].to_pylist() == [0, 1]
    assert t["conv_id"].to_pylist() == ["ritter0", "ritter0"]
    # whitespace separator variant (the reference's separator='' hack)
    t2 = parse_conll_bytes(b"a x\nb y\n\nc z\n", "f", separator=None, tag_index=1)
    assert t2["text"].to_pylist() == ["a b", "c"]
    # empty file -> zero sentences
    assert len(parse_conll_bytes(b"", "e")) == 0


def test_parse_conll_malformed_lines():
    """Row error handling (SURVEY.md M11): short lines skip cleanly and a
    missing tag column pads 'O' so tokens and tags stay aligned."""
    data = b"good\tO\nshortline\nalso\tB-X\n\nlone\n"
    t = parse_conll_bytes(data, "m", token_index=0, tag_index=1)
    assert t["text"].to_pylist() == ["good shortline also", "lone"]
    assert t["tags"].to_pylist() == ["O O B-X", "O"]
    # token_index beyond the columns: the whole line is skipped, no crash
    t2 = parse_conll_bytes(b"a\tb\nx\n", "m2", token_index=1, tag_index=0)
    assert t2["text"].to_pylist() == ["b"]
    assert t2["tags"].to_pylist() == ["a"]


@pytest.fixture()
def conll_files(tmp_path):
    f1 = tmp_path / "doc_a.conll"
    f1.write_bytes(RITTER)
    f2 = tmp_path / "doc_b.conll"
    f2.write_bytes(b"hello\tO\nworld\tO\n")
    return [str(f1), str(f2)]


def test_read_conll_dataset(conll_files, ray_session):
    df = read_conll(conll_files, tag_index=1).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(df["text"]) == ["Jim bought shares", "Empire State", "hello world"]
    assert list(df["conv_id"]) == ["doc_a", "doc_a", "doc_b"]


def test_conll_to_parquet_feeds_build(conll_files, tmp_path, ray_session):
    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index
    from horus_ner_ray.pipelines.query import BruteForceBM25, QueryEngine

    frags = conll_to_parquet(conll_files, tmp_path / "frags")
    assert len(frags) == 2
    # resumable: second call skips existing fragments
    m = Path(frags[0]).stat().st_mtime_ns
    assert conll_to_parquet(conll_files, tmp_path / "frags") == frags
    assert Path(frags[0]).stat().st_mtime_ns == m

    idx = tmp_path / "idx"
    build_index(frags, idx, PipelineConfig(num_shards=2))
    eng = QueryEngine(str(idx))
    bf = BruteForceBM25.from_corpus_files(frags)
    for q in ["empire state", "hello", "shares world"]:
        assert eng.search(q, 5) == bf.search(q, 5), q


def test_write_conll_roundtrip(conll_files, tmp_path, ray_session):
    """read -> write -> read is lossless, and write is a byte-stable
    fixed point + resumable (existing files skipped)."""
    import pandas as pd

    from horus_ner_ray.sources.conll import write_conll

    ds = read_conll(conll_files, tag_index=1)
    paths = write_conll(ds, tmp_path / "out")
    assert [Path(p).name for p in paths] == ["doc_a.conll", "doc_b.conll"]
    df1 = (ds.to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    ds2 = read_conll(paths, tag_index=1)
    df2 = (ds2.to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(df1, df2)
    # fixed point: writing the re-read corpus reproduces identical bytes
    paths2 = write_conll(ds2, tmp_path / "out2")
    for a, b in zip(paths, paths2):
        assert Path(a).read_bytes() == Path(b).read_bytes()
    # resume: a second write skips existing files untouched
    m = Path(paths[0]).stat().st_mtime_ns
    write_conll(ds, tmp_path / "out")
    assert Path(paths[0]).stat().st_mtime_ns == m


def test_translate_hook(ray_session):
    import ray.data as rd

    from horus_ner_ray.stages.translate import DictTranslator, translate_dataset

    rows = [
        {"doc_id": 0, "text": "el gato", "lang": "es"},
        {"doc_id": 1, "text": "the cat", "lang": "en"},
        {"doc_id": 2, "text": "der hund", "lang": "de"},
    ]
    out = translate_dataset(
        rd.from_items(rows),
        translator_cls=DictTranslator,
        ctor_kwargs={"mapping": {"el": "the", "gato": "cat", "der": "the", "hund": "dog"}},
        lang_col="lang",
    ).to_pandas().set_index("doc_id")
    assert out.loc[0, "text_translated"] == "the cat"
    assert out.loc[1, "text_translated"] == "the cat"  # en: untouched passthrough
    assert out.loc[1, "text"] == "the cat"
    assert out.loc[2, "text_translated"] == "the dog"

"""horus_ner_ray — a Ray-Data-native inverted-index builder + BM25 top-k query
engine over Parquet transcript tables, with the query/data-processing
capabilities of the HORUS-NER reference (see SURVEY.md).

Built from scratch on public APIs only: ray.data, pyarrow, numpy, pandas.
NOT a port — the reference (/root/reference, SmartDataAnalytics/HORUS-NER)
defines WHAT is computed (tokenize -> term index with exact dedup -> per-term
scoring -> aggregation -> top-k -> export; see SURVEY.md section 0); the HOW
here is idiomatic Ray Data: Dataset -> map_batches over zero-copy Arrow,
actor pools for stateful scorers, explicit partitioning for the wide steps.

Layout:
    config.py            PipelineConfig (BM25 params, shard counts, salting)
    synth.py             deterministic transcript/query corpus generator
    stages/tokenize.py   vectorized Arrow tokenizer + explode to postings rows
    stages/docstore.py   doc_id assignment, doc store, collection stats
    stages/analysis.py   lang-id / quality / token-count / fingerprint stages
    stages/dedupe.py     exact, minhash-LSH, simhash, ngram-jaccard, emb dedup
    stages/similarity.py brute-force + LSH-bucketed ANN over embeddings
    stages/multimodal.py binary-column decode stages (real stdlib codecs)
    stages/media_codecs.py  pure-stdlib PNG/BMP/WAV decode + encode
    state/codec.py       delta + varint (Frame-of-Reference) posting codec
    state/shards.py      sharded index file format, manifests, resume
    pipelines/build_index.py  two-phase build: sorted runs -> k-way merge
    pipelines/query.py   brute-force oracle scorer + actor-pool query engine
"""

__version__ = "0.1.0"

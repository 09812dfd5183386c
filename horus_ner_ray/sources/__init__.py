from horus_ner_ray.sources.conll import conll_to_parquet, read_conll  # noqa: F401

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """60 convs across 3 fragments — includes all FIXTURES.md edge convs."""
    from horus_ner_ray.synth import synth_transcripts, transcript_files

    d = tmp_path_factory.mktemp("corpus")
    synth_transcripts(d, n_convs=60, seed=42, convs_per_file=25)
    return transcript_files(d)


@pytest.fixture(scope="session")
def built_index(small_corpus, tmp_path_factory, ray_session):
    from horus_ner_ray.config import PipelineConfig
    from horus_ner_ray.pipelines.build_index import build_index

    idx = tmp_path_factory.mktemp("index") / "idx"
    res = build_index(small_corpus, idx, PipelineConfig(num_shards=4))
    return str(idx), res

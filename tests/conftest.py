import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_transcripts():
    from search_engine_ray.sources.transcripts import generate_transcripts
    return generate_transcripts(60, seed=42)


@pytest.fixture(scope="session")
def built_index(tiny_transcripts, tmp_path_factory):
    """One shared engine build over the tiny fixture corpus."""
    import ray.data
    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index

    index_dir = str(tmp_path_factory.mktemp("idx"))
    cfg = EngineConfig(index_dir=index_dir, num_partitions=8, salt=1)
    ds = ray.data.from_arrow(tiny_transcripts).repartition(4)
    info = build_index(ds, cfg, source_desc="tiny")
    return cfg, info


@pytest.fixture(scope="session")
def oracle_index(tiny_transcripts):
    from oracle.oracle import OracleIndex
    return OracleIndex(tiny_transcripts)

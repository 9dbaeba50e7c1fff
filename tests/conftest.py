import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_parquet(ray_session, tmp_path_factory):
    """Small deterministic pages corpus written once per session."""
    import pyarrow.parquet as pq

    from ferenda_ray.sources.pages import corpus_table

    path = tmp_path_factory.mktemp("corpus") / "pages.parquet"
    pq.write_table(corpus_table(60), path)
    return str(path)

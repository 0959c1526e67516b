import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Deterministic 500-doc pages corpus with planted duplicates."""
    from metacache_mpi_ray.sources.pages import write_pages_corpus

    out = tmp_path_factory.mktemp("corpus")
    return write_pages_corpus(str(out), 500, seed=42)

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_table():
    """~1k-row deterministic transcripts table (FIXTURES 'tiny' scale)."""
    from rsyslog_ray.datagen import generate_transcripts
    return generate_transcripts(1200)


@pytest.fixture(scope="session")
def small_table():
    from rsyslog_ray.datagen import generate_transcripts
    return generate_transcripts(20000)

import os

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (driver requirement)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data.context import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


SF_SMOKE = os.environ.get("ADR_TEST_SF_DIR", "/root/testdata/sf0.001")

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
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
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_fixture(tmp_path_factory):
    """Deterministic t1 image fixture (1000 rows/epoch, 4 partitions)."""
    from raqc_ray.fixtures import generate

    root = "/tmp/raqc_fixtures/t1"
    manifest = generate(root, "t1", seed=42)
    manifest["root"] = root
    return manifest

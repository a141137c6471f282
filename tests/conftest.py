import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# before ray.init: workers inherit it (polars pool sizing — see
# cdx_toolkit_ray/__init__.py)
os.environ.setdefault("POLARS_MAX_THREADS", "1")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Deterministic synthetic crawl corpus, generated once per session."""
    from cdx_toolkit_ray import fixtures

    root = str(tmp_path_factory.mktemp("crawlfix"))
    paths = fixtures.generate(root, n_pages=1200, seed=42)
    return paths

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_store(tmp_path_factory):
    """Small deterministic synthetic web, hash-partitioned on disk."""
    from blockchainspider_ray.fixtures import ensure_pages_store

    d = tmp_path_factory.mktemp("pages_store")
    return ensure_pages_store(str(d / "store"), n_pages=400, seed=42, n_hosts=10, num_partitions=8)


@pytest.fixture(scope="session")
def pages_table():
    from blockchainspider_ray.fixtures import generate_pages

    return generate_pages(n_pages=400, seed=42, n_hosts=10)

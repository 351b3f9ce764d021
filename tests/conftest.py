import time

import pytest
import ray


def _ray_start() -> None:
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )


def _clear_shared_actor_caches() -> None:
    """Process-wide shared actor pools hold handles that die with a Ray
    session; clear them so the next user respawns instead of probing
    corpses (each cache also has its own liveness probe — this just makes
    the restart cheap and unambiguous)."""
    try:
        from blockchainspider_ray.stages.fetch import FetchPool

        FetchPool._shared.clear()
    except Exception:
        pass
    try:
        from blockchainspider_ray.state.rank_pool import RankPool

        RankPool._shared_shards.clear()
    except Exception:
        pass
    try:
        from blockchainspider_ray.strategies import sharded

        sharded._PUSH_ACTOR_CACHE.clear()
    except Exception:
        pass
    try:
        from blockchainspider_ray.state.seen import SeenSet

        if hasattr(SeenSet, "_shared_actors"):
            SeenSet._shared_actors.clear()
    except Exception:
        pass
    try:
        # session-scoped memos that may hold Datasets / object refs /
        # broadcast handles owned by the dying session
        from blockchainspider_ray.pipelines import common as _qc

        _qc._LINK_EDGES_MEMO.clear()
        _qc._STAGE_CACHE.clear()
        _qc._BCAST_CACHE.clear()
    except Exception:
        pass


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        _ray_start()
    yield
    ray.shutdown()


# One long-lived Ray session degrades progressively across the ~1.6k-test
# suite (object-store/actor accumulation over hundreds of pipelines made a
# single serial `pytest tests/` >4x slower than sliced invocations —
# VERDICT r3 #5).  Restarting Ray every few minutes of test time keeps the
# serial run at sliced-run speed; shared actor caches are cleared so pools
# respawn cleanly.
_RESTART_EVERY_S = 240.0
_last_restart = [time.monotonic()]


@pytest.fixture(scope="module", autouse=True)
def _ray_recycle():
    if ray.is_initialized() and time.monotonic() - _last_restart[0] > _RESTART_EVERY_S:
        ray.shutdown()
        _clear_shared_actor_caches()
        _ray_start()
        _last_restart[0] = time.monotonic()
    yield


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

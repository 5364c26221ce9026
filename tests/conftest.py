"""Ray is initialised ONCE per pytest session (driver contract: library code never
calls ray.init/shutdown — only this fixture, bench.py and CLI entry points own a
session)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Cached 300-row synthetic corpus (pages shards + golden + matches)."""
    from janet_ray.synth import ensure_pages_dir

    return ensure_pages_dir(300, shard_rows=40)

"""Session-scoped Ray + fixture setup (one ray.init per pytest session)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
    """t1 smoke scale: 1k base rows, 10k events, 2 segments (FIXTURES.md §5)."""
    from canal_ray.loggen import generate_fixture

    d = str(tmp_path_factory.mktemp("t1"))
    meta = generate_fixture(d, n_base=1_000, n_events=10_000, n_segments=2, seed=7)
    return d, meta


@pytest.fixture(scope="session")
def t2_fixture(tmp_path_factory):
    """t2 correctness scale: 20k base rows, 200k events, 8 segments."""
    from canal_ray.loggen import generate_fixture

    d = str(tmp_path_factory.mktemp("t2"))
    meta = generate_fixture(
        d, n_base=20_000, n_events=200_000, n_segments=8, seed=11, content_scale=120.0
    )
    return d, meta

"""Robustness: extreme hot-key skew (observability + correctness) and
corrupted-checkpoint recovery."""

from __future__ import annotations

import os

import pytest

from canal_ray.config import CdcConfig
from canal_ray.loggen import generate_fixture
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob


def test_extreme_hot_key_skew(ray_session, tmp_path):
    """90% of updates hammer ~100 keys: digest still matches; the decode
    pre-compaction bounds the hot partition; lineage exposes the skew."""
    d = str(tmp_path / "fix")
    generate_fixture(
        d, n_base=1_000, n_events=20_000, n_segments=4, seed=47, hot_frac=0.9
    )
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=lake, base_table=f"{d}/base/repos.parquet",
        num_partitions=8, epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)
    lin = job.lineage()
    skew = lin["skew"]
    # events_applied are post-pre-compaction: the combiner has already
    # collapsed the hot keys, so partition imbalance stays bounded
    assert skew["max_partition_events"] < 4 * skew["mean_partition_events"]
    # the hot repos are visible in the counters
    top_repo_counts = [
        max(p["hot_keys"].values(), default=0) for p in lin["partitions"].values()
    ]
    assert max(top_repo_counts) > 3 * (
        sum(top_repo_counts) / len(top_repo_counts) / 3
    )


def test_corrupted_checkpoint_recovers(ray_session, tmp_path):
    """A torn/corrupted partition checkpoint is treated as absent: the epoch
    re-applies (idempotently) instead of crashing or silently skipping."""
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=300, n_events=4_000, n_segments=4, seed=53)
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=lake, base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()
    before = state_digest(job.state_pandas())

    # corrupt one partition checkpoint + remove its epoch manifest
    e = job.store.last_complete_epoch()
    victim = job.store.partition_path(1, e)
    if os.path.exists(victim):
        with open(victim, "w") as f:
            f.write('{"truncated')
    os.unlink(job.store.epoch_path(e))

    report = CdcJob(cfg).run()
    assert report["epochs_processed"] == 1
    assert state_digest(CdcJob(cfg).state_pandas()) == before
    # the checkpoint was rewritten valid
    assert job.store.read_partition(1, e) is None or "lsn_max" in (
        job.store.read_partition(1, e) or {}
    )

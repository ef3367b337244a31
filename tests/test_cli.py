"""CLI entrypoint (deployer analog) — subprocess, own Ray session."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from canal_ray.loggen import generate_fixture
from canal_ray.oracle import replay_oracle, state_digest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "canal_ray", *args],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_run_and_compact(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=300, n_events=3_000, n_segments=2, seed=61)
    lake = str(tmp_path / "lake")
    cfg = {
        "log_dir": f"{d}/binlog",
        "lake_dir": lake,
        "base_table": f"{d}/base/repos.parquet",
        "num_partitions": 4,
        "epoch_segments": 1,
        "epochs_per_cycle": 2,
    }
    cfg_path = str(tmp_path / "job.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    out = _run_cli(["--config", cfg_path, "--num-cpus", "2"])
    assert out["report"]["last_epoch"] == 2
    assert out["lineage"]["total_events_applied"] > 0

    out2 = _run_cli(["--config", cfg_path, "--compact", "--num-cpus", "2"])
    assert out2["compacted_partitions"] == 4

    # verify the CLI-produced lake against the oracle (in this session's Ray)
    from canal_ray.config import CdcConfig
    from canal_ray.pipeline import CdcJob

    job = CdcJob(CdcConfig(**cfg))
    oracle_df, _ = replay_oracle(d, list(job.cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)

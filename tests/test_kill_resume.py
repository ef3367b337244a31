"""Hard-kill resume: a replay subprocess is SIGKILLed mid-stream; a fresh run
must resume from the checkpoints and converge to the oracle state. Also the
wide-row path (multi-KB content payloads)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from canal_ray.config import CdcConfig
from canal_ray.loggen import generate_fixture
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob


@pytest.mark.parametrize("pipelined", [False, True])
def test_sigkill_mid_replay_then_resume(ray_session, tmp_path, pipelined):
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=2_000, n_events=40_000, n_segments=8, seed=37)
    lake = str(tmp_path / "lake")
    # pipelined=True: the kill lands while a gather may be in flight for an
    # un-acked cycle — resume must re-run it (fencing absorbs any deltas the
    # zombie gather already wrote)
    epc = 2 if pipelined else 1
    script = textwrap.dedent(
        f"""
        import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        import ray
        ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
        from canal_ray.config import CdcConfig
        from canal_ray.pipeline import CdcJob
        cfg = CdcConfig(log_dir={d + "/binlog"!r}, lake_dir={lake!r},
                        base_table={d + "/base/repos.parquet"!r},
                        num_partitions=4, epoch_segments=1,
                        epochs_per_cycle={epc}, pipelined_cycles={pipelined})
        print("START", flush=True)
        CdcJob(cfg).run()
        print("DONE", flush=True)
        """
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        preexec_fn=os.setsid,
    )
    # wait until some epochs have been acked, then kill the whole group hard
    deadline = time.time() + 120
    while time.time() < deadline:
        time.sleep(0.5)
        ckpt = os.path.join(lake, "_checkpoints")
        if os.path.isdir(ckpt) and any(
            n.startswith("epoch_e0000") and n >= "epoch_e00002" for n in os.listdir(ckpt)
        ):
            break
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait(timeout=30)

    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=lake, base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=1, epochs_per_cycle=epc,
        pipelined_cycles=pipelined,
    )
    job = CdcJob(cfg)
    report = job.run()  # resume in the test session's Ray
    assert report["last_epoch"] == 8  # bootstrap + 8 segments
    assert report["epochs_processed"] >= 1  # the kill really was mid-stream
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)


def test_wide_content_rows(ray_session, tmp_path):
    """Multi-KB content payloads flow through decode/shuffle/apply intact."""
    d = str(tmp_path / "wide")
    generate_fixture(
        d, n_base=300, n_events=2_000, n_segments=2, seed=41, content_scale=4_000.0
    )
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=lake, base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=1, decode_batch_size=512,
    )
    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    eng = job.state_pandas()
    assert state_digest(eng) == state_digest(oracle_df)
    assert eng["content"].str.len().max() > 4_000  # genuinely wide rows

"""Randomized long-haul soak: random SIGKILL points x random DDL mix x
tailing appends, N seeds — the recovery-edge-case matrix at CI scale.

Each seed cycle: a fixture with a randomly drawn DDL/transaction mix is
revealed segment-by-segment into a live directory (tail shape) while a
subprocess replays it; the subprocess is SIGKILLed at a random point,
resumed, killed again, and finally converged in-session. The cycle's hard
gate is sha256 state equality vs the sequential oracle over the full log
(state_digest), plus proof the kills really landed mid-stream.

Budget: ~3 cycles in well under 5 minutes (small fixtures, 2-CPU
subprocesses) — the CI-shaped version of a production soak.
"""

from __future__ import annotations

import os
import shutil
import signal
import subprocess
import sys
import textwrap
import threading
import time

import numpy as np
import pytest

from canal_ray.config import CdcConfig
from canal_ray.loggen import generate_fixture
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob

# known-good DDL/transaction mixes (each individually covered by dedicated
# tests; the soak exercises their product with kills and tailing)
_MENUS = [
    dict(),
    dict(rename_at=0.55, drop_at=0.8),
    dict(truncate_at=0.5),
    dict(rename_at=0.45),
    dict(drop_at=0.6),
    dict(rename_at=0.35, drop_at=0.6, truncate_at=0.8),
    dict(txn_span=True, xa_frac=0.05),
    dict(p_partial=0.3, rename_at=0.5),
]


def _spawn_replay(repo: str, cfg_kwargs: dict) -> subprocess.Popen:
    script = textwrap.dedent(
        f"""
        import sys; sys.path.insert(0, {repo!r})
        import ray
        ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
        from canal_ray.config import CdcConfig
        from canal_ray.pipeline import CdcJob
        cfg = CdcConfig(**{cfg_kwargs!r})
        print("START", flush=True)
        CdcJob(cfg).run_follow(poll_interval_s=0.2, max_idle_polls=10)
        print("DONE", flush=True)
        """
    )
    return subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        preexec_fn=os.setsid,
    )


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_randomized_kill_ddl_tail_soak(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    menu = _MENUS[int(rng.integers(0, len(_MENUS)))]
    src = str(tmp_path / "full")
    generate_fixture(
        src, n_base=800, n_events=8_000, n_segments=8,
        seed=int(rng.integers(1, 10_000)), **menu,
    )

    # tailing-append shape: segments revealed on a random schedule
    live = str(tmp_path / "live")
    os.makedirs(f"{live}/binlog")
    shutil.copytree(f"{src}/base", f"{live}/base")
    segs = sorted(os.listdir(f"{src}/binlog"))
    for s in segs[:2]:
        shutil.copy(f"{src}/binlog/{s}", f"{live}/binlog/{s}")
    delays = rng.uniform(0.2, 1.0, size=len(segs) - 2)

    def feeder():
        for s, d in zip(segs[2:], delays):
            time.sleep(float(d))
            shutil.copy(f"{src}/binlog/{s}", f"{live}/binlog/{s}.tmp")
            os.replace(f"{live}/binlog/{s}.tmp", f"{live}/binlog/{s}")

    t = threading.Thread(target=feeder)
    t.start()

    needs_partial = any(k in menu for k in ("rename_at", "drop_at", "p_partial"))
    cfg_kwargs = dict(
        log_dir=f"{live}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{live}/base/repos.parquet",
        num_partitions=4, epoch_segments=2,
        partial_updates=needs_partial,
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # two random SIGKILL cycles while the tail is live. The kill point is
    # random EXTRA delay on top of a deterministic progress gate (wait for
    # checkpoints to exist), so a kill always lands after real progress —
    # timing luck can vary the cut point but never make the test vacuous.
    kills_mid_stream = 0
    ckpt = os.path.join(cfg_kwargs["lake_dir"], "_checkpoints")
    for _ in range(2):
        proc = _spawn_replay(repo, cfg_kwargs)
        assert "START" in proc.stdout.readline()
        deadline = time.time() + 60
        while time.time() < deadline:
            if os.path.isdir(ckpt) and len(os.listdir(ckpt)) > 0:
                break
            time.sleep(0.2)
        time.sleep(float(rng.uniform(0.0, 4.0)))  # random cut point
        had_progress = os.path.isdir(ckpt) and len(os.listdir(ckpt)) > 0
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass  # replay finished before the cut — still a valid cycle
        proc.wait(timeout=30)
        if had_progress:
            kills_mid_stream += 1

    t.join()  # every segment is now on disk

    # final convergence in-session + the cycle's hard gate
    cfg = CdcConfig(**cfg_kwargs)
    job = CdcJob(cfg)
    job.run()
    oracle_df, oracle_schema = replay_oracle(src, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)
    assert job.final_schema() == oracle_schema
    # non-vacuous: at least one kill landed after real progress
    assert kills_mid_stream >= 1
    # idempotence: a re-run over the complete log is a fenced no-op with an
    # identical digest
    rerun = CdcJob(cfg)
    assert rerun.run()["epochs_processed"] == 0
    assert state_digest(rerun.state_pandas()) == state_digest(oracle_df)


def test_sigkill_mid_compact_recovers(ray_session, tmp_path):
    """Compaction's crash-safety contract (atomic base replace BEFORE delta
    unlink; idempotent re-merge): a SIGKILL mid-compact must leave a lake
    that (a) still serves the exact oracle state half-compacted, and
    (b) compacts to completion on retry with the digest unchanged."""
    src = str(tmp_path / "fix")
    generate_fixture(src, n_base=2_000, n_events=20_000, n_segments=4, seed=44)
    cfg_kwargs = dict(
        log_dir=f"{src}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{src}/base/repos.parquet",
        num_partitions=16, epoch_segments=2,
    )
    cfg = CdcConfig(**cfg_kwargs)
    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(src, list(cfg.initial_schema))
    want = state_digest(oracle_df)
    assert state_digest(job.state_pandas()) == want

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent(
        f"""
        import sys; sys.path.insert(0, {repo!r})
        import ray
        ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
        from canal_ray.config import CdcConfig
        from canal_ray.pipeline import CdcJob
        print("START", flush=True)
        CdcJob(CdcConfig(**{cfg_kwargs!r})).compact()
        print("DONE", flush=True)
        """
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        preexec_fn=os.setsid,
    )
    assert "START" in proc.stdout.readline()
    time.sleep(0.8)  # races the compactor tasks: some partitions fold first
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait(timeout=30)

    # (a) the half-compacted lake still reads back the exact oracle state
    job2 = CdcJob(CdcConfig(**cfg_kwargs))
    assert state_digest(job2.state_pandas()) == want
    # (b) retrying compaction converges: every delta folded, digest stable
    stats = job2.compact()
    assert len(stats) == 16
    for d in os.listdir(cfg_kwargs["lake_dir"]):
        pdir = os.path.join(cfg_kwargs["lake_dir"], d)
        if d.startswith("p") and os.path.isdir(pdir):
            assert not [n for n in os.listdir(pdir) if n.startswith("delta_e")]
    assert state_digest(job2.state_pandas()) == want

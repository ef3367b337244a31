"""CDC-maintained ANN index (IvfIndexFollower): follow-equals-fresh,
incremental relocation/delete handling, and SIGKILL-resume identity."""

from __future__ import annotations

import os
import shutil
import signal
import subprocess
import sys
import textwrap
import time

import numpy as np
import pandas as pd


def test_follow_equals_fresh_and_is_idempotent(ray_session):
    """The driver-gate query itself asserts followed-probe == fresh-built
    reference on every call (inserts + re-embeddings + deletes, staged
    mid-replay). A second call must be a fenced no-op with identical
    results."""
    from canal_ray.ops.cdc_smoke import cdc_ann_index_follow

    out1 = cdc_ann_index_follow("/root/testdata/sf0.001")
    assert set(out1.columns) == {"query_id", "vec_id", "rank", "score"}
    assert out1.groupby("query_id")["rank"].max().eq(10).all()
    # deleted vectors (vec_id % 9 == 0) must never appear in probe results
    assert not (out1["vec_id"] % 9 == 0).any()
    out2 = cdc_ann_index_follow("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(out1, out2)


def test_sigkill_mid_follow_then_resume(ray_session, tmp_path):
    """A replay+index subprocess is SIGKILLed after the first incremental
    window; a fresh run must resume (fenced lake epochs, deterministic
    window rewrite, cursor-last ordering) and the followed index must equal
    the fresh-built reference over the final state."""
    # private copy of the embeddings table -> a fresh fixture key, so the
    # cached lake from other tests can't make the kill land after DONE
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet", sf / "embeddings.parquet")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    script = textwrap.dedent(
        f"""
        import sys; sys.path.insert(0, {repo!r})
        import os
        import ray
        ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
        from canal_ray.ann_follow import IvfIndexFollower
        from canal_ray.ops.cdc_smoke import _embstream_fixture
        from canal_ray.pipeline import CdcJob
        cfg, n = _embstream_fixture({str(sf)!r})
        job = CdcJob(cfg)
        f = IvfIndexFollower(cfg.lake_dir, os.path.join(cfg.lake_dir, "_annindex"), n_clusters=8)
        job.run(max_epochs=2); f.update(job)
        print("PHASE1", flush=True)
        job.run(max_epochs=1); f.update(job)
        job.run(); f.update(job)
        print("DONE", flush=True)
        """
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        preexec_fn=os.setsid,
    )
    deadline = time.time() + 180
    line = ""
    while time.time() < deadline:
        line = proc.stdout.readline()
        if "PHASE1" in line or not line:
            break
    assert "PHASE1" in line, "subprocess never reached the first index window"
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait(timeout=30)

    from canal_ray.ann_follow import IvfIndexFollower, fresh_reference_probe
    from canal_ray.ops.ann import _load_queries
    from canal_ray.ops.cdc_smoke import _embstream_fixture
    from canal_ray.pipeline import CdcJob

    cfg, _ = _embstream_fixture(str(sf))
    job = CdcJob(cfg)
    job.run()  # resume the lake
    follower = IvfIndexFollower(
        cfg.lake_dir, os.path.join(cfg.lake_dir, "_annindex"), n_clusters=8
    )
    assert follower.cursor() >= 1  # the kill really was mid-follow
    follower.update(job)
    assert follower.cursor() == job.store.last_complete_epoch()

    qids, Q = _load_queries(str(sf), 8)
    got = follower.probe(qids, Q, k=10, nprobe=4)
    want = fresh_reference_probe(
        job.state_pandas(), follower.centroids(), qids, Q, k=10, nprobe=4
    )
    pd.testing.assert_frame_equal(
        got[["query_id", "vec_id", "rank"]], want[["query_id", "vec_id", "rank"]]
    )
    assert np.allclose(got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-9)


def test_compaction_past_cursor_raises(ray_session, tmp_path):
    """r5 compaction guard: folding deltas past the follower's cursor makes
    the window diff impossible (old-version buckets unrecoverable) — update
    must raise, never silently drop relocations/deletes. A FRESH follower
    over the compacted lake still initial-builds correctly."""
    import pytest

    from canal_ray.ann_follow import IvfIndexFollower, fresh_reference_probe
    from canal_ray.ops.ann import _load_queries
    from canal_ray.ops.cdc_smoke import _embstream_fixture
    from canal_ray.pipeline import CdcJob

    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet", sf / "embeddings.parquet")

    cfg, _ = _embstream_fixture(str(sf))
    job = CdcJob(cfg)
    f = IvfIndexFollower(cfg.lake_dir, os.path.join(cfg.lake_dir, "_annindex"), n_clusters=8)
    job.run(max_epochs=2)
    f.update(job)             # cursor at the first window
    job.run()                 # rest of the stream
    job.compact()             # folds epochs PAST the follower's cursor
    with pytest.raises(RuntimeError, match="compacted past the index cursor"):
        f.update(job)

    # a fresh follower over the compacted lake builds from the merged state
    f2 = IvfIndexFollower(cfg.lake_dir, os.path.join(cfg.lake_dir, "_annindex2"), n_clusters=8)
    f2.update(job)
    qids, Q = _load_queries(str(sf), 8)
    got = f2.probe(qids, Q, k=10, nprobe=4)
    want = fresh_reference_probe(job.state_pandas(), f2.centroids(), qids, Q, k=10, nprobe=4)
    pd.testing.assert_frame_equal(
        got[["query_id", "vec_id", "rank"]], want[["query_id", "vec_id", "rank"]]
    )


def test_index_follows_the_tail_continuously(ray_session, tmp_path):
    """The continuous pipeline the module exists for: segments arrive one at
    a time (tail shape), the lake consumes each, the follower indexes each
    window — and after EVERY cycle the followed index's probe results equal
    a fresh-built reference over the current state."""
    import dataclasses

    from canal_ray.ann_follow import IvfIndexFollower, fresh_reference_probe
    from canal_ray.ops.ann import _load_queries
    from canal_ray.ops.cdc_smoke import _embstream_fixture
    from canal_ray.pipeline import CdcJob

    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet", sf / "embeddings.parquet")
    base_cfg, _ = _embstream_fixture(str(sf))

    live = tmp_path / "live_binlog"
    live.mkdir()
    cfg = dataclasses.replace(
        base_cfg, log_dir=str(live), lake_dir=str(tmp_path / "live_lake")
    )
    follower = IvfIndexFollower(
        cfg.lake_dir, os.path.join(cfg.lake_dir, "_annindex"), n_clusters=8
    )
    qids, Q = _load_queries(str(sf), 8)

    segs = sorted(os.listdir(base_cfg.log_dir))
    assert len(segs) == 4
    checked = 0
    for s in segs:
        shutil.copy(os.path.join(base_cfg.log_dir, s), live / s)
        job = CdcJob(cfg)
        job.run()               # consume the newly arrived segment
        follower.update(job)    # index follows
        state = job.state_pandas()
        if state.empty:
            continue
        got = follower.probe(qids, Q, k=10, nprobe=4)
        want = fresh_reference_probe(state, follower.centroids(), qids, Q, k=10, nprobe=4)
        pd.testing.assert_frame_equal(
            got[["query_id", "vec_id", "rank"]], want[["query_id", "vec_id", "rank"]]
        )
        checked += 1
    assert checked >= 3  # the equality gate really ran per cycle

"""End-to-end replay correctness vs the sequential oracle (SURVEY.md §7 steps 3-7).

The BASELINE.json invariant: after full replay the materialized lake is
row-for-row identical to the sequential single-process replay, verified by
per-row sha256 of a canonical serialization; resume-from-checkpoint mid-stream
produces the identical state; duplicate applies are fenced no-ops.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from canal_ray.config import CdcConfig
from canal_ray.oracle import replay_oracle, row_sha256, state_digest
from canal_ray.pipeline import CdcJob


def _cfg(fixture_dir: str, lake_dir: str, **kw) -> CdcConfig:
    return CdcConfig(
        log_dir=os.path.join(fixture_dir, "binlog"),
        lake_dir=lake_dir,
        base_table=os.path.join(fixture_dir, "base", "repos.parquet"),
        num_partitions=kw.pop("num_partitions", 8),
        epoch_segments=kw.pop("epoch_segments", 2),
        **kw,
    )


@pytest.fixture(scope="module")
def t1_replayed(ray_session, t1_fixture, tmp_path_factory):
    d, meta = t1_fixture
    lake = str(tmp_path_factory.mktemp("lake_t1"))
    cfg = _cfg(d, lake)
    job = CdcJob(cfg)
    report = job.run()
    oracle_df, oracle_schema = replay_oracle(d, list(cfg.initial_schema))
    return d, cfg, job, report, oracle_df, oracle_schema


def test_full_replay_matches_oracle(t1_replayed):
    d, cfg, job, report, oracle_df, oracle_schema = t1_replayed
    assert report["last_epoch"] >= 1
    assert job.final_schema() == oracle_schema
    engine_df = job.state_pandas()
    assert len(engine_df) == len(oracle_df)
    assert list(engine_df.columns) == list(oracle_df.columns)
    assert state_digest(engine_df) == state_digest(oracle_df)
    # spot check: the per-row hashes really differ when content differs
    assert row_sha256(engine_df).nunique() == len(engine_df)


def test_schema_evolved(t1_replayed):
    _, _, job, _, _, oracle_schema = t1_replayed
    cols = dict(job.final_schema().columns())
    assert cols["stars"] == "int64"  # added int32 then widened
    assert cols["license"] == "string"
    eng = job.state_pandas()
    assert eng["stars"].notna().any() and eng["stars"].isna().any()


def test_duplicate_apply_is_fenced(t1_replayed, tmp_path):
    """Re-running the full job over an already-complete lake changes nothing
    and re-processes zero epochs (manifest cursor), and re-running one epoch's
    groups hits the partition fencing path."""
    d, cfg, job, _, oracle_df, _ = t1_replayed
    before = state_digest(job.state_pandas())
    report2 = CdcJob(cfg).run()
    assert report2["epochs_processed"] == 0
    assert state_digest(job.state_pandas()) == before

    # surgically remove one epoch manifest -> that epoch re-runs, but every
    # partition checkpoint still exists, so all groups take the fenced path
    e = job.store.last_complete_epoch()
    os.unlink(job.store.epoch_path(e))
    report3 = CdcJob(cfg).run()
    assert report3["epochs_processed"] == 1
    assert state_digest(job.state_pandas()) == before


def test_resume_mid_stream(ray_session, t1_fixture, tmp_path_factory):
    """Stop after each epoch count k, resume, final state identical."""
    d, meta = t1_fixture
    from canal_ray.oracle import replay_oracle

    lake = str(tmp_path_factory.mktemp("lake_resume"))
    cfg = _cfg(d, lake, num_partitions=4, epoch_segments=1)
    job = CdcJob(cfg)
    r1 = job.run(max_epochs=2)  # bootstrap + first segment only
    assert r1["epochs_processed"] == 2
    r2 = CdcJob(cfg).run()  # fresh job object resumes from checkpoints
    assert r2["epochs_processed"] >= 1
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)


def test_compaction_preserves_state(t1_replayed):
    d, cfg, job, _, oracle_df, _ = t1_replayed
    before = state_digest(job.state_pandas())
    stats = job.compact()
    assert (stats["deltas_folded"] >= 0).all()
    after = state_digest(job.state_pandas())
    assert after == before == state_digest(oracle_df)
    # partition dirs now hold a single base file each
    from canal_ray.sink import lake_partition_dirs

    for p in lake_partition_dirs(cfg.lake_dir):
        names = [n for n in os.listdir(p) if n.endswith(".parquet")]
        assert names == ["base.parquet"]


def test_lineage_and_skew_counters(t1_replayed):
    d, cfg, job, report, _, _ = t1_replayed
    lin = job.lineage()
    assert set(lin["partitions"]) <= set(range(cfg.num_partitions))
    assert lin["total_events_applied"] > 0
    some = next(iter(lin["partitions"].values()))
    assert some["lsn_range"][0] >= 0 and some["lsn_range"][1] <= report["events"] * 10
    assert isinstance(some["hot_keys"], dict) and len(some["hot_keys"]) > 0
    # DDL replicated everywhere: every partition saw all 3 DDLs
    for p in lin["partitions"].values():
        assert p["ddls"] == 3


def test_unsubscribed_table_filtered(t1_replayed):
    """audit-table noise events must never reach the lake."""
    _, cfg, job, _, _, _ = t1_replayed
    eng = job.state_pandas()
    assert not (eng["path"].astype(str) == "audit row").any()
    assert eng["repo"].str.startswith("org").all()


def test_t2_scale_correctness(ray_session, t2_fixture, tmp_path_factory):
    """200k events, 8 partitions, multi-epoch — digest equality vs oracle."""
    d, meta = t2_fixture
    lake = str(tmp_path_factory.mktemp("lake_t2"))
    cfg = _cfg(d, lake, num_partitions=8, epoch_segments=3)
    job = CdcJob(cfg)
    job.run()
    oracle_df, oracle_schema = replay_oracle(d, list(cfg.initial_schema))
    eng = job.state_pandas()
    assert len(eng) == len(oracle_df)
    assert state_digest(eng) == state_digest(oracle_df)
    assert job.final_schema() == oracle_schema


def test_auto_compaction(ray_session, t1_fixture, tmp_path_factory):
    """compact_every_cycles folds deltas as the job runs; state unchanged."""
    import os

    from canal_ray.sink import lake_partition_dirs

    d, meta = t1_fixture
    lake = str(tmp_path_factory.mktemp("lake_ac"))
    cfg = _cfg(d, lake, num_partitions=4, epoch_segments=1, epochs_per_cycle=1)
    cfg.compact_every_cycles = 1
    job = CdcJob(cfg)
    job.run()
    for p in lake_partition_dirs(lake):
        names = [n for n in os.listdir(p) if n.endswith(".parquet")]
        assert "base.parquet" in names and len(names) == 1
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)


def test_per_ack_point_state_with_multi_epoch_cycles(ray_session, tmp_path):
    """A cycle batches several ack points through ONE pipeline; within-batch
    LWW pre-compaction must never let a later epoch's event suppress an
    earlier epoch's from its delta — merge-as-of each ack point must equal
    the sequential oracle at that cut (derived tables and point-in-time
    reads depend on it)."""
    import glob

    import pyarrow.parquet as pq

    from canal_ray.sink import merge_partition
    from canal_ray.oracle import replay_oracle, state_digest
    from canal_ray.loggen import generate_fixture
    from canal_ray.config import CdcConfig
    from canal_ray.pipeline import CdcJob

    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=300, n_events=3_000, n_segments=4, seed=88,
                     hot_frac=0.6)  # hot keys updated in EVERY epoch
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=2,
        epoch_segments=1, epochs_per_cycle=4,  # all epochs in ONE cycle
        decode_batch_size=1 << 20,  # one decode batch straddles all epochs
    )
    job = CdcJob(cfg)
    job.run()
    segs = sorted(glob.glob(f"{d}/binlog/*.parquet"))
    for epoch in (1, 2, 3):
        cut = int(pq.read_table(segs[epoch - 1], columns=["lsn"])["lsn"][-1].as_py())
        schema = job._schema_at(epoch)
        import pandas as pd

        parts = []
        for pdir in sorted(glob.glob(f"{cfg.lake_dir}/p*")):
            t = merge_partition(pdir, schema, cfg.pk_columns, up_to_epoch=epoch)
            parts.append(t.drop_columns(["_lsn"]).to_pandas())
        got = pd.concat(parts, ignore_index=True).sort_values(
            ["repo", "path"]).reset_index(drop=True)
        want, _ = replay_oracle(d, list(cfg.initial_schema), up_to_lsn=cut)
        assert state_digest(got) == state_digest(want), f"as-of epoch {epoch}"


def test_pipelined_cycles_digest_and_resume(ray_session, t1_fixture, tmp_path_factory):
    """pipelined_cycles=True (one-cycle gather lookahead) must produce the
    byte-identical lake state: multi-cycle run, partial run + resume across
    the pending-flush boundary, and in-order acks throughout."""
    d, meta = t1_fixture
    lake = str(tmp_path_factory.mktemp("lake_pipe"))
    cfg = _cfg(d, lake, epochs_per_cycle=2, pipelined_cycles=True)
    job = CdcJob(cfg)
    job.run(max_epochs=2)  # partial: pending cycle flushed before return
    store_epochs_after_partial = job.store.last_complete_epoch()
    assert store_epochs_after_partial >= 0
    CdcJob(cfg).run()  # resume
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)
    # duplicate run is a fenced no-op even with pipelining enabled
    assert CdcJob(cfg).run()["epochs_processed"] == 0

"""Metrics stream + heartbeat lag (the Prometheus-collector analog)."""

from __future__ import annotations

from canal_ray.config import CdcConfig
from canal_ray.loggen import EPOCH_MS, generate_fixture
from canal_ray.metrics import (
    ACK_ROWS,
    APPLY_DELAY_MS,
    PUT_ROWS,
    SOURCE_CLOCK_MS,
    MetricsLog,
)
from canal_ray.pipeline import CdcJob


def test_metrics_stream_and_heartbeat_lag(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    meta = generate_fixture(d, n_base=300, n_events=4_000, n_segments=4, seed=23)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=4,
        epoch_segments=2, epochs_per_cycle=1,
    )
    job = CdcJob(cfg)
    job.run()

    m = MetricsLog(cfg.lake_dir).read()
    assert not m.empty
    # every cycle appended; epochs are monotone and complete
    epochs = sorted(m["epoch"].unique())
    assert epochs == list(range(0, job.store.last_complete_epoch() + 1))
    # put_rows totals match lineage's applied events
    lin = job.lineage()
    put_total = int(m[m["metric"] == PUT_ROWS]["value"].sum())
    assert put_total == lin["total_events_applied"]
    # ack_rows present and bounded by put_rows
    ack_total = int(m[m["metric"] == ACK_ROWS]["value"].sum())
    assert 0 < ack_total <= put_total
    # the source clock advances monotonically across epochs (heartbeats
    # advance it even without DML) and matches the generator's clock law
    clocks = (
        m[m["metric"] == SOURCE_CLOCK_MS].groupby("epoch")["value"].max().sort_index()
    )
    assert clocks.is_monotonic_increasing
    assert int(clocks.iloc[-1]) == EPOCH_MS + meta["last_lsn"] * 10
    # delay gauge present and non-negative
    delays = m[m["metric"] == APPLY_DELAY_MS]["value"]
    assert (delays >= 0).all() and len(delays) > 0
    # lineage exposes the per-partition lag
    for p in lin["partitions"].values():
        assert p["apply_delay_ms"] is not None and p["apply_delay_ms"] >= 0
        assert p["source_clock_ms"] > 0

    # resume / re-run writes identical cycle files (idempotent, no dup rows)
    n_rows = len(m)
    CdcJob(cfg).run()
    assert len(MetricsLog(cfg.lake_dir).read()) == n_rows


def test_poison_and_ddl_families_emitted(ray_session, tmp_path):
    """POISON_ROWS / DDL_COUNT are real emitted families (the collector
    surface exports them), not just declared names; DDL counts reflect the
    fixture's replicated DDL applies."""
    from canal_ray.config import CdcConfig
    from canal_ray.loggen import generate_fixture
    from canal_ray.metrics import DDL_COUNT, POISON_ROWS, MetricsLog
    from canal_ray.pipeline import CdcJob

    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=200, n_events=2_000, n_segments=2, seed=87)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=2,
        epoch_segments=1,
    )
    CdcJob(cfg).run()
    df = MetricsLog(cfg.lake_dir).read()
    fams = set(df["metric"])
    assert POISON_ROWS in fams and DDL_COUNT in fams
    # the default fixture has 3 DDLs replicated to every partition
    ddl_total = df[df["metric"] == DDL_COUNT]["value"].sum()
    assert ddl_total == 3 * cfg.num_partitions
    assert df[df["metric"] == POISON_ROWS]["value"].sum() == 0  # clean stream

"""Multi-table routing (messageTopics analog): two jobs over ONE log, each
subscribed to its own table with its own schema/PK/lake — plus heartbeat
skipping."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from canal_ray.config import CdcConfig
from canal_ray.loggen import generate_fixture, segment_paths
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob


@pytest.fixture(scope="module")
def mt_fixture(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mt"))
    meta = generate_fixture(d, n_base=500, n_events=8_000, n_segments=4, seed=23,
                            p_noise=0.05)
    return d, meta


def test_heartbeats_present_and_skipped(ray_session, mt_fixture, tmp_path):
    d, meta = mt_fixture
    log = pd.concat([pq.read_table(s).to_pandas() for s in segment_paths(d)])
    assert (log["op"] == "MHEARTBEAT").sum() > 0
    cfg = CdcConfig(log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
                    base_table=f"{d}/base/repos.parquet",
                    num_partitions=4, epoch_segments=2)
    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)


def test_second_table_routed_to_own_lake(ray_session, mt_fixture, tmp_path):
    d, meta = mt_fixture
    # audit table: payload (id, note), PK (id, note); insert-only stream
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake_audit"),
        base_table=None,
        table_filter=r"mytest\.audit",
        pk_columns=("id", "note"),
        initial_schema=(("id", "string"), ("note", "string")),
        num_partitions=4, epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()
    eng = job.state_pandas()
    log = pd.concat([pq.read_table(s).to_pandas() for s in segment_paths(d)])
    audit_rows = log[log["table_name"] == "audit"]
    assert len(eng) == len(audit_rows) > 0  # unique ids -> all rows live
    assert set(eng.columns) == {"id", "note"}
    assert set(eng["id"]) == set(audit_rows["pk_repo"])
    assert eng["note"].str.startswith("audit row").all()

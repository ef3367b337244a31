"""DCL query entries (GRANT/REVOKE) — filterQueryDcl semantics.

Reference: LogEventConvert.java:98,383 — DCL statements arrive as
QUERY-class entries; filterQueryDcl drops them at parse, otherwise they are
delivered to protocol clients as meta entries with no row or schema effect.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def dcl_fixture(tmp_path_factory):
    from canal_ray.loggen import generate_fixture

    d = str(tmp_path_factory.mktemp("dcl"))
    meta = generate_fixture(
        d, n_base=500, n_events=6_000, n_segments=3, seed=31, dcl_at=0.4
    )
    assert meta["dcl_lsn"] is not None
    return d, meta


def _cfg(d, lake, **kw):
    from canal_ray.config import CdcConfig

    return CdcConfig(
        log_dir=os.path.join(d, "binlog"),
        lake_dir=lake,
        base_table=os.path.join(d, "base", "repos.parquet"),
        num_partitions=4,
        epoch_segments=1,
        **kw,
    )


def test_dcl_passthrough_and_no_row_effect(ray_session, dcl_fixture, tmp_path):
    """Unfiltered: clients see the GRANT entry exactly once; the lake state
    is byte-identical to the sequential oracle (DCL applies nothing)."""
    from canal_ray.connector import CdcConnector
    from canal_ray.loggen import DCL_SQL
    from canal_ray.oracle import replay_oracle, state_digest
    from canal_ray.pipeline import CdcJob

    d, meta = dcl_fixture
    cfg = _cfg(d, str(tmp_path / "lake"))

    conn = CdcConnector(cfg)
    seen = []
    while (got := conn.get_without_ack()) is not None:
        batch_id, table = got
        ops = table["op"].to_pylist()
        for i, op in enumerate(ops):
            if op == "DCL":
                seen.append(
                    (table["lsn"][i].as_py(), table["ddl_sql"][i].as_py())
                )
        conn.ack(batch_id)
    assert seen == [(meta["dcl_lsn"], DCL_SQL)]  # exactly once, right lsn

    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)


def test_dcl_filtered(ray_session, dcl_fixture, tmp_path):
    """filter_query_dcl=True: the GRANT entry never reaches a client; lake
    state unchanged either way."""
    from canal_ray.connector import CdcConnector
    from canal_ray.oracle import replay_oracle, state_digest
    from canal_ray.pipeline import CdcJob

    d, _meta = dcl_fixture
    cfg = _cfg(d, str(tmp_path / "lake"), filter_query_dcl=True)

    conn = CdcConnector(cfg)
    n_dcl = 0
    while (got := conn.get_without_ack()) is not None:
        batch_id, table = got
        n_dcl += table["op"].to_pylist().count("DCL")
        conn.ack(batch_id)
    assert n_dcl == 0

    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)


def test_dcl_does_not_evolve_schema(ray_session, dcl_fixture, tmp_path):
    """schema_as_of straddling the DCL lsn: identical before/after (a GRANT
    carries ddl_sql but is not DDL — tsdb's scan must skip it)."""
    from canal_ray.tsdb import schema_as_of

    d, meta = dcl_fixture
    cfg = _cfg(d, str(tmp_path / "lake"))
    lsn = meta["dcl_lsn"]
    before = schema_as_of(cfg, lsn - 1, use_checkpoints=False)
    after = schema_as_of(cfg, lsn + 1, use_checkpoints=False)
    assert before.fingerprint() == after.fingerprint()

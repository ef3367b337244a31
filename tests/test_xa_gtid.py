"""GTID bookkeeping + XA transaction events.

GTID: every transaction event carries ``gtid = "server_uuid:txn"`` (the
Header gtid field, EntryProtocol.proto:32-36) and epoch manifests checkpoint
the ack point's gtid watermark (position/EntryPosition.java:9-43 keeps gtid
next to the log position).

XA: EventType.XACOMMIT/XAROLLBACK (EntryProtocol.proto:202-222). Visibility
model is optimistic-apply / retroactive-rollback — row events of a prepared
XA txn stream like any DML and an XAROLLBACK terminal marker retroactively
voids them: an XA-rolled-back txn's rows never reach the lake, a point-in-
time read AT-or-after the marker excludes them, and a protocol client never
receives them. Markers always live in the txn's own segment, so rollback
exclusion never crosses an ack point.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from canal_ray.config import CdcConfig
from canal_ray.loggen import generate_fixture, segment_paths
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob, xa_rollback_txns


def _log_rows(fix: str, columns: list[str]) -> list[dict]:
    out = []
    for seg in segment_paths(fix):
        out.extend(pq.read_table(seg, columns=columns).to_pylist())
    return out


def test_gtid_populated_and_checkpointed(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    meta = generate_fixture(d, n_base=200, n_events=3_000, n_segments=3, seed=77)
    uuid = meta["server_uuid"]
    rows = _log_rows(d, ["lsn", "op", "txn_id", "gtid"])
    assert rows, "empty fixture"
    for r in rows:
        if r["op"] == "MHEARTBEAT":
            assert r["gtid"] is None  # liveness, not a txn event
        else:
            assert r["gtid"] == f"{uuid}:{r['txn_id']}"

    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=1,
    )
    job = CdcJob(cfg)
    job.run()
    # each file-backed epoch's manifest pins the gtid at its ack point
    per_seg: dict[int, str] = {}
    for r in rows:
        if r["gtid"] is not None:
            per_seg[r["lsn"]] = r["gtid"]
    last = job.store.last_complete_epoch()
    assert last >= 1
    for e in range(1, last + 1):
        m = job.store.read_epoch(e)
        seg = pq.read_table(
            f"{d}/binlog/{m['segments'][0]}", columns=["lsn", "gtid"]
        )
        lsns = [
            l for l, g in zip(seg["lsn"].to_pylist(), seg["gtid"].to_pylist())
            if g is not None
        ]
        assert m["gtid_hi"] == per_seg[max(lsns)]


def test_xa_rollback_rows_never_reach_lake(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    meta = generate_fixture(
        d, n_base=300, n_events=6_000, n_segments=4, seed=78, xa_frac=0.2
    )
    rb = set(meta["xa_rollback_txns"])
    assert rb, "fixture produced no rolled-back XA txns"
    # the engine-side scan finds exactly the generator's rollback set
    assert set(xa_rollback_txns(segment_paths(d)).tolist()) == rb

    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()
    want, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(want)


def test_xa_rollback_boundary_point_in_time(ray_session, tmp_path):
    """Cuts straddling an XAROLLBACK marker: the txn's rows are visible
    just below the marker (prepared, not yet rolled back) and gone at it."""
    d = str(tmp_path / "fix")
    meta = generate_fixture(
        d, n_base=300, n_events=6_000, n_segments=4, seed=79, xa_frac=0.25
    )
    rb = set(meta["xa_rollback_txns"])
    rows = _log_rows(d, ["lsn", "op", "txn_id", "table_name"])
    # a rolled-back txn that actually touched the subscribed table
    marker_lsn = None
    for txn in sorted(rb):
        touched = [
            r for r in rows
            if r["txn_id"] == txn and r["table_name"] == "repos"
            and r["op"] in ("INSERT", "UPDATE", "DELETE")
        ]
        if touched:
            marker_lsn = next(
                r["lsn"] for r in rows
                if r["txn_id"] == txn and r["op"] == "XAROLLBACK"
            )
            break
    assert marker_lsn is not None, "no rolled-back txn touched repos"

    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()
    for cut in (marker_lsn - 1, marker_lsn):
        got = job.state_as_of(cut)
        want, _ = replay_oracle(d, list(cfg.initial_schema), up_to_lsn=cut)
        assert state_digest(got) == state_digest(want), f"as-of {cut}"
    # the rollback visibly changes state at the marker
    assert state_digest(job.state_as_of(marker_lsn - 1)) != state_digest(
        job.state_as_of(marker_lsn)
    )


def test_connector_never_delivers_rolled_back_rows(ray_session, tmp_path):
    from canal_ray.connector import CdcConnector

    d = str(tmp_path / "fix")
    meta = generate_fixture(
        d, n_base=200, n_events=4_000, n_segments=4, seed=80, xa_frac=0.2
    )
    rb = set(meta["xa_rollback_txns"])
    assert rb
    rb_lsns = {
        r["lsn"]
        for r in _log_rows(d, ["lsn", "op", "txn_id"])
        if r["txn_id"] in rb
    }
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        num_partitions=2, epoch_segments=2,
    )
    delivered: set[int] = set()
    for _, table in CdcConnector(cfg, client_id="xa").drain():
        delivered.update(table["lsn"].to_pylist())
    assert delivered, "connector delivered nothing"
    assert delivered.isdisjoint(rb_lsns)
    # committed XA txns' rows DO flow
    committed_dml = {
        r["lsn"]
        for r in _log_rows(d, ["lsn", "op", "txn_id", "table_name"])
        if r["txn_id"] not in rb and r["table_name"] == "repos"
        and r["op"] in ("INSERT", "UPDATE", "DELETE")
    }
    assert committed_dml & delivered

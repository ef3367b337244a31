"""External consumer protocol: subscribe/getWithoutAck/ack/rollback with
crash-mid-batch redelivery (CanalServerWithEmbedded.java:350-464 analog)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from canal_ray.config import CdcConfig
from canal_ray.connector import CdcConnector
from canal_ray.loggen import generate_fixture


def _cfg(tmp_path, d):
    return CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "meta"),
        num_partitions=4, epoch_segments=2,
    )


def test_get_ack_rollback_and_crash_resume(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=100, n_events=3_000, n_segments=6, seed=31)
    cfg = _cfg(tmp_path, d)

    c = CdcConnector(cfg, client_id="app1")
    c.subscribe()
    assert c.acked_epoch() == -1

    # batch 1: get -> ack
    bid1, t1 = c.get_without_ack()
    assert t1.num_rows > 0
    # decoded wire format: filtered to the subscribed table, partition-routed
    assert set(t1.column_names) >= {"lsn", "op", "partition_id"}
    c.ack(bid1)
    assert c.acked_epoch() == 1

    # double-get without ack is refused
    bid2, t2 = c.get_without_ack()
    try:
        c.get_without_ack()
        raise AssertionError("second get before ack must raise")
    except RuntimeError:
        pass
    # rollback -> identical redelivery
    c.rollback(bid2)
    bid2b, t2b = c.get_without_ack()
    assert t2b.num_rows == t2.num_rows
    assert pc.min(t2b["lsn"]).as_py() == pc.min(t2["lsn"]).as_py()

    # crash mid-batch: a NEW connector instance (process restart) with the
    # same client id resumes from the last ack — same batch redelivered once
    c2 = CdcConnector(cfg, client_id="app1")
    bid3, t3 = c2.get_without_ack()
    assert t3.num_rows == t2.num_rows
    assert pc.min(t3["lsn"]).as_py() == pc.min(t2["lsn"]).as_py()
    c2.ack(bid3)
    assert c2.acked_epoch() == 2

    # an independent client has its own cursor at the beginning
    other = CdcConnector(cfg, client_id="app2")
    _, to = other.get_without_ack()
    assert pc.min(to["lsn"]).as_py() < pc.min(t3["lsn"]).as_py()

    # drain consumes the remainder exactly once, in order
    total = t1.num_rows + t3.num_rows
    n_batches = 0
    for bid, t in c2.drain():
        total += t.num_rows
        n_batches += 1
    assert n_batches == 1  # 6 segments / 2 per epoch = 3 epochs, 2 consumed
    assert c2.acked_epoch() == 3
    # drained total equals a full one-shot decode of the whole log, with
    # DDL/TRUNCATE counted ONCE (decode replicates them per sink partition;
    # the client protocol de-duplicates to exactly-once delivery)
    import ray.data
    from canal_ray.decode import make_decoder

    full_tbl = pa.concat_tables(
        ray.data.read_parquet(
            [f"{d}/binlog/segment_{i:05d}.parquet" for i in range(6)]
        )
        .map_batches(make_decoder(cfg, precompact=False), batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    is_meta = pc.is_in(full_tbl["op"], value_set=pa.array(["DDL", "TRUNCATE"]))
    n_dml = full_tbl.filter(pc.invert(is_meta)).num_rows
    n_meta_once = full_tbl.filter(
        pc.and_(is_meta, pc.equal(full_tbl["partition_id"], 0))
    ).num_rows
    assert total == n_dml + n_meta_once


def test_connector_row_filter_delivery(ray_session, tmp_path):
    """A content predicate restricts DELIVERED events (AviaterELFilter on the
    consumer path): only matching DML arrives; DDL/TRUNCATE still flow."""
    from canal_ray.config import CdcConfig
    from canal_ray.connector import CdcConnector
    from canal_ray.loggen import generate_fixture

    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=200, n_events=2_000, n_segments=2, seed=83)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "meta"),
        num_partitions=2, epoch_segments=1,
        row_filter="lang == 'python'",
    )
    conn = CdcConnector(cfg, client_id="rf")
    tables = [t for _, t in conn.drain()]
    import pyarrow as pa

    all_events = pa.concat_tables(tables)
    ops = set(all_events["op"].to_pylist())
    assert "DDL" in ops  # meta events exempt from the predicate
    # every delivered DML row is a python-lang event: decode collapses cols,
    # so check vals position of lang in the full-image prefix
    import numpy as np

    dml = all_events.filter(
        pa.compute.is_in(all_events["op"], value_set=pa.array(["INSERT", "UPDATE"]))
    )
    assert dml.num_rows > 0
    langs = {v[3] for v in dml["vals"].to_pylist() if v is not None and len(v) >= 4}
    assert langs == {"python"}


def test_connector_tail_append_delivers_new_segments(ray_session, tmp_path):
    """Segments appended AFTER an ack must reach the client: acked epochs'
    segment lists are pinned in the cursor (CdcJob.plan contract) — naive
    re-chunking would absorb new files into an already-acked epoch and the
    cursor would silently skip them (event loss)."""
    import glob
    import os
    import shutil

    from canal_ray.config import CdcConfig
    from canal_ray.connector import CdcConnector
    from canal_ray.loggen import generate_fixture

    d = str(tmp_path / "full")
    generate_fixture(d, n_base=100, n_events=1_200, n_segments=6, seed=85)
    segs = sorted(glob.glob(f"{d}/binlog/*.parquet"))
    live = str(tmp_path / "live")
    os.makedirs(f"{live}/binlog")
    # 3 segments with epoch_segments=2 -> epoch 2 is PARTIAL when acked
    for s in segs[:3]:
        shutil.copy(s, f"{live}/binlog/")
    cfg = CdcConfig(
        log_dir=f"{live}/binlog", lake_dir=str(tmp_path / "meta"),
        num_partitions=2, epoch_segments=2,
    )
    conn = CdcConnector(cfg, client_id="tail")
    n1 = sum(t.num_rows for _, t in conn.drain())
    assert conn.acked_epoch() == 2  # epochs 1 (2 segs) + 2 (1 seg, partial)

    for s in segs[3:]:
        shutil.copy(s, f"{live}/binlog/")
    # fresh client object, same cursor (crash/restart between polls)
    conn2 = CdcConnector(cfg, client_id="tail")
    n2 = sum(t.num_rows for _, t in conn2.drain())
    assert n2 > 0  # the appended segments ARE delivered

    # a from-scratch client over the full log sees exactly the same events
    conn3 = CdcConnector(cfg, client_id="fresh")
    n_all = sum(t.num_rows for _, t in conn3.drain())
    assert n1 + n2 == n_all


def test_connector_legacy_cursor_migration_no_loss(ray_session, tmp_path):
    """A pre-pinning cursor file ({'acked_epoch': N} only) must migrate
    at-least-once: appended segments are re-deliverable, never skipped."""
    import glob
    import json
    import os
    import shutil

    from canal_ray.checkpoint import atomic_write_json
    from canal_ray.config import CdcConfig
    from canal_ray.connector import CdcConnector
    from canal_ray.loggen import generate_fixture

    d = str(tmp_path / "full")
    generate_fixture(d, n_base=100, n_events=1_200, n_segments=6, seed=86)
    segs = sorted(glob.glob(f"{d}/binlog/*.parquet"))
    live = str(tmp_path / "live")
    os.makedirs(f"{live}/binlog")
    for s in segs[:3]:
        shutil.copy(s, f"{live}/binlog/")
    cfg = CdcConfig(
        log_dir=f"{live}/binlog", lake_dir=str(tmp_path / "meta"),
        num_partitions=2, epoch_segments=2,
    )
    # simulate the OLD cursor format after the old client acked everything
    # present (epochs 1..2 over 3 files, epoch 2 partial)
    meta = os.path.join(cfg.lake_dir, "_clients")
    os.makedirs(meta, exist_ok=True)
    atomic_write_json(os.path.join(meta, "legacy.json"), {"acked_epoch": 2})

    for s in segs[3:]:
        shutil.copy(s, f"{live}/binlog/")
    conn = CdcConnector(cfg, client_id="legacy")
    delivered = [t for _, t in conn.drain()]
    import pyarrow as pa

    got_lsns = set(pa.concat_tables(delivered)["lsn"].to_pylist())
    # everything in the appended segments MUST be delivered (no loss);
    # re-delivery of part of the old partial epoch is allowed (at-least-once)
    import pandas as pd

    appended = pd.concat(
        [pd.read_parquet(s, columns=["lsn"]) for s in segs[3:]]
    )["lsn"]
    missing = set(appended) - got_lsns
    # decode drops heartbeats/noise-table rows; compare against decodable set
    raw = pd.concat(
        [pd.read_parquet(s) for s in segs[3:]]
    )
    decodable = raw[
        (raw["schema_name"] == "mytest") & (raw["table_name"] == "repos")
    ]["lsn"]
    assert set(decodable) - got_lsns == set()


def test_connector_batch_window_inorder_ack(ray_session, tmp_path):
    """k>1 outstanding batches with strictly in-order ack (the reference's
    per-client in-flight batch map, CanalServerWithEmbedded.java:350-464):
    3 batches outstanding, out-of-order ack raises, rollback resets the get
    cursor to the ack cursor, and a crash redelivers ALL un-acked epochs."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pytest

    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=100, n_events=3_000, n_segments=6, seed=87)
    cfg = _cfg(tmp_path, d)  # 6 segments / epoch_segments=2 -> 3 epochs

    c = CdcConnector(cfg, client_id="win", window=3)
    b1, t1 = c.get_without_ack()
    b2, t2 = c.get_without_ack()
    b3, t3 = c.get_without_ack()
    # the three batches cover disjoint, increasing lsn ranges
    assert pc.max(t1["lsn"]).as_py() < pc.min(t2["lsn"]).as_py()
    assert pc.max(t2["lsn"]).as_py() < pc.min(t3["lsn"]).as_py()
    # window full
    with pytest.raises(RuntimeError):
        c.get_without_ack()
    # out-of-order ack refused, cursor unmoved
    with pytest.raises(ValueError):
        c.ack(b2)
    assert c.acked_epoch() == -1
    # in-order ack advances the durable cursor batch by batch
    c.ack(b1)
    assert c.acked_epoch() == 1
    # rollback with b2, b3 outstanding: get cursor resets to the ack cursor
    # and the next get redelivers epoch 2, not epoch 4
    c.rollback()
    b2b, t2b = c.get_without_ack()
    assert t2b.num_rows == t2.num_rows
    assert pc.min(t2b["lsn"]).as_py() == pc.min(t2["lsn"]).as_py()
    c.rollback()

    # crash with 1-acked-of-3: a new connector gets the 2 un-acked epochs,
    # crashes without ack -> a fresh instance redelivers BOTH
    c2 = CdcConnector(cfg, client_id="win", window=3)
    r1, u1 = c2.get_without_ack()
    r2, u2 = c2.get_without_ack()
    del c2  # crash: nothing acked
    c3 = CdcConnector(cfg, client_id="win", window=3)
    total = 0
    seen = []
    for bid, t in c3.drain():
        total += t.num_rows
        seen.append(t)
    assert total == u1.num_rows + u2.num_rows
    got = pa.concat_tables(seen)
    want = pa.concat_tables([u1, u2])
    assert sorted(got["lsn"].to_pylist()) == sorted(want["lsn"].to_pylist())
    assert c3.acked_epoch() == 3

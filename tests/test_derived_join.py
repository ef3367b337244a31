"""Join-table derived maintenance (ESSyncService updateByQuery analog):
staged incremental updates over two co-partitioned lakes, with an explicit
dimension-row group MOVE between stages — the case the reference serves
with updateByQuery re-writes."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from canal_ray.config import CdcConfig
from canal_ray.derived_join import JoinedDerivedTable
from canal_ray.loggen import EPOCH_MS, LOG_SCHEMA
from canal_ray.pipeline import CdcJob


def _write_segment(log_dir: str, seg: int, rows: list[dict]) -> None:
    os.makedirs(log_dir, exist_ok=True)
    full = []
    for r in rows:
        full.append(
            {
                "lsn": r["lsn"], "segment": seg, "txn_id": r["lsn"],
                "gtid": None, "op": r["op"],
                "schema_name": "appdb", "table_name": r["table"],
                "pk_repo": r["k"], "pk_path": "",
                "cols": r.get("cols"), "vals": r.get("vals"),
                "ddl_sql": None,
                "execute_time": EPOCH_MS + r["lsn"] * 10,
            }
        )
    pq.write_table(
        pa.Table.from_pylist(full, schema=LOG_SCHEMA),
        os.path.join(log_dir, f"segment_{seg:05d}.parquet"),
    )


def _fact_cfg(root, lake):
    return CdcConfig(
        log_dir=os.path.join(root, "fact_log"), lake_dir=lake,
        schema_name="appdb", table_name="fact",
        pk_columns=("uid", "utag"),
        initial_schema=(("uid", "string"), ("utag", "string"), ("val", "int64")),
        table_filter=r"appdb\.fact", num_partitions=4, epoch_segments=1,
    )


def _dim_cfg(root, lake, num_partitions=4):
    return CdcConfig(
        log_dir=os.path.join(root, "dim_log"), lake_dir=lake,
        schema_name="appdb", table_name="dim",
        pk_columns=("uid", "utag"),
        initial_schema=(("uid", "string"), ("utag", "string"), ("grp", "string")),
        table_filter=r"appdb\.dim", num_partitions=num_partitions,
        epoch_segments=1,
    )


def _ins(lsn, table, k, *payload):
    names = {"fact": ["uid", "utag", "val"], "dim": ["uid", "utag", "grp"]}[table]
    return {
        "lsn": lsn, "op": "INSERT", "table": table, "k": k,
        "cols": names, "vals": [k, "", *[str(p) for p in payload]],
    }


def _upd(lsn, table, k, *payload):
    r = _ins(lsn, table, k, *payload)
    r["op"] = "UPDATE"
    return r


def _del(lsn, table, k):
    return {"lsn": lsn, "op": "DELETE", "table": table, "k": k,
            "cols": None, "vals": None}


def test_joined_derived_incremental_with_group_move(ray_session, tmp_path):
    root = str(tmp_path)
    # fact: k1=10, k2=20, k3=30; then k1->15, k3 deleted
    _write_segment(f"{root}/fact_log", 0,
                   [_ins(1, "fact", "k1", 10), _ins(2, "fact", "k2", 20),
                    _ins(3, "fact", "k3", 30)])
    _write_segment(f"{root}/fact_log", 1,
                   [_upd(4, "fact", "k1", 15), _del(5, "fact", "k3")])
    # dim: k1,k2 -> g1; k3 -> g2; then k1 MOVES to g2
    _write_segment(f"{root}/dim_log", 0,
                   [_ins(1, "dim", "k1", "g1"), _ins(2, "dim", "k2", "g1"),
                    _ins(3, "dim", "k3", "g2")])
    _write_segment(f"{root}/dim_log", 1, [_upd(4, "dim", "k1", "g2")])

    fact_job = CdcJob(_fact_cfg(root, f"{root}/fact_lake"))
    dim_job = CdcJob(_dim_cfg(root, f"{root}/dim_lake"))
    # epoch 0 is the (baseless, empty) bootstrap epoch; epoch 1 = segment 0
    fact_job.run(max_epochs=2)
    dim_job.run(max_epochs=2)

    jd = JoinedDerivedTable(
        fact_job, dim_job, "grp_stats", "grp",
        [("n_keys", "count", None), ("total_val", "sum", "val")],
    )
    t1 = jd.update()
    assert t1.set_index("grp").to_dict("index") == {
        "g1": {"n_keys": 2, "total_val": 30},
        "g2": {"n_keys": 1, "total_val": 30},
    }
    assert t1.reset_index(drop=True).equals(
        jd.recompute(up_to=(1, 1)).reset_index(drop=True)
    )

    # stage 2: fact value change + delete, AND k1's group moves g1 -> g2
    fact_job.run()
    dim_job.run()
    t2 = jd.update()
    assert t2.set_index("grp").to_dict("index") == {
        "g1": {"n_keys": 1, "total_val": 20},   # only k2 remains in g1
        "g2": {"n_keys": 1, "total_val": 15},   # k1 moved in with its new val
    }
    assert t2.reset_index(drop=True).equals(jd.recompute().reset_index(drop=True))

    # idempotent: nothing new acked -> same table, no re-fold
    assert jd.update().reset_index(drop=True).equals(t2.reset_index(drop=True))


def test_joined_derived_rejects_mispartitioned_lakes(ray_session, tmp_path):
    root = str(tmp_path)
    _write_segment(f"{root}/fact_log", 0, [_ins(1, "fact", "k1", 1)])
    _write_segment(f"{root}/dim_log", 0, [_ins(1, "dim", "k1", "g1")])
    fact_job = CdcJob(_fact_cfg(root, f"{root}/fact_lake"))
    dim_job = CdcJob(_dim_cfg(root, f"{root}/dim_lake", num_partitions=8))
    with pytest.raises(ValueError, match="co-partition|num_partitions"):
        JoinedDerivedTable(fact_job, dim_job, "x", "grp", [("n", "count", None)])


def test_joined_derived_crash_between_table_and_cursor(ray_session, tmp_path):
    """A crash AFTER the versioned table write but BEFORE the cursor write
    must be repaired by the next update(): the diff re-runs from the old 2D
    cursor and rewrites the SAME target bytes (deterministic), so nothing
    double-applies."""
    root = str(tmp_path)
    _write_segment(f"{root}/fact_log", 0,
                   [_ins(1, "fact", "k1", 10), _ins(2, "fact", "k2", 20)])
    _write_segment(f"{root}/dim_log", 0,
                   [_ins(1, "dim", "k1", "g1"), _ins(2, "dim", "k2", "g2")])
    fact_job = CdcJob(_fact_cfg(root, f"{root}/fact_lake"))
    dim_job = CdcJob(_dim_cfg(root, f"{root}/dim_lake"))
    fact_job.run()
    dim_job.run()

    jd = JoinedDerivedTable(
        fact_job, dim_job, "grp_stats", "grp",
        [("n_keys", "count", None), ("total_val", "sum", "val")],
    )
    want = jd.update()
    # simulate the crash: versioned table exists, cursor write lost
    os.unlink(jd._cursor_path)
    assert jd.cursor() == (-1, -1)
    again = jd.update()  # re-runs the fold from scratch, rewrites same file
    assert again.reset_index(drop=True).equals(want.reset_index(drop=True))
    assert jd.cursor() == (fact_job.store.last_complete_epoch(),
                           dim_job.store.last_complete_epoch())
    # and the stored table equals the computed one
    assert jd.read().reset_index(drop=True).equals(want.reset_index(drop=True))

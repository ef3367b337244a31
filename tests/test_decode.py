"""Unit tests for the decode stage (filters, routing, pre-compaction, DDL
replication) and the FlatMessage conversion — no full pipeline needed."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from canal_ray.config import CdcConfig
from canal_ray.decode import make_decoder
from canal_ray.flat import to_flat_messages
from canal_ray.loggen import EPOCH_MS, LOG_SCHEMA


def _mk_batch(rows: list[dict]) -> pa.Table:
    defaults = dict(
        lsn=0, segment=0, txn_id=0, op="INSERT", schema_name="mytest",
        table_name="repos", pk_repo="o/r", pk_path="p", cols=None, vals=None,
        ddl_sql=None, execute_time=EPOCH_MS,
    )
    full = [{**defaults, **r} for r in rows]
    return pa.Table.from_pylist(full, schema=LOG_SCHEMA)


def _cfg(**kw) -> CdcConfig:
    return CdcConfig(log_dir="/tmp/x", lake_dir="/tmp/y", num_partitions=4, **kw)


def test_subscribe_filter_whitelist_and_blacklist():
    batch = _mk_batch(
        [
            {"lsn": 1, "table_name": "repos"},
            {"lsn": 2, "table_name": "audit"},
            {"lsn": 3, "schema_name": "other", "table_name": "repos"},
        ]
    )
    out = make_decoder(_cfg())(batch)
    assert out["lsn"].to_pylist() == [1]  # only mytest.repos passes
    # blacklist beats whitelist (EntryEventSink.doFilter second chance)
    cfg = _cfg(table_filter=r"mytest\..*", table_black_filter=r"mytest\.audit")
    out = make_decoder(cfg)(batch)
    assert out["lsn"].to_pylist() == [1]


def test_dml_class_filters():
    batch = _mk_batch(
        [
            {"lsn": 1, "op": "INSERT"},
            {"lsn": 2, "op": "UPDATE", "pk_path": "p2"},
            {"lsn": 3, "op": "DELETE", "pk_path": "p3"},
        ]
    )
    out = make_decoder(_cfg(filter_dml_delete=True))(batch)
    assert sorted(out["op"].to_pylist()) == ["INSERT", "UPDATE"]
    out = make_decoder(_cfg(filter_dml_insert=True, filter_dml_update=True))(batch)
    assert out["op"].to_pylist() == ["DELETE"]


def test_precompaction_keeps_last_per_key():
    batch = _mk_batch(
        [
            {"lsn": 1, "op": "INSERT", "pk_path": "a"},
            {"lsn": 5, "op": "UPDATE", "pk_path": "a"},
            {"lsn": 3, "op": "DELETE", "pk_path": "a"},
            {"lsn": 2, "op": "INSERT", "pk_path": "b"},
        ]
    )
    out = make_decoder(_cfg())(batch)
    by_key = {r["pk_path"]: r for r in out.to_pylist()}
    assert by_key["a"]["lsn"] == 5 and by_key["a"]["op"] == "UPDATE"
    assert by_key["b"]["lsn"] == 2


def test_ddl_replicated_to_all_partitions():
    batch = _mk_batch(
        [
            {"lsn": 1, "op": "INSERT", "pk_path": "a"},
            {
                "lsn": 2, "op": "DDL", "pk_repo": None, "pk_path": None,
                "ddl_sql": "ALTER TABLE mytest.repos ADD COLUMN stars INT NULL",
            },
        ]
    )
    out = make_decoder(_cfg())(batch)
    ddl_rows = [r for r in out.to_pylist() if r["op"] == "DDL"]
    assert sorted(r["partition_id"] for r in ddl_rows) == [0, 1, 2, 3]
    dml_rows = [r for r in out.to_pylist() if r["op"] != "DDL"]
    assert len(dml_rows) == 1 and 0 <= dml_rows[0]["partition_id"] < 4


def test_routing_is_deterministic_and_key_stable():
    rows = [{"lsn": i, "pk_repo": f"o/r{i % 7}", "pk_path": f"p{i}"} for i in range(100)]
    out1 = make_decoder(_cfg())(_mk_batch(rows))
    out2 = make_decoder(_cfg())(_mk_batch(rows))
    assert out1["partition_id"].to_pylist() == out2["partition_id"].to_pylist()
    # same key in different batches -> same partition
    a = make_decoder(_cfg())(_mk_batch([{"lsn": 1, "pk_repo": "x/y", "pk_path": "z"}]))
    b = make_decoder(_cfg())(_mk_batch([{"lsn": 9, "pk_repo": "x/y", "pk_path": "z"}]))
    assert a["partition_id"][0].as_py() == b["partition_id"][0].as_py()


def test_flat_message_conversion():
    batch = _mk_batch(
        [
            {"lsn": 1, "op": "INSERT", "cols": ["repo", "path"], "vals": ["o/r", "p"]},
            {"lsn": 2, "op": "DELETE", "pk_path": "p2"},
            {
                "lsn": 3, "op": "DDL", "pk_repo": None, "pk_path": None,
                "ddl_sql": "ALTER TABLE mytest.repos ADD COLUMN stars INT NULL",
            },
        ]
    )
    import json

    flat = to_flat_messages(batch).to_pylist()
    ins, dele, ddl = flat
    assert ins["type"] == "INSERT"
    assert json.loads(ins["data"]) == {"repo": "o/r", "path": "p"}
    # keys are sorted in the serialized object (FastJSON producer contract)
    assert list(json.loads(ins["data"])) == ["path", "repo"]
    assert ins["pkNames"] == ["repo", "path"] and not ins["isDdl"]
    assert dele["data"] is None and json.loads(dele["old"])["path"] == "p2"
    assert ddl["isDdl"] and "ADD COLUMN" in ddl["sql"]
    assert ins["es"] == EPOCH_MS


def test_flat_message_parity_with_per_row_dumps():
    """The grouped C-serializer path must agree (parsed-value equality) with
    the obvious per-row json.dumps construction, across mixed column sets,
    embedded quotes/backslashes/newlines, and null values."""
    import json

    rows = [
        {"lsn": 1, "op": "INSERT", "cols": ["repo", "path"], "vals": ['o"r', "p\\q"]},
        {"lsn": 2, "op": "UPDATE", "cols": ["repo", "path", "stars"],
         "vals": ["a/b\nc", "p2", None], "pk_repo": 'o"x', "pk_path": "p\t2"},
        {"lsn": 3, "op": "DELETE", "pk_repo": "o3", "pk_path": "p3"},
        {"lsn": 4, "op": "INSERT", "cols": ["repo", "path"], "vals": ["x", "y"]},
    ]
    flat = to_flat_messages(_mk_batch(rows)).to_pylist()
    for r, f in zip(rows, flat):
        if r["op"] in ("INSERT", "UPDATE"):
            want = dict(zip(r["cols"], r["vals"]))
            assert json.loads(f["data"]) == json.loads(
                json.dumps(want, sort_keys=True)
            )
        else:
            assert f["data"] is None
        if r["op"] in ("UPDATE", "DELETE"):
            assert json.loads(f["old"]) == {
                "repo": r.get("pk_repo"), "path": r.get("pk_path")
            }


def test_produce_flat_json(ray_session, tmp_path):
    import glob
    import json
    import os

    from canal_ray.flat import produce_flat_json
    from canal_ray.loggen import generate_fixture

    d = str(tmp_path / "fix")
    meta = generate_fixture(d, n_base=100, n_events=1_000, n_segments=2, seed=13)
    out = str(tmp_path / "mq")
    n = produce_flat_json(f"{d}/binlog", out)
    assert n == 1_000
    files = glob.glob(f"{out}/*.json")
    assert files
    with open(files[0]) as f:
        first = json.loads(f.readline())
    assert {"id", "database", "table", "type", "data", "old", "isDdl"} <= set(first)

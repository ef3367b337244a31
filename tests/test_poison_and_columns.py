"""Poison-event quarantine (skip-on-poison analog) and column-filter tests."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from canal_ray.config import CdcConfig
from canal_ray.loggen import EPOCH_MS, LOG_SCHEMA, generate_fixture
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob


def _inject_poison(fixture_dir: str, n_events: int) -> int:
    """Append a segment containing one event with an un-castable stars value."""
    seg_dir = os.path.join(fixture_dir, "binlog")
    last = sorted(os.listdir(seg_dir))[-1]
    idx = int(last.split("_")[1].split(".")[0]) + 1
    lsn = n_events + 1
    row = {
        "lsn": lsn, "segment": idx, "txn_id": 10**6, "op": "UPDATE",
        "schema_name": "mytest", "table_name": "repos",
        "pk_repo": "org0/repo0", "pk_path": "src/m0/f0.py",
        "cols": ["repo", "path", "commit", "lang", "content", "stars", "license"],
        "vals": ["org0/repo0", "src/m0/f0.py", "c" * 40, "python", "x",
                 "NOT_A_NUMBER", "mit"],
        "ddl_sql": None, "execute_time": EPOCH_MS + lsn * 10,
    }
    good = dict(row, lsn=lsn + 1, pk_path="src/m0/f1.py",
                vals=[v if v != "NOT_A_NUMBER" else "77" for v in row["vals"]])
    good["vals"][1] = "src/m0/f1.py"
    tbl = pa.Table.from_pylist([row, good], schema=LOG_SCHEMA)
    pq.write_table(tbl, os.path.join(seg_dir, f"segment_{idx:05d}.parquet"))
    return lsn


def test_poison_rows_quarantined_not_fatal(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    meta = generate_fixture(d, n_base=300, n_events=3_000, n_segments=3, seed=17)
    poison_lsn = _inject_poison(d, meta["last_lsn"])
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=4, epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()  # must not raise
    lin = job.lineage()
    total_poison = sum(p["poison"] for p in lin["partitions"].values())
    assert total_poison == 1
    qfiles = glob.glob(f"{cfg.lake_dir}/_quarantine/*.parquet")
    assert len(qfiles) == 1
    q = pq.read_table(qfiles[0])
    assert q.num_rows == 1 and q["lsn"][0].as_py() == poison_lsn
    # the good event in the same segment still applied
    eng = job.state_pandas()
    row = eng[(eng.repo == "org0/repo0") & (eng.path == "src/m0/f1.py")]
    assert len(row) == 1 and int(row["stars"].iloc[0]) == 77


def test_out_of_range_numeric_is_poison_not_fatal(ray_session, tmp_path):
    """A well-formed but overflowing numeric (ADVICE r1): regex passes, cast
    would raise ArrowInvalid — must quarantine, not crash the epoch."""
    d = str(tmp_path / "fix")
    meta = generate_fixture(d, n_base=300, n_events=3_000, n_segments=3, seed=17)
    seg_dir = os.path.join(d, "binlog")
    last = sorted(os.listdir(seg_dir))[-1]
    idx = int(last.split("_")[1].split(".")[0]) + 1
    lsn = meta["last_lsn"] + 1
    row = {
        "lsn": lsn, "segment": idx, "txn_id": 10**6, "op": "UPDATE",
        "schema_name": "mytest", "table_name": "repos",
        "pk_repo": "org0/repo0", "pk_path": "src/m0/f0.py",
        "cols": ["repo", "path", "commit", "lang", "content", "stars", "license"],
        "vals": ["org0/repo0", "src/m0/f0.py", "c" * 40, "python", "x",
                 "99999999999999999999", "mit"],  # > int64 max, regex-clean
        "ddl_sql": None, "execute_time": EPOCH_MS + lsn * 10,
    }
    good = dict(row, lsn=lsn + 1, pk_path="src/m0/f2.py",
                vals=[v if not v.startswith("9999") else "42" for v in row["vals"]])
    good["vals"][1] = "src/m0/f2.py"
    tbl = pa.Table.from_pylist([row, good], schema=LOG_SCHEMA)
    pq.write_table(tbl, os.path.join(seg_dir, f"segment_{idx:05d}.parquet"))
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=4, epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()  # must not raise
    lin = job.lineage()
    assert sum(p["poison"] for p in lin["partitions"].values()) == 1
    eng = job.state_pandas()
    r = eng[(eng.repo == "org0/repo0") & (eng.path == "src/m0/f2.py")]
    assert len(r) == 1 and int(r["stars"].iloc[0]) == 42


def test_numeric_poison_mask_ranges():
    """Unit coverage of form + range detection per target type."""
    import numpy as np

    from canal_ray.sink import _numeric_poison_mask

    arr = pa.array([
        "77", "3000000000", "-2147483649", "2147483647", "-2147483648",
        "NOT_A_NUMBER", None, "9223372036854775807", "9223372036854775808",
        "99999999999999999999",
    ])
    got32 = _numeric_poison_mask(arr, pa.int32())
    assert list(got32) == [False, True, True, False, False,
                           True, False, True, True, True]
    got64 = _numeric_poison_mask(arr, pa.int64())
    assert list(got64) == [False, False, False, False, False,
                           True, False, False, True, True]
    farr = pa.array(["1.5", "1e999", "nope", None])
    assert list(_numeric_poison_mask(farr, pa.float64())) == [
        False, False, True, False,
    ]
    assert not np.any(_numeric_poison_mask(pa.array([], type=pa.string()), pa.int32()))


def test_column_filter_projects_lake(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=200, n_events=2_000, n_segments=2, seed=19)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=4,
        epoch_segments=1, column_filter=("commit", "lang", "stars", "license"),
    )
    job = CdcJob(cfg)
    job.run()
    eng = job.state_pandas()
    # content projected away; PK always kept
    assert "content" not in eng.columns
    assert {"repo", "path", "commit", "lang"} <= set(eng.columns)
    # values match the oracle's projection of the same columns
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    oracle_proj = oracle_df[list(eng.columns)]
    assert state_digest(eng) == state_digest(oracle_proj)


def test_truncate_event(ray_session, tmp_path):
    """TRUNCATE wipes all earlier state (base + events) in every partition;
    later events rebuild; resume and compaction preserve the cut."""
    from canal_ray.loggen import generate_fixture

    d = str(tmp_path / "trfix")
    meta = generate_fixture(
        d, n_base=500, n_events=6_000, n_segments=6, seed=43, truncate_at=0.55
    )
    assert meta["truncate_lsn"] is not None
    lake = str(tmp_path / "trlake")
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=lake, base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=2, epochs_per_cycle=2,
    )
    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    eng = job.state_pandas()
    assert state_digest(eng) == state_digest(oracle_df)
    # the cut really happened: far fewer rows than base+inserts
    assert 0 < len(eng) < 500 + 0.4 * 6_000
    # every surviving row postdates the truncate
    lsns = job.read_state(keep_lsn=True).to_pandas()["_lsn"]
    assert (lsns > meta["truncate_lsn"]).all()
    # compaction folds the cut in permanently
    job.compact()
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)

"""Point-in-time schema rebuild (schema_as_of) vs a sequential DDL oracle.

Reference behavior being matched: rebuilding table meta as-of an arbitrary
binlog position (``parse/.../tsdb/DatabaseTableMeta.java:161-181``), not just
at ack points.
"""

from __future__ import annotations

import glob

import pandas as pd

from canal_ray.config import CdcConfig
from canal_ray.ddl import TableSchema
from canal_ray.loggen import generate_fixture
from canal_ray.pipeline import CdcJob
from canal_ray.tsdb import ddl_history, schema_as_of, schema_timeline


def _oracle_timeline(log_dir: str, initial) -> list[tuple[int, str]]:
    """(lsn, fingerprint-after) per DDL, built by an independent sequential
    pandas pass over the raw segments (no tsdb code)."""
    frames = [
        pd.read_parquet(p, columns=["lsn", "ddl_sql"])
        for p in sorted(glob.glob(f"{log_dir}/*.parquet"))
    ]
    df = pd.concat(frames)
    df = df[df["ddl_sql"].notna()].sort_values("lsn")
    schema = TableSchema(initial)
    out = []
    for lsn, sql in zip(df["lsn"], df["ddl_sql"]):
        schema.apply(sql)
        out.append((int(lsn), schema.fingerprint()))
    return out


def _probe_lsns(points: list[tuple[int, str]], max_lsn: int) -> list[int]:
    probes = [0, 1, max_lsn]
    for lsn, _ in points:
        probes += [lsn - 1, lsn, lsn + 1]
    return sorted(set(p for p in probes if 0 <= p <= max_lsn))


def _expected_fp(points, initial, lsn) -> str:
    fp = TableSchema(initial).fingerprint()
    for p_lsn, p_fp in points:
        if p_lsn <= lsn:
            fp = p_fp
    return fp


def test_schema_as_of_matches_sequential_oracle(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    meta = generate_fixture(
        d, n_base=300, n_events=3_000, n_segments=4, seed=61,
        rename_at=0.4, drop_at=0.7,
    )
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=2,
        epoch_segments=1, partial_updates=True,
    )
    points = _oracle_timeline(cfg.log_dir, cfg.initial_schema)
    assert len(points) >= 5  # 3 default DDLs + rename + drop
    max_lsn = meta["last_lsn"] + 10

    # --- pure log replay (no lake state at all) -------------------------
    for lsn in _probe_lsns(points, max_lsn):
        got = schema_as_of(cfg, lsn, use_checkpoints=False)
        assert got.fingerprint() == _expected_fp(points, cfg.initial_schema, lsn), lsn

    # --- checkpoint-seeded fast path gives identical answers ------------
    job = CdcJob(cfg)
    job.run()
    for lsn in _probe_lsns(points, max_lsn):
        got = schema_as_of(cfg, lsn, use_checkpoints=True)
        assert got.fingerprint() == _expected_fp(points, cfg.initial_schema, lsn), lsn
    # end-of-log == the job's own final schema (no column filter set)
    assert schema_as_of(cfg, max_lsn).fingerprint() == job.final_schema().fingerprint()

    # --- timeline audit --------------------------------------------------
    tl = schema_timeline(cfg)
    assert [t["lsn"] for t in tl[1:]] == [l for l, _ in points]
    assert [t["fingerprint"] for t in tl[1:]] == [fp for _, fp in points]
    assert tl[0]["lsn"] == 0

    # --- pruned DDL scan returns exactly the schedule --------------------
    hist = ddl_history(sorted(glob.glob(f"{cfg.log_dir}/*.parquet")))
    assert [l for l, _ in hist] == [l for l, _ in points]

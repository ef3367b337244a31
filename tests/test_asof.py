"""Point-in-time state reads — the DATA half of the reference's
``DatabaseTableMeta.rollback(position)`` (tsdb/DatabaseTableMeta.java:161-181):
``CdcJob.state_as_of(lsn)`` must equal the sequential oracle truncated at that
lsn, at ack points AND mid-epoch, including across RENAME/DROP boundaries."""

from __future__ import annotations

import pyarrow.parquet as pq

from canal_ray.config import CdcConfig
from canal_ray.loggen import generate_fixture, segment_paths
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob


def _ddl_lsns(fix: str) -> list[int]:
    out = []
    for seg in segment_paths(fix):
        t = pq.read_table(seg, columns=["lsn", "op", "ddl_sql"])
        for r in t.to_pylist():
            if r["op"] == "DDL":
                out.append((r["lsn"], r["ddl_sql"]))
    return out


def test_state_as_of_matches_truncated_oracle(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=400, n_events=6_000, n_segments=6, seed=91)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()
    last_lsn = max(pq.read_metadata(s).num_rows for s in [segment_paths(d)[-1]])
    import pyarrow.compute as pc

    last_lsn = int(
        pc.max(pq.read_table(segment_paths(d)[-1], columns=["lsn"])["lsn"]).as_py()
    )
    # three cut points: early mid-epoch, past the first DDL, near the end
    ddls = _ddl_lsns(d)
    cuts = [last_lsn // 5, ddls[0][0] + 7 if ddls else last_lsn // 2, last_lsn - 3]
    for cut in cuts:
        got = job.state_as_of(cut)
        want, _ = replay_oracle(d, list(cfg.initial_schema), up_to_lsn=cut)
        assert state_digest(got) == state_digest(want), f"as-of {cut} diverged"
    # as-of the final lsn == the normal full state
    assert state_digest(job.state_as_of(last_lsn)) == state_digest(
        job.state_pandas()
    )


def test_state_as_of_across_rename_drop(ray_session, tmp_path):
    """Cut points straddling RENAME and DROP COLUMN: the as-of surface must
    show the era's column names and still-live columns."""
    d = str(tmp_path / "fix")
    generate_fixture(
        d, n_base=300, n_events=6_000, n_segments=6, seed=92,
        rename_at=0.45, drop_at=0.75,
    )
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=2, partial_updates=True,
    )
    job = CdcJob(cfg)
    job.run()
    ddls = dict()
    for lsn, sql in _ddl_lsns(d):
        if "RENAME COLUMN" in sql:
            ddls["rename"] = lsn
        elif "DROP COLUMN" in sql:
            ddls["drop"] = lsn
    assert "rename" in ddls and "drop" in ddls
    cuts = [ddls["rename"] - 1, ddls["rename"] + 5, ddls["drop"] + 5]
    for cut in cuts:
        got = job.state_as_of(cut)
        want, _ = replay_oracle(d, list(cfg.initial_schema), up_to_lsn=cut)
        assert sorted(got.columns) == sorted(want.columns), f"columns at {cut}"
        assert state_digest(got) == state_digest(want), f"as-of {cut} diverged"
    # era surfaces: pre-rename shows 'lang', post-rename 'language',
    # post-drop no 'commit'
    assert "lang" in job.state_as_of(ddls["rename"] - 1).columns
    post = job.state_as_of(ddls["rename"] + 5)
    assert "language" in post.columns and "lang" not in post.columns
    assert "commit" not in job.state_as_of(ddls["drop"] + 5).columns


def test_state_as_of_with_truncate(ray_session, tmp_path):
    """A TRUNCATE between the cut and the end must NOT erase as-of state
    before it; a cut after the truncate sees the truncated world."""
    d = str(tmp_path / "fix")
    generate_fixture(
        d, n_base=300, n_events=5_000, n_segments=5, seed=93, truncate_at=0.6
    )
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()
    tr_lsn = None
    for seg in segment_paths(d):
        t = pq.read_table(seg, columns=["lsn", "op"])
        for r in t.to_pylist():
            if r["op"] == "TRUNCATE":
                tr_lsn = r["lsn"]
    assert tr_lsn is not None
    for cut in [tr_lsn - 2, tr_lsn + 25]:
        got = job.state_as_of(cut)
        want, _ = replay_oracle(d, list(cfg.initial_schema), up_to_lsn=cut)
        assert state_digest(got) == state_digest(want), f"as-of {cut} diverged"
    assert len(job.state_as_of(tr_lsn - 2)) > len(job.state_as_of(tr_lsn))

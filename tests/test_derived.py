"""Incrementally maintained derived aggregate table (ES-adapter analog)."""

from __future__ import annotations

import pandas as pd

from canal_ray.config import CdcConfig
from canal_ray.derived import DerivedTable
from canal_ray.loggen import generate_fixture
from canal_ray.pipeline import CdcJob

AGGS = [
    ("n_files", "count", None),
    ("total_chars", "strlen", "content"),
    ("total_stars", "sum", "stars"),
]


def _assert_same(inc: pd.DataFrame, full: pd.DataFrame):
    inc = inc.sort_values(inc.columns[0]).reset_index(drop=True)
    full = full.sort_values(full.columns[0]).reset_index(drop=True)
    pd.testing.assert_frame_equal(inc, full, check_dtype=False)


def test_incremental_equals_recompute_across_stages(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=400, n_events=6_000, n_segments=6, seed=61)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=4,
        epoch_segments=2, epochs_per_cycle=1,
    )
    job = CdcJob(cfg)
    dt = DerivedTable(cfg.lake_dir, "lang_stats", "lang", AGGS)

    # stage 1: bootstrap + first epoch, incremental update
    job.run(max_epochs=2)
    inc1 = dt.update(job)
    _assert_same(inc1, dt.recompute(job))

    # idempotent: re-update at the same cursor changes nothing
    assert dt.update(job).equals(inc1)

    # stage 2: the rest of the stream, incremental again
    job.run()
    inc2 = dt.update(job)
    _assert_same(inc2, dt.recompute(job))
    assert not inc2.equals(inc1)  # the stream really changed the aggregates

    # read() returns the maintained table after the fact
    _assert_same(dt.read(), inc2)

    # compaction after the update is safe (table already current)
    job.compact()
    _assert_same(dt.read(), dt.recompute(job))


def test_incremental_with_rename_drop_and_truncate(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    generate_fixture(
        d, n_base=300, n_events=6_000, n_segments=6, seed=62,
        rename_at=0.45, drop_at=0.7, truncate_at=0.55, p_partial=0.1,
    )
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=4,
        epoch_segments=2, partial_updates=True,
    )
    job = CdcJob(cfg)
    # spec names the PRE-rename column; output surface stays 'lang'
    dt = DerivedTable(cfg.lake_dir, "lang_stats", "lang", AGGS)
    job.run(max_epochs=1)
    dt.update(job)
    job.run()  # crosses rename, truncate and drop
    inc = dt.update(job)
    _assert_same(inc, dt.recompute(job))
    assert list(inc.columns) == ["lang", "n_files", "total_chars", "total_stars"]


def test_drop_of_agg_column_mid_span_falls_back_to_recompute(ray_session, tmp_path):
    """An aggregated column DROPPED between updates cannot be incrementally
    reversed (the base table holds contributions computed under the old
    mapping, and untouched keys are never revisited) — update() must detect
    the resolution change and refresh from live state (ES full re-ETL on
    mapping change)."""
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=300, n_events=4_000, n_segments=4, seed=63,
                     drop_at=0.8)  # drops `commit`
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=4,
        epoch_segments=1, epochs_per_cycle=1, partial_updates=True,
    )
    job = CdcJob(cfg)
    dt = DerivedTable(
        cfg.lake_dir, "commit_stats", "lang",
        [("n_files", "count", None), ("commit_chars", "strlen", "commit")],
    )
    # stage 1: before the drop — commit contributes nonzero strlen sums
    job.run(max_epochs=3)
    inc1 = dt.update(job)
    _assert_same(inc1, dt.recompute(job))
    assert inc1["commit_chars"].sum() > 0

    # stage 2: the drop lands in this span — incremental would keep stale
    # commit_chars forever; the guard must fall back to full refresh
    job.run()
    inc2 = dt.update(job)
    _assert_same(inc2, dt.recompute(job))
    assert inc2["commit_chars"].sum() == 0  # dropped column contributes 0


def test_compaction_watermark_forces_refresh(ray_session, tmp_path):
    """r5 compaction guard: compacting BEFORE a derived table is brought
    current folds away the deltas its diff needs — update() must detect the
    watermark and fall back to a full refresh instead of silently returning
    an empty/stale table."""
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=400, n_events=5_000, n_segments=4, seed=63)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=4,
        epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()
    job.compact()  # every delta folded before the FIRST derived update

    dt = DerivedTable(cfg.lake_dir, "lang_stats", "lang", AGGS)
    inc = dt.update(job)
    full = dt.recompute(job)
    assert len(inc) > 0  # a diff-only update would have returned EMPTY here
    _assert_same(inc, full)

    # stale-cursor shape: another table updated mid-stream, then compaction
    # races ahead of it
    d2 = str(tmp_path / "fix2")
    generate_fixture(d2, n_base=400, n_events=5_000, n_segments=4, seed=64)
    cfg2 = CdcConfig(
        log_dir=f"{d2}/binlog", lake_dir=str(tmp_path / "lake2"),
        base_table=f"{d2}/base/repos.parquet", num_partitions=4,
        epoch_segments=2,
    )
    job2 = CdcJob(cfg2)
    job2.run(max_epochs=2)
    dt2 = DerivedTable(cfg2.lake_dir, "lang_stats", "lang", AGGS)
    dt2.update(job2)          # cursor at epoch ~1
    job2.run()                # rest of the stream
    job2.compact()            # folds epochs PAST dt2's cursor
    inc2 = dt2.update(job2)   # watermark > cursor -> full refresh
    _assert_same(inc2, dt2.recompute(job2))

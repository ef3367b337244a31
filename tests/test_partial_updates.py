"""Minimal row images (partial-column UPDATEs) — Canal's updated-flags /
binlog_row_image=MINIMAL semantics: patches fold column-wise onto the last
full image; a patch with no underlying row is a no-op."""

from __future__ import annotations

import pyarrow as pa
import pytest

from canal_ray.config import CdcConfig
from canal_ray.loggen import generate_fixture
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob
from canal_ray.sink import META_DELETED, META_LSN, META_MASK, fold_rows


def _typed_row(repo, path, lsn, *, deleted=False, mask=-1, commit=None, stars=None):
    return {
        "repo": repo, "path": path, "commit": commit, "stars": stars,
        META_LSN: lsn, META_DELETED: deleted, META_MASK: mask,
    }


_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()), pa.field("path", pa.string()),
        pa.field("commit", pa.string()), pa.field("stars", pa.int64()),
        pa.field(META_LSN, pa.int64()), pa.field(META_DELETED, pa.bool_()),
        pa.field(META_MASK, pa.int64()),
    ]
)
_COMMIT_BIT = 1 << 2  # schema order: repo, path, commit, stars
_STARS_BIT = 1 << 3


def _fold(rows, terminal):
    t = pa.Table.from_pylist(rows, schema=_SCHEMA)
    return {
        (r["repo"], r["path"]): r
        for r in fold_rows(t, ("repo", "path"), terminal=terminal).to_pylist()
    }


def test_fold_semantics_unit():
    rows = [
        # k1: full @1, patch commit @5 -> folded full with patched commit
        _typed_row("r", "k1", 1, commit="a", stars=7),
        _typed_row("r", "k1", 5, mask=_COMMIT_BIT, commit="b"),
        # k2: patch with no base -> deferred (non-terminal) / dropped (terminal)
        _typed_row("r", "k2", 3, mask=_STARS_BIT, stars=9),
        # k3: delete @4, patch above it @6 -> patch dies, tombstone survives
        _typed_row("r", "k3", 4, deleted=True, mask=0),
        _typed_row("r", "k3", 6, mask=_COMMIT_BIT, commit="x"),
        # k4: delete @2, full re-insert @7, patch @8 -> live, patched
        _typed_row("r", "k4", 2, deleted=True, mask=0),
        _typed_row("r", "k4", 7, commit="c", stars=1),
        _typed_row("r", "k4", 8, mask=_STARS_BIT, stars=42),
    ]
    out = _fold(rows, terminal=False)
    assert out[("r", "k1")]["commit"] == "b" and out[("r", "k1")]["stars"] == 7
    assert out[("r", "k1")][META_MASK] == -1
    assert out[("r", "k2")][META_MASK] == _STARS_BIT  # deferred merged patch
    assert out[("r", "k3")][META_DELETED] is True
    assert out[("r", "k4")]["stars"] == 42 and out[("r", "k4")]["commit"] == "c"

    out_t = _fold(rows, terminal=True)
    assert ("r", "k2") not in out_t  # patch with no base anywhere -> no-op
    assert out_t[("r", "k1")]["commit"] == "b"


def test_partial_update_replay_matches_oracle(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    generate_fixture(
        d, n_base=800, n_events=10_000, n_segments=4, seed=67, p_partial=0.4
    )
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=lake, base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=2, epochs_per_cycle=2,
        partial_updates=True,
    )
    job = CdcJob(cfg)
    job.run()
    oracle_df, oracle_schema = replay_oracle(d, list(cfg.initial_schema))
    eng = job.state_pandas()
    assert len(eng) == len(oracle_df)
    assert state_digest(eng) == state_digest(oracle_df)
    assert job.final_schema() == oracle_schema
    # compaction folds patches permanently
    job.compact()
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)


def test_partial_update_resume(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    generate_fixture(
        d, n_base=400, n_events=6_000, n_segments=6, seed=71, p_partial=0.3
    )
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=lake, base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=1, epochs_per_cycle=1,
        partial_updates=True,
    )
    CdcJob(cfg).run(max_epochs=3)
    CdcJob(cfg).run()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(CdcJob(cfg).state_pandas()) == state_digest(oracle_df)


def test_column_filter_partial_conflict(ray_session, tmp_path):
    from canal_ray.sink import make_applier

    cfg = CdcConfig(
        log_dir="/tmp/x", lake_dir="/tmp/y",
        partial_updates=True, column_filter=("commit",),
    )
    with pytest.raises(ValueError, match="column_filter"):
        make_applier(cfg, [(1, 1, 2)], [["repo", "string"], ["path", "string"]])


def test_partial_updates_scatter_exchange(ray_session, tmp_path):
    """Patches + the scatter (disk fragment) exchange compose correctly."""
    d = str(tmp_path / "fix")
    generate_fixture(
        d, n_base=400, n_events=5_000, n_segments=4, seed=73, p_partial=0.35
    )
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet",
        num_partitions=4, epoch_segments=2, epochs_per_cycle=2,
        partial_updates=True, exchange="scatter",
    )
    job = CdcJob(cfg)
    job.run()
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)

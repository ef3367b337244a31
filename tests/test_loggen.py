"""Generator determinism + log-schema invariants (no Ray needed)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from canal_ray.ddl import TableSchema, parse_ddl
from canal_ray.loggen import LOG_SCHEMA, generate_fixture, segment_paths


def test_fixture_deterministic(tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ma = generate_fixture(a, n_base=200, n_events=2_000, n_segments=2, seed=3)
    mb = generate_fixture(b, n_base=200, n_events=2_000, n_segments=2, seed=3)
    assert ma["last_lsn"] == mb["last_lsn"] == 2_000
    for sa, sb in zip(segment_paths(a), segment_paths(b)):
        ta, tb = pq.read_table(sa), pq.read_table(sb)
        assert ta.equals(tb)
    # idempotent reuse: same params -> no regeneration
    m2 = generate_fixture(a, n_base=200, n_events=2_000, n_segments=2, seed=3)
    assert m2["params"] == ma["params"]


def test_fixture_regen_crash_consistency(tmp_path):
    """A generator killed mid-write must not leave a reusable cache: meta is
    the completion marker (deleted before the binlog wipe), and a cache hit
    validates every listed segment exists — a stale meta over a partial
    segment set regenerates instead of silently replaying a truncated log."""
    d = str(tmp_path / "fx")
    m = generate_fixture(d, n_base=200, n_events=2_000, n_segments=4, seed=3)
    # simulate the killed-mid-generation state: meta present, a segment gone
    os.unlink(os.path.join(d, "binlog", m["segments"][-1]))
    m2 = generate_fixture(d, n_base=200, n_events=2_000, n_segments=4, seed=3)
    assert all(
        os.path.exists(os.path.join(d, "binlog", s)) for s in m2["segments"]
    )
    # the regenerated log is the same deterministic content
    assert m2["last_lsn"] == m["last_lsn"]


def test_log_schema_and_order(t1_fixture):
    d, meta = t1_fixture
    seen_lsn = 0
    n_rows = 0
    for seg in segment_paths(d):
        t = pq.read_table(seg)
        assert t.schema.equals(LOG_SCHEMA)
        lsns = t["lsn"].to_numpy()
        assert (np.diff(lsns) > 0).all()  # strictly increasing within segment
        assert lsns[0] == seen_lsn + 1  # contiguous across segments
        seen_lsn = int(lsns[-1])
        n_rows += t.num_rows
    assert n_rows == meta["params"]["n_events"]
    assert os.path.exists(os.path.join(d, "base", "repos.parquet"))


def test_op_mix_and_ddl(t1_fixture):
    d, meta = t1_fixture
    import pandas as pd

    dfs = pd.concat([pq.read_table(s).to_pandas() for s in segment_paths(d)])
    mix = dfs["op"].value_counts(normalize=True)
    assert 0.25 < mix["INSERT"] < 0.50
    assert 0.30 < mix["UPDATE"] < 0.55
    assert 0.10 < mix["DELETE"] < 0.25
    ddls = dfs[dfs["op"] == "DDL"]
    assert len(ddls) == 3
    assert set(ddls["lsn"].astype(str)) == set(meta["ddl_lsns"].keys())
    # images after the ADD COLUMN ddl carry the new column
    stars_lsn = min(int(k) for k in meta["ddl_lsns"])
    post = dfs[(dfs["lsn"] > stars_lsn) & (dfs["op"].isin(["INSERT", "UPDATE"]))]
    post_repos = post[post["table_name"] == "repos"]
    assert post_repos["cols"].map(lambda c: "stars" in list(c)).all()
    # noise rows exist for the unsubscribed table
    assert (dfs["table_name"] == "audit").sum() > 0


def test_ddl_parser_and_schema_evolution():
    r = parse_ddl("ALTER TABLE mytest.repos ADD COLUMN stars INT NULL")
    assert r is not None and r.kind == "ADD_COLUMN" and r.arrow_type == "int32"
    s = TableSchema([("repo", "string"), ("path", "string")])
    assert s.apply("ALTER TABLE mytest.repos ADD COLUMN stars INT NULL")
    assert not s.apply("ALTER TABLE mytest.repos ADD COLUMN stars INT NULL")  # idempotent
    assert s.apply("ALTER TABLE mytest.repos MODIFY COLUMN stars BIGINT")
    assert dict(s.columns())["stars"] == "int64"
    fp1 = s.fingerprint()
    assert s.apply("ALTER TABLE mytest.repos ADD COLUMN license VARCHAR(64) NULL")
    assert s.fingerprint() != fp1
    # non-additive narrowing must fail loudly
    import pytest

    with pytest.raises(ValueError):
        s.apply("ALTER TABLE mytest.repos MODIFY COLUMN stars INT")


def test_list_numbered_natural_order(tmp_path):
    """Segment listings sort by numeric value, not lexicographically:
    'segment_100000' must follow 'segment_99999' once the zero-padded field
    widens (epoch_segments x more segment files than epochs — they widen
    first at scale)."""
    import os

    from canal_ray.checkpoint import list_numbered

    d = str(tmp_path / "segs")
    os.makedirs(d)
    names = ["segment_99999.parquet", "segment_100000.parquet",
             "segment_00001.parquet", "segment_100001.parquet"]
    for n in names:
        open(os.path.join(d, n), "w").close()
    open(os.path.join(d, "notes.txt"), "w").close()  # filtered out
    got = [os.path.basename(p) for p in list_numbered(d)]
    assert got == ["segment_00001.parquet", "segment_99999.parquet",
                   "segment_100000.parquet", "segment_100001.parquet"]
    assert list_numbered(str(tmp_path / "missing")) == []

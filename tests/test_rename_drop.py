"""RENAME/DROP COLUMN DDL: slot-model schema evolution vs the sequential
oracle (MemoryTableMeta_Random_DDL_Test.java:32-65 is the reference shape)."""

from __future__ import annotations

import pytest

from canal_ray.config import CdcConfig
from canal_ray.ddl import TableSchema, parse_ddl
from canal_ray.loggen import generate_fixture
from canal_ray.oracle import replay_oracle, state_digest
from canal_ray.pipeline import CdcJob


# ---------------------------------------------------------------- unit: ddl
def test_parse_rename_and_drop():
    r = parse_ddl("ALTER TABLE mytest.repos RENAME COLUMN lang TO language")
    assert r.kind == "RENAME_COLUMN" and r.column == "lang" and r.new_name == "language"
    d = parse_ddl("ALTER TABLE mytest.repos DROP COLUMN commit")
    assert d.kind == "DROP_COLUMN" and d.column == "commit"


def test_slot_model_rename_drop_semantics():
    s = TableSchema([("a", "string"), ("b", "int32"), ("c", "string")])
    plain_fp = s.fingerprint()
    # rename keeps the slot position; old name resolves via alias
    assert s.apply("ALTER TABLE t RENAME COLUMN b TO bb")
    assert s.names() == ["a", "bb", "c"]
    assert s.resolve("b") == 1 and s.resolve("bb") == 1
    assert not s.apply("ALTER TABLE t RENAME COLUMN b TO bb")  # idempotent
    # drop keeps the slot (positional stability) but hides it externally
    assert s.apply("ALTER TABLE t DROP COLUMN c")
    assert s.names() == ["a", "bb", "c"]
    assert s.active_names() == ["a", "bb"]
    assert [f.name for f in s.to_arrow()] == ["a", "bb"]
    assert [f.name for f in s.to_arrow(include_dropped=True)] == ["a", "bb", "c"]
    assert not s.apply("ALTER TABLE t DROP COLUMN c")  # idempotent
    # json roundtrip preserves slots/aliases/drops
    s2 = TableSchema.from_json(s.to_json())
    assert s2 == s and s2.resolve("b") == 1 and s2.is_dropped(2)
    # widen still works on the renamed slot
    assert s.apply("ALTER TABLE t MODIFY COLUMN bb BIGINT")
    assert dict(s.columns())["bb"] == "int64"
    # plain schemas keep the legacy compact json (fingerprint stability)
    assert TableSchema([("a", "string")]).to_json() == [["a", "string"]]
    assert TableSchema([("a", "string"), ("b", "int32"), ("c", "string")]).fingerprint() == plain_fp


def test_rename_drop_requires_partial_updates(ray_session, tmp_path):
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=200, n_events=2_000, n_segments=2, seed=41,
                     rename_at=0.5)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=2,
        epoch_segments=1, partial_updates=False,
    )
    with pytest.raises(Exception, match="partial_updates"):
        CdcJob(cfg).run()


# ------------------------------------------------- end-to-end vs the oracle
@pytest.mark.parametrize(
    "gen,jobkw",
    [
        # rename only
        (dict(seed=51, rename_at=0.4), dict(exchange="scatter")),
        # drop only
        (dict(seed=52, drop_at=0.45), dict(exchange="sort")),
        # randomized schedules: rename/drop at varying points, with and
        # without minimal row images, through both exchanges
        (dict(seed=53, rename_at=0.35, drop_at=0.55, p_partial=0.15),
         dict(exchange="scatter", epochs_per_cycle=2)),
        (dict(seed=54, rename_at=0.75, drop_at=0.25, p_partial=0.1),
         dict(exchange="sort", num_partitions=3)),
        (dict(seed=55, rename_at=0.3, drop_at=0.9, truncate_at=0.5),
         dict(exchange="scatter")),
    ],
)
def test_rename_drop_digest_equals_oracle(ray_session, tmp_path, gen, jobkw):
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=400, n_events=6_000, n_segments=4, **gen)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet",
        num_partitions=jobkw.pop("num_partitions", 4),
        epoch_segments=2, partial_updates=True, **jobkw,
    )
    job = CdcJob(cfg)
    job.run()
    orc, schema = replay_oracle(d, list(cfg.initial_schema))
    eng = job.state_pandas()
    assert list(eng.columns) == schema.active_names()
    assert state_digest(eng) == state_digest(orc)
    # resume is a no-op; compaction folds renamed/dropped deltas correctly
    assert CdcJob(cfg).run()["epochs_processed"] == 0
    job.compact()
    assert state_digest(job.state_pandas()) == state_digest(orc)


# ---------------------------------------------------- index DDL (CINDEX/DINDEX)
def test_parse_index_ddl():
    r = parse_ddl("ALTER TABLE mytest.repos ADD INDEX idx_lang (lang)")
    assert r.kind == "ADD_INDEX" and r.column == "idx_lang" and r.index_cols == ("lang",)
    r = parse_ddl("ALTER TABLE mytest.repos ADD UNIQUE KEY uq (`repo`, `path`)")
    assert r.kind == "ADD_INDEX" and r.index_cols == ("repo", "path")
    d = parse_ddl("ALTER TABLE mytest.repos DROP INDEX idx_lang")
    assert d.kind == "DROP_INDEX" and d.column == "idx_lang"


def test_index_ddl_schema_registry_semantics():
    s = TableSchema([("a", "string"), ("b", "int32")])
    plain_json = s.to_json()
    plain_fp = s.fingerprint()
    assert s.apply("ALTER TABLE t ADD INDEX ix (a, b)")
    assert s.indexes() == {"ix": ("a", "b")}
    assert not s.apply("ALTER TABLE t ADD INDEX ix (a, b)")  # idempotent
    assert s.fingerprint() != plain_fp  # index is part of table meta identity
    # json roundtrip (dict form) preserves indexes; active data schema unchanged
    s2 = TableSchema.from_json(s.to_json())
    assert s2 == s and s2.indexes() == {"ix": ("a", "b")}
    assert [f.name for f in s2.to_arrow()] == ["a", "b"]
    # index survives a column rename target resolution via alias
    assert s.apply("ALTER TABLE t RENAME COLUMN a TO aa")
    assert s.apply("ALTER TABLE t ADD INDEX ix2 (a)")  # old name resolves via alias
    # drop restores the legacy bare-list json (fingerprint stability)
    assert s.apply("ALTER TABLE t DROP INDEX ix")
    assert s.apply("ALTER TABLE t DROP INDEX ix2")
    assert not s.apply("ALTER TABLE t DROP INDEX ix")  # idempotent
    # unknown column is loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown column"):
        s.apply("ALTER TABLE t ADD INDEX bad (zzz)")
    # index-free schema keeps the byte-stable legacy shape
    assert TableSchema([("a", "string"), ("b", "int32")]).to_json() == plain_json


def test_index_ddl_end_to_end(ray_session, tmp_path):
    """ADD INDEX flows through the stream: applied in every partition (same
    fingerprint), carried in manifests (dict schema json), data unaffected,
    resume fenced. Combined with a prior RENAME so the index target resolves
    through the alias."""
    d = str(tmp_path / "fix")
    generate_fixture(d, n_base=200, n_events=2_000, n_segments=2, seed=44,
                     rename_at=0.3, index_at=0.6)
    cfg = CdcConfig(
        log_dir=f"{d}/binlog", lake_dir=str(tmp_path / "lake"),
        base_table=f"{d}/base/repos.parquet", num_partitions=2,
        epoch_segments=1, partial_updates=True,
    )
    job = CdcJob(cfg)
    job.run()
    final = job.final_schema()
    assert final.indexes() == {"idx_lang": ("lang",)}
    # data unaffected: equals sequential oracle (oracle ignores index DDL)
    oracle_df, _ = replay_oracle(d, list(cfg.initial_schema))
    assert state_digest(job.state_pandas()) == state_digest(oracle_df)
    # fenced re-run is a no-op with the dict-shaped schema json in manifests
    assert CdcJob(cfg).run()["epochs_processed"] == 0

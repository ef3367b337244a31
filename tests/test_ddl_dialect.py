"""DDL dialect breadth: multi-clause ALTER, CHANGE COLUMN, AFTER/FIRST.

Reference parity: DruidDdlParser walks every SQLAlterTableItem of ONE
ALTER statement (parse/.../mysql/ddl/DruidDdlParser.java), so
``ALTER TABLE t ADD ..., DROP ..., CHANGE ...`` evolves the registry in one
replayed statement; CHANGE COLUMN maps to SQLAlterTableChangeColumn
(rename + retype in one clause). No Ray needed — pure registry tests.
"""

import pytest

from canal_ray.ddl import TableSchema, parse_ddl, parse_ddl_clauses

BASE = [("id", "int64"), ("lang", "string"), ("stars", "int32")]


def test_change_column_rename_and_widen():
    s = TableSchema(BASE)
    assert s.apply("ALTER TABLE mytest.repos CHANGE COLUMN stars star_count BIGINT")
    assert s.columns() == [
        ("id", "int64"), ("lang", "string"), ("star_count", "int64")
    ]
    # a pre-rename event naming the old column resolves to the same slot
    assert s.resolve("stars") == 2
    # idempotent replay (resume re-applies the same statement)
    assert not s.apply("ALTER TABLE mytest.repos CHANGE COLUMN stars star_count BIGINT")


def test_change_column_same_name_retype():
    s = TableSchema(BASE)
    assert s.apply("ALTER TABLE t CHANGE stars stars BIGINT")
    assert s.columns()[2] == ("stars", "int64")
    assert not s.apply("ALTER TABLE t CHANGE stars stars BIGINT")


def test_change_column_non_widening_raises():
    s = TableSchema(BASE)
    with pytest.raises(ValueError, match="non-additive"):
        s.apply("ALTER TABLE t CHANGE COLUMN lang lang2 INT")


def test_change_column_unknown_is_noop():
    s = TableSchema(BASE)
    assert not s.apply("ALTER TABLE t CHANGE COLUMN nope still_nope BIGINT")


def test_multi_clause_alter_applies_in_statement_order():
    s = TableSchema(BASE)
    changed = s.apply(
        "ALTER TABLE mytest.repos ADD COLUMN forks INT NULL, "
        "MODIFY COLUMN forks BIGINT, RENAME COLUMN lang TO language, "
        "DROP COLUMN stars"
    )
    assert changed
    # MODIFY in clause 2 sees clause 1's ADD (statement-order staging)
    assert s.columns() == [
        ("id", "int64"), ("language", "string"), ("forks", "int64")
    ]
    assert s.resolve("lang") == 1  # alias survives the rename
    assert s.is_dropped(2)


def test_multi_clause_atomicity_on_failure():
    s = TableSchema(BASE)
    before = s.to_json()
    with pytest.raises(ValueError, match="non-additive"):
        s.apply("ALTER TABLE t ADD COLUMN forks INT, MODIFY COLUMN lang INT")
    # the failing clause must roll back the whole statement (MySQL atomic
    # ALTER): clause 1's ADD is NOT visible
    assert s.to_json() == before


def test_multi_clause_with_unsupported_clause_dropped_whole():
    s = TableSchema(BASE)
    before = s.to_json()
    # ENGINE=... is outside the dialect: the WHOLE statement is ignored
    # (partial application would desync the registry from the source)
    assert not s.apply("ALTER TABLE t ADD COLUMN forks INT, ENGINE=InnoDB")
    assert s.to_json() == before


def test_position_hints_parsed_and_ignored():
    s = TableSchema(BASE)
    assert s.apply("ALTER TABLE t ADD COLUMN forks INT AFTER id")
    assert s.names()[-1] == "forks"  # slot order stays append-only
    assert s.apply("ALTER TABLE t ADD COLUMN head_ref VARCHAR(64) FIRST")
    assert s.names()[-1] == "head_ref"
    assert s.apply("ALTER TABLE t CHANGE COLUMN forks fork_count BIGINT AFTER head_ref")
    assert s.resolve("forks") == 3


def test_parse_ddl_single_vs_multi():
    assert parse_ddl("ALTER TABLE t ADD COLUMN a INT, DROP COLUMN b") is None
    cl = parse_ddl_clauses("ALTER TABLE t ADD COLUMN a INT, DROP COLUMN b")
    assert [c.kind for c in cl] == ["ADD_COLUMN", "DROP_COLUMN"]
    ch = parse_ddl("ALTER TABLE t CHANGE COLUMN a b BIGINT")
    assert ch is not None and ch.kind == "CHANGE_COLUMN"
    assert (ch.column, ch.new_name, ch.arrow_type) == ("a", "b", "int64")


def test_index_clause_inside_multi_clause():
    s = TableSchema(BASE)
    # the comma inside the index column list must NOT split the clause
    assert s.apply(
        "ALTER TABLE t ADD COLUMN forks INT, "
        "ADD UNIQUE INDEX idx_f (`forks`, `id`), DROP COLUMN stars"
    )
    assert s.indexes() == {"idx_f": ("forks", "id")}
    assert s.is_dropped(2)


def test_multi_clause_fingerprint_equals_equivalent_single_statements():
    a = TableSchema(BASE)
    a.apply("ALTER TABLE t ADD COLUMN forks INT, RENAME COLUMN lang TO language")
    b = TableSchema(BASE)
    b.apply("ALTER TABLE t ADD COLUMN forks INT")
    b.apply("ALTER TABLE t RENAME COLUMN lang TO language")
    assert a.fingerprint() == b.fingerprint()

"""Tiny DDL dialect parser + schema registry with additive evolution.

The analogs in the reference:
  - DDL text -> structured result: ``parse/.../mysql/ddl/DruidDdlParser.java``,
    ``SimpleDdlParser.java`` (we support the additive subset our synthetic log
    emits: ADD COLUMN and MODIFY/widen).
  - schema registry evolved by replaying DDL in log order:
    ``parse/.../tsdb/MemoryTableMeta.java:68-98`` (``repository.console(ddl)``)
    and snapshot/fingerprint for checkpointing:
    ``parse/.../tsdb/DatabaseTableMeta.java:161-181``.

Column values are transported as strings in the event log (exactly Canal's
``Column.value`` contract, ``protocol/.../EntryProtocol.proto:76-109``); the
schema registry supplies the Arrow type each string is cast to at apply time
(the analog of ``client-adapter/common/.../support/JdbcTypeUtil.java``).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import pyarrow as pa

# SQL type token -> arrow type string (only what the synthetic dialect uses)
_SQL_TO_ARROW = {
    "INT": "int32",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "DOUBLE": "float64",
    "FLOAT": "float32",
    "TEXT": "string",
    "VARCHAR": "string",
}

_ARROW_TYPES: dict[str, pa.DataType] = {
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "string": pa.string(),
    "bool": pa.bool_(),
    "timestamp[ms]": pa.timestamp("ms"),
}

# widening lattice: old -> allowed new (additive-only evolution)
_WIDENS = {
    ("int32", "int64"),
    ("int32", "float64"),
    ("int64", "float64"),
    ("float32", "float64"),
}

_ADD_RE = re.compile(
    r"ALTER\s+TABLE\s+(?:`?(?P<schema>\w+)`?\.)?`?(?P<table>\w+)`?\s+"
    r"ADD\s+COLUMN\s+`?(?P<col>\w+)`?\s+(?P<type>\w+)(?:\((?P<len>\d+)\))?",
    re.IGNORECASE,
)
_MODIFY_RE = re.compile(
    r"ALTER\s+TABLE\s+(?:`?(?P<schema>\w+)`?\.)?`?(?P<table>\w+)`?\s+"
    r"(?:MODIFY|ALTER)\s+COLUMN\s+`?(?P<col>\w+)`?\s+(?:SET\s+DATA\s+TYPE\s+)?"
    r"(?P<type>\w+)(?:\((?P<len>\d+)\))?",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class DdlResult:
    """Structured DDL (DruidDdlParser.DdlResult analog)."""

    kind: str  # "ADD_COLUMN" | "MODIFY_COLUMN"
    schema_name: str | None
    table: str
    column: str
    arrow_type: str  # arrow type string


def parse_ddl(sql: str) -> DdlResult | None:
    """Parse one DDL statement of the supported additive dialect.

    Returns None for unsupported statements (they are ignored, like Canal's
    ``filterQueryDdl`` path drops unparseable DDL variants).
    """
    m = _ADD_RE.match(sql.strip())
    if m:
        t = _SQL_TO_ARROW.get(m.group("type").upper())
        if t is None:
            return None
        return DdlResult("ADD_COLUMN", m.group("schema"), m.group("table"), m.group("col"), t)
    m = _MODIFY_RE.match(sql.strip())
    if m:
        t = _SQL_TO_ARROW.get(m.group("type").upper())
        if t is None:
            return None
        return DdlResult("MODIFY_COLUMN", m.group("schema"), m.group("table"), m.group("col"), t)
    return None


class TableSchema:
    """Ordered (name -> arrow type string) registry with additive evolution.

    The MemoryTableMeta analog: ``apply(ddl_sql)`` replays a DDL statement;
    ``fingerprint()`` is the checkpointable schema identity;
    ``to_arrow()`` yields the pyarrow.Schema of the payload columns.
    """

    def __init__(self, columns: list[tuple[str, str]] | tuple[tuple[str, str], ...]):
        self._cols: list[tuple[str, str]] = [(str(n), str(t)) for n, t in columns]
        names = [n for n, _ in self._cols]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate columns: {names}")

    # -- queries ----------------------------------------------------------
    def names(self) -> list[str]:
        return [n for n, _ in self._cols]

    def columns(self) -> list[tuple[str, str]]:
        return list(self._cols)

    def arrow_type(self, name: str) -> pa.DataType:
        for n, t in self._cols:
            if n == name:
                return _ARROW_TYPES[t]
        raise KeyError(name)

    def to_arrow(self) -> pa.Schema:
        return pa.schema([pa.field(n, _ARROW_TYPES[t]) for n, t in self._cols])

    def fingerprint(self) -> str:
        return hashlib.sha256(repr(self._cols).encode()).hexdigest()[:16]

    # -- evolution --------------------------------------------------------
    def apply(self, ddl_sql: str) -> bool:
        """Replay one DDL; returns True if the schema changed.

        Idempotent: re-applying an already-applied DDL (replayed batch after a
        checkpoint resume) is a no-op — the fencing analog of
        ``RdbSyncService.columnsTypeCache`` invalidation being safe to repeat.
        """
        res = parse_ddl(ddl_sql)
        if res is None:
            return False
        existing = dict(self._cols)
        if res.kind == "ADD_COLUMN":
            if res.column in existing:
                return False  # idempotent replay
            self._cols.append((res.column, res.arrow_type))
            return True
        if res.kind == "MODIFY_COLUMN":
            old = existing.get(res.column)
            if old is None or old == res.arrow_type:
                return False
            if (old, res.arrow_type) not in _WIDENS:
                raise ValueError(
                    f"non-additive type change {res.column}: {old} -> {res.arrow_type}"
                )
            self._cols = [
                (n, res.arrow_type if n == res.column else t) for n, t in self._cols
            ]
            return True
        return False

    # -- (de)serialization for checkpoints --------------------------------
    def to_json(self) -> list[list[str]]:
        return [[n, t] for n, t in self._cols]

    @classmethod
    def from_json(cls, data: list[list[str]]) -> "TableSchema":
        return cls([(n, t) for n, t in data])

    def copy(self) -> "TableSchema":
        return TableSchema(self._cols)

    def __eq__(self, other) -> bool:
        return isinstance(other, TableSchema) and self._cols == other._cols

    def __repr__(self) -> str:
        return f"TableSchema({self._cols})"

"""DDL dialect parser + slot-based schema registry (add/widen/rename/drop).

The analogs in the reference:
  - DDL text -> structured result: ``parse/.../mysql/ddl/DruidDdlParser.java``,
    ``SimpleDdlParser.java`` (supported subset: ADD COLUMN, MODIFY/widen,
    RENAME COLUMN, DROP COLUMN — the common online-DDL operations).
  - schema registry evolved by replaying DDL in log order:
    ``parse/.../tsdb/MemoryTableMeta.java:68-98`` (``repository.console(ddl)``,
    incl. rename/drop handling at ``MemoryTableMeta.java:181-268``)
    and snapshot/fingerprint for checkpointing:
    ``parse/.../tsdb/DatabaseTableMeta.java:161-181``.

Slot model: every column ever added occupies a SLOT whose position never
changes. RENAME updates the slot's name in place (old names are kept as
aliases so in-flight events that still carry the old name resolve to the
same slot); DROP marks the slot dropped (its position is preserved so
positional full-image materialization and slot-indexed patch bitmasks stay
stable — the same trick MySQL's online DDL plays with hidden columns).
Dropped slots are excluded from the external schema (``to_arrow()``) but
still materialize internally so delta-file column order == slot order.

Column values are transported as strings in the event log (exactly Canal's
``Column.value`` contract, ``protocol/.../EntryProtocol.proto:76-109``); the
schema registry supplies the Arrow type each string is cast to at apply time
(the analog of ``client-adapter/common/.../support/JdbcTypeUtil.java``).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

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

_TBL = r"ALTER\s+TABLE\s+(?:`?(?P<schema>\w+)`?\.)?`?(?P<table>\w+)`?\s+"
_ADD_RE = re.compile(
    _TBL + r"ADD\s+COLUMN\s+`?(?P<col>\w+)`?\s+(?P<type>\w+)(?:\((?P<len>\d+)\))?",
    re.IGNORECASE,
)
_MODIFY_RE = re.compile(
    _TBL + r"(?:MODIFY|ALTER)\s+COLUMN\s+`?(?P<col>\w+)`?\s+(?:SET\s+DATA\s+TYPE\s+)?"
    r"(?P<type>\w+)(?:\((?P<len>\d+)\))?",
    re.IGNORECASE,
)
_RENAME_RE = re.compile(
    _TBL + r"RENAME\s+COLUMN\s+`?(?P<col>\w+)`?\s+TO\s+`?(?P<to>\w+)`?",
    re.IGNORECASE,
)
_DROP_RE = re.compile(_TBL + r"DROP\s+COLUMN\s+`?(?P<col>\w+)`?", re.IGNORECASE)
# index DDL — the reference classifies these as their own event types
# (EventType.CINDEX/DINDEX via DruidDdlParser SQLCreateIndex/SQLDropIndex
# handling); they never change row data, only the table meta
_ADD_IDX_RE = re.compile(
    _TBL + r"ADD\s+(?:UNIQUE\s+)?(?:INDEX|KEY)\s+`?(?P<idx>\w+)`?\s*"
    r"\((?P<cols>[^)]*)\)",
    re.IGNORECASE,
)
_DROP_IDX_RE = re.compile(
    _TBL + r"DROP\s+(?:INDEX|KEY)\s+`?(?P<idx>\w+)`?", re.IGNORECASE
)


@dataclass(frozen=True)
class DdlResult:
    """Structured DDL (DruidDdlParser.DdlResult analog)."""

    kind: str  # ADD_COLUMN | MODIFY_COLUMN | RENAME_COLUMN | DROP_COLUMN
    #          | ADD_INDEX | DROP_INDEX (CINDEX/DINDEX event classes)
    schema_name: str | None
    table: str
    column: str  # index name for ADD_INDEX/DROP_INDEX
    arrow_type: str | None = None  # for ADD/MODIFY
    new_name: str | None = None  # for RENAME
    index_cols: tuple[str, ...] | None = None  # for ADD_INDEX


def parse_ddl(sql: str) -> DdlResult | None:
    """Parse one DDL statement of the supported dialect.

    Returns None for unsupported statements (they are ignored, like Canal's
    ``filterQueryDdl`` path drops unparseable DDL variants).
    """
    s = sql.strip()
    m = _ADD_IDX_RE.match(s)
    if m:
        cols = tuple(c.strip().strip("`") for c in m.group("cols").split(",") if c.strip())
        return DdlResult(
            "ADD_INDEX", m.group("schema"), m.group("table"), m.group("idx"),
            index_cols=cols,
        )
    m = _DROP_IDX_RE.match(s)
    if m:
        return DdlResult("DROP_INDEX", m.group("schema"), m.group("table"), m.group("idx"))
    m = _RENAME_RE.match(s)
    if m:
        return DdlResult(
            "RENAME_COLUMN", m.group("schema"), m.group("table"),
            m.group("col"), new_name=m.group("to"),
        )
    m = _DROP_RE.match(s)
    if m:
        return DdlResult("DROP_COLUMN", m.group("schema"), m.group("table"), m.group("col"))
    m = _ADD_RE.match(s)
    if m:
        t = _SQL_TO_ARROW.get(m.group("type").upper())
        if t is None:
            return None
        return DdlResult("ADD_COLUMN", m.group("schema"), m.group("table"), m.group("col"), t)
    m = _MODIFY_RE.match(s)
    if m:
        t = _SQL_TO_ARROW.get(m.group("type").upper())
        if t is None:
            return None
        return DdlResult("MODIFY_COLUMN", m.group("schema"), m.group("table"), m.group("col"), t)
    return None


@dataclass
class Slot:
    name: str
    type: str
    dropped: bool = False
    aliases: list[str] = field(default_factory=list)


class TableSchema:
    """Slot-ordered schema registry (MemoryTableMeta analog).

    ``apply(ddl_sql)`` replays a DDL statement; ``fingerprint()`` is the
    checkpointable schema identity; ``to_arrow()`` yields the ACTIVE payload
    schema; ``names()`` yields ALL slot names in slot order (positional
    materialization + slot-indexed masks depend on this order).
    """

    def __init__(self, columns, indexes: dict | None = None):
        self._slots: list[Slot] = []
        for c in columns:
            if isinstance(c, Slot):
                self._slots.append(Slot(c.name, c.type, c.dropped, list(c.aliases)))
            else:
                seq = list(c)
                if len(seq) == 2:
                    self._slots.append(Slot(str(seq[0]), str(seq[1])))
                else:
                    self._slots.append(
                        Slot(str(seq[0]), str(seq[1]), bool(seq[2]), [str(a) for a in seq[3]])
                    )
        names = [s.name for s in self._slots]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate columns: {names}")
        # secondary indexes (CINDEX/DINDEX meta; no effect on row data)
        self._indexes: dict[str, tuple[str, ...]] = {
            str(k): tuple(str(c) for c in v) for k, v in (indexes or {}).items()
        }

    # -- queries ----------------------------------------------------------
    def slots(self) -> list[Slot]:
        return list(self._slots)

    def names(self) -> list[str]:
        """ALL slot names, slot order (positional wire contract)."""
        return [s.name for s in self._slots]

    def active_names(self) -> list[str]:
        return [s.name for s in self._slots if not s.dropped]

    def columns(self) -> list[tuple[str, str]]:
        """Active (name, type) pairs — the external schema surface."""
        return [(s.name, s.type) for s in self._slots if not s.dropped]

    def resolve(self, name: str) -> int | None:
        """Slot index for a (possibly stale) column name; active slots win.

        A pre-rename event naming the old column resolves through the alias
        list; a name belonging only to a dropped slot resolves to that slot
        (the caller skips dropped slots — the value is irrelevant once the
        column is gone). Unknown names return None.
        """
        for i, s in enumerate(self._slots):
            if not s.dropped and s.name == name:
                return i
        for i, s in enumerate(self._slots):
            if not s.dropped and name in s.aliases:
                return i
        for i, s in enumerate(self._slots):
            if s.dropped and (s.name == name or name in s.aliases):
                return i
        return None

    def is_dropped(self, idx: int) -> bool:
        return self._slots[idx].dropped

    def arrow_type(self, name: str) -> pa.DataType:
        i = self.resolve(name)
        if i is None:
            raise KeyError(name)
        return _ARROW_TYPES[self._slots[i].type]

    def to_arrow(self, include_dropped: bool = False) -> pa.Schema:
        return pa.schema(
            [
                pa.field(s.name, _ARROW_TYPES[s.type])
                for s in self._slots
                if include_dropped or not s.dropped
            ]
        )

    def fingerprint(self) -> str:
        return hashlib.sha256(repr(self.to_json()).encode()).hexdigest()[:16]

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
        active = {s.name: s for s in self._slots if not s.dropped}
        if res.kind == "ADD_COLUMN":
            if res.column in active:
                return False  # idempotent replay
            # RE-USING a dropped column's name would create duplicate slot
            # names (from_json then refuses the round-trip), and re-using a
            # renamed column's OLD name makes stale-name resolution ambiguous
            # (a pre-rename delta's column would bind to the wrong slot).
            # MySQL allows the DDL, but our positional wire contract cannot
            # represent it without a resnapshot — fail loudly, never corrupt.
            for s in self._slots:
                if s.dropped and (s.name == res.column or res.column in s.aliases):
                    raise ValueError(
                        f"ADD COLUMN {res.column!r} re-uses a dropped column's "
                        "name; re-using names after DROP requires a fresh "
                        "snapshot (positional slot identity would be ambiguous)"
                    )
                if not s.dropped and res.column in s.aliases:
                    raise ValueError(
                        f"ADD COLUMN {res.column!r} re-uses the pre-rename name "
                        f"of column {s.name!r}; in-flight events naming "
                        f"{res.column!r} would be ambiguous — rename requires "
                        "retiring the old name first"
                    )
            self._slots.append(Slot(res.column, res.arrow_type))
            return True
        if res.kind == "MODIFY_COLUMN":
            s = active.get(res.column)
            if s is None or s.type == res.arrow_type:
                return False
            if (s.type, res.arrow_type) not in _WIDENS:
                raise ValueError(
                    f"non-additive type change {res.column}: {s.type} -> {res.arrow_type}"
                )
            s.type = res.arrow_type
            return True
        if res.kind == "RENAME_COLUMN":
            s = active.get(res.column)
            if s is None:
                # idempotent replay: the target name already active
                return False
            if res.new_name in active:
                raise ValueError(f"rename target {res.new_name!r} already exists")
            s.aliases.append(s.name)
            s.name = res.new_name
            return True
        if res.kind == "DROP_COLUMN":
            s = active.get(res.column)
            if s is None:
                return False  # idempotent replay / unknown
            s.dropped = True
            return True
        if res.kind == "ADD_INDEX":
            if res.column in self._indexes:
                return False  # idempotent replay
            for c in res.index_cols or ():
                i = self.resolve(c)
                # resolve() falls back to dropped slots for stale-value
                # lookups; an INDEX over a dropped column is invalid meta
                # (MySQL: "key column doesn't exist") — reject both cases
                if i is None or self._slots[i].dropped:
                    raise ValueError(
                        f"index {res.column!r} references unknown column {c!r}"
                    )
            self._indexes[res.column] = tuple(res.index_cols or ())
            return True
        if res.kind == "DROP_INDEX":
            return self._indexes.pop(res.column, None) is not None
        return False

    # -- (de)serialization for checkpoints --------------------------------
    def indexes(self) -> dict[str, tuple[str, ...]]:
        return dict(self._indexes)

    def to_json(self):
        """Compact form: 2-element entries while the slot is plain (so
        fingerprints/manifests of purely additive schemas stay byte-stable
        across engine versions), 4-element once renamed/dropped. Index-free
        schemas keep the legacy bare-list shape; with indexes, a dict
        ``{"slots": [...], "indexes": {...}}`` (from_json accepts both)."""
        out = []
        for s in self._slots:
            if not s.dropped and not s.aliases:
                out.append([s.name, s.type])
            else:
                out.append([s.name, s.type, s.dropped, list(s.aliases)])
        if self._indexes:
            return {
                "slots": out,
                "indexes": {k: list(v) for k, v in sorted(self._indexes.items())},
            }
        return out

    @classmethod
    def from_json(cls, data) -> "TableSchema":
        if isinstance(data, dict):
            return cls(data["slots"], indexes=data.get("indexes"))
        return cls(data)

    def copy(self) -> "TableSchema":
        return TableSchema(self._slots, indexes=self._indexes)

    def __eq__(self, other) -> bool:
        return isinstance(other, TableSchema) and self.to_json() == other.to_json()

    def __repr__(self) -> str:
        return f"TableSchema({self.to_json()})"

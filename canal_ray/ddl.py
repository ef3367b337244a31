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
_TBL_RE = re.compile(_TBL, re.IGNORECASE)
# MySQL column-position hint (``ADD/MODIFY/CHANGE ... [FIRST | AFTER col]``).
# Parsed and deliberately IGNORED: the slot model's positional wire contract
# appends every new column to a stable slot (see module docstring), exactly
# like MySQL's own hidden-column online DDL — display order is presentation,
# slot order is identity.
_POS = r"(?:\s+(?:FIRST|AFTER\s+`?\w+`?))?"
# clause-level patterns (no ALTER TABLE prefix — multi-clause ALTER splits
# the body on top-level commas and parses each clause with these)
_ADD_RE = re.compile(
    r"ADD\s+COLUMN\s+`?(?P<col>\w+)`?\s+(?P<type>\w+)(?:\((?P<len>\d+)\))?" + _POS,
    re.IGNORECASE,
)
_MODIFY_RE = re.compile(
    r"(?:MODIFY|ALTER)\s+COLUMN\s+`?(?P<col>\w+)`?\s+(?:SET\s+DATA\s+TYPE\s+)?"
    r"(?P<type>\w+)(?:\((?P<len>\d+)\))?" + _POS,
    re.IGNORECASE,
)
# CHANGE COLUMN old new TYPE — MySQL's rename+retype in ONE clause
# (DruidDdlParser handles it via SQLAlterTableChangeColumn; the reference's
# MemoryTableMeta replays it as a single console() statement)
_CHANGE_RE = re.compile(
    r"CHANGE\s+(?:COLUMN\s+)?`?(?P<col>\w+)`?\s+`?(?P<to>\w+)`?\s+"
    r"(?P<type>\w+)(?:\((?P<len>\d+)\))?" + _POS,
    re.IGNORECASE,
)
_RENAME_RE = re.compile(
    r"RENAME\s+COLUMN\s+`?(?P<col>\w+)`?\s+TO\s+`?(?P<to>\w+)`?",
    re.IGNORECASE,
)
_DROP_RE = re.compile(r"DROP\s+COLUMN\s+`?(?P<col>\w+)`?", re.IGNORECASE)
# index DDL — the reference classifies these as their own event types
# (EventType.CINDEX/DINDEX via DruidDdlParser SQLCreateIndex/SQLDropIndex
# handling); they never change row data, only the table meta
_ADD_IDX_RE = re.compile(
    r"ADD\s+(?:UNIQUE\s+)?(?:INDEX|KEY)\s+`?(?P<idx>\w+)`?\s*"
    r"\((?P<cols>[^)]*)\)",
    re.IGNORECASE,
)
_DROP_IDX_RE = re.compile(
    r"DROP\s+(?:INDEX|KEY)\s+`?(?P<idx>\w+)`?", re.IGNORECASE
)


@dataclass(frozen=True)
class DdlResult:
    """Structured DDL (DruidDdlParser.DdlResult analog)."""

    kind: str  # ADD_COLUMN | MODIFY_COLUMN | CHANGE_COLUMN | RENAME_COLUMN
    #          | DROP_COLUMN | ADD_INDEX | DROP_INDEX (CINDEX/DINDEX classes)
    schema_name: str | None
    table: str
    column: str  # index name for ADD_INDEX/DROP_INDEX
    arrow_type: str | None = None  # for ADD/MODIFY/CHANGE
    new_name: str | None = None  # for RENAME/CHANGE
    index_cols: tuple[str, ...] | None = None  # for ADD_INDEX


def _split_clauses(body: str) -> list[str]:
    """Split an ALTER body on TOP-LEVEL commas (commas inside parens — index
    column lists, type lengths — don't split)."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(body[start:i])
            start = i + 1
    out.append(body[start:])
    return [c.strip() for c in out if c.strip()]


def _parse_clause(clause: str, schema_name: str | None, table: str) -> DdlResult | None:
    m = _ADD_IDX_RE.match(clause)
    if m:
        cols = tuple(c.strip().strip("`") for c in m.group("cols").split(",") if c.strip())
        return DdlResult("ADD_INDEX", schema_name, table, m.group("idx"), index_cols=cols)
    m = _DROP_IDX_RE.match(clause)
    if m:
        return DdlResult("DROP_INDEX", schema_name, table, m.group("idx"))
    m = _RENAME_RE.match(clause)
    if m:
        return DdlResult(
            "RENAME_COLUMN", schema_name, table, m.group("col"), new_name=m.group("to")
        )
    m = _CHANGE_RE.match(clause)
    if m:
        t = _SQL_TO_ARROW.get(m.group("type").upper())
        if t is None:
            return None
        return DdlResult(
            "CHANGE_COLUMN", schema_name, table, m.group("col"), t,
            new_name=m.group("to"),
        )
    m = _DROP_RE.match(clause)
    if m:
        return DdlResult("DROP_COLUMN", schema_name, table, m.group("col"))
    m = _ADD_RE.match(clause)
    if m:
        t = _SQL_TO_ARROW.get(m.group("type").upper())
        if t is None:
            return None
        return DdlResult("ADD_COLUMN", schema_name, table, m.group("col"), t)
    m = _MODIFY_RE.match(clause)
    if m:
        t = _SQL_TO_ARROW.get(m.group("type").upper())
        if t is None:
            return None
        return DdlResult("MODIFY_COLUMN", schema_name, table, m.group("col"), t)
    return None


def parse_ddl_clauses(sql: str) -> list[DdlResult]:
    """Parse one ALTER statement into its clause list (MySQL multi-clause
    ALTER: ``ALTER TABLE t ADD COLUMN a INT, DROP COLUMN b, ...``).

    Mirrors DruidDdlParser walking every SQLAlterTableItem of one statement
    (``parse/.../mysql/ddl/DruidDdlParser.java``). A statement with ANY
    unsupported clause returns [] — partial application of an atomic ALTER
    would desync the registry from the source, so the whole statement is
    dropped, like Canal's unparseable-DDL path.
    """
    m = _TBL_RE.match(sql.strip())
    if not m:
        return []
    results = []
    for clause in _split_clauses(sql.strip()[m.end():]):
        res = _parse_clause(clause, m.group("schema"), m.group("table"))
        if res is None:
            return []
        results.append(res)
    return results


def parse_ddl(sql: str) -> DdlResult | None:
    """Parse one single-clause DDL statement of the supported dialect.

    Returns None for unsupported statements (they are ignored, like Canal's
    ``filterQueryDdl`` path drops unparseable DDL variants) and for
    multi-clause ALTERs — those callers use :func:`parse_ddl_clauses`.
    """
    clauses = parse_ddl_clauses(sql)
    return clauses[0] if len(clauses) == 1 else None


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
        """Replay one DDL statement; returns True if the schema changed.

        Idempotent: re-applying an already-applied DDL (replayed batch after a
        checkpoint resume) is a no-op — the fencing analog of
        ``RdbSyncService.columnsTypeCache`` invalidation being safe to repeat.

        Multi-clause ALTERs apply ATOMICALLY: clauses are staged on a copy in
        statement order (so ``ADD COLUMN c, MODIFY c ...`` sees its own ADD)
        and adopted only if every clause validates — a failing clause leaves
        the registry exactly as before, matching MySQL's atomic ALTER.
        """
        clauses = parse_ddl_clauses(ddl_sql)
        if not clauses:
            return False
        if len(clauses) == 1:
            return self._apply_one(clauses[0])
        work = self.copy()
        changed = False
        for res in clauses:
            changed = work._apply_one(res) or changed
        self._slots = work._slots
        self._indexes = work._indexes
        return changed

    def _apply_one(self, res: DdlResult) -> bool:
        active = {s.name: s for s in self._slots if not s.dropped}
        if res.kind == "CHANGE_COLUMN":
            # MySQL CHANGE COLUMN old new TYPE: rename + retype in one clause.
            s = active.get(res.column)
            if s is None:
                # replay idempotency: rename already applied — only a widen
                # can remain outstanding
                s = active.get(res.new_name)
                if s is None or s.type == res.arrow_type:
                    return False
                if (s.type, res.arrow_type) not in _WIDENS:
                    raise ValueError(
                        f"non-additive type change {res.new_name}: "
                        f"{s.type} -> {res.arrow_type}"
                    )
                s.type = res.arrow_type
                return True
            changed = False
            if res.new_name != s.name:
                if res.new_name in active:
                    raise ValueError(
                        f"rename target {res.new_name!r} already exists"
                    )
                s.aliases.append(s.name)
                s.name = res.new_name
                changed = True
            if s.type != res.arrow_type:
                if (s.type, res.arrow_type) not in _WIDENS:
                    raise ValueError(
                        f"non-additive type change {res.column}: "
                        f"{s.type} -> {res.arrow_type}"
                    )
                s.type = res.arrow_type
                changed = True
            return changed
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

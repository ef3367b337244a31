"""Sequential single-process replay oracle + canonical row hashing.

The reference ships no golden end-state corpus (SURVEY.md §5) — apply
correctness is delegated to live-target integration tests. We therefore build
our own oracle: a trivially-correct, single-threaded, in-order replay of the
binlog over the base snapshot. The distributed engine's materialized lake must
be row-for-row identical (per-row sha256 of a canonical serialization —
the BASELINE.json invariant).

Apply semantics (deliberately upsert-flavored, documented deviation):
  - INSERT and UPDATE both *put* the full after-image (binlog_row_image=FULL,
    so UPDATE == whole-row replace; Canal's Kudu adapter applies exactly this
    upsert semantic, ``client-adapter/kudu/.../KuduSyncService.java:51-152``,
    and the RDB adapter's insert is dup-key-tolerant,
    ``client-adapter/rdb/.../RdbSyncService.java:284-291``).
  - DELETE removes the key (tombstone).
  - DDL evolves the schema additively; pre-existing rows get NULL for added
    columns (``parse/.../tsdb/MemoryTableMeta.java`` semantics).
  - Last-writer-wins by lsn — the log's total order (Header.logfileName+
    offset analog, ``EntryProtocol.proto:32-36``).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from canal_ray.ddl import TableSchema
from canal_ray.loggen import segment_paths


def replay_oracle(
    fixture_dir: str,
    initial_schema: list[tuple[str, str]],
    *,
    table_filter: str = "mytest.repos",
    up_to_lsn: int | None = None,
) -> tuple[pd.DataFrame, TableSchema]:
    """Replay the fixture sequentially; return (final state, final schema).

    The returned DataFrame has one row per live key, columns = final payload
    schema (typed), sorted by (repo, path).
    """
    import os

    schema = TableSchema(initial_schema)
    init_names = [n for n, _ in initial_schema]
    state: dict[tuple[str, str], dict] = {}

    base = pq.read_table(os.path.join(fixture_dir, "base", "repos.parquet"))
    for row in base.to_pylist():
        state[(row["repo"], row["path"])] = dict(row)

    def _resolve_names(cols: list[str]) -> list[str | None]:
        """Map event column names to CURRENT slot names (aliases resolve
        pre-rename names); dropped slots map to None (value ignored)."""
        out = []
        for c in cols:
            i = schema.resolve(c)
            if i is None:
                out.append(None)
            else:
                s = schema.slots()[i]
                out.append(None if s.dropped else s.name)
        return out

    def _on_ddl(sql: str) -> None:
        from canal_ray.ddl import parse_ddl_clauses

        clauses = parse_ddl_clauses(sql)
        changed = schema.apply(sql)
        if not changed or not clauses:
            return
        for res in clauses:
            # state-dict fixups are idempotent per clause: after a rename the
            # old key is gone, so a replayed rename/CHANGE is a no-op
            if res.kind == "RENAME_COLUMN" or (
                res.kind == "CHANGE_COLUMN" and res.new_name != res.column
            ):
                for img in state.values():
                    if res.column in img:
                        img[res.new_name] = img.pop(res.column)
            elif res.kind == "DROP_COLUMN":
                for img in state.values():
                    img.pop(res.column, None)

    # rolled-back XA transactions (EntryProtocol.proto:202-222): their rows
    # never commit. Marker at-or-below the cut point required — a rollback
    # above ``up_to_lsn`` has not happened yet as of that position.
    xa_rb: set[int] = set()
    for seg in segment_paths(fixture_dir):
        t = pq.read_table(seg, columns=["lsn", "op", "txn_id"])
        for lsn, op, txn in zip(
            t["lsn"].to_pylist(), t["op"].to_pylist(), t["txn_id"].to_pylist()
        ):
            if op == "XAROLLBACK" and (up_to_lsn is None or lsn <= up_to_lsn):
                xa_rb.add(txn)

    want_schema, want_table = table_filter.split(".", 1)
    for seg in segment_paths(fixture_dir):
        tbl = pq.read_table(seg)
        for row in tbl.sort_by("lsn").to_pylist():
            if up_to_lsn is not None and row["lsn"] > up_to_lsn:
                return _finalize(state, schema)
            if row["op"] in ("XACOMMIT", "XAROLLBACK", "DCL"):
                continue  # txn markers / DCL query entries: no row effect
            if xa_rb and row["txn_id"] in xa_rb:
                continue
            if row["op"] == "DDL":
                # DDL must pass the SAME table filter the engine's decode
                # applies (regex whitelist on schema.table) — a DDL targeting
                # another table must not evolve this table's oracle schema
                if (
                    row["schema_name"] == want_schema
                    and row["table_name"] == want_table
                ):
                    _on_ddl(row["ddl_sql"])
                continue
            if row["schema_name"] != want_schema or row["table_name"] != want_table:
                continue
            if row["op"] == "TRUNCATE":
                state.clear()
                continue
            if row["op"] == "MHEARTBEAT":
                continue
            key = (row["pk_repo"], row["pk_path"])
            if row["op"] == "DELETE":
                state.pop(key, None)
                continue
            cols = row["cols"] or []
            # classification mirrors decode: full image <=> cols is the
            # positional prefix of the INITIAL schema (positions beyond it
            # are unverifiable at decode time and accepted positionally)
            overlap = min(len(cols), len(init_names))
            is_full = cols[:overlap] == init_names[:overlap]
            if is_full:
                # positional: value j belongs to SLOT j (current name)
                slot_names = schema.names()
                img = {
                    slot_names[j]: v for j, v in enumerate(row["vals"])
                }
                for s in schema.slots():
                    if s.dropped:
                        img.pop(s.name, None)
                state[key] = img
            else:
                resolved = _resolve_names(cols)
                vals = {
                    n: v for n, v in zip(resolved, row["vals"]) if n is not None
                }
                if row["op"] == "INSERT":
                    # explicit-column full replace (post-rename/drop writers)
                    state[key] = vals
                elif key in state:
                    # minimal row image: update listed columns only; UPDATE
                    # on an absent row is a no-op (RdbSyncService semantics)
                    state[key].update(vals)
    return _finalize(state, schema)


def _finalize(state: dict, schema: TableSchema) -> tuple[pd.DataFrame, TableSchema]:
    cols = schema.active_names()
    records = []
    for (repo, path), img in state.items():
        rec = {c: img.get(c) for c in cols}
        rec["repo"], rec["path"] = repo, path
        records.append(rec)
    df = pd.DataFrame.from_records(records, columns=cols)
    # typed columns per final schema (string transport -> typed)
    arrow = schema.to_arrow()
    for name, typ in zip(arrow.names, arrow.types):
        if pa.types.is_integer(typ):
            df[name] = pd.to_numeric(df[name]).astype("Int64")
        elif pa.types.is_floating(typ):
            df[name] = pd.to_numeric(df[name]).astype("float64")
    df = df.sort_values(["repo", "path"]).reset_index(drop=True)
    return df, schema


def row_sha256(df: pd.DataFrame) -> pd.Series:
    """Canonical per-row hash: json-escaped 'col=value' pairs joined over
    sorted column names.

    Nulls serialize as the empty marker '∅'; integers without '.0'. String
    values are json-escaped so separator characters inside payloads ('|',
    '=', quotes) cannot make two different rows serialize identically — the
    serialization is injective. The same function is applied to the oracle
    and the engine output, so equality of hash multisets == row-for-row
    state equality.
    """
    import json as _json

    cols = sorted(df.columns)
    parts = []
    for c in cols:
        s = df[c]
        if str(s.dtype) in ("Int64", "int64", "float64", "Float64"):
            txt = s.astype(object).map(
                lambda v: "∅"
                if pd.isna(v)
                else str(int(v))
                if float(v).is_integer()
                else repr(float(v))
            )
        else:
            txt = s.astype(object).map(
                lambda v: "∅" if pd.isna(v) else _json.dumps(str(v))
            )
        parts.append(c + "=" + txt.astype(str))
    joined = parts[0]
    for p in parts[1:]:
        joined = joined + "|" + p
    return joined.map(lambda s: hashlib.sha256(s.encode()).hexdigest())


def state_digest(df: pd.DataFrame) -> str:
    """Order-insensitive digest of the whole table state."""
    hashes = sorted(row_sha256(df).tolist())
    return hashlib.sha256("\n".join(hashes).encode()).hexdigest()

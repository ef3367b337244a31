"""Incrementally maintained derived aggregate tables — the ES-adapter analog.

The reference's largest consumer surface after the RDB mirror is secondary-
index / derived-document maintenance: SQL-mapping-driven upsert plus
join-table ``updateByQuery`` with source lookups
(``client-adapter/escore/.../ESSyncService.java:36-796``). The Ray-native
analog here maintains an AGGREGATE table over the lake, updated per epoch
from the change stream instead of recomputed:

    for each partition, for the epochs since the derived cursor:
        K        = keys touched by those epochs' deltas
        old(K)   = per-group contribution of K as of the cursor epoch
        new(K)   = per-group contribution of K now
        partial  = new(K) - old(K)        (count and sums are abelian)
    derived_table += sum(partials)        (tiny grouped fold on the driver)

Each partition's old/new lookups are LOCAL merges of its own lake files
(``sink.merge_partition`` with an epoch cutoff) — the exact shape of
ESSyncService querying the source DB for the rows behind a changed document,
but without leaving the partition. Per-epoch cost is O(changed keys), never
O(lake).

Durability: the table is written to a per-epoch versioned parquet and the
cursor advanced after — re-running a crashed update rewrites the same bytes
(deterministic diff from the same cursor), so the fold never double-applies.
Constraint: updates must be brought current BEFORE ``CdcJob.compact()``
(compaction folds away the deltas that define "as of the cursor").
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray

from canal_ray.checkpoint import atomic_write_json, read_json
from canal_ray.ddl import TableSchema
from canal_ray.sink import (
    META_LSN,
    _atomic_write_parquet,
    compacted_through,
    lake_partition_dirs,
    merge_partition,
)

# supported aggregate kinds: (alias, kind, column)
#   count           -> number of live rows in the group
#   sum             -> sum of a numeric column (nulls contribute 0)
#   strlen          -> sum of len(string column) (nulls contribute 0)
AggSpec = tuple[str, str, str | None]


def _contribution(
    df: pd.DataFrame, group_col: str, aggs: list[AggSpec],
    col_map: dict[str, str | None],
) -> pd.DataFrame:
    """Per-group contribution of a set of live rows (vectorized).

    ``col_map`` maps spec column names to the schema's CURRENT names (renames
    resolve through slot aliases); a None mapping (column dropped) makes the
    aggregate contribute 0. The OUTPUT column is always the spec name, so the
    derived table's surface is stable across source renames.
    """
    gcol = col_map[group_col]
    # NULL group values stay NA end-to-end (pandas native NaN grouping);
    # an in-band sentinel string would conflate genuine values with NULL
    out = pd.DataFrame({group_col: df[gcol]})
    for alias, kind, col in aggs:
        actual = col_map.get(col) if col else None
        if kind == "count":
            out[alias] = np.int64(1)
        elif actual is None:
            out[alias] = np.int64(0)
        elif kind == "sum":
            num = pd.to_numeric(df[actual]).fillna(0)
            if ((num % 1) != 0).any():
                # derived aggregates are int64 counters by contract; a
                # widened float column would silently floor — fail loudly
                raise ValueError(
                    f"sum over {col!r} requires integral values; the column "
                    "carries fractional values (int64-counter contract)"
                )
            out[alias] = num.astype("int64").to_numpy()
        elif kind == "strlen":
            out[alias] = df[actual].str.len().fillna(0).astype("int64").to_numpy()
        else:
            raise ValueError(f"unknown agg kind {kind}")
    return out.groupby(group_col, as_index=False, dropna=False).sum()


def fold_group_table(
    parts: pd.DataFrame, group_col: str, agg_names: list[str]
) -> pd.DataFrame:
    """Sum contributions per group, drop all-zero groups, stable order and
    int64 dtypes — the one fold every derived table (single-stream and
    joined) applies to (base + diffs) and to full recomputes."""
    folded = parts.groupby(group_col, as_index=False, dropna=False)[agg_names].sum()
    folded = folded[folded[agg_names].abs().sum(axis=1) > 0]
    folded = folded.sort_values(group_col).reset_index(drop=True)
    folded[agg_names] = folded[agg_names].astype("int64")
    return folded


def empty_group_table(group_col: str, aggs: list[AggSpec]) -> pd.DataFrame:
    return pd.DataFrame(
        {group_col: pd.Series([], dtype=object)}
        | {a: pd.Series([], dtype="int64") for a, _, _ in aggs}
    )


def _resolve_cols(schema: TableSchema, names: list[str]) -> dict[str, str | None]:
    """Spec name -> current active column name (None = dropped/unknown)."""
    out: dict[str, str | None] = {}
    for n in names:
        i = schema.resolve(n)
        if i is None:
            out[n] = None
        else:
            s = schema.slots()[i]
            out[n] = None if s.dropped else s.name
    return out


def _partition_diff(
    part_dir: str,
    schema_json,
    pk: tuple[str, str],
    cursor: int,
    now: int,
    group_col: str,
    aggs: list[AggSpec],
) -> pd.DataFrame:
    """One partition's per-group delta between the cursor and now."""
    import pyarrow.parquet as pq

    schema = TableSchema.from_json(schema_json)
    col_map = _resolve_cols(
        schema, [group_col] + [c for _, _, c in aggs if c is not None]
    )
    if col_map[group_col] is None:
        raise ValueError(f"derived group column {group_col!r} not in schema")
    # keys touched since the cursor = union of the new deltas' keys; a
    # TRUNCATE in the window kills keys that have NO delta row, so it forces
    # a whole-partition diff (still partition-local, still O(partition))
    touched: list[pd.DataFrame] = []
    saw_truncate = False
    for name in sorted(os.listdir(part_dir)):
        if not (name.startswith("delta_e") and name.endswith(".parquet")):
            continue
        e = int(name[7:-8])  # all digits: epochs past 99999 widen the field
        if cursor < e <= now:
            f = pq.ParquetFile(os.path.join(part_dir, name))
            md = f.schema_arrow.metadata or {}
            if b"truncate_lsn" in md:
                saw_truncate = True
            t = f.read(columns=list(pk))
            touched.append(t.to_pandas())
    if not touched:
        return pd.DataFrame()
    keys = pd.concat(touched, ignore_index=True).drop_duplicates()

    def live_rows(up_to: int | None) -> pd.DataFrame:
        t = merge_partition(part_dir, schema, pk, up_to_epoch=up_to)
        df = t.drop_columns([META_LSN]).to_pandas()
        if saw_truncate:
            return df
        return df.merge(keys, on=list(pk), how="inner")

    new_c = _contribution(live_rows(now), group_col, aggs, col_map)
    old_c = _contribution(live_rows(cursor), group_col, aggs, col_map)
    old_c[[a for a, _, _ in aggs]] = -old_c[[a for a, _, _ in aggs]]
    return pd.concat([new_c, old_c], ignore_index=True)


class DerivedTable:
    """One incrementally maintained aggregate table over a CDC lake."""

    def __init__(self, lake_dir: str, name: str, group_col: str, aggs: list[AggSpec]):
        self.lake_dir = lake_dir
        self.name = name
        self.group_col = group_col
        self.aggs = list(aggs)
        self.dir = os.path.join(lake_dir, "_derived")
        self._cursor_path = os.path.join(self.dir, f"{name}.json")

    # ------------------------------------------------------------- state
    def cursor(self) -> int:
        obj = read_json(self._cursor_path)
        return int(obj["epoch"]) if obj else -1

    def _table_path(self, epoch: int) -> str:
        return os.path.join(self.dir, f"{self.name}_e{epoch:05d}.parquet")

    def read(self) -> pd.DataFrame:
        import pyarrow.parquet as pq

        c = self.cursor()
        if c < 0 or not os.path.exists(self._table_path(c)):
            return empty_group_table(self.group_col, self.aggs)
        return pq.read_table(self._table_path(c)).to_pandas()

    # ------------------------------------------------------------- update
    def update(self, job) -> pd.DataFrame:
        """Fold all epochs acked since the cursor into the derived table.

        Per-partition diffs run as parallel Ray tasks; the final per-group
        fold is tiny (group cardinality). Idempotent per target epoch.
        """
        import pyarrow as pa

        now = job.store.last_complete_epoch()
        cur = self.cursor()
        if now <= cur:
            return self.read()
        schema_json = job.final_schema().to_json()
        pk = job.cfg.pk_columns
        # COMPACTION GUARD: if compaction folded epochs past this table's
        # cursor, the deltas that define the incremental diff are gone — a
        # partition diff would silently MISS those changes (for a fresh
        # table, it would return empty over a non-empty compacted lake).
        # Fall back to the bounded full refresh, same as the DDL guard.
        if compacted_through(self.lake_dir) > cur:
            import pyarrow as pa

            folded = self.recompute(job, up_to_epoch=now)
            _atomic_write_parquet(
                pa.Table.from_pandas(folded, preserve_index=False),
                self._table_path(now),
            )
            atomic_write_json(self._cursor_path, {"epoch": now})
            return folded
        # DDL guard: if a spec column's resolution CHANGED between the cursor
        # and now (dropped, or renamed such that it binds differently), the
        # contributions already folded into the base were computed under the
        # old mapping and cannot be incrementally reversed — fall back to a
        # full refresh for this update (the ES adapter's analog is a full
        # re-ETL on mapping change). Pure renames that resolve to the same
        # slot keep the incremental path.
        if cur >= 0:
            spec_cols = [self.group_col] + [
                c for _, _, c in self.aggs if c is not None
            ]

            def slot_identity(schema: TableSchema) -> dict:
                # SLOT index + dropped flag, not the active name: a pure
                # rename keeps the slot and must keep the incremental path
                out = {}
                for n in spec_cols:
                    i = schema.resolve(n)
                    out[n] = None if i is None or schema.is_dropped(i) else i
                return out

            now_schema = TableSchema.from_json(schema_json)
            if slot_identity(now_schema) != slot_identity(job._schema_at(cur)):
                if _resolve_cols(now_schema, [self.group_col])[self.group_col] is None:
                    raise ValueError(
                        f"derived group column {self.group_col!r} not in schema"
                    )
                # bounded to the acked target: an unbounded recompute would
                # fold applied-but-unacked deltas the next update re-adds
                folded = self.recompute(job, up_to_epoch=now)
                _atomic_write_parquet(
                    pa.Table.from_pandas(folded, preserve_index=False),
                    self._table_path(now),
                )
                atomic_write_json(self._cursor_path, {"epoch": now})
                return folded
        task = ray.remote(num_cpus=1)(_partition_diff)
        futures = [
            task.remote(d, schema_json, pk, cur, now, self.group_col, self.aggs)
            for d in lake_partition_dirs(self.lake_dir)
        ]
        diffs = [d for d in ray.get(futures) if not d.empty]
        base = self.read()
        allparts = pd.concat([base, *diffs], ignore_index=True) if diffs else base
        agg_names = [a for a, _, _ in self.aggs]
        if allparts.empty:
            folded = base
        else:
            folded = fold_group_table(allparts, self.group_col, agg_names)
        _atomic_write_parquet(
            pa.Table.from_pandas(folded, preserve_index=False),
            self._table_path(now),
        )
        atomic_write_json(self._cursor_path, {"epoch": now})
        return folded

    # ------------------------------------------------------------- oracle
    def recompute(self, job, up_to_epoch: int | None = None) -> pd.DataFrame:
        """Full recompute from the lake state (the verification oracle for
        the incremental path).

        ``up_to_epoch`` bounds the merge to acked epochs: the DDL-guard
        fallback in update() MUST pass the cursor's target epoch — an
        unbounded merge would fold deltas that are applied but not yet
        acked, and those epochs would be double-counted by the next
        incremental update once they ack."""
        if up_to_epoch is None:
            state = job.state_pandas()
            schema = TableSchema.from_json(job.final_schema().to_json())
        else:
            schema = job._schema_at(up_to_epoch)
            parts = []
            for pdir in lake_partition_dirs(self.lake_dir):
                t = merge_partition(
                    pdir, schema, job.cfg.pk_columns, up_to_epoch=up_to_epoch
                )
                parts.append(t.drop_columns([META_LSN]).to_pandas())
            state = (
                pd.concat(parts, ignore_index=True)
                if parts
                else pd.DataFrame(columns=schema.active_names())
            )
        if state.empty:
            return self.read().iloc[0:0]
        col_map = _resolve_cols(
            schema, [self.group_col] + [c for _, _, c in self.aggs if c is not None]
        )
        full = _contribution(state, self.group_col, self.aggs, col_map)
        return fold_group_table(full, self.group_col, [a for a, _, _ in self.aggs])

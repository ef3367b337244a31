"""Join-table derived aggregates — the ESSyncService ``updateByQuery`` analog.

``canal_ray.derived.DerivedTable`` covers the main-table path (group column
lives on the changed row). The reference's OTHER maintenance path is the
join-table one: a change in a JOINED table rewrites every document that
referenced it (``client-adapter/escore/.../ESSyncService.java:546-575,
699-796`` — ``updateByQuery`` driven by source-DB lookup queries). Here that
is: an aggregate grouped by a column of a DIMENSION stream over values of a
FACT stream, both replayed into independent lakes — when a key's dimension
row changes group, the key's whole fact contribution moves between groups.

    for each partition p (BOTH lakes hash the same pk -> same partition id,
    enforced below — key k's fact and dim rows are co-partitioned):
        K        = keys touched by fact deltas since (fact cursor)
                 ∪ keys touched by dim deltas since (dim cursor)
        old(K)   = group-contribution of join(fact@fact_cur, dim@dim_cur)|K
        new(K)   = group-contribution of join(fact@now,      dim@now)|K
        partial  = new(K) - old(K)
    derived += sum(partials)          (tiny per-group fold on the driver)

The per-partition lookups are LOCAL merges (``sink.merge_partition`` with
an epoch cutoff) of the two co-partitioned lakes — exactly the shape of the
adapter querying the source DB for the rows behind a changed document, but
without leaving the partition. Cost per update: partitions with NO touched
keys skip their merges entirely; a touched partition pays its partition-
LOCAL base+delta LWW merge (I/O bounded by that partition, never a cross-
partition shuffle) and then O(touched keys) join/aggregate work — the
same cost shape as ``DerivedTable._partition_diff``. Join semantics:
INNER on the shared pk (a fact key with no dimension row contributes to
no group), latest dim row wins (LWW — the merge already guarantees it).

DDL on either stream falls back to a bounded full recompute for that update
(schema-fingerprint guard), mirroring the ES adapter's re-ETL on mapping
change. Same compaction constraint as ``DerivedTable``: bring updates
current BEFORE ``compact()`` on either lake.
"""

from __future__ import annotations

import os

import pandas as pd

import ray

from canal_ray.checkpoint import atomic_write_json, read_json
from canal_ray.ddl import TableSchema
from canal_ray.derived import (
    AggSpec,
    _contribution,
    _resolve_cols,
    empty_group_table,
    fold_group_table,
)
from canal_ray.sink import (
    META_LSN,
    _atomic_write_parquet,
    lake_partition_dirs,
    merge_partition,
)


def _touched_keys(
    part_dir: str, pk: tuple[str, str], cursor: int, now: int
) -> tuple[pd.DataFrame | None, bool]:
    """(pk keys in deltas of epochs (cursor, now], saw_truncate).

    None keys + truncate=True means "whole partition must be diffed"."""
    import pyarrow.parquet as pq

    touched: list[pd.DataFrame] = []
    if os.path.isdir(part_dir):
        for name in sorted(os.listdir(part_dir)):
            if not (name.startswith("delta_e") and name.endswith(".parquet")):
                continue
            e = int(name[7:-8])
            if cursor < e <= now:
                f = pq.ParquetFile(os.path.join(part_dir, name))
                if b"truncate_lsn" in (f.schema_arrow.metadata or {}):
                    # whole-partition diff — no point reading more keys
                    return None, True
                touched.append(f.read(columns=list(pk)).to_pandas())
    if not touched:
        return pd.DataFrame(columns=list(pk)), False
    return pd.concat(touched, ignore_index=True).drop_duplicates(), False


def _joined_partition_diff(
    fact_dir: str,
    dim_dir: str,
    fact_schema_json,
    dim_schema_json,
    pk: tuple[str, str],
    fact_cur: int,
    fact_now: int,
    dim_cur: int,
    dim_now: int,
    group_col: str,
    aggs: list[AggSpec],
) -> pd.DataFrame:
    """One co-partition's per-group delta between the 2D cursor and now."""
    fact_schema = TableSchema.from_json(fact_schema_json)
    dim_schema = TableSchema.from_json(dim_schema_json)
    agg_cols = [c for _, _, c in aggs if c is not None]
    fact_map = _resolve_cols(fact_schema, agg_cols)
    dim_map = _resolve_cols(dim_schema, [group_col])
    if dim_map[group_col] is None:
        raise ValueError(f"joined group column {group_col!r} not in dim schema")

    fk, f_trunc = _touched_keys(fact_dir, pk, fact_cur, fact_now)
    dk, d_trunc = _touched_keys(dim_dir, pk, dim_cur, dim_now)
    whole = f_trunc or d_trunc
    if not whole:
        keys = pd.concat([fk, dk], ignore_index=True).drop_duplicates()
        if keys.empty:
            return pd.DataFrame()

    def joined_rows(f_up: int, d_up: int) -> pd.DataFrame:
        f = merge_partition(fact_dir, fact_schema, pk, up_to_epoch=f_up)
        d = merge_partition(dim_dir, dim_schema, pk, up_to_epoch=d_up)
        # project the fact side to pk + agg columns BEFORE the join: any
        # other fact column (incl. one named like the dim group) must not
        # ride along — the dim stream owns the group, unambiguously
        f_cols = list(pk) + [
            fact_map[c] for c in agg_cols if fact_map.get(c) is not None
        ]
        fd = f.drop_columns([META_LSN]).to_pandas()[f_cols]
        dd = d.drop_columns([META_LSN]).to_pandas()
        if not whole:
            fd = fd.merge(keys, on=list(pk), how="inner")
            dd = dd.merge(keys, on=list(pk), how="inner")
        # INNER join on the shared pk: latest dim row assigns the group
        cols = list(pk) + [dim_map[group_col]]
        return fd.merge(dd[cols], on=list(pk), how="inner")

    col_map = {group_col: dim_map[group_col], **fact_map}
    new_c = _contribution(joined_rows(fact_now, dim_now), group_col, aggs, col_map)
    old_c = _contribution(joined_rows(fact_cur, dim_cur), group_col, aggs, col_map)
    old_c[[a for a, _, _ in aggs]] = -old_c[[a for a, _, _ in aggs]]
    return pd.concat([new_c, old_c], ignore_index=True)


class JoinedDerivedTable:
    """Aggregate over fact x dim change streams, incrementally maintained."""

    def __init__(
        self,
        fact_job,
        dim_job,
        name: str,
        group_col: str,
        aggs: list[AggSpec],
    ):
        fc, dc = fact_job.cfg, dim_job.cfg
        if fc.num_partitions != dc.num_partitions or fc.pk_columns != dc.pk_columns:
            # co-partitioning is the correctness precondition: key k's fact
            # and dim rows must land in the same partition index
            raise ValueError(
                "fact and dim lakes must share num_partitions and pk_columns "
                f"({fc.num_partitions}/{fc.pk_columns} vs "
                f"{dc.num_partitions}/{dc.pk_columns})"
            )
        if any(c == group_col for _, _, c in aggs if c is not None):
            # the group column is dim-owned by contract; an agg over a
            # same-named FACT column would collide in the join and override
            # the dim mapping — reject up front instead of a KeyError later
            raise ValueError(
                f"agg column {group_col!r} collides with the dim group column"
            )
        if fc.column_filter or dc.column_filter:
            # column-filtered lakes write filtered deltas but unfiltered
            # manifest schemas; the schema-diff guard and merges below would
            # conform filtered-away columns to nulls (silent zero sums) —
            # unsupported until the filtered schema is carried end to end
            raise ValueError(
                "JoinedDerivedTable does not support column_filter lakes"
            )
        self.fact_job = fact_job
        self.dim_job = dim_job
        self.name = name
        self.group_col = group_col
        self.aggs = list(aggs)
        self.dir = os.path.join(fc.lake_dir, "_derived")
        self._cursor_path = os.path.join(self.dir, f"{name}_join.json")

    # ------------------------------------------------------------- state
    def cursor(self) -> tuple[int, int]:
        obj = read_json(self._cursor_path)
        return (int(obj["fact_epoch"]), int(obj["dim_epoch"])) if obj else (-1, -1)

    def _table_path(self, fe: int, de: int) -> str:
        return os.path.join(self.dir, f"{self.name}_join_f{fe:05d}_d{de:05d}.parquet")

    def read(self) -> pd.DataFrame:
        import pyarrow.parquet as pq

        fe, de = self.cursor()
        path = self._table_path(fe, de)
        if fe < 0 or not os.path.exists(path):
            return empty_group_table(self.group_col, self.aggs)
        return pq.read_table(path).to_pandas()

    # ------------------------------------------------------------- update
    def update(self) -> pd.DataFrame:
        """Fold everything acked on both lakes since the 2D cursor."""
        import pyarrow as pa

        fact_now = self.fact_job.store.last_complete_epoch()
        dim_now = self.dim_job.store.last_complete_epoch()
        fact_cur, dim_cur = self.cursor()
        if fact_now <= fact_cur and dim_now <= dim_cur:
            return self.read()
        if fact_now < 0 or dim_now < 0:
            # one stream has no acked epochs yet: nothing joinable exists
            # (inner-join semantics) — and no manifest schema to read either
            return self.read()

        fact_schema = self.fact_job._schema_at(fact_now)
        dim_schema = self.dim_job._schema_at(dim_now)
        refresh = False
        if fact_cur >= 0:
            # DDL guard: any schema change on either stream since the cursor
            # -> bounded full refresh (the ES adapter's re-ETL on mapping
            # change). Compare MANIFEST schemas on both ends — final_schema()
            # on one side vs a manifest on the other would spuriously differ
            # for any config that restricts the materialized schema
            refresh = (
                fact_schema.fingerprint()
                != self.fact_job._schema_at(fact_cur).fingerprint()
                or dim_schema.fingerprint()
                != self.dim_job._schema_at(dim_cur).fingerprint()
            )

        if refresh:
            folded = self.recompute(up_to=(fact_now, dim_now))
        else:
            fact_dirs = lake_partition_dirs(self.fact_job.cfg.lake_dir)
            dim_dirs = lake_partition_dirs(self.dim_job.cfg.lake_dir)
            by_idx = {os.path.basename(d): d for d in dim_dirs}
            task = ray.remote(num_cpus=1)(_joined_partition_diff)
            futures = []
            for fd in fact_dirs:
                dd = by_idx.get(os.path.basename(fd))
                if dd is None:
                    continue
                futures.append(
                    task.remote(
                        fd, dd, fact_schema.to_json(), dim_schema.to_json(),
                        self.fact_job.cfg.pk_columns,
                        fact_cur, fact_now, dim_cur, dim_now,
                        self.group_col, self.aggs,
                    )
                )
            diffs = [d for d in ray.get(futures) if not d.empty]
            base = self.read()
            agg_names = [a for a, _, _ in self.aggs]
            allparts = pd.concat([base, *diffs], ignore_index=True) if diffs else base
            if allparts.empty:
                folded = base
            else:
                folded = fold_group_table(allparts, self.group_col, agg_names)

        _atomic_write_parquet(
            pa.Table.from_pandas(folded, preserve_index=False),
            self._table_path(fact_now, dim_now),
        )
        atomic_write_json(
            self._cursor_path, {"fact_epoch": fact_now, "dim_epoch": dim_now}
        )
        return folded

    # ------------------------------------------------------------- oracle
    def recompute(self, up_to: tuple[int, int] | None = None) -> pd.DataFrame:
        """Full fact x dim join + aggregate (the verification oracle)."""
        def state(job, epoch: int | None) -> tuple[pd.DataFrame, TableSchema]:
            if epoch is None:
                return job.state_pandas(), job.final_schema()
            schema = job._schema_at(epoch)
            parts = []
            for pdir in lake_partition_dirs(job.cfg.lake_dir):
                t = merge_partition(pdir, schema, job.cfg.pk_columns, up_to_epoch=epoch)
                parts.append(t.drop_columns([META_LSN]).to_pandas())
            df = (
                pd.concat(parts, ignore_index=True)
                if parts
                else pd.DataFrame(columns=schema.active_names())
            )
            return df, schema

        fe, de = up_to if up_to else (None, None)
        fact, fact_schema = state(self.fact_job, fe)
        dim, dim_schema = state(self.dim_job, de)
        pk = list(self.fact_job.cfg.pk_columns)
        dim_map = _resolve_cols(dim_schema, [self.group_col])
        if dim_map[self.group_col] is None:
            raise ValueError(f"joined group column {self.group_col!r} not in dim schema")
        agg_cols = [c for _, _, c in self.aggs if c is not None]
        col_map = {self.group_col: dim_map[self.group_col],
                   **_resolve_cols(fact_schema, agg_cols)}
        if fact.empty or dim.empty:
            return self.read().iloc[0:0]
        f_cols = pk + [
            col_map[c] for c in agg_cols if col_map.get(c) is not None
        ]
        joined = fact[f_cols].merge(
            dim[pk + [dim_map[self.group_col]]], on=pk, how="inner"
        )
        full = _contribution(joined, self.group_col, self.aggs, col_map)
        return fold_group_table(full, self.group_col, [a for a, _, _ in self.aggs])

"""Sink apply: per-partition LWW upsert into the partitioned Parquet lake.

The analog of Canal's client-adapter apply path
(``client-adapter/rdb/.../RdbSyncService.java:209-399`` — INSERT/UPDATE/DELETE
by PK, batched per partition, committed per batch; upsert flavor as in
``client-adapter/kudu/.../KuduSyncService.java:51-152``) fused with its
meta/position manager (``meta/.../FileMixedMetaManager.java``) and tableMeta
tracking (``parse/.../tsdb/MemoryTableMeta.java``).

Design (merge-on-read lake, scales to 10^10 events):

  - One group per ``partition_id`` per epoch (the single shuffle). The apply
    function LWW-compacts the epoch's events for its partition and writes ONE
    delta file ``<lake>/p<P>/delta_e<E>.parquet`` (atomic tmp+rename; one row
    per key with ``_lsn`` — physical row order is unspecified, consumers
    order by ``_lsn``), then its checkpoint. It never rewrites existing
    data — an epoch's cost is O(epoch), not O(lake).
  - DELETE becomes a tombstone row (``_deleted``); tombstones fold away at
    compaction. ``_lsn`` rides along for cross-epoch LWW.
  - Reading the final state / compacting merges base + deltas per partition:
    embarrassingly parallel per-partition Ray tasks, no further shuffle.
  - Exactly-once effect: if this (partition, epoch) checkpoint already exists
    with the same lsn range (Ray task retry, or driver resume re-running a
    partially-complete epoch), the work is skipped and the checkpointed
    summary returned — offset fencing (Canal analog: at-least-once redelivery
    made harmless by PK-idempotent apply, ``RdbSyncService.java:284-291``).

DDL events arrive replicated in every partition's group and are applied in
lsn order to evolve the partition's Arrow schema; rows decoded before the DDL
get NULL for added columns (Canal ``ddlIsolation`` ordering,
``store/memory/MemoryEventStoreWithBuffer.java:315-356``).
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from canal_ray.checkpoint import CheckpointStore
from canal_ray.config import CdcConfig
from canal_ray.ddl import TableSchema

# bump when the delta-file format changes (consumers can key caches on it)
DELTA_FORMAT_VERSION = 3  # v3: slot-model schemas (RENAME/DROP COLUMN)

# CANAL_PHASE_TIMING sub-phase accumulator (reset per gather task; a Ray
# worker runs one task at a time, so this is race-free within a process)
_PROF: dict[str, float] = {}


def _prof(key: str, t0: float) -> None:
    import time as _time

    _PROF[key] = _PROF.get(key, 0.0) + (_time.perf_counter() - t0)


META_LSN = "_lsn"
META_DELETED = "_deleted"
# per-row column-set bitmask (bit i = schema column i was SET by this event):
# -1 = full row image (replaces everything), 0 = tombstone, else = patch
# (minimal row image; Canal's Column.updated-flags semantics)
META_MASK = "_mask"

SUMMARY_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int32()),
        pa.field("epoch", pa.int64()),
        pa.field("events", pa.int64()),
        pa.field("delta_rows", pa.int64()),
        pa.field("poison", pa.int64()),
        pa.field("ddls", pa.int64()),
        pa.field("lsn_min", pa.int64()),
        pa.field("lsn_max", pa.int64()),
        pa.field("schema_json", pa.string()),
        pa.field("schema_fingerprint", pa.string()),
        pa.field("skipped", pa.bool_()),
    ]
)


def partition_dir(lake_dir: str, partition_id: int) -> str:
    return os.path.join(lake_dir, f"p{partition_id:05d}")


def _fsync_paths(paths: list[str], dirs: set[str]) -> None:
    """fsync files then their directories (refuses silently on unsupported
    filesystems for the dir part, mirroring atomic_write_json)."""
    if os.environ.get("CANAL_NO_FSYNC"):
        return
    for p in paths:
        with open(p, "rb") as f:
            os.fsync(f.fileno())
    for d in dirs:
        try:
            dfd = os.open(d, os.O_RDONLY)
            os.fsync(dfd)
            os.close(dfd)
        except OSError:
            pass


def _atomic_write_parquet(
    table: pa.Table, path: str, fsync: bool = True, compression: str = "snappy"
) -> None:
    """tmp+rename parquet write; ``fsync=False`` defers durability to a
    caller-batched ``_fsync_paths`` (the apply path syncs a whole cycle's
    delta files in one pass BEFORE writing any checkpoint — the durability
    invariant "checkpoint durable => delta durable" is per-ordering, not
    per-file, and one batched sync per task beats 2 syncs x epochs x
    partitions against a single device)."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp_", suffix=".parquet")
    os.close(fd)
    try:
        pq.write_table(table, tmp, compression=compression)
        # fsync data before the rename (mirrors atomic_write_json): without it
        # a power loss can leave a torn delta beside a durable checkpoint whose
        # fencing then treats the epoch as complete and never rewrites it
        if fsync:
            _fsync_paths([tmp], set())
        os.replace(tmp, path)
        if fsync:
            _fsync_paths([], {d})
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


# ---------------------------------------------------------------------------
# typed materialization: stringly cols/vals -> typed payload columns
# (LogEventConvert §1.2 type normalization + JdbcTypeUtil cast, vectorized)
# ---------------------------------------------------------------------------

def _numeric_poison_mask(raw: pa.Array | pa.ChunkedArray, typ: pa.DataType) -> np.ndarray:
    """True where a string value cannot be cast to ``typ`` (form OR range).

    Regex alone is not enough: '3000000000' is a well-formed integer but
    overflows int32, and pc.cast would raise ArrowInvalid mid-epoch — the
    range check routes such rows into the quarantine like any other poison.
    Nulls are castable (-> typed null).
    """
    if pa.types.is_integer(typ):
        # one regex pass for the form; digit-count via the cheap length
        # kernel (<=18 digits always fits int64; longer needs an exact check)
        form = pc.fill_null(pc.match_substring_regex(raw, r"^-?\d+$"), True)
        formn = form.to_numpy(zero_copy_only=False)
        nlen = pc.fill_null(pc.binary_length(raw), 0).to_numpy(zero_copy_only=False)
        is_neg = pc.fill_null(pc.starts_with(raw, "-"), False).to_numpy(
            zero_copy_only=False
        )
        ndigits = nlen - is_neg.astype(np.int64)
        okn = formn & (ndigits <= 18)
        longn = formn & (ndigits > 18)
        bad = ~(okn | longn)
        w = typ.bit_width
        lo, hi = -(1 << (w - 1)), (1 << (w - 1)) - 1
        if longn.any():  # rare: exact Python bounds check on the few long ones
            arr = raw.combine_chunks() if isinstance(raw, pa.ChunkedArray) else raw
            for i in np.flatnonzero(longn):
                if not (lo <= int(arr[i].as_py()) <= hi):
                    bad[i] = True
        if w < 64 and okn.any():
            cand = pc.if_else(pa.array(okn), raw, pa.nulls(len(bad), type=pa.string()))
            as64 = pc.cast(cand, pa.int64())
            in_range = pc.fill_null(
                pc.and_(pc.greater_equal(as64, lo), pc.less_equal(as64, hi)), True
            )
            bad |= ~in_range.to_numpy(zero_copy_only=False)
        return bad
    # floats: string->float64 overflow saturates to +-inf (no error), so the
    # form regex is the complete check
    ok = pc.fill_null(
        pc.match_substring_regex(raw, r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"), True
    )
    return ~ok.to_numpy(zero_copy_only=False)

def materialize_images(
    dml: pa.Table,
    schema: TableSchema,
    pk: tuple[str, str],
    allow_patches: bool = True,
) -> tuple[pa.Table, pa.Table | None]:
    """Typed payload table for DML rows (any mix of image widths + DELETEs),
    plus the quarantined poison rows (un-castable values) in wire format.

    Relies on the slot-position invariant: a full image's column set is the
    positional prefix ``schema.names()[:img_len]`` of the slot list (slot
    positions never change, even across RENAME/DROP), so the image *length*
    alone identifies its column set — extraction stays fully vectorized
    (``pc.list_element`` per column) and the column names never travel
    through the shuffle for full images (see ``canal_ray.decode``). Output
    tables carry ALL slots (dropped included) in slot order, so META_MASK
    bit i always means column i of the table; dropped slots are stripped at
    the final merge.
    """
    names = schema.names()
    arrow_schema = schema.to_arrow(include_dropped=True)
    pieces: list[pa.Table] = []
    poison_pieces: list[pa.Table] = []

    # ---- patch rows (minimal images): arbitrary column subsets -----------
    if "patch_cols" in dml.column_names:
        pmask = pc.is_valid(dml["patch_cols"]).to_numpy(zero_copy_only=False)
        if pmask.any():
            if not allow_patches:
                # without the flag the caller would LWW-reduce before this
                # point and silently drop full images that patches depend on
                raise ValueError(
                    "minimal row images present in the log but "
                    "CdcConfig.partial_updates is False"
                )
            patches = dml.filter(pa.array(pmask))
            dml = dml.filter(pa.array(~pmask))
            p_pieces, p_poison = _materialize_patches(patches, schema, pk)
            pieces.extend(p_pieces)
            poison_pieces.extend(p_poison)

    lengths = dml["img_len"].to_numpy(zero_copy_only=False)
    for length in np.unique(lengths):
        mask = lengths == length
        sub = dml.filter(pa.array(mask))
        cols: dict[str, pa.Array] = {}
        if length > len(names):
            raise ValueError(
                f"image width {length} exceeds schema {names} — DDL not yet "
                "applied for this partition? (broken replication invariant)"
            )
        # poison detection: numeric columns whose string value can't cast.
        # Canal's adapter ultimately ACKs past poison batches after retries
        # (AdapterProcessor.java:162-241); deterministic replay can't retry
        # its way out, so poison rows are quarantined instead of crashing
        # the epoch, and surface in the checkpoint lineage.
        bad = np.zeros(sub.num_rows, dtype=bool)
        for j, name in enumerate(names):
            typ = arrow_schema.field(name).type
            if j < int(length) and not pa.types.is_string(typ):
                raw = pc.list_element(sub["vals"], j)
                bad |= _numeric_poison_mask(raw, typ)
        if bad.any():
            poison_pieces.append(sub.filter(pa.array(bad)))
            sub = sub.filter(pa.array(~bad))
            if sub.num_rows == 0:
                continue
        for j, name in enumerate(names):
            typ = arrow_schema.field(name).type
            if j < length:
                arr = pc.list_element(sub["vals"], j)
                if not pa.types.is_string(typ):
                    arr = pc.cast(arr, typ)
            else:
                arr = pa.nulls(sub.num_rows, type=typ)
            cols[name] = arr
        # DELETE rows carry only the PK (FULL-image mode; see loggen docstring)
        sub_ops = sub["op"].to_numpy(zero_copy_only=False)
        if (sub_ops == "DELETE").any():
            cols[pk[0]] = pc.coalesce(cols[pk[0]], sub["pk_repo"])
            cols[pk[1]] = pc.coalesce(cols[pk[1]], sub["pk_path"])
        cols[META_LSN] = sub["lsn"].combine_chunks() if isinstance(sub["lsn"], pa.ChunkedArray) else sub["lsn"]
        deleted = sub_ops == "DELETE"
        cols[META_DELETED] = pa.array(deleted)
        cols[META_MASK] = pa.array(np.where(deleted, 0, -1).astype(np.int64))
        pieces.append(pa.table(cols))
    poison = pa.concat_tables(poison_pieces) if poison_pieces else None
    if not pieces:
        fields = list(arrow_schema) + [
            pa.field(META_LSN, pa.int64()),
            pa.field(META_DELETED, pa.bool_()),
            pa.field(META_MASK, pa.int64()),
        ]
        return pa.schema(fields).empty_table(), poison
    return pa.concat_tables(pieces, promote_options="permissive"), poison


def _materialize_patches(
    patches: pa.Table, schema: TableSchema, pk: tuple[str, str]
) -> tuple[list[pa.Table], list[pa.Table]]:
    """Typed pieces for explicit-column-list rows, grouped by exact col set.

    Covers two row classes the positional prefix cannot express:
      - minimal row images (true patches, op=UPDATE): bit i of META_MASK =
        slot i set by the event — stable across ANY evolution because slot
        positions never change;
      - full images written after a RENAME/DROP (their column lists are no
        longer the slot-name prefix): op=INSERT rows keep full-replace
        semantics (META_MASK=-1) — an INSERT always carries the writer's
        complete column set, so treating it as a patch would wrongly no-op
        on a missing key.
    Column names resolve through the slot registry (aliases cover pre-rename
    names in flight); names belonging to dropped slots are skipped — the
    column no longer exists, its value is irrelevant.
    """
    names = schema.names()
    slots = schema.slots()
    arrow_schema = schema.to_arrow(include_dropped=True)
    joined = pc.binary_join(patches["patch_cols"], "\x1f")
    d = pc.dictionary_encode(joined).combine_chunks()
    codes = d.indices.to_numpy(zero_copy_only=False)
    pieces: list[pa.Table] = []
    poison: list[pa.Table] = []
    for code, pattern in enumerate(d.dictionary.to_pylist()):
        sub = patches.filter(pa.array(codes == code))
        set_names = pattern.split("\x1f")
        # resolve each listed name to its slot (None = unknown -> error;
        # dropped slot -> carried as None position, skipped below)
        slot_of: list[int | None] = []
        for s in set_names:
            i = schema.resolve(s)
            if i is None:
                raise ValueError(f"patch names [{s!r}] not in schema {names}")
            slot_of.append(None if slots[i].dropped else i)
        mask_val = 0
        for i in slot_of:
            if i is not None:
                mask_val |= 1 << i
        # poison scan on numeric patch columns (live slots only)
        bad = np.zeros(sub.num_rows, dtype=bool)
        for pos, i in enumerate(slot_of):
            if i is None:
                continue
            typ = arrow_schema.field(names[i]).type
            if not pa.types.is_string(typ):
                raw = pc.list_element(sub["vals"], pos)
                bad |= _numeric_poison_mask(raw, typ)
        if bad.any():
            poison.append(sub.filter(pa.array(bad)))
            sub = sub.filter(pa.array(~bad))
            if sub.num_rows == 0:
                continue
        pos_of_slot = {i: pos for pos, i in enumerate(slot_of) if i is not None}
        cols: dict[str, pa.Array] = {}
        for j, name in enumerate(names):
            typ = arrow_schema.field(name).type
            if j in pos_of_slot:
                arr = pc.list_element(sub["vals"], pos_of_slot[j])
                if not pa.types.is_string(typ):
                    arr = pc.cast(arr, typ)
            elif name == pk[0]:
                arr = sub["pk_repo"].combine_chunks()
            elif name == pk[1]:
                arr = sub["pk_path"].combine_chunks()
            else:
                arr = pa.nulls(sub.num_rows, type=typ)
            cols[name] = arr
        ops = sub["op"].to_numpy(zero_copy_only=False)
        is_insert = ops == "INSERT"
        piece = pa.table(
            {
                **cols,
                META_LSN: sub["lsn"].combine_chunks(),
                META_DELETED: pa.array(np.zeros(sub.num_rows, dtype=bool)),
                META_MASK: pa.array(np.where(is_insert, -1, mask_val).astype(np.int64)),
            }
        )
        if mask_val == 0:
            # an UPDATE patch whose every listed column has been dropped sets
            # nothing — it is a no-op and MUST not materialize (mask 0 is the
            # tombstone encoding, and a no-op row would also win LWW over the
            # key's real image); INSERTs (mask -1) still apply
            piece = piece.filter(pa.array(is_insert))
            if piece.num_rows == 0:
                continue
        pieces.append(piece)
    return pieces, poison


def fold_rows(table: pa.Table, pk: tuple[str, str], *, terminal: bool) -> pa.Table:
    """Column-wise fold of full images, patches and tombstones per key.

    Walks each key's events newest-first: pending patches accumulate until a
    boundary (full image -> overlay and finalize; tombstone -> patches above
    it die, tombstone survives for cross-epoch kills). Keys that never hit a
    boundary are merged-patch rows when ``terminal=False`` (resolution
    deferred to the lake merge) and DROPPED when ``terminal=True`` (a patch
    with no underlying row is the reference's UPDATE-on-missing no-op,
    ``RdbSyncService.java:320-399`` update affects 0 rows).
    """
    if table.num_rows == 0:
        return table
    # fast path: keys whose events are all full images / tombstones reduce by
    # plain LWW (vectorized); only keys touched by at least one patch need
    # the per-key python walk — patches are typically a small minority.
    masks_np = table[META_MASK].to_numpy()
    is_patch_row = (masks_np != -1) & (masks_np != 0)
    if is_patch_row.any():
        rkey = pd.DataFrame(
            {
                "r": table[pk[0]].to_numpy(zero_copy_only=False),
                "p": table[pk[1]].to_numpy(zero_copy_only=False),
            }
        )
        patch_keys = rkey[is_patch_row].drop_duplicates()
        touched = rkey.merge(
            patch_keys.assign(_t=True), on=["r", "p"], how="left"
        )["_t"].notna().to_numpy()
    else:
        touched = np.zeros(table.num_rows, dtype=bool)
    if not touched.all():
        plain = lww_compact(table.filter(pa.array(~touched)), pk)
        if not touched.any():
            return plain
        folded = _fold_rows_python(table.filter(pa.array(touched)), pk, terminal)
        return pa.concat_tables([plain, folded], promote_options="permissive")
    return _fold_rows_python(table, pk, terminal)


def _fold_rows_python(table: pa.Table, pk: tuple[str, str], terminal: bool) -> pa.Table:
    t = table.take(pc.sort_indices(table, sort_keys=[(META_LSN, "descending")]))
    names = [c for c in t.column_names if c not in (META_LSN, META_DELETED, META_MASK)]
    rows = t.to_pylist()
    done: dict = {}
    acc: dict = {}
    order: list = []
    for row in rows:
        k = (row[pk[0]], row[pk[1]])
        if k in done:
            continue
        a = acc.get(k)
        if a is None:
            a = {"vals": {}, "mask": 0, "lsn": row[META_LSN]}
            acc[k] = a
            order.append(k)
        if row[META_DELETED]:
            done[k] = {"deleted": True}
        elif row[META_MASK] == -1:
            final = {c: row[c] for c in names}
            final.update(a["vals"])  # later patches override
            done[k] = {"deleted": False, "vals": final, "mask": -1}
        else:
            m = row[META_MASK]
            for i, c in enumerate(names):
                if (m >> i) & 1 and c not in a["vals"]:
                    a["vals"][c] = row[c]
            a["mask"] |= m
    out = []
    for k in order:
        a = acc[k]
        if k in done:
            d = done[k]
            if d["deleted"]:
                rec = {c: None for c in names}
                rec[pk[0]], rec[pk[1]] = k
                rec.update({META_LSN: a["lsn"], META_DELETED: True, META_MASK: 0})
            else:
                rec = dict(d["vals"])
                rec.update({META_LSN: a["lsn"], META_DELETED: False, META_MASK: -1})
        else:
            if terminal:
                continue  # patch with no base anywhere -> no-op
            rec = {c: a["vals"].get(c) for c in names}
            rec[pk[0]], rec[pk[1]] = k
            rec.update({META_LSN: a["lsn"], META_DELETED: False, META_MASK: a["mask"]})
        out.append(rec)
    if not out:
        return t.schema.empty_table()
    return pa.Table.from_pylist(out, schema=t.schema)


def lww_compact(table: pa.Table, pk: tuple[str, str]) -> pa.Table:
    """Keep the max-``_lsn`` row per key (stable; ties keep the later row)."""
    if table.num_rows == 0:
        return table
    order = pc.sort_indices(table, sort_keys=[(META_LSN, "ascending")])
    table = table.take(order)
    df = pd.DataFrame(
        {
            "r": table[pk[0]].to_numpy(zero_copy_only=False),
            "p": table[pk[1]].to_numpy(zero_copy_only=False),
        }
    )
    last = ~df.duplicated(keep="last").to_numpy()
    return table.filter(pa.array(last))


def conform(table: pa.Table, schema: TableSchema, *, with_meta: bool) -> pa.Table:
    """Project/cast a lake file to the target schema (add-null + widen).

    Alias-aware: a delta written before a RENAME carries the old column
    name — it conforms into the renamed slot. Output carries ALL slots in
    slot order (dropped slots conform too, so slot-indexed masks stay
    aligned); the final merge strips them.
    """
    from canal_ray.ddl import _ARROW_TYPES

    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for s in schema.slots():
        typ = _ARROW_TYPES[s.type]
        src = None
        for cand in [s.name, *reversed(s.aliases)]:
            if cand in table.column_names:
                src = table[cand]
                break
        if src is not None:
            cols[s.name] = pc.cast(src, typ) if src.type != typ else src
        else:
            cols[s.name] = pa.nulls(table.num_rows, type=typ)
    if with_meta:
        cols[META_LSN] = (
            table[META_LSN]
            if META_LSN in table.column_names
            else pa.nulls(table.num_rows, type=pa.int64()).fill_null(0)
        )
        cols[META_DELETED] = (
            table[META_DELETED]
            if META_DELETED in table.column_names
            else pa.array(np.zeros(table.num_rows, dtype=bool))
        )
        cols[META_MASK] = (
            table[META_MASK]
            if META_MASK in table.column_names
            else pa.array(np.full(table.num_rows, -1, dtype=np.int64))
        )
    return pa.table(cols)


# ---------------------------------------------------------------------------
# the per-(partition, epoch) apply function (used via groupby.map_groups)
# ---------------------------------------------------------------------------

def make_applier(
    cfg: CdcConfig,
    epoch_ranges: list[tuple[int, int, int]],
    start_schema_json: list[list[str]],
) -> Callable[[pa.Table], pa.Table]:
    """Build the per-group apply function for one consumption cycle.

    ``epoch_ranges`` is ``[(epoch, lsn_lo, lsn_hi), ...]`` — a cycle may batch
    several epochs through ONE shuffle (one ``getWithoutAck`` serving several
    ack points); the group is split by lsn range so each epoch still gets its
    own delta file + fenced checkpoint, preserving per-epoch resume.
    """
    pk = cfg.pk_columns
    lake_dir = cfg.lake_dir
    hot_n = cfg.hot_key_top_n
    column_filter = cfg.column_filter
    if column_filter is not None and cfg.partial_updates:
        # META_MASK bits index the FULL schema; projecting columns away would
        # desynchronize them — combine the features only after re-mapping
        raise ValueError("column_filter cannot be combined with partial_updates")

    delta_codec = cfg.extras.get("delta_codec", "zstd")

    def apply_epoch(
        store: CheckpointStore,
        pid: int,
        epoch: int,
        group: pa.Table,
        schema: TableSchema,
        defer: list | None = None,
    ) -> dict:
        """Apply one epoch's slice for one partition; returns its checkpoint.
        Mutates ``schema`` (DDL replay carries into the next epoch slice)."""
        lsn_min = int(pc.min(group["lsn"]).as_py())
        lsn_max = int(pc.max(group["lsn"]).as_py())

        ops = group["op"].to_numpy(zero_copy_only=False)
        # DDL replay (in lsn order) must evolve the schema even on the fenced
        # path so later epochs in this cycle start from the right schema
        n_ddl = 0
        ddl_rows = group.filter(pa.array(ops == "DDL"))
        if ddl_rows.num_rows:
            ddl_rows = ddl_rows.take(
                pc.sort_indices(ddl_rows, sort_keys=[("lsn", "ascending")])
            )
        for sql in ddl_rows["ddl_sql"].to_pylist():
            schema.apply(sql)
            n_ddl += 1
        if not cfg.partial_updates and any(
            s.dropped or s.aliases for s in schema.slots()
        ):
            # post-rename/drop full images are no longer positional prefixes;
            # they need the deep image classification + column-wise fold that
            # partial_updates enables — refuse loudly instead of silently
            # materializing values against the wrong slots
            raise ValueError(
                "log contains RENAME/DROP COLUMN DDL; this stream requires "
                "CdcConfig.partial_updates=True"
            )
        # TRUNCATE: every event (and all prior lake state) before its lsn dies.
        # In-epoch we drop superseded events here; cross-epoch the cut is
        # carried as delta-file metadata applied at merge time.
        truncate_lsn = 0
        tr = ops == "TRUNCATE"
        if tr.any():
            lsn_np = group["lsn"].to_numpy()
            truncate_lsn = int(lsn_np[tr].max())

        # ---- offset fencing ---------------------------------------------
        existing = store.read_partition(pid, epoch)
        delta_path = os.path.join(
            partition_dir(lake_dir, pid), f"delta_e{epoch:05d}.parquet"
        )
        if (
            existing is not None
            and existing.get("epoch") == epoch
            and existing.get("lsn_max") == lsn_max
            and (existing.get("delta_rows", 0) == 0 or os.path.exists(delta_path))
        ):
            existing["skipped"] = True
            return existing

        lsn_all = group["lsn"].to_numpy()
        dml_mask = (ops != "DDL") & (ops != "DCL") & ~tr
        if truncate_lsn:
            dml_mask &= lsn_all > truncate_lsn
        counts = pd.Series(ops[dml_mask]).value_counts()

        # ---- epoch-level LWW on NARROW columns, then materialize only the
        # surviving rows (wide content never copied for superseded events) --
        repo_all = group["pk_repo"].to_numpy(zero_copy_only=False)
        path_all = group["pk_path"].to_numpy(zero_copy_only=False)

        def _survivor_indices(exclude_lsns: set[int] | None = None) -> np.ndarray:
            idx = np.flatnonzero(dml_mask)
            if exclude_lsns:
                idx = idx[~np.isin(lsn_all[idx], list(exclude_lsns))]
            order = np.argsort(lsn_all[idx], kind="stable")
            df = pd.DataFrame({"r": repo_all[idx[order]], "p": path_all[idx[order]]})
            last = ~df.duplicated(keep="last").to_numpy()
            return idx[order][last]  # lsn-ascending, one per key

        if cfg.partial_updates:
            # patches present: no pre-reduction is sound — materialize all
            # events and fold column-wise per key (poison rows are simply
            # excluded by materialize; 'never existed' holds directly)
            dml = group.filter(pa.array(dml_mask))
            typed, poison = materialize_images(dml, schema, pk, allow_patches=True)
            if poison is not None:
                _atomic_write_parquet(
                    poison,
                    os.path.join(
                        lake_dir, "_quarantine", f"p{pid:05d}_e{epoch:05d}.parquet"
                    ),
                )
            delta = fold_rows(typed, pk, terminal=False)
            delta = delta.take(
                pc.sort_indices(delta, sort_keys=[(META_LSN, "ascending")])
            )
        else:
            import time as _time

            _t = _time.perf_counter()
            dml = group.take(pa.array(_survivor_indices()))
            _prof("lww", _t)
            _t = _time.perf_counter()
            typed, poison = materialize_images(dml, schema, pk, allow_patches=False)
            _prof("mat", _t)
            # rare path: a poison event won the LWW. Semantics: the poison
            # event never existed (quarantined) — redo the LWW without it so
            # the key's previous event wins; repeat while winners are poison.
            all_poison: list[pa.Table] = []
            bad_lsns: set[int] = set()
            while poison is not None:
                all_poison.append(poison)
                bad_lsns.update(poison["lsn"].to_pylist())
                dml = group.take(pa.array(_survivor_indices(bad_lsns)))
                typed, poison = materialize_images(dml, schema, pk, allow_patches=False)
            if all_poison:
                qpath = os.path.join(
                    lake_dir, "_quarantine", f"p{pid:05d}_e{epoch:05d}.parquet"
                )
                _atomic_write_parquet(pa.concat_tables(all_poison), qpath)
            poison = pa.concat_tables(all_poison) if all_poison else None
            # one row per key; materialize_images groups rows by image WIDTH
            # (DELETEs, pre/post-DDL images) so the file is NOT lsn-ordered —
            # deliberate: re-sorting would copy the full payload once more
            # per epoch, and every consumer (merge, fold, LWW) orders by the
            # _lsn column anyway. The delta contract is "one row per key,
            # _lsn present", not a physical sort order.
            delta = typed
        if column_filter is not None:
            keep = [c for c in schema.names() if c in set(column_filter) | set(pk)]
            delta = delta.select(keep + [META_LSN, META_DELETED, META_MASK])

        delta_rows = delta.num_rows
        if delta_rows or truncate_lsn:
            import time as _time

            _t = _time.perf_counter()
            if truncate_lsn:
                meta = dict(delta.schema.metadata or {})
                meta[b"truncate_lsn"] = str(truncate_lsn).encode()
                delta = delta.replace_schema_metadata(meta)
            _atomic_write_parquet(
                delta, delta_path, fsync=defer is None, compression=delta_codec
            )
            if defer is not None:
                defer["paths"].append(delta_path)
                defer["dirs"].add(os.path.dirname(delta_path))
            _prof("write", _t)

        # ---- lineage: hot-key counters (repo level, pre-compaction) ------
        hot: dict[str, int] = {}
        if dml_mask.any():
            vc = pd.Series(repo_all[dml_mask]).value_counts()
            hot = {str(k): int(v) for k, v in vc.head(hot_n).items()}

        ckpt = {
            "partition_id": pid,
            "epoch": epoch,
            "events": int(group.num_rows),
            "inserts": int(counts.get("INSERT", 0)),
            "updates": int(counts.get("UPDATE", 0)),
            "deletes": int(counts.get("DELETE", 0)),
            "ddls": n_ddl,
            "truncate_lsn": truncate_lsn,
            "poison": int(poison.num_rows) if poison is not None else 0,
            "delta_rows": int(delta_rows),
            "lsn_min": lsn_min,
            "lsn_max": lsn_max,
            "schema": schema.to_json(),
            "schema_fingerprint": schema.fingerprint(),
            "hot_keys": hot,
            "skipped": False,
        }
        if defer is None:
            store.write_partition(pid, epoch, ckpt)
        else:
            # checkpoint write happens only after the cycle-batched fsync of
            # every delta file (apply_group) — same durability ordering, one
            # device sync pass per task instead of two per epoch
            defer["ckpts"].append((pid, epoch, ckpt))
        return ckpt

    def apply_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return SUMMARY_SCHEMA.empty_table()
        pid = int(group["partition_id"][0].as_py())
        store = CheckpointStore(lake_dir)
        # no whole-group sort: epoch slicing and LWW run on narrow columns;
        # only survivors are ever copied at full width (apply_epoch)
        lsns = group["lsn"].to_numpy()

        schema = TableSchema.from_json(start_schema_json)
        out = []
        defer: dict = {"paths": [], "dirs": set(), "ckpts": []}
        for epoch, lo, hi in epoch_ranges:
            mask = (lsns >= lo) & (lsns <= hi)
            if not mask.any():
                continue
            sub = group.filter(pa.array(mask))
            out.append(_summary_row(apply_epoch(store, pid, epoch, sub, schema, defer)))
        # one batched device sync for the whole cycle's deltas, THEN the
        # checkpoints — "checkpoint durable => delta durable" holds by order
        import time as _time

        _t = _time.perf_counter()
        _fsync_paths(defer["paths"], defer["dirs"])
        for pid_, epoch_, ckpt_ in defer["ckpts"]:
            store.write_partition(pid_, epoch_, ckpt_)
        _prof("sync", _t)
        if not out:
            return SUMMARY_SCHEMA.empty_table()
        return pa.concat_tables(out)

    return apply_group


def _summary_row(ckpt: dict) -> pa.Table:
    import json

    return pa.table(
        {
            "partition_id": pa.array([ckpt["partition_id"]], type=pa.int32()),
            "epoch": pa.array([ckpt["epoch"]], type=pa.int64()),
            "events": pa.array([ckpt["events"]], type=pa.int64()),
            "delta_rows": pa.array([ckpt.get("delta_rows", 0)], type=pa.int64()),
            "poison": pa.array([ckpt.get("poison", 0)], type=pa.int64()),
            "ddls": pa.array([ckpt.get("ddls", 0)], type=pa.int64()),
            "lsn_min": pa.array([ckpt["lsn_min"]], type=pa.int64()),
            "lsn_max": pa.array([ckpt["lsn_max"]], type=pa.int64()),
            "schema_json": pa.array([json.dumps(ckpt["schema"])], type=pa.string()),
            "schema_fingerprint": pa.array([ckpt["schema_fingerprint"]], type=pa.string()),
            "skipped": pa.array([bool(ckpt.get("skipped", False))]),
        },
        schema=SUMMARY_SCHEMA,
    )


# ---------------------------------------------------------------------------
# lake read / compaction (merge-on-read; per-partition parallel tasks)
# ---------------------------------------------------------------------------

def lake_partition_dirs(lake_dir: str) -> list[str]:
    if not os.path.isdir(lake_dir):
        return []
    return sorted(
        os.path.join(lake_dir, d)
        for d in os.listdir(lake_dir)
        if d.startswith("p") and os.path.isdir(os.path.join(lake_dir, d))
    )


def compacted_through(lake_dir: str) -> int:
    """Max compaction watermark across partitions (-1 if never compacted).

    Incremental consumers (derived tables, the ANN index follower) compare
    this with their cursor: a watermark PAST the cursor means the deltas
    that define "changes since the cursor" were folded into base and a
    partition diff would silently miss them."""
    from canal_ray.checkpoint import read_json

    hi = -1
    for d in lake_partition_dirs(lake_dir):
        m = read_json(os.path.join(d, "compacted_through.json"))
        if m:
            hi = max(hi, int(m["epoch"]))
    return hi


def merge_partition(
    part_dir: str,
    schema: TableSchema,
    pk: tuple[str, str],
    up_to_epoch: int | None = None,
    extra_paths: list[str] | None = None,
) -> pa.Table:
    """LWW-merge base + deltas of one partition -> live rows (payload + _lsn).

    ``up_to_epoch`` restricts the merge to deltas of epochs <= the cutoff —
    the state *as of* that ack point (used by incremental derived-table
    maintenance and point-in-time reads). Only meaningful while those deltas
    still exist: compaction folds deltas into base, so derived tables and
    as-of reads must be brought current / bounded before compacting.

    ``extra_paths`` merges additional delta-shaped parquet files (the
    point-in-time tail slice of ``CdcJob.state_as_of``) alongside the
    partition's own files; their ``truncate_lsn`` metadata participates
    identically.
    """
    files = sorted(os.listdir(part_dir)) if os.path.isdir(part_dir) else []
    tables = []
    truncate_lsn = 0
    paths = []
    for name in files:
        if name.startswith("delta_e") and name.endswith(".parquet"):
            # name = f"delta_e{epoch:05d}.parquet"; parse ALL digits (epochs
            # past 99999 widen the field — a fixed 5-char slice mis-parses)
            if up_to_epoch is not None and int(name[7:-8]) > up_to_epoch:
                continue
        elif name != "base.parquet":
            continue
        paths.append(os.path.join(part_dir, name))
    paths.extend(extra_paths or [])
    for path in paths:
        t = pq.read_table(path)
        md = t.schema.metadata or {}
        if b"truncate_lsn" in md:
            truncate_lsn = max(truncate_lsn, int(md[b"truncate_lsn"]))
        tables.append(conform(t, schema, with_meta=True))
    if not tables:
        return conform(schema.to_arrow().empty_table(), schema, with_meta=True)
    merged = pa.concat_tables(tables, promote_options="permissive")
    if truncate_lsn:
        merged = merged.filter(pc.greater(merged[META_LSN], truncate_lsn))
    m = merged[META_MASK].to_numpy()
    if ((m != -1) & (m != 0)).any():  # patches present -> column-wise fold
        merged = fold_rows(merged, pk, terminal=True)
    else:
        merged = lww_compact(merged, pk)
    live = merged.filter(pc.invert(merged[META_DELETED]))
    drop = [META_DELETED, META_MASK] + [
        s.name for s in schema.slots() if s.dropped
    ]
    return live.drop_columns(drop)


class LakeMerger:
    """``map_batches`` callable: one input row = one partition dir to merge."""

    def __init__(self, schema_json: list[list[str]], pk: tuple[str, str], keep_lsn: bool = False):
        self.schema = TableSchema.from_json(schema_json)
        self.pk = pk
        self.keep_lsn = keep_lsn

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for part_dir in batch["part_dir"].to_pylist():
            t = merge_partition(part_dir, self.schema, self.pk)
            outs.append(t if self.keep_lsn else t.drop_columns([META_LSN]))
        return pa.concat_tables(outs)


# ---------------------------------------------------------------------------
# point-in-time reads — the DATA half of DatabaseTableMeta.rollback(position)
# (tsdb/DatabaseTableMeta.java:161-181 rebuilds SCHEMA as of any position;
# CdcJob.state_as_of pairs it with this machinery to rebuild STATE)
# ---------------------------------------------------------------------------

ASOF_SUMMARY_SCHEMA = pa.schema(
    [pa.field("partition_id", pa.int32()), pa.field("rows", pa.int64())]
)


def make_asof_tail_writer(
    scratch_dir: str,
    schema_json: list[list[str]],
    pk: tuple[str, str],
    partial: bool,
) -> Callable[[pa.Table], pa.Table]:
    """``map_groups`` fn over decoded tail events grouped by partition_id:
    materializes the (ack-point, target-lsn] slice into ONE delta-shaped
    scratch parquet per partition, which ``AsOfLakeMerger`` merges alongside
    the partition's acked deltas. ``schema_json`` is the slot model as of the
    TARGET position (older/shorter images materialize by the prefix
    invariant; tail DDL is already folded into it by ``tsdb.schema_as_of``).
    Tail poison rows are excluded ('never existed'), not re-quarantined."""

    def write_tail(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return ASOF_SUMMARY_SCHEMA.empty_table()
        pid = int(group["partition_id"][0].as_py())
        schema = TableSchema.from_json(schema_json)
        ops = group["op"].to_numpy(zero_copy_only=False)
        lsn_all = group["lsn"].to_numpy()
        truncate_lsn = 0
        tr = ops == "TRUNCATE"
        if tr.any():
            truncate_lsn = int(lsn_all[tr].max())
        dml_mask = (ops != "DDL") & (ops != "DCL") & ~tr
        if truncate_lsn:
            dml_mask &= lsn_all > truncate_lsn
        dml = group.filter(pa.array(dml_mask))
        typed, _poison = materialize_images(dml, schema, pk, allow_patches=partial)
        delta = fold_rows(typed, pk, terminal=False) if partial else typed
        if truncate_lsn:
            meta = dict(delta.schema.metadata or {})
            meta[b"truncate_lsn"] = str(truncate_lsn).encode()
            delta = delta.replace_schema_metadata(meta)
        _atomic_write_parquet(
            delta, os.path.join(scratch_dir, f"p{pid:05d}.parquet"), fsync=False
        )
        return pa.table(
            {
                "partition_id": pa.array([pid], type=pa.int32()),
                "rows": pa.array([delta.num_rows], type=pa.int64()),
            },
            schema=ASOF_SUMMARY_SCHEMA,
        )

    return write_tail


class AsOfLakeMerger:
    """``map_batches`` callable: one input row = one partition id, merged as
    of a target position — acked deltas <= the cut epoch + the scratch tail
    slice, conformed to the as-of slot model (renames resolve through
    aliases; columns dropped after the target are still live)."""

    def __init__(
        self,
        lake_dir: str,
        schema_json: list[list[str]],
        pk: tuple[str, str],
        up_to_epoch: int,
        scratch_dir: str,
    ):
        self.lake_dir = lake_dir
        self.schema = TableSchema.from_json(schema_json)
        self.pk = pk
        self.up_to_epoch = up_to_epoch
        self.scratch_dir = scratch_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for pid in batch["partition_id"].to_pylist():
            extra = os.path.join(self.scratch_dir, f"p{int(pid):05d}.parquet")
            t = merge_partition(
                partition_dir(self.lake_dir, int(pid)),
                self.schema,
                self.pk,
                up_to_epoch=self.up_to_epoch,
                extra_paths=[extra] if os.path.exists(extra) else None,
            )
            outs.append(t.drop_columns([META_LSN]))
        return pa.concat_tables(outs)


class LakeCompactor:
    """``map_batches`` callable: fold each partition's deltas into base.parquet.

    Idempotent and crash-safe: base is replaced atomically before deltas are
    unlinked; re-merging an already-folded delta changes nothing (same keys,
    same max lsn).
    """

    def __init__(self, schema_json: list[list[str]], pk: tuple[str, str]):
        self.schema = TableSchema.from_json(schema_json)
        self.pk = pk

    def __call__(self, batch: pa.Table) -> pa.Table:
        from canal_ray.checkpoint import atomic_write_json, read_json

        rows = []
        for part_dir in batch["part_dir"].to_pylist():
            # snapshot the delta list BEFORE merging and unlink exactly those
            # files: a delta landing between the merge and a fresh listing
            # (concurrent tail/follow writer) must never be deleted unfolded
            folded = [
                name
                for name in sorted(os.listdir(part_dir))
                if name.startswith("delta_e") and name.endswith(".parquet")
            ]
            live = merge_partition(part_dir, self.schema, self.pk)
            _atomic_write_parquet(live, os.path.join(part_dir, "base.parquet"))
            # compaction WATERMARK (written before the unlinks: a crash
            # between marker and unlink over-claims, which is the safe
            # direction — consumers fall back to recompute/rebuild): the
            # max epoch folded into base. Incremental consumers
            # (DerivedTable, IvfIndexFollower) whose cursor is older than
            # this can no longer diff — the deltas defining "as of the
            # cursor" are gone — and must detect it instead of silently
            # missing changes.
            if folded:
                hi = max(int(n[7:-8]) for n in folded)
                marker_path = os.path.join(part_dir, "compacted_through.json")
                prev = read_json(marker_path)
                prev_hi = int(prev["epoch"]) if prev else -1
                atomic_write_json(marker_path, {"epoch": max(hi, prev_hi)})
            for name in folded:
                os.unlink(os.path.join(part_dir, name))
            rows.append({"part_dir": part_dir, "rows": live.num_rows, "deltas_folded": len(folded)})
        return pa.table(
            {
                "part_dir": pa.array([r["part_dir"] for r in rows]),
                "rows": pa.array([r["rows"] for r in rows], type=pa.int64()),
                "deltas_folded": pa.array([r["deltas_folded"] for r in rows], type=pa.int64()),
            }
        )

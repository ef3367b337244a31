"""Stateless decode / filter / route stage — the LogEventConvert analog.

One vectorized ``map_batches`` function (zero-copy Arrow in/out) that performs,
per batch, what the reference does per event in its parse stage:

  - subscribe-filter by ``schema.table`` regex whitelist + blacklist
    (``filter/.../aviater/AviaterRegexFilter.java:57-72``; applied at parse
    time as in ``parse/.../dbsync/LogEventConvert.java:466-473``)
  - DML-class filters (``MysqlMultiStageCoprocessor.java:74-76``)
  - within-batch LWW pre-compaction: superseded events for the same PK are
    dropped before the shuffle (a combiner; Canal has no analog because its
    sink applies every event — this is the "pre-aggregate before groupby"
    scale optimization, cuts shuffle bytes for hot keys)
  - per-row partition routing by PK hash (``MQMessageUtils.java:252-347``)
  - DDL replication to every partition (Canal: partition 0 only — see
    ``canal_ray.partition`` docstring for why we differ)

The decode stage does NOT materialize typed payload columns — values stay in
Canal's stringly ``vals`` transport until the sink applies them against the
DDL-evolved schema (``canal_ray.sink``), so the stage's output schema is
stable for the whole stream even across DDL.

Shuffle-byte discipline: the decode output drops everything the sink doesn't
need. In particular the per-row ``cols`` name list (as many bytes as the data
itself in flight) collapses to ``img_len`` — under additive-only evolution a
row's column set is exactly ``schema.names()[:img_len]`` (the prefix
invariant), so the names never need to travel.
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from canal_ray.config import CdcConfig
from canal_ray.partition import ids_from_words, key_hash_words

# the log columns decode actually consumes — readers prune to exactly these
# (segment/gtid/execute_time are footer-stat / checkpoint concerns and must
# never ride through the decode chain: at 10^10 events every unread byte of
# parquet decode + memory traffic counts)
DECODE_INPUT_COLUMNS = [
    "lsn", "txn_id", "op", "schema_name", "table_name",
    "pk_repo", "pk_path", "cols", "vals", "ddl_sql",
]

# post-decode wire format (what the one shuffle actually moves).
# patch_cols is null for full images (their column set is the schema prefix
# identified by img_len) and carries the column-name list ONLY for minimal
# row images (patches), whose column sets are arbitrary.
DECODED_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("pk_repo", pa.string()),
        pa.field("pk_path", pa.string()),
        pa.field("vals", pa.list_(pa.string())),
        pa.field("ddl_sql", pa.string()),
        pa.field("img_len", pa.int32()),
        pa.field("patch_cols", pa.list_(pa.string())),
        pa.field("partition_id", pa.int32()),
    ]
)


def _project(batch: pa.Table, init_names: list[str], deep_check: bool) -> pa.Table:
    img_len = pc.fill_null(pc.list_value_length(batch["vals"]), 0)
    carr = batch["cols"].combine_chunks()
    valid = pc.is_valid(carr).to_numpy(zero_copy_only=False)
    if valid.any():
        off = carr.offsets.to_numpy(zero_copy_only=False)[:-1]
        lengths = pc.fill_null(pc.list_value_length(carr), 0).to_numpy(
            zero_copy_only=False
        )
        present = valid & (lengths > 0)
        # full image <=> cols is a positional prefix of the schema column
        # order. ``deep_check`` (on when the stream can carry minimal row
        # images, cfg.partial_updates) verifies EVERY overlapping position
        # against the initial-schema names — a minimal image that happens to
        # lead with the PK must not be materialized positionally (ADVICE r1).
        # Without the flag (additive full-image streams), only the first
        # position is checked — ~5x cheaper on the hot path — and any
        # mis-shapen row still fails LOUDLY downstream: patch-classified rows
        # make the sink raise when partial_updates is unset. Positions beyond
        # the initial schema are DDL-added and unverifiable at decode time
        # (Canal's Column list has the same ambiguity absent updated-flags);
        # the sink's patch path handles PK-bearing column sets correctly.
        is_full = present.copy()
        n_check = len(init_names) if deep_check else 1
        for j, name in enumerate(init_names[:n_check]):
            chk = is_full & (lengths > j)
            if not chk.any():
                break
            nm = carr.values.take(pa.array(np.where(chk, off + j, 0)))
            eq = pc.equal(nm, pa.scalar(name)).to_numpy(zero_copy_only=False)
            is_full &= ~(chk & ~eq)
        is_patch = present & ~is_full
        patch_cols = pc.if_else(
            pa.array(is_patch), carr, pa.nulls(len(carr), type=carr.type)
        )
    else:
        patch_cols = pa.nulls(batch.num_rows, type=pa.list_(pa.string()))
    return pa.table(
        {
            "lsn": batch["lsn"],
            "op": batch["op"],
            "pk_repo": batch["pk_repo"],
            "pk_path": batch["pk_path"],
            "vals": batch["vals"],
            "ddl_sql": batch["ddl_sql"],
            "img_len": pc.cast(img_len, pa.int32()),
            "patch_cols": patch_cols,
            "partition_id": batch["partition_id"],
        },
        schema=DECODED_SCHEMA,
    )


def make_decoder(
    cfg: CdcConfig,
    precompact: bool = True,
    lsn_window: tuple[int, int] | None = None,
    epoch_his: list[int] | None = None,
    xa_rollback: "np.ndarray | None" = None,
) -> Callable[[pa.Table], pa.Table]:
    """Build the per-batch decode function (a closure; compiled regexes are
    captured once — cheap enough for stateless tasks, no actor needed).

    ``precompact=False`` disables the within-batch LWW combiner: the sink
    path wants it (fewer bytes through the shuffle, same final state), but a
    protocol consumer (``canal_ray.connector``) must see EVERY event exactly
    as Canal delivers them — and the combiner's effect depends on batch
    boundaries, which a consumer-visible stream must not.

    ``lsn_window=(lo, hi)`` drops every row outside the window BEFORE any
    other processing. Required for txn-aligned cycles, which re-read an
    overlap segment (rows below ``lo`` were applied by the previous cycle)
    and defer an incomplete tail txn (rows above ``hi`` belong to the next
    cycle — without the window, pre-compaction could let a deferred event
    suppress an in-window event, corrupting the per-ack-point state).

    ``epoch_his`` (sorted upper lsn bounds of the cycle's epochs) scopes the
    LWW pre-compaction WITHIN epochs: a cycle batches several ack points
    through one pipeline, and a decode batch can straddle an epoch boundary —
    letting a later-epoch event suppress an earlier-epoch one would leave
    that epoch's delta missing the key, so a merge-as-of that ack point
    (derived tables, point-in-time reads) would show stale state. The final
    state is unaffected either way; the per-ack-point contract is not.

    ``xa_rollback`` (sorted txn_ids with an XAROLLBACK terminal marker —
    ``canal_ray.pipeline.xa_rollback_txns`` scans them from segment footers)
    drops every DML row of those transactions: an XA-rolled-back txn's rows
    must never reach the lake (EventType.XACOMMIT/XAROLLBACK,
    EntryProtocol.proto:202-222). The terminal markers themselves are
    txn-scoped meta like heartbeats and never route to a partition."""
    white = re.compile(cfg.table_filter, re.IGNORECASE) if cfg.table_filter else None
    black = (
        re.compile(cfg.table_black_filter, re.IGNORECASE)
        if cfg.table_black_filter
        else None
    )
    num_partitions = cfg.num_partitions
    init_names = [n for n, _ in cfg.initial_schema]
    row_pred = None
    if cfg.row_filter:
        from canal_ray.rowfilter import compile_predicate

        row_pred = compile_predicate(cfg.row_filter, cfg.pk_columns)
    drop_ops = set()
    if cfg.filter_dml_insert:
        drop_ops.add("INSERT")
    if cfg.filter_dml_update:
        drop_ops.add("UPDATE")
    if cfg.filter_dml_delete:
        drop_ops.add("DELETE")
    if cfg.filter_ddl:
        # TRUNCATE is a query/DDL-class event (EventType.TRUNCATE via
        # parseQueryEvent) — filterQueryDdl suppresses it too; leaving it
        # through would let the one destructive event class past the filter
        drop_ops.add("DDL")
        drop_ops.add("TRUNCATE")
    if cfg.filter_query_dcl:
        # filterQueryDcl (LogEventConvert.java:383): DCL query entries
        # (GRANT/REVOKE) dropped at parse; else they pass as meta entries
        drop_ops.add("DCL")

    def decode(batch: pa.Table) -> pa.Table:
        """Single-copy decode: every mask is computed on the narrow columns
        (lsn, op, pk) and the wide table (content payloads) is filtered
        exactly once — copies of the payload bytes are what a decode stage
        spends its time on at 100 TB."""
        n = batch.num_rows
        if n == 0:
            return DECODED_SCHEMA.empty_table()
        if lsn_window is not None:
            lsn_np = batch["lsn"].to_numpy()
            in_win = (lsn_np >= lsn_window[0]) & (lsn_np <= lsn_window[1])
            if not in_win.all():
                if not in_win.any():
                    return DECODED_SCHEMA.empty_table()
                batch = batch.filter(pa.array(in_win))
                n = batch.num_rows
        # --- subscribe filter (schema.table regex, lowercased like Canal) ---
        # dictionary-encode schema and table separately, then classify only
        # the distinct (schema, table) pairs (a handful) — no per-row string
        # lowering/joining on the hot path
        # null identities fill to "" BEFORE dictionary-encoding: a null
        # dictionary index round-trips through numpy as NaN and the int cast
        # would produce a garbage index into pair_keep (IndexError)
        d_s = pc.dictionary_encode(
            pc.fill_null(batch["schema_name"], "")
        ).combine_chunks()
        d_t = pc.dictionary_encode(
            pc.fill_null(batch["table_name"], "")
        ).combine_chunks()
        s_uniq = d_s.dictionary.to_pylist()
        t_uniq = d_t.dictionary.to_pylist()
        cs = d_s.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ct = d_t.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pair_keep = np.ones((len(s_uniq), max(1, len(t_uniq))), dtype=bool)
        for i, s in enumerate(s_uniq):
            for j, t in enumerate(t_uniq):
                ident = f"{s}.{t}".lower()
                ok = True
                if white is not None:
                    ok = white.fullmatch(ident) is not None
                if ok and black is not None:
                    ok = black.fullmatch(ident) is None
                pair_keep[i, j] = ok
        keep = pair_keep[cs, ct]
        # op classes via dictionary codes (object-array compares are slow)
        d_op = pc.dictionary_encode(batch["op"]).combine_chunks()
        op_uniq = d_op.dictionary.to_pylist()
        op_codes = d_op.indices.to_numpy(zero_copy_only=False)

        def op_mask(*names: str) -> np.ndarray:
            want = [i for i, u in enumerate(op_uniq) if u in names]
            if not want:
                return np.zeros(n, dtype=bool)
            return np.isin(op_codes, want)

        if drop_ops:
            keep &= ~op_mask(*drop_ops)

        # DDL and TRUNCATE replicate to every partition (each sink owns table
        # shards; Canal sends them to partition 0 only — see canal_ray.partition).
        # Unfiltered DCL rides the same meta path (sink applies no effect).
        is_ddl = op_mask("DDL", "TRUNCATE", "DCL") & keep
        dml_keep = keep & ~is_ddl & ~op_mask("MHEARTBEAT", "XACOMMIT", "XAROLLBACK")
        if xa_rollback is not None and len(xa_rollback) and dml_keep.any():
            # rolled-back XA transactions: their rows never commit
            dml_keep &= ~np.isin(batch["txn_id"].to_numpy(), xa_rollback)

        # --- row-level content predicate (DML rows only — meta entries are
        # exempt, like the reference applying the EL filter to ROWDATA).
        # Evaluated over the whole batch so the payload is never copied just
        # to evaluate the filter; the kernels touch only referenced columns.
        if row_pred is not None and dml_keep.any():
            dml_keep &= row_pred(batch)

        # --- within-batch LWW pre-compaction (keep max-lsn per key), as a
        # mask over original positions: no payload movement yet. Key identity
        # and partition routing share ONE hashing pass (128-bit words). ---
        pid = np.full(n, -1, dtype=np.int32)
        idx = np.flatnonzero(dml_keep)
        if idx.size:
            repo = batch["pk_repo"].to_numpy(zero_copy_only=False)[idx]
            path = batch["pk_path"].to_numpy(zero_copy_only=False)[idx]
            h1, h2 = key_hash_words(repo, path)
            pid[idx] = ids_from_words(h1, h2, num_partitions)
            if precompact and not cfg.partial_updates:
                # LWW pre-compaction is only sound for full row images: a
                # later patch does not supersede an earlier full image.
                # Compaction never crosses an EPOCH boundary (see docstring).
                lsn = batch["lsn"].to_numpy()[idx]
                if epoch_his is not None:
                    bucket = np.searchsorted(
                        np.asarray(epoch_his, dtype=np.int64), lsn
                    )
                else:
                    bucket = np.zeros(idx.size, dtype=np.int64)
                order = np.lexsort((lsn, bucket, h2, h1))
                sh1, sh2, sb = h1[order], h2[order], bucket[order]
                last = np.empty(order.size, dtype=bool)
                last[-1] = True
                if order.size > 1:
                    last[:-1] = (
                        (sh1[1:] != sh1[:-1])
                        | (sh2[1:] != sh2[:-1])
                        | (sb[1:] != sb[:-1])
                    )
                dml_keep[idx[order[~last]]] = False

        out = []
        if dml_keep.any():
            # ONE take both filters and GROUPS BY PARTITION (stable: rows of
            # a partition stay in log order) — the scatter stage detects the
            # non-decreasing partition_id run and slices record batches with
            # zero additional payload copy, halving the chain's memory
            # traffic vs filter-here + sort-there
            keep_idx = np.flatnonzero(dml_keep)
            order = keep_idx[np.argsort(pid[keep_idx], kind="stable")]
            dml = batch.take(pa.array(order))  # the ONE payload copy
            out.append(
                dml.append_column(
                    "partition_id", pa.array(pid[order], type=pa.int32())
                )
            )
        if is_ddl.any():
            ddl = batch.filter(pa.array(is_ddl))  # tiny
            for j in range(num_partitions):
                out.append(
                    ddl.append_column(
                        "partition_id",
                        pa.array(np.full(ddl.num_rows, j, dtype=np.int32)),
                    )
                )
        if not out:
            return DECODED_SCHEMA.empty_table()
        decoded = _project(pa.concat_tables(out), init_names, cfg.partial_updates)
        if cfg.handlers:
            from canal_ray.handlers import apply_before

            decoded = apply_before(cfg.handlers, decoded)
            if decoded.schema != DECODED_SCHEMA:
                raise ValueError(
                    "a before() handler changed the decoded wire schema; "
                    "handlers must preserve canal_ray.decode.DECODED_SCHEMA"
                )
        return decoded

    return decode

"""External consumer API: subscribe / getWithoutAck / ack / rollback.

The reference's primary product surface is the client protocol served by
``server/embedded/CanalServerWithEmbedded.java:350-464`` and consumed by the
adapter loop ``client-adapter/.../AdapterProcessor.java:162-241``:

    connector.subscribe(filter)
    while True:
        msg = connector.getWithoutAck(batchSize)
        try:    process(msg); connector.ack(msg.id)
        except: connector.rollback(msg.id)

This module is that protocol over the engine's log: a *client cursor* (last
acked epoch, per client id) is durably stored next to the lake, a batch is
one or more epochs of DECODED events (the same filtered wire format the sink
consumes), and rollback/crash simply re-delivers from the cursor — at-least-
once delivery that a PK-idempotent consumer turns into exactly-once effect,
exactly the reference's contract (``RdbSyncService.java:284-291``).

Epoch chunking matches ``CdcJob.plan`` (``epoch_segments`` files per ack
point), but the connector keeps its OWN cursor: many independent clients can
trail the same log at different positions (Canal: one meta cursor per client
destination, ``meta/.../FileMixedMetaManager.java``).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pyarrow as pa

import ray.data

from canal_ray.checkpoint import atomic_write_json, read_json
from canal_ray.config import CdcConfig
from canal_ray.decode import DECODE_INPUT_COLUMNS, make_decoder


class CdcConnector:
    """One client's cursor over one binlog directory.

    ``window`` allows up to k outstanding (delivered, un-acked) batches with
    strictly in-order ack — the reference's per-client in-flight batch map
    (``CanalServerWithEmbedded.java:350-464`` keeps a ``batches`` map and
    acks advance the cursor batch-by-batch). Out-of-order ack raises.
    """

    def __init__(self, cfg: CdcConfig, client_id: str = "default", window: int = 1):
        self.cfg = cfg
        self.client_id = client_id
        self.window = max(1, int(window))
        self._cursor_path = os.path.join(
            cfg.lake_dir, "_clients", f"{client_id}.json"
        )
        # no pre-compaction: a protocol client sees every event (Canal
        # delivers the full change stream; the combiner is a sink-side
        # optimization whose effect depends on batch boundaries)
        self._decoder = make_decoder(cfg, precompact=False)
        # FIFO of in-flight batches: (batch_id, [(epoch, segment_paths)],
        # consumed-file watermark BEFORE this batch — pinned at get time so
        # ack never re-derives it from a listing that may have grown (a
        # fresh listing could over-advance past never-delivered files in the
        # legacy-cursor migration path)
        self._outstanding: list[tuple[int, list, int]] = []
        self._next_batch_id = 1

    # ------------------------------------------------------------ protocol
    def subscribe(self) -> None:
        """Idempistent registration: materializes the cursor file (epoch -1 =
        nothing consumed) — the subscribe(filter) analog; the filter itself
        lives in ``cfg.table_filter`` and is applied at decode."""
        if read_json(self._cursor_path) is None:
            atomic_write_json(self._cursor_path, {"acked_epoch": -1})

    def acked_epoch(self) -> int:
        obj = read_json(self._cursor_path)
        return int(obj["acked_epoch"]) if obj else -1

    def _consumed_files(self, obj: dict, n_present: int) -> int:
        """Consumed-file watermark from the cursor, migrating older formats.

        Segment names are monotonically increasing (binlog rotation / the
        generator's ``segment_%05d``), so consumption is always a PREFIX of
        the sorted listing and one integer is the full pinning state — O(1)
        per ack instead of an ever-growing per-epoch history.

        Migrations (both at-least-once — re-delivery over loss):
          - interim format with ``epoch_segments``: watermark = total pinned;
          - legacy format (``acked_epoch`` only, pre-pinning): the acked
            partial epoch's true extent is unknowable, so assume the MINIMUM
            it could have held (one file) — files it actually held beyond
            that are re-delivered, never skipped.
        """
        if "consumed_files" in obj:
            return int(obj["consumed_files"])
        if "epoch_segments" in obj:
            return sum(len(v) for v in obj["epoch_segments"].values())
        a = int(obj.get("acked_epoch", -1))
        if a < 1:
            return 0
        k = max(1, self.cfg.epoch_segments)
        return min((a - 1) * k + 1, n_present)

    def _epochs(self) -> tuple[list[tuple[int, list[str]]], int]:
        """Un-delivered epoch plan, stable under tailing (CdcJob.plan
        contract): acked consumption is pinned by the durable watermark and
        in-flight consumption by the outstanding queue — segments appended
        later always chunk into NEW epochs, never into an already-delivered
        one (naive re-chunking would make the cursor silently skip them)."""
        from canal_ray.checkpoint import list_numbered

        segs = list_numbered(self.cfg.log_dir)
        obj = read_json(self._cursor_path) or {}
        if self._outstanding:
            _, last_pending, last_base = self._outstanding[-1]
            n_done = last_base + sum(len(s) for _, s in last_pending)
            e0 = last_pending[-1][0]
        else:
            n_done = self._consumed_files(obj, len(segs))
            e0 = max(int(obj.get("acked_epoch", -1)), 0)
        new = segs[n_done:]
        k = max(1, self.cfg.epoch_segments)
        return [(e0 + i // k + 1, new[i : i + k]) for i in range(0, len(new), k)], n_done

    def get_without_ack(self, epochs: int = 1) -> tuple[int, pa.Table] | None:
        """Next un-acked batch as (batch_id, decoded events table); None when
        the log is drained. Re-delivers the same epochs after a rollback or a
        crash without ack — the getWithoutAck redelivery contract.

        Up to ``window`` batches may be outstanding; one more get raises.
        """
        if len(self._outstanding) >= self.window:
            raise RuntimeError(
                f"{len(self._outstanding)} batches outstanding (window="
                f"{self.window}); ack or rollback first"
            )
        self.subscribe()
        plan, n_done = self._epochs()
        pending = plan[:epochs]
        if not pending:
            return None
        paths = [p for _, s in pending for p in s]

        def _dedup_meta(batch):
            # decode replicates DDL/TRUNCATE once per SINK partition (each
            # applier owns a shard); a protocol CLIENT must see each exactly
            # once (Canal delivers one DDL entry) — keep partition 0's copy
            import pyarrow as _pa
            import pyarrow.compute as pc

            keep = pc.or_(
                pc.invert(
                    pc.is_in(
                        batch["op"], value_set=_pa.array(["DDL", "TRUNCATE", "DCL"])
                    )
                ),
                pc.equal(batch["partition_id"], 0),
            )
            return batch.filter(keep)

        # rolled-back XA txns never reach a client (their terminal marker is
        # always inside the txn's own segment, hence inside this batch's
        # epochs); footer-stat pruned — zero cost on XA-free logs
        from canal_ray.pipeline import xa_rollback_txns

        xa_rb = xa_rollback_txns(paths)
        decoder = (
            make_decoder(self.cfg, precompact=False, xa_rollback=xa_rb)
            if len(xa_rb)
            else self._decoder
        )
        ds = ray.data.read_parquet(paths, columns=DECODE_INPUT_COLUMNS).map_batches(
            decoder, batch_format="pyarrow",
            batch_size=self.cfg.decode_batch_size,
        ).map_batches(_dedup_meta, batch_format="pyarrow")
        pieces = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
        if pieces:
            table = pa.concat_tables(pieces)
        else:
            from canal_ray.decode import DECODED_SCHEMA

            table = DECODED_SCHEMA.empty_table()
        batch_id = self._next_batch_id
        self._next_batch_id += 1
        self._outstanding.append((batch_id, pending, n_done))
        return batch_id, table

    def ack(self, batch_id: int) -> None:
        """Advance the durable cursor past the OLDEST outstanding batch:
        the epoch number plus the consumed-file watermark pinned at get time
        (immutable history, O(1)). Acks must be in-order — acking a younger
        batch while an older one is in flight raises (the reference's batch
        map enforces the same cursor monotonicity)."""
        if not self._outstanding:
            raise ValueError(f"no outstanding batch {batch_id}")
        head_id, pending, base = self._outstanding[0]
        if head_id != batch_id:
            known = [b for b, _, _ in self._outstanding]
            if batch_id in known:
                raise ValueError(
                    f"out-of-order ack: batch {batch_id} acked while "
                    f"batch {head_id} is still outstanding"
                )
            raise ValueError(f"no outstanding batch {batch_id}")
        atomic_write_json(
            self._cursor_path,
            {
                "acked_epoch": pending[-1][0],
                "consumed_files": base + sum(len(s) for _, s in pending),
            },
        )
        self._outstanding.pop(0)

    def rollback(self, batch_id: int | None = None) -> None:
        """Reset the get cursor to the ack cursor: ALL outstanding batches
        are forgotten and the next gets re-deliver them (the reference's
        rollback() semantics — ``MemoryEventStoreWithBuffer.java:521-530``
        resets the get sequence wholesale, not per batch)."""
        if batch_id is not None and batch_id not in [
            b for b, _, _ in self._outstanding
        ]:
            raise ValueError(f"no outstanding batch {batch_id}")
        self._outstanding = []

    # ------------------------------------------------------------ helpers
    def drain(self) -> Iterator[tuple[int, pa.Table]]:
        """get -> yield -> ack loop until the log is exhausted (the
        AdapterProcessor consume loop with auto-ack on successful yield)."""
        while True:
            got = self.get_without_ack()
            if got is None:
                return
            batch_id, table = got
            yield batch_id, table
            self.ack(batch_id)

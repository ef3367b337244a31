"""CdcJob — the end-to-end replay pipeline (one Canal "destination").

Dataflow per epoch (SURVEY.md §7.1), all Ray-Data-native::

    read_parquet(segment group)                      stateless read tasks
      -> map_batches(decode)                         filter/route/pre-compact (Arrow, zero-copy)
         -> groupby(partition_id).map_groups(apply)  THE one shuffle; per-partition
            LWW delta write + fenced checkpoint      sink apply (RdbSyncService analog)
      -> driver: epoch manifest (cursor advance)     ack (CanalServerWithEmbedded.ack analog)

Epochs are groups of log segments — the unit of consumption, the analog of
Canal's ``getWithoutAck(batchSize)`` / ``ack(batchId)`` protocol
(``server/embedded/CanalServerWithEmbedded.java:350-464``): an epoch manifest
is only written after every partition of the epoch has durably applied and
checkpointed, and resume restarts from the first epoch without a manifest.
Re-running a partially-complete epoch is safe — per-partition offset fencing
turns duplicate applies into no-ops (exactly-once *effect*).

Epoch 0 is the optional initial snapshot bootstrap — the analog of the
adapter ETL full load (``client-adapter/common/.../AbstractEtlService.java:30-120``):
base-table rows become lsn-0 INSERT images routed through the identical
decode→apply path.

The streaming executor pipelines read/decode/shuffle/apply within an epoch
with backpressure; nothing materializes the full epoch on the driver — the
driver only collects one summary row per partition.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from canal_ray.checkpoint import CheckpointStore
from canal_ray.config import CdcConfig
from canal_ray.ddl import TableSchema
from canal_ray.decode import DECODE_INPUT_COLUMNS, make_decoder
from canal_ray.loggen import EPOCH_MS, LOG_SCHEMA
from canal_ray.sink import LakeCompactor, LakeMerger, lake_partition_dirs, make_applier


def _segment_stats(path: str) -> tuple[int, int, int]:
    """(lsn_min, lsn_max, max_execute_time_ms) of a segment from parquet
    row-group statistics (no data read). The execute_time max is the
    heartbeat-driven source clock: MHEARTBEAT rows advance it even when the
    segment carries no DML (AbstractEventParser.java:528-555 semantics)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    arrow_schema = md.schema.to_arrow_schema()
    lsn_idx = arrow_schema.get_field_index("lsn")
    et_idx = arrow_schema.get_field_index("execute_time")
    los, his, clocks = [], [], [0]
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(lsn_idx).statistics
        los.append(st.min)
        his.append(st.max)
        est = md.row_group(rg).column(et_idx).statistics
        if est is not None and est.max is not None:
            ts = est.max
            if hasattr(ts, "timestamp"):
                # parquet timestamp stats come back tz-naive but ARE UTC
                # (loggen writes timestamp('ms') from a UTC epoch base);
                # naive .timestamp() would skew by the host's UTC offset
                from datetime import timezone

                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=timezone.utc)
                clocks.append(int(ts.timestamp() * 1000))
            else:
                clocks.append(int(ts))
    return min(los), max(his), max(clocks)


def _pmap(fn, items, max_workers: int = 16) -> list:
    """Order-preserving parallel map for driver-side parquet METADATA/tail
    reads (pyarrow releases the GIL on file IO). At bench scale (48
    segments) this is noise; at 10^10-event scale (thousands of segments)
    a sequential footer loop on the driver becomes the cycle bottleneck."""
    items = list(items)
    if len(items) <= 1:
        return [fn(x) for x in items]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(max_workers, len(items))) as ex:
        return list(ex.map(fn, items))


def _first_txn(path: str) -> int:
    """txn_id of a segment's first event (one tiny row-group column read)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    t = pf.read_row_group(0, columns=["txn_id"])
    return int(t["txn_id"][0].as_py())


def _last_txn(path: str) -> int:
    """txn_id of a segment's final event (one tiny row-group column read)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    t = pf.read_row_group(pf.metadata.num_row_groups - 1, columns=["txn_id"])
    return int(t["txn_id"][-1].as_py())


def _txn_cut(segs: list[str], next_first_txn: int) -> int | None:
    """Last lsn in ``segs`` whose txn differs from the txn continuing into
    the next epoch — the EventTransactionBuffer flush point. None if every
    event in ``segs`` belongs to that spanning transaction (degenerate).

    Scans row groups from the tail: a transaction is at most a few dozen
    events, so the cut is found in the last row group — O(1 row group) of
    two narrow columns per epoch boundary, not O(segment)."""
    import pyarrow.parquet as pq

    for seg in reversed(segs):
        pf = pq.ParquetFile(seg)
        for rg in range(pf.metadata.num_row_groups - 1, -1, -1):
            t = pf.read_row_group(rg, columns=["lsn", "txn_id"])
            mask = t["txn_id"].to_numpy() != next_first_txn
            if mask.any():
                return int(t["lsn"].to_numpy()[mask].max())
    return None


def xa_rollback_txns(paths: list[str], up_to_lsn: int | None = None) -> np.ndarray:
    """Sorted txn_ids with an XAROLLBACK terminal marker in ``paths`` — the
    rolled-back-transaction set the decoder excludes
    (EventType.XACOMMIT/XAROLLBACK, EntryProtocol.proto:202-222).
    ``up_to_lsn`` bounds the scan for point-in-time reads: a marker above
    the cut has not happened yet as of that position.

    Scale shape: the driver reads only parquet FOOTERS — a row group whose
    op-column max sorts below ``"XAROLLBACK"`` cannot contain a marker, so
    XA-free segments cost zero data reads. Candidate row groups (rare) are
    read by parallel Ray tasks returning a handful of ints each."""
    import pyarrow.parquet as pq

    candidates: list[tuple[str, list[int]]] = []
    for path, md in zip(paths, _pmap(pq.read_metadata, paths)):
        schema = md.schema.to_arrow_schema()
        op_idx = schema.get_field_index("op")
        if op_idx < 0:
            continue
        rgs = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(op_idx).statistics
            if st is None or st.max is None or str(st.max) >= "XAROLLBACK":
                rgs.append(rg)
        if rgs:
            candidates.append((path, rgs))
    if not candidates:
        return np.empty(0, dtype=np.int64)

    import ray

    @ray.remote(num_cpus=1)
    def _scan(path: str, rgs: list[int], bound: int | None) -> np.ndarray:
        pf = pq.ParquetFile(path)
        out = []
        for rg in rgs:
            t = pf.read_row_group(rg, columns=["lsn", "op", "txn_id"])
            m = pc.equal(t["op"], pa.scalar("XAROLLBACK"))
            if bound is not None:
                m = pc.and_(m, pc.less_equal(t["lsn"], pa.scalar(bound)))
            out.append(t["txn_id"].filter(m).to_numpy(zero_copy_only=False))
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)

    got = ray.get([_scan.remote(p, rgs, up_to_lsn) for p, rgs in candidates])
    ids = np.unique(np.concatenate(got)) if got else np.empty(0, dtype=np.int64)
    return ids.astype(np.int64)


def _gtid_at(seg_stats, segs: list[str], lsn_hi: int) -> str | None:
    """GTID of the last transaction event at-or-below ``lsn_hi`` — the ack
    watermark's gtid (the reference checkpoints gtid alongside the log
    position, ``position/EntryPosition.java:9-43``). One tail row-group read
    of two narrow columns in the segment containing the cut."""
    import pyarrow.parquet as pq

    best: tuple[int, str] | None = None
    for seg in reversed(segs):
        lo, hi, _ = seg_stats(seg)
        if lo > lsn_hi:
            continue
        pf = pq.ParquetFile(seg)
        if pf.schema_arrow.get_field_index("gtid") < 0:
            return None
        for rg in range(pf.metadata.num_row_groups - 1, -1, -1):
            t = pf.read_row_group(rg, columns=["lsn", "gtid"])
            lsn = t["lsn"].to_numpy()
            g = t["gtid"].to_numpy(zero_copy_only=False)
            ok = (lsn <= lsn_hi) & (g != None)  # noqa: E711
            if ok.any():
                j = int(lsn[ok].argmax())
                cand = (int(lsn[ok][j]), str(g[ok][j]))
                if best is None or cand[0] > best[0]:
                    best = cand
                return best[1]
        # no qualifying row in this segment; try the previous one
    return best[1] if best else None


def _base_to_log(batch: pa.Table, cfg: CdcConfig) -> pa.Table:
    """Initial-snapshot rows -> lsn-0 INSERT events in the log wire format.

    The emitted identity (schema/table) and PK come from ``cfg`` — a bootstrap
    row must pass the same decode whitelist and partition routing as the live
    stream for the configured table (not a hardcoded default)."""
    payload_names = cfg.payload_columns()
    for pk_col in cfg.pk_columns:
        if pk_col not in payload_names:
            raise ValueError(
                f"pk column {pk_col!r} not in initial_schema {payload_names}"
            )
    n = batch.num_rows
    L = len(payload_names)
    mat = np.empty((n, L), dtype=object)
    for j, name in enumerate(payload_names):
        col = batch[name]
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        mat[:, j] = col.to_numpy(zero_copy_only=False)
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * L)
    vals = pa.ListArray.from_arrays(offsets, pa.array(mat.ravel(), type=pa.string()))
    cols = pa.ListArray.from_arrays(
        offsets, pa.array(np.tile(np.array(payload_names, dtype=object), n), type=pa.string())
    )
    # pruned to DECODE_INPUT_COLUMNS — the bootstrap stream unions with the
    # column-pruned segment read, so both must carry exactly those columns
    return pa.table(
        {
            "lsn": pa.array(np.zeros(n, dtype=np.int64)),
            "txn_id": pa.array(np.zeros(n, dtype=np.int64)),
            "op": pa.array(["INSERT"] * n, type=pa.string()),
            "schema_name": pa.array([cfg.schema_name] * n, type=pa.string()),
            "table_name": pa.array([cfg.table_name] * n, type=pa.string()),
            "pk_repo": pc.cast(batch[cfg.pk_columns[0]], pa.string()),
            "pk_path": pc.cast(batch[cfg.pk_columns[1]], pa.string()),
            "cols": cols,
            "vals": vals,
            "ddl_sql": pa.array([None] * n, type=pa.string()),
        },
        schema=pa.schema([LOG_SCHEMA.field(name) for name in DECODE_INPUT_COLUMNS]),
    )


class CdcJob:
    """One replay job over one binlog directory into one lake directory."""

    def __init__(self, cfg: CdcConfig):
        self.cfg = cfg
        if cfg.pipelined_cycles and cfg.exchange != "scatter":
            # the overlap branch exists only in the scatter path; surface
            # the silent-sequential combination instead of ignoring it
            import warnings

            warnings.warn(
                "pipelined_cycles=True has no effect with exchange="
                f"{cfg.exchange!r} (scatter exchange only); cycles will run "
                "sequentially",
                stacklevel=2,
            )
        self.store = CheckpointStore(cfg.lake_dir)
        # txn-aligned epoch windows (filled by run() when enabled)
        self._cuts: dict[int, tuple[int, int]] = {}
        self._overlap: dict[int, list[str]] = {}
        # segment footer stats cache — segment files are immutable once
        # written (tailing appends NEW files), and cut computation + cycle
        # setup both consult them; without the cache a tail poll re-reads
        # O(total history) footers every run()
        self._seg_stats_cache: dict[str, tuple[int, int, int]] = {}
        # in-flight pipelined cycle (gather futures awaiting collection)
        self._pending: dict | None = None

    def _seg_stats(self, path: str) -> tuple[int, int, int]:
        got = self._seg_stats_cache.get(path)
        if got is None:
            got = _segment_stats(path)
            self._seg_stats_cache[path] = got
        return got

    # ------------------------------------------------------------------ plan
    def segment_files(self) -> list[str]:
        from canal_ray.checkpoint import list_numbered

        return list_numbered(self.cfg.log_dir)

    def plan(self) -> list[tuple[int, list[str]]]:
        """[(epoch, segment_paths)]; epoch 0 = bootstrap (empty path list).

        Stable under tailing: an acked epoch's segment assignment is pinned by
        its manifest (Canal: the ack cursor is immutable history); only
        segments not covered by any manifest are chunked into new epochs —
        so a partial final epoch acked during a tail never changes shape when
        more segments arrive later.
        """
        segs = self.segment_files()
        plan: list[tuple[int, list[str]]] = [(0, [])]
        consumed: set[str] = set()
        e = 1
        while True:
            m = self.store.read_epoch(e)
            if m is None:
                break
            paths = [os.path.join(self.cfg.log_dir, b) for b in m["segments"]]
            plan.append((e, paths))
            consumed.update(m["segments"])
            e += 1
        new = [s for s in segs if os.path.basename(s) not in consumed]
        k = max(1, self.cfg.epoch_segments)
        for i in range(0, len(new), k):
            plan.append((len(plan), new[i : i + k]))
        return plan

    # ------------------------------------------------- txn-aligned ack points
    def _compute_cuts(
        self, plan: list[tuple[int, list[str]]]
    ) -> tuple[dict[int, tuple[int, int]], dict[int, list[str]]]:
        """EventTransactionBuffer analog: per-epoch lsn windows whose upper
        bound is the last COMPLETE transaction boundary, plus the overlap
        CARRY — every earlier segment still holding rows above the epoch's
        low bound (a deferred txn can span several files) that the epoch
        must re-read for its deferred head.

        Acked epochs reuse the cut recorded in their manifest (``lsn_hi``) so
        a tail-appended log never reinterprets an already-acked boundary.
        The FINAL epoch acks through log end — an in-progress trailing txn
        cannot be completed by a file replay (batch semantics at EOF, like
        ``LocalBinLogConnection`` replay-to-EOF).
        """
        # acked RESIDUAL epochs (held-txn flushes; empty segment lists) stay
        # in the chain: their pinned lsn_hi advances the cut past the carry,
        # otherwise every re-run would mint a fresh residual epoch forever
        manifests: dict[int, dict | None] = {
            e: self.store.read_epoch(e) for e, _ in plan if e > 0
        }
        eps = [
            (e, segs)
            for e, segs in plan
            if e > 0 and (segs or manifests[e] is not None)
        ]
        # prewarm the stats cache and the boundary tail reads in PARALLEL —
        # these are all independent footer / one-row-group reads, and the
        # sequential fold below only combines their results
        missing = [
            s
            for s in dict.fromkeys(s for _, segs in eps for s in segs)
            if s not in self._seg_stats_cache
        ]
        for p, st in zip(missing, _pmap(_segment_stats, missing)):
            self._seg_stats_cache[p] = st

        _EOF = "eof"  # boundary not applicable: final epoch, no hold-back

        def _boundary(i: int):
            e, segs = eps[i]
            if manifests[e] is not None:
                return _EOF  # unused; manifest cut wins in the fold
            if i + 1 < len(eps):
                return _txn_cut(segs, _first_txn(eps[i + 1][1][0]))
            if self._hold_trailing:
                return _txn_cut(segs, _last_txn(segs[-1]))
            return _EOF

        raw_cuts = _pmap(_boundary, range(len(eps)))
        cuts: dict[int, tuple[int, int]] = {}
        overlap: dict[int, list[str]] = {}
        prev_hi = 0
        # segments from EARLIER epochs that still hold rows above the running
        # cut (a deferred txn can span several segments, and a degenerate
        # whole-epoch-inside-one-txn defers every segment of that epoch) —
        # each epoch's overlap is the whole carry, not just the last file
        carry: list[tuple[str, int]] = []  # (path, stats_max_lsn)
        for i, (e, segs) in enumerate(eps):
            manifest = manifests[e]
            his = [self._seg_stats(s)[1] for s in segs] or [0]
            if manifest is not None:
                # acked: reuse the cut that run actually used (segment-aligned
                # max for epochs acked before txn alignment was enabled)
                hi = int(manifest.get("lsn_hi", max(his)))
            elif raw_cuts[i] is _EOF:
                # final epoch, no hold-back: a finished log's EOF IS the end
                # of the stream (tail mode instead holds the trailing txn —
                # it may continue in segments arriving next poll, and an ack
                # must never split it at the poll boundary; the carry
                # mechanism delivers it once it completes)
                hi = max(his)
            elif raw_cuts[i] is None:  # whole epoch inside one spanning txn
                hi = prev_hi
            else:
                hi = int(raw_cuts[i])
            lo = prev_hi + 1
            cuts[e] = (lo, hi)
            overlap[e] = [p for p, mx in carry if mx >= lo]
            prev_hi = hi
            carry = [
                (p, mx) for p, mx in (carry + list(zip(segs, his))) if mx > hi
            ]
        # the residual carry (rows above the final cut — a held trailing
        # txn) is returned so run() can flush it through a residual epoch
        # when no pending epoch exists to receive it
        return cuts, overlap, carry

    # ------------------------------------------------------------------- run
    def run(
        self, max_epochs: int | None = None, hold_trailing_txn: bool = False
    ) -> dict:
        """Consume all (or ``max_epochs``) un-acked epochs; resumable.

        ``hold_trailing_txn`` (txn-aligned tail mode): the final epoch's ack
        point stops BEFORE the log's trailing transaction, because in a live
        tail that txn may continue in the next segment — EOF is a poll
        artifact, not a txn boundary. Batch replays leave it False: a
        finished log's EOF IS the end of the stream.

        Epochs are batched ``epochs_per_cycle`` at a time through one
        decode -> shuffle -> apply pipeline per cycle; the apply function
        splits its group by epoch lsn range so every epoch still gets its own
        fenced checkpoint (per-epoch resume is unchanged, driver barriers are
        amortized).
        """
        import time as _time

        _timing = os.environ.get("CANAL_PHASE_TIMING")
        _t0 = _time.perf_counter()
        cfg = self.cfg
        if cfg.handlers:
            # re-fire after() hooks lost to a crash between an epoch's ack
            # and its hook (at-least-once contract; see handlers.py)
            from canal_ray.handlers import replay_unfired

            replay_unfired(self.store, cfg.handlers)
        plan = self.plan()
        last = self.store.last_complete_epoch()
        if _timing:
            print(f"[phase] plan={_time.perf_counter() - _t0:.2f}s", flush=True)
        schema = self._schema_at(last)
        self._hold_trailing = bool(hold_trailing_txn) and cfg.txn_aligned_epochs
        self._cuts, self._overlap, tail_carry = (
            self._compute_cuts(plan) if cfg.txn_aligned_epochs else ({}, {}, [])
        )
        processed = 0
        total_events = 0
        pending = [(e, s) for e, s in plan if e > last]
        if (
            cfg.txn_aligned_epochs
            and not self._hold_trailing
            and not pending
            and tail_carry
        ):
            # every file-backed epoch is acked but a held trailing txn
            # remains inside their files (tail-mode hold-back): flush it
            # through a RESIDUAL epoch that reads only the carry segments
            # under its lsn window — batch semantics at true end-of-stream
            e_new = max(e for e, _ in plan) + 1
            lo = max(hi for _, hi in self._cuts.values()) + 1 if self._cuts else 1
            gmax = max(mx for _, mx in tail_carry)
            self._cuts[e_new] = (lo, gmax)
            self._overlap[e_new] = [p for p, _ in tail_carry]
            plan.append((e_new, []))
            pending = [(e_new, [])]
        if max_epochs is not None:
            pending = pending[:max_epochs]

        cycles_done = 0
        try:
            while pending:
                k = max(1, cfg.epochs_per_cycle)
                cycle, pending = pending[:k], pending[k:]
                # downstream-handler retry loop (EntryEventSink.java:176-209):
                # a cycle re-run is always safe — per-(partition, epoch)
                # fencing turns already-applied work into no-ops
                attempt = 0
                while True:
                    try:
                        schema, events = self._run_cycle(cycle, schema)
                        break
                    except Exception as exc:
                        from canal_ray.handlers import fire_alarm, want_retry

                        if cfg.handlers:
                            fire_alarm(
                                cfg.handlers,
                                "cycle_failure",
                                {
                                    "attempt": attempt,
                                    "error": repr(exc),
                                    "epochs": [e for e, _ in cycle],
                                },
                            )
                        if not cfg.handlers or not want_retry(cfg.handlers, exc, attempt):
                            raise
                        attempt += 1
                total_events += events
                processed += len(cycle)
                cycles_done += 1
                if (
                    cfg.compact_every_cycles
                    and cycles_done % cfg.compact_every_cycles == 0
                ):
                    # compaction folds ACKED deltas — drain the in-flight
                    # cycle so its epochs are acked (and its deltas final)
                    schema, ev = self._flush_pending(schema)
                    total_events += ev
                    self.compact()
            schema, ev = self._flush_pending(schema)
            total_events += ev
        except BaseException:
            self._abort_pending()
            raise
        return {
            "epochs_processed": processed,
            "last_epoch": self.store.last_complete_epoch(),
            "events": total_events,
            "schema": schema.to_json(),
            "schema_fingerprint": schema.fingerprint(),
        }

    def run_follow(
        self,
        poll_interval_s: float = 0.5,
        max_idle_polls: int = 3,
        stop_file: str | None = None,
    ) -> dict:
        """Tail mode — the ``LocalBinLogConnection.needWait`` analog
        (``parse/.../mysql/LocalBinLogConnection.java:31-260``): consume all
        available epochs, then poll the log directory for new segments;
        stop after ``max_idle_polls`` empty polls or when ``stop_file``
        appears (the heartbeat/HA-controller stand-in for tests)."""
        import time as _time

        totals = {"epochs_processed": 0, "events": 0, "polls": 0}
        idle = 0
        while idle < max_idle_polls:
            if stop_file is not None and os.path.exists(stop_file):
                break
            # hold the trailing txn open while tailing (it may continue in
            # the next poll's segments — an ack must never split it)
            r = self.run(hold_trailing_txn=True)
            totals["epochs_processed"] += r["epochs_processed"]
            totals["events"] += r["events"]
            totals["polls"] += 1
            if r["epochs_processed"] == 0:
                idle += 1
                _time.sleep(poll_interval_s)
            else:
                idle = 0
        # end of tailing: flush the held trailing txn (batch semantics at
        # the true end of the stream)
        r = self.run()
        totals["epochs_processed"] += r["epochs_processed"]
        totals["events"] += r["events"]
        totals["last_epoch"] = self.store.last_complete_epoch()
        totals["schema"] = self.final_schema().to_json()
        return totals

    def _run_cycle(
        self, cycle: list[tuple[int, list[str]]], schema: TableSchema
    ) -> tuple[TableSchema, int]:
        import time as _time

        _tc = _time.perf_counter()
        cfg = self.cfg
        # the bootstrap snapshot (epoch 0) joins the first cycle's pipeline via
        # Dataset.union — no separate driver barrier for the initial load
        epoch_ranges = []
        epoch_clocks: dict[int, int] = {}
        sources = []
        for epoch, segs in cycle:
            if epoch == 0:
                epoch_clocks[0] = EPOCH_MS
                if cfg.base_table is None:
                    continue  # manifest-only epoch (written below)
                boot = ray.data.read_parquet(cfg.base_table)
                sources.append(
                    boot.map_batches(
                        lambda b, _cfg=cfg: _base_to_log(b, _cfg),
                        batch_format="pyarrow",
                        batch_size=cfg.decode_batch_size,
                    )
                )
                epoch_ranges.append((0, 0, 0))
            else:
                if segs:
                    los, his, clocks = zip(*(self._seg_stats(s) for s in segs))
                    epoch_clocks[epoch] = max(clocks)
                else:  # residual epoch (held-txn flush): carry segments only
                    los = his = (0,)
                    epoch_clocks[epoch] = 0
                if epoch in self._cuts:  # txn-aligned window, not segment span
                    epoch_ranges.append((epoch, *self._cuts[epoch]))
                else:
                    epoch_ranges.append((epoch, min(los), max(his)))
        log_segs = [s for e, segs in cycle for s in segs if e > 0]
        first_log_epoch = next((e for e, _ in cycle if e > 0), None)
        if first_log_epoch is not None:
            # previous cycles deferred an incomplete txn tail into this
            # epoch: re-read every overlap segment still holding rows above
            # the cut (the lsn window drops already-applied head rows at
            # decode) — a spanning txn can straddle SEVERAL files
            extra = [
                ov
                for ov in self._overlap.get(first_log_epoch, [])
                if ov not in log_segs
            ]
            if extra:
                log_segs = [*extra, *log_segs]
        if log_segs:
            # extras["read_blocks_per_seg"]: split each segment read into N
            # output blocks (N tasks read disjoint row-group ranges) — finer
            # read tasks bound per-task heap (a whole 500k-row segment is
            # ~450 MB Arrow) and pipeline the fused chain under bandwidth
            # contention. Default 4: won every interleaved A/B pair at both
            # 8 and 32 CPUs on the 24.4M-event replay (vs file-granular:
            # 26.3->24.6s and 27.0->26.3s at 32; 42.1->41.3 and 40.3->39.4
            # at 8; rb8 21.7 vs rb4 20.9 vs rb2 25.8 same window). 0/None
            # restores Ray's file-granular tasks.
            rbps = self.cfg.extras.get("read_blocks_per_seg", 4)
            sources.append(
                ray.data.read_parquet(
                    log_segs,
                    columns=DECODE_INPUT_COLUMNS,
                    **(
                        {"override_num_blocks": int(rbps) * len(log_segs)}
                        if rbps
                        else {}
                    ),
                )
            )
        if not sources:
            # acks are strictly ordered: the pending pipelined cycle (if
            # any) must land before these manifest-only acks
            schema, ev0 = self._flush_pending(schema)
            for epoch, segs in cycle:
                manifest = self._manifest(epoch, segs, schema, 0, epoch_clocks.get(epoch, 0))
                self.store.write_epoch(epoch, manifest)
                if cfg.handlers:
                    from canal_ray.handlers import fire_after_durable

                    fire_after_durable(self.store, cfg.handlers, epoch, manifest)
            return schema, ev0
        ds = sources[0] if len(sources) == 1 else sources[0].union(*sources[1:])
        window = None
        if cfg.txn_aligned_epochs and epoch_ranges:
            # bootstrap rows are lsn 0 -> the window's low end must admit
            # them when epoch 0 is part of this cycle
            window = (
                min(lo for _, lo, _ in epoch_ranges),
                max(hi for _, _, hi in epoch_ranges),
            )
        # rolled-back XA transactions in this cycle's segments (footer-stat
        # pruned — zero data reads for XA-free logs)
        xa_rb = xa_rollback_txns(log_segs) if log_segs else None
        ds = ds.map_batches(
            make_decoder(
                cfg,
                lsn_window=window,
                # scope LWW pre-compaction within epochs: a later epoch's
                # event must not suppress an earlier epoch's from its delta
                epoch_his=sorted(hi for _, _, hi in epoch_ranges),
                xa_rollback=xa_rb if xa_rb is not None and len(xa_rb) else None,
            ),
            batch_format="pyarrow",
            batch_size=cfg.decode_batch_size,
        )
        if cfg.exchange == "scatter":
            import shutil

            from canal_ray.scatter import make_scatter_fn, run_gather

            _timing = os.environ.get("CANAL_PHASE_TIMING")
            if _timing:
                print(f"[phase] cycle-setup={_time.perf_counter() - _tc:.2f}s", flush=True)
            _t0 = _time.perf_counter()
            frag_dir = self._frag_dir(cycle[0][0])
            shutil.rmtree(frag_dir, ignore_errors=True)  # stale crashed run
            scatter_ds = ds.map_batches(
                make_scatter_fn(frag_dir, cfg.extras.get("frag_codec", "lz4")),
                batch_format="pyarrow"
            )
            frag_rows = scatter_ds.take_all()
            # Ray Data's own per-operator stats for the fused
            # read->decode->scatter chain (block sizes, task wall, throughput)
            # — inspect via job.last_scatter_stats or CANAL_PHASE_TIMING=2
            self.last_scatter_stats = scatter_ds.stats()
            if _timing == "2":
                print(self.last_scatter_stats, flush=True)
            _t1 = _time.perf_counter()
            frag_index: dict[int, list[tuple[str, int]]] = {}
            for r in sorted(frag_rows, key=lambda r: (r["fragment"], r["row_group"])):
                frag_index.setdefault(int(r["pid"]), []).append(
                    (r["fragment"], int(r["row_group"]))
                )
            if cfg.pipelined_cycles and not cfg.handlers:
                # one-cycle lookahead: ack the PREVIOUS cycle now (its gather
                # ran concurrently with the scatter above), then launch this
                # cycle's gather asynchronously — the next cycle's scatter
                # (or the final flush) collects it. Acks stay strictly in
                # order; the gather straggler tail overlaps useful work.
                from canal_ray.scatter import submit_gather

                schema, prev_events = self._flush_pending(schema)
                futures = submit_gather(
                    cfg, frag_index, epoch_ranges, schema.to_json()
                )
                self._pending = {
                    "cycle": cycle,
                    "futures": futures,
                    "epoch_clocks": epoch_clocks,
                    "frag_dir": frag_dir,
                }
                if _timing:
                    print(
                        f"[phase] cycle e{cycle[0][0]}: scatter={_t1 - _t0:.2f}s "
                        f"gather=async frags={len({r['fragment'] for r in frag_rows})}",
                        flush=True,
                    )
                return schema, prev_events
            summaries = run_gather(cfg, frag_index, epoch_ranges, schema.to_json())
            if _timing:
                _t2 = _time.perf_counter()
                print(
                    f"[phase] cycle e{cycle[0][0]}: scatter={_t1 - _t0:.2f}s "
                    f"gather={_t2 - _t1:.2f}s frags={len({r['fragment'] for r in frag_rows})}",
                    flush=True,
                )
        else:
            applier = make_applier(cfg, epoch_ranges, schema.to_json())
            summaries = (
                ds.groupby("partition_id")
                .map_groups(applier, batch_format="pyarrow")
                .take_all()
            )
        frag_dir = (
            self._frag_dir(cycle[0][0]) if cfg.exchange == "scatter" else None
        )
        return self._finalize_cycle(cycle, summaries, epoch_clocks, schema, frag_dir)

    def _frag_dir(self, cycle_e0: int) -> str:
        """Exchange-fragment directory for one cycle. ``extras["frag_root"]``
        relocates the TRANSIENT shuffle files off the lake filesystem — on a
        multi-node cluster this is the node-local shuffle dir (NVMe/tmpfs,
        the standard shuffle-file placement); fragments live seconds and are
        deleted at cycle ack, so colocating them with the durable lake makes
        their writeback compete with delta/checkpoint IO for no benefit.
        Default: under the lake (works everywhere, incl. shared storage)."""
        root = self.cfg.extras.get("frag_root")
        if not root:
            return os.path.join(
                self.cfg.lake_dir, "_fragments", f"cycle_e{cycle_e0:05d}"
            )
        import hashlib

        tag = hashlib.sha256(
            os.path.abspath(self.cfg.lake_dir).encode()
        ).hexdigest()[:12]
        # namespaced by lake identity: two jobs sharing one shuffle root
        # (e.g. /dev/shm) must not collide on cycle numbers
        return os.path.join(root, f"_fragments_{tag}", f"cycle_e{cycle_e0:05d}")

    def _finalize_cycle(
        self,
        cycle: list[tuple[int, list[str]]],
        summaries: list[dict],
        epoch_clocks: dict[int, int],
        schema: TableSchema,
        frag_dir: str | None,
    ) -> tuple[TableSchema, int]:
        """Metrics + in-order epoch acks + exchange cleanup for one applied
        cycle (shared by the synchronous path and the pipelined flush)."""
        cfg = self.cfg
        # metrics BEFORE the acks (at-least-once: a crash between the two
        # re-runs the cycle and re-emits identical counter samples; the
        # inverse order would lose acked epochs' samples forever)
        from canal_ray.metrics import MetricsLog, cycle_metric_rows

        MetricsLog(cfg.lake_dir).append_cycle(
            cycle[0][0], cycle_metric_rows(summaries, epoch_clocks)
        )
        # per-epoch: verify schema consistency, ack with a manifest (in order)
        total_events = 0
        by_epoch: dict[int, list[dict]] = {}
        for s in summaries:
            by_epoch.setdefault(int(s["epoch"]), []).append(s)
        for epoch, segs in cycle:
            ss = by_epoch.get(epoch, [])
            schema = self._advance_schema(schema, ss)
            events = int(sum(s["events"] for s in ss))
            total_events += events
            manifest = self._manifest(
                epoch, segs, schema, events, epoch_clocks.get(epoch, 0)
            )
            self.store.write_epoch(epoch, manifest)
            if cfg.handlers:
                from canal_ray.handlers import fire_after_durable, fire_alarm

                poison = int(sum(s.get("poison", 0) for s in ss))
                if poison:
                    # CanalAlarmHandler analog: quarantined rows are an
                    # operational alert, not a replication failure
                    fire_alarm(
                        cfg.handlers, "poison_rows",
                        {"epoch": epoch, "rows": poison},
                    )
                fire_after_durable(self.store, cfg.handlers, epoch, manifest)
        if frag_dir is not None:
            import shutil

            shutil.rmtree(frag_dir, ignore_errors=True)
        return schema, total_events

    def _flush_pending(self, schema: TableSchema) -> tuple[TableSchema, int]:
        """Collect + ack the in-flight pipelined cycle (no-op when none).

        ``schema`` must be the schema at the pending cycle's START (exactly
        what run()/_run_cycle hold at the point of call: the pipelined
        _run_cycle returns the pre-cycle schema while its gather is in
        flight, and that value round-trips back here)."""
        p = self._pending
        if p is None:
            return schema, 0
        import time as _time

        from canal_ray.scatter import collect_gather

        _t0 = _time.perf_counter()
        # _pending stays set until the collect SUCCEEDS: if a gather task
        # fails here, the caller's _abort_pending must still see (and
        # cancel) the sibling in-flight futures — clearing first would turn
        # the abort into a no-op and leave zombie writers racing the re-run
        summaries = collect_gather(p["futures"])
        self._pending = None
        if os.environ.get("CANAL_PHASE_TIMING"):
            print(
                f"[phase] cycle e{p['cycle'][0][0]}: gather-flush="
                f"{_time.perf_counter() - _t0:.2f}s",
                flush=True,
            )
        return self._finalize_cycle(
            p["cycle"], summaries, p["epoch_clocks"], schema, p["frag_dir"]
        )

    def _abort_pending(self) -> None:
        """Cancel in-flight gather tasks after a failure: a zombie writer
        racing the re-run's own gather is prevented (delta writes are
        tmp+rename, so cancellation cannot leave torn files)."""
        p = self._pending
        if p is None:
            return
        self._pending = None
        import ray

        for f in p["futures"]:
            try:
                ray.cancel(f, force=True, recursive=True)
            except Exception:
                pass

    def _manifest(
        self, epoch: int, segs: list[str], schema: TableSchema, events: int,
        clock_ms: int = 0,
    ) -> dict:
        out = {
            "epoch": epoch,
            "segments": [os.path.basename(s) for s in segs],
            "schema": schema.to_json(),
            "schema_fingerprint": schema.fingerprint(),
            "events": events,
            # heartbeat-advanced source clock as of this ack point
            "max_execute_time_ms": int(clock_ms),
        }
        if epoch in self._cuts:
            # txn-aligned ack point: pin the cut so a tail-appended log never
            # reinterprets an acked boundary (_compute_cuts reads this back)
            out["lsn_hi"] = int(self._cuts[epoch][1])
        # gtid watermark of the ack point (the reference checkpoints gtid
        # alongside the log position, position/EntryPosition.java:9-43)
        src = segs or self._overlap.get(epoch, [])
        if epoch > 0 and src:
            hi = out.get("lsn_hi") or max(self._seg_stats(s)[1] for s in src)
            out["gtid_hi"] = _gtid_at(self._seg_stats, src, int(hi))
        return out

    def _schema_at(self, epoch: int) -> TableSchema:
        if epoch >= 0:
            m = self.store.read_epoch(epoch)
            if m is not None:
                return TableSchema.from_json(m["schema"])
        return TableSchema(self.cfg.initial_schema)

    def _advance_schema(self, schema: TableSchema, summaries: list[dict]) -> TableSchema:
        """Merge end-of-epoch schemas from partition summaries.

        DDL is replicated to every partition, so all non-skipped summaries must
        agree; a mismatch means a broken invariant and fails the epoch.
        """
        fps = {s["schema_fingerprint"] for s in summaries}
        if len(fps) > 1:
            raise RuntimeError(f"divergent partition schemas in one epoch: {fps}")
        if summaries:
            return TableSchema.from_json(json.loads(summaries[0]["schema_json"]))
        return schema

    # ----------------------------------------------------------------- state
    def final_schema(self) -> TableSchema:
        """End-of-log schema, restricted to the column filter when one is set
        (the lake never stores projected-away columns)."""
        schema = self._schema_at(self.store.last_complete_epoch())
        cf = self.cfg.column_filter
        if cf is None:
            return schema
        keep = set(cf) | set(self.cfg.pk_columns)
        return TableSchema([(n, t) for n, t in schema.columns() if n in keep])

    def read_state(self, keep_lsn: bool = False) -> "ray.data.Dataset":
        """The materialized lake as a Dataset (per-partition merge tasks)."""
        dirs = lake_partition_dirs(self.cfg.lake_dir)
        schema = self.final_schema()
        if not dirs:  # nothing ever applied (e.g. everything filtered out)
            empty = schema.to_arrow().empty_table()
            if keep_lsn:
                empty = empty.append_column("_lsn", pa.array([], type=pa.int64()))
            return ray.data.from_arrow(empty)
        items = [{"part_dir": d} for d in dirs]
        merger = LakeMerger(schema.to_json(), self.cfg.pk_columns, keep_lsn)
        return ray.data.from_items(items).map_batches(
            merger, batch_format="pyarrow", batch_size=1
        )

    def state_pandas(self) -> pd.DataFrame:
        df = self.read_state().to_pandas()
        arrow = self.final_schema().to_arrow()
        if df.empty:  # Ray's to_pandas drops columns on empty datasets
            df = arrow.empty_table().to_pandas()
        for name, typ in zip(arrow.names, arrow.types):
            if pa.types.is_integer(typ):
                df[name] = df[name].astype("Int64")
        pk = list(self.cfg.pk_columns)
        return df.sort_values(pk).reset_index(drop=True)

    # ------------------------------------------------------- point-in-time
    def read_state_as_of(self, lsn: int) -> "ray.data.Dataset":
        """Point-in-time lake read: live rows exactly as a sequential replay
        truncated at ``lsn`` would leave them — the DATA half of the
        reference's ``DatabaseTableMeta.rollback(position)``
        (``tsdb/DatabaseTableMeta.java:161-181`` rebuilds only the schema;
        ``tsdb.schema_as_of`` is that half here, and this pairs it with a
        delta-bounded merge).

        Shape (scale-safe): per-partition merge of acked deltas up to the
        greatest ack point <= lsn — no re-read of applied history — plus a
        decoded tail slice (ack point, lsn] re-read from the log under an
        lsn window (bounded by ~one epoch of segments), grouped by partition
        into delta-shaped scratch files. Fully distributed; the driver holds
        only the epoch chain and one summary row per partition.

        Constraint (shared with derived tables): deltas at-and-after the cut
        must still exist — compaction folds history into base, after which
        positions before the compaction horizon are not reconstructable
        (Canal's TSDB has the same snapshot-granularity behavior).
        """
        import shutil

        from canal_ray.sink import AsOfLakeMerger, make_asof_tail_writer
        from canal_ray.tsdb import schema_as_of

        cfg = self.cfg
        lsn = int(lsn)
        # epoch chain upper bounds: manifest lsn_hi when pinned
        # (txn-aligned acks), else segment footer stats
        last = self.store.last_complete_epoch()
        e_star, hi_star = 0, 0
        prev_hi = 0
        for e in range(1, last + 1):
            m = self.store.read_epoch(e)
            if m is None:
                break
            if "lsn_hi" in m:
                hi = int(m["lsn_hi"])
            elif m["segments"]:
                hi = max(
                    self._seg_stats(os.path.join(cfg.log_dir, b))[1]
                    for b in m["segments"]
                )
            else:
                hi = prev_hi
            prev_hi = hi
            if hi <= lsn:
                e_star, hi_star = e, hi
            else:
                break
        schema_t = schema_as_of(cfg, lsn)
        scratch = os.path.join(cfg.lake_dir, "_asof", f"lsn{lsn}")
        shutil.rmtree(scratch, ignore_errors=True)  # stale prior read
        pids = {
            int(os.path.basename(d)[1:])
            for d in lake_partition_dirs(cfg.lake_dir)
        }
        if lsn > hi_star:
            tail_segs = [
                s
                for s in self.segment_files()
                if self._seg_stats(s)[0] <= lsn and self._seg_stats(s)[1] > hi_star
            ]
            if tail_segs:
                os.makedirs(scratch, exist_ok=True)
                xa_rb = xa_rollback_txns(tail_segs, up_to_lsn=lsn)
                tail = ray.data.read_parquet(
                    tail_segs, columns=DECODE_INPUT_COLUMNS
                ).map_batches(
                    make_decoder(
                        cfg,
                        lsn_window=(hi_star + 1, lsn),
                        xa_rollback=xa_rb if len(xa_rb) else None,
                    ),
                    batch_format="pyarrow",
                    batch_size=cfg.decode_batch_size,
                )
                writer = make_asof_tail_writer(
                    scratch, schema_t.to_json(), cfg.pk_columns, cfg.partial_updates
                )
                summaries = (
                    tail.groupby("partition_id")
                    .map_groups(writer, batch_format="pyarrow")
                    .take_all()  # bounded: one summary row per partition
                )
                pids |= {int(s["partition_id"]) for s in summaries}
        if not pids:
            return ray.data.from_arrow(schema_t.to_arrow().empty_table())
        items = [{"partition_id": p} for p in sorted(pids)]
        merger = AsOfLakeMerger(
            cfg.lake_dir, schema_t.to_json(), cfg.pk_columns, e_star, scratch
        )
        return ray.data.from_items(items).map_batches(
            merger, batch_format="pyarrow", batch_size=1
        )

    def state_as_of(self, lsn: int) -> pd.DataFrame:
        from canal_ray.tsdb import schema_as_of

        df = self.read_state_as_of(lsn).to_pandas()
        schema_t = schema_as_of(self.cfg, int(lsn))
        arrow = schema_t.to_arrow()
        if df.empty:  # Ray's to_pandas drops columns on empty datasets
            df = arrow.empty_table().to_pandas()
        for name, typ in zip(arrow.names, arrow.types):
            if pa.types.is_integer(typ):
                df[name] = df[name].astype("Int64")
        # pk columns may have been renamed by DDL before the target — sort by
        # their as-of-era names (resolution through slot aliases)
        pk = []
        for c in self.cfg.pk_columns:
            i = schema_t.resolve(c)
            pk.append(schema_t.slots()[i].name if i is not None else c)
        import shutil

        shutil.rmtree(
            os.path.join(self.cfg.lake_dir, "_asof", f"lsn{int(lsn)}"),
            ignore_errors=True,
        )
        return df.sort_values(pk).reset_index(drop=True)

    def compact(self) -> pd.DataFrame:
        """Fold all deltas into per-partition base files (parallel tasks)."""
        dirs = lake_partition_dirs(self.cfg.lake_dir)
        items = [{"part_dir": d} for d in dirs]
        compactor = LakeCompactor(self.final_schema().to_json(), self.cfg.pk_columns)
        return (
            ray.data.from_items(items)
            .map_batches(compactor, batch_format="pyarrow", batch_size=1)
            .to_pandas()
        )

    # --------------------------------------------------------------- lineage
    def lineage(self) -> dict:
        """Aggregated per-partition lineage/metrics from the checkpoint store.

        The analog of Canal's Prometheus collectors
        (``prometheus/.../impl/{Entry,Store,Sink,Parser}Collector.java`` —
        canal_instance_put_rows / ack_rows / get_delay ...).
        """
        import time as _time

        now_ms = int(_time.time() * 1000)
        last_acked = self.store.last_complete_epoch()
        parts = {}
        for d in lake_partition_dirs(self.cfg.lake_dir):
            pid = int(os.path.basename(d)[1:])
            ckpts = self.store.partition_checkpoints(pid)
            if not ckpts:
                continue
            # heartbeat lag: delay of this partition's apply vs the source
            # clock of its newest *acked* epoch (gauge; 0 clock = unknown)
            e = min(max(c["epoch"] for c in ckpts), last_acked)
            m = self.store.read_epoch(e) if e >= 0 else None
            clock = int(m.get("max_execute_time_ms", 0)) if m else 0
            hot: dict[str, int] = {}
            for c in ckpts:
                for k, v in c.get("hot_keys", {}).items():
                    hot[k] = hot.get(k, 0) + v
            top = dict(sorted(hot.items(), key=lambda kv: -kv[1])[: self.cfg.hot_key_top_n])
            parts[pid] = {
                "epochs": [c["epoch"] for c in ckpts],
                "events_applied": sum(c["events"] for c in ckpts),
                "inserts": sum(c.get("inserts", 0) for c in ckpts),
                "updates": sum(c.get("updates", 0) for c in ckpts),
                "deletes": sum(c.get("deletes", 0) for c in ckpts),
                "poison": sum(c.get("poison", 0) for c in ckpts),
                "ddls": sum(c.get("ddls", 0) for c in ckpts),
                "lsn_range": [
                    min(c["lsn_min"] for c in ckpts),
                    max(c["lsn_max"] for c in ckpts),
                ],
                "hot_keys": top,
                "source_clock_ms": clock,
                "apply_delay_ms": max(0, now_ms - clock) if clock else None,
            }
        events = [p["events_applied"] for p in parts.values()] or [0]
        return {
            "partitions": parts,
            "total_events_applied": int(sum(events)),
            "skew": {
                "max_partition_events": int(max(events)),
                "min_partition_events": int(min(events)),
                "mean_partition_events": float(np.mean(events)),
            },
        }

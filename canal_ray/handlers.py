"""Downstream handler SPI — before/retry/after interceptors on the sink path.

The reference exposes ``CanalEventDownStreamHandler`` (``sink/.../
CanalEventDownStreamHandler.java``) and invokes the chain around every sink
batch in ``EntryEventSink.java:176-209``: ``before(events)`` may transform
the batch, ``retry(events)`` runs when the sink throws, ``after(events)``
runs once the batch is stored. Typical uses: redaction/enrichment,
dead-letter decisions, metrics side-channels.

Ray-Data mapping (where each hook can actually run at 100 TB):

  - ``before(batch)`` executes INSIDE the decode ``map_batches`` stage, on
    workers, batch-at-a-time over the decoded wire format
    (``canal_ray.decode.DECODED_SCHEMA``). It must be a pure, serializable
    transform (it is cloudpickled to workers; driver-side state it mutates
    will NOT be visible back on the driver). Returning a filtered/modified
    table with the same schema is the contract.
  - ``retry(exc, attempt)`` runs on the DRIVER when a consumption cycle
    fails. Return True to re-run the cycle — per-(partition, epoch)
    checkpoint fencing makes the re-run exactly-once-effect, so a retry is
    always safe. Return False (default) to let the error propagate.
  - ``after(epoch, manifest)`` runs on the DRIVER right after the epoch's
    manifest (ack) is durably written — the at-least-once post-commit hook.

Handlers are configured as ``CdcConfig.handlers = (H1(), H2(), ...)`` and
run in order (before: first-to-last; after/retry: first-to-last), mirroring
``AbstractCanalEventSink.addHandler`` ordering semantics.
"""

from __future__ import annotations

import pyarrow as pa


class DownstreamHandler:
    """Base interceptor; subclass and override any subset of the hooks."""

    def before(self, batch: pa.Table) -> pa.Table:
        """Transform one decoded batch on the worker (pure, serializable)."""
        return batch

    def retry(self, exc: Exception, attempt: int) -> bool:
        """Driver-side: True = re-run the failed cycle (fencing-safe)."""
        return False

    def after(self, epoch: int, manifest: dict) -> None:
        """Driver-side: the epoch's ack manifest is durable."""

    def alarm(self, kind: str, detail: dict) -> None:
        """Driver-side operational alert (``CanalAlarmHandler.sendAlarm``
        analog, ``common/alarm/CanalAlarmHandler.java`` — default impl logs,
        ``LogAlarmHandler``). Fired on poison-row quarantine and on cycle
        failure (before the retry vote). Alarm delivery must never take the
        pipeline down: exceptions raised here are swallowed with a warning,
        exactly like an unreachable alerting endpoint."""


def apply_before(handlers: tuple, batch: pa.Table) -> pa.Table:
    for h in handlers:
        batch = h.before(batch)
    return batch


def want_retry(handlers: tuple, exc: Exception, attempt: int) -> bool:
    """True if ANY handler votes to retry (first-to-last, all are asked so
    each can record the failure even when an earlier one already voted)."""
    votes = [bool(h.retry(exc, attempt)) for h in handlers]
    return any(votes)


def fire_after(handlers: tuple, epoch: int, manifest: dict) -> None:
    for h in handlers:
        h.after(epoch, manifest)


def fire_alarm(handlers: tuple, kind: str, detail: dict) -> None:
    """Best-effort fan-out to every handler's alarm(); never raises."""
    for h in handlers:
        try:
            h.alarm(kind, detail)
        except Exception as exc:  # noqa: BLE001 — alarms must not kill apply
            import warnings

            warnings.warn(f"alarm handler {type(h).__name__} raised: {exc!r}")


# ---------------------------------------------------------------- durability
# after() is an at-least-once post-commit hook. The epoch ack (write_epoch)
# is durable BEFORE the hook fires, so without extra state a crash — or a
# later handler raising — between the ack and the hook would silently drop
# it (at-most-once). A single after-cursor file next to the manifests closes
# the gap: acks are strictly in-order, so one integer ("fired through epoch
# e") is the full state, and run() replays any acked-but-unfired epochs.

_AFTER_CURSOR = "after_cursor.json"


def _cursor_path(store) -> str:
    import os

    return os.path.join(store.ckpt_dir, _AFTER_CURSOR)


def fire_after_durable(store, handlers: tuple, epoch: int, manifest: dict) -> None:
    """Fire after() then durably advance the after-cursor. A crash or a
    handler exception before the cursor write leaves it behind, and
    ``replay_unfired`` re-fires on the next run() — at-least-once."""
    from canal_ray.checkpoint import atomic_write_json, read_json

    fire_after(handlers, epoch, manifest)
    path = _cursor_path(store)
    fired = int((read_json(path) or {}).get("fired_through", -1))
    if epoch > fired:
        atomic_write_json(path, {"fired_through": epoch})


def replay_unfired(store, handlers: tuple) -> int:
    """Re-fire after() for acked epochs whose hook never completed; returns
    how many were replayed. On a lake with no after-cursor yet (first
    handler-bearing run), epochs acked by earlier handler-less runs are
    out of scope: the cursor initializes to the current ack point."""
    from canal_ray.checkpoint import atomic_write_json, read_json

    if not handlers:
        return 0
    path = _cursor_path(store)
    cur = read_json(path)
    last = store.last_complete_epoch()
    if cur is None:
        atomic_write_json(path, {"fired_through": last})
        return 0
    n = 0
    for e in range(int(cur["fired_through"]) + 1, last + 1):
        m = store.read_epoch(e)
        if m is not None:
            fire_after_durable(store, handlers, e, m)
            n += 1
    return n

"""Checkpoint store: atomic per-partition position files + epoch manifests.

The analog of Canal's meta/position managers:
  - per-client cursor flushed as JSON with atomic replace:
    ``meta/.../FileMixedMetaManager.java:187-219``
  - parse-position manager: ``parse/index/FileMixedLogPositionManager.java``
  - schema snapshot stored alongside the position so resume restores the exact
    schema as of the checkpoint: ``parse/.../tsdb/DatabaseTableMeta.java:161-181``

Layout under ``<lake_dir>/_checkpoints/``::

    p00003_e00002.json      one per (partition, epoch): lsn range, counts,
                            schema fingerprint, hot-key counters  (lineage)
    epoch_e00002.json       driver manifest: epoch complete, segments consumed,
                            end-of-epoch schema  (the resume point)

Atomicity: write to a temp file in the same directory then ``os.replace`` —
re-running a task (Ray retry) or the whole driver (resume) rewrites the same
deterministic bytes, so duplicated work is a no-op (offset fencing;
Canal analog: tx-aligned ack points tolerate redelivery,
``store/memory/MemoryEventStoreWithBuffer.java:366-377``).
"""

from __future__ import annotations

import json
import os
import re
import tempfile

_NAT_SPLIT = re.compile(r"(\d+)")


def natural_key(name: str) -> tuple:
    """Sort key treating digit runs numerically: 'segment_100000' sorts
    after 'segment_99999' even when the zero-padded field widens (the same
    fix partition_checkpoints applies to epoch numbers — segment files are
    epoch_segments× more numerous, so they widen first)."""
    return tuple(
        int(p) if p.isdigit() else p
        for p in _NAT_SPLIT.split(os.path.basename(name))
    )


def list_numbered(d: str, suffix: str = ".parquet") -> list[str]:
    """Numerically-ordered listing of numbered files in one directory."""
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return []
    return [
        os.path.join(d, n)
        for n in sorted((n for n in names if n.endswith(suffix)), key=natural_key)
    ]


def atomic_write_json(path: str, obj: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp_", suffix=".json")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_json(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


class CheckpointStore:
    """Paths + read/write helpers for one lake directory."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self.ckpt_dir = os.path.join(lake_dir, "_checkpoints")
        # epoch manifests are immutable once written; caching present ones
        # keeps a tail poll's run() from re-reading O(acked history) JSON
        # files (plan + cut computation + last_complete_epoch all consult
        # them). Absence is NEVER cached — the manifest may appear later.
        self._epoch_cache: dict[int, dict] = {}

    # -- partition checkpoints (sink-side position manager) ---------------
    def partition_path(self, partition_id: int, epoch: int) -> str:
        return os.path.join(self.ckpt_dir, f"p{partition_id:05d}_e{epoch:05d}.json")

    def write_partition(self, partition_id: int, epoch: int, obj: dict) -> None:
        atomic_write_json(self.partition_path(partition_id, epoch), obj)

    def read_partition(self, partition_id: int, epoch: int) -> dict | None:
        return read_json(self.partition_path(partition_id, epoch))

    # -- epoch manifests (driver-side cursor) ------------------------------
    def epoch_path(self, epoch: int) -> str:
        return os.path.join(self.ckpt_dir, f"epoch_e{epoch:05d}.json")

    def write_epoch(self, epoch: int, obj: dict) -> None:
        atomic_write_json(self.epoch_path(epoch), obj)
        self._epoch_cache[epoch] = obj

    def read_epoch(self, epoch: int) -> dict | None:
        got = self._epoch_cache.get(epoch)
        if got is None:
            got = read_json(self.epoch_path(epoch))
            if got is not None:
                self._epoch_cache[epoch] = got
        return got

    def last_complete_epoch(self) -> int:
        """Highest epoch e such that manifests 0..e all exist; -1 if none."""
        e = 0
        while self.read_epoch(e) is not None:
            e += 1
        return e - 1

    def partition_checkpoints(self, partition_id: int) -> list[dict]:
        """All checkpoints of one partition, epoch-ordered (lineage query)."""
        if not os.path.isdir(self.ckpt_dir):
            return []
        out = []
        prefix = f"p{partition_id:05d}_e"
        names = [n for n in os.listdir(self.ckpt_dir) if n.startswith(prefix)]
        # numeric epoch order: past epoch 99999 the zero-padded field widens
        # and lexicographic order breaks ('e100000' < 'e99999')
        for name in sorted(names, key=lambda n: int(n[len(prefix):-5])):
            obj = read_json(os.path.join(self.ckpt_dir, name))
            if obj is not None:
                out.append(obj)
        return out

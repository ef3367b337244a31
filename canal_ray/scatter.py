"""Scatter/gather apply — a disk-based exchange replacing the sort shuffle.

Mode ``exchange="scatter"`` (vs the default ``"sort"`` groupby shuffle):

  phase 1 (scatter): each decode output batch is bucketed by ``partition_id``
      and appended to ONE Arrow-IPC fragment file with one record batch per
      partition present — so readers fetch exactly their partition's batch by
      index (random access, no stats scans). Nothing accumulates in the
      object store: a batch is durable the moment its fragment renames into
      place (the sort shuffle, by contrast, materializes the whole
      consumption cycle in memory — untenable for a 10^10-event backlog
      replay).
  phase 2 (gather): one task per partition reads only its record batches
      from the fragments, then runs the identical per-epoch apply (DDL
      replay, typed materialization, LWW, fenced checkpoint) as the sort
      path — the delta/checkpoint format is byte-compatible.

Fragment format is Arrow IPC with LZ4 frame compression, not parquet:
the exchange is transient (deleted after the cycle acks), so the cheap
columnar encode/decode wins over parquet's heavier encoding — measured ~2x
on the 24M-event replay — while content payloads still compress ~3x. On a
multi-node cluster the fragments live on the same shared storage as the
lake. This is the classic shuffle-file design (public knowledge — e.g.
MapReduce/Spark shuffle architecture).

Crash safety: fragments are written tmp+rename into a per-cycle directory;
phase 2 only reads the file list phase 1 returned; per-(partition, epoch)
fencing in the apply makes any re-run a no-op; the fragment directory is
deleted after every epoch of the cycle is acked.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.ipc as pipc

from canal_ray.config import CdcConfig

# Wire-format byte diet: `op` has ~6 distinct values, so fragments carry it
# dictionary-encoded — small int indices per row, the string pool once per
# fragment. Gather casts back to plain utf8 before the apply, so the
# delta/checkpoint format is unchanged.
#
# ONLY bounded-cardinality columns may go here. Each gather task reads ONE
# record batch (its partition's slice) per fragment, but the IPC file-level
# dictionary covers the WHOLE fragment — so a dictionary column costs every
# one of the P partition gathers the full fragment-wide string pool. For
# `op` that pool is ~6 strings (free); for high-cardinality keys like
# pk_path (unique per row key) it is the entire column, a ~P× read
# amplification that measured 6.6× slower end-to-end at 32 CPUs.
# Reference analog: the slim store event accounting (store/model/Event.java).
_DICT_COLS = ("op",)


def _dict_encode(batch: pa.Table) -> pa.Table:
    for name in _DICT_COLS:
        i = batch.schema.get_field_index(name)
        if i < 0 or pa.types.is_dictionary(batch.schema.field(i).type):
            continue
        enc = pc.dictionary_encode(batch.column(i).combine_chunks())
        batch = batch.set_column(i, pa.field(name, enc.type), enc)
    return batch


def _dict_decode(group: pa.Table) -> pa.Table:
    for name in _DICT_COLS:
        i = group.schema.get_field_index(name)
        if i < 0 or not pa.types.is_dictionary(group.schema.field(i).type):
            continue
        plain = pc.cast(group.column(i), pa.string())
        group = group.set_column(i, pa.field(name, pa.string()), plain)
    return group


def make_scatter_fn(frag_dir: str, codec: str = "lz4"):
    """Build the map_batches scatter function (plain task, not an actor —
    no state to amortize; the closure only carries the fragment dir).

    ``codec``: IPC frame compression. ``lz4`` (default) is cheapest on CPU;
    ``zstd`` spends more encode CPU for ~2x smaller fragments — the right
    trade when the exchange is bandwidth-bound (32-CPU leg on one box, or
    shuffle over a shared filesystem on a real cluster)."""

    def scatter(batch: pa.Table) -> pa.Table:
        os.makedirs(frag_dir, exist_ok=True)
        empty = pa.table(
            {
                "fragment": pa.array([], type=pa.string()),
                "pid": pa.array([], type=pa.int32()),
                "row_group": pa.array([], type=pa.int32()),
                "rows": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        pids = batch["partition_id"].to_numpy(zero_copy_only=False)
        if len(pids) > 1 and not np.all(pids[1:] >= pids[:-1]):
            # decode emits partition-grouped batches (zero-copy fast path);
            # re-sort only the rare unsorted ones (DDL replicas at the tail,
            # or blocks coalesced across decode outputs)
            idx = pc.sort_indices(batch, sort_keys=[("partition_id", "ascending")])
            batch = batch.take(idx)
            pids = batch["partition_id"].to_numpy(zero_copy_only=False)
        # one record batch per partition present -> gather reads batches
        # directly by index (random access into the IPC footer)
        bounds = np.flatnonzero(np.diff(pids)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(pids)]])

        batch = _dict_encode(batch)
        name = f"frag_{uuid.uuid4().hex}.arrow"
        final = os.path.join(frag_dir, name)
        fd, tmp = tempfile.mkstemp(dir=frag_dir, prefix=".tmp_", suffix=".arrow")
        os.close(fd)
        try:
            # options built in-task: IpcWriteOptions is not serializable.
            # "zstd:-3"-style suffix selects an explicit level (zstd's
            # negative fast levels sit between lz4 and zstd-1 on the
            # CPU-vs-bytes curve — a useful mid-point for the exchange)
            if ":" in codec:
                name, lvl = codec.split(":", 1)
                comp = pa.Codec(name, compression_level=int(lvl))
            else:
                comp = codec
            opts = pipc.IpcWriteOptions(compression=comp)
            with pipc.new_file(tmp, batch.schema, options=opts) as writer:
                for s, e in zip(starts, ends):
                    writer.write_table(batch.slice(s, e - s))
            os.replace(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return pa.table(
            {
                "fragment": pa.array([final] * len(starts)),
                "pid": pa.array(pids[starts].astype(np.int32)),
                "row_group": pa.array(np.arange(len(starts), dtype=np.int32)),
                "rows": pa.array((ends - starts).astype(np.int64)),
            }
        )

    return scatter


def _gather_partition(
    cfg: CdcConfig,
    pid: int,
    entries: list[tuple[str, int]],
    epoch_ranges: list[tuple[int, int, int]],
    start_schema_json: list[list[str]],
) -> list[dict]:
    """Read one partition's record batches from the fragments and apply."""
    from canal_ray.sink import make_applier

    import time as _time

    from canal_ray import sink as _sink

    _sink._PROF.clear()
    _t0 = _time.perf_counter()
    by_file: dict[str, list[int]] = {}
    for f, bi in entries:
        by_file.setdefault(f, []).append(bi)
    tables = []
    for f, idxs in by_file.items():
        with pipc.open_file(f) as reader:
            for bi in idxs:
                tables.append(pa.Table.from_batches([reader.get_batch(bi)]))
    if not tables:
        return []
    group = _dict_decode(pa.concat_tables(tables))
    _t1 = _time.perf_counter()
    applier = make_applier(cfg, epoch_ranges, start_schema_json)
    out = applier(group).to_pylist()
    if os.environ.get("CANAL_PHASE_TIMING"):
        for r in out:
            r["_read_s"] = _t1 - _t0
            r["_apply_s"] = _time.perf_counter() - _t1
            for k, v in _sink._PROF.items():
                r[f"_{k}_s"] = v
    return out


def run_gather(
    cfg: CdcConfig,
    frag_index: dict[int, list[tuple[str, int]]],
    epoch_ranges: list[tuple[int, int, int]],
    start_schema_json: list[list[str]],
) -> list[dict]:
    """Phase 2 as raw Ray tasks — exactly ONE task per partition.

    This is the one place the Dataset API genuinely fights the semantics:
    ``from_items(P).map_batches(...)`` bundles the P tiny driver rows into
    far fewer tasks (the map operator coalesces small blocks toward the
    target block size), capping gather parallelism at a fraction of P and
    flattening the 8->32 CPU scaling curve. One named task per partition is
    the exact granularity the apply fencing is built around.
    """
    return collect_gather(
        submit_gather(cfg, frag_index, epoch_ranges, start_schema_json)
    )


def submit_gather(
    cfg: CdcConfig,
    frag_index: dict[int, list[tuple[str, int]]],
    epoch_ranges: list[tuple[int, int, int]],
    start_schema_json: list[list[str]],
) -> list:
    """Launch the per-partition gather tasks WITHOUT blocking — the cycle
    pipeline overlaps these with the next cycle's scatter (the driver
    collects them via ``collect_gather`` before acking, keeping acks in
    order while the straggler tail hides behind new scatter work)."""
    import time as _time

    import ray

    def _timed(cfg, pid, entries, epoch_ranges, schema_json):
        t0 = _time.perf_counter()
        rows = _gather_partition(cfg, pid, entries, epoch_ranges, schema_json)
        return rows, pid, _time.perf_counter() - t0

    task = ray.remote(num_cpus=1)(_timed)
    return [
        task.remote(cfg, pid, frag_index.get(pid, []), epoch_ranges, start_schema_json)
        for pid in range(cfg.num_partitions)
    ]


def collect_gather(futures: list) -> list[dict]:
    """Block on submitted gather tasks and return the summary rows."""
    import ray

    results = ray.get(futures)
    if os.environ.get("CANAL_PHASE_TIMING"):
        durs = sorted(d for _, _, d in results)
        import numpy as _np

        sums: dict[str, float] = {}
        for c, _, _ in results:
            if c:
                for k, v in c[0].items():
                    if k.startswith("_") and k.endswith("_s"):
                        sums[k] = sums.get(k, 0.0) + v
        detail = " ".join(f"{k[1:-2]}_sum={v:.1f}s" for k, v in sorted(sums.items()))
        print(
            f"[phase] gather tasks: n={len(durs)} sum={sum(durs):.1f}s "
            f"p50={durs[len(durs)//2]:.2f} max={durs[-1]:.2f} "
            f"mean={_np.mean(durs):.2f} {detail}",
            flush=True,
        )
        for c, _, _ in results:
            for r in c:
                for k in [k for k in r if k.startswith("_") and k.endswith("_s")]:
                    r.pop(k)
    return [row for chunk, _, _ in results for row in chunk]

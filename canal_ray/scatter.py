"""Scatter/gather apply — a disk-based exchange replacing the sort shuffle.

Mode ``exchange="scatter"`` (vs the default ``"sort"`` groupby shuffle):

  phase 1 (scatter): each decode output batch is bucketed by ``partition_id``
      and appended to ONE snappy-parquet fragment file with one row group per
      partition present — so readers can prune to a single partition via row-
      group statistics. Nothing accumulates in the object store: a batch is
      durable the moment its fragment renames into place (the sort shuffle,
      by contrast, materializes the whole consumption cycle in memory —
      untenable for a 10^10-event backlog replay).
  phase 2 (gather): one task per partition reads only its row groups from the
      fragments (parquet filter pushdown), then runs the identical per-epoch
      apply (DDL replay, typed materialization, LWW, fenced checkpoint) as
      the sort path — the delta/checkpoint format is byte-compatible.

Content payloads compress ~3-5x in the fragments, so the bytes actually
exchanged drop accordingly; on a multi-node cluster the fragments live on the
same shared storage as the lake. This is the classic shuffle-file design
(public knowledge — e.g. MapReduce/Spark shuffle architecture).

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
import pyarrow.parquet as pq

from canal_ray.config import CdcConfig


def make_scatter_fn(frag_dir: str):
    """Build the map_batches scatter function (plain task, not an actor —
    no state to amortize; the closure only carries the fragment dir)."""

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
        idx = pc.sort_indices(batch, sort_keys=[("partition_id", "ascending")])
        batch = batch.take(idx)
        pids = batch["partition_id"].to_numpy()
        # one row group per partition present -> gather reads row groups
        # directly by index (no filter machinery, no stats scans)
        bounds = np.flatnonzero(np.diff(pids)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(pids)]])

        name = f"frag_{uuid.uuid4().hex}.parquet"
        final = os.path.join(frag_dir, name)
        fd, tmp = tempfile.mkstemp(dir=frag_dir, prefix=".tmp_", suffix=".parquet")
        os.close(fd)
        try:
            writer = pq.ParquetWriter(tmp, batch.schema, compression="snappy")
            for s, e in zip(starts, ends):
                writer.write_table(batch.slice(s, e - s))
            writer.close()
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


def make_gather_fn(
    cfg: CdcConfig,
    frag_index: dict[int, list[tuple[str, int]]],
    epoch_ranges: list[tuple[int, int, int]],
    start_schema_json: list[list[str]],
):
    """Build the map_batches gather+apply function (one row = one partition).

    ``frag_index`` maps pid -> [(fragment_path, row_group_index)], built from
    the scatter stage's manifest — each gather task reads exactly its row
    groups, nothing else.
    """

    def gather(batch: pa.Table) -> pa.Table:
        from canal_ray.sink import SUMMARY_SCHEMA, make_applier

        applier = make_applier(cfg, epoch_ranges, start_schema_json)
        outs = []
        for pid in batch["pid"].to_pylist():
            entries = frag_index.get(int(pid), [])
            tables = []
            for f, rg in entries:
                tables.append(pq.ParquetFile(f).read_row_group(rg, use_threads=False))
            if not tables:
                continue
            group = pa.concat_tables(tables)
            outs.append(applier(group))
        if not outs:
            return SUMMARY_SCHEMA.empty_table()
        return pa.concat_tables(outs)

    return gather

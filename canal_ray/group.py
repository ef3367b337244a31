"""Sharded-source fan-in — the GroupEventParser / GroupEventSink analog.

Reference: N parsers over sharded source DBs feed one instance through a
timeline barrier that merge-sorts their streams by ``executeTime``
(``parse/.../inbound/group/GroupEventParser.java``,
``sink/entry/group/GroupEventSink.java:24-76``, ``TimelineBarrier.java``).

Ray-native form: the merge happens BEFORE the store, as a parallel per-aligned-
segment-group job — each task unions segment i of every shard, remaps LSNs to
a globally unique interleaving ``glsn = lsn * n_shards + shard_id`` (which
preserves each shard's internal order and approximates the timeline merge,
since lsn is monotone in execute_time within a shard), sorts, and writes one
merged segment. The merged log then feeds the ordinary ``CdcJob``.

Duplicate DDL statements (each shard logs the same schedule) are harmless:
``TableSchema.apply`` is idempotent.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from canal_ray.loggen import segment_paths


def merge_shard_logs(
    shard_dirs: list[str], out_dir: str, strict: bool = True
) -> list[str]:
    """K-way merge N shard binlog fixtures into one merged log directory.

    Parallel: one Ray task per aligned segment index (the unit the timeline
    barrier synchronizes on). Returns the merged segment paths.

    The barrier merges only up to the SHORTEST shard (TimelineBarrier
    semantics: nothing can be emitted past the slowest source). For a
    one-shot batch merge that silently truncating a longer shard would be
    event loss, so ``strict=True`` (default) raises when shards are unequal;
    ``strict=False`` is the tail-follow mode — call again after the laggard
    catches up and the new aligned indices merge idempotently (atomic
    per-segment replace)."""
    n_shards = len(shard_dirs)
    per_shard = [segment_paths(d) for d in shard_dirs]
    n_segs = min(len(p) for p in per_shard)
    if strict and any(len(p) != n_segs for p in per_shard):
        raise ValueError(
            f"unequal shard segment counts {[len(p) for p in per_shard]}; the "
            "timeline barrier would hold back the longer shards' tail — pass "
            "strict=False for incremental (tail-follow) merging"
        )
    os.makedirs(os.path.join(out_dir, "binlog"), exist_ok=True)

    items = [
        {
            "seg_index": i,
            "paths": [per_shard[s][i] for s in range(n_shards)],
            "out": os.path.join(out_dir, "binlog", f"segment_{i:05d}.parquet"),
        }
        for i in range(n_segs)
    ]

    def merge_one(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for row in batch.to_pylist():
            tables = []
            for shard_id, p in enumerate(row["paths"]):
                t = pq.read_table(p)
                glsn = pc.add(
                    pc.multiply(t["lsn"], pa.scalar(n_shards, type=pa.int64())),
                    pa.scalar(shard_id, type=pa.int64()),
                )
                t = t.set_column(t.schema.get_field_index("lsn"), "lsn", glsn)
                t = t.set_column(
                    t.schema.get_field_index("segment"),
                    "segment",
                    pa.array(
                        np.full(t.num_rows, row["seg_index"], dtype=np.int32)
                    ),
                )
                tables.append(t)
            merged = pa.concat_tables(tables)
            merged = merged.take(
                pc.sort_indices(merged, sort_keys=[("lsn", "ascending")])
            )
            tmp = row["out"] + ".tmp"
            pq.write_table(merged, tmp)
            os.replace(tmp, row["out"])
            outs.append({"out": row["out"], "rows": merged.num_rows})
        return pa.table(
            {
                "out": pa.array([o["out"] for o in outs]),
                "rows": pa.array([o["rows"] for o in outs], type=pa.int64()),
            }
        )

    (
        ray.data.from_items(items)
        .map_batches(merge_one, batch_format="pyarrow", batch_size=1)
        .materialize()
    )
    return [i["out"] for i in items]

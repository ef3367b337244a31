"""Append-only metrics stream + heartbeat-driven lag, per consumption cycle.

The analog of Canal's Prometheus collectors
(``prometheus/.../impl/{Entry,Store,Sink,Parser}Collector.java``): stable
metric names, monotone per-epoch samples, scrapeable storage. Here the
"exporter" is an append-only parquet directory under ``<lake>/_metrics/`` —
one file per consumption cycle (atomic rename), so a scraper can tail the
directory without coordination. Delivery is AT-LEAST-ONCE: the cycle file is
written BEFORE the epoch manifests (acks), so a crash in between re-runs the
cycle and re-emits a file whose counter samples are identical (the apply is
deterministic) while gauges (delay) re-sample; consumers dedup by
(epoch, partition_id, metric) keeping the latest sample. The inverse order
would silently LOSE the samples of any cycle acked right before a crash.

Liveness/delay follows Canal's heartbeat semantics
(``parse/.../inbound/AbstractEventParser.java:528-555``): every event —
including MHEARTBEAT rows that carry no DML — advances the source clock
(``execute_time``), so ``delay = now - max(execute_time acked)`` keeps
decaying on an idle-but-alive source. The per-epoch source clock comes from
parquet row-group statistics of the segment files (no data read), exactly
like the lsn ranges used for epoch planning.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# stable metric names (modeled on canal_instance_* collector families)
PUT_ROWS = "canal_instance_put_rows"  # events routed to the partition (epoch)
ACK_ROWS = "canal_instance_ack_rows"  # rows durably applied (delta rows)
POISON_ROWS = "canal_instance_poison_rows"
DDL_COUNT = "canal_instance_ddl_count"
SOURCE_CLOCK_MS = "canal_instance_source_clock_ms"  # max execute_time acked
APPLY_DELAY_MS = "canal_instance_apply_delay_ms"  # sample-time lag vs source

METRICS_SCHEMA = pa.schema(
    [
        pa.field("epoch", pa.int64()),
        pa.field("partition_id", pa.int32()),
        pa.field("metric", pa.string()),
        pa.field("value", pa.int64()),
        pa.field("sampled_at_ms", pa.int64()),
    ]
)


def metrics_dir(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_metrics")


class MetricsLog:
    """Writer/reader for the per-cycle metrics parquet files."""

    def __init__(self, lake_dir: str):
        self.dir = metrics_dir(lake_dir)

    def append_cycle(self, first_epoch: int, rows: list[dict]) -> str | None:
        """One atomic parquet file per cycle; idempotent on re-run."""
        if not rows:
            return None
        from canal_ray.sink import _atomic_write_parquet

        now_ms = int(time.time() * 1000)
        table = pa.table(
            {
                "epoch": pa.array([r["epoch"] for r in rows], type=pa.int64()),
                "partition_id": pa.array(
                    [r["partition_id"] for r in rows], type=pa.int32()
                ),
                "metric": pa.array([r["metric"] for r in rows], type=pa.string()),
                "value": pa.array([int(r["value"]) for r in rows], type=pa.int64()),
                "sampled_at_ms": pa.array([now_ms] * len(rows), type=pa.int64()),
            },
            schema=METRICS_SCHEMA,
        )
        path = os.path.join(self.dir, f"cycle_e{first_epoch:05d}.parquet")
        _atomic_write_parquet(table, path)
        return path

    def read(self) -> pd.DataFrame:
        if not os.path.isdir(self.dir):
            return METRICS_SCHEMA.empty_table().to_pandas()
        files = sorted(
            os.path.join(self.dir, n)
            for n in os.listdir(self.dir)
            if n.endswith(".parquet")
        )
        if not files:
            return METRICS_SCHEMA.empty_table().to_pandas()
        return pa.concat_tables(pq.read_table(f) for f in files).to_pandas()


def cycle_metric_rows(
    summaries: list[dict], epoch_clocks: dict[int, int]
) -> list[dict]:
    """Flatten per-(partition, epoch) apply summaries into metric samples.

    ``epoch_clocks`` maps epoch -> max execute_time (ms) from segment stats;
    the delay sample is computed against wall clock at write time (a gauge,
    not part of the deterministic replay contract).
    """
    now_ms = int(time.time() * 1000)
    rows: list[dict] = []
    for s in summaries:
        e, p = int(s["epoch"]), int(s["partition_id"])
        clock = int(epoch_clocks.get(e, 0))
        rows.append({"epoch": e, "partition_id": p, "metric": PUT_ROWS, "value": s["events"]})
        rows.append({"epoch": e, "partition_id": p, "metric": ACK_ROWS, "value": s.get("delta_rows", 0)})
        rows.append({"epoch": e, "partition_id": p, "metric": POISON_ROWS, "value": s.get("poison", 0)})
        rows.append({"epoch": e, "partition_id": p, "metric": DDL_COUNT, "value": s.get("ddls", 0)})
        rows.append({"epoch": e, "partition_id": p, "metric": SOURCE_CLOCK_MS, "value": clock})
        rows.append(
            {
                "epoch": e, "partition_id": p, "metric": APPLY_DELAY_MS,
                "value": max(0, now_ms - clock) if clock else 0,
            }
        )
    return rows

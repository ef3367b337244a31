"""Job configuration — the analog of Canal's ``instance.properties`` surface.

Reference knobs mirrored here (file:line in /root/reference):
  - subscribe filter regex (white/black):
    ``filter/.../aviater/AviaterRegexFilter.java:57-72``,
    ``parse/.../inbound/AbstractEventParser.java:56-63``
  - field (column) filter / blacklist: ``AbstractEventParser.java:569-589``
  - partition count + partition-hash key:
    ``connector/core/.../MQMessageUtils.java:558-599`` (we fix the key to the
    table PK ``(repo, path)``; see ``canal_ray.partition``)
  - batch sizing: ``canal.properties:36-56`` store bounds -> here Ray Data
    ``batch_size`` / block size.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CdcConfig:
    """Configuration for one CDC replay job (one Canal "destination")."""

    # --- I/O -------------------------------------------------------------
    log_dir: str  # directory of binlog segment parquet files (ordered)
    lake_dir: str  # output lake root (partition dirs + _checkpoints)
    base_table: str | None = None  # optional initial-snapshot parquet (ETL full load)

    # --- logical table ---------------------------------------------------
    schema_name: str = "mytest"
    table_name: str = "repos"
    pk_columns: tuple[str, str] = ("repo", "path")
    # initial payload schema as (name, arrow-type-string) pairs; evolved by DDL
    initial_schema: tuple[tuple[str, str], ...] = (
        ("repo", "string"),
        ("path", "string"),
        ("commit", "string"),
        ("lang", "string"),
        ("content", "string"),
    )

    # --- filters (AviaterRegexFilter analog) -----------------------------
    table_filter: str = r"mytest\.repos"  # whitelist regex on "schema.table"
    table_black_filter: str | None = None  # blacklist regex, applied after whitelist
    column_filter: tuple[str, ...] | None = None  # keep-only columns (beyond PK)
    # row-level content predicate (AviaterELFilter.java:20-44 analog),
    # compiled once and evaluated vectorized per decode batch over DML rows;
    # grammar + null semantics in canal_ray.rowfilter. None = no filter.
    row_filter: str | None = None

    # --- partitioning / shuffle ------------------------------------------
    num_partitions: int = 32
    # "scatter" (default): disk-based exchange via partition-bucketed
    #   lz4-IPC fragments — nothing accumulates in the object store, the
    #   configuration that survives a 10^10-event backlog replay (see
    #   canal_ray.scatter). "sort": Ray groupby sort-shuffle (the whole
    #   cycle transits the object store; fine for small jobs).
    exchange: str = "scatter"
    # overlap cycle i's gather/apply with cycle i+1's fused read->decode->
    # scatter (one-cycle lookahead; acks stay strictly in order because the
    # pending cycle is collected+acked before the next gather launches, and
    # before any manifest-only ack). The win is hiding gather IO WAITS —
    # on a real cluster the fragments live on shared storage and gather
    # tasks idle CPUs on network reads; on one box they read page cache and
    # never idle, so overlapping two bandwidth-bound phases just time-slices
    # them (measured: 26.3/27.0s sequential vs 27.4/30.8s pipelined on the
    # 24.4M-event replay at 32 CPUs, neutral at 8). Default OFF for the
    # single-box profile; turn ON for multi-node shared-storage deploys.
    # Forced OFF when downstream handlers are configured: their retry
    # contract is per-cycle-synchronous (EntryEventSink.java:176-209).
    # SCATTER EXCHANGE ONLY: with exchange="sort" there is no overlap
    # branch and CdcJob warns that cycles run sequentially.
    pipelined_cycles: bool = False

    # --- epoching / batching ---------------------------------------------
    epoch_segments: int = 4  # segments consumed per epoch (per ack point)
    # epochs batched through ONE shuffle per consumption cycle: amortizes the
    # per-pipeline barrier while keeping per-epoch checkpoints/resume. The
    # analog of serving several ack points from one getWithoutAck batch.
    epochs_per_cycle: int = 4
    decode_batch_size: int = 32 * 1024  # rows per decode batch
    # fold deltas into per-partition base files every N consumption cycles
    # (None = only on explicit compact()); bounds merge-on-read fan-in
    compact_every_cycles: int | None = None
    # EventTransactionBuffer analog: when True, epoch ack points are shifted
    # back to the last COMPLETE transaction boundary, so an ack never splits
    # a transaction even when transactions span segment files (the incomplete
    # tail is consumed by the next epoch, which re-reads the overlap segment
    # with an lsn window). Default False = epochs align to segments (sound
    # when the log generator guarantees txns never span segments).
    txn_aligned_epochs: bool = False

    # --- behavior flags ---------------------------------------------------
    filter_dml_insert: bool = False  # MysqlMultiStageCoprocessor.java:74-76
    filter_dml_update: bool = False
    filter_dml_delete: bool = False
    filter_ddl: bool = False  # LogEventConvert.java:98-105 (filterQueryDdl)
    # filterQueryDcl (LogEventConvert.java:98,383): DCL query entries
    # (GRANT/REVOKE/...) are dropped when True; when False they are
    # delivered to protocol clients as meta entries (no row/schema effect)
    filter_query_dcl: bool = False
    # minimal row images present (binlog_row_image=MINIMAL analog): UPDATE
    # events may carry only the changed columns; the sink folds patches
    # column-wise instead of row-level LWW, and decode pre-compaction is
    # disabled (a later patch does not supersede an earlier full image)
    partial_updates: bool = False
    hot_key_top_n: int = 8  # per-partition skew counter size (lineage)

    # downstream handler chain (CanalEventDownStreamHandler SPI analog) —
    # tuple of canal_ray.handlers.DownstreamHandler instances; before() runs
    # in the decode stage on workers, retry()/after() on the driver
    handlers: tuple = ()

    # free-form extras for experiments
    extras: dict = field(default_factory=dict)

    def payload_columns(self) -> list[str]:
        return [n for n, _ in self.initial_schema]

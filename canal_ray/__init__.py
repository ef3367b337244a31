"""canal_ray — a Ray-Data-native CDC / incremental-ingest engine.

A brand-new implementation (NOT a port) of the capabilities of the reference
Canal binlog-subscription framework (/root/reference, Java): a binlog-style
ordered change-event log is tailed as a stream of Arrow batches, decoded by a
stateless ``map_batches`` stage (the analog of
``parse/.../dbsync/LogEventConvert.java``), hash-partitioned by primary key
(the analog of ``connector/core/.../MQMessageUtils.java:252-347``) and applied
by per-partition sink workers performing last-writer-wins upsert into a
partitioned Parquet lake (the analog of
``client-adapter/rdb/.../RdbSyncService.java``), with DDL-driven additive
Arrow schema evolution (``parse/.../tsdb/MemoryTableMeta.java``) and
exactly-once effect via atomically-written, offset-fenced per-partition
checkpoints (``meta/.../FileMixedMetaManager.java``).

Everything here is built on public APIs only: ray.data, pyarrow, pandas,
numpy.
"""

from canal_ray.config import CdcConfig
from canal_ray.pipeline import CdcJob

__all__ = ["CdcConfig", "CdcJob"]

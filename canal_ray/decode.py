"""Stateless decode / filter / route stage — the LogEventConvert analog.

One vectorized ``map_batches`` function (zero-copy Arrow in/out) that performs,
per batch, what the reference does per event in its parse stage:

  - subscribe-filter by ``schema.table`` regex whitelist + blacklist
    (``filter/.../aviater/AviaterRegexFilter.java:57-72``; applied at parse
    time as in ``parse/.../dbsync/LogEventConvert.java:466-473``)
  - DML-class filters (``MysqlMultiStageCoprocessor.java:74-76``)
  - within-batch LWW pre-compaction: superseded events for the same PK are
    dropped before the shuffle (a combiner; Canal has no analog because its
    sink applies every event — this is the "pre-aggregate before groupby"
    scale optimization, cuts shuffle bytes for hot keys)
  - per-row partition routing by PK hash (``MQMessageUtils.java:252-347``)
  - DDL replication to every partition (Canal: partition 0 only — see
    ``canal_ray.partition`` docstring for why we differ)

The decode stage does NOT materialize typed payload columns — values stay in
Canal's stringly ``cols``/``vals`` transport until the sink applies them
against the DDL-evolved schema (``canal_ray.sink``), so the stage's output
schema is stable for the whole stream even across DDL.
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from canal_ray.config import CdcConfig
from canal_ray.partition import partition_ids

DECODED_EXTRA = pa.field("partition_id", pa.int32())


def make_decoder(cfg: CdcConfig) -> Callable[[pa.Table], pa.Table]:
    """Build the per-batch decode function (a closure; compiled regexes are
    captured once — cheap enough for stateless tasks, no actor needed)."""
    white = re.compile(cfg.table_filter, re.IGNORECASE) if cfg.table_filter else None
    black = (
        re.compile(cfg.table_black_filter, re.IGNORECASE)
        if cfg.table_black_filter
        else None
    )
    num_partitions = cfg.num_partitions
    drop_ops = set()
    if cfg.filter_dml_insert:
        drop_ops.add("INSERT")
    if cfg.filter_dml_update:
        drop_ops.add("UPDATE")
    if cfg.filter_dml_delete:
        drop_ops.add("DELETE")
    if cfg.filter_ddl:
        drop_ops.add("DDL")

    def decode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("partition_id", pa.array([], type=pa.int32()))
        # --- subscribe filter (schema.table regex, lowercased like Canal) ---
        # dictionary-encode first: the regex runs once per distinct identity
        # (a handful), not once per row
        ident = pc.binary_join_element_wise(
            pc.utf8_lower(batch["schema_name"]), pc.utf8_lower(batch["table_name"]), "."
        )
        d = pc.dictionary_encode(ident).combine_chunks()
        uniq = d.dictionary.to_pylist()
        codes = d.indices.to_numpy(zero_copy_only=False)
        per_uniq = np.ones(len(uniq), dtype=bool)
        if white is not None:
            per_uniq &= np.array([white.fullmatch(u) is not None for u in uniq])
        if black is not None:
            per_uniq &= np.array([black.fullmatch(u) is None for u in uniq])
        keep = per_uniq[codes]
        ops = batch["op"].to_numpy(zero_copy_only=False)
        if drop_ops:
            keep &= ~np.isin(ops, list(drop_ops))
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return batch.append_column("partition_id", pa.array([], type=pa.int32()))

        ops = batch["op"].to_numpy(zero_copy_only=False)
        is_ddl = ops == "DDL"
        dml = batch.filter(pa.array(~is_ddl))
        ddl = batch.filter(pa.array(is_ddl))

        out = []
        if dml.num_rows:
            # --- within-batch LWW pre-compaction (keep max-lsn per key) ---
            df = pd.DataFrame(
                {
                    "r": dml["pk_repo"].to_numpy(zero_copy_only=False),
                    "p": dml["pk_path"].to_numpy(zero_copy_only=False),
                    "lsn": dml["lsn"].to_numpy(),
                }
            )
            order = np.argsort(df["lsn"].to_numpy(), kind="stable")
            dml = dml.take(pa.array(order))
            df = df.iloc[order]
            last = ~df.duplicated(subset=["r", "p"], keep="last").to_numpy()
            dml = dml.filter(pa.array(last))
            # --- PK-hash routing ---
            pid = partition_ids(
                dml["pk_repo"].to_numpy(zero_copy_only=False),
                dml["pk_path"].to_numpy(zero_copy_only=False),
                num_partitions,
            )
            out.append(dml.append_column("partition_id", pa.array(pid, type=pa.int32())))
        if ddl.num_rows:
            # --- replicate DDL to every partition ---
            for j in range(num_partitions):
                out.append(
                    ddl.append_column(
                        "partition_id",
                        pa.array(np.full(ddl.num_rows, j, dtype=np.int32)),
                    )
                )
        if not out:
            sch = batch.schema.append(DECODED_EXTRA)
            return sch.empty_table()
        return pa.concat_tables(out)

    return decode

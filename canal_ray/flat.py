"""FlatMessage conversion — Canal's denormalized MQ JSON form.

The analog of ``protocol/.../FlatMessage.java:13-31`` +
``MQMessageUtils.messageConverter``: each decoded change event becomes a flat
record ``{id, database, table, pkNames, isDdl, type, es, ts, sql, data, old}``
with ``data`` as a column->string map (JSON-encoded here; values are already
strings per the Canal transport contract).

Implemented as a stateless vectorized ``map_batches`` over the decoded stream,
so any pipeline (or an external consumer) can take the engine's decode output
in the exact shape Canal's Kafka/RocketMQ consumers receive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FLAT_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64()),  # lsn (batch id analog)
        pa.field("database", pa.string()),
        pa.field("table", pa.string()),
        pa.field("pkNames", pa.list_(pa.string())),
        pa.field("isDdl", pa.bool_()),
        pa.field("type", pa.string()),  # INSERT/UPDATE/DELETE/DDL
        pa.field("es", pa.int64()),  # source event time (ms)
        pa.field("ts", pa.int64()),  # build time (ms) — deterministic: == es
        pa.field("sql", pa.string()),
        pa.field("data", pa.string()),  # JSON {col: strval} (after image)
        pa.field("old", pa.string()),  # JSON {col: strval} (pk-only pre-image)
    ]
)


def _json_records(frame) -> np.ndarray:
    """DataFrame -> one compact JSON object string per row (C serializer)."""
    txt = frame.to_json(orient="records", lines=True, force_ascii=False)
    return np.array(txt.rstrip("\n").split("\n"), dtype=object)


def to_flat_messages(batch: pa.Table) -> pa.Table:
    """Vectorized log-format -> FlatMessage-format conversion.

    The ``data``/``old`` JSON objects are built with pandas' C serializer —
    one ``to_json`` call per distinct column set (column sets change only at
    schema epochs, so a batch has a handful) instead of ``json.dumps`` per
    row. Output is compact JSON with sorted keys, matching the reference's
    FastJSON producer (``MQMessageUtils.messageConverter``) more closely
    than pretty-separated ``json.dumps`` did.
    """
    import pandas as pd

    n = batch.num_rows
    ops = batch["op"].to_numpy(zero_copy_only=False)
    col_list = batch["cols"].combine_chunks()
    cols = col_list.to_pylist()
    vals_list = batch["vals"].combine_chunks()
    flat_vals = vals_list.values
    val_off = vals_list.offsets.to_numpy()
    pk_repo = batch["pk_repo"].to_numpy(zero_copy_only=False)
    pk_path = batch["pk_path"].to_numpy(zero_copy_only=False)

    data = np.full(n, None, dtype=object)
    old = np.full(n, None, dtype=object)

    # --- data: group rows by their column set (changes only at schema
    # epochs), gather each group's values with one Arrow take, serialize the
    # whole group with one C to_json call
    groups: dict[tuple, list[int]] = {}
    dml = (ops == "INSERT") | (ops == "UPDATE")
    for i in np.flatnonzero(dml):
        if cols[i] is not None:
            groups.setdefault(tuple(cols[i]), []).append(i)
    for key_tuple, idx_list in groups.items():
        idxs = np.asarray(idx_list, dtype=np.int64)
        order = np.argsort(np.asarray(key_tuple, dtype=object), kind="stable")
        take_ix = (val_off[idxs][:, None] + order[None, :]).ravel()
        taken = (
            flat_vals.take(pa.array(take_ix))
            .to_numpy(zero_copy_only=False)
            .reshape(len(idxs), len(order))
        )
        frame = pd.DataFrame(
            {key_tuple[j]: taken[:, k] for k, j in enumerate(order)}
        )
        data[idxs] = _json_records(frame)

    # --- old: pk-only pre-image for UPDATE/DELETE (sorted keys: path, repo)
    ud = np.flatnonzero((ops == "UPDATE") | (ops == "DELETE"))
    if len(ud):
        old[ud] = _json_records(
            pd.DataFrame({"path": pk_path[ud], "repo": pk_repo[ud]})
        )

    es = pc.cast(pc.cast(batch["execute_time"], pa.int64()), pa.int64())
    pk_names = pa.array([["repo", "path"]] * n, type=pa.list_(pa.string()))
    return pa.table(
        {
            "id": batch["lsn"],
            "database": batch["schema_name"],
            "table": batch["table_name"],
            "pkNames": pk_names,
            "isDdl": pa.array((ops == "DDL") | (ops == "TRUNCATE")),  # query-event classes
            "type": batch["op"],
            "es": es,
            "ts": es,
            "sql": batch["ddl_sql"],
            "data": pa.array(list(data), type=pa.string()),
            "old": pa.array(list(old), type=pa.string()),
        },
        schema=FLAT_SCHEMA,
    )


def flat_message_dataset(log_ds):
    """RAW-log-format Dataset -> FlatMessage Dataset.

    Input must carry the raw wire columns (cols/schema_name/table_name/
    execute_time, per loggen.LOG_SCHEMA) — the engine's post-decode format
    (decode.DECODED_SCHEMA) drops them and is NOT accepted here."""
    return log_ds.map_batches(to_flat_messages, batch_format="pyarrow")


def produce_flat_json(log_dir: str, out_dir: str) -> int:
    """MQ-producer analog: serialize the log as partitioned FlatMessage JSON.

    The counterpart of ``CanalKafkaProducer.send`` with flatMessage=true
    (``connector/kafka-connector/.../CanalKafkaProducer.java:139-268``) —
    here the "topic" is a JSON-lines directory; delivery atomicity comes from
    Ray Data's per-block file writes + the caller's cursor (epoch manifests).
    Returns the number of messages produced.
    """
    import ray.data

    from canal_ray.checkpoint import list_numbered

    ds = ray.data.read_parquet(list_numbered(log_dir))
    # count from parquet metadata BEFORE the 1:1 conversion: counting the
    # converted dataset would re-run the whole read+encode DAG a second time
    n = ds.count()
    flat_message_dataset(ds).write_json(out_dir)
    return n

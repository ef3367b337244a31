"""CDC engine smoke pipeline exposed through the driver's queries() gate.

Generates a small deterministic binlog fixture under /tmp, runs the full
engine (bootstrap + replay + schema evolution + checkpoints), verifies the
result against the sequential oracle in-process, and returns the final lake
state. Rows-only at the driver (the fixture isn't a registered SQL view), but
the oracle equality assert runs on every invocation.
"""

from __future__ import annotations

import os

import pandas as pd

from canal_ray.ops.util import self_oracle_enabled

# incl. one RENAME + one DROP so the smoke exercises the full DDL dialect
# (rename/drop streams require partial_updates=True — deep image check)
_PARAMS = dict(
    n_base=2_000, n_events=20_000, n_segments=4, seed=77,
    rename_at=0.55, drop_at=0.8,
)


def cdc_replay_smoke(sf_dir: str) -> pd.DataFrame:
    from canal_ray.config import CdcConfig
    from canal_ray.loggen import generate_fixture
    from canal_ray.oracle import replay_oracle, state_digest
    from canal_ray.pipeline import CdcJob

    import hashlib
    import json

    from canal_ray.sink import DELTA_FORMAT_VERSION

    root = "/tmp/canal_ray_smoke"
    fix = os.path.join(root, "fixture")
    meta = generate_fixture(fix, **_PARAMS)
    # key the lake to fixture content + delta format: a regenerated fixture
    # or a format change must NOT be served by a stale (fenced) lake
    key = hashlib.sha256(
        json.dumps([meta["params"], DELTA_FORMAT_VERSION], sort_keys=True).encode()
    ).hexdigest()[:12]
    lake = os.path.join(root, f"lake_{key}")
    cfg = CdcConfig(
        log_dir=os.path.join(fix, "binlog"),
        lake_dir=lake,
        base_table=os.path.join(fix, "base", "repos.parquet"),
        num_partitions=8,
        epoch_segments=2,
        partial_updates=True,  # required: the log carries RENAME/DROP DDL
    )
    job = CdcJob(cfg)
    job.run()  # idempotent: a pre-existing complete lake is fully fenced
    eng = job.state_pandas()
    # hard gate, every call — size-gated so a scaled-up fixture can't be
    # killed by its own sequential-replay oracle
    if self_oracle_enabled(int(_PARAMS["n_events"]), "cdc_replay_smoke"):
        oracle_df, _ = replay_oracle(fix, list(cfg.initial_schema))
        if state_digest(eng) != state_digest(oracle_df):
            raise AssertionError("CDC replay state diverged from sequential oracle")
    return eng.drop(columns=["content"])  # keep the result driver-friendly


def cdc_row_filter_smoke(sf_dir: str) -> pd.DataFrame:
    """Row-level predicate replay (AviaterELFilter analog): replays the smoke
    fixture keeping only python-language events (plus all deletes — they
    carry no image, like Canal's before-image-only DELETE) and asserts the
    lake equals the unfiltered sequential oracle restricted to the python
    language (key-stable in the fixture). The smoke log RENAMEs ``lang`` to
    ``language`` mid-stream; a content predicate matches an event's OWN-era
    column names (exactly the reference's EL filter semantics), so the
    predicate names both eras. Rows-only at the driver; the oracle equality
    assert runs in-process on every call."""
    import hashlib
    import json

    from canal_ray.config import CdcConfig
    from canal_ray.loggen import generate_fixture
    from canal_ray.oracle import replay_oracle, state_digest
    from canal_ray.pipeline import CdcJob
    from canal_ray.sink import DELTA_FORMAT_VERSION

    root = "/tmp/canal_ray_smoke"
    fix = os.path.join(root, "fixture")
    meta = generate_fixture(fix, **_PARAMS)
    predicate = "op == 'DELETE' or lang == 'python' or language == 'python'"
    key = hashlib.sha256(
        json.dumps(
            [meta["params"], DELTA_FORMAT_VERSION, predicate], sort_keys=True
        ).encode()
    ).hexdigest()[:12]
    lake = os.path.join(root, f"lake_rf_{key}")
    cfg = CdcConfig(
        log_dir=os.path.join(fix, "binlog"), lake_dir=lake,
        base_table=os.path.join(fix, "base", "repos.parquet"),
        num_partitions=8, epoch_segments=2, partial_updates=True,
        row_filter=predicate,
    )
    job = CdcJob(cfg)
    job.run()  # fenced no-op when already complete
    eng = job.state_pandas()
    if self_oracle_enabled(int(_PARAMS["n_events"]), "cdc_row_filter_smoke"):
        oracle_df, _ = replay_oracle(fix, list(cfg.initial_schema))
        want = oracle_df[oracle_df["language"] == "python"].reset_index(drop=True)
        if state_digest(eng) != state_digest(want):
            raise AssertionError("row-filtered replay diverged from filtered oracle")
    return eng.drop(columns=["content"])


def cdc_schema_timeline(sf_dir: str) -> pd.DataFrame:
    """Point-in-time schema (DatabaseTableMeta.rollback analog): every DDL
    change point of the smoke log with lsn + fingerprint, asserting
    ``schema_as_of`` at the last lsn equals the engine's final schema. The
    per-position equivalence vs a sequential oracle is tests/test_tsdb.py."""
    from canal_ray.config import CdcConfig
    from canal_ray.loggen import generate_fixture
    from canal_ray.tsdb import schema_as_of, schema_timeline

    root = "/tmp/canal_ray_smoke"
    fix = os.path.join(root, "fixture")
    meta = generate_fixture(fix, **_PARAMS)
    cfg = CdcConfig(
        log_dir=os.path.join(fix, "binlog"), lake_dir=os.path.join(root, "nolake"),
        partial_updates=True,
    )
    tl = schema_timeline(cfg)
    final = schema_as_of(cfg, meta["last_lsn"], use_checkpoints=False)
    if tl[-1]["fingerprint"] != final.fingerprint():
        raise AssertionError("schema timeline end diverged from schema_as_of")
    return pd.DataFrame(
        {
            "lsn": [t["lsn"] for t in tl],
            "ddl_sql": [t["ddl_sql"] for t in tl],
            "fingerprint": [t["fingerprint"] for t in tl],
            "n_active_columns": [
                sum(
                    1
                    for c in (
                        t["columns"]["slots"]
                        if isinstance(t["columns"], dict)
                        else t["columns"]
                    )
                    if len(c) == 2 or not c[2]
                )
                for t in tl
            ],
        }
    )


def cdc_derived_rename_stats(sf_dir: str) -> pd.DataFrame:
    """ES-adapter analog over the RENAME/DROP smoke fixture: per-language
    aggregate table incrementally maintained off a change stream whose spec
    names the PRE-rename column (ESSyncService.java:36-796 shape), verified
    in-process against a full recompute on every call. Rows-only at the
    driver (the fixture isn't a registered SQL view); the SQL-oracled
    variant of the same derived-table machinery is
    ``cdc_derived_lang_stats``; the staged incremental path is asserted in
    tests/test_derived.py."""
    import shutil

    from canal_ray.config import CdcConfig
    from canal_ray.derived import DerivedTable
    from canal_ray.loggen import generate_fixture
    from canal_ray.pipeline import CdcJob

    import hashlib
    import json

    from canal_ray.sink import DELTA_FORMAT_VERSION

    root = "/tmp/canal_ray_smoke"
    fix = os.path.join(root, "fixture")
    meta = generate_fixture(fix, **_PARAMS)
    key = hashlib.sha256(
        json.dumps([meta["params"], DELTA_FORMAT_VERSION], sort_keys=True).encode()
    ).hexdigest()[:12]
    lake = os.path.join(root, f"lake_{key}")
    cfg = CdcConfig(
        log_dir=os.path.join(fix, "binlog"), lake_dir=lake,
        base_table=os.path.join(fix, "base", "repos.parquet"),
        num_partitions=8, epoch_segments=2, partial_updates=True,
    )
    job = CdcJob(cfg)
    job.run()  # fenced no-op when the smoke lake is already complete
    shutil.rmtree(os.path.join(lake, "_derived"), ignore_errors=True)
    # spec names the PRE-rename column ('lang'); resolution follows the
    # rename, the output surface stays stable
    dt = DerivedTable(
        lake, "lang_stats", "lang",
        [("n_files", "count", None), ("total_chars", "strlen", "content"),
         ("total_stars", "sum", "stars")],
    )
    inc = dt.update(job)
    full = dt.recompute(job)
    if not inc.reset_index(drop=True).equals(full.reset_index(drop=True)):
        raise AssertionError("incremental derived table diverged from recompute")
    return inc


def _event_stream_job(
    sf_dir: str,
    table: str,
    payload: list[tuple[str, str]],
    vals_fn,
    cache_root: str,
    cache_tag: str,
    read_extra: tuple[str, ...],
    src_table: str = "events",
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    ts_col: str | None = "ts",
):
    """Shared builder for the ``events``-derived change-stream lakes: read
    the registered table in (ts, event_id) order, synthesize a 4-segment
    binlog of per-user upserts with the given payload columns, replay it
    through the full engine into a /tmp lake cached by (input identity,
    delta format, tag). Returns ``(job, n_events)``; ``job.run()`` is a
    fenced no-op on a complete lake. All such lakes are co-partitioned
    (same pk, same partition count) — the joined-derived precondition."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from canal_ray.config import CdcConfig
    from canal_ray.loggen import LOG_SCHEMA
    from canal_ray.pipeline import CdcJob
    from canal_ray.sink import DELTA_FORMAT_VERSION

    read_cols = list(dict.fromkeys([*order_cols, key_col, *read_extra]))
    df = pd.read_parquet(
        os.path.join(sf_dir, f"{src_table}.parquet"), columns=read_cols
    ).sort_values(list(order_cols)).reset_index(drop=True)
    n = len(df)
    key = hashlib.sha256(
        f"{sf_dir}|{n}|{int(df[order_cols[-1]].iloc[-1]) if n else 0}|"
        f"{DELTA_FORMAT_VERSION}|{cache_tag}".encode()
    ).hexdigest()[:12]
    root = f"/tmp/{cache_root}_{key}"
    log_dir = os.path.join(root, "binlog")
    lake = os.path.join(root, "lake")

    col_names = ["uid", "utag"] + [name for name, _ in payload]
    n_segments = 4
    if not os.path.isdir(log_dir) or len(os.listdir(log_dir)) < n_segments:
        os.makedirs(log_dir, exist_ok=True)
        uid = df[key_col].astype(str).to_numpy(dtype=object)
        payload_vals = vals_fn(df)  # list of object arrays, aligned with df
        lsn = np.arange(1, n + 1, dtype=np.int64)
        bounds = np.linspace(0, n, n_segments + 1).astype(int)
        for s in range(n_segments):
            a, b = bounds[s], bounds[s + 1]
            m = b - a
            t = pa.table(
                {
                    "lsn": pa.array(lsn[a:b]),
                    "segment": pa.array(np.full(m, s, dtype=np.int32)),
                    "txn_id": pa.array(lsn[a:b]),
                    "gtid": pa.nulls(m, type=pa.string()),
                    "op": pa.array(["UPDATE"] * m),
                    "schema_name": pa.array(["appdb"] * m),
                    "table_name": pa.array([table] * m),
                    "pk_repo": pa.array(uid[a:b], type=pa.string()),
                    "pk_path": pa.array([""] * m),
                    "cols": pa.array([col_names] * m, type=pa.list_(pa.string())),
                    "vals": pa.array(
                        [
                            [uid[i], ""] + [v[i] for v in payload_vals]
                            for i in range(a, b)
                        ],
                        type=pa.list_(pa.string()),
                    ),
                    "ddl_sql": pa.nulls(m, type=pa.string()),
                    "execute_time": pa.array(
                        df[ts_col].iloc[a:b].astype("datetime64[ms]").to_numpy()
                        if ts_col is not None
                        # sources without an event time (e.g. the documents
                        # stream) get a deterministic synthetic clock
                        else np.datetime64("2020-01-01", "ms")
                        + lsn[a:b].astype("timedelta64[ms]")
                    ),
                },
                schema=LOG_SCHEMA,
            )
            pq.write_table(t, os.path.join(log_dir, f"segment_{s:05d}.parquet"))

    cfg = CdcConfig(
        log_dir=log_dir, lake_dir=lake,
        schema_name="appdb", table_name=table,
        pk_columns=("uid", "utag"),
        initial_schema=(
            ("uid", "string"), ("utag", "string"),
            *[(name, typ) for name, typ in payload],
        ),
        table_filter=rf"appdb\.{table}",
        num_partitions=8, epoch_segments=1,
    )
    job = CdcJob(cfg)
    job.run()  # fenced no-op when the lake is already complete
    return job, n


def _evstream_job(sf_dir: str):
    """FACT stream: per-user latest (event_type, value_c) state — the
    ``cdc_latest_state_by_user`` semantics, deterministic from ``events``."""
    import numpy as np

    def vals(df):
        value_c = np.round(df["value"].to_numpy() * 10_000).astype(np.int64)
        return [
            df["event_type"].to_numpy(dtype=object),
            np.array([str(v) for v in value_c], dtype=object),
        ]

    return _event_stream_job(
        sf_dir, "events",
        [("event_type", "string"), ("value_c", "int64")],
        vals, "canal_ray_evstream", "v1",
        read_extra=("event_type", "value"),
    )


def _docstream_job(sf_dir: str):
    """DOCUMENT stream: every document of the registered ``documents`` table
    INSERT-upserted once, keyed by doc_id, carrying (lang, source, n_chars)
    — deterministic, so the derived lake is SQL-oracle-checkable against
    the table itself."""
    import numpy as np

    def vals(df):
        return [
            df["lang"].to_numpy(dtype=object),
            df["source"].to_numpy(dtype=object),
            np.array([str(v) for v in df["n_chars"].to_numpy()], dtype=object),
        ]

    return _event_stream_job(
        sf_dir, "documents",
        [("lang", "string"), ("source", "string"), ("n_chars", "int64")],
        vals, "canal_ray_docstream", "v1",
        read_extra=("lang", "source", "n_chars"),
        src_table="documents", key_col="doc_id", order_cols=("doc_id",),
        ts_col=None,
    )


def cdc_derived_lang_stats(sf_dir: str) -> pd.DataFrame:
    """Derived-table path with a FULL SQL oracle (the ES-adapter lang_stats
    surface): the registered ``documents`` table replayed as a change
    stream through the whole engine (decode -> shuffle -> LWW sink ->
    checkpoints) into a lake, then an incrementally maintained per-language
    aggregate (``DerivedTable``) counts docs and sums characters. DuckDB
    expresses it as a plain GROUP BY over ``documents`` (each doc upserts
    exactly once, so latest-per-key == the table). Incremental-vs-recompute
    equality is asserted in-process on every call, same as
    ``cdc_derived_event_stats``."""
    from canal_ray.derived import DerivedTable

    job, _ = _docstream_job(sf_dir)
    dt = DerivedTable(
        job.cfg.lake_dir, "lang_stats", "lang",
        [("n_docs", "count", None), ("total_chars", "sum", "n_chars")],
    )
    inc = dt.update(job)
    full = dt.recompute(job)
    if not inc.reset_index(drop=True).equals(full.reset_index(drop=True)):
        raise AssertionError("incremental derived table diverged from recompute")
    return inc[["lang", "n_docs", "total_chars"]]


def cdc_derived_event_stats(sf_dir: str) -> pd.DataFrame:
    """Derived-table path with a FULL SQL oracle: the ``events`` change
    stream replayed through the whole engine (decode -> shuffle -> LWW sink
    -> checkpoints) into a lake, and an incrementally maintained aggregate
    (``DerivedTable``) groups the LATEST per-user state by event_type.
    DuckDB expresses it as QUALIFY latest-per-key, then aggregate.
    """
    from canal_ray.derived import DerivedTable

    job, _ = _evstream_job(sf_dir)
    dt = DerivedTable(
        job.cfg.lake_dir, "event_type_stats", "event_type",
        [("n_users", "count", None), ("total_value_c", "sum", "value_c")],
    )
    inc = dt.update(job)
    full = dt.recompute(job)
    if not inc.reset_index(drop=True).equals(full.reset_index(drop=True)):
        raise AssertionError("incremental derived table diverged from recompute")
    return inc[["event_type", "n_users", "total_value_c"]]


def cdc_state_as_of(sf_dir: str) -> pd.DataFrame:
    """Point-in-time read with a FULL SQL oracle: the ``events`` change
    stream replayed through the engine, then ``CdcJob.state_as_of`` rebuilds
    the per-user state at the position 60% through the log — the DATA half
    of the reference's ``DatabaseTableMeta.rollback(position)``
    (``tsdb/DatabaseTableMeta.java:161-181``). The stream's lsn equals the
    (ts, event_id) rank, so DuckDB expresses the cut as a row_number()
    window filtered to rn <= floor(0.6 * n), then latest-per-key.
    """
    job, n = _evstream_job(sf_dir)
    cut = int(n * 0.6)
    df = job.state_as_of(cut)
    out = df[["uid", "event_type", "value_c"]].copy()
    out["value_c"] = out["value_c"].astype("int64")
    return out.sort_values("uid").reset_index(drop=True)


def cdc_connector_drain(sf_dir: str) -> pd.DataFrame:
    """Consumer-protocol smoke: drain the smoke fixture's log through the
    get/ack cursor protocol (``canal_ray.connector``), a fresh client each
    call; returns per-op event counts. The cursor/redelivery semantics are
    asserted in tests/test_connector.py; here the protocol runs end-to-end."""
    import shutil

    import pyarrow as pa

    from canal_ray.config import CdcConfig
    from canal_ray.connector import CdcConnector
    from canal_ray.loggen import generate_fixture

    root = "/tmp/canal_ray_smoke"
    fix = os.path.join(root, "fixture")
    generate_fixture(fix, **_PARAMS)
    meta_dir = os.path.join(root, "connector_meta")
    shutil.rmtree(meta_dir, ignore_errors=True)  # fresh cursor every call
    cfg = CdcConfig(
        log_dir=os.path.join(fix, "binlog"), lake_dir=meta_dir,
        num_partitions=8, epoch_segments=2,
    )
    conn = CdcConnector(cfg, client_id="drain")
    tables = [t for _, t in conn.drain()]
    all_events = pa.concat_tables(tables)
    df = (
        all_events.to_pandas()
        .groupby("op", as_index=False)
        .agg(n_events=("lsn", "size"), lsn_min=("lsn", "min"), lsn_max=("lsn", "max"))
        .sort_values("op")
        .reset_index(drop=True)
    )
    df["acked_epoch"] = conn.acked_epoch()
    return df


def cdc_flat_produce(sf_dir: str) -> pd.DataFrame:
    """MQ-producer surface through the driver gate: the smoke fixture's log
    serialized as partitioned FlatMessage JSON (``CanalKafkaProducer.send``
    with flatMessage=true analog). Returns per-op message counts, asserted
    in-process against the log's own parquet column — the producer must be
    1:1 and lossless. Rows-only at the driver; self-oracled every call."""
    import collections
    import glob
    import json as _json
    import shutil

    import pyarrow.parquet as pq

    from canal_ray.flat import produce_flat_json
    from canal_ray.loggen import generate_fixture

    root = "/tmp/canal_ray_smoke"
    fix = os.path.join(root, "fixture")
    generate_fixture(fix, **_PARAMS)
    out = os.path.join(root, "flat_out")
    shutil.rmtree(out, ignore_errors=True)
    n = produce_flat_json(os.path.join(fix, "binlog"), out)

    got: collections.Counter = collections.Counter()
    for path in glob.glob(os.path.join(out, "*.json")):
        with open(path) as f:
            for line in f:
                got[_json.loads(line)["type"]] += 1
    if self_oracle_enabled(int(_PARAMS["n_events"]), "cdc_flat_produce"):
        want: collections.Counter = collections.Counter()
        for seg in sorted(glob.glob(os.path.join(fix, "binlog", "*.parquet"))):
            ops = pq.read_table(seg, columns=["op"])["op"].to_pylist()
            want.update(ops)
        if sum(got.values()) != n or got != want:
            raise AssertionError(f"FlatMessage producer lost events: {got} != {want}")
    return (
        pd.DataFrame(
            {"op": list(got.keys()), "n_messages": [got[k] for k in got]}
        )
        .sort_values("op")
        .reset_index(drop=True)
    )


def cdc_metrics_stream(sf_dir: str) -> pd.DataFrame:
    """Prometheus-collector surface through the driver gate (the
    ``prometheus/.../impl/*Collector.java`` analog): the append-only metrics
    stream written by the smoke replay, deduped per the at-least-once
    contract ((epoch, partition, metric) keep-latest), folded to per-metric
    counter totals. Asserts the scrapeable stream agrees with the engine's
    OTHER persisted surface — the checkpoint manifests' ``events_applied``
    (``CdcJob.lineage()``) — two independently written records of the same
    replay. Rows-only at the driver; the cross-check runs every call."""
    import hashlib
    import json as _json

    from canal_ray.config import CdcConfig
    from canal_ray.loggen import generate_fixture
    from canal_ray.metrics import PUT_ROWS, MetricsLog
    from canal_ray.pipeline import CdcJob
    from canal_ray.sink import DELTA_FORMAT_VERSION

    cdc_replay_smoke(sf_dir)  # ensures the smoke lake + metrics exist

    root = "/tmp/canal_ray_smoke"
    fix = os.path.join(root, "fixture")
    meta = generate_fixture(fix, **_PARAMS)
    key = hashlib.sha256(
        _json.dumps([meta["params"], DELTA_FORMAT_VERSION], sort_keys=True).encode()
    ).hexdigest()[:12]
    lake = os.path.join(root, f"lake_{key}")

    df = MetricsLog(lake).read()
    # at-least-once delivery: a re-run cycle re-emits identical counter
    # samples; consumers dedup by (epoch, partition, metric) keeping latest
    df = (
        df.sort_values("sampled_at_ms")
        .drop_duplicates(["epoch", "partition_id", "metric"], keep="last")
    )
    counters = df[~df["metric"].str.contains("delay|clock", regex=True)]
    out = (
        counters.groupby("metric", as_index=False)["value"]
        .sum()
        .sort_values("metric")
        .reset_index(drop=True)
    )

    cfg = CdcConfig(
        log_dir=os.path.join(fix, "binlog"), lake_dir=lake,
        base_table=os.path.join(fix, "base", "repos.parquet"),
        num_partitions=8, epoch_segments=2, partial_updates=True,
    )
    want = int(CdcJob(cfg).lineage()["total_events_applied"])
    got = int(out.loc[out["metric"] == PUT_ROWS, "value"].sum())
    if got != want or got <= 0:
        raise AssertionError(
            f"metrics stream ({got}) disagrees with checkpoint manifests ({want})"
        )
    return out


def cdc_group_merge(sf_dir: str) -> pd.DataFrame:
    """Sharded-source fan-in through the driver gate (GroupEventParser /
    GroupEventSink timeline-barrier analog, ``canal_ray.group``): two
    deterministic shard logs k-way merged into one global stream, replayed
    through the full engine, and asserted equal to the sequential oracle
    over the merged log on every call. Returns per-op event counts of the
    merged stream plus the final lake row count. Rows-only at the driver;
    self-oracled in-process."""
    import glob
    import hashlib
    import json as _json

    import pyarrow.parquet as pq

    from canal_ray.config import CdcConfig
    from canal_ray.group import merge_shard_logs
    from canal_ray.loggen import generate_fixture
    from canal_ray.oracle import replay_oracle, state_digest
    from canal_ray.pipeline import CdcJob
    from canal_ray.sink import DELTA_FORMAT_VERSION

    params = dict(n_base=400, n_events=6_000, n_segments=4)
    root = "/tmp/canal_ray_group"
    shards, metas = [], []
    for i, seed in enumerate((41, 43)):
        d = os.path.join(root, f"shard{i}")
        metas.append(generate_fixture(d, seed=seed, **params))
        shards.append(d)
    key = hashlib.sha256(
        _json.dumps(
            [[m["params"] for m in metas], DELTA_FORMAT_VERSION], sort_keys=True
        ).encode()
    ).hexdigest()[:12]
    merged = os.path.join(root, f"merged_{key}")
    # a crash mid-merge leaves the directory present but incomplete (the
    # merge writes segments as unordered tasks) — guard on the COUNT, like
    # _evstream_job; merge_shard_logs replaces per segment, so re-running
    # over a partial directory is idempotent
    mdir = os.path.join(merged, "binlog")
    if not os.path.isdir(mdir) or len(
        [n for n in os.listdir(mdir) if n.endswith(".parquet")]
    ) < params["n_segments"]:
        merge_shard_logs(shards, merged)
    # base-less replay: shard bases collide at glsn 0 (see
    # tests/test_tail_and_group.py for why a merged base is ambiguous)
    os.makedirs(os.path.join(merged, "base"), exist_ok=True)
    base = os.path.join(merged, "base", "repos.parquet")
    if not os.path.exists(base):
        empty = pq.read_table(
            os.path.join(shards[0], "base", "repos.parquet")
        ).slice(0, 0)
        pq.write_table(empty, base)

    cfg = CdcConfig(
        log_dir=os.path.join(merged, "binlog"),
        lake_dir=os.path.join(merged, "lake"),
        base_table=None, num_partitions=8, epoch_segments=2,
    )
    job = CdcJob(cfg)
    job.run()  # fenced no-op when the merged lake is already complete
    eng = job.state_pandas()
    if self_oracle_enabled(
        2 * int(params["n_events"]), "cdc_group_merge"
    ):
        oracle_df, oracle_schema = replay_oracle(merged, list(cfg.initial_schema))
        if state_digest(eng) != state_digest(oracle_df):
            raise AssertionError("group-merged replay diverged from sequential oracle")
        if job.final_schema() != oracle_schema:
            raise AssertionError("group-merged schema diverged from oracle schema")

    want: dict = {}
    for seg in sorted(glob.glob(os.path.join(merged, "binlog", "*.parquet"))):
        for op in pq.read_table(seg, columns=["op"])["op"].to_pylist():
            want[op] = want.get(op, 0) + 1
    out = (
        pd.DataFrame({"op": list(want), "n_events": [want[k] for k in want]})
        .sort_values("op")
        .reset_index(drop=True)
    )
    out["final_rows"] = len(eng)
    return out


def _evdim_job(sf_dir: str):
    """DIMENSION stream for the join-derived path: the same registered
    ``events`` ordering replayed as a (uid -> event_type) membership stream
    into its OWN lake (co-partitioned with ``_evstream_job``'s fact lake —
    the shared builder guarantees it). Cached/fenced like the fact lake."""
    job, _ = _event_stream_job(
        sf_dir, "user_dim",
        [("event_type", "string")],
        lambda df: [df["event_type"].to_numpy(dtype=object)],
        "canal_ray_evdim", "dim-v1",
        read_extra=("event_type",),
    )
    return job


def cdc_joined_derived_stats(sf_dir: str) -> pd.DataFrame:
    """Join-table derived maintenance (the ESSyncService ``updateByQuery``
    analog, ``canal_ray.derived_join``) with a FULL SQL oracle: the fact
    stream (uid -> value_c) and the dimension stream (uid -> event_type)
    replayed into two co-partitioned lakes, then the per-group aggregate is
    maintained from the TWO change streams — a key whose dimension row
    changes group moves its whole fact contribution. Verified in-process
    against the full-join recompute on every call; the staged incremental
    path (group moves between updates) is tests/test_derived_join.py."""
    from canal_ray.derived_join import JoinedDerivedTable

    fact_job, _ = _evstream_job(sf_dir)
    dim_job = _evdim_job(sf_dir)

    jd = JoinedDerivedTable(
        fact_job, dim_job, "evt_stats_join", "event_type",
        [("n_users", "count", None), ("total_value_c", "sum", "value_c")],
    )
    if os.path.exists(jd._cursor_path):  # exercise a fresh fold every call
        os.unlink(jd._cursor_path)
    inc = jd.update()
    full = jd.recompute()
    if not inc.reset_index(drop=True).equals(full.reset_index(drop=True)):
        raise AssertionError("joined derived table diverged from full recompute")
    return inc[["event_type", "n_users", "total_value_c"]]


def _embstream_fixture(sf_dir: str):
    """Deterministic EMBEDDING change stream from the registered
    ``embeddings`` table: every vector INSERTed (lsn order = vec_id), then a
    deterministic subset re-embedded (UPDATE with the components rolled by
    one — a new vector that usually lands in a DIFFERENT IVF bucket) and a
    subset DELETEd — the workload an "index follows the table" consumer
    must absorb. Returns ``(CdcConfig, n_events)``; segments are cached by
    input identity + delta format."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from canal_ray.config import CdcConfig
    from canal_ray.loggen import LOG_SCHEMA
    from canal_ray.sink import DELTA_FORMAT_VERSION

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}|"
        f"{DELTA_FORMAT_VERSION}|embstream_v1".encode()
    ).hexdigest()[:12]
    root = f"/tmp/canal_ray_embstream_{key}"
    log_dir = os.path.join(root, "binlog")

    df = pd.read_parquet(src, columns=["vec_id", "embedding"]).sort_values("vec_id")
    vids = df["vec_id"].to_numpy()
    vecs = [np.asarray(v, dtype=np.float64) for v in df["embedding"]]

    def emb_str(v) -> str:
        return ",".join(str(float(x)) for x in v)

    # event plan, in lsn order: all inserts, then updates (%5), then deletes (%9)
    events: list[tuple[str, int, str | None]] = []
    for i, vid in enumerate(vids):
        events.append(("INSERT", int(vid), emb_str(vecs[i])))
    for i, vid in enumerate(vids):
        if vid % 5 == 0:
            events.append(("UPDATE", int(vid), emb_str(np.roll(vecs[i], 1))))
    for vid in vids:
        if vid % 9 == 0:
            events.append(("DELETE", int(vid), None))
    n = len(events)

    n_segments = 4
    if not os.path.isdir(log_dir) or len(
        [f for f in os.listdir(log_dir) if f.endswith(".parquet")]
    ) < n_segments:
        os.makedirs(log_dir, exist_ok=True)
        bounds = np.linspace(0, n, n_segments + 1).astype(int)
        for s in range(n_segments):
            a, b = int(bounds[s]), int(bounds[s + 1])
            seg = events[a:b]
            lsn = np.arange(a + 1, b + 1, dtype=np.int64)
            t = pa.table(
                {
                    "lsn": pa.array(lsn),
                    "segment": pa.array(np.full(b - a, s, dtype=np.int32)),
                    "txn_id": pa.array(lsn),
                    "gtid": pa.nulls(b - a, type=pa.string()),
                    "op": pa.array([op for op, _, _ in seg]),
                    "schema_name": pa.array(["appdb"] * (b - a)),
                    "table_name": pa.array(["embstream"] * (b - a)),
                    "pk_repo": pa.array([str(v) for _, v, _ in seg], type=pa.string()),
                    "pk_path": pa.array([""] * (b - a)),
                    "cols": pa.array(
                        [None if e is None else ["vid", "vtag", "emb"] for _, _, e in seg],
                        type=pa.list_(pa.string()),
                    ),
                    "vals": pa.array(
                        [None if e is None else [str(v), "", e] for _, v, e in seg],
                        type=pa.list_(pa.string()),
                    ),
                    "ddl_sql": pa.nulls(b - a, type=pa.string()),
                    "execute_time": pa.array(
                        np.datetime64("2021-01-01", "ms")
                        + lsn.astype("timedelta64[ms]")
                    ),
                },
                schema=LOG_SCHEMA,
            )
            pq.write_table(t, os.path.join(log_dir, f"segment_{s:05d}.parquet"))

    cfg = CdcConfig(
        log_dir=log_dir, lake_dir=os.path.join(root, "lake"),
        schema_name="appdb", table_name="embstream",
        pk_columns=("vid", "vtag"),
        initial_schema=(("vid", "string"), ("vtag", "string"), ("emb", "string")),
        table_filter=r"appdb\.embstream",
        num_partitions=8, epoch_segments=1,
    )
    return cfg, n


def cdc_ann_index_follow(sf_dir: str) -> pd.DataFrame:
    """CDC-maintained ANN index through the driver gate (the ESSyncService
    "index follows the table" analog, fused with the persisted IVF index):
    the embedding change stream (inserts + re-embeddings + deletes) replays
    through the full engine into a lake; an ``IvfIndexFollower`` is brought
    current INCREMENTALLY (staged mid-replay so both the initial-build and
    the window-diff paths run), then probed.

    Self-oracle (size-gated): the followed index's probe results must equal
    a FRESH index built from the final lake state with the same frozen
    centroids — add/remove/relocate bookkeeping cannot drift from truth.
    SIGKILL-resume identity is asserted in tests/test_ann_follow.py."""
    from canal_ray.ann_follow import IvfIndexFollower, fresh_reference_probe
    from canal_ray.ops.ann import _load_queries
    from canal_ray.pipeline import CdcJob

    cfg, n = _embstream_fixture(sf_dir)
    job = CdcJob(cfg)
    follower = IvfIndexFollower(
        cfg.lake_dir, os.path.join(cfg.lake_dir, "_annindex"), n_clusters=8
    )
    # staged: half the epochs -> index -> rest -> index (all fenced no-ops
    # when the cached lake/index are already complete)
    job.run(max_epochs=3)
    follower.update(job)
    job.run()
    follower.update(job)

    qids, Q = _load_queries(sf_dir, 8)
    got = follower.probe(qids, Q, k=10, nprobe=4)

    if self_oracle_enabled(n, "cdc_ann_index_follow"):
        state = job.state_pandas()
        want = fresh_reference_probe(
            state, follower.centroids(), qids, Q, k=10, nprobe=4
        )
        same = (
            got[["query_id", "vec_id", "rank"]].reset_index(drop=True).equals(
                want[["query_id", "vec_id", "rank"]].reset_index(drop=True)
            )
            and bool(
                __import__("numpy").allclose(
                    got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-9
                )
            )
        )
        if not same:
            raise AssertionError(
                "followed ANN index diverged from fresh-built reference"
            )
    return got

"""Relational / CDC-flavored pipelines over the driver testdata tables.

The ``events`` table is treated as a CDC change stream keyed by ``user_id``
(the analog of the engine's binlog): latest-state compaction, changelog
statistics, windowed and sessionized aggregates — each the Ray-Data-native
form of semantics the reference engine guarantees operationally (per-key LWW
apply, ordered consumption; SURVEY.md §2.8, §2.10).

TPC-H-ish queries demonstrate the general relational surface: vectorized
Arrow filters, pre-aggregated groupbys, and broadcast joins for small sides
(``ray.put`` once, pandas merge per batch — never a shuffle join for a
dimension table).

Scale notes (100 TB discipline):
  - every read passes ``columns=[...]`` (prune at the read);
  - groupbys are preceded by per-batch partial reduction where the key
    cardinality is far below the row count;
  - float aggregates are rounded (util.round_columns) so results are
    reproducible regardless of block combination order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from canal_ray.ops.util import (
    keep_last,
    parquet_num_rows,
    round_columns,
    self_oracle_enabled,
)


# ---------------------------------------------------------------------------
# CDC-over-events: latest state per key (LWW compaction as a query)
# ---------------------------------------------------------------------------

def latest_events_by_user(sf_dir: str) -> pd.DataFrame:
    """Last event per user by (ts, event_id) — groupby-free partial reduce
    per batch, then one small grouped reduce (the CDC LWW compaction
    semantics of ``canal_ray.sink.lww_compact`` expressed as a query)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type", "value"],
    )
    partial = lambda t: keep_last(t, ["user_id"], ["ts", "event_id"])  # noqa: E731
    ds = ds.map_batches(partial, batch_format="pyarrow")
    # typed empty for empty map_groups blocks (metadata-only schema read):
    # map_groups hands empty partitions a ZERO-COLUMN block, and returning
    # it as-is emits schema-less RefBundles (executor warning noise)
    import pyarrow.parquet as pq

    fsch = pq.read_schema(f"{sf_dir}/events.parquet")
    sch = pa.schema([fsch.field(c) for c in ["user_id", "event_id", "ts", "event_type", "value"]])

    def grouped(t: pa.Table) -> pa.Table:
        return keep_last(t, ["user_id"], ["ts", "event_id"]) if t.num_rows else sch.empty_table()

    out = ds.groupby("user_id").map_groups(grouped, batch_format="pyarrow")
    return out.to_pandas()


def event_type_stats(sf_dir: str) -> pd.DataFrame:
    """Changelog statistics per op type (EntryCollector-style counters)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="avg_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )
    df = out.to_pandas()
    return round_columns(df, {"sum_value": 4, "avg_value": 6, "min_value": 6, "max_value": 6})


def hourly_event_counts(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1h event-time window counts (streaming-window analog)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def add_hour(t: pa.Table) -> pa.Table:
        return t.append_column("hour", pc.floor_temporal(t["ts"], unit="hour")).drop_columns(["ts"])

    ds = ds.map_batches(add_hour, batch_format="pyarrow")
    out = ds.groupby(["hour", "event_type"]).aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value")
    )
    return round_columns(out.to_pandas(), {"sum_value": 4})


# one Ray group per hash-shard of keys (NOT one per key): Ray's per-group
# dispatch is ~ms, so millions of tiny per-user groups would be driver-bound;
# a shard packs many users into one group resolved by pandas C-path groupby
# (the same pattern as dedup.shard_pairs)
N_KEY_SHARDS = 64


def _with_shard(key: str):
    def add(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _shard=(pd.util.hash_array(df[key].to_numpy()) % N_KEY_SHARDS).astype("int64")
        )

    return add


def sessionize_users(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session windows (gap-based) per user: shard-keyed ordered processing —
    ``groupby(hash(user) % shards)`` with a vectorized pandas sub-groupby per
    shard (stream-shaped windows; the log is the clock, SURVEY.md §2.10)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    ).map_batches(_with_shard("user_id"), batch_format="pandas")
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_sess = g["user_id"].ne(g["user_id"].shift()) | (g["ts"].diff() > gap)
        tmp = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(), "sess": new_sess.cumsum().to_numpy()}
        )
        sz = tmp.groupby(["user_id", "sess"], sort=False).size().rename("sz").reset_index()
        per_user = sz.groupby("user_id", sort=False).agg(
            n_sessions=("sz", "size"), max_session_events=("sz", "max")
        )
        per_user["n_events"] = tmp.groupby("user_id", sort=False).size()
        out = per_user.reset_index()
        return out[["user_id", "n_events", "n_sessions", "max_session_events"]].astype(
            {"n_events": "int64", "n_sessions": "int64", "max_session_events": "int64"}
        )

    out = ds.groupby("_shard").map_groups(per_shard, batch_format="pandas")
    return out.to_pandas()


# ---------------------------------------------------------------------------
# TPC-H-flavored relational coverage
# ---------------------------------------------------------------------------

def _cents(col: pa.ChunkedArray | pa.Array, scale: float = 100.0) -> pa.ChunkedArray:
    """Exact integer scaling for 2-decimal money columns.

    Float summation is order-dependent (Ray combines blocks in nondeterministic
    order; DuckDB sums sequentially), and TPC-H money values constantly land on
    half-cent rounding boundaries — so money aggregates are computed in exact
    int64 'cents' on BOTH sides (the oracle SQL mirrors this) and divided back
    at the end. Inputs are exact multiples of 0.01, so round() never sits on a
    .5 boundary and half-even vs half-away cannot disagree.
    """
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(scale))), pa.int64())


def event_props_k_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction (the JsonConversion analog,
    ``dbsync/.../JsonConversion.java``): pull ``k`` out of the JSON ``props``
    column with a vectorized regex, bucket it, aggregate per bucket."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["props", "value"])

    def extract(t: pa.Table) -> pa.Table:
        k = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        kv = pc.cast(pc.struct_field(k, "k"), pa.int64())
        bucket = pc.multiply(pc.divide(kv, pa.scalar(10, type=pa.int64())), pa.scalar(10, type=pa.int64()))
        return pa.table({"k_bucket": bucket, "value": t["value"]})

    out = ds.map_batches(extract, batch_format="pyarrow").groupby("k_bucket").aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value")
    )
    return round_columns(out.to_pandas(), {"sum_value": 4})


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    )

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        qty = pc.cast(t["l_quantity"], pa.int64())
        base_c = _cents(t["l_extendedprice"])
        disc_bp = _cents(t["l_discount"])  # 0..100 basis points of 0.01
        tax_bp = _cents(t["l_tax"])
        disc_s = pc.multiply(base_c, pc.subtract(pa.scalar(100, type=pa.int64()), disc_bp))
        charge_s = pc.multiply(disc_s, pc.add(pa.scalar(100, type=pa.int64()), tax_bp))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_i": qty,
                "base_c": base_c,
                "disc_bp": disc_bp,
                "disc_s": disc_s,
                "charge_s": charge_s,
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_i", alias_name="sum_qty_i"),
        Sum("base_c", alias_name="sum_base_c"),
        Sum("disc_s", alias_name="sum_disc_s"),
        Sum("charge_s", alias_name="sum_charge_s"),
        Sum("disc_bp", alias_name="sum_disc_bp"),
        Count(alias_name="count_order"),
    )
    df = out.to_pandas()
    n = df["count_order"].astype("float64")
    df["sum_qty"] = df["sum_qty_i"].astype("float64")
    df["sum_base_price"] = df["sum_base_c"] / 100.0
    df["sum_disc_price"] = df["sum_disc_s"] / 10_000.0
    df["sum_charge"] = df["sum_charge_s"] / 1_000_000.0
    df["avg_qty"] = df["sum_qty_i"] / n
    df["avg_price"] = df["sum_base_c"] / 100.0 / n
    df["avg_disc"] = df["sum_disc_bp"] / 100.0 / n
    return df[
        [
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
            "avg_disc", "count_order",
        ]
    ]


def building_segment_order_revenue(sf_dir: str, threshold: float = 100_000.0) -> pd.DataFrame:
    """Q3-flavored: revenue per order for BUILDING-segment customers above a
    revenue threshold.

    NOTHING key-scale is ever driver-loaded or broadcast — customer is a
    fact-scale table in TPC-H (rows grow with SF), so even its segment
    keyset cannot live on the driver at 100x. The customer filter is a
    native hash-partitioned ``Dataset.join(left_semi)`` (orders ⋉ BUILDING
    customers), then lineitem pre-aggregates per-order revenue partials
    inside ``map_batches`` (combiner) and a single tagged-union shard
    groupby performs both the partial reduce and the orders join."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])

    def building_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t["c_mktsegment"], pa.scalar("BUILDING"))
        return t.filter(m).select(["c_custkey"])

    bkeys_ds = cust.map_batches(building_keys, batch_format="pyarrow")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    orders_f = orders.join(
        bkeys_ds, join_type="left_semi", num_partitions=16,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev_partial(t: pa.Table) -> pa.Table:
        rev_s = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, type=pa.int64()), _cents(t["l_discount"])),
        )
        df = pd.DataFrame(
            {"o_orderkey": t["l_orderkey"].to_numpy(), "rev_s": rev_s.to_numpy()}
        )
        part = df.groupby("o_orderkey", as_index=False)["rev_s"].sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    # reduce-side co-partitioned join: tag both streams, ONE shard groupby
    # performs the per-order aggregation AND the orders join in the same
    # shuffle (no separate join exchange) — the classic repartition-join,
    # hash-partitioned end to end.
    n_shards = 64
    import pyarrow.parquet as _pq

    date_type = _pq.read_schema(f"{sf_dir}/orders.parquet").field("o_orderdate").type

    def tag_orders(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy()
        return pa.table(
            {
                "shard": pa.array((keys % n_shards).astype(np.int64)),
                "o_orderkey": t["o_orderkey"],
                "rev_s": pa.nulls(t.num_rows, type=pa.int64()),
                "o_orderdate": t["o_orderdate"],
                "src": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    def tag_partials(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy()
        return pa.table(
            {
                "shard": pa.array((keys % n_shards).astype(np.int64)),
                "o_orderkey": t["o_orderkey"],
                "rev_s": t["rev_s"],
                "o_orderdate": pa.nulls(t.num_rows, type=date_type),
                "src": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    parts = li.map_batches(rev_partial, batch_format="pyarrow").map_batches(
        tag_partials, batch_format="pyarrow"
    )
    od = orders_f.map_batches(tag_orders, batch_format="pyarrow")

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        rev = (
            g[g["src"] == 0]
            .groupby("o_orderkey", as_index=False)["rev_s"]
            .sum()
        )
        odr = g[g["src"] == 1][["o_orderkey", "o_orderdate"]]
        m = rev.merge(odr, on="o_orderkey")
        m["revenue"] = m["rev_s"] / 10_000.0  # exact int -> identical double
        m = m[m["revenue"] > threshold]
        return m[["o_orderkey", "revenue", "o_orderdate"]]

    out = parts.union(od).groupby("shard").map_groups(per_shard, batch_format="pandas")
    return out.to_pandas()


def supplier_balance_by_region(sf_dir: str) -> pd.DataFrame:
    """Broadcast snowflake join supplier->nation->region + rollup."""
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    n2r = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    key_to_region = dict(zip(n2r["n_nationkey"], n2r["r_name"]))
    ref = ray.put(key_to_region)

    ds = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"])

    def tag(t: pa.Table) -> pa.Table:
        from canal_ray.ops.util import cached_get

        mapping = cached_get(ref)
        df = pd.DataFrame(
            {
                "r_name": pd.Series(t["s_nationkey"].to_numpy()).map(mapping),
                "bal_c": _cents(t["s_acctbal"]).to_numpy(),
            }
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("bal_c", alias_name="bal_c"))
    )
    df = out.to_pandas()
    df["total_acctbal"] = df["bal_c"] / 100.0
    return df.drop(columns=["bal_c"])


def priority_item_stats(sf_dir: str) -> pd.DataFrame:
    """Large-large hash join via native ``Dataset.join`` (hash-partitioned on
    the key, Ray >= 2.46): lineitem x orders -> per-priority item stats.
    Quantities ride as exact int64 so the aggregate is order-independent."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "qty_i": pc.cast(t["l_quantity"], pa.int64()),
            }
        )

    li = li.map_batches(prep, batch_format="pyarrow")
    od = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(od, join_type="inner", num_partitions=16, on=("o_orderkey",))
    out = joined.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_items"), Sum("qty_i", alias_name="sum_qty_i")
    )
    df = out.to_pandas()
    df["sum_qty"] = df["sum_qty_i"].astype("float64")
    return df[["o_orderpriority", "n_items", "sum_qty"]]


def top_users_by_value(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Grouped top-k with deterministic tie-break: per-batch partial sums ->
    small grouped reduce -> exact cent-scaled ordering."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"user_id": t["user_id"].to_numpy(), "v_c": _cents(t["value"], 10_000.0).to_numpy()}
        )
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False).agg(v_c=("v_c", "sum"), n=("v_c", "size")),
            preserve_index=False,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("v_c", alias_name="v_c"), Sum("n", alias_name="n"))
    )
    df = agg.to_pandas()
    df["total_value"] = df["v_c"] / 10_000.0
    df = df.sort_values(["total_value", "user_id"], ascending=[False, True]).head(k)
    return df[["user_id", "total_value", "n"]].reset_index(drop=True)


def distinct_customers_per_status(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT) via dedup-then-count (Ray has no distinct aggregate):
    per-batch pair dedup -> global pair dedup (groupby) -> grouped count."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_custkey"])

    def pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o_orderstatus": t["o_orderstatus"].to_numpy(zero_copy_only=False),
             "o_custkey": t["o_custkey"].to_numpy()}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    deduped = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .map_batches(_with_shard("o_custkey"), batch_format="pandas")
        .groupby("_shard")  # one Ray group per shard, not per distinct pair
        .map_groups(
            lambda g: g.drop_duplicates(subset=["o_orderstatus", "o_custkey"])[
                ["o_orderstatus", "o_custkey"]
            ],
            batch_format="pandas",
        )
    )
    out = deduped.groupby("o_orderstatus").aggregate(Count(alias_name="n_customers"))
    return out.to_pandas()


def customers_without_orders(sf_dir: str, since: str = "1998-01-01") -> pd.DataFrame:
    """Anti join, hash-partitioned end to end (no driver keyset build, no
    broadcast of a fact-derived side): customers with no orders on/after
    ``since`` via native ``Dataset.join(join_type="left_anti")``. Orders is a
    fact table — its keyset at 100x scale cannot live on the driver."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])

    def recent_keys(t: pa.Table) -> pa.Table:
        m = pc.greater_equal(t["o_orderdate"], pa.scalar(pd.Timestamp(since)))
        df = pd.DataFrame({"o_custkey": t.filter(m)["o_custkey"].to_numpy()})
        return pa.Table.from_pandas(df.drop_duplicates(), preserve_index=False)

    keys = orders.map_batches(recent_keys, batch_format="pyarrow")
    out = cust.join(
        keys, join_type="left_anti", num_partitions=16,
        on=("c_custkey",), right_on=("o_custkey",),
    )
    df = out.to_pandas()
    if df.empty:
        df = pd.DataFrame(columns=["c_custkey", "c_name", "c_mktsegment"])
    return df[["c_custkey", "c_name", "c_mktsegment"]]


def user_running_value(sf_dir: str) -> pd.DataFrame:
    """Per-key running (prefix) aggregate over event time — ordered per-key
    processing via groupby(key).map_groups over ts-sorted groups."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )

    ds = ds.map_batches(_with_shard("user_id"), batch_format="pandas")

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        g["running_value"] = np.round(
            g.groupby("user_id", sort=False)["value"].cumsum(), 4
        )
        return g[["user_id", "event_id", "running_value"]]

    return ds.groupby("_shard").map_groups(per_shard, batch_format="pandas").to_pandas()


def user_sliding_window_stats(sf_dir: str, days: int = 7) -> pd.DataFrame:
    """Sliding event-time window per key (the hopping/sliding streaming-window
    analog, completing the window family next to tumbling
    ``hourly_event_counts`` and gap-based ``sessionize_users``): for every
    (user, active day), the event count and exact cent-scaled value sum over
    the trailing ``days``-day window.

    Shape (the standard two-level paired-window decomposition): tumbling
    DAILY partials are combined inside ``map_batches`` first, so the one
    exchange moves (user, day) partials — bounded by users x active days —
    never the raw event stream; the sliding combination then runs inside
    shard groups as a single vectorized cumsum + searchsorted pass (windows
    cannot span users because the search key is user-rank-offset, and day
    numbers since epoch dwarf any window length — no per-row or per-user
    Python). Value sums are exact int64 'cents' on both sides (see
    ``_cents``)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def day_partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(),
                "day": pc.floor_temporal(t["ts"], unit="day").to_pandas(),
                "value_c": _cents(t["value"], 10_000.0).to_numpy(),
            }
        )
        return df.groupby(["user_id", "day"], as_index=False).agg(
            n=("value_c", "size"), value_c=("value_c", "sum")
        )

    parts = ds.map_batches(day_partial, batch_format="pyarrow").map_batches(
        _with_shard("user_id"), batch_format="pandas"
    )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        # finish the daily partial reduce, then slide
        g = g.groupby(["user_id", "day"], as_index=False).agg(
            n=("n", "sum"), value_c=("value_c", "sum")
        )
        g = g.sort_values(["user_id", "day"]).reset_index(drop=True)
        dayno = (g["day"].to_numpy().astype("datetime64[D]")).astype(np.int64)
        # rebase to the shard minimum (+ days-1) so key - (days-1) can never
        # cross into the previous user's key range, even for timestamps at or
        # before the 1970 epoch (raw dayno <= 0 would otherwise break the
        # sorted-key invariant searchsorted relies on); a constant shift
        # preserves all day differences, i.e. window membership
        dayno = dayno - dayno.min() + (days - 1)
        assert dayno.max() < 10_000_000 - days, "day span exceeds key packing"
        urank = g["user_id"].ne(g["user_id"].shift()).cumsum().to_numpy(dtype=np.int64)
        key = urank * 10_000_000 + dayno
        lo = np.searchsorted(key, key - (days - 1), side="left")
        cum_n = np.concatenate([[0], np.cumsum(g["n"].to_numpy(dtype=np.int64))])
        cum_v = np.concatenate([[0], np.cumsum(g["value_c"].to_numpy(dtype=np.int64))])
        idx = np.arange(len(g))
        return pd.DataFrame(
            {
                "user_id": g["user_id"],
                "day": g["day"],
                "n_7d": cum_n[idx + 1] - cum_n[lo],
                "total_value_c_7d": cum_v[idx + 1] - cum_v[lo],
            }
        )

    out = parts.groupby("_shard").map_groups(per_shard, batch_format="pandas")
    df = out.to_pandas().sort_values(["user_id", "day"]).reset_index(drop=True)
    return df.astype({"n_7d": "int64", "total_value_c_7d": "int64"})


def purchase_prev_event(sf_dir: str) -> pd.DataFrame:
    """As-of lookup within a key: for every purchase, the immediately
    preceding event of the same user (pd lag within sorted groups)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    )

    ds = ds.map_batches(_with_shard("user_id"), batch_format="pandas")

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        same_user = g["user_id"].eq(g["user_id"].shift(1))
        g["prev_event_id"] = g["event_id"].shift(1)
        g["prev_event_type"] = g["event_type"].shift(1)
        out = g[(g["event_type"] == "purchase") & same_user]
        return out[["user_id", "event_id", "prev_event_id", "prev_event_type"]]

    df = ds.groupby("_shard").map_groups(per_shard, batch_format="pandas").to_pandas()
    df["prev_event_id"] = df["prev_event_id"].astype("int64")
    return df


def doc_lang_source_counts(sf_dir: str) -> pd.DataFrame:
    """Grouped counts over two keys (documents corpus census)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"])
    out = ds.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )
    df = out.to_pandas()
    df["total_chars"] = df["total_chars"].astype("int64")
    return df


def monthly_ship_volume(sf_dir: str) -> pd.DataFrame:
    """Tumbling calendar-month histogram over lineitem shipments."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ship_month": pc.floor_temporal(t["l_shipdate"], unit="month"),
                "qty_i": pc.cast(t["l_quantity"], pa.int64()),
            }
        )

    out = ds.map_batches(derive, batch_format="pyarrow").groupby("ship_month").aggregate(
        Count(alias_name="n_items"), Sum("qty_i", alias_name="sum_qty_i")
    )
    df = out.to_pandas()
    df["sum_qty"] = df["sum_qty_i"].astype("float64")
    return df[["ship_month", "n_items", "sum_qty"]]


def part_brand_stats(sf_dir: str) -> pd.DataFrame:
    """Pattern-filtered grouped aggregate (LIKE pushdown shape)."""
    ds = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_type", "p_size", "p_retailprice"]
    )

    def filt(t: pa.Table) -> pa.Table:
        m = pc.match_substring(t["p_type"], "STANDARD")
        t = t.filter(m)
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "size_i": pc.cast(t["p_size"], pa.int64()),
                "price_c": _cents(t["p_retailprice"]),
            }
        )

    out = ds.map_batches(filt, batch_format="pyarrow").groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Sum("size_i", alias_name="sum_size"),
        Sum("price_c", alias_name="price_c"),
    )
    df = out.to_pandas()
    df["total_price"] = df["price_c"] / 100.0
    df["sum_size"] = df["sum_size"].astype("int64")
    return df.drop(columns=["price_c"])


def user_value_minmax(sf_dir: str) -> pd.DataFrame:
    """Per-key min/max/count (pure aggregate fan-in, no float sums)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    out = ds.groupby("user_id").aggregate(
        Count(alias_name="n"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )
    return out.to_pandas()


def order_priority_counts(sf_dir: str) -> pd.DataFrame:
    """Filtered grouped count (Q4 flavor, no join needed at this shape)."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_orderstatus"],
    )

    def filt(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(pd.Timestamp("1994-01-01"))),
            pc.equal(t["o_orderstatus"], pa.scalar("F")),
        )
        return t.filter(m).drop_columns(["o_orderdate", "o_orderstatus"])

    out = ds.map_batches(filt, batch_format="pyarrow").groupby("o_orderpriority").aggregate(
        Count(alias_name="n")
    )
    return out.to_pandas()


def asof_purchase_last_view(sf_dir: str) -> pd.DataFrame:
    """As-of JOIN between two event streams: for every ``purchase`` event,
    the same user's most recent ``view`` event with ``view.ts <= purchase.ts``
    (the trade/quote classic; DuckDB expresses it as ``ASOF JOIN``).

    Ray-Data-native: ONE pruned read of both streams, one shard-keyed
    shuffle (``groupby(hash(user) % shards)``), then a vectorized per-shard
    merge — sort by (user, ts), forward-fill the view ids within each user,
    emit purchase rows. No driver-side collect; the only exchange is the
    shard groupby, and both streams move through it together (an ASOF join
    of two separately-shuffled tables would pay two exchanges)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"], value_set=pa.array(["purchase", "view"])))

    ds = ds.map_batches(prune, batch_format="pyarrow").map_batches(
        _with_shard("user_id"), batch_format="pandas"
    )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        # views sort before purchases at equal ts (ASOF ts >= ts is inclusive)
        g = g.assign(_p=g["event_type"].eq("purchase").astype("int8"))
        g = g.sort_values(["user_id", "ts", "_p", "event_id"])
        vid = g["event_id"].where(g["_p"].eq(0))
        g["view_event_id"] = vid.groupby(g["user_id"], sort=False).ffill()
        out = g[(g["_p"] == 1) & g["view_event_id"].notna()]
        return pd.DataFrame(
            {
                "purchase_event_id": out["event_id"].to_numpy(),
                "user_id": out["user_id"].to_numpy(),
                "view_event_id": out["view_event_id"].astype("int64").to_numpy(),
            }
        )

    return ds.groupby("_shard").map_groups(per_shard, batch_format="pandas").to_pandas()


def lineitem_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP (returnflag, linestatus): leaf groups, per-returnflag
    subtotals, and the grand total in one result (NULL group levels).

    Ray computes ONLY the leaf aggregate distributed (one exchange); the
    rollup levels re-aggregate the tiny leaf table driver-side (|leaves| =
    |RF x LS| ~ 6 rows — re-aggregating partials, never raw data)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_linestatus", "l_quantity"]
    )
    leaf = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="n"), Sum("l_quantity", alias_name="_sq"))
        .to_pandas()
    )
    mid = (
        leaf.groupby("l_returnflag", as_index=False)
        .agg(n=("n", "sum"), _sq=("_sq", "sum"))
        .assign(l_linestatus=None)
    )
    top = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "n": [leaf["n"].sum()],
            "_sq": [leaf["_sq"].sum()],
        }
    )
    out = pd.concat([leaf, mid, top], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "n", "_sq"]
    ]
    out["sum_qty"] = out["_sq"].round(2)
    out = out.drop(columns=["_sq"])
    out["n"] = out["n"].astype("int64")
    # object-None group levels (matches DuckDB VARCHAR NULL -> None in .df())
    out["l_returnflag"] = out["l_returnflag"].astype(object).where(out["l_returnflag"].notna(), None)
    out["l_linestatus"] = out["l_linestatus"].astype(object).where(out["l_linestatus"].notna(), None)
    return out


def median_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact grouped median + p90 (interpolated, quantile_cont semantics).

    Exact quantiles need every value of a group in one place: one exchange
    on event_type, np.quantile per group. |group| values must fit a worker
    (fine up to ~10^8 doubles/group); beyond that the scale path is a
    t-digest/KLL sketch partial-merged inside map_batches — documented
    trade-off, not silently approximated here."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "median_value": [round(float(np.quantile(v, 0.5, method="linear")), 6)],
                "p90_value": [round(float(np.quantile(v, 0.9, method="linear")), 6)],
            }
        )

    return ds.groupby("event_type").map_groups(per_group, batch_format="pandas").to_pandas()


def brand_top_parts(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Grouped top-k AFTER a fact-fact join: top-k parts per brand by
    lineitem revenue — the "top documents per domain" shape of a curation
    pipeline (SURVEY.md §2.8 grouped top-k; reference analog: per-key
    ordering guarantees of RdbSyncService.pkHash sharding).

    Scale shape: per-batch partial revenue sums keyed by l_partkey (combiner)
    -> one small groupby(l_partkey) -> native hash join to part on the SAME
    key (both sides fact-scale; no broadcast) -> per-brand exact top-k via
    map_groups (group size = parts-per-brand, bounded; the per-group state is
    k rows). Money rides as exact int64 cent*bp units end to end."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        base_c = _cents(t["l_extendedprice"]).to_numpy()
        disc_c = _cents(t["l_discount"]).to_numpy()  # 0..10 hundredths
        df = pd.DataFrame(
            {
                "p_partkey": t["l_partkey"].to_numpy(),
                "rev_c4": base_c * (100 - disc_c),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("p_partkey", as_index=False).agg(rev_c4=("rev_c4", "sum")),
            preserve_index=False,
        )

    rev = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("p_partkey")
        .aggregate(Sum("rev_c4", alias_name="rev_c4"))
    )
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    joined = rev.join(part, join_type="inner", num_partitions=16, on=("p_partkey",))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rev_c4", "p_partkey"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "p_brand": g["p_brand"].to_numpy(),
                "p_partkey": g["p_partkey"].to_numpy(),
                "revenue": g["rev_c4"].to_numpy() / 10_000.0,
                "brand_rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return (
        joined.groupby("p_brand")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["p_brand", "brand_rank"])
        .reset_index(drop=True)
    )


def user_funnel_counts(sf_dir: str) -> pd.DataFrame:
    """Ordered conversion funnel view -> click -> purchase: per-stage user
    counts where each stage must happen STRICTLY AFTER the user's first entry
    into the previous stage (the product-analytics funnel shape; the
    reference's per-key ordered-consumption guarantee makes this computable
    from a change stream, SURVEY.md §2.10).

    Scale shape: hash-shard users (``groupby(hash(user) % shards)``) so each
    user's whole history lands in one group, then three vectorized pandas
    merge+min folds per shard; the exchange is the one shuffle. Per-shard
    state is O(users in shard), never the corpus."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).map_batches(_with_shard("user_id"), batch_format="pandas")

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        t1 = (
            g[g["event_type"] == "view"].groupby("user_id")["ts"].min().rename("t1")
        )
        clk = g[g["event_type"] == "click"].merge(t1, on="user_id")
        t2 = clk[clk["ts"] > clk["t1"]].groupby("user_id")["ts"].min().rename("t2")
        pur = g[g["event_type"] == "purchase"].merge(t2, on="user_id")
        t3 = pur[pur["ts"] > pur["t2"]].groupby("user_id")["ts"].min()
        return pd.DataFrame(
            {
                "stage": ["view", "view_click", "view_click_purchase"],
                "n_users": [len(t1), len(t2), len(t3)],
            }
        )

    partials = ds.groupby("_shard").map_groups(per_shard, batch_format="pandas")
    # final fold: 3 rows x 64 shards of int counts — driver-side sum, not a
    # second AllToAll (the shard groupby above is the one real exchange)
    df = (
        partials.to_pandas()
        .groupby("stage", as_index=False)["n_users"]
        .sum()
    )
    df["n_users"] = df["n_users"].astype("int64")
    return df.sort_values("stage").reset_index(drop=True)


def daily_active_users(sf_dir: str) -> pd.DataFrame:
    """Distinct users per day (DAU): per-batch (day, user) dedup -> shard
    dedup -> grouped count. Same dedup-then-count shape as
    ``distinct_customers_per_status`` — no global set on any node."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "day": pc.floor_temporal(t["ts"], unit="day").to_numpy(zero_copy_only=False),
                "user_id": t["user_id"].to_numpy(),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # count per day WITHIN each shard group: a (day, user) pair always lands
    # in its user's shard, so per-shard day-counts sum exactly — the final
    # fold is days x shards small-int rows on the driver, not a second
    # AllToAll after the dedup exchange
    def dedup_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(subset=["day", "user_id"])
        return d.groupby("day", as_index=False).size().rename(columns={"size": "n_users"})

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .map_batches(_with_shard("user_id"), batch_format="pandas")
        .groupby("_shard")
        .map_groups(dedup_count, batch_format="pandas")
    )
    df = partials.to_pandas().groupby("day", as_index=False)["n_users"].sum()
    df["n_users"] = df["n_users"].astype("int64")
    return df.sort_values("day").reset_index(drop=True)


def cohort_retention_7d(sf_dir: str) -> pd.DataFrame:
    """Cohort retention: users grouped by first-seen day, with the share
    still active >= 7 days after their first event. Fully partial-reducible:
    per-batch (user -> min/max ts) combiner, one grouped min/max reduce, then
    a tiny per-day aggregate — two exchanges, both on pre-reduced rows."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(), "ts": t["ts"].to_numpy()})
        g = df.groupby("user_id", as_index=False).agg(
            first_ts=("ts", "min"), last_ts=("ts", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("first_ts", alias_name="first_ts"), Max("last_ts", alias_name="last_ts"))
    )

    def to_cohort_partial(t: pa.Table) -> pa.Table:
        # reduce per-user rows to per-(cohort day) counts WITHIN the batch:
        # the partial is <= distinct-days rows per block, so the final fold
        # is a driver-side sum over days x blocks rows, not a second
        # AllToAll (the per-user groupby above is the one real exchange)
        first = t["first_ts"]
        retained = pc.greater_equal(
            pc.milliseconds_between(first, t["last_ts"]), pa.scalar(7 * 86_400_000)
        )
        df = pd.DataFrame(
            {
                "cohort_day": pc.floor_temporal(first, unit="day").to_numpy(
                    zero_copy_only=False
                ),
                "retained": pc.cast(retained, pa.int64()).to_numpy(),
            }
        )
        g = df.groupby("cohort_day", as_index=False).agg(
            n_users=("retained", "size"), n_retained_7d=("retained", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (
        per_user.map_batches(to_cohort_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("cohort_day", as_index=False)[["n_users", "n_retained_7d"]]
        .sum()
    )
    df["n_users"] = df["n_users"].astype("int64")
    df["n_retained_7d"] = df["n_retained_7d"].astype("int64")
    return df.sort_values("cohort_day").reset_index(drop=True)


def segment_status_pivot(sf_dir: str) -> pd.DataFrame:
    """Conditional-aggregation pivot after a fact-fact join: order counts and
    revenue per market segment spread across order-status columns (the
    FILTER/PIVOT shape). Customer and orders are both fact-scale: native
    hash join on custkey (no broadcast, no driver keyset), then per-batch
    conditional partial sums -> one tiny grouped reduce."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus", "o_totalprice"],
    )
    joined = orders.join(
        cust, join_type="inner", num_partitions=16,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "c_mktsegment": t["c_mktsegment"].to_numpy(zero_copy_only=False),
                "status": t["o_orderstatus"].to_numpy(zero_copy_only=False),
                "price_c": _cents(t["o_totalprice"]).to_numpy(),
            }
        )
        for s in ("F", "O", "P"):
            m = df["status"] == s
            df[f"n_{s.lower()}"] = m.astype("int64")
            df[f"rev_{s.lower()}_c"] = df["price_c"].where(m, 0)
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_f=("n_f", "sum"), n_o=("n_o", "sum"), n_p=("n_p", "sum"),
            rev_f_c=("rev_f_c", "sum"), rev_o_c=("rev_o_c", "sum"),
            rev_p_c=("rev_p_c", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # partials are <= |segments| rows per block (all-int): the final fold is
    # a driver-side sum, not a second AllToAll after the join exchange
    cols = ["n_f", "n_o", "n_p", "rev_f_c", "rev_o_c", "rev_p_c"]
    df = (
        joined.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("c_mktsegment", as_index=False)[cols]
        .sum()
    )
    for s in ("f", "o", "p"):
        df[f"rev_{s}"] = df[f"rev_{s}_c"] / 100.0
        df[f"n_{s}"] = df[f"n_{s}"].astype("int64")
    return (
        df[["c_mktsegment", "n_f", "n_o", "n_p", "rev_f", "rev_o", "rev_p"]]
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )


def value_spread_by_type(sf_dir: str) -> pd.DataFrame:
    """Grouped sample standard deviation / variance via the (n, sum, sumsq)
    partial decomposition — the classic distributive-aggregate shape: any
    number of blocks combine by plain addition, one tiny final map."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False), "v": v, "v2": v * v}
        )
        g = df.groupby("event_type", as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), s2=("v2", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("s2", alias_name="s2"))
    )
    df = agg.to_pandas()
    n = df["n"].to_numpy().astype(np.float64)
    var = (df["s2"].to_numpy() - df["s"].to_numpy() ** 2 / n) / (n - 1)
    df["var_value"] = np.round(var, 4)
    df["stddev_value"] = np.round(np.sqrt(var), 4)
    df["n"] = df["n"].astype("int64")
    return (
        df[["event_type", "n", "var_value", "stddev_value"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def event_type_value_profile(sf_dir: str) -> pd.DataFrame:
    """Wide per-event-type value profile — registry-window composite of
    ``event_type_stats`` (grouped count/sum/avg/min/max fan-in),
    ``value_spread_by_type`` (variance via the (n, sum, sumsq) partial
    decomposition) and ``median_value_by_type`` (exact grouped quantiles,
    one exchange + np.quantile per group). All three distributed plans run
    unchanged; only their tiny per-type outputs (|event types| rows each)
    are joined on the driver, so the composite exercises exactly the same
    operators as the three standalone queries while occupying ONE row of
    the driver's 50-query correctness window."""
    base = event_type_stats(sf_dir)
    spread = value_spread_by_type(sf_dir)[["event_type", "var_value", "stddev_value"]]
    quant = median_value_by_type(sf_dir)
    df = base.merge(spread, on="event_type").merge(quant, on="event_type")
    return df.sort_values("event_type").reset_index(drop=True)


def top_users_value_profile(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k users by total value WITH their min/max bounds — composite of
    ``top_users_by_value`` (partial-sum combiner -> grouped reduce -> exact
    cent-scaled ordering, deterministic tie-break) and ``user_value_minmax``
    (pure aggregate fan-in, no float sums). Both plans run unchanged; the
    driver joins the k winners against their bounds (k rows)."""
    top = top_users_by_value(sf_dir, k)
    mm = user_value_minmax(sf_dir)
    df = top.merge(mm[["user_id", "min_value", "max_value"]], on="user_id")
    return df[["user_id", "total_value", "n", "min_value", "max_value"]]


def doc_char_histogram(sf_dir: str, width: int = 500) -> pd.DataFrame:
    """Fixed-width histogram of document lengths (corpus profiling step):
    vectorized bucket assignment per batch, grouped count — the profile every
    curation run starts with."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = pc.multiply(
            pc.floor(pc.divide(pc.cast(t["n_chars"], pa.float64()), width)),
            width,
        )
        return pa.table({"bucket_lo": pc.cast(b, pa.int64())})

    out = ds.map_batches(bucketize, batch_format="pyarrow").groupby(
        "bucket_lo"
    ).aggregate(Count(alias_name="n_docs"))
    df = out.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    return df.sort_values("bucket_lo").reset_index(drop=True)


# non-uniform value bands for the broadcast range join (shared literal with
# the SQL oracle's VALUES table); right-open [lo, hi)
VALUE_BANDS = [
    ("micro", 0.0, 5.0),
    ("small", 5.0, 25.0),
    ("mid", 25.0, 100.0),
    ("large", 100.0, 1000.0),
]


def value_band_stats(sf_dir: str) -> pd.DataFrame:
    """Non-equi RANGE JOIN with a small side: events joined to a band table
    on ``lo <= value < hi``, aggregated per band. The scale pattern for a
    small-side interval join: the sorted band edges ride in the task closure
    (broadcast once per worker) and each batch resolves its band with ONE
    vectorized ``np.searchsorted`` — no shuffle for the join itself, only
    the tiny grouped reduce moves. The oracle expresses the same thing as a
    true non-equi JOIN so the semantics are pinned."""
    edges = np.array([b[1] for b in VALUE_BANDS] + [VALUE_BANDS[-1][2]])
    names = np.array([b[0] for b in VALUE_BANDS], dtype=object)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        idx = np.searchsorted(edges, v, side="right") - 1
        ok = (idx >= 0) & (idx < len(names))
        df = pd.DataFrame({"band": names[idx[ok]], "v": v[ok]})
        g = df.groupby("band", as_index=False).agg(n=("v", "size"), s=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    )
    df = out.to_pandas()
    df["n"] = df["n"].astype("int64")
    df["sum_value"] = np.round(df["s"], 4)
    return df[["band", "n", "sum_value"]].sort_values("band").reset_index(drop=True)


def approx_quantiles_by_type(sf_dir: str, n_buckets: int = 1024) -> pd.DataFrame:
    """Approximate grouped quantiles via a mergeable histogram sketch — the
    documented scale path of ``median_value_by_type`` (whose exact form
    needs every group value co-located; beyond ~10^8 values/group that stops
    fitting a worker).

    Sketch: a fixed ``n_buckets`` equi-width histogram per group, range
    pinned from parquet column statistics (no data read). Partials are
    sparse (group, bucket, n) rows produced vectorized per batch
    (np.bincount over codes); merging is plain addition — ONE tiny grouped
    reduce over <= groups x buckets pre-reduced rows, never raw values.
    The quantile interpolates within its bucket. Error contract: the
    estimate's RANK is exact to within the bucket's occupancy (by
    construction of the cumulative search); its VALUE error is that rank
    slack times the local gap between order statistics — tight where data
    is dense, loose in sparse tails (the standard histogram-sketch
    trade-off; a KLL/t-digest narrows the tail at the same mergeability).
    The in-process oracle asserts what can actually break distributed: the
    merged sketch equals a sequential single-pass recompute EXACTLY
    (bincount is integer addition — any partial lost, duplicated or
    mis-merged by the exchange changes some bucket count)."""
    import pyarrow.parquet as _pq

    pf = _pq.ParquetFile(f"{sf_dir}/events.parquet")
    vi = pf.schema_arrow.get_field_index("value")
    los, his = [], []
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(vi).statistics
        if st is None or st.min is None or st.max is None:
            los, his = [], []  # stats disabled/partial -> range scan below
            break
        los.append(st.min)
        his.append(st.max)
    if los:
        lo, hi = float(min(los)), float(max(his))
    else:
        # fallback: one cheap distributed min/max pass (column-pruned read)
        rng_ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
        lo, hi = float(rng_ds.min("value")), float(rng_ds.max("value"))
    width = (hi - lo) / n_buckets or 1.0

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = pd.Series(t["event_type"].to_numpy(zero_copy_only=False))
        codes, uniques = pd.factorize(et)
        b = np.clip(
            ((t["value"].to_numpy() - lo) / width).astype(np.int64), 0, n_buckets - 1
        )
        flat = codes * n_buckets + b
        cnt = np.bincount(flat, minlength=len(uniques) * n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "event_type": pa.array(uniques[nz // n_buckets]),
                "bucket": pa.array((nz % n_buckets).astype(np.int64)),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= |event_type| x n_buckets pre-reduced rows
    )

    out_rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("bucket")
        cum = g["n"].cumsum().to_numpy()
        total = cum[-1]
        row = {"event_type": et}
        for q, col in ((0.5, "median_approx"), (0.9, "p90_approx")):
            target = q * total
            i = int(np.searchsorted(cum, target))
            b = int(g["bucket"].iloc[i])
            prev = cum[i - 1] if i else 0
            inbucket = (target - prev) / max(int(g["n"].iloc[i]), 1)
            row[col] = round(lo + (b + inbucket) * width, 6)
        out_rows.append(row)
    out = pd.DataFrame(out_rows).sort_values("event_type").reset_index(drop=True)

    # distributed-merge oracle: sequential single-pass recompute of the SAME
    # sketch must match the merged distributed sketch bucket-for-bucket
    # (driver-side full read is the TEST oracle only, not the scale path —
    # size-gated so the op runs unchanged at 100x)
    if self_oracle_enabled(
        parquet_num_rows(f"{sf_dir}/events.parquet"), "approx_quantiles_by_type"
    ):
        seq = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        codes, uniques = pd.factorize(seq["event_type"])
        b = np.clip(((seq["value"].to_numpy() - lo) / width).astype(np.int64), 0, n_buckets - 1)
        cnt = np.bincount(codes * n_buckets + b, minlength=len(uniques) * n_buckets)
        nz = np.flatnonzero(cnt)
        want = (
            pd.DataFrame(
                {
                    "event_type": uniques[nz // n_buckets],
                    "bucket": (nz % n_buckets).astype(np.int64),
                    "n": cnt[nz].astype(np.int64),
                }
            )
            .sort_values(["event_type", "bucket"])
            .reset_index(drop=True)
        )
        got = hist.sort_values(["event_type", "bucket"]).reset_index(drop=True)
        if not got[["event_type", "bucket", "n"]].astype({"n": "int64"}).equals(want):
            raise AssertionError("distributed sketch diverged from sequential recompute")
    return out


def approx_distinct_users_by_type(sf_dir: str, p_bits: int = 12) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT) via HyperLogLog — the cardinality-sketch
    counterpart of ``approx_quantiles_by_type`` (exact distinct is
    ``distinct_customers_per_status``'s dedup-then-count, whose exchange
    moves one row per distinct pair; HLL moves a FIXED 2^p registers per
    group regardless of cardinality — the 10^10-keys shape).

    Registers are sparse (group, register, rank) rows maxed per batch
    (vectorized: pandas groupby max over md5-derived 64-bit hashes), merged
    by ONE grouped Max — elementwise register max is HLL's exact merge
    operator, so distribution cannot change the estimate. Estimator uses
    the standard bias-corrected harmonic mean + linear-counting small-range
    correction (Flajolet et al. 2007, public algorithm). In-process oracle:
    (a) merged registers equal a sequential recompute exactly, (b) the
    estimate is within 3 standard errors (3 * 1.04/sqrt(2^p)) of the exact
    distinct count computed distributed."""
    import hashlib

    m = 1 << p_bits

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def _registers(df: pd.DataFrame) -> pd.DataFrame:
        # md5 -> 64-bit hash (stable across engines/runs; the scale default
        # would swap a vectorized mixer exactly like dedup._fast_hash)
        h = np.fromiter(
            (
                int(hashlib.md5(str(u).encode()).hexdigest()[:16], 16)
                for u in df["user_id"]
            ),
            dtype=np.uint64,
            count=len(df),
        )
        reg = (h >> np.uint64(64 - p_bits)).astype(np.int64)
        rest = (h << np.uint64(p_bits)) & np.uint64((1 << 64) - 1)
        # rank = position of first set bit in the remaining 64-p bits + 1
        nz = rest != 0
        rank = np.full(len(h), 64 - p_bits + 1, dtype=np.int64)
        if nz.any():
            # number of leading zeros of a uint64 via its bit length
            bl = np.frompyfunc(int.bit_length, 1, 1)(rest[nz]).astype(np.int64)
            rank[nz] = 64 - bl + 1
        out = pd.DataFrame(
            {"event_type": df["event_type"], "register": reg, "rank": rank}
        )
        return out.groupby(["event_type", "register"], as_index=False)["rank"].max()

    # merge: each block pre-reduces to <= groups x 2^p register rows, and
    # register-max is the textbook tree-reducible combine — a distributed
    # hash groupby here pays Ray's fixed AllToAll setup on rows that a
    # single pandas max folds in milliseconds (measured 13s vs 0.2s at
    # sf0.1). Driver input is bounded by n_blocks x groups x 2^p; at
    # extreme block counts the escalation is a tree of pairwise max merges.
    merged = (
        ds.map_batches(_registers, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "register"], as_index=False)["rank"]
        .max()
    )

    alpha = 0.7213 / (1 + 1.079 / m)
    rows = []
    for et, g in merged.groupby("event_type"):
        regs = np.zeros(m)
        regs[g["register"].to_numpy()] = g["rank"].to_numpy()
        est = alpha * m * m / np.sum(2.0 ** -regs)
        zeros = m - len(g)
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
        rows.append({"event_type": et, "n_users_approx": int(round(est))})
    out = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)

    # oracle (a): merged registers == sequential recompute, bit for bit
    # (size-gated: the recompute reads the full table onto the driver)
    if self_oracle_enabled(
        parquet_num_rows(f"{sf_dir}/events.parquet"), "approx_distinct_users_by_type"
    ):
        seq = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
        want = (
            _registers(seq)
            .sort_values(["event_type", "register"])
            .reset_index(drop=True)
        )
        got = (
            merged.astype({"rank": "int64"})
            .sort_values(["event_type", "register"])
            .reset_index(drop=True)[["event_type", "register", "rank"]]
        )
        if not got.equals(want):
            raise AssertionError("merged HLL registers diverged from sequential recompute")
        # oracle (b): within 3 standard errors of the exact distinct count
        exact = (
            seq.drop_duplicates()
            .groupby("event_type")["user_id"]
            .nunique()
        )
        for _, r in out.iterrows():
            true = int(exact[r["event_type"]])
            if abs(r["n_users_approx"] - true) > max(3 * 1.04 / np.sqrt(m) * true, 3):
                raise AssertionError("HLL estimate outside 3-sigma band")
    return out

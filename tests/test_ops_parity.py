"""Ray-vs-DuckDB parity harness — mirrors the driver's correctness gate:
row-count + column names + order-insensitive value hash at sf0.01."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime"):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.astype(str)
    rows = sorted(
        hashlib.sha256("|".join(map(str, rec)).encode()).hexdigest()
        for rec in df.itertuples(index=False)
    )
    return len(df), list(df.columns), hashlib.sha256("\n".join(rows).encode()).hexdigest()


def assert_parity(ray_df, sql: str):
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    oracle_df = run_oracle(sql)
    n1, c1, h1 = canon(ray_df)
    n2, c2, h2 = canon(oracle_df)
    assert c1 == c2, f"columns differ: {c1} vs {c2}"
    assert n1 == n2, f"row counts differ: {n1} vs {n2}"
    assert h1 == h2, "value hash mismatch"


@pytest.mark.parametrize(
    "name",
    [
        "cdc_latest_state_by_user",
        "cdc_derived_event_stats",
        "cdc_derived_lang_stats",
        "cdc_joined_derived_stats",
        "cdc_state_as_of",
        "event_type_value_profile",
        "cdc_hourly_event_counts",
        "cdc_sessionize_users",
        "q1_pricing_summary",
        "q3_building_order_revenue",
        "supplier_balance_by_region",
        "order_priority_counts",
        "priority_item_stats",
        "event_props_k_stats",
        "doc_lang_source_counts",
        "monthly_ship_volume",
        "part_brand_stats",
        "top_users_value_profile",
        "distinct_customers_per_status",
        "customers_without_orders",
        "user_running_value",
        "user_sliding_window_stats",
        "purchase_prev_event",
        "asof_purchase_last_view",
        "lineitem_rollup",
        "brand_top_parts",
        "user_funnel_counts",
        "daily_active_users",
        "cohort_retention_7d",
        "segment_status_pivot",
        "value_band_stats",
        "doc_char_histogram",
        "doc_top_bigrams",
        "doc_term_df",
        "doc_source_cap",
        "doc_contamination",
        "doc_hash_sample",
        "doc_token_scrub",
        "doc_seq_pack",
        "doc_exact_dedup",
        "doc_jaccard_exact_pairs",
        "doc_jaccard_dedup_keep",
        "doc_token_stats",
        "doc_quality_flags",
        "doc_simhash",
        "doc_fingerprints",
        "doc_lang_id",
        "ann_cosine_topk",
        "embedding_neardup_pairs",
        "label_centroid_norms",
        "embedding_cluster_assign",
    ],
)
def test_relational_parity(ray_session, name):
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_parity(q(SF_DIR), sql)

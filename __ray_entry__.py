"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` exposes the operator inventory (SURVEY.md §2 + training-data
ops); ``oracle_sql()`` the DuckDB equivalents where SQL can express the
semantics. Column names and float rounding are kept identical on both sides.
"""

from __future__ import annotations

import sys
import os
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: CDC latest-state compaction over the sf0.001 events stream."""
    from canal_ray.ops.relational import latest_events_by_user

    return latest_events_by_user("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from canal_ray.ops import ann as A
    from canal_ray.ops import dedup as D
    from canal_ray.ops import multimodal as M
    from canal_ray.ops import relational as R
    from canal_ray.ops import text as T

    from canal_ray.ops.cdc_smoke import (
        cdc_ann_index_follow,
        cdc_connector_drain,
        cdc_derived_event_stats,
        cdc_flat_produce,
        cdc_group_merge,
        cdc_joined_derived_stats,
        cdc_metrics_stream,
        cdc_state_as_of,
        cdc_derived_lang_stats,
        cdc_derived_rename_stats,
        cdc_replay_smoke,
        cdc_row_filter_smoke,
        cdc_schema_timeline,
    )

    # ORDERING CONTRACT: the driver's correctness gate checks the FIRST 50
    # entries, so 50 DuckDB-oracled queries come first; rows-only /
    # self-oracled entries follow (one extra oracled query,
    # user_sliding_window_stats, sits post-window with its parity asserted
    # in pytest). Two composites keep the checked set at 50 without
    # dropping operators:
    #   event_type_value_profile = event_type_stats + value_spread_by_type
    #                              + median_value_by_type (shared key)
    #   top_users_value_profile  = top_users_by_value + user_value_minmax
    return {
        # ============ DuckDB-ORACLED (exactly 50; driver window) =========
        # --- the CDC engine over registered tables -----------------------
        # derived table over the REGISTERED events table replayed through the
        # full engine as a change stream — SQL-oracle-checkable end to end
        "cdc_derived_event_stats": cdc_derived_event_stats,
        # per-language derived table over the documents change stream
        # (ES-adapter lang_stats surface) — full SQL oracle
        "cdc_derived_lang_stats": cdc_derived_lang_stats,
        # point-in-time state_as_of(lsn) read over the same replayed
        # stream — full SQL oracle (row_number cut + latest-per-key)
        "cdc_state_as_of": cdc_state_as_of,
        # JOIN-TABLE derived maintenance (ESSyncService updateByQuery
        # analog): group from a dimension stream, values from a fact
        # stream, two co-partitioned lakes — full SQL oracle
        "cdc_joined_derived_stats": cdc_joined_derived_stats,
        # --- CDC semantics over the events change stream -----------------
        "cdc_latest_state_by_user": R.latest_events_by_user,
        # composite: event_type_stats + value_spread_by_type +
        # median_value_by_type (all three distributed plans run; outputs
        # joined on the shared event_type key)
        "event_type_value_profile": R.event_type_value_profile,
        "cdc_hourly_event_counts": R.hourly_event_counts,
        "cdc_sessionize_users": R.sessionize_users,
        # --- relational coverage ----------------------------------------
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_building_order_revenue": R.building_segment_order_revenue,
        "supplier_balance_by_region": R.supplier_balance_by_region,
        "order_priority_counts": R.order_priority_counts,
        "priority_item_stats": R.priority_item_stats,
        "event_props_k_stats": R.event_props_k_stats,
        "doc_lang_source_counts": R.doc_lang_source_counts,
        "monthly_ship_volume": R.monthly_ship_volume,
        "part_brand_stats": R.part_brand_stats,
        # composite: top_users_by_value + user_value_minmax (grouped top-k
        # with aggregate bounds)
        "top_users_value_profile": R.top_users_value_profile,
        "distinct_customers_per_status": R.distinct_customers_per_status,
        "customers_without_orders": R.customers_without_orders,
        "user_running_value": R.user_running_value,
        "purchase_prev_event": R.purchase_prev_event,
        # two-stream as-of join (trade/quote shape; DuckDB ASOF JOIN oracle)
        "asof_purchase_last_view": R.asof_purchase_last_view,
        # GROUP BY ROLLUP levels (leaf distributed, levels from partials)
        "lineitem_rollup": R.lineitem_rollup,
        # grouped top-k after a fact-fact join (top parts per brand)
        "brand_top_parts": R.brand_top_parts,
        # ordered conversion funnel (strictly-after stage semantics)
        "user_funnel_counts": R.user_funnel_counts,
        # distinct-users-per-day (dedup-then-count, no global set)
        "daily_active_users": R.daily_active_users,
        # cohort retention (per-user min/max partials, two tiny exchanges)
        "cohort_retention_7d": R.cohort_retention_7d,
        # conditional-aggregation pivot after a fact-fact hash join
        "segment_status_pivot": R.segment_status_pivot,
        # non-equi range join (broadcast interval lookup vs SQL range join)
        "value_band_stats": R.value_band_stats,
        # corpus length profile (fixed-width histogram, SQL-oracled)
        "doc_char_histogram": R.doc_char_histogram,
        # --- deduplication (training-data pipeline) ----------------------
        "doc_exact_dedup": D.exact_dedup,
        # exact all-pairs word-trigram Jaccard (SQL-oracle-checkable)
        "doc_jaccard_exact_pairs": D.ngram_jaccard_exact_pairs,
        # connected-component dedup over the exact edges (recursive-CTE
        # min-label oracle — the SQL-checkable variant of the minhash keep)
        "doc_jaccard_dedup_keep": D.jaccard_dedup_keep,
        "doc_simhash": D.simhash_docs,  # oracle-backed (md5 token hash)
        "embedding_neardup_pairs": D.embedding_neardup_pairs,
        # --- text analysis ----------------------------------------------
        "doc_token_stats": T.token_stats,
        "doc_quality_flags": T.quality_flags,
        "doc_lang_id": T.lang_id,  # oracle-backed (stopword-profile argmax)
        "doc_fingerprints": T.doc_fingerprints,  # oracle-backed (md5 rolling hash)
        # corpus-wide top-k n-gram statistics (exact, SQL-oracled)
        "doc_top_bigrams": T.top_bigrams,
        # document-frequency stats (the DF side of TF-IDF/BM25, SQL-oracled)
        "doc_term_df": T.term_doc_frequency,
        # per-(lang, source) downsampling cap (partial cap per batch -> one
        # bounded exchange; the "cap the dominant crawl" curation step)
        "doc_source_cap": T.source_cap,
        # eval-set leakage screen (broadcast pattern list, vectorized regex)
        "doc_contamination": T.contamination_screen,
        # deterministic stratified sampling (salted hash, no exchange)
        "doc_hash_sample": T.hash_sample,
        # deny-list scrub (the PII-redaction machinery, vectorized regex)
        "doc_token_scrub": T.token_scrub,
        # concat-and-chunk sequence packing (distributed token prefix-sum)
        "doc_seq_pack": T.seq_pack,
        # --- similarity search ------------------------------------------
        "ann_cosine_topk": A.ann_cosine_topk,
        "label_centroid_norms": A.label_centroid_norms,
        # nearest-centroid assignment (Lloyd E-step; broadcast matmul vs
        # SQL cross-join argmax)
        "embedding_cluster_assign": A.embedding_cluster_assign,
        # ============ ROWS-ONLY / SELF-ORACLED (after the window) ========
        # --- the CDC engine itself (oracle-asserted in-process) ----------
        "cdc_replay_smoke": cdc_replay_smoke,
        # consumer protocol (subscribe/get/ack/rollback) end-to-end
        "cdc_connector_drain": cdc_connector_drain,
        # derived table whose spec names a PRE-rename column (rename/drop
        # fixture; in-process recompute oracle on every call)
        "cdc_derived_rename_stats": cdc_derived_rename_stats,
        # row-level content predicate replay (aviator EL analog),
        # in-process filtered-oracle assert on every call
        "cdc_row_filter_smoke": cdc_row_filter_smoke,
        # point-in-time schema rebuild (DatabaseTableMeta.rollback analog)
        "cdc_schema_timeline": cdc_schema_timeline,
        # MQ-producer surface: partitioned FlatMessage JSON, 1:1-lossless
        # asserted against the log's own op column every call
        "cdc_flat_produce": cdc_flat_produce,
        # Prometheus-collector surface: metrics stream deduped per the
        # at-least-once contract, cross-checked vs checkpoint manifests
        "cdc_metrics_stream": cdc_metrics_stream,
        # sharded-source fan-in (GroupEventParser timeline-barrier analog):
        # two shard logs merged, replayed, oracle-asserted in-process
        "cdc_group_merge": cdc_group_merge,
        # CDC-maintained ANN index (ESSyncService "index follows the table"
        # analog fused with the persisted IVF index): embedding change
        # stream -> incremental bucket maintenance -> probe; fresh-built
        # reference equality asserted in-process (size-gated)
        "cdc_ann_index_follow": cdc_ann_index_follow,
        # mergeable histogram-sketch quantiles (the 10^8-values/group scale
        # path; merge-oracle + exact-tracking asserts in-process)
        "approx_quantiles_by_type": R.approx_quantiles_by_type,
        # HyperLogLog distinct counts (fixed 2^p registers per group; merged
        # registers + 3-sigma band asserted in-process)
        "approx_distinct_users_by_type": R.approx_distinct_users_by_type,
        # sliding event-time window per key (daily partials -> cumsum +
        # searchsorted slide; completes the window family). Oracled in
        # oracle_sql() but placed post-window — the driver's 50-row gate is
        # full; DuckDB parity asserted in tests/test_ops_parity.py
        "user_sliding_window_stats": R.user_sliding_window_stats,
        # SUBSTRING-level dedup (ExactSubstr shape, Lee et al. 2022):
        # per-doc duplicated-span token coverage via window fingerprints;
        # sequential dict-recompute oracle in-process (size-gated)
        "doc_dup_span_stats": D.dup_span_token_stats,
        # production lake-write of dedup-keep labels (hash-bucketed
        # partitioned parquet; written rows asserted equal to the DataFrame
        # contract in-process, size-gated)
        "doc_dedup_labels_lake": D.dedup_labels_lake_summary,
        # --- probabilistic dedup (recall asserted in pytest) -------------
        "doc_minhash_dup_pairs": D.minhash_lsh_dup_pairs,
        "doc_minhash_dedup_keep": D.minhash_dedup_keep,
        "doc_ngram_jaccard_pairs": D.ngram_jaccard_pairs,
        # BPE-ish regex token counting (GPT-2 pre-tokenizer subset; exact
        # sequential-recompute oracle in-process)
        "doc_bpe_token_counts": T.bpe_token_counts,
        # BM25 keyword retrieval (lexical counterpart to the ANN family:
        # bounded df/stats pass + vectorized scoring pass + partial top-k;
        # sequential-recompute oracle in-process)
        "doc_bm25_topk": T.bm25_topk,
        # bigram-LM perplexity quality scoring (CCNet-style filter; model
        # trained distributed, broadcast, scored vectorized; count-exact +
        # 1e-9 score oracles in-process)
        "doc_lm_perplexity": T.lm_perplexity,
        # Misra-Gries heavy-hitters sketch (bounded exchange, self-reported
        # error bound; exact-top-5-subset + bound asserted in-process)
        "doc_top_bigrams_sketch": T.top_bigrams_sketch,
        # within-doc repetition signals (Gopher filters: duplicate 2/3-gram
        # fractions + top-token share; Counter recompute oracle in-process)
        "doc_repetition_stats": T.repetition_stats,
        # --- multimodal plumbing (image/audio/video frame-sample; fake
        # codecs, real Ray actor-pool stages; in-process spot-decode asserts)
        "multimodal_media_features": M.multimodal_media_features,
        # --- approximate similarity search -------------------------------
        "ann_lsh_topk": A.ann_lsh_topk,
        "ann_ivf_topk": A.ann_ivf_topk,
        # persisted bucket-partitioned index; directory-pruned probe reads
        "ann_ivf_indexed_topk": A.ann_ivf_indexed_topk,
        # recall@k evaluation of every approximate variant vs brute force
        # (the production tuning loop; deterministic, self-evaluating)
        "ann_recall_report": A.ann_recall_report,
        # full distributed k-means (iterative-algorithm shape: fused E+M
        # pass per round, k x d partial sums, driver holds only centroids;
        # sequential-Lloyd assignment oracle in-process)
        "embedding_kmeans": A.embedding_kmeans,
    }


def oracle_sql() -> dict[str, str]:
    from canal_ray.ops.oracles import RELATIONAL_SQL, TRAINING_SQL

    return {**RELATIONAL_SQL, **TRAINING_SQL}

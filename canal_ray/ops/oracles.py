"""DuckDB oracle SQL for the oracle-checkable queries.

Column names and float rounding MUST mirror the Ray implementations — the
driver sorts columns by name and value-hashes, so any alias or rounding
drift is a correctness failure.
"""

RELATIONAL_SQL: dict[str, str] = {
    "cdc_latest_state_by_user": """
        SELECT user_id, event_id, ts, event_type, value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) = 1
    """,
    # derived-table path (ES-adapter analog): the events table replayed as a
    # change stream keyed by user_id through the full engine, then the
    # incrementally maintained aggregate groups the LATEST per-user state
    "cdc_derived_event_stats": """
        WITH latest AS (
            SELECT user_id, event_type,
                   CAST(round(value * 10000) AS BIGINT) AS value_c
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) = 1
        )
        SELECT event_type,
               count(*)                        AS n_users,
               CAST(sum(value_c) AS BIGINT)    AS total_value_c
        FROM latest GROUP BY event_type
    """,
    # derived-table path over the documents change stream (ES-adapter
    # lang_stats surface): each doc upserts exactly once keyed by doc_id,
    # so the incrementally maintained per-language aggregate equals a plain
    # GROUP BY over the registered table
    "cdc_derived_lang_stats": """
        SELECT lang,
               count(*)                     AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang
    """,
    # point-in-time (state_as_of) read of the replayed events change stream:
    # the stream's lsn equals the (ts, event_id) rank, so the cut at 60% of
    # the log is a row_number window filter, then latest-per-key
    "cdc_state_as_of": """
        WITH ranked AS (
            SELECT CAST(user_id AS VARCHAR) AS uid, event_type,
                   CAST(round(value * 10000) AS BIGINT) AS value_c,
                   row_number() OVER (ORDER BY ts, event_id) AS rn
            FROM events
        )
        SELECT uid, event_type, value_c
        FROM ranked
        WHERE rn <= (SELECT CAST(floor(count(*) * 0.6) AS BIGINT) FROM events)
        QUALIFY row_number() OVER (PARTITION BY uid ORDER BY rn DESC) = 1
    """,
    # join-table derived maintenance (updateByQuery analog): the dim stream
    # assigns each user's LATEST event_type as the group; the fact stream
    # carries the LATEST value_c — both latest-per-key over the same order
    "cdc_joined_derived_stats": """
        WITH latest AS (
            SELECT user_id, event_type,
                   CAST(round(value * 10000) AS BIGINT) AS value_c
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) = 1
        )
        SELECT event_type,
               count(*)                     AS n_users,
               CAST(sum(value_c) AS BIGINT) AS total_value_c
        FROM latest GROUP BY event_type
    """,
    # registry-window composite: event_type_stats + value_spread_by_type +
    # median_value_by_type on the shared event_type key (one wide GROUP BY;
    # the Ray side runs the three distributed plans and joins their tiny
    # per-type outputs). The variance uses the same (n, sum, sumsq)
    # decomposition on both sides so float association matches.
    "event_type_value_profile": """
        WITH g AS (
            SELECT event_type,
                   count(*)               AS n,
                   round(sum(value), 4)   AS sum_value,
                   round(avg(value), 6)   AS avg_value,
                   round(min(value), 6)   AS min_value,
                   round(max(value), 6)   AS max_value,
                   sum(value)             AS s,
                   sum(value * value)     AS s2,
                   round(median(value), 6)             AS median_value,
                   round(quantile_cont(value, 0.9), 6) AS p90_value
            FROM events GROUP BY event_type
        )
        SELECT event_type, n, sum_value, avg_value, min_value, max_value,
               round((s2 - s * s / n) / (n - 1), 4)       AS var_value,
               round(sqrt((s2 - s * s / n) / (n - 1)), 4) AS stddev_value,
               median_value, p90_value
        FROM g ORDER BY event_type
    """,
    "cdc_hourly_event_counts": """
        SELECT date_trunc('hour', ts) AS hour,
               event_type,
               count(*)             AS n,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "cdc_sessionize_users": """
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked
        ), sized AS (
            SELECT user_id, session_id, count(*) AS sz
            FROM sessions GROUP BY user_id, session_id
        )
        SELECT user_id,
               sum(sz)::BIGINT            AS n_events,
               count(*)::BIGINT           AS n_sessions,
               max(sz)::BIGINT            AS max_session_events
        FROM sized GROUP BY user_id
    """,
    # Money arithmetic is done in exact int64 'cents' on both sides (see
    # relational._cents): float sums are block-order-dependent in any
    # distributed engine and TPC-H money lands on half-cent rounding
    # boundaries, so exact integer sums are the only reproducible form.
    "q1_pricing_summary": """
        WITH scaled AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(l_quantity AS BIGINT)                        AS qty_i,
                   CAST(round(l_extendedprice * 100) AS BIGINT)      AS base_c,
                   CAST(round(l_discount * 100) AS BIGINT)           AS disc_bp,
                   CAST(round(l_tax * 100) AS BIGINT)                AS tax_bp
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        )
        SELECT l_returnflag, l_linestatus,
               CAST(sum(qty_i) AS DOUBLE)                            AS sum_qty,
               sum(base_c) / 100.0                                   AS sum_base_price,
               sum(base_c * (100 - disc_bp)) / 10000.0               AS sum_disc_price,
               sum(base_c * (100 - disc_bp) * (100 + tax_bp)) / 1000000.0 AS sum_charge,
               sum(qty_i) / CAST(count(*) AS DOUBLE)                 AS avg_qty,
               sum(base_c) / 100.0 / CAST(count(*) AS DOUBLE)        AS avg_price,
               sum(disc_bp) / 100.0 / CAST(count(*) AS DOUBLE)       AS avg_disc,
               count(*)                                              AS count_order
        FROM scaled
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_building_order_revenue": """
        WITH rev AS (
            SELECT l.l_orderkey AS o_orderkey,
                   sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0
                       AS revenue,
                   any_value(o.o_orderdate) AS o_orderdate
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY l.l_orderkey
        )
        SELECT o_orderkey, revenue, o_orderdate FROM rev WHERE revenue > 100000.0
    """,
    "supplier_balance_by_region": """
        SELECT r.r_name,
               count(*) AS n_suppliers,
               sum(CAST(round(s.s_acctbal * 100) AS BIGINT)) / 100.0 AS total_acctbal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "order_priority_counts": """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1994-01-01' AND o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    "priority_item_stats": """
        SELECT o.o_orderpriority,
               count(*) AS n_items,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    # registry-window composite: top_users_by_value + user_value_minmax
    # (the k winners by exact cent-scaled total, with their aggregate
    # bounds; deterministic (total desc, user_id) tie-break on both sides)
    "top_users_value_profile": """
        WITH agg AS (
            SELECT user_id,
                   sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0 AS total_value,
                   count(*) AS n,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM events GROUP BY user_id
        )
        SELECT user_id, total_value, n, min_value, max_value FROM agg
        ORDER BY total_value DESC, user_id LIMIT 20
    """,
    "distinct_customers_per_status": """
        SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY o_orderstatus
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1998-01-01'
        )
    """,
    "user_running_value": """
        SELECT user_id, event_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ), 4) AS running_value
        FROM events
    """,
    # sliding event-time window per key (RANGE interval frame); value sums
    # in exact int64 cents on both sides. Oracled-but-post-window: the
    # driver's 50-row gate is already full, parity asserted in
    # tests/test_ops_parity.py
    "user_sliding_window_stats": """
        WITH d AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   count(*) AS n,
                   sum(CAST(round(value * 10000) AS BIGINT)) AS value_c
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, day,
               CAST(sum(n) OVER w AS BIGINT)       AS n_7d,
               CAST(sum(value_c) OVER w AS BIGINT) AS total_value_c_7d
        FROM d
        WINDOW w AS (PARTITION BY user_id ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
    """,
    "purchase_prev_event": """
        WITH w AS (
            SELECT user_id, event_id, event_type,
                   lag(event_id)    OVER win AS prev_event_id,
                   lag(event_type)  OVER win AS prev_event_type
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id, prev_event_id, prev_event_type
        FROM w WHERE event_type = 'purchase' AND prev_event_id IS NOT NULL
    """,
    "asof_purchase_last_view": """
        SELECT p.event_id AS purchase_event_id,
               p.user_id  AS user_id,
               v.event_id AS view_event_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    "lineitem_rollup": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "doc_lang_source_counts": """
        SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang, source
    """,
    "monthly_ship_volume": """
        SELECT date_trunc('month', l_shipdate) AS ship_month,
               count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY 1
    """,
    "part_brand_stats": """
        SELECT p_brand,
               count(*) AS n_parts,
               CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size,
               sum(CAST(round(p_retailprice * 100) AS BIGINT)) / 100.0 AS total_price
        FROM part
        WHERE p_type LIKE '%STANDARD%'
        GROUP BY p_brand
    """,
    "event_props_k_stats": """
        SELECT (CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) // 10) * 10
                   AS k_bucket,
               count(*)             AS n,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1
    """,
    # grouped top-k after a fact-fact join (exact int64 cent*bp money units,
    # deterministic (rev desc, partkey asc) tie-break — mirrors the Ray op)
    "brand_top_parts": """
        WITH rev AS (
            SELECT l_partkey AS p_partkey,
                   SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS rev_c4
            FROM lineitem GROUP BY l_partkey
        )
        SELECT p_brand, p.p_partkey, rev_c4 / 10000.0 AS revenue,
               row_number() OVER (
                   PARTITION BY p_brand ORDER BY rev_c4 DESC, p.p_partkey
               ) AS brand_rank
        FROM rev JOIN part p ON p.p_partkey = rev.p_partkey
        QUALIFY brand_rank <= 3
    """,
    # ordered funnel: each stage strictly after the user's first entry into
    # the previous stage (matches the Ray shard-fold's strict-> comparisons)
    "user_funnel_counts": """
        WITH v AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
            WHERE e.event_type = 'click' GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
            WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT 'view' AS stage, count(*) AS n_users FROM v
        UNION ALL SELECT 'view_click', count(*) FROM c
        UNION ALL SELECT 'view_click_purchase', count(*) FROM p
        ORDER BY stage
    """,
    "daily_active_users": """
        SELECT date_trunc('day', ts) AS day,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1 ORDER BY day
    """,
    "cohort_retention_7d": """
        WITH u AS (
            SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
            FROM events GROUP BY user_id
        )
        SELECT date_trunc('day', first_ts) AS cohort_day,
               count(*) AS n_users,
               CAST(sum(CASE WHEN last_ts >= first_ts + INTERVAL 7 DAY
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_retained_7d
        FROM u GROUP BY 1 ORDER BY cohort_day
    """,
    # conditional-aggregation pivot after the fact-fact join (cent-exact)
    "segment_status_pivot": """
        SELECT c_mktsegment,
               count(*) FILTER (o_orderstatus = 'F') AS n_f,
               count(*) FILTER (o_orderstatus = 'O') AS n_o,
               count(*) FILTER (o_orderstatus = 'P') AS n_p,
               COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   FILTER (o_orderstatus = 'F'), 0) / 100.0 AS rev_f,
               COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   FILTER (o_orderstatus = 'O'), 0) / 100.0 AS rev_o,
               COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   FILTER (o_orderstatus = 'P'), 0) / 100.0 AS rev_p
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # non-equi range join against a literal band table (right-open [lo, hi);
    # bands mirror canal_ray.ops.relational.VALUE_BANDS); Ray resolves the
    # same join as a broadcast searchsorted — the oracle pins the semantics
    "value_band_stats": """
        WITH bands(band, lo, hi) AS (VALUES
            ('micro', 0.0, 5.0), ('small', 5.0, 25.0),
            ('mid', 25.0, 100.0), ('large', 100.0, 1000.0))
        SELECT band, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band ORDER BY band
    """,
    # sample variance/stddev via the (n, sum, sumsq) decomposition on both
    # sides so float association matches to the rounded digits
}

TRAINING_SQL: dict[str, str] = {
    "doc_exact_dedup": """
        SELECT min(doc_id) AS doc_id, md5(text) AS text_md5, count(*) AS n_dups
        FROM documents GROUP BY text
    """,
    # exact all-pairs word-trigram Jaccard: whitespace tokens (Python
    # str.split ~ '\s+' with empties dropped), DISTINCT full 3-windows,
    # pairwise |A∩B| / |A∪B| >= 0.5 — byte-matches ngram_jaccard_exact_pairs
    "doc_jaccard_exact_pairs": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS w
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
            FROM toks,
                 LATERAL (SELECT unnest(generate_series(
                     1, greatest(len(w) - 2, 0))) AS i) g
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        -- df cap (max_df=256): hot shingles are excluded from intersection
        -- counting, mirroring the Ray op's bounded-pair contract; union
        -- sizes above stay uncapped
        cold AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 256),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            WHERE a.s IN (SELECT s FROM cold)
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
    """,
    # connected-component dedup over the exact-Jaccard edges: recursive
    # min-label propagation (the SQL form of the Ray op's union-find)
    "doc_jaccard_dedup_keep": """
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS w
            FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
            FROM toks,
                 LATERAL (SELECT unnest(generate_series(
                     1, greatest(len(w) - 2, 0))) AS i) g
        ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        cold AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 256),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            WHERE a.s IN (SELECT s FROM cold)
            GROUP BY 1, 2
        ), pairs AS (
            SELECT doc_a, doc_b FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
        ), edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ), reach(node, peer) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.peer
        )
        SELECT node AS doc_id, min(peer) AS dup_of,
               (min(peer) <> node) AS is_dup
        FROM reach GROUP BY node
    """,
    # token hash on both sides = first 16 hex chars of md5 as UBIGINT
    # (ops.text._tok_hashes): makes simhash / fingerprints / lang-id exactly
    # SQL-expressible instead of rows-only
    "doc_simhash": """
        WITH toks AS (
            SELECT doc_id,
                   CASE WHEN len(trim(text)) = 0 THEN ['']
                        ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
            FROM documents
        ), th AS (
            SELECT doc_id,
                   unnest(list_transform(
                       t, x -> ('0x' || substr(md5(x), 1, 16))::UBIGINT)) AS hv
            FROM toks
        ), bits AS (
            SELECT doc_id, b.b,
                   sum(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
            FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) b
            GROUP BY doc_id, b.b
        ), asm AS (
            SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN (1::HUGEINT << b) ELSE 0 END) AS v
            FROM bits GROUP BY doc_id
        )
        SELECT doc_id,
               (CASE WHEN v >= 9223372036854775808 THEN v - 18446744073709551616
                     ELSE v END)::BIGINT AS simhash
        FROM asm
    """,
    "doc_fingerprints": """
        WITH toks AS (
            SELECT doc_id,
                   CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
            FROM documents
        ), th AS (
            SELECT doc_id,
                   list_transform(t, x -> ('0x' || substr(md5(x), 1, 16))::UBIGINT) AS h
            FROM toks
        )
        SELECT doc_id,
               (CASE
                  WHEN len(h) = 0 THEN 0::HUGEINT
                  WHEN len(h) < 4 THEN list_min(h)::HUGEINT % 9223372036854775808
                  ELSE list_min(list_transform(range(1, len(h) - 2), j ->
                      ((((((h[j]::HUGEINT % 9223372036854775808) * 1000003
                           + h[j+1]) % 9223372036854775808) * 1000003
                           + h[j+2]) % 9223372036854775808) * 1000003
                           + h[j+3]) % 9223372036854775808))
                END)::BIGINT AS fingerprint
        FROM th
    """,
    "doc_lang_id": """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents
        ), sc AS (
            SELECT doc_id,
                   len(list_filter(t, x -> x IN
                       ('the','a','of','to','and','in','value','table','row','key')))::DOUBLE
                       / greatest(1, len(t)) AS s_en,
                   len(list_filter(t, x -> x IN
                       ('der','die','das','und','ist','ein','nicht','mit')))::DOUBLE
                       / greatest(1, len(t)) AS s_de,
                   len(list_filter(t, x -> x IN
                       ('le','la','les','et','un','une','est','pour')))::DOUBLE
                       / greatest(1, len(t)) AS s_fr,
                   len(list_filter(t, x -> x IN
                       ('el','la','los','las','y','es','un','una','para')))::DOUBLE
                       / greatest(1, len(t)) AS s_es
            FROM toks
        )
        SELECT doc_id,
               CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END AS lang_pred,
               greatest(s_en, s_de, s_fr, s_es) AS lang_score
        FROM sc
    """,
    # deterministic per-(lang, source) downsampling cap (stable doc_id rule)
    "doc_source_cap": """
        SELECT doc_id, lang, source FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang, source ORDER BY doc_id
        ) <= 50
    """,
    # eval-set leakage screen; pattern list mirrors
    # canal_ray.ops.text.CONTAMINATION_PATTERNS verbatim
    "doc_contamination": """
        SELECT doc_id,
               regexp_matches(
                   text,
                   'merge sort line|query filter batch|stream window agg'
               ) AS contaminated
        FROM documents
    """,
    # corpus-wide top-k word bigrams (same trim+\s+ tokenization as
    # doc_token_stats; total order (n desc, bigram asc) makes LIMIT exact)
    "doc_top_bigrams": """
        WITH toks AS (
            SELECT regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ), bg AS (
            SELECT unnest(list_transform(
                generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1]
            )) AS bigram
            FROM toks
        )
        SELECT bigram, count(*)::BIGINT AS n
        FROM bg GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 20
    """,
    "doc_token_stats": """
        WITH toks AS (
            SELECT doc_id, length(text) AS n_chars,
                   regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        )
        SELECT doc_id, n_chars,
               len(t)::BIGINT AS n_tokens,
               CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                   / len(t) AS mean_token_len,
               CAST(len(list_filter(t, x -> x IN
                        ('a', 'the', 'key', 'row', 'value', 'table'))) AS DOUBLE)
                   / len(t) AS stopword_ratio
        FROM toks
    """,
    "doc_quality_flags": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ), s AS (
            SELECT doc_id,
                   len(t)::BIGINT AS n_tokens,
                   CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                       / len(t) AS mtl,
                   len(list_filter(t, x -> x IN
                        ('a', 'the', 'key', 'row', 'value', 'table'))) AS n_stop
            FROM toks
        )
        SELECT doc_id,
               (n_tokens >= 10 AND n_tokens <= 10000) AS len_ok,
               (mtl >= 2.0 AND mtl <= 12.0)           AS token_len_ok,
               (n_stop > 0)                           AS has_stopwords
        FROM s
    """,
    "ann_cosine_topk": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings WHERE vec_id < 8
        )
        SELECT query_id, e.vec_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                            e.vec_id
               ) AS rank
        FROM q JOIN embeddings e ON e.vec_id != q.query_id
        QUALIFY rank <= 10
    """,
    "embedding_neardup_pairs": """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.4
    """,
    # nearest-centroid assignment (one Lloyd E-step): centroids are the
    # deterministic seed set vec_id < 8, assignment = argmax cosine with
    # lowest-centroid-id tie-break — the Ray side is one broadcast matmul
    "embedding_cluster_assign": """
        WITH c AS (
            SELECT vec_id AS centroid_id, embedding AS ce
            FROM embeddings WHERE vec_id < 8
        )
        SELECT e.vec_id, centroid_id
        FROM embeddings e CROSS JOIN c
        QUALIFY row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, centroid_id
        ) = 1
        ORDER BY e.vec_id
    """,
    "label_centroid_norms": """
        WITH dims AS (
            SELECT label, i, sum(v) AS s
            FROM (
                SELECT label,
                       unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
            GROUP BY label, i
        ), cnt AS (
            SELECT label, count(*) AS n FROM embeddings GROUP BY label
        )
        SELECT c.label, c.n,
               round(sqrt(sum((d.s / c.n) * (d.s / c.n))), 6) AS centroid_norm
        FROM dims d JOIN cnt c USING (label)
        GROUP BY c.label, c.n
    """,
    # document-frequency side of TF-IDF/BM25 (all-integer; total order
    # (df desc, term asc) makes LIMIT exact)
    "doc_term_df": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents
        )
        SELECT term,
               count(DISTINCT doc_id)::BIGINT AS df,
               count(*)::BIGINT AS total_tf
        FROM toks GROUP BY term
        ORDER BY df DESC, term LIMIT 20
    """,
    # deny-list scrub (PII-redaction machinery): RE2 and Python 're' agree
    # on \b word boundaries for these literal alternates
    "doc_token_scrub": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\\b(key|table|row)\\b'))
                    AS BIGINT) AS n_redactions,
               md5(regexp_replace(text, '\\b(key|table|row)\\b', '<MASK>', 'g'))
                   AS scrubbed_md5
        FROM documents
    """,
    # concat-and-chunk sequence packing: global token prefix-sum in doc_id
    # order, window id = offset // cap (cap mirrors text.PACK_CAP)
    "doc_seq_pack": """
        WITH t AS (
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT
                       AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, n_tokens,
                   COALESCE(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS off
            FROM t
        )
        SELECT doc_id, n_tokens,
               CAST(off // 256 AS BIGINT) AS seq_id,
               CAST(off % 256 AS BIGINT) AS offset_in_seq
        FROM c ORDER BY doc_id
    """,
    # deterministic stratified sampler: salted-md5 bucket < per-lang rate
    # (the literal rates mirror canal_ray.ops.text.SAMPLE_RATE_PCT)
    "doc_hash_sample": """
        SELECT doc_id, lang FROM documents
        WHERE CAST(('0x' || substr(md5('v1|' || CAST(doc_id AS VARCHAR)), 1, 16))
                   AS UBIGINT) % 100
              < CASE lang WHEN 'en' THEN 30 ELSE 80 END
    """,
    "doc_char_histogram": """
        SELECT CAST(floor(n_chars / 500.0) * 500 AS BIGINT) AS bucket_lo,
               count(*) AS n_docs
        FROM documents GROUP BY 1 ORDER BY bucket_lo
    """,
}

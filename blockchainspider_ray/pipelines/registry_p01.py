"""Registry part 1: ORACLE_SQL / SQL_QUERIES / NOSQL_QUERIES
entries in the monolith's original statement order."""

from __future__ import annotations

from .common import *  # noqa: F401,F403
from .q_crawl import (  # noqa: F401
    q_bfs_reachable,
    q_browser_render,
    q_canonicalize_urls,
    q_crawl_appr,
    q_crawl_appr_sharded,
    q_crawl_bfs,
    q_crawl_bfs_dataset,
    q_crawl_bfs_depths,
    q_crawl_haircut,
    q_crawl_haircut_sharded,
    q_crawl_poison,
    q_crawl_ttr_redirect,
    q_crawl_ttr_time,
    q_crawl_ttr_time_sharded,
    q_crawl_ttr_weight,
    q_extract_links,
    q_host_cap,
    q_host_gini,
    q_host_histogram,
    q_host_pagerank,
    q_host_quality_budget,
    q_host_topk,
    q_hourly_autocorr,
    q_labelcloud_parse,
    q_politeness_admission,
    q_recrawl_plan,
    q_recrawl_schedule,
    q_redirect_depth_histogram,
    q_redirect_resolve,
    q_robots_filter,
    q_salted_host_agg,
    q_sign_pages,
    q_sitemap_parse,
    q_source_host_entropy,
    q_tail_exponent,
    q_topk_frontier,
    q_url_features,
    q_url_templates,
    q_warc_parse,
    q_warc_roundtrip,
)
from .q_curation import (  # noqa: F401
    q_badwords_filter,
    q_boilerplate_lines,
    q_c4_filter,
    q_curation_pipeline,
    q_decontaminate,
    q_decontaminate_fuzzy,
    q_dsir_resample,
    q_dsir_weights,
    q_filter_project,
    q_frame_sample,
    q_gopher_quality,
    q_hash_sample,
    q_mix_proportions,
    q_mix_temperature,
    q_nonedge_sample,
    q_pack_sequences,
    q_pack_stats,
    q_pii_redact,
    q_pretrain_mix,
    q_quality_blend,
    q_quality_grid,
    q_quality_score,
    q_quality_token_tradeoff,
    q_shuffle_rank,
    q_split_assign,
    q_stratified_sample,
)
from .q_dedup import (  # noqa: F401
    q_dedup_clusters,
    q_dedup_exact,
    q_dedup_spans_remove,
    q_dedup_survivors,
    q_doc_fingerprint,
    q_dup_span_fraction,
    q_fuzzy_dedup_clusters,
    q_jaccard_pairs,
    q_lsh_bucket_histogram,
    q_lsh_recall_curve,
    q_minhash_dedup_pairs,
    q_minhash_estimate_error,
    q_minhash_incremental,
    q_minhash_signatures,
    q_rolling_fingerprints,
    q_semdedup,
    q_simhash,
    q_simhash_pairs,
    q_softdedup_weights,
)
from .q_etl import (  # noqa: F401
    q_block_parse,
    q_dcfg_parse,
    q_extract_entities,
    q_jsonl_roundtrip,
    q_parse_props,
    q_receipt_join,
    q_solana_block_parse,
    q_solana_tx_lookup,
    q_token_decode,
    q_trace_flatten,
    q_transfer_normalize,
    q_tron_block_parse,
    q_utxo_edges,
    q_validated_entities,
    q_xml_labels,
)
from .q_graph import (  # noqa: F401
    q_avg_path_length,
    q_degree_assortativity,
    q_graph_features,
    q_hits,
    q_kcore,
    q_lpa_communities,
    q_motif_vector,
    q_node_degree,
    q_opic_priority,
    q_pagerank,
    q_sssp,
    q_topic_purity,
    q_triangle_count,
    q_wedge_count,
)
from .q_relational import (  # noqa: F401
    q_anchor_agg,
    q_asof_join,
    q_asof_join_partitioned,
    q_bloom_semijoin,
    q_burst_windows,
    q_df_idf_topk,
    q_events_agg,
    q_events_window,
    q_hash_join,
    q_join_agg,
    q_lineitem_agg,
    q_range_join,
    q_range_join_partitioned,
    q_rollup_agg,
    q_sessionize,
    q_similarity_join,
    q_skew_join,
    q_snapshot_delta,
    q_sort_limit,
    q_tpch_q18,
    q_tpch_q3,
    q_window_distinct_users,
    q_window_hopping,
    q_window_rolling_avg,
)
from .q_similarity import (  # noqa: F401
    q_ann_bruteforce,
    q_ann_ivf,
    q_ann_ivf_exact,
    q_ann_lsh,
    q_ann_pq,
    q_embedding_knn,
    q_embedding_neardup_pairs,
    q_embedding_norms,
    q_kmeans_assign,
    q_kmeans_inertia,
    q_kmeans_lloyd,
)
from .q_sketch import (  # noqa: F401
    q_hll_distinct,
    q_quantile_sketch_error,
)
from .q_stats import (  # noqa: F401
    q_anova_f,
    q_association_rules,
    q_audio_decode,
    q_binary_meta,
    q_bowtie,
    q_chi2_lang_source,
    q_cluster_size_histogram,
    q_clustering_coefficient,
    q_corr_matrix,
    q_cross_source_overlap,
    q_csv_roundtrip,
    q_curriculum_order,
    q_daily_top_users,
    q_decayed_user_scores,
    q_dist_divergence,
    q_distinctive_terms,
    q_dup_rate_by_source,
    q_enrich_3way,
    q_event_interarrival,
    q_event_runs,
    q_event_transitions,
    q_event_value_quantiles,
    q_funnel_steps,
    q_group_percentiles,
    q_grouped_mode,
    q_hard_negatives,
    q_heavy_hitters,
    q_hist_quantiles,
    q_image_decode,
    q_image_resize,
    q_ipf_raking,
    q_ks_drift,
    q_label_centroid_distance,
    q_latest_event,
    q_length_zscore,
    q_levenshtein_verify,
    q_link_locality,
    q_link_reciprocity,
    q_mad_outliers,
    q_max_drawdown,
    q_mi_lang_source,
    q_monthly_revenue_delta,
    q_nb_classify,
    q_new_users_daily,
    q_ols_fit,
    q_oov_rate,
    q_outflow_sum,
    q_pca_power,
    q_peak_concurrency,
    q_pivot_counts,
    q_postings_build,
    q_proportion_ztest,
    q_rare_category_merge,
    q_rate_limit_offenders,
    q_retention_cohorts,
    q_rrf_fusion,
    q_running_total,
    q_scc_pivot,
    q_schema_profile,
    q_score_calibration,
    q_self_repetition,
    q_session_stats,
    q_silhouette_simplified,
    q_skipgram_counts,
    q_span_merge,
    q_stationary_distribution,
    q_touch_attribution,
    q_trigram_transitions,
    q_trimmed_mean,
    q_unigram_logprob,
    q_weighted_median,
    q_welch_ttest,
    q_winsorize,
    q_zlib_ratio,
)
from .q_text import (  # noqa: F401
    q_bigram_logprob,
    q_bigram_topk,
    q_bm25_scores,
    q_bpe_encode,
    q_bpe_pair_counts,
    q_bpe_train,
    q_char_entropy,
    q_chunk_texts,
    q_cms_token_counts,
    q_extract_text,
    q_keywords_freq,
    q_keywords_summary,
    q_langid,
    q_langid_confusion,
    q_ngram_hash_features,
    q_pmi_bigrams,
    q_sentence_split,
    q_text_normalize,
    q_tfidf_topterms,
    q_token_count,
    q_token_entropy,
    q_token_quantiles,
    q_tokenizer_fertility,
    q_vocab_topk,
)


ORACLE_SQL: Dict[str, str] = {
    # engine BFS with layer-per-round config: round == BFS depth over the
    # arithmetic crawl_doc_html link graph (fixtures.py) — found pages via
    # t1=7d+1 / same-host t3=d+10, dead-end misses (query-string variant,
    # dangling host, cdn script) one layer below their earliest parent
    "crawl_bfs_depths": """
        WITH RECURSIVE r AS (
            SELECT CAST(0 AS BIGINT) AS doc, CAST(0 AS BIGINT) AS depth
            UNION
            SELECT s.nxt, s.depth + 1 FROM (
                SELECT (doc * 7 + 1) % (SELECT count(*) FROM documents) AS nxt, depth
                FROM r WHERE depth < 31
                UNION ALL
                SELECT (doc + 10) % (SELECT count(*) FROM documents) AS nxt, depth
                FROM r
                WHERE depth < 31
                  AND ((doc + 10) % (SELECT count(*) FROM documents)) % 10 = doc % 10
            ) s
        ),
        f AS (SELECT doc, MIN(depth) AS depth FROM r GROUP BY doc),
        nn AS (SELECT count(*) AS n FROM documents),
        misses AS (
            SELECT 'http://site' || (((f.doc * 13 + 3) % nn.n) % 10) || '.example/d/'
                   || ((f.doc * 13 + 3) % nn.n) || '?a=1&b=2' AS url,
                   f.depth + 1 AS d
            FROM f, nn WHERE f.depth < 31
            UNION ALL
            SELECT 'http://dangling' || (f.doc % 5) || '.example/x/' || f.doc,
                   f.depth + 1 FROM f WHERE f.depth < 31
            UNION ALL
            SELECT 'http://cdn' || (f.doc % 3) || '.example/app.js',
                   f.depth + 1 FROM f WHERE f.depth < 31
        )
        SELECT round, url, found FROM (
            SELECT depth AS round,
                   'http://site' || (doc % 10) || '.example/d/' || doc AS url,
                   TRUE AS found
            FROM f
            UNION ALL
            SELECT MIN(d) AS round, url, FALSE AS found FROM misses GROUP BY url
        ) ORDER BY round, url
    """,
    # Dataset-native BFS, budget-free: same arithmetic graph as
    # crawl_bfs_depths, depth-capped at 6, output = every admitted-new url
    # (found docs AND dead-end misses) with round == BFS depth
    "crawl_bfs_dataset": """
        WITH RECURSIVE r AS (
            SELECT CAST(0 AS BIGINT) AS doc, CAST(0 AS BIGINT) AS depth
            UNION
            SELECT s.nxt, s.depth + 1 FROM (
                SELECT (doc * 7 + 1) % (SELECT count(*) FROM documents) AS nxt, depth
                FROM r WHERE depth < 6
                UNION ALL
                SELECT (doc + 10) % (SELECT count(*) FROM documents) AS nxt, depth
                FROM r
                WHERE depth < 6
                  AND ((doc + 10) % (SELECT count(*) FROM documents)) % 10 = doc % 10
            ) s
        ),
        f AS (SELECT doc, MIN(depth) AS depth FROM r GROUP BY doc),
        nn AS (SELECT count(*) AS n FROM documents),
        misses AS (
            SELECT 'http://site' || (((f.doc * 13 + 3) % nn.n) % 10) || '.example/d/'
                   || ((f.doc * 13 + 3) % nn.n) || '?a=1&b=2' AS url,
                   f.depth + 1 AS d
            FROM f, nn WHERE f.depth < 6
            UNION ALL
            SELECT 'http://dangling' || (f.doc % 5) || '.example/x/' || f.doc,
                   f.depth + 1 FROM f WHERE f.depth < 6
            UNION ALL
            SELECT 'http://cdn' || (f.doc % 3) || '.example/app.js',
                   f.depth + 1 FROM f WHERE f.depth < 6
        )
        SELECT url, depth, round FROM (
            SELECT 'http://site' || (doc % 10) || '.example/d/' || doc AS url,
                   depth, depth AS round
            FROM f
            UNION ALL
            SELECT url, MIN(d) AS depth, MIN(d) AS round FROM misses GROUP BY url
        ) ORDER BY round, url
    """,
    "lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(avg(l_discount), 6)      AS avg_disc,
               count(*)                       AS cnt
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "filter_project": """
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
        FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
        ORDER BY l_orderkey, l_linenumber
    """,
    "sort_limit": """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "join_agg": """
        SELECT c.c_mktsegment,
               round(sum(o.o_totalprice), 2) AS revenue,
               count(*)                      AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    "events_agg": """
        SELECT event_type,
               count(*)                    AS n_events,
               round(sum(value), 2)        AS sum_value,
               round(min(value), 2)        AS min_value,
               round(max(value), 2)        AS max_value,
               count(DISTINCT user_id)     AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "extract_text": f"""
        WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents)
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(html, '<style[\\s\\S]*?</style>', ' ', 'g'),
                   '<script[\\s\\S]*?</script>', ' ', 'g'),
                 '<(.*?)>', ' ', 'g') AS text_out
        FROM h ORDER BY doc_id
    """,
    "extract_links": f"""
        WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents)
        SELECT doc_id, unnest(regexp_extract_all(html, '<a [^>]*href="([^"]*)"', 1)) AS href
        FROM h ORDER BY doc_id
    """,
    "canonicalize_urls": """
        SELECT doc_id,
               'http://site' || (doc_id % 10) || '.example/d/' || ((doc_id * 7) % 500)
                 || '?a=1&b=2'                           AS canonical_url,
               'site' || (doc_id % 10) || '.example'     AS host
        FROM documents ORDER BY doc_id
    """,
    "extract_entities": f"""
        WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents)
        SELECT doc_id,
               unnest(regexp_extract_all(html, '\\W(0x[0-9a-f]{{40}})', 1)) AS entity
        FROM h ORDER BY doc_id
    """,
    "host_histogram": """
        SELECT 'site' || (doc_id % 10) || '.example' AS host, count(*) AS n_links
        FROM documents GROUP BY 1 ORDER BY host
    """,
    "outflow_sum": f"""
        WITH e AS ({EDGES_SQL})
        SELECT src, round(sum(weight), 2) AS out_sum FROM e GROUP BY src ORDER BY src
    """,
    "node_degree": f"""
        WITH e AS ({EDGES_SQL}),
        und AS (
            SELECT src AS node, dst AS neighbor FROM e WHERE src <> dst
            UNION ALL
            SELECT dst AS node, src AS neighbor FROM e WHERE src <> dst
        )
        SELECT node, count(DISTINCT neighbor) AS degree FROM und GROUP BY node ORDER BY node
    """,
    "topk_frontier": f"""
        WITH e AS ({EDGES_SQL})
        SELECT dst, round(sum(weight), 2) AS score FROM e
        GROUP BY dst ORDER BY score DESC, dst LIMIT 10
    """,
    "bfs_reachable": f"""
        WITH RECURSIVE e AS ({EDGES_SQL}),
        r AS (
            SELECT 0 AS node, 0 AS depth
            UNION ALL
            SELECT e.dst, r.depth + 1 FROM r JOIN e ON e.src = r.node WHERE r.depth < 2
        )
        SELECT node, min(depth) AS depth FROM r GROUP BY node ORDER BY node
    """,
    "dedup_exact": """
        WITH doubled AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000 AS doc_id, text FROM documents
        )
        SELECT md5(text) AS dup_hash, min(doc_id) AS keep_id, count(*) AS n_dups
        FROM doubled GROUP BY md5(text) ORDER BY keep_id
    """,
    "token_count": """
        SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        FROM documents ORDER BY doc_id
    """,
    "quality_score": """
        WITH t AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               round(list_sum(list_transform(toks, w -> len(w))) * 1.0 / len(toks), 4)
                 AS mean_token_len,
               round(len(list_filter(toks, w -> w IN ('the','a','and','of','to'))) * 1.0
                     / len(toks), 4) AS stopword_ratio
        FROM t ORDER BY doc_id
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
        FROM documents ORDER BY doc_id
    """,
    # quantile q = value at 1-indexed sorted position ceil(q * N); 0.9/0.99
    # deliberately go through the same double multiply + ceil on both sides
    # (0.9 * 500 = 450.0000...6 -> rank 451 in BOTH engines)
    "token_quantiles": """
        WITH c AS (
            SELECT len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
            FROM documents
        ),
        n AS (SELECT count(*) AS total FROM c),
        r AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) AS rn FROM c),
        qs(q) AS (VALUES (0.25), (0.5), (0.75), (0.9), (0.99))
        SELECT qs.q, r.n_tokens
        FROM qs CROSS JOIN n
        JOIN r ON r.rn = CAST(ceil(qs.q * n.total) AS BIGINT)
        ORDER BY qs.q
    """,
    "hash_sample": """
        SELECT doc_id, lang FROM documents
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 10
        ORDER BY doc_id
    """,
    # Lucene-variant BM25; constants written as (1.2 + 1) etc. so the SQL
    # evaluates the SAME doubles as the Python (the literal 2.2 is a
    # different double than 1.2 + 1)
    "bm25_scores": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents
        ),
        stats AS (
            SELECT count(*) AS n, sum(len(toks)) * 1.0 / count(*) AS avg_len FROM toks
        ),
        terms(term) AS (VALUES ('join'), ('scan'), ('spark')),
        df AS (
            SELECT term,
                   sum(CASE WHEN list_contains(t.toks, term) THEN 1 ELSE 0 END) AS df
            FROM toks t CROSS JOIN terms GROUP BY term
        ),
        tf AS (
            SELECT t.doc_id, term,
                   len(list_filter(t.toks, w -> w = term)) AS tf,
                   len(t.toks) AS dl
            FROM toks t CROSS JOIN terms
        )
        SELECT tf.doc_id,
               round(sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1)
                         * tf.tf * (1.2 + 1)
                         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avg_len))),
                     4) AS bm25
        FROM tf JOIN df USING (term) CROSS JOIN stats s
        GROUP BY tf.doc_id ORDER BY tf.doc_id
    """,
    "jaccard_pairs": """
        WITH t AS (
            SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                     len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
        FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
        ORDER BY doc_a
    """,
    "ann_bruteforce": """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 3),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
            FROM q CROSS JOIN embeddings e
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, round(sim, 4) AS sim
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) <= 5
        ORDER BY query_id, sim DESC, neighbor_id
    """,
    # exact all-pairs cosine near-dup join (threshold compared on the
    # unrounded float64 sim; the closest pair to tau sits 1e-5 away at
    # every sf, far beyond cross-implementation float noise)
    "embedding_neardup_pairs": """
        WITH s AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, round(sim, 4) AS sim FROM s
        WHERE sim >= 0.4 ORDER BY vec_a, vec_b
    """,
    "embedding_norms": """
        SELECT label,
               round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                      x -> x * x)))), 4) AS mean_l2,
               count(*) AS n_vecs
        FROM embeddings GROUP BY label ORDER BY label
    """,
    "politeness_admission": """
        WITH f AS (
            SELECT doc_id,
                   'site' || (doc_id % 10) || '.example' AS host,
                   (doc_id * 37) % 997                   AS priority
            FROM documents
        )
        SELECT host, doc_id, priority FROM f
        QUALIFY row_number() OVER (PARTITION BY host
                                   ORDER BY priority DESC, doc_id) <= 5
        ORDER BY host, priority DESC, doc_id
    """,
    "events_window": """
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               event_type,
               count(*)             AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY day, event_type
    """,
    "asof_join": """
        SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    "asof_join_partitioned": """
        SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    "range_join": """
        SELECT o.o_orderkey, count(l.l_orderkey) AS n_in_range
        FROM orders o
        LEFT JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
    "range_join_partitioned": """
        SELECT o.o_orderkey, count(l.l_orderkey) AS n_in_range
        FROM orders o
        LEFT JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
    "hash_join": """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS o_totalprice,
               c.c_name, round(c.c_acctbal, 2) AS c_acctbal
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_orderkey
    """,
    "triangle_count": """
        WITH d AS (
            SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
            FROM events
        ),
        und AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM d WHERE src <> dst
        ),
        tri AS (
            SELECT a.u AS x, a.v AS y, b.v AS z
            FROM und a
            JOIN und b ON b.u = a.v
            JOIN und c ON c.u = a.u AND c.v = b.v
        ),
        pernode AS (
            SELECT unnest([x, y, z]) AS node FROM tri
        )
        SELECT node, count(*) AS triangles
        FROM pernode GROUP BY node ORDER BY node
    """,
    "bloom_semijoin": """
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        ORDER BY l_orderkey, l_linenumber
    """,
    "tpch_q3": """
        SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "transfer_normalize": """
        WITH raw AS (
            SELECT CASE WHEN user_id % 7 = 0 THEN NULL
                        ELSE '0xUSER' || user_id END          AS from_raw,
                   '0xPeer' || ((user_id * 13 + event_id) % 50) AS to_raw,
                   printf('%.2f', value)                       AS value_s,
                   'TX' || event_id                            AS hash
            FROM events
        ), norm AS (
            SELECT lower(coalesce(from_raw,
                     '0x0000000000000000000000000000000000000000')) AS from_addr,
                   lower(to_raw)                                    AS to_addr,
                   value_s, hash
            FROM raw
        )
        SELECT md5(concat_ws('_', from_addr, to_addr, value_s, hash)) AS id,
               from_addr, to_addr,
               CAST(value_s AS DOUBLE) AS value, hash
        FROM norm ORDER BY id
    """,
    "tron_block_parse": """
        WITH tx AS (
            SELECT 'tx' AS kind,
                   'TTX' || event_id || '_' || j.i AS transaction_hash,
                   j.i                              AS idx,
                   event_id                         AS block_number,
                   event_id % 5                     AS block_version,
                   1600000000 + event_id            AS timestamp,
                   ''                               AS address,
                   'BID' || event_id                AS block_hash
            FROM events, LATERAL (
                SELECT unnest(generate_series(0, event_id % 3)) AS i
            ) AS j
        ),
        lg AS (
            SELECT 'log' AS kind,
                   'TTX' || event_id || '_0' AS transaction_hash,
                   event_id % 7              AS idx,
                   event_id                  AS block_number,
                   -1                        AS block_version,
                   1600000000 + event_id     AS timestamp,
                   lower('0xTADDR' || (event_id % 9)) AS address,
                   ''                        AS block_hash
            FROM events
        )
        SELECT * FROM (SELECT * FROM tx UNION ALL SELECT * FROM lg)
        ORDER BY transaction_hash, kind, idx
    """,
    "sign_pages": """
        WITH s AS (
            SELECT 'fn_' || doc_id || '(uint256)' AS text_signature,
                   'Function' AS type FROM documents
            UNION ALL
            SELECT 'Ev_' || doc_id || '(address)' AS text_signature,
                   'Event' AS type FROM documents
        )
        SELECT text_signature,
               '0x' || substr(md5(text_signature), 1, 8) AS hex_signature,
               type
        FROM s ORDER BY type, text_signature
    """,
    "labelcloud_parse": """
        WITH ks AS (SELECT DISTINCT doc_id % 20 AS k FROM documents),
        kept AS (
            SELECT k,
                   CASE k % 4 WHEN 0 THEN 'exchange' WHEN 1 THEN 'phish-hack'
                              WHEN 2 THEN 'gambling' ELSE 'defi' END AS category,
                   10 + (k * 37) % 190 AS size
            FROM ks WHERE k % 5 != 4
        ),
        tabs AS (
            SELECT k, category, 1 AS subcatid, size AS total FROM kept
            UNION ALL
            SELECT k, category, 2 AS subcatid, size // 2 AS total FROM kept
        )
        SELECT 'label' || k AS label, category, subcatid,
               unnest(generate_series(0, CAST((total - 1) // 100 AS BIGINT))) * 100 AS start
        FROM tabs
        ORDER BY label, subcatid, start
    """,
    "receipt_join": """
        WITH tx AS (
            SELECT 'TX' || event_id                      AS transaction_hash,
                   event_id % 97                          AS block_number,
                   CAST(floor(epoch(ts)) AS BIGINT)       AS timestamp
            FROM events
        ), rc AS (
            SELECT 'TX' || event_id                      AS transaction_hash,
                   event_id % 200                         AS transaction_index,
                   event_id % 3                           AS transaction_type,
                   21000 + event_id % 1000                AS gas_used,
                   1000000000 + event_id                  AS effective_gas_price,
                   (event_id % 11 = 0)                    AS is_error,
                   CASE WHEN event_id % 13 = 0
                        THEN '0xcon' || event_id ELSE '' END AS created_contract
            FROM events WHERE event_id % 5 != 4
        )
        SELECT rc.transaction_hash, tx.block_number, tx.timestamp,
               rc.transaction_index, rc.transaction_type, rc.gas_used,
               rc.effective_gas_price, rc.is_error, rc.created_contract
        FROM rc JOIN tx USING (transaction_hash)
        ORDER BY rc.transaction_hash
    """,
    "token_decode": """
        WITH a AS (
            SELECT event_id, user_id,
                   md5(CAST(user_id AS VARCHAR))                        AS h_from,
                   md5(CAST((user_id * 13 + event_id) % 50 AS VARCHAR)) AS h_to
            FROM events WHERE event_id % 3 < 2
        )
        SELECT 'TX' || event_id AS hash,
               event_id         AS log_index,
               CASE WHEN event_id % 3 = 0 THEN 'transfer' ELSE 'approval' END AS action,
               '0x' || h_from || substr(h_from, 1, 8) AS from_addr,
               '0x' || h_to   || substr(h_to, 1, 8)   AS to_addr,
               event_id * 3 + 5 AS value
        FROM a ORDER BY log_index
    """,
    "trace_flatten": """
        WITH t AS (
            SELECT 'T' || o_orderkey AS transaction_hash, '0_0' AS trace_id,
                   'CALL' AS trace_type, '0xfrom' || o_orderkey AS from_addr,
                   '0xto' || o_orderkey AS to_addr, o_orderkey * 2 AS value,
                   0 AS depth
            FROM orders
            UNION ALL
            SELECT 'T' || o_orderkey, '1_1', 'STATICCALL', '0xto' || o_orderkey,
                   '0xc1' || o_orderkey, o_orderkey * 3, 1 FROM orders
            UNION ALL
            SELECT 'T' || o_orderkey, '2_2', 'DELEGATECALL', '0xc1' || o_orderkey,
                   '0xg' || o_orderkey, o_orderkey * 5, 2 FROM orders
            UNION ALL
            SELECT 'T' || o_orderkey, '1_3', 'CALL', '0xto' || o_orderkey,
                   '0xc2' || o_orderkey, o_orderkey * 7, 1 FROM orders
        )
        SELECT * FROM t ORDER BY transaction_hash, trace_id
    """,
    "parse_props": """
        SELECT event_type,
               round(avg(CAST(json_extract(props, '$.k') AS INT)), 4) AS mean_k,
               count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "binary_meta": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text)                  AS digest,
               CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
        FROM documents ORDER BY doc_id
    """,
    "salted_host_agg": """
        WITH h AS (
            SELECT CASE WHEN doc_id % 3 = 0 THEN 'host0.example'
                        ELSE 'host' || (doc_id % 7 + 1) || '.example' END AS host
            FROM documents
        )
        SELECT host, count(*) AS n_pages FROM h GROUP BY host ORDER BY host
    """,
    "enrich_3way": """
        SELECT r.r_name AS region,
               round(sum(l.l_extendedprice), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY region
    """,
    "keywords_freq": """
        WITH t AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents
        ),
        u AS (SELECT doc_id, unnest(toks) AS w FROM t),
        f AS (
            SELECT doc_id, w, count(*) AS c FROM u WHERE len(w) >= 4
            GROUP BY doc_id, w
        ),
        k AS (
            SELECT doc_id, w AS top_keyword FROM f
            QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, w) = 1
        )
        SELECT t.doc_id,
               array_to_string(t.toks[1:20], ' ') AS summary,
               k.top_keyword
        FROM t LEFT JOIN k USING (doc_id) ORDER BY t.doc_id
    """,
    "xml_labels": """
        WITH p AS (
            SELECT doc_id, 'P' || (doc_id % 4) AS program FROM documents
            UNION ALL
            SELECT doc_id, 'Q' || (doc_id % 3) AS program FROM documents
        )
        SELECT doc_id AS uid,
               'F' || doc_id || ' ' || 'L' || doc_id AS name,
               program
        FROM p ORDER BY uid, program
    """,
    "sessionize": """
        WITH o AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts,
                   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                            ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS session_id
            FROM o
        )
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "robots_filter": """
        SELECT doc_id,
               'http://site' || (doc_id % 10) || '.example/d/' || doc_id AS url
        FROM documents
        WHERE NOT starts_with(CAST(doc_id AS VARCHAR),
                              CAST(doc_id % 10 AS VARCHAR))
        ORDER BY doc_id
    """,
    "wedge_count": """
        WITH e AS (
            SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
            FROM events
        ),
        und AS (
            SELECT src AS node, dst AS neighbor FROM e WHERE src <> dst
            UNION ALL
            SELECT dst AS node, src AS neighbor FROM e WHERE src <> dst
        ),
        deg AS (
            SELECT node, count(DISTINCT neighbor) AS d FROM und GROUP BY node
        )
        SELECT node, d * (d - 1) // 2 AS wedges FROM deg ORDER BY node
    """,
    "block_parse": """
        SELECT o_orderkey // 10                            AS block_number,
               '0xtx' || o_orderkey                        AS tx_hash,
               o_orderkey % 10                             AS tx_index,
               lower('0xa' || o_custkey)                   AS from_addr,
               lower('0xb' || ((o_custkey * 7) % 1500))    AS to_addr,
               CAST(floor(o_totalprice * 100) AS BIGINT)   AS value
        FROM orders ORDER BY block_number, tx_index
    """,
    "utxo_edges": """
        WITH u AS (
            SELECT 'utx' || event_id AS tx, 'addr' || user_id AS addr,
                   'in' AS direction, round(value, 2) AS value FROM events
            UNION ALL
            SELECT 'utx' || event_id, 'addr' || ((user_id * 13 + event_id) % 50),
                   'out', round(value * 0.6, 2) FROM events
            UNION ALL
            SELECT 'utx' || event_id, 'addr' || user_id,
                   'out', round(value * 0.4, 2) FROM events
        )
        SELECT * FROM u ORDER BY tx, direction, addr, value
    """,
    "embedding_knn": """
        WITH q AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < 100
        ),
        scored AS (
            SELECT q.vec_id AS vec_id, e.vec_id AS nn_id,
                   list_cosine_similarity(q.v, CAST(e.embedding AS DOUBLE[])) AS sim
            FROM q CROSS JOIN embeddings e
            WHERE e.vec_id <> q.vec_id
        )
        SELECT vec_id, nn_id, round(sim, 4) AS sim FROM scored
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) = 1
        ORDER BY vec_id
    """,
    # 64-bit SimHash, full-value mirror: md5_number_lower token hashes
    # (== stages/dedup._hash_strings64 bit-for-bit), per-bit +1/-1 vote over
    # token multiset, fingerprint rendered as the same 16-hex string
    "simhash": r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
        th AS (SELECT doc_id, md5_number_lower(unnest(w)) AS h FROM toks),
        bits AS (SELECT unnest(generate_series(0, 63)) AS bit),
        acc AS (
            SELECT th.doc_id, bits.bit,
                   SUM(CASE WHEN (th.h >> bits.bit) & 1::UBIGINT = 1::UBIGINT
                       THEN 1 ELSE -1 END) AS s
            FROM th CROSS JOIN bits GROUP BY th.doc_id, bits.bit
        ),
        fp AS (
            SELECT doc_id,
                   SUM(CASE WHEN s > 0 THEN (CAST(1 AS HUGEINT) << bit) ELSE 0 END) AS v
            FROM acc GROUP BY doc_id
        )
        SELECT doc_id, lpad(lower(to_hex(CAST(v AS UBIGINT))), 16, '0') AS simhash
        FROM fp ORDER BY doc_id
    """,
}


ORACLE_SQL["minhash_signatures"] = (
    f"WITH {_minhash_sig_cte()}\n"
    "        SELECT doc_id, perm_id, minhash FROM sig ORDER BY doc_id, perm_id"
)


# LSH candidate pairs over the doubled corpus (q_minhash_dedup_pairs clones
# every doc at doc_id+10000): band bucket = md5_number_lower of the band's
# pipe-joined decimal minhash values (== dedup.MinHashBands `_stable_h64`
# of "|".join(str(x))), pair = two docs sharing any (band, bucket).  The
# clone has identical text, hence identical signature — mirrored by reusing
# each doc's band rows at doc_id+10000 rather than recomputing.  The
# segment cap (LSH_BUCKET_CAP=512) never triggers at oracle scale: buckets
# hold a doc and its clone, so the emitted pair set is the exact closure.
ORACLE_SQL["minhash_dedup_pairs"] = (
    f"WITH {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        ),
        doubled AS (
            SELECT doc_id, band_id, bucket FROM band
            UNION ALL
            SELECT doc_id + 10000 AS doc_id, band_id, bucket FROM band
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM doubled a JOIN doubled b
          ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ORDER BY doc_a, doc_b"""
)


# fuzzy decontamination: survivors = non-eval docs sharing NO band bucket
# with an eval (doc_id % 17 == 0) doc — same band CTE, anti-join form
ORACLE_SQL["decontaminate_fuzzy"] = (
    f"WITH {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        ),
        contaminated AS (
            SELECT DISTINCT t.doc_id
            FROM band t JOIN band e
              ON t.band_id = e.band_id AND t.bucket = e.bucket
             AND e.doc_id % 17 = 0 AND t.doc_id % 17 <> 0
        )
        SELECT doc_id FROM documents
        WHERE doc_id % 17 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        ORDER BY doc_id"""
)


# incremental variant: odd (new) docs probed against even (base) docs only —
# identical band construction, cross-half join instead of the doubled self-join
ORACLE_SQL["minhash_incremental"] = (
    f"WITH {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        )
        SELECT DISTINCT n.doc_id AS doc_new, b.doc_id AS doc_base
        FROM band n JOIN band b
          ON n.band_id = b.band_id AND n.bucket = b.bucket
         AND n.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        ORDER BY doc_new, doc_base"""
)


# connected components over the same LSH pair set: transitive closure via
# recursive CTE (UNION-distinct terminates it), cluster = min reachable
# node.  Closure volume is sum(|component|^2) — bounded at oracle scale
# because LSH components are doc+clone pairs plus small injected dup
# groups; the Ray side uses iterative label propagation instead.
ORACLE_SQL["dedup_clusters"] = (
    f"WITH RECURSIVE {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        ),
        doubled AS (
            SELECT doc_id, band_id, bucket FROM band
            UNION ALL
            SELECT doc_id + 10000 AS doc_id, band_id, bucket FROM band
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM doubled a JOIN doubled b
              ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        reach(node, r) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
        )
        SELECT node AS doc_id, min(r) AS cluster_id
        FROM reach GROUP BY node ORDER BY doc_id"""
)


# dedup_survivors: the same transitive closure, then keep representatives
# (cluster_id == doc_id) and never-paired docs; represents = cluster size.
ORACLE_SQL["dedup_survivors"] = (
    f"WITH RECURSIVE {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        ),
        doubled AS (
            SELECT doc_id, band_id, bucket FROM band
            UNION ALL
            SELECT doc_id + 10000 AS doc_id, band_id, bucket FROM band
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM doubled a JOIN doubled b
              ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        reach(node, r) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
        ),
        cl AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
        sz AS (SELECT cluster_id, count(*) AS n FROM cl GROUP BY cluster_id),
        universe AS (
            SELECT doc_id FROM documents
            UNION ALL
            SELECT doc_id + 10000 AS doc_id FROM documents
        )
        SELECT u.doc_id, CAST(coalesce(sz.n, 1) AS BIGINT) AS represents
        FROM universe u
        LEFT JOIN cl ON cl.doc_id = u.doc_id
        LEFT JOIN sz ON sz.cluster_id = u.doc_id
        WHERE cl.cluster_id IS NULL OR cl.cluster_id = u.doc_id
        ORDER BY u.doc_id"""
)


# SimHash banded Hamming pairs over the doubled corpus: fingerprints via
# the same full-value chain as ORACLE_SQL['simhash'], 4 x 16-bit bands,
# candidate = shared (band_id, band_val), verified bit_count(xor) <= 3
ORACLE_SQL["simhash_pairs"] = r"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
    th AS (SELECT doc_id, md5_number_lower(unnest(w)) AS h FROM toks),
    bits AS (SELECT unnest(generate_series(0, 63)) AS bit),
    acc AS (
        SELECT th.doc_id, bits.bit,
               SUM(CASE WHEN (th.h >> bits.bit) & 1::UBIGINT = 1::UBIGINT
                   THEN 1 ELSE -1 END) AS s
        FROM th CROSS JOIN bits GROUP BY th.doc_id, bits.bit
    ),
    fp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS HUGEINT) << bit) ELSE 0 END)
                    AS UBIGINT) AS v
        FROM acc GROUP BY doc_id
    ),
    doubled AS (
        SELECT doc_id, v FROM fp
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, v FROM fp
    ),
    bands AS (
        SELECT doc_id, v, b.band_id,
               (v >> CAST(16 * b.band_id AS UBIGINT)) & 65535::UBIGINT AS band_val
        FROM doubled CROSS JOIN
             (SELECT unnest(generate_series(0, 3)) AS band_id) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, a.v AS va, c.doc_id AS doc_b, c.v AS vb
        FROM bands a JOIN bands c
          ON a.band_id = c.band_id AND a.band_val = c.band_val
         AND a.doc_id < c.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(va, vb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(va, vb)) <= 3
    ORDER BY doc_a, doc_b
"""


ORACLE_SQL["pagerank"] = _pagerank_oracle_sql()


ORACLE_SQL["langid"] = (
    f"WITH stop(lang, word) AS (VALUES {_langid_stopword_values()}"
    + r"""),
        tok AS (
            SELECT DISTINCT doc_id, w FROM (
                SELECT doc_id, lower(unnest(regexp_extract_all(text, '\S+'))) AS w
                FROM documents
            )
        ),
        hits AS (
            SELECT t.doc_id, s.lang, count(*) AS n
            FROM tok t JOIN stop s ON t.w = s.word
            GROUP BY t.doc_id, s.lang
        ),
        best AS (
            SELECT doc_id, lang FROM hits WHERE n > 0
            QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang) = 1
        )
        SELECT d.doc_id,
               CASE
                   WHEN coalesce(length(d.text), 0) > 0
                        AND len(regexp_extract_all(d.text, '[一-鿿]'))::DOUBLE
                            / greatest(1, length(d.text)) > 0.05 THEN 'zh'
                   ELSE coalesce(b.lang, '')
               END AS lang_pred
        FROM documents d LEFT JOIN best b USING (doc_id)
        ORDER BY d.doc_id"""
)


ORACLE_SQL["rolling_fingerprints"] = _rolling_fp_oracle_sql()


# With nprobe == n_clusters the IVF probe pass covers every bucket, so the
# bucketed index must reproduce exact brute-force top-5 — same SQL mirror.
ORACLE_SQL["ann_ivf_exact"] = ORACLE_SQL["ann_bruteforce"]


# Same RE2 engine on both sides (pyarrow kernels / DuckDB regexp_*), same
# pattern order, counts taken BEFORE each replacement pass.
ORACLE_SQL["pii_redact"] = r"""
    WITH base AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@mail.example ip 10.0.'
                    || (doc_id % 256) || '.' || ((doc_id // 256) % 256)
                    || ' tel 555-' || printf('%03d', doc_id % 1000) || '-0199' AS s
        FROM documents
    ),
    s1 AS (
        SELECT doc_id,
               len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
               regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s
        FROM base
    ),
    s2 AS (
        SELECT doc_id, c1,
               len(regexp_extract_all(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS c2,
               regexp_replace(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS s
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, c1, c2,
               len(regexp_extract_all(s, '\b\d{3}-\d{3}-\d{4}\b')) AS c3,
               regexp_replace(s, '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS s
        FROM s2
    )
    SELECT doc_id, s AS clean, CAST(c1 + c2 + c3 AS BIGINT) AS n_pii
    FROM s3 ORDER BY doc_id
"""


# keep-rule thresholds compare the RAW doubles (same division on both
# sides); only output columns are rounded.
ORACLE_SQL["gopher_quality"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS w FROM toks),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM gc GROUP BY doc_id),
    j AS (
        SELECT ws.doc_id, ws.n, ws.mwl, ws.uq, coalesce(tp.topf, 0.0) AS topf
        FROM ws LEFT JOIN tp USING (doc_id)
    )
    SELECT doc_id, n AS n_words,
           round(mwl, 6) AS mean_word_len,
           round(uq, 6) AS uniq_frac,
           round(topf, 6) AS top_bigram_frac,
           CAST(CASE WHEN n BETWEEN 30 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
                      AND uq >= 0.45 AND topf <= 0.10 THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM j ORDER BY doc_id
"""


ORACLE_SQL["decontaminate"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 2),
                                     i -> list_aggregate(t[i:i+3], 'string_agg', ' '))) AS g
        FROM toks
    ),
    test AS (
        SELECT DISTINCT g FROM grams
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 97 = 0
    ),
    train AS (
        SELECT doc_id FROM documents
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 97 <> 0
    ),
    hits AS (
        SELECT gr.doc_id, count(*) AS n_hits
        FROM grams gr JOIN test USING (g)
        WHERE md5_number_lower(CAST(gr.doc_id AS VARCHAR)) % 97 <> 0
        GROUP BY gr.doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS contaminated
    FROM train t LEFT JOIN hits h USING (doc_id) ORDER BY doc_id
"""


ORACLE_SQL["pack_sequences"] = r"""
    WITH c AS (
        SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST((sum(n_tokens) OVER (ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens) // 256 AS BIGINT) AS seq_id
    FROM c ORDER BY doc_id
"""


# Replays the composite's four stages IN ORDER: quality gate -> held-out
# removal + 4-gram decontamination -> lede dedup among remaining
# candidates (row_number==1 <=> min doc_id) -> prefix-sum packing over
# survivors.
ORACLE_SQL["curation_pipeline"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 2),
                                     i -> list_aggregate(t[i:i+3], 'string_agg', ' '))) AS g
        FROM toks
    ),
    test AS (
        SELECT DISTINCT g FROM grams
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 97 = 0
    ),
    contam AS (
        SELECT DISTINCT gr.doc_id FROM grams gr JOIN test USING (g)
        WHERE md5_number_lower(CAST(gr.doc_id AS VARCHAR)) % 97 <> 0
    ),
    w AS (SELECT doc_id, unnest(t) AS w FROM toks),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
    ),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM bgc GROUP BY doc_id),
    q AS (
        SELECT ws.doc_id, ws.n FROM ws LEFT JOIN tp USING (doc_id)
        WHERE ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
          AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
    ),
    fp AS (SELECT doc_id, list_aggregate(t[1:4], 'string_agg', ' ') AS f FROM toks),
    cand AS (
        SELECT q.doc_id, q.n, fp.f FROM q JOIN fp USING (doc_id)
        WHERE md5_number_lower(CAST(q.doc_id AS VARCHAR)) % 97 <> 0
          AND q.doc_id NOT IN (SELECT doc_id FROM contam)
    ),
    surv AS (
        SELECT doc_id, n FROM (
            SELECT doc_id, n, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
            FROM cand
        ) s WHERE rn = 1
    )
    SELECT doc_id, n AS n_tokens,
           CAST((sum(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n) // 256 AS BIGINT) AS seq_id
    FROM surv ORDER BY doc_id
"""


ORACLE_SQL["self_repetition"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> list_aggregate(t[i:i+2], 'string_agg', ' '))) AS g
        FROM toks
    )
    SELECT doc_id, count(*) AS n_grams,
           round(1.0 - count(DISTINCT g) * 1.0 / count(*), 6) AS rep_frac
    FROM grams GROUP BY doc_id ORDER BY doc_id
"""


ORACLE_SQL["split_assign"] = r"""
    SELECT lang,
           CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 80 THEN 'train'
                WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n
    FROM documents GROUP BY lang, split ORDER BY lang, split
"""


ORACLE_SQL["vocab_topk"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks)
    SELECT token, count(*) AS cnt
    FROM w GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 50
"""


# tfidf = (tf / doc_len) * ln(N / df), same operation order as the Ray
# side; ranks are row_number() with (tfidf DESC, term) — the Python sort
# key (-tfidf, term) produces the identical permutation.
ORACLE_SQL["bigram_topk"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    pairs AS (
        SELECT t[i] || ' ' || t[i + 1] AS bigram
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    )
    SELECT bigram, count(*) AS cnt
    FROM pairs GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 50
"""


ORACLE_SQL["snapshot_delta"] = r"""
    WITH b AS (
        SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
    ),
    f AS (
        SELECT user_id,
               max(CASE WHEN epoch_us(ts) < mn + (mx - mn) // 2 THEN 1 ELSE 0 END) AS early,
               max(CASE WHEN epoch_us(ts) >= mn + (mx - mn) // 2 THEN 1 ELSE 0 END) AS late
        FROM events, b GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN early = 1 AND late = 1 THEN 'retained'
                WHEN late = 1 THEN 'added'
                ELSE 'removed' END AS status
    FROM f ORDER BY user_id
"""


ORACLE_SQL["tfidf_topterms"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS term FROM toks),
    tf AS (SELECT doc_id, term, count(*) AS c FROM w GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY term),
    nd AS (SELECT count(*) AS nd FROM documents),
    s AS (
        SELECT tf.doc_id, tf.term,
               (tf.c * 1.0 / dl.n) * ln(nd.nd * 1.0 / df.df) AS tfidf
        FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN nd
    ),
    r AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        FROM s
    )
    SELECT doc_id, term, round(tfidf, 6) AS tfidf, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3 ORDER BY doc_id, rank
"""


ORACLE_SQL["shuffle_rank"] = r"""
    SELECT doc_id,
           CAST(row_number() OVER (
                ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || ':shuffle'),
                         doc_id) - 1 AS BIGINT) AS pos
    FROM documents ORDER BY doc_id
"""


ORACLE_SQL["unigram_logprob"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS token FROM toks),
    cnt AS (SELECT token, count(*) AS c FROM w GROUP BY token),
    tot AS (SELECT count(*) AS s FROM w)
    SELECT w.doc_id,
           round(sum(ln(cnt.c * 1.0 / tot.s)) / count(*), 6) AS logprob
    FROM w JOIN cnt USING (token) CROSS JOIN tot
    GROUP BY w.doc_id ORDER BY w.doc_id
"""


ORACLE_SQL["dup_span_fraction"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 3),
                                     i -> list_aggregate(t[i:i+4], 'string_agg', ' '))) AS g
        FROM toks
    ),
    pg AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
    dg AS (SELECT g FROM pg GROUP BY g HAVING count(*) >= 2),
    tot AS (SELECT doc_id, sum(c) AS tot FROM pg GROUP BY doc_id),
    dup AS (
        SELECT pg.doc_id, sum(pg.c) AS dup
        FROM pg JOIN dg USING (g) GROUP BY pg.doc_id
    )
    SELECT t.doc_id,
           CAST(t.tot AS BIGINT) AS n_grams,
           CAST(coalesce(d.dup, 0) AS BIGINT) AS n_dup,
           round(coalesce(d.dup, 0) * 1.0 / t.tot, 6) AS dup_frac
    FROM tot t LEFT JOIN dup d USING (doc_id) ORDER BY doc_id
"""


ORACLE_SQL["dsir_weights"] = f"""
    WITH {_DSIR_W_CTE}
    SELECT doc_id, dsir_weight FROM wts ORDER BY doc_id
"""


# Efraimidis-Spirakis A-Res sampling keys over exp(dsir_weight):
# u from md5(doc_id || ':es') scaled to (0,1) by 2^53 — identical doubles
# on both sides; weight rounded to 6dp before exp, key before ranking.
ORACLE_SQL["dsir_resample"] = f"""
    WITH {_DSIR_W_CTE},
    keys AS (
        SELECT doc_id,
               round(ln((md5_number_lower(CAST(doc_id AS VARCHAR) || ':es')
                         % 9007199254740992) / 9007199254740992.0)
                     / exp(dsir_weight), 6) AS es_key
        FROM wts
    ),
    r AS (
        SELECT doc_id, es_key,
               CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT) AS rank
        FROM keys
    )
    SELECT doc_id, es_key, rank FROM r WHERE rank <= 100 ORDER BY rank
"""


# pretrain_mix: held-out removal -> Gopher gate -> 4-gram decontamination
# -> DSIR weight > 0 -> sequence packing, replayed stage for stage.
ORACLE_SQL["pretrain_mix"] = r"""
    WITH toks AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 2),
                                     i -> list_aggregate(t[i:i+3], 'string_agg', ' '))) AS g
        FROM toks
    ),
    test AS (
        SELECT DISTINCT g FROM grams
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 97 = 0
    ),
    contam AS (
        SELECT DISTINCT gr.doc_id FROM grams gr JOIN test USING (g)
        WHERE md5_number_lower(CAST(gr.doc_id AS VARCHAR)) % 97 <> 0
    ),
    w AS (SELECT doc_id, lang, unnest(t) AS w FROM toks),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
    ),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM bgc GROUP BY doc_id),
    q AS (
        SELECT ws.doc_id, ws.n FROM ws LEFT JOIN tp USING (doc_id)
        WHERE ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
          AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
    ),
    bkt AS (SELECT doc_id, lang,
                   CAST(md5_number_lower(w) % 64 AS INT) AS bucket FROM w),
    raw AS (SELECT bucket, count(*) AS c FROM bkt GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS c FROM bkt WHERE lang = 'en' GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM bkt) AS rtot,
                   (SELECT count(*) FROM bkt WHERE lang = 'en') AS ttot),
    lr AS (
        SELECT raw.bucket,
               ln((coalesce(tgt.c, 0) + 1.0) / (tot.ttot + 64)) -
               ln((raw.c + 1.0) / (tot.rtot + 64)) AS lnr
        FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
    ),
    wts AS (
        SELECT bkt.doc_id, round(sum(lr.lnr) / count(*), 6) AS dw
        FROM bkt JOIN lr USING (bucket) GROUP BY bkt.doc_id
    ),
    cand AS (
        SELECT q.doc_id, q.n FROM q JOIN wts USING (doc_id)
        WHERE md5_number_lower(CAST(q.doc_id AS VARCHAR)) % 97 <> 0
          AND q.doc_id NOT IN (SELECT doc_id FROM contam)
          AND wts.dw > 0
    )
    SELECT doc_id, n AS n_tokens,
           CAST((sum(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n) // 256 AS BIGINT) AS seq_id
    FROM cand ORDER BY doc_id
"""


# anchor_agg: the fixture's one link per doc carries anchor 'next <id>';
# the canonical target equals the canonicalize_urls synthesis string.
ORACLE_SQL["anchor_agg"] = f"""
    WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents),
    a AS (
        SELECT 'site' || (doc_id % 10) || '.example' AS host,
               'http://site' || (doc_id % 10) || '.example/d/'
                 || ((doc_id * 7) % 500) || '?a=1&b=2' AS target,
               regexp_extract(html, '<a [^>]*href="[^"]*"[^>]*>([^<]*)</a>', 1) AS anchor
        FROM h
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_anchors,
           CAST(count(DISTINCT target) AS BIGINT) AS n_targets,
           array_to_string((list_sort(list(anchor)))[1:32], '|') AS anchors_sample
    FROM a GROUP BY host ORDER BY host
"""


# audio_decode: the FAKEAUD header fields are exact functions of doc_id;
# duration computed as n * 1.0 / rate on both sides (identical doubles).
ORACLE_SQL["audio_decode"] = r"""
    SELECT doc_id,
           CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
           CAST(500 + doc_id % 100 AS BIGINT) AS n_samples,
           (500 + doc_id % 100) * 1.0 / (8000 + (doc_id % 3) * 4000) AS duration_s
    FROM documents ORDER BY doc_id
"""


# browser_render: DOC_HTML_SQL is ascii, so length() == the stage's char
# budget; the WHERE mirrors the body-wait timeout drop (IgnoreRequest).
ORACLE_SQL["browser_render"] = f"""
    WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents)
    SELECT doc_id,
           html || '<!-- rendered -->' AS page_source,
           CAST(200 AS INTEGER) AS status
    FROM h WHERE length(html) <= 600 ORDER BY doc_id
"""


ORACLE_SQL["sitemap_parse"] = """
    WITH j AS (
        SELECT doc_id, CAST(unnest(range(0, doc_id % 3 + 1)) AS BIGINT) AS j
        FROM documents
    )
    SELECT doc_id,
           'https://host' || (doc_id % 50) || '.example/sitemap/' || doc_id
               || '/' || j AS loc,
           '2024-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '-01'
               AS lastmod,
           CAST('0.' || (j + 1) AS DOUBLE) AS priority
    FROM j ORDER BY doc_id, loc
"""


ORACLE_SQL["dedup_spans_remove"] = r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    pos AS (
        SELECT doc_id, t,
               CAST(unnest(range(1, greatest(len(t) - 3, 1))) AS INT) AS i
        FROM toks
    ),
    grams AS (
        SELECT doc_id, i,
               list_aggregate(t[i:i+4], 'string_agg', ' ') AS g
        FROM pos
    ),
    dg AS (
        SELECT g FROM (SELECT g, doc_id FROM grams GROUP BY g, doc_id)
        GROUP BY g HAVING count(*) >= 2
    ),
    occ AS (SELECT DISTINCT doc_id, i FROM grams JOIN dg USING (g)),
    allpos0 AS (
        SELECT doc_id, t,
               CAST(unnest(range(1, len(t) + 1)) AS INT) AS p
        FROM toks
    ),
    allpos AS (SELECT doc_id, t[p] AS token, p FROM allpos0),
    cov AS (
        SELECT DISTINCT a.doc_id, a.p
        FROM allpos a JOIN occ o
          ON a.doc_id = o.doc_id AND a.p >= o.i AND a.p <= o.i + 4
    ),
    agg AS (
        SELECT a.doc_id,
               count(*) AS n_tokens,
               count(c.p) AS n_removed,
               coalesce(string_agg(a.token, ' ' ORDER BY a.p)
                            FILTER (WHERE c.p IS NULL), '') AS text_clean
        FROM allpos a LEFT JOIN cov c ON a.doc_id = c.doc_id AND a.p = c.p
        GROUP BY a.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(agg.n_removed, 0) AS BIGINT) AS n_removed,
           coalesce(agg.text_clean, '') AS text_clean
    FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id
"""


ORACLE_SQL["redirect_resolve"] = """
    SELECT doc_id AS url_id,
           doc_id - doc_id % 7 AS terminal,
           doc_id % 7 AS hops
    FROM documents ORDER BY url_id
"""


ORACLE_SQL["recrawl_schedule"] = """
    WITH h AS (SELECT max(epoch_us(ts)) AS horizon FROM events),
    a AS (
        SELECT user_id AS page_id,
               CAST(count(*) AS BIGINT) AS n_captures,
               min(epoch_us(ts)) AS first_us,
               max(epoch_us(ts)) AS last_us
        FROM events GROUP BY user_id
    )
    SELECT page_id, n_captures, last_us,
           CASE WHEN n_captures > 1 AND last_us > first_us
                THEN round((last_us - first_us) * 1.0
                           / (n_captures - 1) / 1e6, 6)
                ELSE NULL END AS interval_s,
           CASE WHEN n_captures > 1 AND last_us > first_us
                THEN round((h.horizon - last_us) / 1e6
                           / ((last_us - first_us) * 1.0
                              / (n_captures - 1) / 1e6), 6)
                ELSE NULL END AS staleness
    FROM a CROSS JOIN h ORDER BY page_id
"""


ORACLE_SQL["postings_build"] = r"""
    WITH w AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents
    ),
    pg AS (
        SELECT term, doc_id, count(*) AS tf
        FROM w WHERE term <> '' GROUP BY term, doc_id
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS tf_total,
           array_to_string((list_sort(list(doc_id)))[1:16], '|')
               AS postings_sample
    FROM pg GROUP BY term ORDER BY term
"""


ORACLE_SQL["hits"] = _hits_oracle_sql()


ORACLE_SQL["kcore"] = _kcore_oracle_sql()


ORACLE_SQL["warc_parse"] = f"""
    SELECT 'http://site' || (doc_id % 10) || '.example/d/' || doc_id AS url,
           strftime(TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id),
                    '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
           CAST(200 AS BIGINT) AS status,
           CAST(strlen({DOC_HTML_SQL}) AS BIGINT) AS content_length,
           'Doc ' || doc_id AS title
    FROM documents ORDER BY url
"""


ORACLE_SQL["warc_roundtrip"] = ORACLE_SQL["warc_parse"]


ORACLE_SQL["bpe_pair_counts"] = """
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wf AS (SELECT w, count(*) AS f FROM words WHERE w <> '' GROUP BY w),
    pairs AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair, f
        FROM (SELECT w, f, unnest(range(1, strlen(w))) AS i FROM wf)
    )
    SELECT pair, CAST(sum(f) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 50
"""


ORACLE_SQL["ann_lsh"] = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
        SELECT vec_id, v,
               (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END)
             + (CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END)
             + (CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END)
             + (CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END) AS bucket
        FROM e
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 3),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.qv, c.v) AS sim
        FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) <= 5
    ORDER BY query_id, sim DESC, neighbor_id
"""


SQL_QUERIES = {
    "lineitem_agg": q_lineitem_agg,
    "filter_project": q_filter_project,
    "sort_limit": q_sort_limit,
    "join_agg": q_join_agg,
    "events_agg": q_events_agg,
    "extract_text": q_extract_text,
    "extract_links": q_extract_links,
    "canonicalize_urls": q_canonicalize_urls,
    "extract_entities": q_extract_entities,
    "host_histogram": q_host_histogram,
    "outflow_sum": q_outflow_sum,
    "node_degree": q_node_degree,
    "topk_frontier": q_topk_frontier,
    "bfs_reachable": q_bfs_reachable,
    "crawl_bfs_depths": q_crawl_bfs_depths,
    "crawl_bfs_dataset": q_crawl_bfs_dataset,
    "minhash_signatures": q_minhash_signatures,
    "minhash_dedup_pairs": q_minhash_dedup_pairs,
    "simhash": q_simhash,
    "langid": q_langid,
    "rolling_fingerprints": q_rolling_fingerprints,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "doc_fingerprint": q_doc_fingerprint,
    "jaccard_pairs": q_jaccard_pairs,
    "ann_bruteforce": q_ann_bruteforce,
    "embedding_neardup_pairs": q_embedding_neardup_pairs,
    "embedding_norms": q_embedding_norms,
    "politeness_admission": q_politeness_admission,
    "events_window": q_events_window,
    "asof_join": q_asof_join,
    "asof_join_partitioned": q_asof_join_partitioned,
    "range_join": q_range_join,
    "range_join_partitioned": q_range_join_partitioned,
    "hash_join": q_hash_join,
    "tpch_q3": q_tpch_q3,
    "bigram_topk": q_bigram_topk,
    "snapshot_delta": q_snapshot_delta,
    "minhash_incremental": q_minhash_incremental,
    "bloom_semijoin": q_bloom_semijoin,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
    "triangle_count": q_triangle_count,
    "transfer_normalize": q_transfer_normalize,
    "labelcloud_parse": q_labelcloud_parse,
    "sign_pages": q_sign_pages,
    "tron_block_parse": q_tron_block_parse,
    "receipt_join": q_receipt_join,
    "token_decode": q_token_decode,
    "trace_flatten": q_trace_flatten,
    "parse_props": q_parse_props,
    "binary_meta": q_binary_meta,
    "embedding_knn": q_embedding_knn,
    "salted_host_agg": q_salted_host_agg,
    "enrich_3way": q_enrich_3way,
    "keywords_freq": q_keywords_freq,
    "xml_labels": q_xml_labels,
    "block_parse": q_block_parse,
    "utxo_edges": q_utxo_edges,
    "wedge_count": q_wedge_count,
    "sessionize": q_sessionize,
    "robots_filter": q_robots_filter,
    "ann_ivf_exact": q_ann_ivf_exact,
    "dedup_clusters": q_dedup_clusters,
    "pagerank": q_pagerank,
    "token_quantiles": q_token_quantiles,
    "hash_sample": q_hash_sample,
    "bm25_scores": q_bm25_scores,
    "simhash_pairs": q_simhash_pairs,
    "pii_redact": q_pii_redact,
    "gopher_quality": q_gopher_quality,
    "decontaminate": q_decontaminate,
    "pack_sequences": q_pack_sequences,
    "dup_span_fraction": q_dup_span_fraction,
    "dedup_spans_remove": q_dedup_spans_remove,
    "sitemap_parse": q_sitemap_parse,
    "redirect_resolve": q_redirect_resolve,
    "recrawl_schedule": q_recrawl_schedule,
    "postings_build": q_postings_build,
    "hits": q_hits,
    "kcore": q_kcore,
    "warc_parse": q_warc_parse,
    "warc_roundtrip": q_warc_roundtrip,
    "bpe_pair_counts": q_bpe_pair_counts,
    "ann_lsh": q_ann_lsh,
    "vocab_topk": q_vocab_topk,
    "tfidf_topterms": q_tfidf_topterms,
    "shuffle_rank": q_shuffle_rank,
    "unigram_logprob": q_unigram_logprob,
    "curation_pipeline": q_curation_pipeline,
    "self_repetition": q_self_repetition,
    "split_assign": q_split_assign,
    "browser_render": q_browser_render,
    "dedup_survivors": q_dedup_survivors,
    "dsir_weights": q_dsir_weights,
    "dsir_resample": q_dsir_resample,
    "audio_decode": q_audio_decode,
    "anchor_agg": q_anchor_agg,
    "pretrain_mix": q_pretrain_mix,
}


NOSQL_QUERIES = {
    "hll_distinct": q_hll_distinct,  # sketch estimate — pinned in tests/test_sketch.py
    "cms_token_counts": q_cms_token_counts,  # overestimate-only — tests/test_sketch.py
    "keywords_summary": q_keywords_summary,  # TextRank — pinned in pytest
    "validated_entities": q_validated_entities,  # keccak/base58check — pinned in pytest
    "motif_vector": q_motif_vector,  # MoTS 16-dim — pinned in tests/test_motifs.py
    "solana_block_parse": q_solana_block_parse,  # 8-type fan-out — tests/test_solana.py
    "solana_tx_lookup": q_solana_tx_lookup,  # tx-by-signature subset — tests/test_solana.py
    "dcfg_parse": q_dcfg_parse,  # tracer JSON shaping — tests/test_dcfg.py
    "ann_ivf": q_ann_ivf,
    "ann_pq": q_ann_pq,  # PQ/ADC approximation — recall pinned in tests/test_similarity.py
    "bpe_train": q_bpe_train,  # merge loop — pinned vs pure-Python BPE in tests/test_bpe.py
    "bpe_encode": q_bpe_encode,  # rank-ordered apply — pinned in tests/test_bpe.py
    "crawl_bfs": q_crawl_bfs,
    "crawl_haircut": q_crawl_haircut,
    "crawl_appr": q_crawl_appr,
    "crawl_ttr_weight": q_crawl_ttr_weight,
    "crawl_poison": q_crawl_poison,
    "crawl_ttr_time": q_crawl_ttr_time,
    "crawl_ttr_redirect": q_crawl_ttr_redirect,
    "crawl_haircut_sharded": q_crawl_haircut_sharded,
    "crawl_appr_sharded": q_crawl_appr_sharded,
    "crawl_ttr_time_sharded": q_crawl_ttr_time_sharded,
    "image_decode": q_image_decode,
    "frame_sample": q_frame_sample,
    "image_resize": q_image_resize,
}


SQL_QUERIES["host_cap"] = q_host_cap

SQL_QUERIES["host_cap"] = q_host_cap
SQL_QUERIES["stratified_sample"] = q_stratified_sample

SQL_QUERIES["stratified_sample"] = q_stratified_sample
SQL_QUERIES["latest_event"] = q_latest_event

SQL_QUERIES["latest_event"] = q_latest_event
SQL_QUERIES["semdedup"] = q_semdedup


ORACLE_SQL["host_cap"] = """
    SELECT source, doc_id FROM (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 20
    ORDER BY source, doc_id
"""


ORACLE_SQL["stratified_sample"] = """
    SELECT doc_id, lang FROM documents
    WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 <
          CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 40 WHEN 'fr' THEN 40
                    WHEN 'es' THEN 40 WHEN 'zh' THEN 20 ELSE 10 END
    ORDER BY doc_id
"""


ORACLE_SQL["latest_event"] = """
    SELECT user_id, epoch_us(ts) AS ts_us, event_type,
           round(CAST(value AS DOUBLE), 2) AS value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id
"""


ORACLE_SQL["semdedup"] = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
        SELECT vec_id, v,
               (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END)
             + (CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END)
             + (CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END)
             + (CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END) AS bucket
        FROM e
    )
    SELECT x.vec_id, x.bucket FROM b x
    WHERE NOT EXISTS (
        SELECT 1 FROM b y
        WHERE y.bucket = x.bucket AND y.vec_id < x.vec_id
          AND list_cosine_similarity(y.v, x.v) >= 0.4
    )
    ORDER BY x.vec_id
"""


SQL_QUERIES["token_entropy"] = q_token_entropy


ORACLE_SQL["token_entropy"] = r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
    tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id)
    SELECT cnt.doc_id,
           round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)), 4) AS entropy
    FROM cnt JOIN tot USING (doc_id)
    GROUP BY cnt.doc_id
    ORDER BY cnt.doc_id
"""


SQL_QUERIES["c4_filter"] = q_c4_filter


ORACLE_SQL["c4_filter"] = (
    "WITH " + _C4_LINES_SQL.format() + r""",
    judged AS (
        SELECT doc_id, line, ord,
               len(regexp_extract_all(line, '\S+')) AS wc,
               (len(regexp_extract_all(line, '\S+')) >= 5
                AND regexp_matches(line, '[.!?"]$')
                AND NOT contains(line, 'javascript')
                AND NOT contains(line, '{')
                AND NOT contains(line, 'lorem ipsum')) AS kept
        FROM lines
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)                                  AS n_lines,
           CAST(coalesce(count(*) FILTER (kept), 0) AS BIGINT)       AS n_kept,
           CAST(coalesce(sum(wc) FILTER (kept), 0) AS BIGINT)        AS kept_words,
           coalesce(string_agg(line, chr(10) ORDER BY ord) FILTER (kept), '')
                                                                     AS clean,
           CAST(count(*) FILTER (kept) >= 2 AS BIGINT)               AS keep
    FROM judged GROUP BY doc_id ORDER BY doc_id
"""
)


SQL_QUERIES["boilerplate_lines"] = q_boilerplate_lines


ORACLE_SQL["boilerplate_lines"] = (
    "WITH " + _C4_LINES_SQL.format() + """,
    freq AS (SELECT line, count(*) AS n FROM lines GROUP BY line)
    SELECT lines.doc_id,
           CAST(coalesce(count(*) FILTER (n >= 10), 0) AS BIGINT) AS n_boiler,
           coalesce(string_agg(line, chr(10) ORDER BY ord) FILTER (n < 10), '')
                                                                  AS clean
    FROM lines JOIN freq USING (line)
    GROUP BY lines.doc_id ORDER BY lines.doc_id
"""
)


SQL_QUERIES["text_normalize"] = q_text_normalize


ORACLE_SQL["text_normalize"] = r"""
    WITH base AS (
        SELECT doc_id,
               text || ' cafe' || chr(769) || ' ' || (doc_id % 7) || chr(9)
                    || 'nai' || chr(776) || 've  no' || chr(768) || ' ' AS s
        FROM documents
    )
    SELECT doc_id,
           lower(trim(regexp_replace(nfc_normalize(s), '[ \t\n\r\f]+', ' ', 'g')))
                                        AS clean,
           CAST(length(s) AS BIGINT)    AS n_raw,
           CAST(length(lower(trim(regexp_replace(nfc_normalize(s),
                '[ \t\n\r\f]+', ' ', 'g')))) AS BIGINT) AS n_clean
    FROM base ORDER BY doc_id
"""


SQL_QUERIES["url_features"] = q_url_features


ORACLE_SQL["url_features"] = """
    WITH u AS (
        SELECT doc_id,
               'http://site' || (doc_id % 10) || '.example'
                 || CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/s0'
                        WHEN 2 THEN '/s0/s1' ELSE '/s0/s1/s2' END
                 || '/page' || doc_id
                 || CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' ELSE '' END
                 || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
        FROM documents
    )
    SELECT doc_id,
           'site' || (doc_id % 10) || '.example'             AS host,
           CAST((doc_id % 4) + 1 AS BIGINT)                  AS path_depth,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 0 END AS BIGINT)
                                                             AS n_params,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT)
                                                             AS has_fragment,
           CAST(length(url) AS BIGINT)                       AS url_len
    FROM u ORDER BY doc_id
"""


NOSQL_QUERIES["zlib_ratio"] = q_zlib_ratio


SQL_QUERIES["host_topk"] = q_host_topk


ORACLE_SQL["host_topk"] = """
    SELECT source, doc_id, n_chars, CAST(rk AS BIGINT) AS rk FROM (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    ) WHERE rk <= 3 ORDER BY source, rk
"""


SQL_QUERIES["mix_proportions"] = q_mix_proportions


ORACLE_SQL["mix_proportions"] = """
    WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    wts AS (
        SELECT source, n,
               CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
                    THEN 3.0 ELSE 1.0 END AS w
        FROM cnt
    ),
    norm AS (SELECT source, n, w / (SELECT sum(w) FROM wts) AS frac FROM wts),
    feas AS (SELECT min(n / frac) AS cap FROM norm),
    rates AS (
        SELECT source, least(1.0, frac * (SELECT cap FROM feas) / n) AS rate
        FROM norm
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE (md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 10000) / 10000.0 < r.rate
    ORDER BY d.doc_id
"""


SQL_QUERIES["sssp"] = q_sssp


ORACLE_SQL["sssp"] = (
    f"WITH e AS ({EDGES_SQL}),\n"
    "    e2 AS (SELECT src, dst, min(weight) AS w FROM e GROUP BY src, dst),\n"
    "    d0(node, d) AS (SELECT 0, CAST(0 AS DOUBLE)),"
    + ",".join(_sssp_round_sql(f"d{i}", f"d{i+1}") for i in range(4))
    + "\n    SELECT node, round(d, 4) AS dist FROM d4 ORDER BY node"
)


SQL_QUERIES["hist_quantiles"] = q_hist_quantiles


ORACLE_SQL["hist_quantiles"] = """
    WITH s AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx,
                      count(*) AS n FROM documents),
    b AS (
        SELECT least(CAST(floor((n_chars - s.mn) / ((s.mx - s.mn) / 32.0))
                     AS BIGINT), 31) AS bin
        FROM documents, s
    ),
    c AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
    cum AS (SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum,
                   sum(c) OVER (ORDER BY bin) - c AS cum_prev
            FROM c),
    q(q) AS (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)),
    pick AS (
        SELECT q.q, min(cum.bin) AS bin
        FROM q JOIN cum ON cum.cum >= q.q * (SELECT n FROM s)
        GROUP BY q.q
    )
    SELECT pick.q AS q,
           round(s.mn + ((s.mx - s.mn) / 32.0)
                 * (pick.bin + (pick.q * s.n - cum.cum_prev) / cum.c), 4) AS est
    FROM pick JOIN cum USING (bin), s
    ORDER BY q
"""


SQL_QUERIES["running_total"] = q_running_total


ORACLE_SQL["running_total"] = """
    SELECT event_id,
           round(sum(CAST(round(value * 100) AS BIGINT))
                     OVER (ORDER BY ts, event_id) / 100.0, 2) AS running
    FROM events ORDER BY event_id
"""


SQL_QUERIES["span_merge"] = q_span_merge


ORACLE_SQL["span_merge"] = """
    WITH spans AS (
        SELECT doc_id,
               (doc_id * 7 + j * 37) % 120 AS s,
               (doc_id * 7 + j * 37) % 120 + 15 + (j * 11) % 20 AS e
        FROM documents, unnest(generate_series(0, 2 + doc_id % 3)) AS t(j)
    ),
    marked AS (
        SELECT doc_id, s, e,
               CASE WHEN s <= max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 0 ELSE 1 END AS new_island
        FROM spans
    ),
    islands AS (
        SELECT doc_id, s, e,
               sum(new_island) OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
        FROM marked
    ),
    merged AS (
        SELECT doc_id, isl, min(s) AS ms, max(e) AS me
        FROM islands GROUP BY doc_id, isl
    )
    SELECT doc_id,
           CAST(3 + doc_id % 3 AS BIGINT)   AS n_spans,
           CAST(count(*) AS BIGINT)         AS n_merged,
           CAST(sum(me - ms) AS BIGINT)     AS covered
    FROM merged GROUP BY doc_id ORDER BY doc_id
"""


SQL_QUERIES["funnel_steps"] = q_funnel_steps


ORACLE_SQL["funnel_steps"] = """
    WITH f AS (
        SELECT user_id, event_type, ts FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    u AS (SELECT DISTINCT user_id FROM f),
    v AS (SELECT user_id, min(ts) AS t1 FROM f WHERE event_type = 'view'
          GROUP BY user_id),
    c AS (SELECT f.user_id, min(f.ts) AS t2 FROM f JOIN v USING (user_id)
          WHERE f.event_type = 'click' AND f.ts > v.t1 GROUP BY f.user_id),
    p AS (SELECT f.user_id, min(f.ts) AS t3 FROM f JOIN c USING (user_id)
          WHERE f.event_type = 'purchase' AND f.ts > c.t2 GROUP BY f.user_id)
    SELECT u.user_id,
           CAST((v.t1 IS NOT NULL)::INT + (c.t2 IS NOT NULL)::INT
                + (p.t3 IS NOT NULL)::INT AS BIGINT)     AS steps,
           coalesce(epoch_us(v.t1), -1)                  AS t_view_us,
           coalesce(epoch_us(c.t2), -1)                  AS t_click_us,
           coalesce(epoch_us(p.t3), -1)                  AS t_purchase_us
    FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
           LEFT JOIN p USING (user_id)
    ORDER BY u.user_id
"""


SQL_QUERIES["bigram_logprob"] = q_bigram_logprob


ORACLE_SQL["bigram_logprob"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS token FROM toks),
    cnt AS (SELECT token, count(*) AS c FROM w GROUP BY token),
    v AS (SELECT count(DISTINCT token) AS v FROM w),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || chr(1) || t[i+1])) AS big,
               unnest(list_transform(range(1, len(t)), i -> t[i])) AS prev
        FROM toks WHERE len(t) >= 2
    ),
    bcnt AS (SELECT big, count(*) AS cb FROM bg GROUP BY big),
    scored AS (
        SELECT bg.doc_id,
               sum(ln((bcnt.cb + 1.0) / (cnt.c + v.v))) / count(*) AS lp
        FROM bg JOIN bcnt USING (big) JOIN cnt ON cnt.token = bg.prev
             CROSS JOIN v
        GROUP BY bg.doc_id
    )
    SELECT d.doc_id, round(coalesce(s.lp, 0.0), 6) AS logprob
    FROM documents d LEFT JOIN scored s USING (doc_id) ORDER BY d.doc_id
"""


SQL_QUERIES["url_templates"] = q_url_templates


ORACLE_SQL["url_templates"] = """
    WITH u AS (
        SELECT doc_id,
               'site' || (doc_id % 10) || '.example' AS host,
               regexp_replace(
                   CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/s0'
                        WHEN 2 THEN '/s0/s1' ELSE '/s0/s1/s2' END
                   || '/page' || doc_id
                   || CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' ELSE '' END,
                   '[0-9]+', '{n}', 'g') AS template
        FROM documents
    )
    SELECT host, template, count(*) AS n_urls,
           CAST(count(*) >= 12 AS BIGINT) AS trap
    FROM u GROUP BY host, template ORDER BY host, template
"""


SQL_QUERIES["heavy_hitters"] = q_heavy_hitters


ORACLE_SQL["heavy_hitters"] = r"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    tc AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT sum(cnt) AS n FROM tc)
    SELECT token, cnt FROM tc, tot
    WHERE cnt >= ceil(0.02 * tot.n)
    ORDER BY cnt DESC, token
"""


SQL_QUERIES["nb_classify"] = q_nb_classify


ORACLE_SQL["nb_classify"] = r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    tc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    langs AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    cls_tok AS (
        SELECT d.lang, t.w, sum(t.c) AS cnt
        FROM tc t JOIN documents d USING (doc_id) GROUP BY d.lang, t.w
    ),
    cls_tot AS (SELECT lang, sum(cnt) AS tot FROM cls_tok GROUP BY lang),
    vocab AS (SELECT count(DISTINCT w) AS v FROM toks),
    scores AS (
        SELECT t.doc_id, l.lang,
               ln(l.n_docs * 1.0 / (SELECT sum(n_docs) FROM langs))
               + sum(t.c * ln((coalesce(ct.cnt, 0) + 1.0) / (ctot.tot + v.v))) AS s
        FROM tc t
        CROSS JOIN langs l
        JOIN cls_tot ctot ON ctot.lang = l.lang
        CROSS JOIN vocab v
        LEFT JOIN cls_tok ct ON ct.lang = l.lang AND ct.w = t.w
        GROUP BY t.doc_id, l.lang, l.n_docs, ctot.tot, v.v
    )
    SELECT doc_id, lang AS pred_lang, round(s, 4) AS score
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS rn
          FROM scores)
    WHERE rn = 1 ORDER BY doc_id
"""


SQL_QUERIES["event_interarrival"] = q_event_interarrival


ORACLE_SQL["event_interarrival"] = """
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
    )
    SELECT user_id, count(*) AS n_events,
           max(gap) AS max_gap_us, round(avg(gap), 2) AS mean_gap_us
    FROM g GROUP BY user_id ORDER BY user_id
"""


SQL_QUERIES["link_reciprocity"] = q_link_reciprocity


ORACLE_SQL["link_reciprocity"] = f"""
    WITH e AS (SELECT DISTINCT src, dst FROM ({EDGES_SQL})),
    r AS (
        SELECT e.src, CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END AS recip
        FROM e LEFT JOIN e ex ON ex.src = e.dst AND ex.dst = e.src
    )
    SELECT src AS node, count(*) AS n_out, sum(recip) AS n_recip,
           round(sum(recip) * 1.0 / count(*), 6) AS reciprocity
    FROM r GROUP BY src ORDER BY node
"""


SQL_QUERIES["badwords_filter"] = q_badwords_filter


ORACLE_SQL["badwords_filter"] = """
    WITH pats AS (
        SELECT * FROM (VALUES ('slow join'), ('error'), ('dup'),
                              ('spark window'), ('big hash'), ('customer line'),
                              ('stream stream'), ('query row')) AS t(pat)
    ),
    hits AS (
        SELECT d.doc_id, p.pat
        FROM documents d JOIN pats p ON position(p.pat IN d.text) > 0
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_matched, min(pat) AS first_pat
        FROM hits GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_matched, 0) AS n_matched,
           a.first_pat,
           CAST(a.n_matched IS NOT NULL AS BIGINT) AS flagged
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
"""


SQL_QUERIES["length_zscore"] = q_length_zscore


ORACLE_SQL["length_zscore"] = """
    SELECT doc_id, lang,
           round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                 / stddev_samp(n_chars) OVER (PARTITION BY lang), 4) AS z
    FROM documents ORDER BY doc_id
"""


SQL_QUERIES["host_gini"] = q_host_gini


ORACLE_SQL["host_gini"] = """
    WITH hc AS (
        SELECT doc_id % 10 AS host, sum(n_chars) AS c FROM documents GROUP BY host
    ),
    ranked AS (SELECT c, row_number() OVER (ORDER BY c, host) AS i FROM hc)
    SELECT count(*) AS n_hosts, sum(c) AS total_bytes,
           round(2.0 * sum(i * c) / (count(*) * sum(c))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked
"""


SQL_QUERIES["pca_power"] = q_pca_power


ORACLE_SQL["pca_power"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    dims AS (SELECT unnest(range(1, 65)) AS j),
    d1 AS (SELECT vec_id, sum(x[CAST(j AS INT)] * 0.125) AS d FROM e, dims GROUP BY vec_id),
    w1 AS (SELECT j, sum(d * x[CAST(j AS INT)]) AS w
           FROM e JOIN d1 USING (vec_id), dims GROUP BY j),
    n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
    v1 AS (SELECT j, w / nrm AS v FROM w1, n1),
    d2 AS (SELECT vec_id, sum(x[CAST(v1.j AS INT)] * v1.v) AS d FROM e, v1 GROUP BY vec_id),
    w2 AS (SELECT j, sum(d * x[CAST(j AS INT)]) AS w
           FROM e JOIN d2 USING (vec_id), dims GROUP BY j),
    n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2),
    v2 AS (SELECT j, w / nrm AS v FROM w2, n2),
    d3 AS (SELECT vec_id, sum(x[CAST(v2.j AS INT)] * v2.v) AS d FROM e, v2 GROUP BY vec_id),
    w3 AS (SELECT j, sum(d * x[CAST(j AS INT)]) AS w
           FROM e JOIN d3 USING (vec_id), dims GROUP BY j),
    n3 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w3)
    SELECT j, round(w / nrm, 6) AS v, round(nrm, 4) AS lam
    FROM w3, n3 ORDER BY j
"""


SQL_QUERIES["kmeans_assign"] = q_kmeans_assign


ORACLE_SQL["kmeans_assign"] = """
    WITH c AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cx FROM embeddings WHERE vec_id < 8
    ),
    d AS (
        SELECT e.vec_id, c.cid,
               list_distance(e.embedding::DOUBLE[], c.cx) AS d,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.embedding::DOUBLE[], c.cx), c.cid) AS rn
        FROM embeddings e CROSS JOIN c
    )
    SELECT vec_id, cid AS cluster, round(d, 4) AS d
    FROM d WHERE rn = 1 ORDER BY vec_id
"""


SQL_QUERIES["winsorize"] = q_winsorize


ORACLE_SQL["winsorize"] = """
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               count(*) OVER (PARTITION BY event_type) AS total
        FROM events
    ),
    thr AS (
        SELECT event_type,
               max(CASE WHEN rn = CAST(ceil(0.05 * total) AS BIGINT) THEN value END) AS p05,
               max(CASE WHEN rn = CAST(ceil(0.95 * total) AS BIGINT) THEN value END) AS p95
        FROM r GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n, t.p05, t.p95,
           sum(CASE WHEN e.value < t.p05 THEN 1 ELSE 0 END) AS n_clipped_lo,
           sum(CASE WHEN e.value > t.p95 THEN 1 ELSE 0 END) AS n_clipped_hi,
           round(avg(greatest(t.p05, least(t.p95, e.value))), 4) AS clipped_mean
    FROM events e JOIN thr t USING (event_type)
    GROUP BY e.event_type, t.p05, t.p95 ORDER BY e.event_type
"""


SQL_QUERIES["lpa_communities"] = q_lpa_communities


ORACLE_SQL["lpa_communities"] = f"""
    WITH e0 AS (SELECT DISTINCT src, dst FROM ({EDGES_SQL}) WHERE src != dst),
    e AS (SELECT src AS node, dst AS nbr FROM e0
          UNION SELECT dst, src FROM e0),
    l0 AS (SELECT DISTINCT node, node AS label FROM e),
    v1 AS (SELECT node, label FROM (
        SELECT e.node, l.label,
               row_number() OVER (PARTITION BY e.node
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM e JOIN l0 l ON l.node = e.nbr GROUP BY e.node, l.label) WHERE rn = 1),
    v2 AS (SELECT node, label FROM (
        SELECT e.node, l.label,
               row_number() OVER (PARTITION BY e.node
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM e JOIN v1 l ON l.node = e.nbr GROUP BY e.node, l.label) WHERE rn = 1),
    v3 AS (SELECT node, label FROM (
        SELECT e.node, l.label,
               row_number() OVER (PARTITION BY e.node
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM e JOIN v2 l ON l.node = e.nbr GROUP BY e.node, l.label) WHERE rn = 1)
    SELECT node, label AS community FROM v3 ORDER BY node
"""


SQL_QUERIES["jsonl_roundtrip"] = q_jsonl_roundtrip


ORACLE_SQL["jsonl_roundtrip"] = """
    SELECT lang, count(*) AS n, sum(n_chars) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
"""


SQL_QUERIES["similarity_join"] = q_similarity_join


ORACLE_SQL["similarity_join"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(a[i:i+4], ' ')
                                     FOR i IN range(1, len(a) - 3)])) AS w
        FROM toks WHERE len(a) >= 5
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        FROM g a JOIN g b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT da, db,
           round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = da
    JOIN sz sb ON sb.doc_id = db
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.2
    ORDER BY da, db
"""


SQL_QUERIES["csv_roundtrip"] = q_csv_roundtrip


ORACLE_SQL["csv_roundtrip"] = """
    SELECT source, count(*) AS n, sum(n_chars) AS total_chars
    FROM documents GROUP BY source ORDER BY source
"""


SQL_QUERIES["window_hopping"] = q_window_hopping


ORACLE_SQL["window_hopping"] = """
    WITH w AS (
        SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
               event_type, value FROM events
        UNION ALL
        SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000 - 3600000000),
               event_type, value FROM events
    )
    SELECT window_start, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM w GROUP BY window_start, event_type ORDER BY window_start, event_type
"""


SQL_QUERIES["pivot_counts"] = q_pivot_counts


ORACLE_SQL["pivot_counts"] = """
    SELECT event_type,
           sum(CASE WHEN hour(ts) // 6 = 0 THEN 1 ELSE 0 END) AS q0,
           sum(CASE WHEN hour(ts) // 6 = 1 THEN 1 ELSE 0 END) AS q1,
           sum(CASE WHEN hour(ts) // 6 = 2 THEN 1 ELSE 0 END) AS q2,
           sum(CASE WHEN hour(ts) // 6 = 3 THEN 1 ELSE 0 END) AS q3
    FROM events GROUP BY event_type ORDER BY event_type
"""


SQL_QUERIES["graph_features"] = q_graph_features


ORACLE_SQL["graph_features"] = f"""
    WITH p AS ({_pagerank_oracle_sql()}),
    h AS ({_hits_oracle_sql()}),
    nodes2 AS (SELECT doc_id AS d FROM documents),
    nn2 AS (SELECT count(*) AS n FROM documents),
    edges2 AS (
        SELECT d AS src, (7 * d + 1) % nn2.n AS dst FROM nodes2, nn2
        UNION
        SELECT d AS src, (d + 10) % nn2.n AS dst FROM nodes2, nn2
        WHERE ((d + 10) % nn2.n) % 10 = d % 10
    ),
    od AS (SELECT src, count(*) AS outdeg FROM edges2 GROUP BY src),
    idg AS (SELECT dst, count(*) AS indeg FROM edges2 GROUP BY dst)
    SELECT p.doc_id, p.pagerank, h.hub, h.auth,
           coalesce(od.outdeg, 0) AS outdeg,
           coalesce(idg.indeg, 0) AS indeg
    FROM p
    JOIN h USING (doc_id)
    LEFT JOIN od ON od.src = p.doc_id
    LEFT JOIN idg ON idg.dst = p.doc_id
    ORDER BY p.doc_id
"""


SQL_QUERIES["chunk_texts"] = q_chunk_texts


ORACLE_SQL["chunk_texts"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM documents
    ),
    starts AS (
        -- chunk c starts at token c*24 (0-based); the last chunk is the
        -- first one whose window reaches the end of the doc
        SELECT doc_id, a, c.c AS chunk_id, c.c * 24 AS start_tok
        FROM toks, LATERAL (SELECT unnest(range(0, len(a))) AS c) c
        WHERE c.c * 24 < len(a)
          AND (c.c = 0 OR (c.c - 1) * 24 + 32 < len(a))
    )
    SELECT doc_id, chunk_id, start_tok,
           least(32, len(a) - start_tok) AS n_tokens,
           a[start_tok + 1] AS first_tok,
           a[least(start_tok + 32, len(a))] AS last_tok
    FROM starts ORDER BY doc_id, chunk_id
"""


SQL_QUERIES["pmi_bigrams"] = q_pmi_bigrams


ORACLE_SQL["pmi_bigrams"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS a FROM documents
    ),
    uni AS (SELECT unnest(a) AS w FROM toks),
    ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    nu AS (SELECT count(*) AS n FROM uni),
    bi AS (
        SELECT a[i] AS w1, a[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(range(1, len(a))) AS i) g
    ),
    bcnt AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
    nb AS (SELECT count(*) AS n FROM bi)
    SELECT bcnt.w1 || ' ' || bcnt.w2 AS bigram, bcnt.c AS cnt,
           round(ln((bcnt.c / nb.n) / ((u1.c / nu.n) * (u2.c / nu.n))), 6) AS pmi
    FROM bcnt, nb, nu
    JOIN ucnt u1 ON u1.w = bcnt.w1
    JOIN ucnt u2 ON u2.w = bcnt.w2
    WHERE bcnt.c >= 5
    ORDER BY pmi DESC, bigram
    LIMIT 50
"""


SQL_QUERIES["corr_matrix"] = q_corr_matrix


ORACLE_SQL["corr_matrix"] = r"""
    WITH m AS (
        SELECT sum(l_quantity) / count(*) AS mq,
               sum(l_extendedprice) / count(*) AS me,
               sum(l_discount) / count(*) AS md,
               sum(l_tax) / count(*) AS mt
        FROM lineitem
    ),
    c AS (
        SELECT
            sum((l_quantity - mq) * (l_quantity - mq)) AS vq,
            sum((l_extendedprice - me) * (l_extendedprice - me)) AS ve,
            sum((l_discount - md) * (l_discount - md)) AS vd,
            sum((l_tax - mt) * (l_tax - mt)) AS vt,
            sum((l_quantity - mq) * (l_extendedprice - me)) AS xqe,
            sum((l_quantity - mq) * (l_discount - md)) AS xqd,
            sum((l_quantity - mq) * (l_tax - mt)) AS xqt,
            sum((l_extendedprice - me) * (l_discount - md)) AS xed,
            sum((l_extendedprice - me) * (l_tax - mt)) AS xet,
            sum((l_discount - md) * (l_tax - mt)) AS xdt
        FROM lineitem, m
    )
    SELECT * FROM (
        SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
               round(xqe / sqrt(vq * ve), 6) AS corr FROM c
        UNION ALL
        SELECT 'l_quantity', 'l_discount', round(xqd / sqrt(vq * vd), 6) FROM c
        UNION ALL
        SELECT 'l_quantity', 'l_tax', round(xqt / sqrt(vq * vt), 6) FROM c
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount', round(xed / sqrt(ve * vd), 6) FROM c
        UNION ALL
        SELECT 'l_extendedprice', 'l_tax', round(xet / sqrt(ve * vt), 6) FROM c
        UNION ALL
        SELECT 'l_discount', 'l_tax', round(xdt / sqrt(vd * vt), 6) FROM c
    ) ORDER BY col_x, col_y
"""


SQL_QUERIES["rollup_agg"] = q_rollup_agg


ORACLE_SQL["rollup_agg"] = r"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
"""


SQL_QUERIES["host_pagerank"] = q_host_pagerank

SQL_QUERIES["host_pagerank"] = q_host_pagerank
ORACLE_SQL["host_pagerank"] = _host_pagerank_oracle_sql()


SQL_QUERIES["opic_priority"] = q_opic_priority

SQL_QUERIES["opic_priority"] = q_opic_priority
ORACLE_SQL["opic_priority"] = _opic_oracle_sql()


SQL_QUERIES["langid_confusion"] = q_langid_confusion


SQL_QUERIES["hard_negatives"] = q_hard_negatives


ORACLE_SQL["hard_negatives"] = """
    WITH q AS (
        SELECT vec_id AS query_id, label AS qlabel,
               CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 10
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
               list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
        FROM q CROSS JOIN embeddings e
        WHERE e.label <> q.qlabel
    )
    SELECT query_id, neighbor_id, CAST(label AS BIGINT) AS label,
           round(sim, 4) AS sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) <= 3
    ORDER BY query_id, sim DESC, neighbor_id
"""


SQL_QUERIES["rare_category_merge"] = q_rare_category_merge


ORACLE_SQL["rare_category_merge"] = """
    WITH cells AS (
        SELECT source, lang, count(*) AS cnt
        FROM documents GROUP BY source, lang
    )
    SELECT CASE WHEN cnt >= 5 THEN source || '/' || lang ELSE 'other' END
               AS category,
           CAST(sum(cnt) AS BIGINT) AS cnt
    FROM cells GROUP BY 1 ORDER BY category
"""


SQL_QUERIES["curriculum_order"] = q_curriculum_order


ORACLE_SQL["curriculum_order"] = """
    WITH ranked AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS r
        FROM documents
    ),
    nn AS (SELECT count(*) AS n FROM documents),
    dec AS (SELECT doc_id, (r * 10) // nn.n AS decile FROM ranked, nn),
    keyed AS (
        SELECT doc_id, decile, md5(CAST(doc_id AS VARCHAR)) AS k FROM dec
    )
    SELECT doc_id, decile,
           row_number() OVER (PARTITION BY decile ORDER BY k, doc_id) - 1 AS pos
    FROM keyed ORDER BY doc_id
"""


SQL_QUERIES["mix_temperature"] = q_mix_temperature


ORACLE_SQL["mix_temperature"] = """
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    w AS (
        SELECT source,
               CAST(floor(power(n, 0.5) * 1000000) AS BIGINT) AS wv
        FROM counts
    ),
    tot AS (SELECT sum(wv) AS z FROM w),
    quota AS (
        SELECT source, (200 * wv) // tot.z AS q FROM w, tot
    ),
    keyed AS (
        SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS k FROM documents
    ),
    ranked AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY k, doc_id) AS rn
        FROM keyed
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quota USING (source)
    WHERE r.rn <= quota.q
    ORDER BY r.doc_id
"""


# the confusion mirror nests the full-value langid oracle as a CTE so both
# sides' predictions come from the complete (independently implemented)
# rule set
ORACLE_SQL["langid_confusion"] = (
    "WITH pred AS (" + ORACLE_SQL["langid"] + """)
    SELECT d.lang, p.lang_pred, count(*) AS cnt
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY d.lang, p.lang_pred
    ORDER BY d.lang, p.lang_pred
"""
)


SQL_QUERIES["tpch_q18"] = q_tpch_q18


ORACLE_SQL["tpch_q18"] = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 200
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
"""


SQL_QUERIES["ngram_hash_features"] = q_ngram_hash_features


ORACLE_SQL["ngram_hash_features"] = r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    )
    SELECT doc_id, CAST(md5_number_lower(w) % 64 AS BIGINT) AS bucket,
           count(*) AS cnt
    FROM toks GROUP BY doc_id, bucket
    ORDER BY doc_id, bucket
"""


SQL_QUERIES["group_percentiles"] = q_group_percentiles


ORACLE_SQL["group_percentiles"] = """
    SELECT doc_id, lang,
           round(percent_rank() OVER (PARTITION BY lang
                                      ORDER BY n_chars, doc_id), 6) AS pct
    FROM documents ORDER BY doc_id
"""


SQL_QUERIES["dist_divergence"] = q_dist_divergence


ORACLE_SQL["dist_divergence"] = """
    WITH cells AS (
        SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang
    ),
    src AS (SELECT source, sum(c) AS ns FROM cells GROUP BY source),
    corpus AS (SELECT lang, sum(c) AS cq FROM cells GROUP BY lang),
    tot AS (SELECT count(*) AS n FROM documents),
    terms AS (
        SELECT cells.source, cells.lang,
               (cells.c / src.ns) * ln((cells.c / src.ns) / (corpus.cq / tot.n))
                   AS term
        FROM cells
        JOIN src USING (source)
        JOIN corpus USING (lang)
        CROSS JOIN tot
    )
    SELECT source, round(sum(term ORDER BY lang), 6) AS kl
    FROM terms GROUP BY source ORDER BY source
"""


SQL_QUERIES["burst_windows"] = q_burst_windows


ORACLE_SQL["burst_windows"] = """
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
               count(*) AS cnt
        FROM events GROUP BY event_type, hour
    ),
    m AS (
        SELECT event_type, sum(cnt) / count(*) AS mean, count(*) AS n
        FROM hourly GROUP BY event_type
    ),
    v AS (
        SELECT h.event_type,
               sum((h.cnt - m.mean) * (h.cnt - m.mean)) / m.n AS var
        FROM hourly h JOIN m USING (event_type)
        GROUP BY h.event_type, m.n
    )
    SELECT h.event_type, h.hour, h.cnt
    FROM hourly h JOIN m USING (event_type) JOIN v USING (event_type)
    WHERE h.cnt > m.mean + 2.0 * sqrt(v.var)
    ORDER BY h.event_type, h.hour
"""


SQL_QUERIES["event_transitions"] = q_event_transitions


ORACLE_SQL["event_transitions"] = """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    cells AS (
        SELECT event_type AS from_type, nxt AS to_type, count(*) AS cnt
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY event_type, nxt
    ),
    tot AS (SELECT from_type, sum(cnt) AS n FROM cells GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.cnt, round(c.cnt / t.n, 6) AS p
    FROM cells c JOIN tot t USING (from_type)
    ORDER BY c.from_type, c.to_type
"""


SQL_QUERIES["window_rolling_avg"] = q_window_rolling_avg


ORACLE_SQL["window_rolling_avg"] = """
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 6) AS roll_avg
    FROM events
    ORDER BY user_id, event_id
"""


SQL_QUERIES["nonedge_sample"] = q_nonedge_sample


ORACLE_SQL["nonedge_sample"] = """
    WITH docs AS (SELECT doc_id AS d FROM documents),
    nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
        SELECT d AS src, (7 * d + 1) % nn.n AS dst FROM docs, nn
        UNION
        SELECT d AS src, (d + 10) % nn.n AS dst FROM docs, nn
        WHERE ((d + 10) % nn.n) % 10 = d % 10
    ),
    cand AS (
        SELECT d AS src, j.j AS probe,
               CAST(md5_number_lower(d || ':' || j.j) % nn.n AS BIGINT) AS dst
        FROM docs, nn, LATERAL (SELECT unnest(range(0, 8)) AS j) j
    ),
    noneedge AS (
        SELECT c.src, c.dst, c.probe
        FROM cand c ANTI JOIN edges e ON e.src = c.src AND e.dst = c.dst
        WHERE c.dst <> c.src
    )
    SELECT src, dst, probe FROM noneedge
    QUALIFY row_number() OVER (PARTITION BY src ORDER BY probe, dst) <= 4
    ORDER BY src, probe
"""


SQL_QUERIES["link_locality"] = q_link_locality


ORACLE_SQL["link_locality"] = """
    WITH docs AS (SELECT doc_id AS d FROM documents),
    nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
        SELECT d AS src, (7 * d + 1) % nn.n AS dst FROM docs, nn
        UNION
        SELECT d AS src, (d + 10) % nn.n AS dst FROM docs, nn
        WHERE ((d + 10) % nn.n) % 10 = d % 10
    )
    SELECT src % 10 AS host,
           CAST(sum(CASE WHEN src % 10 = dst % 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS local,
           count(*) AS n,
           round(sum(CASE WHEN src % 10 = dst % 10 THEN 1 ELSE 0 END)
                 / count(*), 6) AS local_ratio
    FROM edges GROUP BY src % 10 ORDER BY host
"""


SQL_QUERIES["dup_rate_by_source"] = q_dup_rate_by_source


ORACLE_SQL["dup_rate_by_source"] = r"""
    WITH fp AS (
        SELECT doc_id, source,
               md5(array_to_string(
                   (regexp_split_to_array(trim(text), '\s+'))[1:4], ' ')) AS h
        FROM documents
    ),
    sizes AS (SELECT h, count(*) AS sz FROM fp GROUP BY h)
    SELECT f.source,
           CAST(sum(CASE WHEN s.sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dups,
           count(*) AS n,
           round(sum(CASE WHEN s.sz > 1 THEN 1 ELSE 0 END) / count(*), 6)
               AS dup_rate
    FROM fp f JOIN sizes s USING (h)
    GROUP BY f.source ORDER BY f.source
"""


SQL_QUERIES["event_value_quantiles"] = q_event_value_quantiles


ORACLE_SQL["event_value_quantiles"] = """
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) - 1 AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           round(max(CASE WHEN r = CAST(floor(0.25 * (n - 1)) AS BIGINT)
                          THEN value END), 6) AS p25,
           round(max(CASE WHEN r = CAST(floor(0.5 * (n - 1)) AS BIGINT)
                          THEN value END), 6) AS p50,
           round(max(CASE WHEN r = CAST(floor(0.75 * (n - 1)) AS BIGINT)
                          THEN value END), 6) AS p75
    FROM ranked GROUP BY event_type ORDER BY event_type
"""


SQL_QUERIES["cross_source_overlap"] = q_cross_source_overlap


ORACLE_SQL["cross_source_overlap"] = r"""
    WITH cells AS (
        SELECT DISTINCT
               md5(array_to_string(
                   (regexp_split_to_array(trim(text), '\s+'))[1:4], ' ')) AS h,
               source
        FROM documents
    )
    SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
    FROM cells a JOIN cells b ON a.h = b.h AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY src_a, src_b
"""


SQL_QUERIES["monthly_revenue_delta"] = q_monthly_revenue_delta


ORACLE_SQL["monthly_revenue_delta"] = """
    WITH m AS (
        SELECT year(l_shipdate) * 100 + month(l_shipdate) AS month,
               round(sum(round(l_extendedprice * (1 - l_discount), 2)), 2)
                   AS revenue
        FROM lineitem GROUP BY 1
    )
    SELECT month, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS delta
    FROM m ORDER BY month
"""


SQL_QUERIES["daily_top_users"] = q_daily_top_users


ORACLE_SQL["daily_top_users"] = """
    WITH cells AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               user_id,
               round(sum(round(value, 2)), 2) AS total
        FROM events GROUP BY day, user_id
    )
    SELECT day, user_id, total,
           CAST(row_number() OVER (PARTITION BY day
                                   ORDER BY total DESC, user_id) AS BIGINT)
               AS rank
    FROM cells
    QUALIFY rank <= 3
    ORDER BY day, rank
"""


SQL_QUERIES["host_quality_budget"] = q_host_quality_budget


# nests the full gopher_quality oracle so the keep rule cannot drift
ORACLE_SQL["host_quality_budget"] = (
    "WITH gq AS (" + ORACLE_SQL["gopher_quality"] + """),
    cells AS (
        SELECT d.source, CAST(sum(gq.keep) AS BIGINT) AS keeps, count(*) AS n
        FROM documents d JOIN gq USING (doc_id)
        GROUP BY d.source
    ),
    tot AS (SELECT sum(keeps) AS tk FROM cells)
    SELECT source, keeps, n,
           round(keeps / n, 6) AS keep_rate,
           CASE WHEN tot.tk > 0 THEN (1000 * keeps) // tot.tk ELSE 0 END
               AS budget
    FROM cells, tot ORDER BY source
"""
)


SQL_QUERIES["cluster_size_histogram"] = q_cluster_size_histogram


ORACLE_SQL["cluster_size_histogram"] = (
    "WITH cl AS (" + ORACLE_SQL["dedup_clusters"] + """),
    sizes AS (SELECT cluster_id, count(*) AS size FROM cl GROUP BY cluster_id)
    SELECT size, count(*) AS clusters FROM sizes GROUP BY size ORDER BY size
"""
)


SQL_QUERIES["levenshtein_verify"] = q_levenshtein_verify


ORACLE_SQL["levenshtein_verify"] = """
    WITH fp AS (
        SELECT doc_id, substr(text, 1, 64) AS p,
               md5(array_to_string(
                   (regexp_split_to_array(trim(text), '\\s+'))[1:4], ' ')) AS h
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.p, b.p) AS dist,
           CASE WHEN greatest(len(a.p), len(b.p)) = 0 THEN 1.0
                ELSE round(1.0 - levenshtein(a.p, b.p)
                           / greatest(len(a.p), len(b.p)), 6) END AS sim
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
"""


SQL_QUERIES["schema_profile"] = q_schema_profile


ORACLE_SQL["schema_profile"] = """
    SELECT 'event_id' AS col_name, count(*) AS n_rows,
           count(*) - count(event_id) AS n_null,
           count(DISTINCT event_id) AS n_distinct,
           round(CAST(min(event_id) AS DOUBLE), 6) AS min_num,
           round(CAST(max(event_id) AS DOUBLE), 6) AS max_num
    FROM events
    UNION ALL
    SELECT 'ts', count(*), count(*) - count(ts), count(DISTINCT ts),
           round(CAST(epoch_us(min(ts)) AS DOUBLE), 6),
           round(CAST(epoch_us(max(ts)) AS DOUBLE), 6)
    FROM events
    UNION ALL
    SELECT 'user_id', count(*), count(*) - count(user_id),
           count(DISTINCT user_id),
           round(CAST(min(user_id) AS DOUBLE), 6),
           round(CAST(max(user_id) AS DOUBLE), 6)
    FROM events
    UNION ALL
    SELECT 'event_type', count(*), count(*) - count(event_type),
           count(DISTINCT event_type), NULL, NULL
    FROM events
    UNION ALL
    SELECT 'value', count(*), count(*) - count(value), count(DISTINCT value),
           round(CAST(min(value) AS DOUBLE), 6),
           round(CAST(max(value) AS DOUBLE), 6)
    FROM events
    UNION ALL
    SELECT 'props', count(*), count(*) - count(props), count(DISTINCT props),
           NULL, NULL
    FROM events
    ORDER BY col_name
"""


SQL_QUERIES["source_host_entropy"] = q_source_host_entropy


ORACLE_SQL["source_host_entropy"] = """
    WITH hc AS (
        SELECT source, doc_id % 10 AS host, count(*) AS c
        FROM documents GROUP BY source, host
    ),
    tot AS (SELECT source, sum(c) AS n FROM hc GROUP BY source)
    SELECT hc.source, CAST(any_value(tot.n) AS BIGINT) AS n_docs,
           count(*) AS n_hosts,
           round(sum(-(c / tot.n) * ln(c / tot.n) ORDER BY host), 6)
               AS entropy
    FROM hc JOIN tot USING (source)
    GROUP BY hc.source ORDER BY hc.source
"""


SQL_QUERIES["tokenizer_fertility"] = q_tokenizer_fertility


ORACLE_SQL["tokenizer_fertility"] = """
    WITH t AS (
        SELECT lang, source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS toks,
               n_chars
        FROM documents
    )
    SELECT lang, source, CAST(sum(toks) AS BIGINT) AS tokens,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           CASE WHEN sum(n_chars) = 0 THEN 0.0
                ELSE round(100.0 * sum(toks) / sum(n_chars), 6) END AS fertility
    FROM t GROUP BY lang, source ORDER BY lang, source
"""


SQL_QUERIES["skew_join"] = q_skew_join


ORACLE_SQL["skew_join"] = """
    WITH e AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS k,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT k, c_name, count(*) AS n, round(sum(cents) / 100.0, 2) AS value_sum
    FROM e JOIN customer ON k = c_custkey
    GROUP BY k, c_name ORDER BY k
"""


SQL_QUERIES["char_entropy"] = q_char_entropy


ORACLE_SQL["char_entropy"] = """
    WITH pos AS (
        SELECT doc_id, unnest(range(1, len(text) + 1)) AS i, text
        FROM documents
    ),
    chars AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch FROM pos),
    freq AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
    tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY doc_id)
    SELECT f.doc_id, CAST(any_value(t.n) AS BIGINT) AS n_chars,
           count(*) AS n_unique,
           round(sum(-(c / t.n) * ln(c / t.n) ORDER BY ch), 6) AS entropy
    FROM freq f JOIN tot t USING (doc_id)
    GROUP BY f.doc_id ORDER BY f.doc_id
"""


SQL_QUERIES["sentence_split"] = q_sentence_split


ORACLE_SQL["sentence_split"] = """
    WITH arrs AS (
        SELECT doc_id, string_split_regex(text, '[.!?]\\s+') AS arr
        FROM documents
    ),
    sents AS (
        SELECT doc_id,
               unnest(range(1, len(arr) + 1)) AS sent_idx,
               unnest(arr) AS sentence
        FROM arrs
    )
    SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx, sentence,
           len(regexp_split_to_array(trim(sentence), '\\s+')) AS n_tokens
    FROM sents ORDER BY doc_id, sent_idx
"""


SQL_QUERIES["df_idf_topk"] = q_df_idf_topk


ORACLE_SQL["df_idf_topk"] = """
    WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents
    ),
    df AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT term, df, round(ln(n_docs / df), 6) AS idf
    FROM df, n
    ORDER BY df DESC, term LIMIT 100
"""


SQL_QUERIES["label_centroid_distance"] = q_label_centroid_distance


ORACLE_SQL["label_centroid_distance"] = """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
    dims AS (SELECT CAST(unnest(range(1, 65)) AS INT) AS j),
    comp AS (SELECT vec_id, label, j, x[j] AS v FROM e, dims),
    cent AS (SELECT label, j, avg(v) AS c FROM comp GROUP BY label, j),
    gcent AS (SELECT j, avg(v) AS g FROM comp GROUP BY j),
    cn AS (SELECT label, sqrt(sum(c * c)) AS cnv FROM cent GROUP BY label),
    gn AS (SELECT sqrt(sum(g * g)) AS gnv FROM gcent),
    dots AS (
        SELECT comp.vec_id, comp.label,
               sum(v * c) AS vc, sum(v * g) AS vg, sum(v * v) AS vv
        FROM comp
        JOIN cent ON comp.label = cent.label AND comp.j = cent.j
        JOIN gcent ON comp.j = gcent.j
        GROUP BY comp.vec_id, comp.label
    )
    SELECT d.label, count(*) AS n,
           round(avg(vc / (sqrt(vv) * cn.cnv)), 4) AS cos_own,
           round(avg(vg / (sqrt(vv) * gn.gnv)), 4) AS cos_glob
    FROM dots d JOIN cn ON d.label = cn.label CROSS JOIN gn
    GROUP BY d.label ORDER BY d.label
"""


SQL_QUERIES["minhash_estimate_error"] = q_minhash_estimate_error


ORACLE_SQL["minhash_estimate_error"] = (
    "WITH sig AS (" + ORACLE_SQL["minhash_signatures"] + """),
    t AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
        FROM documents
    ),
    ex AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                     len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
        FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    ),
    est AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(sum(CASE WHEN a.minhash = b.minhash THEN 1 ELSE 0 END)
                     / 64.0, 4) AS est
        FROM sig a JOIN sig b
          ON b.doc_id = a.doc_id + 1 AND a.perm_id = b.perm_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, est, jaccard, round(est - jaccard, 4) AS err
    FROM est JOIN ex USING (doc_a, doc_b) ORDER BY doc_a
"""
)


SQL_QUERIES["retention_cohorts"] = q_retention_cohorts


ORACLE_SQL["retention_cohorts"] = """
    WITH f AS (SELECT user_id, min(ts) AS fts FROM events GROUP BY user_id),
    e AS (
        SELECT e.user_id,
               datediff('day', CAST(f.fts AS DATE), CAST(e.ts AS DATE))
                   AS day_offset,
               strftime(f.fts, '%Y-%m-%d') AS cohort
        FROM events e JOIN f USING (user_id)
    )
    SELECT cohort, CAST(day_offset AS BIGINT) AS day_offset,
           count(DISTINCT user_id) AS n_users
    FROM e GROUP BY cohort, day_offset ORDER BY cohort, day_offset
"""


SQL_QUERIES["event_runs"] = q_event_runs


ORACLE_SQL["event_runs"] = """
    WITH o AS (
        SELECT user_id, event_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rt
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, rn - rt AS grp, count(*) AS n_events,
               min(ts) AS start_ts, max(ts) AS end_ts, min(rn) AS first_rn
        FROM o GROUP BY user_id, event_type, rn - rt
    )
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY first_rn)
               AS run_idx,
           event_type, n_events,
           epoch_us(start_ts) AS start_us, epoch_us(end_ts) AS end_us
    FROM runs ORDER BY user_id, run_idx
"""


SQL_QUERIES["recrawl_plan"] = q_recrawl_plan


ORACLE_SQL["recrawl_plan"] = (
    "WITH sched AS (" + ORACLE_SQL["recrawl_schedule"].replace("ORDER BY page_id", "") + """),
    hosted AS (
        SELECT 'site' || (page_id % 10) || '.example' AS host, page_id, staleness
        FROM sched WHERE staleness IS NOT NULL
    ),
    ranked AS (
        SELECT host, page_id, staleness,
               row_number() OVER (PARTITION BY host
                                  ORDER BY staleness DESC, page_id) AS rank
        FROM hosted
    )
    SELECT host, page_id, staleness, rank
    FROM ranked WHERE rank <= 8 ORDER BY host, rank
"""
)


SQL_QUERIES["mad_outliers"] = q_mad_outliers


ORACLE_SQL["mad_outliers"] = """
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) - 1 AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    med AS (
        SELECT event_type,
               max(CASE WHEN r = CAST((n - 1) // 2 AS BIGINT)
                        THEN value END) AS med
        FROM ranked GROUP BY event_type
    ),
    devr AS (
        SELECT e.event_type, abs(e.value - m.med) AS d,
               row_number() OVER (PARTITION BY e.event_type
                                  ORDER BY abs(e.value - m.med), e.event_id)
                   - 1 AS r,
               count(*) OVER (PARTITION BY e.event_type) AS n
        FROM events e JOIN med m USING (event_type)
    ),
    madt AS (
        SELECT event_type,
               max(CASE WHEN r = CAST((n - 1) // 2 AS BIGINT)
                        THEN d END) AS mad
        FROM devr GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n,
           round(any_value(m.med), 6) AS median,
           round(any_value(t.mad), 6) AS mad,
           CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * t.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN med m USING (event_type) JOIN madt t USING (event_type)
    GROUP BY e.event_type ORDER BY event_type
"""


SQL_QUERIES["oov_rate"] = q_oov_rate


ORACLE_SQL["oov_rate"] = """
    WITH tok AS (
        SELECT lang, source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents
    ),
    vocab AS (
        SELECT term FROM (
            SELECT term, count(*) AS c FROM tok GROUP BY term
        ) ORDER BY c DESC, term LIMIT 100
    )
    SELECT t.lang, t.source, count(*) AS tokens,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS oov,
           round(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS oov_rate
    FROM tok t LEFT JOIN vocab v USING (term)
    GROUP BY t.lang, t.source ORDER BY t.lang, t.source
"""


SQL_QUERIES["fuzzy_dedup_clusters"] = q_fuzzy_dedup_clusters


ORACLE_SQL["fuzzy_dedup_clusters"] = (
    "WITH RECURSIVE lev AS (" + ORACLE_SQL["levenshtein_verify"].replace("ORDER BY doc_a, doc_b", "") + """),
    cut AS (SELECT doc_a, doc_b FROM lev WHERE sim >= 0.8),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM cut
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM cut
    ),
    reach(node, r) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
    )
    SELECT node AS doc_id, min(r) AS cluster_id
    FROM reach GROUP BY node ORDER BY doc_id
"""
)


SQL_QUERIES["quantile_sketch_error"] = q_quantile_sketch_error


ORACLE_SQL["quantile_sketch_error"] = """
    WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
    b AS (
        SELECT e.event_type,
               least(CAST(floor((e.value - mm.lo)
                                / (CASE WHEN mm.hi > mm.lo
                                        THEN mm.hi - mm.lo ELSE 1 END)
                                * 64) AS BIGINT), 63) AS bkt
        FROM events e CROSS JOIN mm
    ),
    hc AS (SELECT event_type, bkt, count(*) AS c FROM b GROUP BY event_type, bkt),
    cum AS (
        SELECT event_type, bkt, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY bkt) AS cc,
               sum(c) OVER (PARTITION BY event_type) AS n
        FROM hc
    ),
    est AS (
        SELECT event_type, CAST(any_value(n) AS BIGINT) AS n,
               min(bkt) FILTER (cc > (n - 1) // 2) AS est_bkt
        FROM cum GROUP BY event_type
    ),
    ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) - 1 AS r,
               count(*) OVER (PARTITION BY event_type) AS nn
        FROM events
    ),
    ex AS (
        SELECT event_type,
               max(CASE WHEN r = CAST((nn - 1) // 2 AS BIGINT)
                        THEN value END) AS exact_p50
        FROM ranked GROUP BY event_type
    )
    SELECT e.event_type, e.n,
           round(mm.lo + e.est_bkt * (CASE WHEN mm.hi > mm.lo
                                           THEN mm.hi - mm.lo ELSE 1 END)
                         / 64.0, 6) AS est_p50,
           round(x.exact_p50, 6) AS exact_p50,
           round((mm.lo + e.est_bkt * (CASE WHEN mm.hi > mm.lo
                                            THEN mm.hi - mm.lo ELSE 1 END)
                          / 64.0) - x.exact_p50, 6) AS err
    FROM est e JOIN ex x USING (event_type) CROSS JOIN mm
    ORDER BY e.event_type
"""


SQL_QUERIES["max_drawdown"] = q_max_drawdown


ORACLE_SQL["max_drawdown"] = """
    WITH w AS (
        SELECT user_id, value,
               max(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS runmax
        FROM events
    )
    SELECT user_id, count(*) AS n,
           round(max(runmax), 6) AS peak,
           round(max(runmax - value), 6) AS max_drawdown
    FROM w GROUP BY user_id ORDER BY user_id
"""


SQL_QUERIES["distinctive_terms"] = q_distinctive_terms


ORACLE_SQL["distinctive_terms"] = """
    WITH tok AS (
        SELECT source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents
    ),
    cells AS (SELECT source, term, count(*) AS y FROM tok GROUP BY source, term),
    gl AS (SELECT term, sum(y) AS yg FROM cells GROUP BY term),
    tot AS (SELECT sum(yg) AS ntot FROM gl),
    ps AS (SELECT source, sum(y) AS ns FROM cells GROUP BY source),
    z AS (
        SELECT c.source, c.term, c.y,
               round(
                 (ln((c.y + 100.0 * g.yg / t.ntot)
                     / (p.ns + 100.0 - c.y - 100.0 * g.yg / t.ntot))
                  - ln((g.yg - c.y + 100.0 * g.yg / t.ntot)
                       / (t.ntot - p.ns + 100.0 - (g.yg - c.y)
                          - 100.0 * g.yg / t.ntot)))
                 / sqrt(1.0 / (c.y + 100.0 * g.yg / t.ntot)
                        + 1.0 / (g.yg - c.y + 100.0 * g.yg / t.ntot)), 6)
                   AS z
        FROM cells c JOIN gl g USING (term) CROSS JOIN tot t
        JOIN ps p ON c.source = p.source
    ),
    ranked AS (
        SELECT source, term, y, z,
               row_number() OVER (PARTITION BY source
                                  ORDER BY z DESC, term) AS rank
        FROM z
    )
    SELECT source, term, CAST(y AS BIGINT) AS y, z, rank
    FROM ranked WHERE rank <= 10 ORDER BY source, rank
"""


SQL_QUERIES["ks_drift"] = q_ks_drift


ORACLE_SQL["ks_drift"] = """
    WITH sv AS (
        SELECT source, n_chars AS v, count(*) AS c
        FROM documents GROUP BY source, n_chars
    ),
    tot AS (SELECT source, sum(c) AS n FROM sv GROUP BY source),
    gv AS (SELECT v, sum(c) AS cg FROM sv GROUP BY v),
    gn AS (SELECT sum(cg) AS ng FROM gv),
    grid AS (
        SELECT t.source, g.v FROM (SELECT DISTINCT source FROM sv) t
        CROSS JOIN gv g
    ),
    own AS (
        SELECT gr.source, gr.v, coalesce(sv.c, 0) AS c
        FROM grid gr LEFT JOIN sv ON sv.source = gr.source AND sv.v = gr.v
    ),
    cum AS (
        SELECT o.source, o.v,
               sum(o.c) OVER (PARTITION BY o.source ORDER BY o.v) AS co,
               sum(g.cg) OVER (PARTITION BY o.source ORDER BY o.v) AS cumg
        FROM own o JOIN gv g USING (v)
    )
    SELECT c.source, CAST(any_value(t.n) AS BIGINT) AS n,
           round(max(abs(c.co * 1.0 / t.n
                         - (c.cumg - c.co) * 1.0 / (gn.ng - t.n))), 6) AS ks
    FROM cum c JOIN tot t USING (source) CROSS JOIN gn
    GROUP BY c.source ORDER BY c.source
"""


SQL_QUERIES["tail_exponent"] = q_tail_exponent


ORACLE_SQL["tail_exponent"] = """
    WITH top AS (
        SELECT n_chars,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
        FROM documents ORDER BY n_chars DESC, doc_id LIMIT 101
    ),
    xk AS (SELECT n_chars AS x_k1 FROM top WHERE r = 101),
    s AS (
        SELECT sum(ln(t.n_chars * 1.0 / xk.x_k1) ORDER BY t.r) AS lsum
        FROM top t CROSS JOIN xk WHERE t.r <= 100
    )
    SELECT CAST(100 AS BIGINT) AS k, CAST(xk.x_k1 AS DOUBLE) AS x_k1,
           round(CASE WHEN s.lsum > 0 THEN 100 / s.lsum ELSE NULL END, 6)
               AS alpha
    FROM s CROSS JOIN xk
"""


SQL_QUERIES["ols_fit"] = q_ols_fit


ORACLE_SQL["ols_fit"] = """
    WITH m AS (
        SELECT l_returnflag AS g,
               sum(l_quantity) / count(*) AS mx,
               sum(l_extendedprice) / count(*) AS my
        FROM lineitem GROUP BY 1
    ),
    c AS (
        SELECT l.l_returnflag AS g, m.mx, m.my, count(*) AS n,
               sum((l_quantity - mx) * (l_quantity - mx)) AS sxx,
               sum((l_extendedprice - my) * (l_extendedprice - my)) AS syy,
               sum((l_quantity - mx) * (l_extendedprice - my)) AS sxy
        FROM lineitem l JOIN m ON l.l_returnflag = m.g
        GROUP BY 1, m.mx, m.my
    )
    SELECT g AS l_returnflag, n,
           round(sxy / sxx, 6) AS slope,
           round(my - (sxy / sxx) * mx, 6) AS intercept,
           round(sxy * sxy / (sxx * syy), 6) AS r2
    FROM c ORDER BY l_returnflag
"""


SQL_QUERIES["new_users_daily"] = q_new_users_daily


ORACLE_SQL["new_users_daily"] = """
    WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY 1),
    g AS (SELECT d, count(*) AS new_users FROM f GROUP BY d)
    SELECT strftime(d, '%Y-%m-%d') AS day, new_users,
           CAST(sum(new_users) OVER (ORDER BY d) AS BIGINT) AS cum_users
    FROM g ORDER BY day
"""


SQL_QUERIES["window_distinct_users"] = q_window_distinct_users


ORACLE_SQL["window_distinct_users"] = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           count(DISTINCT user_id) AS users,
           count(*) AS events
    FROM events GROUP BY 1 ORDER BY hour
"""


SQL_QUERIES["softdedup_weights"] = q_softdedup_weights


ORACLE_SQL["softdedup_weights"] = r"""
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(
                   (regexp_split_to_array(trim(text), '\s+'))[1:4], ' ')) AS h
        FROM documents
    ),
    sizes AS (SELECT h, count(*) AS sz FROM fp GROUP BY h)
    SELECT f.doc_id, s.sz AS fp_count, round(1.0 / s.sz, 6) AS weight
    FROM fp f JOIN sizes s USING (h) ORDER BY f.doc_id
"""


SQL_QUERIES["mi_lang_source"] = q_mi_lang_source


ORACLE_SQL["mi_lang_source"] = """
    WITH cells AS (
        SELECT lang, source, count(*)::DOUBLE AS c FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT sum(c) AS n FROM cells),
    rl AS (SELECT lang, sum(c) AS cl FROM cells GROUP BY lang),
    cm AS (SELECT source, sum(c) AS cs FROM cells GROUP BY source),
    terms AS (
        SELECT cells.lang, cells.source,
               (c / n) * ln((c * n) / (cl * cs)) AS term
        FROM cells CROSS JOIN tot
        JOIN rl USING (lang) JOIN cm USING (source)
    )
    SELECT (SELECT count(*) FROM cells) AS n_cells,
           (SELECT CAST(n AS BIGINT) FROM tot) AS n_docs,
           round(sum(term ORDER BY lang, source), 9) AS mi_nats
    FROM terms
"""


SQL_QUERIES["quality_blend"] = q_quality_blend


ORACLE_SQL["quality_blend"] = r"""
    WITH t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    u AS (
        SELECT doc_id, count(DISTINCT w) / count(*)::DOUBLE AS uniq
        FROM t GROUP BY doc_id
    ),
    b AS (
        SELECT d.doc_id,
               percent_rank() OVER (ORDER BY d.n_chars) AS p1,
               percent_rank() OVER (ORDER BY u.uniq) AS p2
        FROM documents d JOIN u USING (doc_id)
    )
    SELECT doc_id, round(0.5 * p1 + 0.5 * p2, 6) AS blend,
           CASE WHEN round(0.5 * p1 + 0.5 * p2, 6) >= 0.5 THEN 1 ELSE 0 END AS keep
    FROM b ORDER BY doc_id
"""


SQL_QUERIES["skipgram_counts"] = q_skipgram_counts


ORACLE_SQL["skipgram_counts"] = r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(range(1, len(regexp_split_to_array(trim(text), '\s+')) + 1))
                   AS pos,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    )
    SELECT a.w AS w1, b.w AS w2, count(*) AS cnt
    FROM tok a JOIN tok b
      ON a.doc_id = b.doc_id AND (b.pos - a.pos) IN (1, 2)
    GROUP BY 1, 2
    ORDER BY cnt DESC, w1, w2 LIMIT 50
"""


SQL_QUERIES["kmeans_lloyd"] = q_kmeans_lloyd


ORACLE_SQL["kmeans_lloyd"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    c0 AS (SELECT vec_id AS cid, x AS cx FROM e WHERE vec_id < 4),
    d AS (
        SELECT vec_id,
               unnest(range(1, len(x) + 1)) AS dim,
               unnest(x) AS v
        FROM e
    ),
    a1 AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_distance(e.x, c.cx), c.cid) AS rn
            FROM e CROSS JOIN c0 c
        ) WHERE rn = 1
    ),
    u1 AS (
        SELECT a1.cid, d.dim, round(sum(d.v) / count(*), 6) AS cv
        FROM d JOIN a1 USING (vec_id) GROUP BY 1, 2
    ),
    c1 AS (SELECT cid, list(cv ORDER BY dim) AS cx FROM u1 GROUP BY cid),
    a2 AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_distance(e.x, c.cx), c.cid) AS rn
            FROM e CROSS JOIN c1 c
        ) WHERE rn = 1
    ),
    u2 AS (
        SELECT a2.cid, d.dim, round(sum(d.v) / count(*), 6) AS cv
        FROM d JOIN a2 USING (vec_id) GROUP BY 1, 2
    )
    SELECT cid AS cluster, dim, cv AS c FROM u2 ORDER BY cluster, dim
"""


SQL_QUERIES["welch_ttest"] = q_welch_ttest


ORACLE_SQL["welch_ttest"] = """
    WITH m AS (
        SELECT event_type, user_id % 2 AS g,
               count(*) AS n, sum(value) / count(*) AS mu
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT e.event_type, e.user_id % 2 AS g,
               sum((e.value - m.mu) * (e.value - m.mu)) AS ss
        FROM events e JOIN m ON e.event_type = m.event_type AND e.user_id % 2 = m.g
        GROUP BY 1, 2
    ),
    p AS (
        SELECT m.event_type,
               max(CASE WHEN m.g = 0 THEN m.n END) AS n_a,
               max(CASE WHEN m.g = 1 THEN m.n END) AS n_b,
               max(CASE WHEN m.g = 0 THEN m.mu END) AS mu_a,
               max(CASE WHEN m.g = 1 THEN m.mu END) AS mu_b,
               max(CASE WHEN m.g = 0 THEN c.ss END) AS ss_a,
               max(CASE WHEN m.g = 1 THEN c.ss END) AS ss_b
        FROM m JOIN c ON m.event_type = c.event_type AND m.g = c.g
        GROUP BY m.event_type
    ),
    v AS (
        SELECT event_type, n_a, n_b, mu_a, mu_b,
               CASE WHEN n_a > 1 THEN ss_a / (n_a - 1) END AS va,
               CASE WHEN n_b > 1 THEN ss_b / (n_b - 1) END AS vb
        FROM p
    ),
    w AS (
        SELECT event_type, n_a, n_b,
               (mu_a - mu_b) / sqrt(va / n_a + vb / n_b) AS t,
               (va / n_a + vb / n_b) * (va / n_a + vb / n_b)
                   / ((va / n_a) * (va / n_a) / (n_a - 1)
                      + (vb / n_b) * (vb / n_b) / (n_b - 1)) AS df
        FROM v
    )
    SELECT event_type, n_a, n_b, round(t, 6) AS t, round(df, 4) AS df
    FROM w ORDER BY event_type
"""


SQL_QUERIES["topic_purity"] = q_topic_purity


ORACLE_SQL["topic_purity"] = """
    WITH c AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cx FROM embeddings WHERE vec_id < 8
    ),
    a AS (
        SELECT vec_id, cid AS cluster FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_distance(e.embedding::DOUBLE[], c.cx),
                                               c.cid) AS rn
            FROM embeddings e CROSS JOIN c
        ) WHERE rn = 1
    ),
    cells AS (
        SELECT a.cluster, emb.label, count(*) AS cnt
        FROM a JOIN embeddings emb USING (vec_id) GROUP BY 1, 2
    ),
    tot AS (SELECT cluster, sum(cnt) AS n FROM cells GROUP BY cluster),
    top AS (
        SELECT cluster, label, cnt,
               row_number() OVER (PARTITION BY cluster ORDER BY cnt DESC, label) AS rn
        FROM cells
    )
    SELECT t.cluster, CAST(tot.n AS BIGINT) AS n, t.label AS top_label,
           round(t.cnt / tot.n, 6) AS purity
    FROM top t JOIN tot USING (cluster) WHERE t.rn = 1 ORDER BY t.cluster
"""


SQL_QUERIES["silhouette_simplified"] = q_silhouette_simplified


ORACLE_SQL["silhouette_simplified"] = """
    WITH c AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cx FROM embeddings WHERE vec_id < 8
    ),
    d AS (
        SELECT e.vec_id, c.cid,
               list_distance(e.embedding::DOUBLE[], c.cx) AS d,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.embedding::DOUBLE[], c.cx),
                                           c.cid) AS rn
        FROM embeddings e CROSS JOIN c
    ),
    ab AS (
        SELECT vec_id,
               max(CASE WHEN rn = 1 THEN cid END) AS cluster,
               max(CASE WHEN rn = 1 THEN d END) AS a,
               max(CASE WHEN rn = 2 THEN d END) AS b
        FROM d GROUP BY vec_id
    ),
    s AS (
        SELECT cluster,
               CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b) END AS s
        FROM ab
    )
    SELECT cluster, count(*) AS n, round(sum(s) / count(*), 6) AS mean_silhouette
    FROM s GROUP BY cluster ORDER BY cluster
"""


SQL_QUERIES["lsh_bucket_histogram"] = q_lsh_bucket_histogram


SQL_QUERIES["rate_limit_offenders"] = q_rate_limit_offenders


ORACLE_SQL["rate_limit_offenders"] = """
    WITH h AS (
        SELECT user_id, date_trunc('hour', ts) AS hh, count(*) AS cnt
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, max(cnt) AS peak_hourly, CAST(sum(cnt) AS BIGINT) AS total_events
    FROM h GROUP BY user_id HAVING max(cnt) >= 2 ORDER BY user_id
"""


ORACLE_SQL["lsh_bucket_histogram"] = (
    f"WITH {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        ),
        sizes AS (
            SELECT band_id, bucket, count(*) AS sz FROM band GROUP BY 1, 2
        )
        SELECT sz AS bucket_size, count(*) AS n_buckets
        FROM sizes GROUP BY sz ORDER BY bucket_size"""
)


SQL_QUERIES["degree_assortativity"] = q_degree_assortativity


ORACLE_SQL["degree_assortativity"] = f"""
    WITH edges AS ({EDGES_SQL}),
    deg AS (
        SELECT node, count(*) AS degree FROM (
            SELECT DISTINCT node, neighbor FROM (
                SELECT src AS node, dst AS neighbor FROM edges WHERE src <> dst
                UNION ALL
                SELECT dst AS node, src AS neighbor FROM edges WHERE src <> dst
            )
        ) GROUP BY node
    ),
    pairs AS (
        SELECT da.degree::DOUBLE AS x, db.degree::DOUBLE AS y
        FROM edges e
        JOIN deg da ON e.src = da.node
        JOIN deg db ON e.dst = db.node
        WHERE e.src <> e.dst
    ),
    m AS (
        SELECT count(*) AS n, sum(x) / count(*) AS mx, sum(y) / count(*) AS my
        FROM pairs
    ),
    c AS (
        SELECT sum((x - mx) * (x - mx)) AS sxx,
               sum((y - my) * (y - my)) AS syy,
               sum((x - mx) * (y - my)) AS sxy
        FROM pairs CROSS JOIN m
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM m) AS n_edges,
           round(sxy / sqrt(sxx * syy), 6) AS assortativity
    FROM c
"""


SQL_QUERIES["session_stats"] = q_session_stats


SQL_QUERIES["redirect_depth_histogram"] = q_redirect_depth_histogram


ORACLE_SQL["redirect_depth_histogram"] = """
    SELECT doc_id % 7 AS hops, count(*) AS n_urls
    FROM documents GROUP BY 1 ORDER BY hops
"""


SQL_QUERIES["quality_token_tradeoff"] = q_quality_token_tradeoff


ORACLE_SQL["quality_token_tradeoff"] = r"""
    WITH t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    u AS (
        SELECT doc_id, count(DISTINCT w) / count(*)::DOUBLE AS uniq,
               count(*) AS n_tok
        FROM t GROUP BY doc_id
    ),
    b AS (
        SELECT d.doc_id, u.n_tok,
               round(0.5 * percent_rank() OVER (ORDER BY d.n_chars)
                     + 0.5 * percent_rank() OVER (ORDER BY u.uniq), 6) AS blend
        FROM documents d JOIN u USING (doc_id)
    )
    SELECT least(CAST(floor(blend * 10) AS BIGINT), 9) AS decile,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM b GROUP BY 1 ORDER BY decile
"""


ORACLE_SQL["session_stats"] = """
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_id
        FROM o
    ),
    sess AS (
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_id
    )
    SELECT n_events, count(*) AS n_sessions,
           round((CAST(sum(date_diff('microsecond', session_start, session_end))
                       AS DOUBLE) / count(*)) / 1000000.0, 6) AS mean_duration_s
    FROM sess GROUP BY n_events ORDER BY n_events
"""


SQL_QUERIES["association_rules"] = q_association_rules


ORACLE_SQL["association_rules"] = """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT count(DISTINCT user_id)::DOUBLE AS nu FROM events),
    tc AS (SELECT event_type, count(*)::DOUBLE AS c FROM ut GROUP BY 1),
    p AS (
        SELECT a.event_type AS t_a, b.event_type AS t_b, count(*)::DOUBLE AS c
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT t_a, t_b, CAST(p.c AS BIGINT) AS n_both,
           round(p.c / nu, 6) AS support,
           round(p.c / ca.c, 6) AS confidence,
           round((p.c * nu) / (ca.c * cb.c), 6) AS lift
    FROM p CROSS JOIN n
    JOIN tc ca ON ca.event_type = p.t_a
    JOIN tc cb ON cb.event_type = p.t_b
    ORDER BY t_a, t_b
"""


SQL_QUERIES["trimmed_mean"] = q_trimmed_mean


ORACLE_SQL["trimmed_mean"] = """
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(sum(value) / count(*), 6) AS trimmed_mean
    FROM ranked
    WHERE r > floor(0.05 * n) AND r <= n - floor(0.05 * n)
    GROUP BY event_type ORDER BY event_type
"""


SQL_QUERIES["quality_grid"] = q_quality_grid


ORACLE_SQL["quality_grid"] = r"""
    WITH t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    u AS (
        SELECT doc_id, count(DISTINCT w) / count(*)::DOUBLE AS uniq
        FROM t GROUP BY doc_id
    )
    SELECT least(d.n_chars // 100, 9) AS len_bin,
           least(CAST(floor(u.uniq * 10) AS BIGINT), 9) AS uniq_bin,
           count(*) AS n_docs
    FROM documents d JOIN u USING (doc_id)
    GROUP BY 1, 2 ORDER BY len_bin, uniq_bin
"""


SQL_QUERIES["stationary_distribution"] = q_stationary_distribution


ORACLE_SQL["stationary_distribution"] = """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    cells AS (
        SELECT event_type AS from_type, nxt AS to_type, count(*) AS cnt
        FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    ),
    tot AS (SELECT from_type, sum(cnt) AS n FROM cells GROUP BY from_type),
    p AS (
        SELECT c.from_type, c.to_type, round(c.cnt / t.n, 6) AS p
        FROM cells c JOIN tot t USING (from_type)
    ),
    k AS (SELECT count(DISTINCT event_type)::DOUBLE AS k FROM events),
    v0 AS (
        SELECT event_type, 1.0 / k.k AS v
        FROM (SELECT DISTINCT from_type AS event_type FROM p
              UNION SELECT DISTINCT to_type FROM p) CROSS JOIN k
    ),
    v1 AS (
        SELECT p.to_type AS event_type, sum(v0.v * p.p ORDER BY p.from_type) AS v
        FROM v0 JOIN p ON v0.event_type = p.from_type GROUP BY p.to_type
    ),
    v2 AS (
        SELECT p.to_type AS event_type, sum(v1.v * p.p ORDER BY p.from_type) AS v
        FROM v1 JOIN p ON v1.event_type = p.from_type GROUP BY p.to_type
    ),
    v3 AS (
        SELECT p.to_type AS event_type, sum(v2.v * p.p ORDER BY p.from_type) AS v
        FROM v2 JOIN p ON v2.event_type = p.from_type GROUP BY p.to_type
    )
    SELECT event_type, round(v, 9) AS v FROM v3 ORDER BY event_type
"""


SQL_QUERIES["ipf_raking"] = q_ipf_raking


ORACLE_SQL["ipf_raking"] = """
    WITH cells AS (
        SELECT lang, source, count(*)::DOUBLE AS w FROM documents GROUP BY 1, 2
    ),
    tgt AS (
        SELECT (SELECT count(*)::DOUBLE FROM documents)
                   / (SELECT count(DISTINCT lang)::DOUBLE FROM documents) AS rt,
               (SELECT count(*)::DOUBLE FROM documents)
                   / (SELECT count(DISTINCT source)::DOUBLE FROM documents) AS ct
    ),
    rs1 AS (SELECT lang, sum(w ORDER BY source) AS s FROM cells GROUP BY lang),
    r1 AS (
        SELECT c.lang, c.source, c.w * (tgt.rt / rs1.s) AS w
        FROM cells c JOIN rs1 USING (lang) CROSS JOIN tgt
    ),
    cs1 AS (SELECT source, sum(w ORDER BY lang) AS s FROM r1 GROUP BY source),
    c1 AS (
        SELECT r.lang, r.source, r.w * (tgt.ct / cs1.s) AS w
        FROM r1 r JOIN cs1 USING (source) CROSS JOIN tgt
    ),
    rs2 AS (SELECT lang, sum(w ORDER BY source) AS s FROM c1 GROUP BY lang),
    r2 AS (
        SELECT c.lang, c.source, c.w * (tgt.rt / rs2.s) AS w
        FROM c1 c JOIN rs2 USING (lang) CROSS JOIN tgt
    ),
    cs2 AS (SELECT source, sum(w ORDER BY lang) AS s FROM r2 GROUP BY source),
    c2 AS (
        SELECT r.lang, r.source, r.w * (tgt.ct / cs2.s) AS w
        FROM r2 r JOIN cs2 USING (source) CROSS JOIN tgt
    )
    SELECT lang, source, round(w, 6) AS weight FROM c2 ORDER BY lang, source
"""


SQL_QUERIES["rrf_fusion"] = q_rrf_fusion


ORACLE_SQL["rrf_fusion"] = r"""
    WITH t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    u AS (
        SELECT doc_id, count(DISTINCT w) / count(*)::DOUBLE AS uniq
        FROM t GROUP BY doc_id
    ),
    r AS (
        SELECT d.doc_id,
               row_number() OVER (ORDER BY d.n_chars DESC, d.doc_id) AS r1,
               row_number() OVER (ORDER BY u.uniq DESC, d.doc_id) AS r2
        FROM documents d JOIN u USING (doc_id)
    )
    SELECT doc_id, r1, r2,
           round(1.0 / (60 + r1) + 1.0 / (60 + r2), 9) AS rrf
    FROM r ORDER BY rrf DESC, doc_id LIMIT 100
"""


SQL_QUERIES["chi2_lang_source"] = q_chi2_lang_source


ORACLE_SQL["chi2_lang_source"] = """
    WITH cells AS (
        SELECT lang, source, count(*)::DOUBLE AS c FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT sum(c) AS n FROM cells),
    rl AS (SELECT lang, sum(c) AS cl FROM cells GROUP BY lang),
    cm AS (SELECT source, sum(c) AS cs FROM cells GROUP BY source),
    terms AS (
        SELECT cells.lang, cells.source,
               (c - cl * cs / n) * (c - cl * cs / n) / (cl * cs / n) AS term
        FROM cells CROSS JOIN tot
        JOIN rl USING (lang) JOIN cm USING (source)
    )
    SELECT (SELECT count(*) FROM cells) AS n_cells,
           (SELECT CAST((count(DISTINCT lang) - 1)
                        * (count(DISTINCT source) - 1) AS BIGINT)
            FROM documents) AS dof,
           round(sum(term ORDER BY lang, source), 6) AS chi2
    FROM terms
"""


SQL_QUERIES["clustering_coefficient"] = q_clustering_coefficient


ORACLE_SQL["clustering_coefficient"] = """
    WITH e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    und AS (
        SELECT src AS node, dst AS neighbor FROM e WHERE src <> dst
        UNION ALL
        SELECT dst AS node, src AS neighbor FROM e WHERE src <> dst
    ),
    deg AS (SELECT node, count(DISTINCT neighbor) AS d FROM und GROUP BY node),
    w AS (SELECT node, d * (d - 1) // 2 AS wedges FROM deg),
    ue AS (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM e WHERE src <> dst
    ),
    tri AS (
        SELECT a.u AS x, a.v AS y, b.v AS z
        FROM ue a
        JOIN ue b ON b.u = a.v
        JOIN ue c ON c.u = a.u AND c.v = b.v
    ),
    t AS (
        SELECT node, count(*) AS triangles
        FROM (SELECT unnest([x, y, z]) AS node FROM tri) GROUP BY node
    )
    SELECT w.node, w.wedges, coalesce(t.triangles, 0) AS triangles,
           round(coalesce(t.triangles, 0) / w.wedges, 6) AS clustering
    FROM w LEFT JOIN t USING (node)
    WHERE w.wedges > 0 ORDER BY w.node
"""


SQL_QUERIES["score_calibration"] = q_score_calibration


ORACLE_SQL["score_calibration"] = (
    "WITH gq AS (" + ORACLE_SQL["gopher_quality"] + r"""),
    t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    u AS (
        SELECT doc_id, count(DISTINCT w) / count(*)::DOUBLE AS uniq
        FROM t GROUP BY doc_id
    ),
    b AS (
        SELECT d.doc_id,
               round(0.5 * percent_rank() OVER (ORDER BY d.n_chars)
                     + 0.5 * percent_rank() OVER (ORDER BY u.uniq), 6) AS blend
        FROM documents d JOIN u USING (doc_id)
    )
    SELECT least(CAST(floor(b.blend * 10) AS BIGINT), 9) AS decile,
           CAST(sum(gq.keep) AS BIGINT) AS keeps,
           count(*) AS n,
           round(sum(gq.keep) / count(*), 6) AS keep_rate
    FROM b JOIN gq USING (doc_id)
    GROUP BY 1 ORDER BY decile
"""
)


SQL_QUERIES["anova_f"] = q_anova_f


ORACLE_SQL["anova_f"] = """
    WITH g AS (
        SELECT lang, count(*) AS n, sum(n_chars) / count(*) AS mu
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT sum(n)::DOUBLE AS n, count(*) AS k,
               (SELECT sum(n_chars)::DOUBLE FROM documents) / sum(n)::DOUBLE
                   AS grand
        FROM g
    ),
    w AS (
        SELECT sum((d.n_chars - g.mu) * (d.n_chars - g.mu)) AS ssw
        FROM documents d JOIN g USING (lang)
    ),
    b AS (
        SELECT sum(g.n * (g.mu - tot.grand) * (g.mu - tot.grand)
                   ORDER BY g.lang) AS ssb
        FROM g CROSS JOIN tot
    )
    SELECT tot.k, CAST(tot.n AS BIGINT) AS n,
           round(b.ssb, 4) AS ssb, round(w.ssw, 4) AS ssw,
           round((b.ssb / (tot.k - 1)) / (w.ssw / (tot.n - tot.k)), 6) AS f
    FROM tot CROSS JOIN w CROSS JOIN b
"""


SQL_QUERIES["avg_path_length"] = q_avg_path_length


ORACLE_SQL["avg_path_length"] = """
    WITH RECURSIVE e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    adj AS (
        SELECT src AS a, dst AS b FROM e WHERE src <> dst
        UNION
        SELECT dst, src FROM e WHERE src <> dst
    ),
    bfs AS (
        SELECT s AS src, s AS node, 0 AS dist
        FROM (SELECT unnest([0, 1, 2, 3, 4]) AS s)
        UNION
        SELECT bfs.src, adj.b, bfs.dist + 1
        FROM bfs JOIN adj ON adj.a = bfs.node
        WHERE bfs.dist < 3
    ),
    md AS (SELECT src, node, min(dist) AS dist FROM bfs GROUP BY src, node)
    SELECT src, count(*) AS n_reached,
           round(sum(dist)::DOUBLE / count(*), 6) AS avg_dist
    FROM md WHERE node <> src GROUP BY src ORDER BY src
"""


SQL_QUERIES["lsh_recall_curve"] = q_lsh_recall_curve


ORACLE_SQL["lsh_recall_curve"] = (
    "WITH jp AS (" + ORACLE_SQL["jaccard_pairs"] + """),
    c AS (
        SELECT doc_a, doc_b, jaccard,
               1.0 - (jaccard * jaccard * jaccard * jaccard) AS q
        FROM jp
    ),
    c2 AS (SELECT doc_a, doc_b, jaccard, q * q AS q FROM c),
    c4 AS (SELECT doc_a, doc_b, jaccard, q * q AS q FROM c2),
    c8 AS (SELECT doc_a, doc_b, jaccard, q * q AS q FROM c4),
    c16 AS (SELECT doc_a, doc_b, jaccard, q * q AS q FROM c8)
    SELECT doc_a, doc_b, jaccard, round(1.0 - q, 6) AS p_candidate
    FROM c16 ORDER BY doc_a
"""
)


SQL_QUERIES["trigram_transitions"] = q_trigram_transitions


ORACLE_SQL["trigram_transitions"] = """
    WITH seq AS (
        SELECT user_id, event_type AS t1,
               lead(event_type, 1) OVER w AS t2,
               lead(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3, count(*) AS cnt
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY cnt DESC, t1, t2, t3 LIMIT 25
"""


SQL_QUERIES["decayed_user_scores"] = q_decayed_user_scores


ORACLE_SQL["decayed_user_scores"] = """
    WITH h AS (SELECT max(ts) AS horizon FROM events),
    d AS (
        SELECT user_id,
               value * exp(ln(2.0) * (-(date_diff('microsecond', ts, h.horizon)
                                        / 86400000000.0) / 7.0)) AS s
        FROM events CROSS JOIN h
    )
    SELECT user_id, round(sum(s), 6) AS score
    FROM d GROUP BY user_id
    ORDER BY score DESC, user_id LIMIT 100
"""


SQL_QUERIES["touch_attribution"] = q_touch_attribution


ORACLE_SQL["touch_attribution"] = """
    WITH u AS (
        SELECT user_id,
               first(event_type ORDER BY ts, event_id) AS first_type,
               last(event_type ORDER BY ts, event_id) AS last_type,
               sum(CAST(round(value, 2) * 100 AS BIGINT)) AS cents
        FROM events GROUP BY user_id
    ),
    f AS (SELECT first_type AS event_type, sum(cents) AS fc FROM u GROUP BY 1),
    l AS (SELECT last_type AS event_type, sum(cents) AS lc FROM u GROUP BY 1)
    SELECT coalesce(f.event_type, l.event_type) AS event_type,
           round(coalesce(f.fc, 0) / 100.0, 2) AS first_touch_value,
           round(coalesce(l.lc, 0) / 100.0, 2) AS last_touch_value
    FROM f FULL OUTER JOIN l ON f.event_type = l.event_type
    ORDER BY event_type
"""


SQL_QUERIES["scc_pivot"] = q_scc_pivot


ORACLE_SQL["scc_pivot"] = """
    WITH RECURSIVE e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    fwd AS (
        SELECT 0 AS node
        UNION
        SELECT e.dst FROM fwd JOIN e ON e.src = fwd.node
    ),
    bwd AS (
        SELECT 0 AS node
        UNION
        SELECT e.src FROM bwd JOIN e ON e.dst = bwd.node
    ),
    scc AS (SELECT fwd.node FROM fwd JOIN bwd USING (node))
    SELECT node, (SELECT count(*) FROM scc) AS scc_size
    FROM scc ORDER BY node
"""


SQL_QUERIES["bowtie"] = q_bowtie


ORACLE_SQL["bowtie"] = """
    WITH RECURSIVE e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS node FROM range(0, 50) t(i)),
    fwd AS (
        SELECT 0 AS node
        UNION
        SELECT e.dst FROM fwd JOIN e ON e.src = fwd.node
    ),
    bwd AS (
        SELECT 0 AS node
        UNION
        SELECT e.src FROM bwd JOIN e ON e.dst = bwd.node
    ),
    lab AS (
        SELECT n.node,
               CASE
                   WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'core'
                   WHEN b.node IS NOT NULL THEN 'in'
                   WHEN f.node IS NOT NULL THEN 'out'
                   ELSE 'other'
               END AS part
        FROM nodes n
        LEFT JOIN fwd f ON f.node = n.node
        LEFT JOIN bwd b ON b.node = n.node
    )
    SELECT node, part, count(*) OVER (PARTITION BY part) AS part_size
    FROM lab ORDER BY node
"""


SQL_QUERIES["grouped_mode"] = q_grouped_mode


ORACLE_SQL["grouped_mode"] = """
    WITH c AS (
        SELECT event_type, round(value, 1) AS v, count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, v, cnt,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, v) AS rn
        FROM c
    )
    SELECT event_type, v AS mode_value, cnt AS mode_count
    FROM r WHERE rn = 1 ORDER BY event_type
"""


SQL_QUERIES["hourly_autocorr"] = q_hourly_autocorr


ORACLE_SQL["hourly_autocorr"] = """
    WITH h AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
               count(*)::DOUBLE AS c
        FROM events GROUP BY 1
    ),
    l AS (
        SELECT c AS y, lag(c) OVER (ORDER BY hour) AS x FROM h
    ),
    p AS (SELECT x, y FROM l WHERE x IS NOT NULL),
    m AS (SELECT count(*) AS n, sum(x) / count(*) AS mx, sum(y) / count(*) AS my
          FROM p),
    c AS (
        SELECT sum((x - mx) * (x - mx)) AS sxx,
               sum((y - my) * (y - my)) AS syy,
               sum((x - mx) * (y - my)) AS sxy
        FROM p CROSS JOIN m
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM m) AS n_pairs,
           round(sxy / sqrt(sxx * syy), 6) AS lag1_autocorr
    FROM c
"""


SQL_QUERIES["weighted_median"] = q_weighted_median


ORACLE_SQL["weighted_median"] = """
    WITH w AS (
        SELECT event_type, event_id, value,
               CAST(round(value, 2) * 100 AS BIGINT) AS cw
        FROM events
    ),
    r AS (
        SELECT event_type, value,
               sum(cw) OVER (PARTITION BY event_type
                             ORDER BY value, event_id
                             ROWS UNBOUNDED PRECEDING) AS run,
               (sum(cw) OVER (PARTITION BY event_type) + 1) // 2 AS tgt
        FROM w
    ),
    hit AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY run) AS rn
        FROM r WHERE run >= tgt
    )
    SELECT event_type, value AS weighted_median
    FROM hit WHERE rn = 1 ORDER BY event_type
"""


SQL_QUERIES["kmeans_inertia"] = q_kmeans_inertia


ORACLE_SQL["kmeans_inertia"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    d AS (
        SELECT e.vec_id, c.vec_id AS cid,
               list_distance(e.x, c.x) * list_distance(e.x, c.x) AS d2
        FROM e CROSS JOIN e c WHERE c.vec_id < 8
    ),
    best AS (
        SELECT k.k, d.vec_id, min(d.d2) AS d2
        FROM (SELECT unnest([2, 4, 8]) AS k) k
        JOIN d ON d.cid < k.k
        GROUP BY k.k, d.vec_id
    )
    SELECT k, round(sum(d2), 4) AS inertia
    FROM best GROUP BY k ORDER BY k
"""


SQL_QUERIES["proportion_ztest"] = q_proportion_ztest


ORACLE_SQL["proportion_ztest"] = (
    "WITH gq AS (" + ORACLE_SQL["gopher_quality"] + """),
    cells AS (
        SELECT d.source, sum(gq.keep)::DOUBLE AS keeps, count(*)::DOUBLE AS n
        FROM documents d JOIN gq USING (doc_id) GROUP BY d.source
    ),
    ranked AS (
        SELECT source, keeps, n,
               row_number() OVER (ORDER BY n DESC, source) AS rn
        FROM cells
    ),
    ab AS (
        SELECT max(CASE WHEN rn = 1 THEN source END) AS source_a,
               max(CASE WHEN rn = 2 THEN source END) AS source_b,
               max(CASE WHEN rn = 1 THEN keeps END) AS ka,
               max(CASE WHEN rn = 2 THEN keeps END) AS kb,
               max(CASE WHEN rn = 1 THEN n END) AS na,
               max(CASE WHEN rn = 2 THEN n END) AS nb
        FROM ranked WHERE rn <= 2
    )
    SELECT source_a, source_b,
           round(ka / na, 6) AS p_a,
           round(kb / nb, 6) AS p_b,
           round((ka / na - kb / nb)
                 / sqrt(((ka + kb) / (na + nb)) * (1.0 - (ka + kb) / (na + nb))
                        * (1.0 / na + 1.0 / nb)), 6) AS z
    FROM ab
"""
)


SQL_QUERIES["pack_stats"] = q_pack_stats


ORACLE_SQL["pack_stats"] = (
    "WITH pk AS (" + ORACLE_SQL["pack_sequences"] + """),
    seqs AS (SELECT seq_id, sum(n_tokens) AS tok FROM pk GROUP BY seq_id)
    SELECT count(*) AS n_seqs,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           CAST(min(tok) AS BIGINT) AS min_fill,
           CAST(max(tok) AS BIGINT) AS max_fill,
           round(sum(tok) / count(*), 6) AS mean_fill
    FROM seqs
"""
)


SQL_QUERIES["peak_concurrency"] = q_peak_concurrency

"""Registry part 2: ORACLE_SQL / SQL_QUERIES / NOSQL_QUERIES
entries in the monolith's original statement order."""

from __future__ import annotations

from .common import *  # noqa: F401,F403
from .registry_p01 import NOSQL_QUERIES  # noqa: F401
from .registry_p01 import ORACLE_SQL  # noqa: F401
from .registry_p01 import SQL_QUERIES  # noqa: F401
from .q_curation import (  # noqa: F401
    q_blocking_quality,
    q_depth_quality_decay,
    q_filter_ablation,
    q_perplexity_buckets,
)
from .q_dedup import (  # noqa: F401
    q_line_dedup,
)
from .q_etl import (  # noqa: F401
    q_readability,
)
from .q_graph import (  # noqa: F401
    q_attr_assortativity,
    q_betweenness,
    q_eccentricity,
    q_graph_components,
    q_katz_centrality,
    q_modularity,
    q_pagerank_convergence,
    q_pagerank_delta,
)
from .q_relational import (  # noqa: F401
    q_cube_agg,
    q_full_outer_join,
    q_interval_overlap_join,
    q_snapshot_drift,
    q_tpch_q10,
    q_tpch_q5,
)
from .q_similarity import (  # noqa: F401
    q_cosine_pairs,
    q_label_knn_accuracy,
    q_mann_kendall,
    q_mann_whitney,
    q_mutual_knn,
)
from .q_sketch import (  # noqa: F401
    q_bloom_fpr,
    q_count_min,
    q_hll_audit,
    q_hll_groups,
    q_kmv_sketch,
    q_misra_gries_heavy,
)
from .q_stats import (  # noqa: F401
    q_bootstrap_ci,
    q_closeness_harmonic,
    q_compression_ratio,
    q_covisitation,
    q_heaps_law,
    q_jaro_winkler_verify,
    q_length_gini,
    q_pareto_skyline,
    q_percentile_interp,
    q_term_burstiness,
    q_wasserstein_drift,
    q_winnowing,
)
from .q_stats_b import (  # noqa: F401
    q_acf_profile,
    q_adamic_adar,
    q_adjacent_lcp,
    q_ams_f2,
    q_benford_digits,
    q_bipartite_check,
    q_brier_decomposition,
    q_burrows_delta,
    q_cdc_chunks,
    q_cocitation,
    q_containment_pairs,
    q_cramers_v,
    q_cuped,
    q_cusum_changepoints,
    q_dau_mau,
    q_dow_seasonality,
    q_edit_journeys,
    q_event_dispersion,
    q_event_order_pairs,
    q_ewma_daily,
    q_feature_hash_collisions,
    q_funnel_conversion,
    q_gap_stats,
    q_hapax_ratio,
    q_hitting_time,
    q_holt_linear,
    q_hurst_exponent,
    q_info_gain,
    q_interarrival_burstiness,
    q_kaplan_meier,
    q_kcenter_greedy,
    q_kendall_tau,
    q_keyness_llr,
    q_knapsack_select,
    q_kruskal_wallis,
    q_ktruss_peel,
    q_late_arrivals,
    q_leaky_bucket_replay,
    q_lorenz_curve,
    q_mase_daily,
    q_mattr,
    q_mcnemar_gates,
    q_mmr_select,
    q_mojibake_screen,
    q_ndcg_eval,
    q_neyman_allocation,
    q_page_hinkley,
    q_persistent_items,
    q_pr_curve,
    q_psi_drift,
    q_quantile_normalize,
    q_rank_correlation,
    q_rbo_overlap,
    q_rich_club,
    q_roc_auc,
    q_runs_test,
    q_salsa,
    q_session_threshold_sweep,
    q_set_cover_greedy,
    q_shard_balance,
    q_simrank,
    q_soft404_screen,
    q_sorted_neighborhood,
    q_source_coverage_curve,
    q_spam_mass,
    q_sparsify_error,
    q_split_leakage,
    q_sq8_error,
    q_srm_check,
    q_theil_sen,
    q_triadic_closure,
    q_triplet_violation,
    q_trustrank,
    q_v_measure,
    q_walk_corpus,
    q_wilson_keep_ci,
    q_wl_refinement,
    q_yule_k,
)
from .q_stats_c import (  # noqa: F401
    q_bartlett_test,
    q_dirichlet_lm,
    q_err_eval,
    q_friedman_test,
    q_gains_chart,
    q_jarque_bera,
    q_log_rank_test,
    q_mcc_binary,
    q_odds_ratio_ci,
    q_periodogram,
    q_pettitt_test,
    q_rfm_segments,
    q_simpson_diversity,
    q_tukey_fences,
)
from .q_text import (  # noqa: F401
    q_chao1_vocab,
    q_entropy_rate,
    q_fightin_words,
    q_huffman_code_lengths,
    q_kwic,
    q_langid_kappa,
    q_langid_macro_f1,
    q_ngram_novelty,
    q_source_cross_entropy,
    q_stupid_backoff_logprob,
    q_vocab_js_drift,
    q_zipf_fit,
)


ORACLE_SQL["peak_concurrency"] = """
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
        SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_id
    ),
    ev2 AS (
        SELECT session_start AS ts, 1 AS delta, user_id, session_id FROM sess
        UNION ALL
        SELECT session_end, -1, user_id, session_id FROM sess
    ),
    r AS (
        SELECT ts,
               CAST(sum(delta) OVER (ORDER BY ts, delta DESC, user_id, session_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        FROM ev2
    ),
    p AS (SELECT max(run) AS peak FROM r)
    SELECT p.peak, (SELECT min(ts) FROM r WHERE run = p.peak) AS at_ts
    FROM p
"""


SQL_QUERIES["label_knn_accuracy"] = q_label_knn_accuracy


ORACLE_SQL["label_knn_accuracy"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x, label FROM embeddings),
    d AS (
        SELECT a.vec_id, a.label AS own, b.label AS nb,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY list_distance(a.x, b.x), b.vec_id) AS rn
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT count(*) AS n,
           CAST(sum(CASE WHEN own = nb THEN 1 ELSE 0 END) AS BIGINT) AS correct,
           round(sum(CASE WHEN own = nb THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6)
               AS accuracy
    FROM d WHERE rn = 1
"""


SQL_QUERIES["modularity"] = q_modularity


ORACLE_SQL["modularity"] = (
    "WITH lpa AS (" + ORACLE_SQL["lpa_communities"] + """),
    e0 AS (
        SELECT DISTINCT least(user_id % 50, (user_id * 13 + event_id) % 50) AS u,
                        greatest(user_id % 50, (user_id * 13 + event_id) % 50) AS v
        FROM events
        WHERE user_id % 50 <> (user_id * 13 + event_id) % 50
    ),
    m AS (SELECT count(*)::DOUBLE AS m FROM e0),
    lab AS (
        SELECT e0.u, e0.v, a.community AS cu, b.community AS cv
        FROM e0 JOIN lpa a ON a.node = e0.u JOIN lpa b ON b.node = e0.v
    ),
    inside AS (
        SELECT cu AS community, count(*)::DOUBLE AS ec
        FROM lab WHERE cu = cv GROUP BY cu
    ),
    degc AS (
        SELECT community, sum(dc)::DOUBLE AS dc FROM (
            SELECT cu AS community, count(*) AS dc FROM lab GROUP BY cu
            UNION ALL
            SELECT cv, count(*) FROM lab GROUP BY cv
        ) GROUP BY community
    ),
    terms AS (
        SELECT degc.community,
               coalesce(inside.ec, 0) / m.m
                   - (degc.dc / (2.0 * m.m)) * (degc.dc / (2.0 * m.m)) AS term
        FROM degc CROSS JOIN m LEFT JOIN inside USING (community)
    )
    SELECT (SELECT count(*) FROM terms) AS n_communities,
           (SELECT CAST(m AS BIGINT) FROM m) AS m_edges,
           round(sum(term ORDER BY community), 6) AS modularity
    FROM terms
"""
)


SQL_QUERIES["length_gini"] = q_length_gini


ORACLE_SQL["length_gini"] = """
    WITH h AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
    o AS (
        SELECT v, c,
               sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS a
        FROM h
    ),
    s AS (
        SELECT sum(v * (c * a + c * (c + 1) // 2)) AS S,
               sum(v * c) AS T, sum(c) AS n
        FROM o
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(2.0 * S / (n * T) - (n + 1.0) / n, 6) AS gini
    FROM s
"""


SQL_QUERIES["zipf_fit"] = q_zipf_fit


ORACLE_SQL["zipf_fit"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    v AS (
        SELECT token, count(*) AS cnt FROM w GROUP BY token
        ORDER BY cnt DESC, token LIMIT 100
    ),
    rk AS (
        SELECT ln(row_number() OVER (ORDER BY cnt DESC, token)) AS x,
               ln(cnt) AS y
        FROM v
    ),
    s AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM rk
    )
    SELECT CAST(n AS BIGINT) AS k,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) * sx) / n, 6)
               AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6) AS r2
    FROM s
"""


SQL_QUERIES["heaps_law"] = q_heaps_law


ORACLE_SQL["heaps_law"] = r"""
    WITH m AS (SELECT max(doc_id) AS md FROM documents),
    ck AS (SELECT i AS ckpt, (md * i) // 8 AS thr FROM m, range(1, 9) t(i)),
    toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    firsts AS (
        SELECT token, min(doc_id) AS fd
        FROM (SELECT doc_id, unnest(t) AS token FROM toks) w
        GROUP BY token
    ),
    ntok AS (SELECT doc_id, len(t) AS n FROM toks)
    SELECT CAST(ckpt AS BIGINT) AS ckpt,
           CAST(thr AS BIGINT) AS max_doc,
           (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM ntok
            WHERE doc_id <= thr) AS n_tokens,
           (SELECT CAST(count(*) AS BIGINT) FROM firsts
            WHERE fd <= thr) AS vocab
    FROM ck ORDER BY ckpt
"""


SQL_QUERIES["term_burstiness"] = q_term_burstiness


ORACLE_SQL["term_burstiness"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS token FROM toks),
    top AS (
        SELECT token FROM w GROUP BY token
        ORDER BY count(*) DESC, token LIMIT 30
    ),
    pc AS (
        SELECT token, doc_id, count(*) AS c FROM w
        WHERE token IN (SELECT token FROM top)
        GROUP BY token, doc_id
    ),
    s AS (SELECT token, sum(c) AS s1, sum(c * c) AS s2 FROM pc GROUP BY token),
    n AS (SELECT count(*) AS N FROM documents)
    SELECT token, CAST(s1 AS BIGINT) AS total,
           round(((s2 - s1 * s1 * 1.0 / N) / (N - 1)) / (s1 * 1.0 / N), 6)
               AS fano
    FROM s, n ORDER BY token
"""


SQL_QUERIES["winnowing"] = q_winnowing


ORACLE_SQL["winnowing"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, i AS pos,
               md5_number_lower(list_aggregate(t[i:i+2], 'string_agg', ' ')) AS h
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
    ),
    gm AS (SELECT doc_id, count(*) AS m FROM grams GROUP BY doc_id),
    wins AS (
        SELECT doc_id, unnest(generate_series(1, greatest(m - 3, 1))) AS s
        FROM gm
    ),
    sel AS (
        SELECT w.doc_id, g.pos, g.h,
               row_number() OVER (PARTITION BY w.doc_id, w.s
                                  ORDER BY g.h ASC, g.pos DESC) AS rn
        FROM wins w JOIN grams g
          ON g.doc_id = w.doc_id AND g.pos BETWEEN w.s AND w.s + 3
    )
    SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos,
           CAST(h % 1000000007 AS BIGINT) AS fp
    FROM sel WHERE rn = 1 ORDER BY doc_id, pos
"""


SQL_QUERIES["readability"] = q_readability


ORACLE_SQL["readability"] = r"""
    WITH f AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '\S+')) AS nw,
               len(regexp_extract_all(text, '[aeiou]+')) AS ns
        FROM documents
    )
    SELECT doc_id, CAST(nw AS BIGINT) AS n_words, CAST(ns AS BIGINT) AS n_syllables,
           CASE WHEN nw > 0 THEN round(ns * 1.0 / nw, 6) END AS syll_per_word,
           CASE WHEN nw > 0
                THEN round(0.39 * nw + 11.8 * (ns * 1.0 / nw) - 15.59, 6)
           END AS fk_grade
    FROM f ORDER BY doc_id
"""


SQL_QUERIES["pareto_skyline"] = q_pareto_skyline


ORACLE_SQL["pareto_skyline"] = r"""
    WITH f AS (
        SELECT doc_id, len(t) AS n_tokens,
               round(len(list_distinct(t)) * 1.0 / len(t), 6) AS uq
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
              FROM documents)
    )
    SELECT a.doc_id, CAST(a.n_tokens AS BIGINT) AS n_tokens, a.uq
    FROM f a
    WHERE NOT EXISTS (
        SELECT 1 FROM f b
        WHERE b.n_tokens >= a.n_tokens AND b.uq >= a.uq
          AND (b.n_tokens > a.n_tokens OR b.uq > a.uq)
    )
    ORDER BY a.doc_id
"""


SQL_QUERIES["langid_kappa"] = q_langid_kappa


ORACLE_SQL["langid_kappa"] = (
    "WITH pred AS (" + ORACLE_SQL["langid"] + """),
    cm AS (
        SELECT d.lang AS a, p.lang_pred AS b, count(*) AS c
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.lang_pred
    ),
    tot AS (SELECT sum(c) AS N FROM cm),
    diag AS (SELECT coalesce(sum(c) FILTER (a = b), 0) AS tr FROM cm),
    marg AS (
        SELECT coalesce(sum(r.s * col.s), 0) AS rc
        FROM (SELECT a AS k, sum(c) AS s FROM cm GROUP BY a) r
        JOIN (SELECT b AS k, sum(c) AS s FROM cm GROUP BY b) col USING (k)
    )
    SELECT CAST(N AS BIGINT) AS n,
           round((N * tr - rc) * 1.0 / nullif(N * N - rc, 0), 6) AS kappa
    FROM tot, diag, marg
"""
)


SQL_QUERIES["bootstrap_ci"] = q_bootstrap_ci


ORACLE_SQL["bootstrap_ci"] = r"""
    WITH v AS (
        SELECT n_chars, row_number() OVER (ORDER BY doc_id) - 1 AS r
        FROM documents
    ),
    nn AS (SELECT count(*) AS n FROM v),
    draws AS (
        SELECT b.i AS b,
               md5_number_lower(b.i || ':' || v.r) % nn.n AS r
        FROM range(0, 200) b(i), v, nn
    ),
    means AS (
        SELECT d.b, sum(v.n_chars) * 1.0 / count(*) AS m
        FROM draws d JOIN v USING (r) GROUP BY d.b
    ),
    ord AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM means)
    SELECT (SELECT round(sum(n_chars) * 1.0 / count(*), 6) FROM documents) AS mean,
           (SELECT round(m, 6) FROM ord WHERE rn = 5) AS lo,
           (SELECT round(m, 6) FROM ord WHERE rn = 195) AS hi
"""


NOSQL_QUERIES["betweenness"] = q_betweenness


SQL_QUERIES["mutual_knn"] = q_mutual_knn


ORACLE_SQL["mutual_knn"] = """
    WITH s AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    knn AS (
        SELECT va, vb, sim FROM s
        QUALIFY row_number() OVER (PARTITION BY va
                                   ORDER BY sim DESC, vb) <= 3
    )
    SELECT k1.va AS vec_a, k1.vb AS vec_b, round(k1.sim, 4) AS sim
    FROM knn k1 JOIN knn k2 ON k1.va = k2.vb AND k1.vb = k2.va
    WHERE k1.va < k1.vb ORDER BY vec_a, vec_b
"""


SQL_QUERIES["covisitation"] = q_covisitation


ORACLE_SQL["covisitation"] = """
    WITH ui AS (
        SELECT DISTINCT user_id, (user_id * 13 + event_id) % 50 AS item
        FROM events
    ),
    capped AS (
        SELECT user_id, item FROM ui
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY item) <= 20
    )
    SELECT a.item AS item_a, b.item AS item_b, count(*) AS co_users
    FROM capped a JOIN capped b
      ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY a.item, b.item HAVING count(*) >= 2
    ORDER BY item_a, item_b
"""


SQL_QUERIES["jaro_winkler_verify"] = q_jaro_winkler_verify


ORACLE_SQL["jaro_winkler_verify"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    v AS (
        SELECT token, row_number() OVER (ORDER BY count(*) DESC, token) AS rk
        FROM w GROUP BY token
        ORDER BY count(*) DESC, token LIMIT 100
    ),
    pairs AS (
        SELECT a.token AS tok_a, b.token AS tok_b
        FROM v a JOIN v b ON b.rk = a.rk + 1
        UNION ALL
        SELECT token, reverse(token) FROM v WHERE rk <= 20
    )
    SELECT tok_a, tok_b,
           round(jaro_winkler_similarity(tok_a, tok_b), 6) AS jw
    FROM pairs ORDER BY tok_a, tok_b
"""


SQL_QUERIES["entropy_rate"] = q_entropy_rate


ORACLE_SQL["entropy_rate"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    bg AS (
        SELECT t[i] AS x, t[i] || ' ' || t[i + 1] AS g
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ),
    bc AS (SELECT x, g, count(*) AS c FROM bg GROUP BY x, g),
    cx AS (SELECT x, sum(c) AS cx FROM bc GROUP BY x),
    tt AS (SELECT sum(c) AS T FROM bc),
    hr AS (
        SELECT -sum(bc.c * 1.0 / tt.T * ln(bc.c * 1.0 / cx.cx)) AS h
        FROM bc JOIN cx USING (x), tt
    ),
    un AS (
        SELECT token, count(*) AS c
        FROM (SELECT unnest(t) AS token FROM toks) GROUP BY token
    ),
    uu AS (SELECT sum(c) AS U FROM un),
    hu AS (SELECT -sum(un.c * 1.0 / uu.U * ln(un.c * 1.0 / uu.U)) AS h FROM un, uu)
    SELECT CAST(tt.T AS BIGINT) AS n_bigrams,
           round(hr.h, 6) AS entropy_rate,
           round(hu.h, 6) AS unigram_entropy
    FROM tt, hr, hu
"""


SQL_QUERIES["full_outer_join"] = q_full_outer_join


ORACLE_SQL["full_outer_join"] = """
    WITH a AS (
        SELECT o_custkey, count(*) AS cnt_a FROM orders
        WHERE o_orderkey % 7 = 0 GROUP BY o_custkey
    ),
    b AS (
        SELECT o_custkey, count(*) AS cnt_b FROM orders
        WHERE o_orderkey % 11 = 0 GROUP BY o_custkey
    )
    SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey, a.cnt_a, b.cnt_b
    FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
    ORDER BY o_custkey
"""


SQL_QUERIES["eccentricity"] = q_eccentricity


ORACLE_SQL["eccentricity"] = """
    WITH RECURSIVE e AS (
        SELECT DISTINCT a, b FROM (
            SELECT user_id % 50 AS a, (user_id * 13 + event_id) % 50 AS b
            FROM events
            UNION
            SELECT (user_id * 13 + event_id) % 50 AS a, user_id % 50 AS b
            FROM events
        ) WHERE a <> b
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    d(s, n, dist) AS (
        SELECT n AS s, n, 0 FROM nodes
        UNION
        SELECT d.s, e.b, d.dist + 1
        FROM d JOIN e ON e.a = d.n
        WHERE d.dist < 50
    ),
    md AS (SELECT s, n, min(dist) AS dist FROM d GROUP BY s, n)
    SELECT s AS node,
           CAST(coalesce(max(dist) FILTER (n <> s), 0) AS BIGINT) AS ecc,
           CAST(count(*) FILTER (n <> s) AS BIGINT) AS n_reachable
    FROM md GROUP BY s ORDER BY node
"""


SQL_QUERIES["katz_centrality"] = q_katz_centrality


ORACLE_SQL["katz_centrality"] = """
    WITH e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    r0 AS (SELECT n, 1.0 AS x FROM nodes),
    r1 AS (
        SELECT nodes.n,
               1.0 + 0.05 * coalesce(sum(r0.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r0 ON r0.n = e.src
        GROUP BY nodes.n
    ),
    r2 AS (
        SELECT nodes.n,
               1.0 + 0.05 * coalesce(sum(r1.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r1 ON r1.n = e.src
        GROUP BY nodes.n
    ),
    r3 AS (
        SELECT nodes.n,
               1.0 + 0.05 * coalesce(sum(r2.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r2 ON r2.n = e.src
        GROUP BY nodes.n
    )
    SELECT n AS node, round(x, 6) AS katz FROM r3 ORDER BY node
"""


SQL_QUERIES["closeness_harmonic"] = q_closeness_harmonic


ORACLE_SQL["closeness_harmonic"] = """
    WITH RECURSIVE e AS (
        SELECT DISTINCT a, b FROM (
            SELECT user_id % 50 AS a, (user_id * 13 + event_id) % 50 AS b
            FROM events
            UNION
            SELECT (user_id * 13 + event_id) % 50 AS a, user_id % 50 AS b
            FROM events
        ) WHERE a <> b
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    d(s, n, dist) AS (
        SELECT n AS s, n, 0 FROM nodes
        UNION
        SELECT d.s, e.b, d.dist + 1
        FROM d JOIN e ON e.a = d.n
        WHERE d.dist < 50
    ),
    md AS (SELECT s, n, min(dist) AS dist FROM d GROUP BY s, n)
    SELECT s AS node,
           coalesce(round(count(*) FILTER (n <> s) * 1.0
                          / nullif(sum(dist) FILTER (n <> s), 0), 6), 0.0)
               AS closeness,
           coalesce(round(sum(1.0 / dist) FILTER (n <> s), 6), 0.0) AS harmonic
    FROM md GROUP BY s ORDER BY node
"""


SQL_QUERIES["kwic"] = q_kwic


ORACLE_SQL["kwic"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    term AS (
        SELECT token FROM w GROUP BY token
        ORDER BY count(*) DESC, token LIMIT 1
    ),
    hits AS (
        SELECT doc_id, i AS pos, t
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i), term
        WHERE t[i] = term.token
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           coalesce(list_aggregate(t[greatest(1, pos - 2):pos - 1],
                                   'string_agg', ' '), '') AS left_ctx,
           coalesce(list_aggregate(t[pos + 1:pos + 2],
                                   'string_agg', ' '), '') AS right_ctx
    FROM hits ORDER BY doc_id, pos
"""


NOSQL_QUERIES["compression_ratio"] = q_compression_ratio


SQL_QUERIES["wasserstein_drift"] = q_wasserstein_drift


ORACLE_SQL["wasserstein_drift"] = """
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
               lead(o.v) OVER (PARTITION BY o.source ORDER BY o.v) AS nxt,
               sum(o.c) OVER (PARTITION BY o.source ORDER BY o.v) AS co,
               sum(g.cg) OVER (PARTITION BY o.source ORDER BY o.v) AS cumg
        FROM own o JOIN gv g USING (v)
    )
    SELECT c.source, CAST(any_value(t.n) AS BIGINT) AS n,
           round(sum(abs(c.co * 1.0 / t.n
                         - (c.cumg - c.co) * 1.0 / (gn.ng - t.n))
                     * (c.nxt - c.v)) FILTER (c.nxt IS NOT NULL), 4) AS w1
    FROM cum c JOIN tot t USING (source), gn
    GROUP BY c.source ORDER BY c.source
"""


SQL_QUERIES["pr_curve"] = q_pr_curve


ORACLE_SQL["pr_curve"] = r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               round(len(list_filter(toks, w -> w IN ('the','a','and','of','to')))
                     * 1.0 / len(toks), 4) AS sr
        FROM t
    ),
    w AS (SELECT doc_id, unnest(toks) AS w FROM t),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i+1])) AS g
        FROM t
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM gc GROUP BY doc_id),
    lab AS (
        SELECT ws.doc_id,
               CASE WHEN ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
                     AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
                    THEN 1 ELSE 0 END AS keep
        FROM ws LEFT JOIN tp USING (doc_id)
    ),
    j AS (SELECT s.sr, lab.keep FROM s JOIN lab USING (doc_id)),
    thr AS (SELECT i, i * 0.05 AS t FROM range(0, 13) r(i)),
    agg AS (
        SELECT thr.t,
               count(*) FILTER (j.sr >= thr.t)                  AS n_sel,
               count(*) FILTER (j.sr >= thr.t AND j.keep = 1)   AS n_tp,
               count(*) FILTER (j.keep = 1)                     AS n_pos
        FROM thr CROSS JOIN j GROUP BY thr.t
    )
    SELECT round(t, 2) AS thr,
           CAST(n_sel AS BIGINT) AS n_sel,
           round(n_tp * 1.0 / nullif(n_sel, 0), 6) AS prec,
           round(n_tp * 1.0 / nullif(n_pos, 0), 6) AS rec
    FROM agg ORDER BY thr
"""


SQL_QUERIES["hapax_ratio"] = q_hapax_ratio


ORACLE_SQL["hapax_ratio"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    vc AS (
        SELECT token, count(*) AS c
        FROM (SELECT unnest(t) AS token FROM toks) GROUP BY token
    ),
    s AS (
        SELECT count(*) AS v,
               count(*) FILTER (c = 1) AS h,
               sum(c) AS tk
        FROM vc
    )
    SELECT CAST(v AS BIGINT) AS vocab, CAST(h AS BIGINT) AS hapax,
           round(h * 1.0 / v, 6) AS hapax_vocab_frac,
           round(h * 1.0 / tk, 6) AS hapax_token_frac
    FROM s
"""


SQL_QUERIES["roc_auc"] = q_roc_auc


ORACLE_SQL["roc_auc"] = r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               round(len(list_filter(toks, w -> w IN ('the','a','and','of','to')))
                     * 1.0 / len(toks), 4) AS sr
        FROM t
    ),
    w AS (SELECT doc_id, unnest(toks) AS w FROM t),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i+1])) AS g
        FROM t
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM gc GROUP BY doc_id),
    lab AS (
        SELECT ws.doc_id,
               CASE WHEN ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
                     AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
                    THEN 1 ELSE 0 END AS keep
        FROM ws LEFT JOIN tp USING (doc_id)
    ),
    j AS (SELECT s.sr, lab.keep FROM s JOIN lab USING (doc_id)),
    h AS (
        SELECT sr AS v,
               count(*) FILTER (keep = 1) AS p,
               count(*) FILTER (keep = 0) AS q
        FROM j GROUP BY sr
    ),
    o AS (
        SELECT v, p, q,
               sum(p + q) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - (p + q) AS a
        FROM h
    ),
    f AS (
        SELECT sum(p * (2 * a + p + q + 1)) AS r2,
               sum(p) AS np, sum(q) AS nq
        FROM o
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nq AS BIGINT) AS n_neg,
           round((r2 - np * (np + 1)) * 1.0 / nullif(2 * np * nq, 0), 6) AS auc
    FROM f
"""


SQL_QUERIES["ngram_novelty"] = q_ngram_novelty


ORACLE_SQL["ngram_novelty"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    g AS (
        SELECT DISTINCT doc_id,
               list_aggregate(t[i:i+2], 'string_agg', ' ') AS gram
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
    ),
    tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
    fo AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY gram),
    own AS (SELECT fd AS doc_id, count(*) AS n_novel FROM fo GROUP BY fd)
    SELECT t.doc_id, t.n_grams,
           CAST(coalesce(o.n_novel, 0) AS BIGINT) AS n_novel,
           round(coalesce(o.n_novel, 0) * 1.0 / t.n_grams, 6) AS novelty
    FROM tot t LEFT JOIN own o USING (doc_id)
    ORDER BY t.doc_id
"""


SQL_QUERIES["ewma_daily"] = q_ewma_daily


ORACLE_SQL["ewma_daily"] = """
    WITH RECURSIVE d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    r AS (SELECT day, n, row_number() OVER (ORDER BY day) AS rk FROM d),
    e(rk, s) AS (
        SELECT rk, CAST(n AS DOUBLE) FROM r WHERE rk = 1
        UNION ALL
        SELECT r.rk, 0.3 * r.n + 0.7 * e.s
        FROM e JOIN r ON r.rk = e.rk + 1
    )
    SELECT r.day, CAST(r.n AS BIGINT) AS n_events, round(e.s, 4) AS ewma
    FROM r JOIN e USING (rk) ORDER BY r.day
"""


NOSQL_QUERIES["bloom_fpr"] = q_bloom_fpr


SQL_QUERIES["leaky_bucket_replay"] = q_leaky_bucket_replay


ORACLE_SQL["leaky_bucket_replay"] = """
    WITH RECURSIVE ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS a,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rk
        FROM events
    ),
    g(user_id, rk, event_id, a, gr) AS (
        SELECT user_id, rk, event_id, a, a FROM ev WHERE rk = 1
        UNION ALL
        SELECT ev.user_id, ev.rk, ev.event_id, ev.a,
               greatest(ev.a, g.gr + 21600000000)
        FROM g JOIN ev ON ev.user_id = g.user_id AND ev.rk = g.rk + 1
    )
    SELECT user_id, event_id, CAST(gr - a AS BIGINT) AS delay_us
    FROM g ORDER BY user_id, event_id
"""


SQL_QUERIES["edit_journeys"] = q_edit_journeys


ORACLE_SQL["edit_journeys"] = """
    WITH j AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS journey
        FROM events GROUP BY user_id
    ),
    r AS (
        SELECT user_id, journey,
               row_number() OVER (ORDER BY user_id) AS rk
        FROM j
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(len(a.journey) AS BIGINT) AS len_a,
           CAST(len(b.journey) AS BIGINT) AS len_b,
           CAST(levenshtein(a.journey, b.journey) AS BIGINT) AS edit_dist
    FROM r a JOIN r b ON b.rk = a.rk + 1
    ORDER BY user_a
"""


SQL_QUERIES["sorted_neighborhood"] = q_sorted_neighborhood


ORACLE_SQL["sorted_neighborhood"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               list_aggregate(t[1:2], 'string_agg', ' ') AS k,
               list_distinct(t) AS s
        FROM toks
    ),
    r AS (
        SELECT doc_id, s, row_number() OVER (ORDER BY k, doc_id) AS rn
        FROM f
    ),
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.s, b.s)) AS inter,
               len(a.s) AS na, len(b.s) AS nb
        FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3
    )
    SELECT doc_a, doc_b,
           round(inter * 1.0 / (na + nb - inter), 6) AS jac
    FROM p ORDER BY doc_a, doc_b
"""


SQL_QUERIES["stupid_backoff_logprob"] = q_stupid_backoff_logprob


ORACLE_SQL["stupid_backoff_logprob"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    uc AS (SELECT token, count(*) AS c FROM w GROUP BY token),
    tt AS (SELECT sum(c) AS T FROM uc),
    bg AS (
        SELECT t[i] AS x, t[i + 1] AS y
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ),
    bc AS (SELECT x, y, count(*) AS c FROM bg GROUP BY x, y),
    pos AS (
        SELECT doc_id, t[i] AS x, t[i + 1] AS y
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ),
    scored AS (
        SELECT pos.doc_id,
               CASE WHEN bc.c IS NOT NULL
                    THEN ln(bc.c * 1.0 / ux.c)
                    ELSE ln(0.4 * uy.c / tt.T)
               END AS s
        FROM pos
        LEFT JOIN bc ON bc.x = pos.x AND bc.y = pos.y
        JOIN uc ux ON ux.token = pos.x
        JOIN uc uy ON uy.token = pos.y, tt
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(s) / count(*), 6) AS sb_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""


NOSQL_QUERIES["huffman_code_lengths"] = q_huffman_code_lengths


SQL_QUERIES["neyman_allocation"] = q_neyman_allocation


ORACLE_SQL["neyman_allocation"] = """
    WITH s AS (
        SELECT source, count(*) AS n, sum(n_chars) AS sm,
               sum(n_chars * n_chars) AS ss
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n,
               n * sqrt(CASE WHEN n > 1
                             THEN (ss - sm * sm * 1.0 / n) / (n - 1)
                             ELSE 0.0 END) AS w
        FROM s
    ),
    t AS (SELECT sum(w) AS tot FROM w)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(w / nullif(tot, 0), 6) AS share,
           CAST(coalesce(floor(1000 * (w / nullif(tot, 0))), 0) AS BIGINT)
               AS n_alloc
    FROM w, t ORDER BY source
"""


SQL_QUERIES["kcenter_greedy"] = q_kcenter_greedy


ORACLE_SQL["kcenter_greedy"] = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c1 AS (SELECT vec_id, v FROM e WHERE vec_id = 0),
    d2 AS (
        SELECT e.vec_id, e.v, min(list_distance(e.v, c.v)) AS d
        FROM e, c1 c GROUP BY e.vec_id, e.v
    ),
    p2 AS (SELECT vec_id, v, d FROM d2 ORDER BY d DESC, vec_id LIMIT 1),
    c2 AS (SELECT vec_id, v FROM c1 UNION ALL SELECT vec_id, v FROM p2),
    d3 AS (
        SELECT e.vec_id, e.v, min(list_distance(e.v, c.v)) AS d
        FROM e, c2 c GROUP BY e.vec_id, e.v
    ),
    p3 AS (SELECT vec_id, v, d FROM d3 ORDER BY d DESC, vec_id LIMIT 1),
    c3 AS (SELECT vec_id, v FROM c2 UNION ALL SELECT vec_id, v FROM p3),
    d4 AS (
        SELECT e.vec_id, e.v, min(list_distance(e.v, c.v)) AS d
        FROM e, c3 c GROUP BY e.vec_id, e.v
    ),
    p4 AS (SELECT vec_id, v, d FROM d4 ORDER BY d DESC, vec_id LIMIT 1),
    c4 AS (SELECT vec_id, v FROM c3 UNION ALL SELECT vec_id, v FROM p4),
    d5 AS (
        SELECT e.vec_id, e.v, min(list_distance(e.v, c.v)) AS d
        FROM e, c4 c GROUP BY e.vec_id, e.v
    ),
    p5 AS (SELECT vec_id, v, d FROM d5 ORDER BY d DESC, vec_id LIMIT 1)
    SELECT 1 AS step, 0 AS vec_id, 0.0 AS dist
    UNION ALL SELECT 2, vec_id, round(d, 4) FROM p2
    UNION ALL SELECT 3, vec_id, round(d, 4) FROM p3
    UNION ALL SELECT 4, vec_id, round(d, 4) FROM p4
    UNION ALL SELECT 5, vec_id, round(d, 4) FROM p5
    ORDER BY step
"""


SQL_QUERIES["rank_correlation"] = q_rank_correlation


ORACLE_SQL["rank_correlation"] = """
    WITH e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    deg AS (
        SELECT nodes.n, count(e.src) AS d
        FROM nodes LEFT JOIN e ON e.src = nodes.n GROUP BY nodes.n
    ),
    r0 AS (SELECT n, 1.0 AS x FROM nodes),
    r1 AS (
        SELECT nodes.n, 1.0 + 0.05 * coalesce(sum(r0.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r0 ON r0.n = e.src
        GROUP BY nodes.n
    ),
    r2 AS (
        SELECT nodes.n, 1.0 + 0.05 * coalesce(sum(r1.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r1 ON r1.n = e.src
        GROUP BY nodes.n
    ),
    r3 AS (
        SELECT nodes.n, 1.0 + 0.05 * coalesce(sum(r2.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r2 ON r2.n = e.src
        GROUP BY nodes.n
    ),
    v AS (
        SELECT deg.n, deg.d AS x, round(r3.x, 6) AS y
        FROM deg JOIN r3 ON r3.n = deg.n
    ),
    pairs AS (
        SELECT sign(a.x - b.x) * sign(a.y - b.y) AS s
        FROM v a JOIN v b ON a.n < b.n
    ),
    cd AS (
        SELECT count(*) FILTER (s > 0) AS C, count(*) FILTER (s < 0) AS D
        FROM pairs
    ),
    nn AS (SELECT count(*) AS n FROM v),
    tx AS (
        SELECT coalesce(sum(t * (t - 1) // 2), 0) AS n1
        FROM (SELECT count(*) AS t FROM v GROUP BY x)
    ),
    ty AS (
        SELECT coalesce(sum(t * (t - 1) // 2), 0) AS n2
        FROM (SELECT count(*) AS t FROM v GROUP BY y)
    ),
    rk AS (
        SELECT n,
               2 * (count(*) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
                    - count(*) OVER (PARTITION BY x)) +
               count(*) OVER (PARTITION BY x) + 1 AS rx,
               2 * (count(*) OVER (ORDER BY y RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
                    - count(*) OVER (PARTITION BY y)) +
               count(*) OVER (PARTITION BY y) + 1 AS ry
        FROM v
    ),
    sp AS (
        SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
               sum(rx * rx) AS sxx, sum(ry * ry) AS syy, sum(rx * ry) AS sxy
        FROM rk
    )
    SELECT CAST(nn.n AS BIGINT) AS n,
           CAST(cd.C AS BIGINT) AS concordant,
           CAST(cd.D AS BIGINT) AS discordant,
           round((cd.C - cd.D)
                 / sqrt((nn.n * (nn.n - 1) // 2 - tx.n1)
                        * 1.0 * (nn.n * (nn.n - 1) // 2 - ty.n2)), 6) AS tau_b,
           round((sp.n * sp.sxy - sp.sx * sp.sy)
                 / sqrt((sp.n * sp.sxx - sp.sx * sp.sx)
                        * 1.0 * (sp.n * sp.syy - sp.sy * sp.sy)), 6) AS spearman
    FROM cd, nn, tx, ty, sp
"""


SQL_QUERIES["mcnemar_gates"] = q_mcnemar_gates


SQL_QUERIES["filter_ablation"] = q_filter_ablation


ORACLE_SQL["mcnemar_gates"] = (
    "WITH " + _C4_LINES_SQL.format() + "," + _GATES_SQL + """,
    j AS (SELECT gk.g, c4k.c FROM gk JOIN c4k USING (doc_id)),
    cells AS (
        SELECT count(*) FILTER (g = 1 AND c = 1) AS n11,
               count(*) FILTER (g = 1 AND c = 0) AS n10,
               count(*) FILTER (g = 0 AND c = 1) AS n01,
               count(*) FILTER (g = 0 AND c = 0) AS n00
        FROM j
    )
    SELECT CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           round((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) * 1.0
                 / nullif(n10 + n01, 0), 6) AS mcnemar
    FROM cells
"""
)


ORACLE_SQL["filter_ablation"] = (
    "WITH " + _C4_LINES_SQL.format() + "," + _GATES_SQL + r""",
    grams4 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 2),
                                     i -> list_aggregate(t[i:i+3], 'string_agg', ' ')))
                   AS g4
        FROM toks
    ),
    test AS (
        SELECT DISTINCT g4 FROM grams4
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 97 = 0
    ),
    hits AS (
        SELECT gr.doc_id, count(*) AS nh
        FROM grams4 gr JOIN test USING (g4)
        WHERE md5_number_lower(CAST(gr.doc_id AS VARCHAR)) % 97 <> 0
        GROUP BY gr.doc_id
    ),
    decon AS (
        SELECT d.doc_id,
               CASE WHEN md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 97 = 0 THEN 1
                    WHEN coalesce(h.nh, 0) > 0 THEN 1 ELSE 0 END AS x
        FROM documents d LEFT JOIN hits h USING (doc_id)
    ),
    dup AS (
        SELECT doc_id,
               CAST(doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS BIGINT)
                   AS dp
        FROM documents
    )
    SELECT gk.g AS gopher_keep, c4k.c AS c4_keep,
           CAST(decon.x AS BIGINT) AS decon_drop, dup.dp AS is_dup,
           CAST(count(*) AS BIGINT) AS n
    FROM gk JOIN c4k USING (doc_id) JOIN decon USING (doc_id)
            JOIN dup USING (doc_id)
    GROUP BY gk.g, c4k.c, decon.x, dup.dp
    ORDER BY gopher_keep, c4_keep, decon_drop, is_dup
"""
)


SQL_QUERIES["trustrank"] = q_trustrank


ORACLE_SQL["trustrank"] = """
    WITH e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    sd AS (
        SELECT n, CASE WHEN n < 5 THEN 1.0 / 5 ELSE 0.0 END AS d FROM nodes
    ),
    r0 AS (SELECT n, d AS x FROM sd),
    r1 AS (
        SELECT nodes.n,
               0.85 * coalesce(sum(r0.x / deg.outdeg), 0)
               + 0.15 * any_value(sd.d) AS x
        FROM nodes JOIN sd ON sd.n = nodes.n
        LEFT JOIN e ON e.dst = nodes.n
        LEFT JOIN r0 ON r0.n = e.src
        LEFT JOIN deg ON deg.src = e.src
        GROUP BY nodes.n
    ),
    r2 AS (
        SELECT nodes.n,
               0.85 * coalesce(sum(r1.x / deg.outdeg), 0)
               + 0.15 * any_value(sd.d) AS x
        FROM nodes JOIN sd ON sd.n = nodes.n
        LEFT JOIN e ON e.dst = nodes.n
        LEFT JOIN r1 ON r1.n = e.src
        LEFT JOIN deg ON deg.src = e.src
        GROUP BY nodes.n
    ),
    r3 AS (
        SELECT nodes.n,
               0.85 * coalesce(sum(r2.x / deg.outdeg), 0)
               + 0.15 * any_value(sd.d) AS x
        FROM nodes JOIN sd ON sd.n = nodes.n
        LEFT JOIN e ON e.dst = nodes.n
        LEFT JOIN r2 ON r2.n = e.src
        LEFT JOIN deg ON deg.src = e.src
        GROUP BY nodes.n
    )
    SELECT n AS node, round(x, 6) AS trust FROM r3 ORDER BY node
"""


SQL_QUERIES["line_dedup"] = q_line_dedup


ORACLE_SQL["line_dedup"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    segs AS (
        SELECT doc_id,
               unnest(range(1, CAST(ceil(len(t) / 8.0) AS BIGINT) + 1)) AS seg_idx,
               unnest(list_transform(
                   range(1, CAST(ceil(len(t) / 8.0) AS BIGINT) + 1),
                   k -> list_aggregate(t[(k-1)*8+1:k*8], 'string_agg', ' '))) AS g
        FROM toks
    ),
    rk AS (
        SELECT doc_id, seg_idx,
               row_number() OVER (PARTITION BY g ORDER BY doc_id, seg_idx) AS rn
        FROM segs
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_segs,
           round(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS kept_frac
    FROM rk GROUP BY doc_id ORDER BY doc_id
"""


SQL_QUERIES["salsa"] = q_salsa


ORACLE_SQL["salsa"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    outd AS (SELECT src, count(*) AS od FROM e GROUP BY src),
    ind AS (SELECT dst, count(*) AS idg FROM e GROUP BY dst),
    a0 AS (SELECT n, 1.0 / 50 AS a FROM nodes),
    h1 AS (
        SELECT e.src AS n, sum(a0.a / ind.idg) AS h
        FROM e JOIN a0 ON a0.n = e.dst JOIN ind ON ind.dst = e.dst
        GROUP BY e.src
    ),
    a1 AS (
        SELECT nodes.n, coalesce(sum(h1.h / outd.od), 0) AS a
        FROM nodes
        LEFT JOIN e ON e.dst = nodes.n
        LEFT JOIN h1 ON h1.n = e.src
        LEFT JOIN outd ON outd.src = e.src
        GROUP BY nodes.n
    ),
    h2 AS (
        SELECT e.src AS n, sum(a1.a / ind.idg) AS h
        FROM e JOIN a1 ON a1.n = e.dst JOIN ind ON ind.dst = e.dst
        GROUP BY e.src
    ),
    a2 AS (
        SELECT nodes.n, coalesce(sum(h2.h / outd.od), 0) AS a
        FROM nodes
        LEFT JOIN e ON e.dst = nodes.n
        LEFT JOIN h2 ON h2.n = e.src
        LEFT JOIN outd ON outd.src = e.src
        GROUP BY nodes.n
    )
    SELECT n AS node, round(a, 6) AS authority FROM a2 ORDER BY node
"""


SQL_QUERIES["cocitation"] = q_cocitation


ORACLE_SQL["cocitation"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    cc AS (
        SELECT e1.dst AS a, e2.dst AS b, count(*) AS cocitation
        FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
        GROUP BY 1, 2
    ),
    bc AS (
        SELECT e1.src AS a, e2.src AS b, count(*) AS coupling
        FROM e e1 JOIN e e2 ON e1.dst = e2.dst AND e1.src < e2.src
        GROUP BY 1, 2
    )
    SELECT coalesce(cc.a, bc.a) AS a,
           coalesce(cc.b, bc.b) AS b,
           CAST(coalesce(cc.cocitation, 0) AS BIGINT) AS cocitation,
           CAST(coalesce(bc.coupling, 0) AS BIGINT) AS coupling
    FROM cc FULL OUTER JOIN bc ON cc.a = bc.a AND cc.b = bc.b
    ORDER BY a, b
"""


SQL_QUERIES["gap_stats"] = q_gap_stats


ORACLE_SQL["gap_stats"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    g AS (
        SELECT src,
               coalesce(dst - lag(dst) OVER (PARTITION BY src ORDER BY dst),
                        dst + 1) AS gap
        FROM e
    ),
    b AS (SELECT src, 2 * (length(bin(gap)) - 1) + 1 AS bits FROM g)
    SELECT src,
           CAST(count(*) AS BIGINT) AS n_links,
           CAST(sum(bits) AS BIGINT) AS total_bits,
           round(sum(bits) * 1.0 / count(*), 4) AS bits_per_link
    FROM b GROUP BY src ORDER BY src
"""


SQL_QUERIES["count_min"] = q_count_min


ORACLE_SQL["count_min"] = r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    hashed AS (
        SELECT token, c, r,
               CAST(md5_number_lower(token || ':' || r) % 32 AS BIGINT) AS b
        FROM cnt, unnest([0, 1, 2, 3]) AS t(r)
    ),
    grid AS (SELECT r, b, sum(c) AS cell FROM hashed GROUP BY r, b),
    top AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT 20),
    est AS (
        SELECT top.token, top.c, min(grid.cell) AS cms
        FROM top
        JOIN hashed ON hashed.token = top.token
        JOIN grid ON grid.r = hashed.r AND grid.b = hashed.b
        GROUP BY top.token, top.c
    )
    SELECT token,
           CAST(c AS BIGINT) AS true_count,
           CAST(cms AS BIGINT) AS cms_count
    FROM est ORDER BY true_count DESC, token
"""


SQL_QUERIES["simrank"] = q_simrank


ORACLE_SQL["simrank"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    ind AS (SELECT dst, count(*) AS idg FROM e GROUP BY dst),
    s1o AS (
        SELECT ea.dst AS a, eb.dst AS b,
               0.8 * sum(CASE WHEN ea.src = eb.src THEN 1 ELSE 0 END)
                   / (any_value(ia.idg) * any_value(ib.idg)) AS s
        FROM e ea
        JOIN e eb ON ea.dst <> eb.dst
        JOIN ind ia ON ia.dst = ea.dst
        JOIN ind ib ON ib.dst = eb.dst
        GROUP BY ea.dst, eb.dst
    ),
    t1 AS (
        SELECT a, b, s FROM s1o
        UNION ALL
        SELECT n, n, 1.0 FROM nodes
    ),
    s2o AS (
        SELECT ea.dst AS a, eb.dst AS b,
               0.8 * coalesce(sum(t1.s), 0)
                   / (any_value(ia.idg) * any_value(ib.idg)) AS s
        FROM e ea
        JOIN e eb ON ea.dst <> eb.dst
        LEFT JOIN t1 ON t1.a = ea.src AND t1.b = eb.src
        JOIN ind ia ON ia.dst = ea.dst
        JOIN ind ib ON ib.dst = eb.dst
        GROUP BY ea.dst, eb.dst
    )
    SELECT na.n AS a, nb.n AS b, round(coalesce(s2o.s, 0), 6) AS simrank
    FROM nodes na
    JOIN nodes nb ON na.n < nb.n
    LEFT JOIN s2o ON s2o.a = na.n AND s2o.b = nb.n
    ORDER BY a, b
"""


SQL_QUERIES["adamic_adar"] = q_adamic_adar


ORACLE_SQL["adamic_adar"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    und AS (
        SELECT DISTINCT n, nb FROM (
            SELECT src AS n, dst AS nb FROM e
            UNION ALL
            SELECT dst AS n, src AS nb FROM e
        ) WHERE n <> nb
    ),
    deg AS (SELECT n, count(*) AS d FROM und GROUP BY n),
    wedge AS (
        SELECT w1.nb AS a, w2.nb AS b, w1.n AS z
        FROM und w1 JOIN und w2 ON w1.n = w2.n AND w1.nb < w2.nb
    ),
    sc AS (
        SELECT wedge.a, wedge.b,
               count(*) AS common_neighbors,
               sum(1.0 / ln(dz.d)) AS aa
        FROM wedge JOIN deg dz ON dz.n = wedge.z
        GROUP BY wedge.a, wedge.b
    )
    SELECT sc.a, sc.b,
           CAST(sc.common_neighbors AS BIGINT) AS common_neighbors,
           round(sc.common_neighbors * 1.0
                 / (da.d + db.d - sc.common_neighbors), 6) AS jaccard,
           round(sc.aa, 6) AS adamic_adar
    FROM sc
    JOIN deg da ON da.n = sc.a
    JOIN deg db ON db.n = sc.b
    ORDER BY a, b
"""


SQL_QUERIES["wl_refinement"] = q_wl_refinement


ORACLE_SQL["wl_refinement"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    ind AS (SELECT dst AS n, count(*) AS d FROM e GROUP BY dst),
    outd AS (SELECT src AS n, count(*) AS d FROM e GROUP BY src),
    c0 AS (
        SELECT nodes.n,
               CAST(coalesce(ind.d, 0) * 64 + coalesce(outd.d, 0) AS BIGINT) AS c
        FROM nodes LEFT JOIN ind ON ind.n = nodes.n
        LEFT JOIN outd ON outd.n = nodes.n
    ),
    i1 AS (
        SELECT e.dst AS n, string_agg(CAST(cp.c AS VARCHAR), ',' ORDER BY cp.c) AS s
        FROM e JOIN c0 cp ON cp.n = e.src GROUP BY e.dst
    ),
    o1 AS (
        SELECT e.src AS n, string_agg(CAST(cp.c AS VARCHAR), ',' ORDER BY cp.c) AS s
        FROM e JOIN c0 cp ON cp.n = e.dst GROUP BY e.src
    ),
    c1 AS (
        SELECT c0.n,
               CAST(md5_number_lower(CAST(c0.c AS VARCHAR) || '|' ||
                    coalesce(i1.s, '') || '#' || coalesce(o1.s, ''))
                    % 1000000007 AS BIGINT) AS c
        FROM c0 LEFT JOIN i1 ON i1.n = c0.n LEFT JOIN o1 ON o1.n = c0.n
    ),
    i2 AS (
        SELECT e.dst AS n, string_agg(CAST(cp.c AS VARCHAR), ',' ORDER BY cp.c) AS s
        FROM e JOIN c1 cp ON cp.n = e.src GROUP BY e.dst
    ),
    o2 AS (
        SELECT e.src AS n, string_agg(CAST(cp.c AS VARCHAR), ',' ORDER BY cp.c) AS s
        FROM e JOIN c1 cp ON cp.n = e.dst GROUP BY e.src
    ),
    c2 AS (
        SELECT c1.n,
               CAST(md5_number_lower(CAST(c1.c AS VARCHAR) || '|' ||
                    coalesce(i2.s, '') || '#' || coalesce(o2.s, ''))
                    % 1000000007 AS BIGINT) AS c
        FROM c1 LEFT JOIN i2 ON i2.n = c1.n LEFT JOIN o2 ON o2.n = c1.n
    )
    SELECT n AS node, c AS color,
           count(*) OVER (PARTITION BY c) AS class_size
    FROM c2 ORDER BY node
"""


SQL_QUERIES["ndcg_eval"] = q_ndcg_eval


ORACLE_SQL["ndcg_eval"] = """
    WITH r AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    ),
    d AS (
        SELECT sum(rel / log2(rk + 1)) AS dcg, sum(rel) AS hits
        FROM r WHERE rk <= 10
    ),
    tot AS (SELECT count(*) AS nrel FROM r WHERE rel = 1),
    idcg AS (
        SELECT sum(1.0 / log2(i + 1)) AS v
        FROM tot, unnest(range(1, least(10, nrel) + 1)) t(i)
    ),
    mr AS (SELECT min(rk) AS frk FROM r WHERE rel = 1)
    SELECT round(d.dcg / idcg.v, 6) AS ndcg10,
           round(d.hits / 10.0, 6) AS prec10,
           round(1.0 / mr.frk, 6) AS mrr
    FROM d, idcg, mr
"""


SQL_QUERIES["shard_balance"] = q_shard_balance


ORACLE_SQL["shard_balance"] = """
    WITH hashed AS (
        SELECT doc_id, s, md5_number_lower(doc_id || '@' || s) AS h
        FROM documents, unnest(range(0, 16)) t(s)
    ),
    pick AS (SELECT doc_id, arg_max(s, h) AS shard FROM hashed GROUP BY doc_id),
    c AS (SELECT shard, count(*) AS n_docs FROM pick GROUP BY shard),
    tot AS (SELECT sum(n_docs) AS t FROM c)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           round(n_docs * 16.0 / tot.t, 6) AS skew
    FROM c, tot ORDER BY shard
"""


SQL_QUERIES["hll_audit"] = q_hll_audit


ORACLE_SQL["hll_audit"] = r"""
    WITH tok AS (
        SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    h AS (SELECT md5_number_lower(token) AS hv FROM tok),
    b AS (
        SELECT CAST(hv % 16 AS BIGINT) AS bucket,
               CAST((hv // 16) % 1099511627776 AS BIGINT) AS v
        FROM h
    ),
    r AS (
        SELECT bucket,
               CASE WHEN v = 0 THEN 41 ELSE length(bin(v & -v)) END AS rho
        FROM b
    ),
    buckets AS (SELECT i AS bucket FROM range(0, 16) t(i)),
    reg AS (
        SELECT buckets.bucket, CAST(coalesce(max(r.rho), 0) AS BIGINT) AS register
        FROM buckets LEFT JOIN r ON r.bucket = buckets.bucket
        GROUP BY buckets.bucket
    ),
    est AS (SELECT 0.673 * 256.0 / sum(power(2.0, -register)) AS e FROM reg),
    td AS (SELECT count(*) AS d FROM tok)
    SELECT reg.bucket, reg.register,
           round(est.e, 4) AS raw_estimate,
           CAST(td.d AS BIGINT) AS true_distinct
    FROM reg, est, td ORDER BY reg.bucket
"""


SQL_QUERIES["cdc_chunks"] = q_cdc_chunks


ORACLE_SQL["cdc_chunks"] = _cdc_oracle_sql()


SQL_QUERIES["benford_digits"] = q_benford_digits


ORACLE_SQL["benford_digits"] = """
    WITH d AS (
        SELECT CAST(substr(printf('%.6e', value), 1, 1) AS BIGINT) AS digit
        FROM events WHERE value > 0
    ),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    digits AS (SELECT i AS digit FROM range(1, 10) t(i)),
    f AS (
        SELECT digits.digit, coalesce(c.n, 0) AS n,
               log10(1 + 1.0 / digits.digit) AS p
        FROM digits LEFT JOIN c ON c.digit = digits.digit
    ),
    tot AS (SELECT sum(n) AS t FROM f),
    chi AS (
        SELECT sum((n - t * p) * (n - t * p) / (t * p)) AS x FROM f, tot
    )
    SELECT f.digit,
           CAST(f.n AS BIGINT) AS n,
           round(f.n * 1.0 / tot.t, 6) AS obs_frac,
           round(f.p, 6) AS benford_frac,
           round(chi.x, 4) AS chi2
    FROM f, tot, chi ORDER BY f.digit
"""


SQL_QUERIES["walk_corpus"] = q_walk_corpus


ORACLE_SQL["walk_corpus"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    w1 AS (
        SELECT nodes.n AS start,
               arg_min(e.dst, md5_number_lower(nodes.n || '>' || 1 || '>' || e.dst))
                   AS node
        FROM nodes JOIN e ON e.src = nodes.n GROUP BY nodes.n
    ),
    w2 AS (
        SELECT w1.start,
               arg_min(e.dst, md5_number_lower(w1.node || '>' || 2 || '>' || e.dst))
                   AS node
        FROM w1 JOIN e ON e.src = w1.node GROUP BY w1.start
    ),
    w3 AS (
        SELECT w2.start,
               arg_min(e.dst, md5_number_lower(w2.node || '>' || 3 || '>' || e.dst))
                   AS node
        FROM w2 JOIN e ON e.src = w2.node GROUP BY w2.start
    ),
    w4 AS (
        SELECT w3.start,
               arg_min(e.dst, md5_number_lower(w3.node || '>' || 4 || '>' || e.dst))
                   AS node
        FROM w3 JOIN e ON e.src = w3.node GROUP BY w3.start
    )
    SELECT start, 1 AS step, node FROM w1
    UNION ALL SELECT start, 2, node FROM w2
    UNION ALL SELECT start, 3, node FROM w3
    UNION ALL SELECT start, 4, node FROM w4
    ORDER BY step, start
"""


SQL_QUERIES["late_arrivals"] = q_late_arrivals


ORACLE_SQL["late_arrivals"] = """
    WITH w AS (
        SELECT event_type, ts,
               max(ts) OVER (
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS seen
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN ts < seen - INTERVAL 1 HOUR THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
           round(sum(CASE WHEN ts < seen - INTERVAL 1 HOUR THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS late_frac
    FROM w GROUP BY event_type ORDER BY event_type
"""


SQL_QUERIES["funnel_conversion"] = q_funnel_conversion


ORACLE_SQL["funnel_conversion"] = """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
        WHERE e.event_type = 'signup' GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN s3 ON s3.user_id = e.user_id AND e.ts > s3.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    f AS (
        SELECT 1 AS step, 'view' AS stage, count(*) AS n_users FROM s1
        UNION ALL SELECT 2, 'click', count(*) FROM s2
        UNION ALL SELECT 3, 'signup', count(*) FROM s3
        UNION ALL SELECT 4, 'purchase', count(*) FROM s4
    ),
    b AS (SELECT greatest(max(CASE WHEN step = 1 THEN n_users END), 1) AS base FROM f)
    SELECT CAST(f.step AS BIGINT) AS step, f.stage,
           CAST(f.n_users AS BIGINT) AS n_users,
           round(f.n_users * 1.0 / b.base, 6) AS conversion
    FROM f, b ORDER BY f.step
"""


SQL_QUERIES["kaplan_meier"] = q_kaplan_meier


ORACLE_SQL["kaplan_meier"] = """
    WITH su AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN su ON su.user_id = e.user_id AND e.ts > su.t0
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    mx AS (SELECT max(ts) AS m FROM events),
    obs AS (
        SELECT su.user_id,
               CASE WHEN pu.t1 IS NOT NULL
                    THEN epoch_us(pu.t1) - epoch_us(su.t0)
                    ELSE epoch_us(mx.m) - epoch_us(su.t0) END AS dur,
               CASE WHEN pu.t1 IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM su LEFT JOIN pu ON pu.user_id = su.user_id CROSS JOIN mx
    ),
    tt AS (SELECT dur AS t, count(*) AS d FROM obs WHERE ev = 1 GROUP BY dur),
    rk AS (
        SELECT tt.t, tt.d,
               (SELECT count(*) FROM obs WHERE obs.dur >= tt.t) AS n
        FROM tt
    )
    SELECT CAST(t AS BIGINT) AS t_us,
           CAST(n AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CASE WHEN max(CASE WHEN d = n THEN 1 ELSE 0 END)
                     OVER (ORDER BY t) = 1 THEN 0.0
                ELSE round(exp(sum(CASE WHEN d < n THEN ln(1 - d * 1.0 / n)
                                        ELSE 0 END) OVER (ORDER BY t)), 6)
           END AS survival
    FROM rk ORDER BY t
"""


SQL_QUERIES["bipartite_check"] = q_bipartite_check


ORACLE_SQL["bipartite_check"] = """
    WITH RECURSIVE e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    und AS (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
        ) WHERE src <> dst
    ),
    b AS (
        SELECT 0 AS node, 0 AS d
        UNION
        SELECT und.dst, b.d + 1 FROM b JOIN und ON und.src = b.node
        WHERE b.d < 50
    ),
    md AS (SELECT node, min(d) AS depth FROM b GROUP BY node),
    conf AS (
        SELECT count(*) AS c
        FROM und JOIN md ma ON ma.node = und.src JOIN md mb ON mb.node = und.dst
        WHERE und.src < und.dst AND ma.depth % 2 = mb.depth % 2
    )
    SELECT md.node, md.depth, md.depth % 2 AS parity,
           CAST(conf.c AS BIGINT) AS n_conflict_edges,
           conf.c = 0 AS is_bipartite
    FROM md, conf ORDER BY md.node
"""


SQL_QUERIES["cuped"] = q_cuped


ORACLE_SQL["cuped"] = """
    WITH r AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS k
        FROM events
    ),
    xy AS (
        SELECT user_id, user_id % 2 AS arm,
               sum(CASE WHEN rn <= k // 2 THEN cents ELSE 0 END) / 100.0 AS x,
               sum(CASE WHEN rn > k // 2 THEN cents ELSE 0 END) / 100.0 AS y
        FROM r GROUP BY user_id
    ),
    g AS (SELECT avg(x) AS mx, avg(y) AS my FROM xy),
    th AS (
        SELECT CASE WHEN sum((x - mx) * (x - mx)) = 0 THEN 0
               ELSE sum((x - mx) * (y - my)) / sum((x - mx) * (x - mx)) END AS theta
        FROM xy, g
    )
    SELECT CAST(xy.arm AS BIGINT) AS arm,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(xy.y), 6) AS mean_y,
           round(avg(xy.y - th.theta * (xy.x - g.mx)), 6) AS mean_y_adj,
           round(th.theta, 6) AS theta
    FROM xy, g, th GROUP BY xy.arm, th.theta, g.mx ORDER BY arm
"""


SQL_QUERIES["hitting_time"] = q_hitting_time


ORACLE_SQL["hitting_time"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    outd AS (SELECT src, count(*) AS od FROM e GROUP BY src),
    h0 AS (SELECT n, 0.0 AS h FROM nodes),
    h1 AS (
        SELECT nodes.n,
               CASE WHEN nodes.n = 0 THEN 0.0
                    ELSE 1.0 + coalesce(sum(h0.h) / any_value(outd.od), 0) END AS h
        FROM nodes
        LEFT JOIN e ON e.src = nodes.n
        LEFT JOIN h0 ON h0.n = e.dst
        LEFT JOIN outd ON outd.src = nodes.n
        GROUP BY nodes.n
    ),
    h2 AS (
        SELECT nodes.n,
               CASE WHEN nodes.n = 0 THEN 0.0
                    ELSE 1.0 + coalesce(sum(h1.h) / any_value(outd.od), 0) END AS h
        FROM nodes
        LEFT JOIN e ON e.src = nodes.n
        LEFT JOIN h1 ON h1.n = e.dst
        LEFT JOIN outd ON outd.src = nodes.n
        GROUP BY nodes.n
    ),
    h3 AS (
        SELECT nodes.n,
               CASE WHEN nodes.n = 0 THEN 0.0
                    ELSE 1.0 + coalesce(sum(h2.h) / any_value(outd.od), 0) END AS h
        FROM nodes
        LEFT JOIN e ON e.src = nodes.n
        LEFT JOIN h2 ON h2.n = e.dst
        LEFT JOIN outd ON outd.src = nodes.n
        GROUP BY nodes.n
    )
    SELECT n AS node, round(h, 6) AS hitting_time FROM h3 ORDER BY node
"""


SQL_QUERIES["set_cover_greedy"] = q_set_cover_greedy


# 5 unrolled greedy rounds; per round pick the doc with the largest count
# of tokens not yet covered (ties -> min doc_id), then fold its tokens in.
ORACLE_SQL["set_cover_greedy"] = r"""
    WITH sets AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(trim(text), '\s+')) AS s
        FROM documents
    ),
    p1 AS (
        SELECT doc_id, len(s) AS gain FROM sets
        ORDER BY gain DESC, doc_id LIMIT 1
    ),
    c1 AS (SELECT sets.s AS cov FROM sets JOIN p1 USING (doc_id)),
    p2 AS (
        SELECT sets.doc_id,
               len(list_filter(sets.s, x -> NOT list_contains(c1.cov, x))) AS gain
        FROM sets, c1 ORDER BY gain DESC, doc_id LIMIT 1
    ),
    c2 AS (
        SELECT list_distinct(list_concat(c1.cov, sets.s)) AS cov
        FROM sets, c1 WHERE sets.doc_id = (SELECT doc_id FROM p2)
    ),
    p3 AS (
        SELECT sets.doc_id,
               len(list_filter(sets.s, x -> NOT list_contains(c2.cov, x))) AS gain
        FROM sets, c2 ORDER BY gain DESC, doc_id LIMIT 1
    ),
    c3 AS (
        SELECT list_distinct(list_concat(c2.cov, sets.s)) AS cov
        FROM sets, c2 WHERE sets.doc_id = (SELECT doc_id FROM p3)
    ),
    p4 AS (
        SELECT sets.doc_id,
               len(list_filter(sets.s, x -> NOT list_contains(c3.cov, x))) AS gain
        FROM sets, c3 ORDER BY gain DESC, doc_id LIMIT 1
    ),
    c4 AS (
        SELECT list_distinct(list_concat(c3.cov, sets.s)) AS cov
        FROM sets, c3 WHERE sets.doc_id = (SELECT doc_id FROM p4)
    ),
    p5 AS (
        SELECT sets.doc_id,
               len(list_filter(sets.s, x -> NOT list_contains(c4.cov, x))) AS gain
        FROM sets, c4 ORDER BY gain DESC, doc_id LIMIT 1
    ),
    c5 AS (
        SELECT list_distinct(list_concat(c4.cov, sets.s)) AS cov
        FROM sets, c4 WHERE sets.doc_id = (SELECT doc_id FROM p5)
    )
    SELECT 1 AS step, p1.doc_id, p1.gain, len(c1.cov) AS covered_vocab FROM p1, c1
    UNION ALL SELECT 2, p2.doc_id, p2.gain, len(c2.cov) FROM p2, c2
    UNION ALL SELECT 3, p3.doc_id, p3.gain, len(c3.cov) FROM p3, c3
    UNION ALL SELECT 4, p4.doc_id, p4.gain, len(c4.cov) FROM p4, c4
    UNION ALL SELECT 5, p5.doc_id, p5.gain, len(c5.cov) FROM p5, c5
    ORDER BY step
"""


SQL_QUERIES["knapsack_select"] = q_knapsack_select


ORACLE_SQL["knapsack_select"] = r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    q AS (
        SELECT doc_id, len(w) AS n_tokens,
               round(len(list_distinct(w)) * 1.0 / len(w), 6) AS quality
        FROM t
    ),
    r AS (
        SELECT doc_id, n_tokens, quality,
               sum(n_tokens) OVER (
                   ORDER BY quality DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM q
    )
    SELECT doc_id, n_tokens, quality, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM r WHERE cum_tokens <= 5000
    ORDER BY quality DESC, doc_id
"""


SQL_QUERIES["containment_pairs"] = q_containment_pairs


ORACLE_SQL["containment_pairs"] = r"""
    WITH sets AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(trim(text), '\s+')) AS s
        FROM documents
    )
    SELECT a.doc_id AS pair_id,
           round(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s), 6)
               AS cont_a_in_b,
           round(len(list_intersect(a.s, b.s)) * 1.0 / len(b.s), 6)
               AS cont_b_in_a
    FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1
    ORDER BY pair_id
"""


SQL_QUERIES["rbo_overlap"] = q_rbo_overlap


ORACLE_SQL["rbo_overlap"] = r"""
    WITH q AS (
        SELECT doc_id, n_chars,
               round(len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
                     * 1.0 / len(regexp_split_to_array(trim(text), '\s+')), 6)
                   AS quality
        FROM documents
    ),
    ra AS (
        SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
        FROM q
    ),
    rb AS (
        SELECT doc_id, row_number() OVER (ORDER BY quality DESC, doc_id) AS r
        FROM q
    ),
    d AS (SELECT i AS depth FROM range(1, 11) t(i)),
    ov AS (
        SELECT d.depth,
               (SELECT count(*) FROM ra JOIN rb USING (doc_id)
                WHERE ra.r <= d.depth AND rb.r <= d.depth) AS a
        FROM d
    )
    SELECT round(sum(0.1 * power(0.9, depth - 1) * a / depth), 6) AS rbo10,
           CAST(max(CASE WHEN depth = 10 THEN a END) AS BIGINT) AS overlap10
    FROM ov
"""


SQL_QUERIES["info_gain"] = q_info_gain


ORACLE_SQL["info_gain"] = """
    WITH mx AS (SELECT max(n_chars) AS m FROM documents),
    th AS (
        SELECT i AS k, CAST(i * m // 10 AS BIGINT) AS threshold
        FROM mx, unnest(range(1, 10)) t(i)
    ),
    s AS (
        SELECT th.k, th.threshold,
               count(*) AS n,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
               sum(CASE WHEN n_chars <= th.threshold THEN 1 ELSE 0 END) AS nl,
               sum(CASE WHEN n_chars <= th.threshold AND lang = 'en'
                        THEN 1 ELSE 0 END) AS pl
        FROM documents, th GROUP BY th.k, th.threshold
    ),
    e AS (
        SELECT k, threshold, n, pos, nl, pl,
               n - nl AS nr, pos - pl AS prr FROM s
    ),
    ig AS (
        SELECT k, threshold, nl,
               (CASE WHEN pos IN (0, n) THEN 0
                     ELSE -(pos * 1.0 / n) * ln(pos * 1.0 / n)
                          - (1 - pos * 1.0 / n) * ln(1 - pos * 1.0 / n) END)
               - (nl * 1.0 / n) *
                 (CASE WHEN nl = 0 OR pl IN (0, nl) THEN 0
                       ELSE -(pl * 1.0 / nl) * ln(pl * 1.0 / nl)
                            - (1 - pl * 1.0 / nl) * ln(1 - pl * 1.0 / nl) END)
               - (nr * 1.0 / n) *
                 (CASE WHEN nr = 0 OR prr IN (0, nr) THEN 0
                       ELSE -(prr * 1.0 / nr) * ln(prr * 1.0 / nr)
                            - (1 - prr * 1.0 / nr) * ln(1 - prr * 1.0 / nr) END)
                   AS g
        FROM e
    )
    SELECT k, threshold, CAST(e.nl AS BIGINT) AS n_left,
           round(ig.g, 6) AS info_gain,
           round(ig.g, 6) = (SELECT max(round(g, 6)) FROM ig) AS is_best
    FROM ig JOIN e USING (k, threshold) ORDER BY k
"""


SQL_QUERIES["triadic_closure"] = q_triadic_closure


ORACLE_SQL["triadic_closure"] = """
    WITH e0 AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events WHERE event_id % 2 = 0
    ),
    e1 AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events WHERE event_id % 2 = 1
    ),
    w AS (
        SELECT DISTINCT a1.dst AS a, a2.dst AS b
        FROM e0 a1 JOIN e0 a2 ON a1.src = a2.src AND a1.dst < a2.dst
    ),
    c AS (
        SELECT w.a, w.b,
               CASE WHEN EXISTS (
                   SELECT 1 FROM e1
                   WHERE (e1.src = w.a AND e1.dst = w.b)
                      OR (e1.src = w.b AND e1.dst = w.a)
               ) THEN 1 ELSE 0 END AS closed
        FROM w
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(closed) AS BIGINT) AS n_closed,
           round(sum(closed) * 1.0 / count(*), 6) AS closure_rate
    FROM c
"""


SQL_QUERIES["snapshot_drift"] = q_snapshot_drift


ORACLE_SQL["snapshot_drift"] = """
    WITH e0 AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events WHERE event_id % 2 = 0
    ),
    e1 AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events WHERE event_id % 2 = 1
    ),
    g0 AS (SELECT src, count(*) AS d FROM e0 GROUP BY src),
    g1 AS (SELECT src, count(*) AS d FROM e1 GROUP BY src),
    h0 AS (SELECT d AS outdeg, count(*) AS n FROM g0 GROUP BY d),
    h1 AS (SELECT d AS outdeg, count(*) AS n FROM g1 GROUP BY d),
    u AS (
        SELECT coalesce(h0.outdeg, h1.outdeg) AS outdeg,
               coalesce(h0.n, 0) AS n_early,
               coalesce(h1.n, 0) AS n_late
        FROM h0 FULL OUTER JOIN h1 ON h0.outdeg = h1.outdeg
    ),
    t AS (SELECT sum(n_early) AS t0, sum(n_late) AS t1 FROM u),
    tv AS (
        SELECT 0.5 * sum(abs(n_early * 1.0 / t.t0 - n_late * 1.0 / t.t1)) AS v
        FROM u, t
    )
    SELECT u.outdeg, u.n_early, u.n_late,
           round(u.n_early * 1.0 / t.t0, 6) AS p_early,
           round(u.n_late * 1.0 / t.t1, 6) AS p_late,
           round(tv.v, 6) AS tv_dist
    FROM u, t, tv ORDER BY u.outdeg
"""


SQL_QUERIES["rich_club"] = q_rich_club


ORACLE_SQL["rich_club"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    und AS (
        SELECT DISTINCT n, nb FROM (
            SELECT src AS n, dst AS nb FROM e
            UNION ALL SELECT dst, src FROM e
        ) WHERE n <> nb
    ),
    deg AS (SELECT n, count(*) AS d FROM und GROUP BY n),
    ks AS (SELECT unnest([1, 2, 4, 8]) AS k),
    nn AS (
        SELECT ks.k, count(*) AS n_nodes
        FROM ks LEFT JOIN deg ON deg.d > ks.k GROUP BY ks.k
    ),
    ee AS (
        SELECT ks.k, count(*) AS n_edges
        FROM ks
        LEFT JOIN und ON und.n < und.nb
        JOIN deg da ON da.n = und.n AND da.d > ks.k
        JOIN deg db ON db.n = und.nb AND db.d > ks.k
        GROUP BY ks.k
    )
    SELECT nn.k,
           CAST(nn.n_nodes AS BIGINT) AS n_nodes,
           CAST(coalesce(ee.n_edges, 0) AS BIGINT) AS n_edges,
           CASE WHEN nn.n_nodes > 1
                THEN round(2.0 * coalesce(ee.n_edges, 0)
                           / (nn.n_nodes * (nn.n_nodes - 1)), 6)
                ELSE 0.0 END AS phi
    FROM nn LEFT JOIN ee ON ee.k = nn.k ORDER BY nn.k
"""


SQL_QUERIES["cosine_pairs"] = q_cosine_pairs


ORACLE_SQL["cosine_pairs"] = r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS c FROM toks GROUP BY doc_id, token),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    nd AS (SELECT count(*) AS n FROM documents),
    w AS (
        SELECT tf.doc_id, tf.token, tf.c * ln(nd.n * 1.0 / dfreq.df) AS w
        FROM tf JOIN dfreq USING (token) CROSS JOIN nd
    ),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nv FROM w GROUP BY doc_id),
    dots AS (
        SELECT a.doc_id AS pair_id, sum(a.w * b.w) AS dot
        FROM w a JOIN w b ON b.doc_id = a.doc_id + 1 AND b.token = a.token
        GROUP BY a.doc_id
    ),
    pairs AS (
        SELECT na.doc_id AS pair_id,
               coalesce(dots.dot, 0) / (na.nv * nb.nv) AS sim
        FROM nrm na JOIN nrm nb ON nb.doc_id = na.doc_id + 1
        LEFT JOIN dots ON dots.pair_id = na.doc_id
        WHERE na.nv > 0 AND nb.nv > 0
    )
    SELECT pair_id, round(sim, 6) AS cosine FROM pairs ORDER BY pair_id
"""


SQL_QUERIES["pagerank_delta"] = q_pagerank_delta


ORACLE_SQL["pagerank_delta"] = f"""
    WITH e0 AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events WHERE event_id % 2 = 0
    ),
    ef AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    {_pr_unrolled("e0", "a")},
    {_pr_unrolled("ef", "b")}
    SELECT nodes.n AS node,
           round(a2.x, 6) AS rank_base,
           round(b2.x, 6) AS rank_full,
           round(b2.x - a2.x, 6) AS delta
    FROM nodes JOIN a2 ON a2.n = nodes.n JOIN b2 ON b2.n = nodes.n
    ORDER BY node
"""


SQL_QUERIES["persistent_items"] = q_persistent_items


ORACLE_SQL["persistent_items"] = """
    WITH uh AS (
        SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour FROM events
    ),
    th AS (SELECT count(DISTINCT hour) AS t FROM uh),
    pu AS (SELECT user_id, count(*) AS n_hours FROM uh GROUP BY user_id)
    SELECT pu.user_id,
           CAST(pu.n_hours AS BIGINT) AS n_hours,
           round(pu.n_hours * 1.0 / th.t, 6) AS hour_frac,
           pu.n_hours >= 0.5 * th.t AS is_persistent
    FROM pu, th ORDER BY pu.user_id
"""


SQL_QUERIES["sparsify_error"] = q_sparsify_error


ORACLE_SQL["sparsify_error"] = f"""
    WITH ew AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    ef AS (SELECT src, dst FROM ew),
    es AS (
        SELECT src, dst FROM ew
        QUALIFY row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) <= 2
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    {_pr_unrolled("ef", "f")},
    {_pr_unrolled("es", "s")},
    l1 AS (
        SELECT sum(abs(round(f2.x, 9) - round(s2.x, 9))) AS v
        FROM f2 JOIN s2 ON s2.n = f2.n
    )
    SELECT nodes.n AS node,
           round(round(f2.x, 9), 6) AS rank_full,
           round(round(s2.x, 9), 6) AS rank_sparse,
           round(l1.v, 6) AS l1_error
    FROM nodes JOIN f2 ON f2.n = nodes.n JOIN s2 ON s2.n = nodes.n, l1
    ORDER BY node
"""


SQL_QUERIES["spam_mass"] = q_spam_mass


ORACLE_SQL["spam_mass"] = f"""
    WITH e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    sd AS (SELECT n, CASE WHEN n < 5 THEN 1.0 / 5 ELSE 0.0 END AS d FROM nodes),
    {_pr_unrolled("e", "g")},
{_seed_pr_unrolled("e", "gd", "t")}
    fin AS (
        SELECT nodes.n, round(g2.x, 9) AS p, round(t2.x, 9) AS t
        FROM nodes JOIN g2 ON g2.n = nodes.n JOIN t2 ON t2.n = nodes.n
    )
    SELECT n AS node, round(p, 6) AS pr, round(t, 6) AS trust,
           round((p - t) / p, 6) AS spam_mass
    FROM fin ORDER BY node
"""


SQL_QUERIES["langid_macro_f1"] = q_langid_macro_f1


ORACLE_SQL["langid_macro_f1"] = (
    "WITH pred AS (" + ORACLE_SQL["langid"] + """),
    cm AS (
        SELECT d.lang AS lang, p.lang_pred
        FROM documents d JOIN pred p USING (doc_id)
    ),
    cls AS (SELECT DISTINCT lang FROM cm),
    st AS (
        SELECT c.lang,
               sum(CASE WHEN cm.lang = c.lang AND cm.lang_pred = c.lang
                        THEN 1 ELSE 0 END) AS tp,
               sum(CASE WHEN cm.lang <> c.lang AND cm.lang_pred = c.lang
                        THEN 1 ELSE 0 END) AS fp,
               sum(CASE WHEN cm.lang = c.lang AND cm.lang_pred <> c.lang
                        THEN 1 ELSE 0 END) AS fn
        FROM cls c, cm GROUP BY c.lang
    ),
    f AS (
        SELECT lang,
               CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) ELSE 0.0 END AS prec,
               CASE WHEN tp + fn > 0 THEN tp * 1.0 / (tp + fn) ELSE 0.0 END AS rec
        FROM st
    ),
    g AS (
        SELECT lang, prec, rec,
               CASE WHEN prec + rec > 0 THEN 2 * prec * rec / (prec + rec)
                    ELSE 0.0 END AS f1
        FROM f
    )
    SELECT lang, round(prec, 6) AS precision, round(rec, 6) AS recall,
           round(f1, 6) AS f1
    FROM g
    UNION ALL
    SELECT '__macro__', round(avg(prec), 6), round(avg(rec), 6),
           round(avg(f1), 6)
    FROM g
    ORDER BY lang
"""
)


SQL_QUERIES["event_order_pairs"] = q_event_order_pairs


ORACLE_SQL["event_order_pairs"] = """
    WITH mm AS (
        SELECT user_id, event_type, min(ts) AS mn, max(ts) AS mx
        FROM events GROUP BY user_id, event_type
    ),
    pairs AS (
        SELECT a.event_type AS antecedent, b.event_type AS consequent,
               count(*) AS n_users
        FROM mm a JOIN mm b
          ON a.user_id = b.user_id
         AND a.event_type <> b.event_type
         AND a.mn < b.mx
        GROUP BY 1, 2
    ),
    tot AS (SELECT greatest(count(DISTINCT user_id), 1) AS n FROM events)
    SELECT antecedent, consequent, CAST(n_users AS BIGINT) AS n_users,
           round(n_users * 1.0 / tot.n, 6) AS support
    FROM pairs, tot ORDER BY antecedent, consequent
"""


SQL_QUERIES["cusum_changepoints"] = q_cusum_changepoints


ORACLE_SQL["cusum_changepoints"] = """
    WITH RECURSIVE d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    st AS (SELECT avg(n) AS mu, stddev_pop(n) AS sig FROM d),
    r AS (
        SELECT day, n,
               CASE WHEN st.sig > 0
                    THEN round((n - st.mu) / st.sig, 9) ELSE 0.0 END AS z,
               row_number() OVER (ORDER BY day) AS rk
        FROM d, st
    ),
    c(rk, sp, sn) AS (
        SELECT rk, greatest(0.0, z - 0.5), greatest(0.0, -z - 0.5)
        FROM r WHERE rk = 1
        UNION ALL
        SELECT r.rk,
               greatest(0.0, c.sp + r.z - 0.5),
               greatest(0.0, c.sn - r.z - 0.5)
        FROM c JOIN r ON r.rk = c.rk + 1
    )
    SELECT r.day, CAST(r.n AS BIGINT) AS n_events, r.z,
           round(c.sp, 4) AS s_pos, round(c.sn, 4) AS s_neg,
           CAST(CASE WHEN c.sp > 4.0 OR c.sn > 4.0 THEN 1 ELSE 0 END AS BIGINT)
               AS alarm
    FROM r JOIN c USING (rk) ORDER BY r.day
"""


SQL_QUERIES["holt_linear"] = q_holt_linear


ORACLE_SQL["holt_linear"] = """
    WITH RECURSIVE d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    r AS (
        SELECT day, n,
               coalesce(lead(n) OVER (ORDER BY day), n) AS n2,
               row_number() OVER (ORDER BY day) AS rk
        FROM d
    ),
    e(rk, l, b) AS (
        SELECT rk, CAST(n AS DOUBLE), CAST(n2 - n AS DOUBLE)
        FROM r WHERE rk = 1
        UNION ALL
        SELECT r.rk,
               0.5 * r.n + 0.5 * (e.l + e.b),
               0.3 * ((0.5 * r.n + 0.5 * (e.l + e.b)) - e.l) + 0.7 * e.b
        FROM e JOIN r ON r.rk = e.rk + 1
    )
    SELECT r.day, CAST(r.n AS BIGINT) AS n_events,
           round(e.l, 4) AS level, round(e.b, 4) AS trend,
           round(e.l + e.b, 4) AS forecast
    FROM r JOIN e USING (rk) ORDER BY r.day
"""


SQL_QUERIES["v_measure"] = q_v_measure


ORACLE_SQL["v_measure"] = """
    WITH cdef AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cx
        FROM embeddings WHERE vec_id < 8
    ),
    assign AS (
        SELECT e.vec_id, e.label, c.cid AS cluster,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.embedding::DOUBLE[], c.cx),
                                           c.cid) AS rn
        FROM embeddings e CROSS JOIN cdef c
    ),
    cm AS (
        SELECT cluster, label, count(*)::DOUBLE AS c
        FROM assign WHERE rn = 1 GROUP BY 1, 2
    ),
    tot AS (SELECT sum(c) AS n FROM cm),
    mk AS (SELECT cluster, sum(c) AS nk FROM cm GROUP BY cluster),
    ml AS (SELECT label, sum(c) AS nl FROM cm GROUP BY label),
    hc AS (
        SELECT -sum((nl / n) * ln(nl / n) ORDER BY label) AS v
        FROM ml, tot
    ),
    hk AS (
        SELECT -sum((nk / n) * ln(nk / n) ORDER BY cluster) AS v
        FROM mk, tot
    ),
    hck AS (
        SELECT -sum((c / n) * ln(c / nk) ORDER BY cluster, label) AS v
        FROM cm JOIN mk USING (cluster), tot
    ),
    hkc AS (
        SELECT -sum((c / n) * ln(c / nl) ORDER BY cluster, label) AS v
        FROM cm JOIN ml USING (label), tot
    ),
    f AS (
        SELECT CASE WHEN hc.v = 0 THEN 1.0 ELSE 1.0 - hck.v / hc.v END AS hom,
               CASE WHEN hk.v = 0 THEN 1.0 ELSE 1.0 - hkc.v / hk.v END AS com
        FROM hc, hk, hck, hkc
    )
    SELECT (SELECT count(*) FROM mk) AS n_clusters,
           (SELECT count(*) FROM ml) AS n_labels,
           round(hom, 6) AS homogeneity,
           round(com, 6) AS completeness,
           round(CASE WHEN hom + com = 0 THEN 0.0
                      ELSE 2 * hom * com / (hom + com) END, 6) AS v_measure
    FROM f
"""


SQL_QUERIES["ktruss_peel"] = q_ktruss_peel


ORACLE_SQL["ktruss_peel"] = """
    WITH base AS (
        SELECT DISTINCT least(user_id % 50, (user_id * 13 + event_id) % 50) AS a,
               greatest(user_id % 50, (user_id * 13 + event_id) % 50) AS b
        FROM events
        WHERE user_id % 50 <> (user_id * 13 + event_id) % 50
    ),
    adj0 AS (SELECT a AS u, b AS v FROM base UNION ALL SELECT b, a FROM base),
    sup0 AS (
        SELECT e.a, e.b, count(n2.v) AS s
        FROM base e
        LEFT JOIN adj0 n1 ON n1.u = e.a
        LEFT JOIN adj0 n2 ON n2.u = e.b AND n2.v = n1.v
        GROUP BY e.a, e.b
    ),
    e1 AS (SELECT a, b FROM sup0 WHERE s >= 2),
    adj1 AS (SELECT a AS u, b AS v FROM e1 UNION ALL SELECT b, a FROM e1),
    sup1 AS (
        SELECT e.a, e.b, count(n2.v) AS s
        FROM e1 e
        LEFT JOIN adj1 n1 ON n1.u = e.a
        LEFT JOIN adj1 n2 ON n2.u = e.b AND n2.v = n1.v
        GROUP BY e.a, e.b
    ),
    e2 AS (SELECT a, b FROM sup1 WHERE s >= 2)
    SELECT CAST(1 AS BIGINT) AS round,
           (SELECT count(*) FROM base) AS n_edges_before,
           (SELECT count(*) FROM base) - (SELECT count(*) FROM e1) AS n_removed,
           (SELECT count(*) FROM e1) AS n_edges_after,
           coalesce((SELECT min(s) FROM sup0), 0) AS min_support,
           coalesce((SELECT max(s) FROM sup0), 0) AS max_support
    UNION ALL
    SELECT 2,
           (SELECT count(*) FROM e1),
           (SELECT count(*) FROM e1) - (SELECT count(*) FROM e2),
           (SELECT count(*) FROM e2),
           coalesce((SELECT min(s) FROM sup1), 0),
           coalesce((SELECT max(s) FROM sup1), 0)
    ORDER BY round
"""


SQL_QUERIES["interval_overlap_join"] = q_interval_overlap_join


ORACLE_SQL["interval_overlap_join"] = """
    WITH hours AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w, count(*) AS n
        FROM events GROUP BY 1
    ),
    win AS (
        SELECT w, n FROM hours
        QUALIFY row_number() OVER (ORDER BY n DESC, w) <= 5
    ),
    es AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    sid AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS s
        FROM es
    ),
    sess AS (
        SELECT user_id, s, min(ts) AS st, max(ts) AS en
        FROM sid GROUP BY 1, 2
    )
    SELECT win.w AS window_start, CAST(win.n AS BIGINT) AS n_events,
           CAST(count(sess.user_id) AS BIGINT) AS n_sessions
    FROM win LEFT JOIN sess
      ON sess.st < win.w + INTERVAL 1 HOUR AND sess.en >= win.w
    GROUP BY win.w, win.n ORDER BY window_start
"""


SQL_QUERIES["ams_f2"] = q_ams_f2


ORACLE_SQL["ams_f2"] = r"""
    WITH tok AS (
        SELECT unnest(regexp_extract_all(text, '\S+')) AS t FROM documents
    ),
    vocab AS (SELECT t, count(*)::BIGINT AS c FROM tok GROUP BY t),
    signs AS (
        SELECT v.t, v.c, r.j,
               CASE WHEN md5_number_lower(v.t || '#' || r.j) % 2 = 1
                    THEN 1 ELSE -1 END AS s
        FROM vocab v, range(0, 8) r(j)
    ),
    z AS (SELECT j, sum(s * c) AS z FROM signs GROUP BY j),
    est AS (SELECT list_sort(list(CAST(z AS DOUBLE) * z)) AS arr FROM z),
    ex AS (SELECT sum(c * c) AS f2, count(*) AS n FROM vocab)
    SELECT CAST(ex.n AS BIGINT) AS n_tokens,
           CAST(ex.f2 AS BIGINT) AS f2_exact,
           (est.arr[4] + est.arr[5]) / 2.0 AS f2_est,
           round(abs((est.arr[4] + est.arr[5]) / 2.0 - ex.f2) / ex.f2, 6)
               AS rel_error
    FROM ex, est
"""


SQL_QUERIES["blocking_quality"] = q_blocking_quality


ORACLE_SQL["blocking_quality"] = r"""
    WITH toks AS (
        SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    f AS (
        SELECT doc_id, text,
               list_aggregate(t[1:2], 'string_agg', ' ') AS k
        FROM toks
    ),
    r AS (
        SELECT doc_id, text, row_number() OVER (ORDER BY k, doc_id) AS rn
        FROM f
    ),
    nn AS (SELECT count(*) AS n FROM r),
    cand AS (SELECT sum(least(3, nn.n - rn)) AS c FROM r, nn),
    tp AS (
        SELECT coalesce(sum(g * (g - 1) // 2), 0) AS c
        FROM (SELECT count(*) AS g FROM documents GROUP BY text)
    ),
    cg AS (
        SELECT count(*) AS c
        FROM r a JOIN r b
          ON b.rn BETWEEN a.rn + 1 AND a.rn + 3 AND a.text = b.text
    )
    SELECT CAST(nn.n AS BIGINT) AS n_docs,
           CAST(cand.c AS BIGINT) AS n_candidates,
           CAST(tp.c AS BIGINT) AS n_true_pairs,
           CAST(cg.c AS BIGINT) AS n_caught,
           round(1.0 - cand.c / (nn.n * (nn.n - 1) / 2.0), 6) AS reduction_ratio,
           CASE WHEN tp.c > 0 THEN round(cg.c * 1.0 / tp.c, 6) ELSE 1.0 END
               AS completeness
    FROM nn, cand, tp, cg
"""


SQL_QUERIES["cube_agg"] = q_cube_agg


ORACLE_SQL["cube_agg"] = """
    SELECT coalesce(event_type, '__all__') AS event_type,
           CAST(coalesce(dayofweek(ts), -1) AS BIGINT) AS dow,
           round(sum(value), 2) AS sum_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY CUBE (event_type, dayofweek(ts))
    ORDER BY event_type, dow
"""


SQL_QUERIES["hll_groups"] = q_hll_groups


ORACLE_SQL["hll_groups"] = """
    WITH pairs AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    h AS (
        SELECT event_type,
               md5_number_lower(CAST(user_id AS VARCHAR)) AS hv
        FROM pairs
    ),
    b AS (
        SELECT event_type, CAST(hv % 16 AS BIGINT) AS bucket,
               CAST((hv // 16) % 1099511627776 AS BIGINT) AS v
        FROM h
    ),
    r AS (
        SELECT event_type, bucket,
               CASE WHEN v = 0 THEN 41 ELSE length(bin(v & -v)) END AS rho
        FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM pairs),
    grid AS (
        SELECT types.event_type, t.i AS bucket
        FROM types, range(0, 16) t(i)
    ),
    reg AS (
        SELECT grid.event_type, grid.bucket,
               coalesce(max(r.rho), 0) AS register
        FROM grid LEFT JOIN r
          ON r.event_type = grid.event_type AND r.bucket = grid.bucket
        GROUP BY grid.event_type, grid.bucket
    ),
    est AS (
        SELECT event_type,
               0.673 * 256.0 / sum(power(2.0, -register)) AS e
        FROM reg GROUP BY event_type
    ),
    td AS (SELECT event_type, count(*) AS d FROM pairs GROUP BY event_type)
    SELECT est.event_type, round(est.e, 4) AS raw_estimate,
           CAST(td.d AS BIGINT) AS true_distinct,
           round(abs(est.e - td.d) / td.d, 4) AS rel_error
    FROM est JOIN td USING (event_type)
    ORDER BY est.event_type
"""


SQL_QUERIES["mojibake_screen"] = q_mojibake_screen


ORACLE_SQL["mojibake_screen"] = r"""
    WITH per AS (
        SELECT source,
               CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END AS moji,
               CASE WHEN regexp_matches(text,
                    '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END AS ctrl,
               CASE WHEN length(text) > 0
                         AND len(regexp_extract_all(text, '[^\x00-\x7F]'))
                             * 1.0 / length(text) > 0.3
                    THEN 1 ELSE 0 END AS heavy
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(moji) AS BIGINT) AS n_mojibake,
           CAST(sum(ctrl) AS BIGINT) AS n_control,
           CAST(sum(heavy) AS BIGINT) AS n_nonascii_heavy,
           CAST(sum(greatest(moji, ctrl, heavy)) AS BIGINT) AS n_flagged,
           round(sum(greatest(moji, ctrl, heavy)) * 1.0 / count(*), 6)
               AS flag_rate
    FROM per GROUP BY source ORDER BY source
"""


SQL_QUERIES["vocab_js_drift"] = q_vocab_js_drift


ORACLE_SQL["vocab_js_drift"] = r"""
    WITH tok AS (
        SELECT doc_id % 2 AS half,
               unnest(regexp_extract_all(text, '\S+')) AS t
        FROM documents
    ),
    c AS (
        SELECT t,
               sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::DOUBLE AS c0,
               sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::DOUBLE AS c1
        FROM tok GROUP BY t
    ),
    tt AS (SELECT sum(c0) AS t0, sum(c1) AS t1 FROM c),
    terms AS (
        SELECT
            CASE WHEN c0 > 0 THEN (c0 / t0)
                 * ln((c0 / t0) / ((c0 / t0 + c1 / t1) / 2)) ELSE 0 END
          + CASE WHEN c1 > 0 THEN (c1 / t1)
                 * ln((c1 / t1) / ((c0 / t0 + c1 / t1) / 2)) ELSE 0 END AS term,
            c0, c1
        FROM c, tt
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tokens_union,
           CAST(sum(CASE WHEN c0 > 0 AND c1 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_only_first,
           CAST(sum(CASE WHEN c1 > 0 AND c0 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_only_second,
           round(0.5 * sum(term), 6) AS js_divergence
    FROM terms
"""


SQL_QUERIES["adjacent_lcp"] = q_adjacent_lcp


ORACLE_SQL["adjacent_lcp"] = """
    WITH r AS (
        SELECT text, row_number() OVER (ORDER BY text, doc_id) AS rn
        FROM documents
    ),
    p AS (
        SELECT substr(a.text, 1, 32) AS ta, substr(b.text, 1, 32) AS tb
        FROM r a JOIN r b ON b.rn = a.rn + 1
    ),
    l AS (
        SELECT (SELECT max(j.i) FROM range(0, 33) j(i)
                WHERE substr(ta, 1, CAST(j.i AS INT))
                      = substr(tb, 1, CAST(j.i AS INT))) AS lcp
        FROM p
    )
    SELECT CAST(lcp AS BIGINT) AS lcp, CAST(count(*) AS BIGINT) AS n_pairs
    FROM l GROUP BY lcp ORDER BY lcp
"""


SQL_QUERIES["soft404_screen"] = q_soft404_screen


ORACLE_SQL["soft404_screen"] = r"""
    WITH f AS (
        SELECT source,
               CASE WHEN regexp_matches(lower(text),
                        'page not found|error 404|no longer (exists|available)|does not exist|page unavailable')
                    OR len(regexp_split_to_array(trim(text), '\s+')) < 5
                    THEN 1 ELSE 0 END AS fl
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(fl) AS BIGINT) AS n_flagged,
           round(sum(fl) * 1.0 / count(*), 6) AS rate
    FROM f GROUP BY source ORDER BY source
"""


SQL_QUERIES["perplexity_buckets"] = q_perplexity_buckets


ORACLE_SQL["perplexity_buckets"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS token FROM toks),
    cnt AS (SELECT token, count(*) AS c FROM w GROUP BY token),
    tot AS (SELECT count(*) AS s FROM w),
    sc AS (
        SELECT w.doc_id,
               round(sum(ln(cnt.c * 1.0 / tot.s)) / count(*), 6) AS score,
               count(*) AS nt
        FROM w JOIN cnt USING (token) CROSS JOIN tot
        GROUP BY w.doc_id
    ),
    b AS (
        SELECT ntile(3) OVER (ORDER BY score DESC, doc_id) AS bi, nt, score
        FROM sc
    )
    SELECT CASE bi WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           round(sum(score) / count(*), 6) AS mean_logprob
    FROM b GROUP BY bi ORDER BY 1
"""


SQL_QUERIES["kruskal_wallis"] = q_kruskal_wallis


ORACLE_SQL["kruskal_wallis"] = r"""
    WITH h AS (
        SELECT value AS v, event_type AS g, count(*) AS c
        FROM events GROUP BY v, g
    ),
    m AS (SELECT v, sum(c) AS m FROM h GROUP BY v),
    a AS (
        SELECT v, m,
               coalesce(sum(m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a
        FROM m
    ),
    s AS (
        SELECT h.g, sum(h.c * (2 * a.a + a.m + 1)) AS s2, sum(h.c) AS n
        FROM h JOIN a USING (v) GROUP BY h.g
    ),
    tot AS (SELECT sum(n) AS nt, count(*) AS k FROM s),
    tie AS (SELECT sum(m * m * m - m) AS t FROM m),
    stat AS (
        SELECT 12.0 / (tot.nt * (tot.nt + 1.0))
                   * (SELECT sum(s2 * s2 / (4.0 * n)) FROM s)
               - 3.0 * (tot.nt + 1.0) AS h_raw,
               1.0 - tie.t / (tot.nt * tot.nt * tot.nt * 1.0 - tot.nt) AS corr,
               tot.nt AS nt, tot.k AS k
        FROM tot, tie
    )
    SELECT CAST(nt AS BIGINT) AS n_total,
           CAST(k AS BIGINT) AS n_groups,
           round(h_raw, 6) AS h,
           round(h_raw / corr, 6) AS h_corrected
    FROM stat
"""


SQL_QUERIES["theil_sen"] = q_theil_sen


ORACLE_SQL["theil_sen"] = """
    WITH d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    r AS (SELECT n, row_number() OVER (ORDER BY day) AS rk FROM d),
    p AS (
        SELECT (b.n - a.n) * 1.0 / (b.rk - a.rk) AS s
        FROM r a JOIN r b ON b.rk > a.rk
    ),
    sl AS (SELECT median(s) AS slope FROM p),
    ic AS (
        SELECT median(r.n - sl.slope * r.rk) AS intercept
        FROM r, sl
    )
    SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS n_days,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_pairs,
           round(sl.slope, 6) AS slope,
           round(ic.intercept, 6) AS intercept
    FROM sl, ic
"""


SQL_QUERIES["page_hinkley"] = q_page_hinkley


ORACLE_SQL["page_hinkley"] = """
    WITH d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    m AS (
        SELECT day, n,
               sum(n) OVER w * 1.0 / count(*) OVER w AS rm
        FROM d
        WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    p AS (
        SELECT day, n, rm,
               sum(n - rm - 0.5) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS ph
        FROM m
    ),
    q AS (
        SELECT day, n, rm, ph,
               min(ph) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS phm
        FROM p
    )
    SELECT day, CAST(n AS BIGINT) AS n_events,
           round(rm, 6) AS running_mean,
           round(ph, 6) AS ph,
           CAST(CASE WHEN ph - phm > 10.0 THEN 1 ELSE 0 END AS BIGINT) AS alarm
    FROM q ORDER BY day
"""


SQL_QUERIES["dow_seasonality"] = q_dow_seasonality


ORACLE_SQL["dow_seasonality"] = """
    WITH d AS (
        SELECT time_bucket(INTERVAL 1 DAY, ts) AS day, count(*) AS n
        FROM events GROUP BY day
    ),
    st AS (SELECT sum(n) * 1.0 / count(*) AS mu FROM d),
    tot AS (SELECT sum((n - st.mu) * (n - st.mu)) AS ss FROM d, st),
    g AS (
        SELECT isodow(day) AS isodow, count(*) AS n_days,
               sum(n) * 1.0 / count(*) AS mw
        FROM d GROUP BY isodow
    )
    SELECT g.isodow, CAST(g.n_days AS BIGINT) AS n_days,
           round(g.mw, 6) AS mean_n,
           CASE WHEN tot.ss > 0 THEN
               round((SELECT sum((d2.n - g.mw) * (d2.n - g.mw)) FROM d d2
                      WHERE isodow(d2.day) = g.isodow) / tot.ss, 6)
           ELSE 0.0 END AS var_share
    FROM g, tot ORDER BY g.isodow
"""


SQL_QUERIES["mmr_select"] = q_mmr_select


ORACLE_SQL["mmr_select"] = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT v FROM e WHERE vec_id = 0),
    r AS (
        SELECT e.vec_id, e.v, list_cosine_similarity(e.v, q.v) AS rel
        FROM e, q WHERE e.vec_id != 0
    ),
    p1 AS (SELECT vec_id, v, 0.7 * rel AS sc FROM r
           ORDER BY sc DESC, vec_id LIMIT 1),
    s2 AS (
        SELECT r.vec_id, r.v,
               0.7 * r.rel - 0.3 * max(list_cosine_similarity(r.v, c.v)) AS sc
        FROM r, p1 c WHERE r.vec_id NOT IN (SELECT vec_id FROM p1)
        GROUP BY r.vec_id, r.v, r.rel
    ),
    p2 AS (SELECT vec_id, v, sc FROM s2 ORDER BY sc DESC, vec_id LIMIT 1),
    c2 AS (SELECT vec_id, v FROM p1 UNION ALL SELECT vec_id, v FROM p2),
    s3 AS (
        SELECT r.vec_id, r.v,
               0.7 * r.rel - 0.3 * max(list_cosine_similarity(r.v, c.v)) AS sc
        FROM r, c2 c WHERE r.vec_id NOT IN (SELECT vec_id FROM c2)
        GROUP BY r.vec_id, r.v, r.rel
    ),
    p3 AS (SELECT vec_id, v, sc FROM s3 ORDER BY sc DESC, vec_id LIMIT 1),
    c3 AS (SELECT vec_id, v FROM c2 UNION ALL SELECT vec_id, v FROM p3),
    s4 AS (
        SELECT r.vec_id, r.v,
               0.7 * r.rel - 0.3 * max(list_cosine_similarity(r.v, c.v)) AS sc
        FROM r, c3 c WHERE r.vec_id NOT IN (SELECT vec_id FROM c3)
        GROUP BY r.vec_id, r.v, r.rel
    ),
    p4 AS (SELECT vec_id, v, sc FROM s4 ORDER BY sc DESC, vec_id LIMIT 1),
    c4 AS (SELECT vec_id, v FROM c3 UNION ALL SELECT vec_id, v FROM p4),
    s5 AS (
        SELECT r.vec_id, r.v,
               0.7 * r.rel - 0.3 * max(list_cosine_similarity(r.v, c.v)) AS sc
        FROM r, c4 c WHERE r.vec_id NOT IN (SELECT vec_id FROM c4)
        GROUP BY r.vec_id, r.v, r.rel
    ),
    p5 AS (SELECT vec_id, v, sc FROM s5 ORDER BY sc DESC, vec_id LIMIT 1)
    SELECT 1 AS step, vec_id, round(sc, 4) AS score FROM p1
    UNION ALL SELECT 2, vec_id, round(sc, 4) FROM p2
    UNION ALL SELECT 3, vec_id, round(sc, 4) FROM p3
    UNION ALL SELECT 4, vec_id, round(sc, 4) FROM p4
    UNION ALL SELECT 5, vec_id, round(sc, 4) FROM p5
    ORDER BY step
"""


SQL_QUERIES["event_dispersion"] = q_event_dispersion


ORACLE_SQL["event_dispersion"] = """
    WITH d AS (
        SELECT event_type,
               strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY event_type, day
    ),
    g AS (
        SELECT event_type, count(*) AS nd,
               sum(n) * 1.0 / count(*) AS mean_n,
               sum(n * n) * 1.0 / count(*)
                   - (sum(n) * 1.0 / count(*)) * (sum(n) * 1.0 / count(*)) AS v
        FROM d GROUP BY event_type
    )
    SELECT event_type, CAST(nd AS BIGINT) AS n_days,
           round(mean_n, 6) AS mean_n,
           round(v / mean_n, 6) AS fano
    FROM g ORDER BY event_type
"""


SQL_QUERIES["sq8_error"] = q_sq8_error


ORACLE_SQL["sq8_error"] = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    u AS (
        SELECT e.vec_id, ge.i, e.v[ge.i] AS val
        FROM e, LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS i) ge
    ),
    lim AS (SELECT i, min(val) AS mn, (max(val) - min(val)) / 255.0 AS s
            FROM u GROUP BY i),
    q AS (
        SELECT u.vec_id,
               CASE WHEN lim.s = 0 THEN 0.0
                    ELSE (lim.mn + round((u.val - lim.mn) / lim.s, 0) * lim.s)
                         - u.val END AS err
        FROM u JOIN lim USING (i)
    )
    SELECT CAST((SELECT count(DISTINCT vec_id) FROM e) AS BIGINT) AS n_vecs,
           CAST((SELECT count(*) FROM lim) AS BIGINT) AS n_dims,
           round(sum(err * err) / count(*), 9) AS mse,
           round(max(abs(err)), 9) AS max_abs_err
    FROM q
"""


SQL_QUERIES["psi_drift"] = q_psi_drift


ORACLE_SQL["psi_drift"] = r"""
    WITH b AS (
        SELECT len(regexp_split_to_array(trim(text), '\s+')) // 10 AS bin,
               CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS ev
        FROM documents
    ),
    h AS (
        SELECT bin, sum(ev) AS n_even, sum(1 - ev) AS n_odd
        FROM b GROUP BY bin
    ),
    t AS (
        SELECT sum(n_even) + count(*) AS te, sum(n_odd) + count(*) AS t_o,
               sum(n_even) AS se, sum(n_odd) AS so, count(*) AS nb
        FROM h
    )
    SELECT CAST(t.nb AS BIGINT) AS n_bins,
           CAST(t.se AS BIGINT) AS n_even,
           CAST(t.so AS BIGINT) AS n_odd,
           round((SELECT sum(((n_even + 1.0) / t.te - (n_odd + 1.0) / t.t_o)
                             * ln(((n_even + 1.0) / t.te)
                                  / ((n_odd + 1.0) / t.t_o))) FROM h), 6) AS psi
    FROM t
"""


SQL_QUERIES["triplet_violation"] = q_triplet_violation


ORACLE_SQL["triplet_violation"] = """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    pos AS (
        SELECT vec_id AS anchor,
               lead(v) OVER (PARTITION BY label ORDER BY vec_id) AS pv
        FROM e
    ),
    neg AS (
        SELECT vec_id AS anchor, v AS av,
               lead(v) OVER (ORDER BY vec_id) AS ngv,
               label, lead(label) OVER (ORDER BY vec_id) AS nl
        FROM e
    ),
    t AS (
        SELECT list_cosine_similarity(n.av, p.pv) AS cp,
               list_cosine_similarity(n.av, n.ngv) AS cn
        FROM neg n JOIN pos p USING (anchor)
        WHERE n.nl IS NOT NULL AND n.label != n.nl AND p.pv IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triplets,
           CAST(sum(CASE WHEN cp < cn + 0.05 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations,
           CASE WHEN count(*) > 0 THEN
               round(sum(CASE WHEN cp < cn + 0.05 THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6)
           ELSE 0.0 END AS violation_rate
    FROM t
"""


SQL_QUERIES["mattr"] = q_mattr


ORACLE_SQL["mattr"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(t) < 50 THEN
               round(len(list_distinct(t)) * 1.0 / len(t), 6)
           ELSE
               round(list_sum(list_transform(range(1, len(t) - 48),
                                             i -> len(list_distinct(t[i:i+49]))))
                     * 1.0 / (50 * (len(t) - 49)), 6)
           END AS mattr
    FROM toks ORDER BY doc_id
"""


SQL_QUERIES["depth_quality_decay"] = q_depth_quality_decay


ORACLE_SQL["depth_quality_decay"] = r"""
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
    toks AS (
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
    q AS (
        SELECT ws.doc_id, ws.n,
               CASE WHEN ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
                     AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
                    THEN 1 ELSE 0 END AS keep
        FROM ws LEFT JOIN tp USING (doc_id)
    )
    SELECT f.depth, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(q.keep) AS BIGINT) AS n_keep,
           round(sum(q.keep) * 1.0 / count(*), 6) AS keep_rate,
           round(sum(q.n) * 1.0 / count(*), 6) AS mean_tokens
    FROM f JOIN q ON q.doc_id = f.doc
    GROUP BY f.depth ORDER BY f.depth
"""


SQL_QUERIES["mase_daily"] = q_mase_daily


ORACLE_SQL["mase_daily"] = """
    WITH d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    l AS (
        SELECT n, lag(n, 1) OVER (ORDER BY day) AS n1,
               lag(n, 7) OVER (ORDER BY day) AS n7
        FROM d
    ),
    s AS (
        SELECT avg(abs(n - n1)) FILTER (n1 IS NOT NULL) AS mae_n,
               avg(abs(n - n7)) FILTER (n7 IS NOT NULL) AS mae_s,
               count(*) FILTER (n7 IS NOT NULL) AS k7
        FROM l
    )
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           round(coalesce(mae_n, 0.0), 6) AS mae_naive,
           round(coalesce(mae_s, 0.0), 6) AS mae_seasonal,
           CASE WHEN k7 > 0 AND mae_n > 0
                THEN round(mae_s / mae_n, 6) ELSE 0.0 END AS mase
    FROM s
"""


SQL_QUERIES["pagerank_convergence"] = q_pagerank_convergence


ORACLE_SQL["pagerank_convergence"] = _pagerank_conv_oracle_sql()


SQL_QUERIES["split_leakage"] = q_split_leakage


ORACLE_SQL["split_leakage"] = (
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
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM doubled a JOIN doubled b
              ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        sp AS (
            SELECT least(
                       CASE WHEN md5_number_lower(CAST(doc_a AS VARCHAR)) % 100 < 80 THEN 'train'
                            WHEN md5_number_lower(CAST(doc_a AS VARCHAR)) % 100 < 90 THEN 'val'
                            ELSE 'test' END,
                       CASE WHEN md5_number_lower(CAST(doc_b AS VARCHAR)) % 100 < 80 THEN 'train'
                            WHEN md5_number_lower(CAST(doc_b AS VARCHAR)) % 100 < 90 THEN 'val'
                            ELSE 'test' END) AS split_a,
                   greatest(
                       CASE WHEN md5_number_lower(CAST(doc_a AS VARCHAR)) % 100 < 80 THEN 'train'
                            WHEN md5_number_lower(CAST(doc_a AS VARCHAR)) % 100 < 90 THEN 'val'
                            ELSE 'test' END,
                       CASE WHEN md5_number_lower(CAST(doc_b AS VARCHAR)) % 100 < 80 THEN 'train'
                            WHEN md5_number_lower(CAST(doc_b AS VARCHAR)) % 100 < 90 THEN 'val'
                            ELSE 'test' END) AS split_b
            FROM pairs
        )
        SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(CASE WHEN split_a != split_b THEN 1 ELSE 0 END AS BIGINT)
                   AS is_leakage
        FROM sp GROUP BY split_a, split_b ORDER BY split_a, split_b"""
)


SQL_QUERIES["burrows_delta"] = q_burrows_delta


ORACLE_SQL["burrows_delta"] = r"""
    WITH toks AS (
        SELECT source, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT source, unnest(t) AS token FROM toks),
    top AS (
        SELECT token FROM w GROUP BY token
        ORDER BY count(*) DESC, token LIMIT 20
    ),
    tot AS (SELECT source, count(*) AS n FROM w GROUP BY source),
    c AS (
        SELECT w.source, w.token, count(*) AS c
        FROM w JOIN top USING (token) GROUP BY w.source, w.token
    ),
    f AS (
        SELECT tot.source, top.token,
               coalesce(c.c, 0) * 1.0 / tot.n AS f
        FROM tot CROSS JOIN top
        LEFT JOIN c ON c.source = tot.source AND c.token = top.token
    ),
    st AS (
        SELECT token, sum(f) / count(*) AS mu,
               sqrt(sum(f * f) / count(*)
                    - (sum(f) / count(*)) * (sum(f) / count(*))) AS sig
        FROM f GROUP BY token
    ),
    z AS (
        SELECT f.source, f.token,
               CASE WHEN st.sig > 0 THEN (f.f - st.mu) / st.sig ELSE 0.0 END AS z
        FROM f JOIN st USING (token)
    )
    SELECT a.source AS source_a, b.source AS source_b,
           round(sum(abs(a.z - b.z)) / count(*), 6) AS delta
    FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
    GROUP BY a.source, b.source ORDER BY source_a, source_b
"""


SQL_QUERIES["graph_components"] = q_graph_components


ORACLE_SQL["graph_components"] = """
    WITH RECURSIVE e0 AS (
        SELECT DISTINCT user_id % 50 AS u, (user_id * 13 + event_id) % 50 AS v
        FROM events
    ),
    edges AS (
        SELECT u, v FROM e0 UNION SELECT v, u FROM e0
    ),
    reach(node, r) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
    ),
    lab AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
    FROM lab GROUP BY cluster_id ORDER BY cluster_id
"""


SQL_QUERIES["misra_gries_heavy"] = q_misra_gries_heavy


ORACLE_SQL["misra_gries_heavy"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    n AS (SELECT count(*) AS n FROM w),
    c AS (SELECT token, count(*) AS cnt FROM w GROUP BY token)
    SELECT c.token, c.cnt, round(c.cnt * 1.0 / n.n, 6) AS share
    FROM c, n WHERE c.cnt * 40 > n.n ORDER BY c.token
"""


SQL_QUERIES["source_coverage_curve"] = q_source_coverage_curve


ORACLE_SQL["source_coverage_curve"] = r"""
    WITH toks AS (
        SELECT source, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    c AS (SELECT source, sum(len(t)) AS n FROM toks GROUP BY source),
    tot AS (SELECT sum(n) AS tn FROM c),
    r AS (
        SELECT source, n,
               row_number() OVER (ORDER BY n DESC, source) AS rank,
               sum(n) OVER (ORDER BY n DESC, source
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM c
    )
    SELECT CAST(r.rank AS BIGINT) AS rank, r.source,
           CAST(r.n AS BIGINT) AS n_tokens,
           round(r.cum * 1.0 / tot.tn, 6) AS cum_share
    FROM r, tot ORDER BY r.rank
"""


SQL_QUERIES["session_threshold_sweep"] = q_session_threshold_sweep


ORACLE_SQL["session_threshold_sweep"] = """
    WITH g AS (
        SELECT user_id,
               epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   AS gap
        FROM events
    ),
    th AS (SELECT unnest([300, 1800, 7200]) AS threshold_s),
    s AS (
        SELECT th.threshold_s,
               sum(CASE WHEN g.gap IS NULL OR g.gap > th.threshold_s
                        THEN 1 ELSE 0 END) AS n_sessions,
               count(*) AS n_events
        FROM g, th GROUP BY th.threshold_s
    )
    SELECT CAST(threshold_s AS BIGINT) AS threshold_s,
           CAST(n_sessions AS BIGINT) AS n_sessions,
           round(n_events * 1.0 / n_sessions, 6) AS mean_events
    FROM s ORDER BY threshold_s
"""


SQL_QUERIES["quantile_normalize"] = q_quantile_normalize


ORACLE_SQL["quantile_normalize"] = r"""
    WITH d AS (
        SELECT lang,
               len(regexp_split_to_array(trim(text), '\s+')) AS nt
        FROM documents
    ),
    h AS (SELECT lang, nt, count(*) AS c FROM d GROUP BY lang, nt),
    n AS (SELECT lang, sum(c) AS n FROM h GROUP BY lang),
    a AS (
        SELECT lang, nt, c,
               coalesce(sum(c) OVER (PARTITION BY lang ORDER BY nt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a
        FROM h
    )
    SELECT a.lang, CAST(a.nt AS BIGINT) AS n_tokens,
           CAST(a.c AS BIGINT) AS n_docs,
           round((2 * a.a + a.c) / (2.0 * n.n), 6) AS pct
    FROM a JOIN n USING (lang) ORDER BY a.lang, n_tokens
"""


SQL_QUERIES["interarrival_burstiness"] = q_interarrival_burstiness


ORACLE_SQL["interarrival_burstiness"] = """
    WITH g AS (
        SELECT event_type,
               epoch(ts - lag(ts) OVER (PARTITION BY event_type ORDER BY ts))
                   AS gap
        FROM events
    ),
    s AS (
        SELECT event_type, count(gap) AS n,
               sum(gap) / count(gap) AS mu,
               sqrt(sum(gap * gap) / count(gap)
                    - (sum(gap) / count(gap)) * (sum(gap) / count(gap))) AS sig
        FROM g WHERE gap IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           round(mu, 6) AS mean_gap_s,
           CASE WHEN sig + mu > 0 THEN round((sig - mu) / (sig + mu), 6)
                ELSE 0.0 END AS burstiness
    FROM s ORDER BY event_type
"""


SQL_QUERIES["wilson_keep_ci"] = q_wilson_keep_ci


ORACLE_SQL["wilson_keep_ci"] = r"""
    WITH toks AS (
        SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
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
    q AS (
        SELECT toks.source,
               CASE WHEN ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
                     AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
                    THEN 1 ELSE 0 END AS keep
        FROM toks JOIN ws USING (doc_id) LEFT JOIN tp USING (doc_id)
    ),
    s AS (
        SELECT source, count(*) AS n, sum(keep) AS k,
               sum(keep) * 1.0 / count(*) AS p
        FROM q GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(p, 6) AS keep_rate,
           round(((p + 3.8416 / (2.0 * n))
                  - 1.96 * sqrt(p * (1.0 - p) / n + 3.8416 / (4.0 * n * n)))
                 / (1.0 + 3.8416 / n), 6) AS ci_lo,
           round(((p + 3.8416 / (2.0 * n))
                  + 1.96 * sqrt(p * (1.0 - p) / n + 3.8416 / (4.0 * n * n)))
                 / (1.0 + 3.8416 / n), 6) AS ci_hi
    FROM s ORDER BY source
"""


SQL_QUERIES["feature_hash_collisions"] = q_feature_hash_collisions


ORACLE_SQL["feature_hash_collisions"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    v AS (SELECT DISTINCT unnest(t) AS token FROM toks),
    b AS (
        SELECT md5_number_lower(token) % 65536 AS bucket, count(*) AS k
        FROM v GROUP BY bucket
    )
    SELECT CAST(sum(k) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_buckets_used,
           CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_colliding_buckets,
           round(sum(CASE WHEN k > 1 THEN k ELSE 0 END) * 1.0 / sum(k), 6)
               AS collision_rate
    FROM b
"""


SQL_QUERIES["srm_check"] = q_srm_check


ORACLE_SQL["srm_check"] = r"""
    WITH s AS (
        SELECT CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 80 THEN 'train'
                    WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    c AS (
        SELECT count(*) AS n,
               sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
               sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS va,
               sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS te
        FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(tr AS BIGINT) AS n_train,
           CAST(va AS BIGINT) AS n_val,
           CAST(te AS BIGINT) AS n_test,
           round((te - n * 0.1) * (te - n * 0.1) / (n * 0.1)
                 + (tr - n * 0.8) * (tr - n * 0.8) / (n * 0.8)
                 + (va - n * 0.1) * (va - n * 0.1) / (n * 0.1), 6) AS chi2
    FROM c
"""


SQL_QUERIES["source_cross_entropy"] = q_source_cross_entropy


ORACLE_SQL["source_cross_entropy"] = r"""
    WITH toks AS (
        SELECT source, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT source, unnest(t) AS token FROM toks),
    c AS (SELECT source, token, count(*) AS c FROM w GROUP BY source, token),
    tot AS (SELECT source, sum(c) AS n FROM c GROUP BY source),
    v AS (SELECT count(DISTINCT token) AS v FROM c)
    SELECT a.source AS source_a, tb.source AS source_b,
           round(-sum((a.c * 1.0 / ta.n)
                      * ln((coalesce(b.c, 0) + 1.0) / (tb.n + v.v))), 6)
               AS cross_entropy
    FROM c a
    JOIN tot ta ON ta.source = a.source
    CROSS JOIN tot tb
    CROSS JOIN v
    LEFT JOIN c b ON b.source = tb.source AND b.token = a.token
    GROUP BY a.source, tb.source ORDER BY source_a, source_b
"""


SQL_QUERIES["kendall_tau"] = q_kendall_tau


ORACLE_SQL["kendall_tau"] = r"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY day
    ),
    p AS (
        SELECT sum(CASE WHEN (b.n - a.n) * (b.cents - a.cents) > 0
                        THEN 1 ELSE 0 END) AS c,
               sum(CASE WHEN (b.n - a.n) * (b.cents - a.cents) < 0
                        THEN 1 ELSE 0 END) AS dd,
               count(*) AS n0
        FROM d a JOIN d b ON a.day < b.day
    ),
    tx AS (SELECT coalesce(sum(t * (t - 1) // 2), 0) AS n1
           FROM (SELECT count(*) AS t FROM d GROUP BY n)),
    ty AS (SELECT coalesce(sum(t * (t - 1) // 2), 0) AS n2
           FROM (SELECT count(*) AS t FROM d GROUP BY cents))
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           CAST(c AS BIGINT) AS concordant,
           CAST(dd AS BIGINT) AS discordant,
           round((c - dd) / nullif(sqrt((n0 - n1) * 1.0 * (n0 - n2)), 0), 6)
               AS tau_b
    FROM p, tx, ty
"""


SQL_QUERIES["mann_kendall"] = q_mann_kendall


ORACLE_SQL["mann_kendall"] = r"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY day
    ),
    m AS (SELECT count(*) AS m FROM d),
    s AS (
        SELECT coalesce(sum(CASE WHEN b.n > a.n THEN 1
                                 WHEN b.n < a.n THEN -1 ELSE 0 END), 0) AS s
        FROM d a JOIN d b ON a.day < b.day
    ),
    t AS (SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS tt
          FROM (SELECT count(*) AS t FROM d GROUP BY n)),
    v AS (SELECT (m * (m - 1) * (2 * m + 5) - tt) / 18.0 AS var_s
          FROM m, t)
    SELECT CAST(m AS BIGINT) AS n_days,
           CAST(s AS BIGINT) AS s_stat,
           round(var_s, 6) AS var_s,
           round(CASE WHEN s > 0 AND var_s > 0 THEN (s - 1) / sqrt(var_s)
                      WHEN s < 0 AND var_s > 0 THEN (s + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z
    FROM m, s, v
"""


SQL_QUERIES["kmv_sketch"] = q_kmv_sketch


ORACLE_SQL["kmv_sketch"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    d AS (SELECT DISTINCT token FROM w),
    h AS (SELECT DISTINCT md5_number_lower(token) AS h FROM d),
    nd AS (SELECT count(*) AS nd FROM d),
    nh AS (SELECT count(*) AS nh FROM h),
    bk AS (SELECT h FROM h ORDER BY h LIMIT 16),
    kth AS (SELECT max(h) AS kth FROM bk),
    est AS (
        SELECT CASE WHEN nh < 16 THEN CAST(nh AS DOUBLE)
                    ELSE 15 * 18446744073709551616.0 / CAST(kth AS DOUBLE)
               END AS e
        FROM nh, kth
    )
    SELECT CAST(16 AS BIGINT) AS k,
           CAST(nd AS BIGINT) AS n_distinct,
           round(e, 6) AS kmv_estimate,
           round(abs(e - nd) / nullif(nd, 0), 6) AS rel_error
    FROM nd, est
"""


SQL_QUERIES["tpch_q5"] = q_tpch_q5


ORACLE_SQL["tpch_q5"] = r"""
    SELECT n_name,
           round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) / 100.0, 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


SQL_QUERIES["yule_k"] = q_yule_k


ORACLE_SQL["yule_k"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    c AS (SELECT token, count(*) AS c FROM w GROUP BY token),
    s AS (SELECT sum(c) AS n, sum(c * c) AS s2, count(*) AS v FROM c)
    SELECT CAST(n AS BIGINT) AS n_tokens,
           CAST(v AS BIGINT) AS n_types,
           round(10000.0 * (s2 - n) / (n * n), 6) AS yule_k
    FROM s
"""


SQL_QUERIES["brier_decomposition"] = q_brier_decomposition


ORACLE_SQL["brier_decomposition"] = r"""
    WITH e AS (
        SELECT user_id % 10 AS cohort,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               ts < TIMESTAMP '2024-01-16' AS is_train
        FROM events
    ),
    tr AS (SELECT cohort, sum(y) AS b, count(*) AS n FROM e WHERE is_train GROUP BY cohort),
    g  AS (SELECT sum(b) * 1.0 / sum(n) AS gp FROM tr),
    ev AS (SELECT cohort, sum(y) AS b, count(*) AS n FROM e WHERE NOT is_train GROUP BY cohort),
    p  AS (
        SELECT ev.cohort, ev.b, ev.n,
               coalesce(tr.b * 1.0 / tr.n, (SELECT gp FROM g)) AS p
        FROM ev LEFT JOIN tr ON tr.cohort = ev.cohort
    ),
    tot AS (SELECT sum(n) AS nn, sum(b) AS bb FROM p),
    dec AS (
        SELECT
            sum(n * p * p - 2 * p * b + b) / (SELECT nn FROM tot) AS brier,
            sum(n * (p - b * 1.0 / n) * (p - b * 1.0 / n))
                / (SELECT nn FROM tot) AS reliability,
            sum(n * (b * 1.0 / n - (SELECT bb * 1.0 / nn FROM tot))
                  * (b * 1.0 / n - (SELECT bb * 1.0 / nn FROM tot)))
                / (SELECT nn FROM tot) AS resolution,
            (SELECT (bb * 1.0 / nn) * (1 - bb * 1.0 / nn) FROM tot) AS uncertainty
        FROM p
    )
    SELECT CAST((SELECT nn FROM tot) AS BIGINT) AS n_eval,
           round(brier, 6) AS brier,
           round(reliability, 6) AS reliability,
           round(resolution, 6) AS resolution,
           round(uncertainty, 6) AS uncertainty
    FROM dec
"""


SQL_QUERIES["hurst_exponent"] = q_hurst_exponent


ORACLE_SQL["hurst_exponent"] = r"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY day
    ),
    r AS (SELECT n, row_number() OVER (ORDER BY day) - 1 AS rn FROM d),
    m AS (SELECT count(*) AS m FROM r),
    ws AS (SELECT unnest([4, 8, 16]) AS w),
    seg AS (
        SELECT ws.w, r.rn // ws.w AS s, r.rn % ws.w AS t, r.n
        FROM r, ws, m
        WHERE r.rn // ws.w < m.m // ws.w
    ),
    cum AS (
        SELECT w, s, t, n,
               sum(n) OVER (PARTITION BY w, s ORDER BY t) AS cn
        FROM seg
    ),
    stats AS (SELECT w, s, sum(n) AS b, sum(n * n) AS sx2 FROM seg GROUP BY w, s),
    z AS (
        SELECT c.w, c.s,
               max(c.cn - (c.t + 1) * (st.b * 1.0 / c.w)) AS zmax,
               min(c.cn - (c.t + 1) * (st.b * 1.0 / c.w)) AS zmin
        FROM cum c JOIN stats st ON st.w = c.w AND st.s = c.s
        GROUP BY c.w, c.s
    ),
    rs AS (
        SELECT z.w,
               avg((z.zmax - z.zmin)
                   / sqrt((st.sx2 - st.b * st.b * 1.0 / z.w) / z.w)) AS rs
        FROM z JOIN stats st ON st.w = z.w AND st.s = z.s
        WHERE (st.sx2 - st.b * st.b * 1.0 / z.w) > 0
        GROUP BY z.w
    ),
    fit AS (
        SELECT count(*) AS k, sum(ln(w)) AS sx, sum(ln(rs)) AS sy,
               sum(ln(w) * ln(w)) AS sxx, sum(ln(w) * ln(rs)) AS sxy
        FROM rs WHERE rs > 0
    )
    SELECT round((SELECT rs FROM rs WHERE w = 4), 6) AS rs_4,
           round((SELECT rs FROM rs WHERE w = 8), 6) AS rs_8,
           round((SELECT rs FROM rs WHERE w = 16), 6) AS rs_16,
           round(CASE WHEN k >= 2
                      THEN (k * sxy - sx * sy) / (k * sxx - sx * sx) END, 6)
               AS hurst
    FROM fit
"""


SQL_QUERIES["acf_profile"] = q_acf_profile


ORACLE_SQL["acf_profile"] = r"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY day
    ),
    r AS (SELECT n, row_number() OVER (ORDER BY day) AS rn FROM d),
    s AS (SELECT count(*) AS m, avg(n * 1.0) AS mu FROM r),
    den AS (SELECT sum((n - mu) * (n - mu)) AS den FROM r, s),
    lags AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag),
    p AS (
        SELECT l.lag, count(*) AS n_pairs,
               sum((a.n - s.mu) * (b.n - s.mu)) AS num
        FROM lags l
        JOIN r a ON true
        JOIN r b ON b.rn = a.rn + l.lag
        CROSS JOIN s
        GROUP BY l.lag
    )
    SELECT lag, CAST(n_pairs AS BIGINT) AS n_pairs,
           round(num / (SELECT den FROM den), 6) AS acf
    FROM p
    WHERE (SELECT den FROM den) > 0
    ORDER BY lag
"""


SQL_QUERIES["runs_test"] = q_runs_test


ORACLE_SQL["runs_test"] = r"""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY day
    ),
    med AS (SELECT quantile_cont(n, 0.5) AS med FROM d),
    k AS (
        SELECT day, CASE WHEN n > med THEN 1 ELSE 0 END AS b
        FROM d, med WHERE n <> med
    ),
    o AS (SELECT b, lag(b) OVER (ORDER BY day) AS pb FROM k),
    c AS (
        SELECT count(*) AS n_kept,
               coalesce(sum(b), 0) AS n1,
               count(*) - coalesce(sum(b), 0) AS n2,
               CASE WHEN count(*) > 0
                    THEN 1.0 + sum(CASE WHEN pb IS NOT NULL AND b <> pb
                                        THEN 1 ELSE 0 END) END AS runs
        FROM o
    )
    SELECT CAST(n_kept AS BIGINT) AS n_kept,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           round(runs, 6) AS runs,
           round(CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1
                       AND 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                           / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)) > 0
                      THEN (runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                           / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                                  / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))
                 END, 6) AS z
    FROM c
"""


SQL_QUERIES["mann_whitney"] = q_mann_whitney


ORACLE_SQL["mann_whitney"] = r"""
    WITH u AS (
        SELECT n_chars AS v, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS grp
        FROM documents WHERE source IN ('src0', 'src1')
    ),
    h AS (SELECT v, count(*) AS c, sum(grp) AS ca FROM u GROUP BY v),
    o AS (SELECT v, c, ca, sum(c) OVER (ORDER BY v) - c AS below FROM h),
    r AS (SELECT sum(ca * (below + (c + 1) / 2.0)) AS r1 FROM o),
    n AS (SELECT coalesce(sum(ca), 0) AS n1,
                 coalesce(sum(c - ca), 0) AS n2 FROM h),
    t AS (SELECT coalesce(sum(c * c * c - c), 0) AS tie FROM h),
    s AS (
        SELECT n1, n2, r1 - n1 * (n1 + 1) / 2.0 AS u1,
               n1 * n2 / 2.0 AS mu,
               CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1
                    THEN (n1 * n2 / 12.0)
                         * (n1 + n2 + 1.0
                            - tie / ((n1 + n2) * (n1 + n2 - 1.0))) END AS var
        FROM r, n, t
    )
    SELECT CAST(n1 AS BIGINT) AS n_a,
           CAST(n2 AS BIGINT) AS n_b,
           round(u1, 6) AS u,
           round(CASE WHEN var > 0
                      THEN (u1 - mu + CASE WHEN u1 > mu THEN -0.5
                                           WHEN u1 < mu THEN 0.5
                                           ELSE 0.0 END) / sqrt(var)
                 END, 6) AS z
    FROM s
"""


SQL_QUERIES["cramers_v"] = q_cramers_v


ORACLE_SQL["cramers_v"] = r"""
    WITH c AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source),
    rt AS (SELECT lang, sum(n) AS rn FROM c GROUP BY lang),
    ct AS (SELECT source, sum(n) AS cn FROM c GROUP BY source),
    tot AS (SELECT sum(n) AS n FROM c),
    dims AS (SELECT (SELECT count(*) FROM rt) AS r, (SELECT count(*) FROM ct) AS k),
    chi AS (
        -- zero cells count too: cross the margins, coalesce unseen cells to 0
        SELECT sum((coalesce(c.n, 0) - rt.rn * ct.cn * 1.0 / tot.n)
                   * (coalesce(c.n, 0) - rt.rn * ct.cn * 1.0 / tot.n)
                   / (rt.rn * ct.cn * 1.0 / tot.n)) AS chi2
        FROM rt CROSS JOIN ct CROSS JOIN tot
        LEFT JOIN c ON c.lang = rt.lang AND c.source = ct.source
    ),
    s AS (
        SELECT tot.n, dims.r, dims.k, chi.chi2,
               chi.chi2 / tot.n AS phi2,
               greatest(0.0, chi.chi2 / tot.n
                             - (dims.r - 1) * (dims.k - 1) * 1.0 / (tot.n - 1)) AS phi2c,
               dims.r - (dims.r - 1) * (dims.r - 1) * 1.0 / (tot.n - 1) AS rc,
               dims.k - (dims.k - 1) * (dims.k - 1) * 1.0 / (tot.n - 1) AS kc
        FROM tot, dims, chi
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(r AS BIGINT) AS n_langs,
           CAST(k AS BIGINT) AS n_sources,
           round(chi2, 6) AS chi2,
           round(CASE WHEN least(r, k) > 1
                      THEN sqrt(phi2 / (least(r, k) - 1)) END, 6) AS cramers_v,
           round(CASE WHEN n > 1 AND least(rc, kc) > 1
                      THEN sqrt(phi2c / (least(rc, kc) - 1)) END, 6)
               AS cramers_v_corrected
    FROM s
"""


SQL_QUERIES["lorenz_curve"] = q_lorenz_curve


ORACLE_SQL["lorenz_curve"] = r"""
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    o AS (
        SELECT n, row_number() OVER (ORDER BY n, user_id) AS rn,
               sum(n) OVER (ORDER BY n, user_id) AS cum
        FROM c
    ),
    t AS (SELECT count(*) AS u, sum(n) AS tot FROM c),
    d AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9, 10]) AS dec)
    SELECT d.dec AS decile,
           CAST(ceil(d.dec * t.u / 10.0) AS BIGINT) AS n_users,
           round(o.cum * 1.0 / t.tot, 6) AS cum_share
    FROM d, t
    JOIN o ON o.rn = CAST(ceil(d.dec * t.u / 10.0) AS BIGINT)
    WHERE ceil(d.dec * t.u / 10.0) >= 1
    ORDER BY decile
"""


SQL_QUERIES["chao1_vocab"] = q_chao1_vocab


ORACLE_SQL["chao1_vocab"] = r"""
    WITH tok AS (
        SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    c AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token),
    s AS (
        SELECT lang, count(*) AS vocab, sum(cnt) AS n_tokens,
               sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS f1,
               sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS f2
        FROM c GROUP BY lang
    )
    SELECT lang, CAST(vocab AS BIGINT) AS vocab,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
           round(vocab + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0)), 4) AS chao1,
           round(f1 * 1.0 / n_tokens, 6) AS gt_unseen
    FROM s ORDER BY lang
"""


SQL_QUERIES["keyness_llr"] = q_keyness_llr


ORACLE_SQL["keyness_llr"] = r"""
    WITH tok AS (
        SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    st AS (SELECT source, token, count(*) AS a FROM tok GROUP BY source, token),
    tt AS (SELECT token, sum(a) AS t FROM st GROUP BY token),
    sc AS (SELECT source, sum(a) AS c FROM st GROUP BY source),
    n AS (SELECT sum(a) AS n FROM st),
    j AS (
        SELECT st.source, st.token, st.a, tt.t - st.a AS b, sc.c,
               n.n - sc.c AS d, n.n AS n
        FROM st
        JOIN tt ON tt.token = st.token
        JOIN sc ON sc.source = st.source
        CROSS JOIN n
    ),
    g AS (
        SELECT source, token, a, b,
               round(2.0 * (a * ln(a / (c * (a + b) * 1.0 / n))
                            + CASE WHEN b > 0
                                   THEN b * ln(b / (d * (a + b) * 1.0 / n))
                                   ELSE 0 END), 6) AS g2
        FROM j WHERE a * d > b * c
    ),
    r AS (
        SELECT source, token, a, b, g2,
               row_number() OVER (PARTITION BY source ORDER BY g2 DESC, token) AS rn
        FROM g
    )
    SELECT source, token, CAST(a AS BIGINT) AS cnt_in, CAST(b AS BIGINT) AS cnt_out,
           g2, CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= 5 ORDER BY source, rank
"""


SQL_QUERIES["tpch_q10"] = q_tpch_q10


ORACLE_SQL["tpch_q10"] = r"""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
           round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


SQL_QUERIES["rfm_segments"] = q_rfm_segments


ORACLE_SQL["rfm_segments"] = r"""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    u AS (
        SELECT user_id,
               CAST(floor((epoch(mx.m) - epoch(max(ts))) / 86400.0) AS BIGINT) AS r_days,
               count(*) AS freq,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events, mx GROUP BY user_id, mx.m
    ),
    s AS (
        SELECT user_id, cents,
               ntile(5) OVER (ORDER BY r_days, user_id) AS r_seg,
               ntile(5) OVER (ORDER BY freq DESC, user_id) AS f_seg,
               ntile(5) OVER (ORDER BY cents DESC, user_id) AS m_seg
        FROM u
    )
    SELECT CAST(r_seg AS BIGINT) AS r_seg, CAST(f_seg AS BIGINT) AS f_seg,
           CAST(m_seg AS BIGINT) AS m_seg,
           count(*) AS n_users, CAST(sum(cents) AS BIGINT) AS cents
    FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


SQL_QUERIES["dau_mau"] = q_dau_mau


ORACLE_SQL["dau_mau"] = r"""
    WITH d AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
    dau AS (SELECT substr(day, 1, 7) AS month, day, count(*) AS dau FROM d GROUP BY 1, 2),
    a AS (SELECT month, count(*) AS n_days, avg(dau) AS avg_dau FROM dau GROUP BY month),
    mau AS (
        SELECT substr(day, 1, 7) AS month, count(DISTINCT user_id) AS mau
        FROM d GROUP BY 1
    )
    SELECT a.month, CAST(a.n_days AS BIGINT) AS n_days,
           round(a.avg_dau, 4) AS avg_dau, CAST(mau.mau AS BIGINT) AS mau,
           round(round(a.avg_dau, 4) / mau.mau, 6) AS stickiness
    FROM a JOIN mau ON mau.month = a.month
    ORDER BY a.month
"""


SQL_QUERIES["friedman_test"] = q_friedman_test


ORACLE_SQL["friedman_test"] = r"""
    WITH c AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type AS t, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM c),
    tps AS (SELECT DISTINCT t FROM c),
    g AS (
        SELECT days.day, tps.t, coalesce(c.n, 0) AS n
        FROM days CROSS JOIN tps
        LEFT JOIN c ON c.day = days.day AND c.t = tps.t
    ),
    rk AS (
        SELECT day, t, n,
               rank() OVER (PARTITION BY day ORDER BY n) AS mn,
               count(*) OVER (PARTITION BY day, n) AS tc
        FROM g
    ),
    r AS (SELECT day, t, mn + (tc - 1) / 2.0 AS rij FROM rk),
    rj AS (SELECT t, sum(rij) AS sumr FROM r GROUP BY t),
    st AS (
        SELECT (SELECT count(*) FROM days) AS n, (SELECT count(*) FROM tps) AS k,
               (SELECT sum(rij * rij) FROM r) AS a2,
               (SELECT sum(sumr * sumr) FROM rj) AS bsum
    )
    SELECT CAST(n AS BIGINT) AS n_days, CAST(k AS BIGINT) AS n_types,
           round(a2, 6) AS a2, round(bsum / n, 6) AS b2,
           round(CASE WHEN a2 - n * k * (k + 1) * (k + 1) / 4.0 > 0
                      THEN (k - 1) * (bsum / n - n * k * (k + 1) * (k + 1) / 4.0)
                           / (a2 - n * k * (k + 1) * (k + 1) / 4.0) END, 6) AS t1
    FROM st
"""


SQL_QUERIES["log_rank_test"] = q_log_rank_test


ORACLE_SQL["log_rank_test"] = """
    WITH su AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN su ON su.user_id = e.user_id AND e.ts > su.t0
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    mx AS (SELECT max(ts) AS m FROM events),
    obs AS (
        SELECT su.user_id % 2 AS g,
               CASE WHEN pu.t1 IS NOT NULL
                    THEN epoch_us(pu.t1) - epoch_us(su.t0)
                    ELSE epoch_us(mx.m) - epoch_us(su.t0) END AS dur,
               CASE WHEN pu.t1 IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM su LEFT JOIN pu ON pu.user_id = su.user_id CROSS JOIN mx
    ),
    tt AS (
        SELECT dur AS t, count(*) AS d,
               sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS d1
        FROM obs WHERE ev = 1 GROUP BY dur
    ),
    rk AS (
        SELECT tt.t, tt.d, tt.d1,
               (SELECT count(*) FROM obs WHERE obs.dur >= tt.t) AS n,
               (SELECT count(*) FROM obs WHERE obs.dur >= tt.t AND obs.g = 1) AS n1
        FROM tt
    ),
    st AS (
        SELECT count(*) AS n_times,
               sum(d1) AS o1,
               sum(d * n1 * 1.0 / n) AS e1,
               sum(CASE WHEN n > 1
                        THEN d * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n)
                             * (n - d) * 1.0 / (n - 1)
                        ELSE 0 END) AS v
        FROM rk
    )
    SELECT CAST(n_times AS BIGINT) AS n_times, CAST(o1 AS BIGINT) AS o1,
           round(e1, 6) AS e1, round(v, 6) AS v,
           round(CASE WHEN v > 0
                      THEN (o1 - e1) * (o1 - e1) / v END, 6) AS chi2
    FROM st
"""


SQL_QUERIES["jarque_bera"] = q_jarque_bera


ORACLE_SQL["jarque_bera"] = """
    WITH mu AS (
        SELECT event_type, sum(value) / count(*) AS mu, count(*) AS n
        FROM events GROUP BY event_type
    ),
    c AS (
        SELECT e.event_type,
               (e.value - mu.mu) * (e.value - mu.mu) AS p2,
               (e.value - mu.mu) * (e.value - mu.mu) * (e.value - mu.mu) AS p3,
               (e.value - mu.mu) * (e.value - mu.mu)
                   * (e.value - mu.mu) * (e.value - mu.mu) AS p4
        FROM events e JOIN mu ON mu.event_type = e.event_type
    ),
    s AS (
        SELECT c.event_type, mu.n,
               sum(p2) / mu.n AS m2, sum(p3) / mu.n AS m3, sum(p4) / mu.n AS m4
        FROM c JOIN mu ON mu.event_type = c.event_type
        GROUP BY c.event_type, mu.n
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
           round(m4 / (m2 * m2), 6) AS kurtosis,
           round(n / 6.0 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                 + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4.0), 6) AS jb
    FROM s ORDER BY event_type
"""


SQL_QUERIES["periodogram"] = q_periodogram


ORACLE_SQL["periodogram"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT n, row_number() OVER (ORDER BY day) - 1 AS t,
               count(*) OVER () AS m, sum(n) OVER () * 1.0 / count(*) OVER () AS mu
        FROM d
    ),
    per AS (SELECT * FROM (VALUES (2),(3),(4),(5),(6),(7),(8),(9),(10),
                                  (11),(12),(13),(14)) AS p(period)),
    term AS (
        SELECT per.period, idx.m,
               (idx.n - idx.mu) * cos(2 * pi() * idx.t / per.period) AS ct,
               (idx.n - idx.mu) * sin(2 * pi() * idx.t / per.period) AS st
        FROM per CROSS JOIN idx WHERE per.period <= idx.m
    )
    SELECT CAST(period AS BIGINT) AS period,
           round((sum(ct) * sum(ct) + sum(st) * sum(st)) / m, 6) AS power
    FROM term GROUP BY period, m ORDER BY period
"""


SQL_QUERIES["fightin_words"] = q_fightin_words


ORACLE_SQL["fightin_words"] = r"""
    WITH tok AS (
        SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents WHERE source IN ('src0', 'src1')
    ),
    c AS (
        SELECT w AS token,
               sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS y1,
               sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS y2
        FROM tok GROUP BY w
    ),
    n AS (SELECT sum(y1) * 1.0 AS n1, sum(y2) * 1.0 AS n2,
                 (sum(y1) + sum(y2)) * 1.0 AS nt FROM c),
    z AS (
        SELECT token, y1, y2,
               round((ln((y1 + 10.0 * (y1 + y2) / nt)
                         / (n1 + 10.0 - y1 - 10.0 * (y1 + y2) / nt))
                      - ln((y2 + 10.0 * (y1 + y2) / nt)
                           / (n2 + 10.0 - y2 - 10.0 * (y1 + y2) / nt)))
                     / sqrt(1.0 / (y1 + 10.0 * (y1 + y2) / nt)
                            + 1.0 / (y2 + 10.0 * (y1 + y2) / nt)), 6) AS z
        FROM c CROSS JOIN n
    ),
    ranked AS (
        SELECT token, y1, y2, z,
               row_number() OVER (ORDER BY z DESC, token) AS r_top,
               row_number() OVER (ORDER BY z ASC, token) AS r_bot
        FROM z
    )
    SELECT 'src0' AS side, CAST(r_top AS BIGINT) AS rank, token,
           CAST(y1 AS BIGINT) AS y1, CAST(y2 AS BIGINT) AS y2, z
    FROM ranked WHERE r_top <= 10
    UNION ALL
    SELECT 'src1' AS side, CAST(r_bot AS BIGINT) AS rank, token,
           CAST(y1 AS BIGINT) AS y1, CAST(y2 AS BIGINT) AS y2, z
    FROM ranked WHERE r_bot <= 10
    ORDER BY side, rank
"""


SQL_QUERIES["percentile_interp"] = q_percentile_interp


ORACLE_SQL["percentile_interp"] = """
    WITH v AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    qq AS (SELECT * FROM (VALUES (0.5), (0.9), (0.99)) AS t(q)),
    tgt AS (
        SELECT g.event_type, qq.q, qq.q * (g.n - 1) AS h,
               CAST(floor(qq.q * (g.n - 1)) AS BIGINT) AS lo,
               CAST(ceil(qq.q * (g.n - 1)) AS BIGINT) AS hi
        FROM (SELECT DISTINCT event_type, n FROM v) g CROSS JOIN qq
    )
    SELECT t.event_type, t.q,
           round(vlo.value + (t.h - floor(t.h)) * (vhi.value - vlo.value), 6) AS p
    FROM tgt t
    JOIN v vlo ON vlo.event_type = t.event_type AND vlo.rn = t.lo
    JOIN v vhi ON vhi.event_type = t.event_type AND vhi.rn = t.hi
    ORDER BY t.event_type, t.q
"""


SQL_QUERIES["mcc_binary"] = q_mcc_binary


ORACLE_SQL["mcc_binary"] = (
    "WITH pred AS (" + ORACLE_SQL["langid"] + """),
    cells AS (
        SELECT
            sum(CASE WHEN d.lang = 'en' AND p.lang_pred = 'en' THEN 1 ELSE 0 END) AS tp,
            sum(CASE WHEN d.lang <> 'en' AND p.lang_pred = 'en' THEN 1 ELSE 0 END) AS fp,
            sum(CASE WHEN d.lang = 'en' AND p.lang_pred <> 'en' THEN 1 ELSE 0 END) AS fn,
            sum(CASE WHEN d.lang <> 'en' AND p.lang_pred <> 'en' THEN 1 ELSE 0 END) AS tn
        FROM documents d JOIN pred p USING (doc_id)
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           round(CASE WHEN (tp+fp) * (tp+fn) * (tn+fp) * (tn+fn) > 0
                      THEN (tp * tn - fp * fn)
                           / sqrt((tp+fp) * 1.0 * (tp+fn) * (tn+fp) * (tn+fn))
                 END, 6) AS mcc,
           round((tp * 1.0 / (tp + fn) + tn * 1.0 / (tn + fp)) / 2.0, 6)
               AS balanced_acc,
           round(tp * 1.0 / (tp + fn) + tn * 1.0 / (tn + fp) - 1.0, 6) AS youden_j
    FROM cells
"""
)


SQL_QUERIES["pettitt_test"] = q_pettitt_test


ORACLE_SQL["pettitt_test"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    rk AS (
        SELECT day, n,
               rank() OVER (ORDER BY n) AS mn,
               count(*) OVER (PARTITION BY n) AS tc,
               count(*) OVER () AS m
        FROM d
    ),
    u AS (
        SELECT day, m,
               row_number() OVER (ORDER BY day) AS t,
               2.0 * sum(mn + (tc - 1) / 2.0) OVER (ORDER BY day)
                   - row_number() OVER (ORDER BY day) * (m + 1.0) AS ut
        FROM rk
    ),
    best AS (
        SELECT day, m, abs(ut) AS absu,
               row_number() OVER (ORDER BY abs(ut) DESC, day) AS pick
        FROM u WHERE t < m
    )
    SELECT day AS change_day, CAST(m AS BIGINT) AS m,
           round(absu, 6) AS k_stat,
           round(least(1.0, 2.0 * exp(-6.0 * absu * absu
                 / (m * m * m * 1.0 + m * m))), 6) AS p_approx
    FROM best WHERE pick = 1
"""


SQL_QUERIES["bartlett_test"] = q_bartlett_test


ORACLE_SQL["bartlett_test"] = """
    WITH mu AS (
        SELECT event_type, sum(value) / count(*) AS mu, count(*) AS n
        FROM events GROUP BY event_type
    ),
    s AS (
        SELECT e.event_type, mu.n,
               sum((e.value - mu.mu) * (e.value - mu.mu)) AS ss
        FROM events e JOIN mu ON mu.event_type = e.event_type
        GROUP BY e.event_type, mu.n
        HAVING mu.n > 1
    ),
    agg AS (
        SELECT count(*) AS k, sum(n) AS bn, sum(ss) AS sstot,
               sum((n - 1) * ln(ss / (n - 1))) AS lnsum,
               sum(1.0 / (n - 1)) AS invsum
        FROM s
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(bn AS BIGINT) AS n,
           CAST(k - 1 AS BIGINT) AS df,
           round(((bn - k) * ln(sstot / (bn - k)) - lnsum)
                 / (1.0 + (invsum - 1.0 / (bn - k)) / (3.0 * (k - 1))), 6)
               AS t_stat
    FROM agg
"""


SQL_QUERIES["err_eval"] = q_err_eval


ORACLE_SQL["err_eval"] = """
    WITH top AS (
        SELECT lang, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS i
        FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 20
    ),
    g AS (
        SELECT i, CASE WHEN lang = 'en' THEN 0.75
                       WHEN lang = 'fr' THEN 0.25 ELSE 0.0 END AS r
        FROM top
    ),
    casc AS (
        SELECT i, r,
               coalesce(exp(sum(ln(1.0 - r))
                   OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING)), 1.0) AS look
        FROM g
    )
    SELECT CAST(count(*) AS BIGINT) AS k,
           round(sum(look * r / i), 6) AS err,
           round(1.0 - exp(sum(ln(1.0 - r))), 6) AS sat_prob
    FROM casc
"""


SQL_QUERIES["simpson_diversity"] = q_simpson_diversity


ORACLE_SQL["simpson_diversity"] = """
    WITH c AS (
        SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
    ),
    t AS (SELECT source, sum(n) AS nt FROM c GROUP BY source),
    d AS (
        SELECT c.source, t.nt,
               sum((c.n * 1.0 / t.nt) * (c.n * 1.0 / t.nt)) AS dd
        FROM c JOIN t ON t.source = c.source GROUP BY c.source, t.nt
    )
    SELECT source, CAST(nt AS BIGINT) AS n_docs,
           round(dd, 6) AS simpson_d,
           round(1.0 - dd, 6) AS gini_simpson,
           round(1.0 / dd, 6) AS inv_simpson
    FROM d ORDER BY source
"""


SQL_QUERIES["dirichlet_lm"] = q_dirichlet_lm


ORACLE_SQL["dirichlet_lm"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    coll AS (SELECT sum(len(w)) * 1.0 AS ct FROM toks),
    cf AS (
        SELECT
            (SELECT count(*) FROM toks, unnest(toks.w) AS u(x) WHERE x = 'data') / ct AS p_data,
            (SELECT count(*) FROM toks, unnest(toks.w) AS u(x) WHERE x = 'query') / ct AS p_query,
            (SELECT count(*) FROM toks, unnest(toks.w) AS u(x) WHERE x = 'join') / ct AS p_join
        FROM coll
    ),
    sc AS (
        SELECT t.doc_id,
               round(
                 ln((len(list_filter(t.w, x -> x = 'data')) + 2000.0 * cf.p_data)
                    / (len(t.w) + 2000.0))
               + ln((len(list_filter(t.w, x -> x = 'query')) + 2000.0 * cf.p_query)
                    / (len(t.w) + 2000.0))
               + ln((len(list_filter(t.w, x -> x = 'join')) + 2000.0 * cf.p_join)
                    / (len(t.w) + 2000.0)), 6) AS score
        FROM toks t CROSS JOIN cf
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
           doc_id, score
    FROM sc ORDER BY score DESC, doc_id LIMIT 10
"""


SQL_QUERIES["gains_chart"] = q_gains_chart


ORACLE_SQL["gains_chart"] = """
    WITH r AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
        FROM documents
    ),
    c AS (
        SELECT decile, count(*) AS n_docs, sum(pos) AS n_pos
        FROM r GROUP BY decile
    ),
    t AS (SELECT sum(n_docs) * 1.0 AS td, sum(n_pos) * 1.0 AS tp FROM c)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_pos AS BIGINT) AS n_pos,
           round(sum(n_pos) OVER (ORDER BY decile) / t.tp, 6) AS cum_pos_share,
           round((sum(n_pos) OVER (ORDER BY decile)
                  / sum(n_docs) OVER (ORDER BY decile)) / (t.tp / t.td), 6) AS lift
    FROM c CROSS JOIN t ORDER BY decile
"""


SQL_QUERIES["attr_assortativity"] = q_attr_assortativity


ORACLE_SQL["attr_assortativity"] = f"""
    WITH e AS ({EDGES_SQL}),
    g AS (
        SELECT src % 5 AS gi, dst % 5 AS gj, count(*) AS n
        FROM e WHERE src <> dst GROUP BY 1, 2
    ),
    m AS (SELECT sum(n) * 1.0 AS m FROM g),
    tr AS (SELECT sum(n) / m.m AS trace FROM g CROSS JOIN m WHERE gi = gj GROUP BY m.m),
    ab AS (
        SELECT sum(ra.a * cb.b) AS ab_sum
        FROM (SELECT gi, sum(n) / m.m AS a FROM g CROSS JOIN m GROUP BY gi, m.m) ra
        JOIN (SELECT gj, sum(n) / m.m AS b FROM g CROSS JOIN m GROUP BY gj, m.m) cb
          ON cb.gj = ra.gi
    )
    SELECT CAST(m.m AS BIGINT) AS n_edges,
           round(tr.trace, 6) AS trace,
           round(ab.ab_sum, 6) AS ab_sum,
           round(CASE WHEN ab.ab_sum < 1.0
                      THEN (tr.trace - ab.ab_sum) / (1.0 - ab.ab_sum) END, 6)
               AS assortativity
    FROM m CROSS JOIN tr CROSS JOIN ab
"""


SQL_QUERIES["tukey_fences"] = q_tukey_fences


ORACLE_SQL["tukey_fences"] = """
    WITH v AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    qq AS (SELECT * FROM (VALUES (0.25), (0.75)) AS t(q)),
    tgt AS (
        SELECT g.event_type, qq.q, qq.q * (g.n - 1) AS h,
               CAST(floor(qq.q * (g.n - 1)) AS BIGINT) AS lo,
               CAST(ceil(qq.q * (g.n - 1)) AS BIGINT) AS hi
        FROM (SELECT DISTINCT event_type, n FROM v) g CROSS JOIN qq
    ),
    p AS (
        SELECT t.event_type, t.q,
               vlo.value + (t.h - floor(t.h)) * (vhi.value - vlo.value) AS val
        FROM tgt t
        JOIN v vlo ON vlo.event_type = t.event_type AND vlo.rn = t.lo
        JOIN v vhi ON vhi.event_type = t.event_type AND vhi.rn = t.hi
    ),
    f AS (
        SELECT q1.event_type, q1.val AS q1, q3.val AS q3,
               q1.val - 1.5 * (q3.val - q1.val) AS lo,
               q3.val + 1.5 * (q3.val - q1.val) AS hi,
               q1.val - 3.0 * (q3.val - q1.val) AS flo,
               q3.val + 3.0 * (q3.val - q1.val) AS fhi
        FROM (SELECT event_type, val FROM p WHERE q = 0.25) q1
        JOIN (SELECT event_type, val FROM p WHERE q = 0.75) q3
          ON q3.event_type = q1.event_type
    )
    SELECT f.event_type,
           round(f.q1, 6) AS q1, round(f.q3, 6) AS q3,
           round(f.q3 - f.q1, 6) AS iqr,
           CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
           CAST(sum(CASE WHEN e.value < f.flo OR e.value > f.fhi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_far
    FROM events e JOIN f ON f.event_type = e.event_type
    GROUP BY f.event_type, f.q1, f.q3
    ORDER BY f.event_type
"""


SQL_QUERIES["odds_ratio_ci"] = q_odds_ratio_ci

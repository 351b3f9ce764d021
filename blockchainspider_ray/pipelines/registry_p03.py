"""Registry part 3: ORACLE_SQL / SQL_QUERIES / NOSQL_QUERIES
entries in the monolith's original statement order."""

from __future__ import annotations

from .common import *  # noqa: F401,F403
from .registry_p01 import NOSQL_QUERIES  # noqa: F401
from .registry_p01 import ORACLE_SQL  # noqa: F401
from .registry_p01 import SQL_QUERIES  # noqa: F401
from .q_crawl import (  # noqa: F401
    q_politeness_makespan,
)
from .q_curation import (  # noqa: F401
    q_disparity_filter,
    q_heldout_perplexity,
    q_markov_mixing,
    q_price_band_mix,
)
from .q_etl import (  # noqa: F401
    q_return_probability,
    q_split_half_reliability,
    q_table_checksum,
)
from .q_graph import (  # noqa: F401
    q_eigenvector_centrality,
    q_graph_conductance,
)
from .q_relational import (  # noqa: F401
    q_dormant_customers,
    q_join_skew_report,
    q_late_orders_priority,
    q_tpch_q1,
    q_tpch_q13,
    q_tpch_q14,
    q_tpch_q15,
    q_tpch_q17,
    q_tpch_q19,
    q_tpch_q6,
    q_tpch_q7,
    q_tpch_q8,
    q_tpch_q9,
)
from .q_similarity import (  # noqa: F401
    q_embedding_two_sample,
)
from .q_sketch import (  # noqa: F401
    q_bloom_planner,
    q_kmv_intersection,
)
from .q_stats_c import (  # noqa: F401
    q_ar1_forecast,
    q_avg_neighbor_degree,
    q_bhattacharyya,
    q_binseg_proportion,
    q_boolean_and_query,
    q_boosted_stumps,
    q_bradley_terry,
    q_capture_recapture,
    q_casing_profile,
    q_cochran_q,
    q_cohort_ltv,
    q_conformal_interval,
    q_consistent_hash_migration,
    q_cooccurrence_pmi,
    q_dbscan_cores,
    q_diff_in_diff,
    q_dp_noise_planner,
    q_dunn_index,
    q_edge_embeddedness,
    q_effect_size_power,
    q_feature_mi,
    q_funnel_wilson,
    q_geometric_median,
    q_gmm_estep,
    q_gof_uniform_hours,
    q_growth_accounting,
    q_gumbel_maxima,
    q_haar_energy,
    q_hash_uniformity,
    q_hub_removal_robustness,
    q_huber_mean,
    q_jackknife_mean,
    q_juilland_dispersion,
    q_kleinberg_bursts,
    q_krippendorff_alpha,
    q_lag_xcorr,
    q_levene_test,
    q_lindley_queue,
    q_ljung_box,
    q_lof_outliers,
    q_logistic_newton,
    q_map_eval,
    q_median_polish,
    q_medoid_per_label,
    q_negbin_fit,
    q_otsu_threshold,
    q_pacf_profile,
    q_pettitt_bh,
    q_phrase_search,
    q_proximity_score,
    q_quantile_treatment_effect,
    q_referential_audit,
    q_revenue_hhi_monthly,
    q_seasonal_strength,
    q_sprt_monitor,
    q_stratified_diff,
    q_target_encoding,
    q_turning_points,
    q_twonn_dimension,
    q_variance_ratio,
    q_white_test,
    q_wilcoxon_signed_rank,
    q_xmr_control,
)
from .q_stats_d import (  # noqa: F401
    q_abc_analysis,
    q_aipw_ate,
    q_als_rank1,
    q_benford_second_digit,
    q_cache_working_set,
    q_cooks_distance,
    q_core_periphery,
    q_coupon_collector,
    q_dag_layers,
    q_dup_event_audit,
    q_erlang_blocking,
    q_erlang_c_wait,
    q_gompertz_fit,
    q_grubbs_test,
    q_harrell_c,
    q_inspection_paradox,
    q_ipw_ate,
    q_k_anonymity,
    q_l_diversity,
    q_learned_index_audit,
    q_nelson_aalen,
    q_newey_west_se,
    q_peak_to_mean,
    q_periodic_user_screen,
    q_quantizer_compare,
    q_rmst,
    q_round_number_bias,
    q_s_metric,
    q_sax_symbols,
    q_seasonal_chi2,
    q_simpson_paradox,
    q_sort_order_benefit,
    q_theil_decomposition,
    q_ttt_statistic,
    q_var_cvar,
    q_weibull_hazard,
    q_zone_map_audit,
)
from .q_text import (  # noqa: F401
    q_chao_shen_entropy,
    q_max_repeat_ngram,
    q_spectral_entropy,
    q_token_movers,
    q_user_hour_entropy,
    q_vocab_half_life,
)


ORACLE_SQL["odds_ratio_ci"] = """
    WITH cells AS (
        SELECT
            sum(CASE WHEN source = 'src0' AND lang = 'en' THEN 1 ELSE 0 END) AS a,
            sum(CASE WHEN source = 'src0' AND lang <> 'en' THEN 1 ELSE 0 END) AS b,
            sum(CASE WHEN source <> 'src0' AND lang = 'en' THEN 1 ELSE 0 END) AS c,
            sum(CASE WHEN source <> 'src0' AND lang <> 'en' THEN 1 ELSE 0 END) AS d
        FROM documents
    ),
    adj AS (
        SELECT a, b, c, d,
               CASE WHEN least(a, b, c, d) = 0 THEN 0.5 ELSE 0.0 END AS k
        FROM cells
    ),
    st AS (
        SELECT a, b, c, d,
               ((a + k) * (d + k)) / ((b + k) * (c + k)) AS orr,
               sqrt(1.0 / (a + k) + 1.0 / (b + k)
                    + 1.0 / (c + k) + 1.0 / (d + k)) AS se
        FROM adj
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
           round(orr, 6) AS odds_ratio,
           round(exp(ln(orr) - 1.96 * se), 6) AS ci_lo,
           round(exp(ln(orr) + 1.96 * se), 6) AS ci_hi
    FROM st
"""


SQL_QUERIES["gumbel_maxima"] = q_gumbel_maxima


ORACLE_SQL["gumbel_maxima"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, max(value) AS mx
        FROM events GROUP BY 1
    ),
    m AS (SELECT count(*) AS n, sum(mx) / count(*) AS mu FROM d),
    v AS (
        SELECT m.n, m.mu,
               sum((d.mx - m.mu) * (d.mx - m.mu)) / (m.n - 1) AS var
        FROM d CROSS JOIN m GROUP BY m.n, m.mu
    ),
    fit AS (
        SELECT n,
               mu - 0.5772156649015329 * (sqrt(var) * sqrt(6.0) / pi()) AS loc,
               sqrt(var) * sqrt(6.0) / pi() AS scale
        FROM v
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(loc, 6) AS loc, round(scale, 6) AS scale,
           round(loc - scale * ln(-ln(1.0 - 1.0 / 30.0)), 6) AS rl_30,
           round(loc - scale * ln(-ln(1.0 - 1.0 / 365.0)), 6) AS rl_365
    FROM fit
"""


SQL_QUERIES["capture_recapture"] = q_capture_recapture


ORACLE_SQL["capture_recapture"] = """
    WITH mm AS (
        SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM events
    ),
    pres AS (
        SELECT DISTINCT user_id,
               CASE WHEN epoch_us(ts) >= (mm.lo + mm.hi) // 2
                    THEN 1 ELSE 0 END AS h
        FROM events CROSS JOIN mm
    ),
    c AS (
        SELECT sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS n2,
               (SELECT count(*) FROM (
                   SELECT user_id FROM pres GROUP BY user_id HAVING count(*) = 2
               )) AS m
        FROM pres
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(m AS BIGINT) AS m_both,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 6) AS n_hat,
           round(sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
                 / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 6) AS se
    FROM c
"""


SQL_QUERIES["gof_uniform_hours"] = q_gof_uniform_hours


ORACLE_SQL["gof_uniform_hours"] = """
    WITH c AS (
        SELECT CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
        FROM events GROUP BY 1
    ),
    t AS (SELECT sum(n) * 1.0 AS nt FROM c)
    SELECT CAST(t.nt AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(23 AS BIGINT) AS df,
           round(2.0 * sum(c.n * ln(c.n / (t.nt / 24.0))), 6) AS g_stat
    FROM c CROSS JOIN t GROUP BY t.nt
"""


SQL_QUERIES["negbin_fit"] = q_negbin_fit


ORACLE_SQL["negbin_fit"] = """
    WITH u AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
    m AS (SELECT count(*) AS n, sum(c) * 1.0 / count(*) AS mu FROM u),
    v AS (
        SELECT m.n, m.mu,
               sum((u.c - m.mu) * (u.c - m.mu)) / m.n AS var
        FROM u CROSS JOIN m GROUP BY m.n, m.mu
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(mu, 6) AS mean_c, round(var, 6) AS var_c,
           round(var / mu, 6) AS dispersion,
           round(CASE WHEN var > mu THEN mu * mu / (var - mu) END, 6) AS nb_r,
           round(CASE WHEN var > mu THEN mu / var END, 6) AS nb_p
    FROM v
"""


SQL_QUERIES["growth_accounting"] = q_growth_accounting


ORACLE_SQL["growth_accounting"] = """
    WITH pres AS (
        SELECT DISTINCT year(ts) * 12 + month(ts) - 1 AS mi, user_id FROM events
    ),
    f AS (SELECT user_id, min(mi) AS first_mi FROM pres GROUP BY user_id),
    tagged AS (
        SELECT p.mi,
               CASE WHEN p.mi = f.first_mi THEN 'new'
                    WHEN prev.user_id IS NOT NULL THEN 'retained'
                    ELSE 'resurrected' END AS kind
        FROM pres p
        JOIN f ON f.user_id = p.user_id
        LEFT JOIN pres prev
          ON prev.user_id = p.user_id AND prev.mi = p.mi - 1
    ),
    churn AS (
        SELECT p.mi + 1 AS mi, 'churned' AS kind
        FROM pres p
        LEFT JOIN pres nxt
          ON nxt.user_id = p.user_id AND nxt.mi = p.mi + 1
        WHERE nxt.user_id IS NULL
    ),
    allc AS (
        SELECT mi, kind FROM tagged
        UNION ALL SELECT mi, kind FROM churn
    ),
    bounds AS (SELECT max(mi) AS last_mi FROM pres),
    g AS (
        SELECT mi, kind, count(*) AS n FROM allc, bounds
        WHERE mi <= bounds.last_mi GROUP BY mi, kind
    )
    SELECT printf('%04d-%02d', mi // 12, mi % 12 + 1) AS month,
           CAST(coalesce(sum(CASE WHEN kind = 'new' THEN n END), 0) AS BIGINT) AS new,
           CAST(coalesce(sum(CASE WHEN kind = 'retained' THEN n END), 0) AS BIGINT) AS retained,
           CAST(coalesce(sum(CASE WHEN kind = 'resurrected' THEN n END), 0) AS BIGINT) AS resurrected,
           CAST(coalesce(sum(CASE WHEN kind = 'churned' THEN n END), 0) AS BIGINT) AS churned
    FROM g GROUP BY mi ORDER BY mi
"""


SQL_QUERIES["seasonal_strength"] = q_seasonal_strength


ORACLE_SQL["seasonal_strength"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT day, n,
               row_number() OVER (ORDER BY day) AS t,
               count(*) OVER () AS m,
               avg(n * 1.0) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
               CAST(strftime(CAST(day AS DATE), '%w') AS BIGINT) AS dow0
        FROM d
    ),
    det AS (
        SELECT day, (dow0 + 6) % 7 AS dow, n - trend AS dt
        FROM w WHERE t >= 4 AND t <= m - 3
    ),
    seas AS (SELECT dow, avg(dt) AS s FROM det GROUP BY dow),
    r AS (
        SELECT det.dt, det.dt - seas.s AS rem
        FROM det JOIN seas ON seas.dow = det.dow
    ),
    mm AS (
        SELECT count(*) AS k, avg(dt) AS mu_d, avg(rem) AS mu_r FROM r
    ),
    v AS (
        SELECT mm.k,
               sum((r.dt - mm.mu_d) * (r.dt - mm.mu_d)) / mm.k AS vd,
               sum((r.rem - mm.mu_r) * (r.rem - mm.mu_r)) / mm.k AS vr
        FROM r CROSS JOIN mm GROUP BY mm.k
    )
    SELECT CAST(k AS BIGINT) AS n_interior,
           round(vd, 6) AS var_detrended,
           round(vr, 6) AS var_remainder,
           round(CASE WHEN vd > 0 THEN greatest(0.0, 1.0 - vr / vd) END, 6)
               AS strength
    FROM v
"""


SQL_QUERIES["diff_in_diff"] = q_diff_in_diff


ORACLE_SQL["diff_in_diff"] = """
    WITH mm AS (
        SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM events
    ),
    p AS (
        SELECT user_id % 2 AS g,
               CASE WHEN epoch_us(ts) >= (mm.lo + mm.hi) // 2 THEN 1 ELSE 0 END AS post,
               value AS v
        FROM events CROSS JOIN mm WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT g, post, count(*) AS n, sum(v) / count(*) AS mu
        FROM p GROUP BY g, post
    ),
    vv AS (
        SELECT p.g, p.post, m.n, m.mu,
               sum((p.v - m.mu) * (p.v - m.mu)) AS ss
        FROM p JOIN m ON m.g = p.g AND m.post = p.post
        GROUP BY p.g, p.post, m.n, m.mu
    ),
    w AS (
        SELECT
            max(CASE WHEN g = 0 AND post = 0 THEN mu END) AS pre_0,
            max(CASE WHEN g = 0 AND post = 1 THEN mu END) AS post_0,
            max(CASE WHEN g = 1 AND post = 0 THEN mu END) AS pre_1,
            max(CASE WHEN g = 1 AND post = 1 THEN mu END) AS post_1,
            sum((ss / (n - 1)) / n) AS sev
        FROM vv
    )
    SELECT round(pre_0, 6) AS pre_0, round(post_0, 6) AS post_0,
           round(pre_1, 6) AS pre_1, round(post_1, 6) AS post_1,
           round((post_1 - pre_1) - (post_0 - pre_0), 6) AS did,
           round(sqrt(sev), 6) AS se
    FROM w
"""


SQL_QUERIES["cohort_ltv"] = q_cohort_ltv


ORACLE_SQL["cohort_ltv"] = """
    WITH t AS (
        SELECT user_id, year(ts) * 12 + month(ts) - 1 AS mi,
               CAST(round(value * 100) AS BIGINT) AS cents, event_type
        FROM events
    ),
    f AS (SELECT user_id, min(mi) AS first_mi FROM t GROUP BY user_id),
    cs AS (SELECT first_mi, count(*) AS n_users FROM f GROUP BY first_mi),
    cell AS (
        SELECT f.first_mi, t.mi - f.first_mi AS age, sum(t.cents) AS cents
        FROM t JOIN f ON f.user_id = t.user_id
        WHERE t.event_type = 'purchase'
        GROUP BY f.first_mi, t.mi - f.first_mi
    )
    SELECT printf('%04d-%02d', cell.first_mi // 12, cell.first_mi % 12 + 1) AS cohort,
           CAST(age AS BIGINT) AS age,
           CAST(cs.n_users AS BIGINT) AS n_users,
           CAST(sum(cents) OVER (PARTITION BY cell.first_mi ORDER BY age) AS BIGINT)
               AS cum_cents,
           round(sum(cents) OVER (PARTITION BY cell.first_mi ORDER BY age)
                 * 1.0 / cs.n_users / 100.0, 6) AS ltv
    FROM cell JOIN cs ON cs.first_mi = cell.first_mi
    ORDER BY cohort, age
"""


SQL_QUERIES["user_hour_entropy"] = q_user_hour_entropy


ORACLE_SQL["user_hour_entropy"] = """
    WITH c AS (
        SELECT user_id, CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, sum(n) AS nt FROM c GROUP BY user_id HAVING sum(n) >= 10),
    h AS (
        SELECT c.user_id,
               CASE WHEN t.nt >= 100 THEN 'heavy' ELSE 'light' END AS tier,
               -sum((c.n * 1.0 / t.nt) * ln(c.n * 1.0 / t.nt) ORDER BY c.hr)
                   / ln(24.0) AS hn
        FROM c JOIN t ON t.user_id = c.user_id
        GROUP BY c.user_id, t.nt
    )
    SELECT tier, CAST(count(*) AS BIGINT) AS n_users,
           round(sum(hn) / count(*), 6) AS mean_h,
           round(min(hn), 6) AS min_h,
           round(max(hn), 6) AS max_h
    FROM h GROUP BY tier ORDER BY tier
"""


SQL_QUERIES["levene_test"] = q_levene_test


ORACLE_SQL["levene_test"] = """
    WITH v AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    tgt AS (
        SELECT g.event_type, 0.5 * (g.n - 1) AS h,
               CAST(floor(0.5 * (g.n - 1)) AS BIGINT) AS lo,
               CAST(ceil(0.5 * (g.n - 1)) AS BIGINT) AS hi
        FROM (SELECT DISTINCT event_type, n FROM v) g
    ),
    med AS (
        SELECT t.event_type,
               vlo.value + (t.h - floor(t.h)) * (vhi.value - vlo.value) AS md
        FROM tgt t
        JOIN v vlo ON vlo.event_type = t.event_type AND vlo.rn = t.lo
        JOIN v vhi ON vhi.event_type = t.event_type AND vhi.rn = t.hi
    ),
    z AS (
        SELECT e.event_type, abs(e.value - med.md) AS z
        FROM events e JOIN med ON med.event_type = e.event_type
    ),
    zm AS (
        SELECT event_type, count(*) AS n, sum(z) / count(*) AS mu
        FROM z GROUP BY event_type
    ),
    ssw AS (
        SELECT z.event_type, zm.n, zm.mu,
               sum((z.z - zm.mu) * (z.z - zm.mu)) AS ss
        FROM z JOIN zm ON zm.event_type = z.event_type
        GROUP BY z.event_type, zm.n, zm.mu
    ),
    agg AS (
        SELECT count(*) AS k, sum(n) AS nt,
               sum(mu * n) / sum(n) AS grand,
               sum(ss) AS within
        FROM ssw
    ),
    btw AS (
        SELECT agg.k, agg.nt, agg.within,
               sum(ssw.n * (ssw.mu - agg.grand) * (ssw.mu - agg.grand)) AS between
        FROM ssw CROSS JOIN agg GROUP BY agg.k, agg.nt, agg.within
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(nt AS BIGINT) AS n,
           CAST(k - 1 AS BIGINT) AS df1, CAST(nt - k AS BIGINT) AS df2,
           round((nt - k) / (k - 1.0) * between / within, 6) AS f_stat
    FROM btw
"""


SQL_QUERIES["cochran_q"] = q_cochran_q


ORACLE_SQL["cochran_q"] = """
    WITH bits AS (
        SELECT DISTINCT user_id, event_type FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    cj AS (SELECT event_type, count(*) AS c FROM bits GROUP BY event_type),
    ru AS (SELECT user_id, count(*) AS r FROM bits GROUP BY user_id),
    agg AS (
        SELECT (SELECT sum(c * c) * 1.0 FROM cj) AS c2,
               (SELECT sum(r) * 1.0 FROM ru) AS t,
               (SELECT sum(r * r) * 1.0 FROM ru) AS r2,
               (SELECT count(*) FROM ru) AS nu
    )
    SELECT CAST(nu AS BIGINT) AS n_users, CAST(3 AS BIGINT) AS k,
           CAST(2 AS BIGINT) AS df,
           round(CASE WHEN 3.0 * t - r2 > 0
                      THEN 3.0 * 2.0 * (c2 - t * t / 3.0) / (3.0 * t - r2)
                 END, 6) AS q_stat
    FROM agg
"""


SQL_QUERIES["lag_xcorr"] = q_lag_xcorr


ORACLE_SQL["lag_xcorr"] = """
    WITH c AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type AS t, count(*) AS n
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY 1, 2
    ),
    days AS (
        SELECT day, row_number() OVER (ORDER BY day) - 1 AS i
        FROM (SELECT DISTINCT day FROM c)
    ),
    g AS (
        SELECT days.i,
               coalesce(max(CASE WHEN c.t = 'view' THEN c.n END), 0) * 1.0 AS x,
               coalesce(max(CASE WHEN c.t = 'purchase' THEN c.n END), 0) * 1.0 AS y
        FROM days LEFT JOIN c ON c.day = days.day
        GROUP BY days.i
    ),
    lags AS (SELECT * FROM (VALUES (-3),(-2),(-1),(0),(1),(2),(3)) AS l(lag)),
    pairs AS (
        SELECT l.lag, a.x, b.y
        FROM lags l
        JOIN g a ON TRUE
        JOIN g b ON b.i = a.i + l.lag
    ),
    mm AS (
        SELECT lag, count(*) AS n, avg(x) AS mx, avg(y) AS my
        FROM pairs GROUP BY lag HAVING count(*) >= 2
    ),
    st AS (
        SELECT p.lag, mm.n,
               sum((p.x - mm.mx) * (p.y - mm.my)) AS sxy,
               sum((p.x - mm.mx) * (p.x - mm.mx)) AS sxx,
               sum((p.y - mm.my) * (p.y - mm.my)) AS syy
        FROM pairs p JOIN mm ON mm.lag = p.lag
        GROUP BY p.lag, mm.n
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           round(sxy / sqrt(sxx * syy), 6) AS xcorr
    FROM st WHERE sxx * syy > 0
    ORDER BY lag
"""


SQL_QUERIES["eigenvector_centrality"] = q_eigenvector_centrality


ORACLE_SQL["eigenvector_centrality"] = _eigenvector_oracle_sql()


SQL_QUERIES["graph_conductance"] = q_graph_conductance


ORACLE_SQL["graph_conductance"] = f"""
    WITH ed AS ({EDGES_SQL}),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM ed WHERE src <> dst
    ),
    t AS (
        SELECT
            count(*) AS m,
            sum(CASE WHEN (a % 2 = 0) <> (b % 2 = 0) THEN 1 ELSE 0 END) AS cut,
            sum(CASE WHEN a % 2 = 0 THEN 1 ELSE 0 END
                + CASE WHEN b % 2 = 0 THEN 1 ELSE 0 END) AS vol_s,
            sum(CASE WHEN a % 2 = 0 THEN 0 ELSE 1 END
                + CASE WHEN b % 2 = 0 THEN 0 ELSE 1 END) AS vol_t
        FROM e
    )
    SELECT CAST(m AS BIGINT) AS n_edges, CAST(cut AS BIGINT) AS cut,
           CAST(vol_s AS BIGINT) AS vol_s, CAST(vol_t AS BIGINT) AS vol_t,
           round(CASE WHEN least(vol_s, vol_t) > 0
                      THEN cut * 1.0 / least(vol_s, vol_t) END, 6) AS conductance
    FROM t
"""


SQL_QUERIES["jackknife_mean"] = q_jackknife_mean


ORACLE_SQL["jackknife_mean"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, sum(value) AS s, count(*) AS n
        FROM events GROUP BY 1
    ),
    t AS (SELECT count(*) AS m, sum(s) AS st, sum(n) AS nt FROM d),
    th AS (
        SELECT t.m, t.st, t.nt, (t.st - d.s) / (t.nt - d.n) AS theta
        FROM d CROSS JOIN t
    ),
    td AS (SELECT m, st, nt, sum(theta) / m AS tdot FROM th GROUP BY m, st, nt),
    v AS (
        SELECT td.m, td.st, td.nt, td.tdot,
               (td.m - 1.0) / td.m
                   * sum((th.theta - td.tdot) * (th.theta - td.tdot)) AS var
        FROM th JOIN td ON TRUE
        GROUP BY td.m, td.st, td.nt, td.tdot
    )
    SELECT CAST(m AS BIGINT) AS m_days,
           round(st / nt, 6) AS mean_all,
           round(tdot, 6) AS theta_dot,
           round(sqrt(var), 6) AS se_jack
    FROM v
"""


SQL_QUERIES["wilcoxon_signed_rank"] = q_wilcoxon_signed_rank


ORACLE_SQL["wilcoxon_signed_rank"] = """
    WITH c AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type AS t, count(*) AS n
        FROM events WHERE event_type IN ('view', 'click')
        GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM c),
    w AS (
        SELECT days.day,
               coalesce(max(CASE WHEN c.t = 'view' THEN c.n END), 0)
               - coalesce(max(CASE WHEN c.t = 'click' THEN c.n END), 0) AS d
        FROM days LEFT JOIN c ON c.day = days.day
        GROUP BY days.day
    ),
    nz AS (SELECT d, abs(d) AS ad FROM w WHERE d <> 0),
    rk AS (
        SELECT d, ad,
               rank() OVER (ORDER BY ad) AS mn,
               count(*) OVER (PARTITION BY ad) AS tc,
               count(*) OVER () AS n
        FROM nz
    ),
    st AS (
        SELECT n,
               sum(CASE WHEN d > 0 THEN mn + (tc - 1) / 2.0 ELSE 0 END) AS wp,
               (SELECT sum(tcube) FROM (
                   SELECT count(*) * count(*) * count(*) - count(*) AS tcube
                   FROM nz GROUP BY ad
               )) AS tie_term
        FROM rk GROUP BY n
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round(wp, 6) AS w_plus,
           round(CASE WHEN (n * (n + 1.0) * (2 * n + 1.0) - tie_term / 2.0) > 0
                      THEN (wp - n * (n + 1) / 4.0)
                           / sqrt((n * (n + 1.0) * (2 * n + 1.0)
                                   - tie_term / 2.0) / 24.0)
                 END, 6) AS z
    FROM st
"""


SQL_QUERIES["ljung_box"] = q_ljung_box


ORACLE_SQL["ljung_box"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT n * 1.0 AS x, row_number() OVER (ORDER BY day) AS t,
               count(*) OVER () AS m,
               sum(n) OVER () * 1.0 / count(*) OVER () AS mu
        FROM d
    ),
    lags AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) AS l(k)),
    den AS (SELECT sum((x - mu) * (x - mu)) AS dd, max(m) AS m FROM idx),
    rk AS (
        SELECT l.k, den.m,
               sum((a.x - a.mu) * (b.x - b.mu)) / den.dd AS r
        FROM lags l
        JOIN idx a ON TRUE
        JOIN idx b ON b.t = a.t + l.k
        CROSS JOIN den
        GROUP BY l.k, den.m, den.dd
    )
    SELECT CAST(m AS BIGINT) AS m_days, CAST(7 AS BIGINT) AS df,
           round(m * (m + 2.0) * sum(r * r / (m - k)), 6) AS q_stat
    FROM rk GROUP BY m
"""


SQL_QUERIES["xmr_control"] = q_xmr_control


ORACLE_SQL["xmr_control"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    l AS (
        SELECT day, n,
               abs(n - lag(n) OVER (ORDER BY day)) AS mr
        FROM d
    ),
    st AS (
        SELECT sum(n) * 1.0 / count(*) AS center,
               sum(mr) * 1.0 / count(mr) AS mrbar
        FROM l
    )
    SELECT day, CAST(n AS BIGINT) AS n,
           round(center, 6) AS center,
           round(center - 2.66 * mrbar, 6) AS lcl,
           round(center + 2.66 * mrbar, 6) AS ucl,
           CAST(CASE WHEN n < center - 2.66 * mrbar
                       OR n > center + 2.66 * mrbar THEN 1 ELSE 0 END AS BIGINT)
               AS ooc
    FROM l CROSS JOIN st
    ORDER BY day
"""


SQL_QUERIES["twonn_dimension"] = q_twonn_dimension


ORACLE_SQL["twonn_dimension"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    d AS (
        SELECT a.vec_id, list_distance(a.x, b.x) AS dist,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY list_distance(a.x, b.x), b.vec_id) AS rn
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    nn AS (
        SELECT vec_id,
               max(CASE WHEN rn = 1 THEN dist END) AS d1,
               max(CASE WHEN rn = 2 THEN dist END) AS d2
        FROM d WHERE rn <= 2 GROUP BY vec_id
    ),
    st AS (
        SELECT sum(CASE WHEN d1 > 0 THEN ln(d2 / d1) END) AS lnmu,
               sum(CASE WHEN d1 > 0 THEN 1 ELSE 0 END) AS used,
               sum(CASE WHEN d1 > 0 THEN 0 ELSE 1 END) AS dropped
        FROM nn
    )
    SELECT CAST(used AS BIGINT) AS n_used,
           CAST(dropped AS BIGINT) AS n_dropped,
           round(lnmu, 6) AS sum_ln_mu,
           round(CASE WHEN lnmu > 0 THEN used / lnmu END, 6) AS dim
    FROM st
"""


SQL_QUERIES["medoid_per_label"] = q_medoid_per_label


ORACLE_SQL["medoid_per_label"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x, label FROM embeddings),
    s AS (
        SELECT a.label, a.vec_id,
               sum(list_distance(a.x, b.x)) AS s, count(*) AS cnt
        FROM e a JOIN e b
          ON b.label = a.label AND b.vec_id <> a.vec_id
        GROUP BY a.label, a.vec_id
    ),
    singles AS (
        SELECT e.label, e.vec_id, 0.0 AS s, 0 AS cnt
        FROM e
        WHERE NOT EXISTS (
            SELECT 1 FROM e b WHERE b.label = e.label AND b.vec_id <> e.vec_id
        )
    ),
    allrows AS (SELECT * FROM s UNION ALL SELECT * FROM singles),
    pick AS (
        SELECT label, vec_id, cnt, s,
               row_number() OVER (PARTITION BY label ORDER BY s, vec_id) AS rn
        FROM allrows
    )
    SELECT CAST(label AS BIGINT) AS label, CAST(vec_id AS BIGINT) AS vec_id,
           CAST(cnt AS BIGINT) AS n_mates,
           round(CASE WHEN cnt > 0 THEN s / cnt ELSE 0.0 END, 6) AS mean_dist
    FROM pick WHERE rn = 1 ORDER BY label
"""


SQL_QUERIES["dunn_index"] = q_dunn_index


ORACLE_SQL["dunn_index"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x, label FROM embeddings),
    p AS (
        SELECT a.label = b.label AS same, list_distance(a.x, b.x) AS d
        FROM e a JOIN e b ON a.vec_id < b.vec_id
    ),
    st AS (
        SELECT min(CASE WHEN NOT same THEN d END) AS mi,
               max(CASE WHEN same THEN d END) AS ma
        FROM p
    )
    SELECT round(mi, 6) AS min_inter, round(ma, 6) AS max_intra,
           round(CASE WHEN ma > 0 THEN mi / ma END, 6) AS dunn
    FROM st
"""


SQL_QUERIES["tpch_q6"] = q_tpch_q6


ORACLE_SQL["tpch_q6"] = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


SQL_QUERIES["kmv_intersection"] = q_kmv_intersection


ORACLE_SQL["kmv_intersection"] = """
    WITH a AS (
        SELECT DISTINCT md5_number_lower(CAST(user_id AS VARCHAR)) AS h
        FROM events WHERE event_type = 'view'
    ),
    b AS (
        SELECT DISTINCT md5_number_lower(CAST(user_id AS VARCHAR)) AS h
        FROM events WHERE event_type = 'purchase'
    ),
    sa AS (SELECT h FROM a ORDER BY h LIMIT 16),
    sb AS (SELECT h FROM b ORDER BY h LIMIT 16),
    u AS (
        SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
        ORDER BY h LIMIT 16
    ),
    st AS (
        SELECT count(*) AS nu, max(h) AS kth,
               sum(CASE WHEN h IN (SELECT h FROM sa)
                         AND h IN (SELECT h FROM sb) THEN 1 ELSE 0 END) AS ik
        FROM u
    ),
    est AS (
        SELECT nu, ik,
               CASE WHEN nu = 16
                    THEN 15 * 18446744073709551616.0 / CAST(kth AS DOUBLE)
                    ELSE nu * 1.0 END AS union_est
        FROM st
    ),
    ex AS (
        SELECT count(*) AS exact FROM (
            SELECT user_id FROM events
            WHERE event_type IN ('view', 'purchase')
            GROUP BY user_id
            HAVING count(DISTINCT event_type) = 2
        )
    )
    SELECT CAST(16 AS BIGINT) AS k,
           CAST(ex.exact AS BIGINT) AS exact_inter,
           round(ik * 1.0 / nu, 6) AS jaccard_est,
           round(ik * 1.0 / nu * union_est, 6) AS inter_est,
           round(CASE WHEN ex.exact > 0
                      THEN abs(ik * 1.0 / nu * union_est - ex.exact) / ex.exact
                 END, 6) AS rel_error
    FROM est CROSS JOIN ex
"""


SQL_QUERIES["haar_energy"] = q_haar_energy


ORACLE_SQL["haar_energy"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    a0 AS (
        SELECT row_number() OVER (ORDER BY day) - 1 AS t, n * 1.0 AS v FROM d
    ),
    l1 AS (
        SELECT t // 2 AS t,
               (max(CASE WHEN t % 2 = 0 THEN v END)
                + max(CASE WHEN t % 2 = 1 THEN v END)) / 2.0 AS v,
               (max(CASE WHEN t % 2 = 0 THEN v END)
                - max(CASE WHEN t % 2 = 1 THEN v END)) / 2.0 AS det
        FROM a0 GROUP BY t // 2 HAVING count(*) = 2
    ),
    l2 AS (
        SELECT t // 2 AS t,
               (max(CASE WHEN t % 2 = 0 THEN v END)
                + max(CASE WHEN t % 2 = 1 THEN v END)) / 2.0 AS v,
               (max(CASE WHEN t % 2 = 0 THEN v END)
                - max(CASE WHEN t % 2 = 1 THEN v END)) / 2.0 AS det
        FROM l1 GROUP BY t // 2 HAVING count(*) = 2
    ),
    l3 AS (
        SELECT t // 2 AS t,
               (max(CASE WHEN t % 2 = 0 THEN v END)
                - max(CASE WHEN t % 2 = 1 THEN v END)) / 2.0 AS det
        FROM l2 GROUP BY t // 2 HAVING count(*) = 2
    ),
    e AS (
        SELECT 1 AS level, count(*) AS n_coeffs, sum(det * det) AS energy FROM l1
        UNION ALL
        SELECT 2, count(*), sum(det * det) FROM l2
        UNION ALL
        SELECT 3, count(*), sum(det * det) FROM l3
    )
    SELECT CAST(level AS BIGINT) AS level, CAST(n_coeffs AS BIGINT) AS n_coeffs,
           round(energy, 6) AS energy
    FROM e WHERE n_coeffs > 0 ORDER BY level
"""


SQL_QUERIES["boolean_and_query"] = q_boolean_and_query


ORACLE_SQL["boolean_and_query"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    tf AS (
        SELECT doc_id,
               len(list_filter(w, x -> x = 'data')) AS tf_data,
               len(list_filter(w, x -> x = 'query')) AS tf_query
        FROM toks
    )
    SELECT CAST(row_number() OVER (ORDER BY tf_data + tf_query DESC, doc_id)
               AS BIGINT) AS rank,
           doc_id, CAST(tf_data AS BIGINT) AS tf_data,
           CAST(tf_query AS BIGINT) AS tf_query,
           CAST(tf_data + tf_query AS BIGINT) AS score
    FROM tf WHERE tf_data > 0 AND tf_query > 0
    ORDER BY score DESC, doc_id LIMIT 10
"""


SQL_QUERIES["phrase_search"] = q_phrase_search


ORACLE_SQL["phrase_search"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    pos AS (
        SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks
    ),
    hits AS (
        SELECT doc_id, count(*) AS n_hits
        FROM pos
        WHERE w[i] = 'data' AND i < len(w) AND w[i + 1] = 'query'
        GROUP BY doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY n_hits DESC, doc_id) AS BIGINT) AS rank,
           doc_id, CAST(n_hits AS BIGINT) AS n_hits
    FROM hits ORDER BY n_hits DESC, doc_id LIMIT 10
"""


SQL_QUERIES["proximity_score"] = q_proximity_score


ORACLE_SQL["proximity_score"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    pos AS (
        SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks
    ),
    pa_ AS (SELECT doc_id, i FROM pos WHERE w[i] = 'data'),
    pb AS (SELECT doc_id, i FROM pos WHERE w[i] = 'join'),
    g AS (
        SELECT pa_.doc_id, min(abs(pa_.i - pb.i)) AS min_gap
        FROM pa_ JOIN pb ON pb.doc_id = pa_.doc_id
        GROUP BY pa_.doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY min_gap, doc_id) AS BIGINT) AS rank,
           doc_id, CAST(min_gap AS BIGINT) AS min_gap
    FROM g ORDER BY min_gap, doc_id LIMIT 10
"""


SQL_QUERIES["variance_ratio"] = q_variance_ratio


ORACLE_SQL["variance_ratio"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT n * 1.0 AS x, row_number() OVER (ORDER BY day) AS t,
               count(*) OVER () AS m
        FROM d
    ),
    r1 AS (
        SELECT b.x - a.x AS r FROM s a JOIN s b ON b.t = a.t + 1
    ),
    v1 AS (
        SELECT count(*) AS n1,
               sum((r - (SELECT avg(r) FROM r1)) * (r - (SELECT avg(r) FROM r1)))
                   / count(*) AS v
        FROM r1
    ),
    qs AS (SELECT * FROM (VALUES (2), (4)) AS q(q)),
    rq AS (
        SELECT qs.q, b.x - a.x AS r
        FROM qs JOIN s a ON TRUE JOIN s b ON b.t = a.t + qs.q
    ),
    mq AS (SELECT q, count(*) AS nw, avg(r) AS mu FROM rq GROUP BY q),
    vq AS (
        SELECT rq.q, mq.nw,
               sum((rq.r - mq.mu) * (rq.r - mq.mu)) / mq.nw AS v
        FROM rq JOIN mq ON mq.q = rq.q
        GROUP BY rq.q, mq.nw
    )
    SELECT CAST(vq.q AS BIGINT) AS q, CAST(vq.nw AS BIGINT) AS n_windows,
           round(vq.v / (vq.q * v1.v), 6) AS vr
    FROM vq CROSS JOIN v1
    WHERE vq.nw >= 1 AND v1.v > 0 AND vq.nw + vq.q >= vq.q + 1
    ORDER BY vq.q
"""


SQL_QUERIES["spectral_entropy"] = q_spectral_entropy


ORACLE_SQL["spectral_entropy"] = (
    "WITH pg AS (" + ORACLE_SQL["periodogram"] + """),
    t AS (SELECT sum(power) AS tot, count(*) AS np FROM pg)
    SELECT CAST(t.np AS BIGINT) AS n_periods,
           round(-sum(CASE WHEN pg.power > 0
                           THEN (pg.power / t.tot) * ln(pg.power / t.tot)
                           ELSE 0 END ORDER BY pg.period), 6) AS entropy,
           round(-sum(CASE WHEN pg.power > 0
                           THEN (pg.power / t.tot) * ln(pg.power / t.tot)
                           ELSE 0 END ORDER BY pg.period) / ln(t.np), 6)
               AS entropy_norm
    FROM pg CROSS JOIN t
    WHERE t.tot > 0
    GROUP BY t.np, t.tot
"""
)


SQL_QUERIES["turning_points"] = q_turning_points


ORACLE_SQL["turning_points"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT n,
               lag(n) OVER (ORDER BY day) AS prev,
               lead(n) OVER (ORDER BY day) AS nxt,
               count(*) OVER () AS m
        FROM d
    ),
    t AS (
        SELECT max(m) AS m,
               sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                         AND ((n > prev AND n > nxt) OR (n < prev AND n < nxt))
                        THEN 1 ELSE 0 END) AS nt
        FROM s
    )
    SELECT CAST(m AS BIGINT) AS m_days, CAST(nt AS BIGINT) AS n_turning,
           round(2.0 * (m - 2) / 3.0, 6) AS expected,
           round((nt - 2.0 * (m - 2) / 3.0)
                 / sqrt((16.0 * m - 29.0) / 90.0), 6) AS z
    FROM t WHERE m >= 3
"""


SQL_QUERIES["consistent_hash_migration"] = q_consistent_hash_migration


ORACLE_SQL["consistent_hash_migration"] = """
    WITH shards AS (
        SELECT i, md5_number_lower('shard-' || i) AS ph
        FROM (SELECT unnest(generate_series(0, 8)) AS i)
    ),
    keys AS (
        SELECT DISTINCT user_id,
               md5_number_lower(CAST(user_id AS VARCHAR)) AS kh
        FROM events
    ),
    d AS (
        SELECT k.user_id, s.i,
               (s.ph::HUGEINT - k.kh::HUGEINT
                + 18446744073709551616::HUGEINT)
               % 18446744073709551616::HUGEINT AS gap
        FROM keys k CROSS JOIN shards s
    ),
    a8 AS (
        SELECT user_id, i AS s8 FROM d WHERE i < 8
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY gap, i) = 1
    ),
    a9 AS (
        SELECT user_id, i AS s9 FROM d
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY gap, i) = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT) AS moved,
           round(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS moved_frac
    FROM a8 JOIN a9 USING (user_id)
"""


SQL_QUERIES["table_checksum"] = q_table_checksum


ORACLE_SQL["table_checksum"] = """
    WITH h AS (
        SELECT event_id % 8 AS bucket,
               md5_number_lower(
                   CAST(event_id AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)
                   || '|' || event_type) AS h
        FROM events
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(h::HUGEINT) % 18446744073709551616::HUGEINT AS VARCHAR)
               AS checksum
    FROM h GROUP BY bucket ORDER BY bucket
"""


SQL_QUERIES["token_movers"] = q_token_movers


ORACLE_SQL["token_movers"] = r"""
    WITH tok AS (
        SELECT doc_id % 2 AS half,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    c AS (
        SELECT w AS token,
               sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b
        FROM tok GROUP BY w
    ),
    t AS (SELECT sum(a) * 1.0 AS na, sum(b) * 1.0 AS nb FROM c),
    d AS (
        SELECT token, a, b,
               round(b / t.nb - a / t.na, 6) AS delta
        FROM c CROSS JOIN t
    )
    SELECT CAST(row_number() OVER (ORDER BY abs(delta) DESC, token) AS BIGINT)
               AS rank,
           token, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, delta
    FROM d ORDER BY abs(delta) DESC, token LIMIT 10
"""


SQL_QUERIES["tpch_q7"] = q_tpch_q7


ORACLE_SQL["tpch_q7"] = """
    SELECT s_nat AS supp_nation, c_nat AS cust_nation, yr,
           round(sum(cents) / 100.0, 2) AS revenue
    FROM (
        SELECT ns.n_name AS s_nat, nc.n_name AS c_nat,
               CAST(year(l.l_shipdate) AS BIGINT) AS yr,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
          AND ((ns.n_name = 'NATION_18' AND nc.n_name = 'NATION_19')
               OR (ns.n_name = 'NATION_19' AND nc.n_name = 'NATION_18'))
    )
    GROUP BY s_nat, c_nat, yr
    ORDER BY s_nat, c_nat, yr
"""


SQL_QUERIES["tpch_q14"] = q_tpch_q14


ORACLE_SQL["tpch_q14"] = """
    WITH f AS (
        SELECT CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                   AS cents,
               p.p_type = 'PROMO' AS promo
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1996-07-01'
    )
    SELECT CAST(sum(CASE WHEN promo THEN cents ELSE 0 END) AS BIGINT)
               AS promo_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           round(100.0 * sum(CASE WHEN promo THEN cents ELSE 0 END)
                 / sum(cents), 6) AS promo_pct
    FROM f
"""


SQL_QUERIES["tpch_q13"] = q_tpch_q13


ORACLE_SQL["tpch_q13"] = """
    WITH co AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


SQL_QUERIES["tpch_q15"] = q_tpch_q15


ORACLE_SQL["tpch_q15"] = """
    WITH r AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                   AS BIGINT)) AS cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
           round(r.cents / 100.0, 2) AS total_revenue
    FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.cents = (SELECT max(cents) FROM r)
    ORDER BY s.s_suppkey
"""


SQL_QUERIES["dormant_customers"] = q_dormant_customers


ORACLE_SQL["dormant_customers"] = """
    WITH avg_bal AS (
        SELECT sum(c_acctbal) / count(*) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0, 2)
               AS totacctbal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
"""


SQL_QUERIES["late_orders_priority"] = q_late_orders_priority


ORACLE_SQL["late_orders_priority"] = """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""


SQL_QUERIES["max_repeat_ngram"] = q_max_repeat_ngram


ORACLE_SQL["max_repeat_ngram"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    ns AS (SELECT unnest(generate_series(1, 8)) AS n),
    pos AS (
        SELECT doc_id, unnest(generate_series(1, len(w))) AS i FROM toks
    ),
    grams AS (
        SELECT t.doc_id, ns.n,
               array_to_string(t.w[p.i : p.i + ns.n - 1], chr(31)) AS g
        FROM toks t
        JOIN pos p ON p.doc_id = t.doc_id
        JOIN ns ON ns.n <= len(t.w) AND p.i + ns.n - 1 <= len(t.w)
    ),
    rep AS (
        SELECT doc_id, n
        FROM grams GROUP BY doc_id, n
        HAVING count(*) > count(DISTINCT g)
    ),
    per_doc AS (
        SELECT t.doc_id, coalesce(max(rep.n), 0) AS max_rep_n
        FROM toks t LEFT JOIN rep ON rep.doc_id = t.doc_id
        GROUP BY t.doc_id
    )
    SELECT CAST(max_rep_n AS BIGINT) AS max_rep_n,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM per_doc GROUP BY max_rep_n ORDER BY max_rep_n
"""


SQL_QUERIES["casing_profile"] = q_casing_profile


ORACLE_SQL["casing_profile"] = r"""
    WITH tok AS (
        SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    f AS (
        SELECT source,
               CASE WHEN regexp_matches(w, '^[A-Z]') THEN 1 ELSE 0 END AS cap,
               CASE WHEN length(w) >= 2 AND upper(w) = w
                         AND regexp_matches(w, '[A-Za-z]')
                         AND NOT regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END AS caps,
               CASE WHEN regexp_matches(w, '[0-9]') THEN 1 ELSE 0 END AS dig
        FROM tok
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(cap) * 1.0 / count(*), 6) AS cap_frac,
           round(sum(caps) * 1.0 / count(*), 6) AS allcaps_frac,
           round(sum(dig) * 1.0 / count(*), 6) AS digit_frac
    FROM f GROUP BY source ORDER BY source
"""


SQL_QUERIES["cooccurrence_pmi"] = q_cooccurrence_pmi


ORACLE_SQL["cooccurrence_pmi"] = r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM (SELECT row_number() OVER () AS doc_id, text FROM documents)
    ),
    top AS (
        SELECT w AS token FROM tok GROUP BY w
        ORDER BY count(*) DESC, w LIMIT 5
    ),
    pres AS (
        SELECT DISTINCT t.doc_id, t.w FROM tok t JOIN top ON top.token = t.w
    ),
    nd AS (SELECT count(*) AS n FROM (SELECT DISTINCT doc_id FROM tok)),
    dfs AS (SELECT w, count(*) AS df FROM pres GROUP BY w),
    pairs AS (
        SELECT a.w AS tok_a, b.w AS tok_b, count(*) AS df_ab
        FROM pres a JOIN pres b ON b.doc_id = a.doc_id AND a.w < b.w
        GROUP BY a.w, b.w
    ),
    grid AS (
        SELECT da.w AS tok_a, db.w AS tok_b,
               da.df AS df_a, db.df AS df_b,
               coalesce(p.df_ab, 0) AS df_ab
        FROM dfs da JOIN dfs db ON da.w < db.w
        LEFT JOIN pairs p ON p.tok_a = da.w AND p.tok_b = db.w
    )
    SELECT tok_a, tok_b, CAST(df_a AS BIGINT) AS df_a,
           CAST(df_b AS BIGINT) AS df_b, CAST(df_ab AS BIGINT) AS df_ab,
           round(CASE WHEN df_ab > 0
                      THEN ln(nd.n * df_ab * 1.0 / (df_a * df_b)) END, 6) AS pmi
    FROM grid CROSS JOIN nd
    ORDER BY tok_a, tok_b
"""


SQL_QUERIES["gmm_estep"] = q_gmm_estep


ORACLE_SQL["gmm_estep"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    c AS (SELECT vec_id AS cid, x AS cx FROM e WHERE vec_id < 4),
    d AS (
        SELECT e.vec_id, c.cid,
               -(list_distance(e.x, c.cx) * list_distance(e.x, c.cx))
                   / (2.0 * 16.0) AS logit
        FROM e CROSS JOIN c
    ),
    m AS (SELECT vec_id, max(logit) AS mx FROM d GROUP BY vec_id),
    w AS (
        SELECT d.vec_id, d.cid, exp(d.logit - m.mx) AS ew
        FROM d JOIN m ON m.vec_id = d.vec_id
    ),
    z AS (SELECT vec_id, sum(ew) AS sz FROM w GROUP BY vec_id),
    r AS (
        SELECT w.cid, w.ew / z.sz AS resp
        FROM w JOIN z ON z.vec_id = w.vec_id
    ),
    nt AS (SELECT count(*) AS n FROM e)
    SELECT CAST(cid AS BIGINT) AS cluster,
           round(sum(resp), 6) AS soft_count,
           round(sum(resp) / nt.n, 6) AS mean_resp
    FROM r CROSS JOIN nt GROUP BY cid, nt.n ORDER BY cid
"""


SQL_QUERIES["effect_size_power"] = q_effect_size_power


ORACLE_SQL["effect_size_power"] = """
    WITH p AS (
        SELECT user_id % 2 AS g, value AS v FROM events
        WHERE event_type = 'purchase'
    ),
    m AS (SELECT g, count(*) AS n, sum(v) / count(*) AS mu FROM p GROUP BY g),
    ss AS (
        SELECT p.g, m.n, m.mu,
               sum((p.v - m.mu) * (p.v - m.mu)) / (m.n - 1) AS var
        FROM p JOIN m ON m.g = p.g GROUP BY p.g, m.n, m.mu
    ),
    w AS (
        SELECT
            max(CASE WHEN g = 0 THEN n END) AS n0,
            max(CASE WHEN g = 1 THEN n END) AS n1,
            max(CASE WHEN g = 0 THEN mu END) AS mu0,
            max(CASE WHEN g = 1 THEN mu END) AS mu1,
            max(CASE WHEN g = 0 THEN var END) AS v0,
            max(CASE WHEN g = 1 THEN var END) AS v1
        FROM ss
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           round((mu1 - mu0) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1)
                                    / (n0 + n1 - 2)), 6) AS cohens_d,
           round((mu1 - mu0) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1)
                                    / (n0 + n1 - 2))
                 * (1.0 - 3.0 / (4.0 * (n0 + n1 - 2) - 1.0)), 6) AS hedges_g,
           round((1.96 + 0.8416) * sqrt(v0 / n0 + v1 / n1), 6) AS mde
    FROM w
"""


SQL_QUERIES["sprt_monitor"] = q_sprt_monitor


ORACLE_SQL["sprt_monitor"] = """
    WITH c AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY 1
    ),
    l AS (
        SELECT day, v + p AS trials, p AS conversions,
               sum(p * ln(0.25 / 0.15)
                   + (v + p - p) * ln(0.75 / 0.85))
                   OVER (ORDER BY day) AS llr
        FROM c WHERE v + p > 0
    )
    SELECT day, CAST(trials AS BIGINT) AS trials,
           CAST(conversions AS BIGINT) AS conversions,
           round(llr, 6) AS llr,
           CASE WHEN llr <= ln(0.05 / 0.95) THEN 'accept_p0'
                WHEN llr >= ln(0.95 / 0.05) THEN 'accept_p1'
                ELSE '' END AS decision
    FROM l ORDER BY day
"""


SQL_QUERIES["avg_neighbor_degree"] = q_avg_neighbor_degree


ORACLE_SQL["avg_neighbor_degree"] = f"""
    WITH ed AS ({EDGES_SQL}),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM ed WHERE src <> dst
    ),
    half AS (
        SELECT a AS node, b AS nbr FROM e
        UNION ALL
        SELECT b AS node, a AS nbr FROM e
    ),
    deg AS (SELECT node, count(*) AS d FROM half GROUP BY node),
    knn_i AS (
        SELECT h.node, dn.d AS node_d, avg(dg.d * 1.0) AS ki
        FROM half h
        JOIN deg dg ON dg.node = h.nbr
        JOIN deg dn ON dn.node = h.node
        GROUP BY h.node, dn.d
    )
    SELECT CAST(node_d AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           round(sum(ki) / count(*), 6) AS knn
    FROM knn_i GROUP BY node_d ORDER BY node_d
"""


SQL_QUERIES["edge_embeddedness"] = q_edge_embeddedness


ORACLE_SQL["edge_embeddedness"] = f"""
    WITH ed AS ({EDGES_SQL}),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM ed WHERE src <> dst
    ),
    half AS (
        SELECT a AS node, b AS nbr FROM e
        UNION ALL
        SELECT b AS node, a AS nbr FROM e
    ),
    cn AS (
        SELECT e.a, e.b, count(*) AS common
        FROM e
        JOIN half ha ON ha.node = e.a
        JOIN half hb ON hb.node = e.b AND hb.nbr = ha.nbr
        GROUP BY e.a, e.b
    ),
    all_e AS (
        SELECT e.a, e.b, coalesce(cn.common, 0) AS embeddedness
        FROM e LEFT JOIN cn ON cn.a = e.a AND cn.b = e.b
    )
    SELECT CAST(embeddedness AS BIGINT) AS embeddedness,
           CAST(count(*) AS BIGINT) AS n_edges
    FROM all_e GROUP BY embeddedness ORDER BY embeddedness
"""


SQL_QUERIES["juilland_dispersion"] = q_juilland_dispersion


ORACLE_SQL["juilland_dispersion"] = r"""
    WITH tok AS (
        SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    c AS (SELECT source, w AS token, count(*) AS c FROM tok GROUP BY 1, 2),
    stot AS (SELECT source, sum(c) AS n FROM c GROUP BY source),
    top AS (
        SELECT token, sum(c) AS total FROM c GROUP BY token
        ORDER BY total DESC, token LIMIT 10
    ),
    grid AS (
        SELECT top.token, top.total, stot.source,
               coalesce(c.c, 0) * 1.0 / stot.n AS rel
        FROM top CROSS JOIN stot
        LEFT JOIN c ON c.token = top.token AND c.source = stot.source
    ),
    st AS (
        SELECT token, total, count(*) AS parts, avg(rel) AS mu,
               sqrt(sum((rel - (SELECT avg(rel) FROM grid g2
                                WHERE g2.token = grid.token))
                        * (rel - (SELECT avg(rel) FROM grid g2
                                  WHERE g2.token = grid.token))) / count(*)) AS sd
        FROM grid GROUP BY token, total
    )
    SELECT token, CAST(total AS BIGINT) AS total,
           round(sd / mu, 6) AS cv,
           round(1.0 - (sd / mu) / sqrt(parts - 1.0), 6) AS juilland_d
    FROM st ORDER BY token
"""


SQL_QUERIES["map_eval"] = q_map_eval


ORACLE_SQL["map_eval"] = """
    WITH r AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
        FROM documents
    ),
    rr AS (
        SELECT rnk, row_number() OVER (ORDER BY rnk) AS i
        FROM r WHERE rel = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_relevant,
           round(sum(i * 1.0 / rnk) / count(*), 6) AS map
    FROM rr
"""


SQL_QUERIES["bradley_terry"] = q_bradley_terry


ORACLE_SQL["bradley_terry"] = _bradley_terry_oracle_sql()


SQL_QUERIES["stratified_diff"] = q_stratified_diff


ORACLE_SQL["stratified_diff"] = """
    WITH p AS (
        SELECT CAST(hour(ts) // 6 AS BIGINT) AS s, user_id % 2 AS g, value AS v
        FROM events WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT s, g, count(*) AS n, sum(v) / count(*) AS mu
        FROM p GROUP BY s, g
    ),
    ss AS (
        SELECT p.s, p.g, m.n, m.mu,
               sum((p.v - m.mu) * (p.v - m.mu)) / (m.n - 1) AS var
        FROM p JOIN m ON m.s = p.s AND m.g = p.g
        GROUP BY p.s, p.g, m.n, m.mu
    ),
    t AS (SELECT sum(n) * 1.0 AS nt FROM ss),
    w AS (
        SELECT a.s,
               (a.n + b.n) / t.nt AS wt,
               b.mu - a.mu AS d,
               a.var / a.n + b.var / b.n AS vv
        FROM ss a JOIN ss b ON b.s = a.s AND a.g = 0 AND b.g = 1
        CROSS JOIN t
    )
    SELECT CAST((SELECT count(DISTINCT s) FROM p) AS BIGINT) AS n_strata,
           round(sum(wt * d), 6) AS strat_diff,
           round(sqrt(sum(wt * wt * vv)), 6) AS se
    FROM w
"""


SQL_QUERIES["logistic_newton"] = q_logistic_newton


ORACLE_SQL["logistic_newton"] = (
    "WITH g AS (" + """
        SELECT ln(len(regexp_split_to_array(trim(text), '\\s+'))) AS x,
               keep - 0.5 AS yc
        FROM (""" + ORACLE_SQL["gopher_quality"].replace("ORDER BY doc_id", "") + """) gq
        JOIN documents USING (doc_id)
    ),
    s AS (
        SELECT count(*) * 1.0 AS n, sum(x) AS sx, sum(x * x) AS sxx,
               sum(yc) AS sy, sum(x * yc) AS sxy
        FROM g
    ),
    b AS (
        SELECT n,
               4.0 * (sxx * sy - sx * sxy) / (n * sxx - sx * sx) AS b0,
               4.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1
        FROM s
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(b0, 6) AS beta0, round(b1, 6) AS beta1,
           round(1.0 / (1.0 + exp(-(b0 + b1 * ln(100.0)))), 6) AS p_at_100
    FROM b
"""
)


SQL_QUERIES["conformal_interval"] = q_conformal_interval


ORACLE_SQL["conformal_interval"] = r"""
    WITH l AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(trim(text), '\s+')) * 1.0 AS ntok
        FROM documents
    ),
    mu AS (
        SELECT source, sum(ntok) / count(*) AS mu
        FROM l WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 2 = 0
        GROUP BY source
    ),
    cal AS (
        SELECT abs(l.ntok - mu.mu) AS r,
               row_number() OVER (ORDER BY abs(l.ntok - mu.mu)) AS rn,
               count(*) OVER () AS n
        FROM l JOIN mu ON mu.source = l.source
        WHERE md5_number_lower(CAST(l.doc_id AS VARCHAR)) % 2 = 0
    ),
    q AS (
        SELECT n AS n_cal, r AS qhat FROM cal
        WHERE rn = least(CAST(ceil((n + 1) * 0.9) AS BIGINT), n)
    ),
    test AS (
        SELECT abs(l.ntok - mu.mu) AS r
        FROM l JOIN mu ON mu.source = l.source
        WHERE md5_number_lower(CAST(l.doc_id AS VARCHAR)) % 2 = 1
    )
    SELECT CAST(q.n_cal AS BIGINT) AS n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           round(q.qhat, 6) AS q_hat,
           round(sum(CASE WHEN test.r <= q.qhat THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS coverage
    FROM test CROSS JOIN q GROUP BY q.n_cal, q.qhat
"""


SQL_QUERIES["white_test"] = q_white_test


ORACLE_SQL["white_test"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT n * 1.0 AS x, row_number() OVER (ORDER BY day) - 1.0 AS t,
               count(*) OVER () AS m
        FROM d
    ),
    mm AS (SELECT avg(t) AS tb, avg(x) AS xb, max(m) AS m FROM s),
    b AS (
        SELECT mm.m, mm.tb, mm.xb,
               sum((s.t - mm.tb) * (s.x - mm.xb))
                   / sum((s.t - mm.tb) * (s.t - mm.tb)) AS b1
        FROM s CROSS JOIN mm GROUP BY mm.m, mm.tb, mm.xb
    ),
    e AS (
        SELECT s.t, s.t * s.t AS t2,
               (s.x - (b.xb - b.b1 * b.tb) - b.b1 * s.t)
               * (s.x - (b.xb - b.b1 * b.tb) - b.b1 * s.t) AS e2,
               b.m
        FROM s CROSS JOIN b
    ),
    zc AS (
        SELECT e.m, e.t - (SELECT avg(t) FROM e) AS z1,
               e.t2 - (SELECT avg(t2) FROM e) AS z2,
               e.e2 - (SELECT avg(e2) FROM e) AS yc
        FROM e
    ),
    xx AS (
        SELECT m, sum(z1 * z1) AS a11, sum(z1 * z2) AS a12,
               sum(z2 * z2) AS a22, sum(z1 * yc) AS c1, sum(z2 * yc) AS c2,
               sum(yc * yc) AS sst
        FROM zc GROUP BY m
    ),
    g AS (
        SELECT m, sst,
               (a22 * c1 - a12 * c2) / (a11 * a22 - a12 * a12) AS g1,
               (a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12) AS g2
        FROM xx
    ),
    fit AS (
        SELECT g.m, g.sst,
               sum((g.g1 * zc.z1 + g.g2 * zc.z2)
                   * (g.g1 * zc.z1 + g.g2 * zc.z2)) AS ssr
        FROM zc CROSS JOIN g GROUP BY g.m, g.sst
    )
    SELECT CAST(m AS BIGINT) AS m_days,
           round(CASE WHEN sst > 0 THEN ssr / sst END, 6) AS r2_aux,
           round(CASE WHEN sst > 0 THEN m * ssr / sst END, 6) AS white_stat
    FROM fit
"""


SQL_QUERIES["kleinberg_bursts"] = q_kleinberg_bursts


ORACLE_SQL["kleinberg_bursts"] = """
    WITH RECURSIVE d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT day, n * 1.0 AS x, row_number() OVER (ORDER BY day) AS t,
               sum(n) OVER () * 1.0 / count(*) OVER () AS lam0
        FROM d
    ),
    v AS (
        SELECT s.t, s.day, s.x, s.lam0,
               (s.lam0 - s.x * ln(s.lam0)) + least(0.0, 1.0) AS v0,
               (2 * s.lam0 - s.x * ln(2 * s.lam0)) + least(0.0 + 1.0, 1.0) AS v1
        FROM s WHERE s.t = 1
        UNION ALL
        SELECT s.t, s.day, s.x, s.lam0,
               (s.lam0 - s.x * ln(s.lam0)) + least(v.v0, v.v1),
               (2 * s.lam0 - s.x * ln(2 * s.lam0))
                   + least(v.v0 + 1.0, v.v1)
        FROM v JOIN s ON s.t = v.t + 1
    )
    SELECT day, CAST(x AS BIGINT) AS n,
           round(v0 - v1, 6) AS margin,
           CAST(CASE WHEN v0 - v1 > 0 THEN 1 ELSE 0 END AS BIGINT) AS burst
    FROM v ORDER BY day
"""


SQL_QUERIES["pacf_profile"] = q_pacf_profile


ORACLE_SQL["pacf_profile"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT n * 1.0 AS x, row_number() OVER (ORDER BY day) AS t,
               sum(n) OVER () * 1.0 / count(*) OVER () AS mu
        FROM d
    ),
    den AS (SELECT sum((x - mu) * (x - mu)) AS dd FROM idx),
    r AS (
        SELECT l.k,
               sum((a.x - a.mu) * (b.x - b.mu)) / den.dd AS r
        FROM (VALUES (1), (2), (3)) AS l(k)
        JOIN idx a ON TRUE
        JOIN idx b ON b.t = a.t + l.k
        CROSS JOIN den
        GROUP BY l.k, den.dd
    ),
    w AS (
        SELECT max(CASE WHEN k = 1 THEN r END) AS r1,
               max(CASE WHEN k = 2 THEN r END) AS r2,
               max(CASE WHEN k = 3 THEN r END) AS r3
        FROM r
    ),
    p AS (
        SELECT r1 AS phi11,
               (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22,
               r1, r2, r3
        FROM w
    ),
    p2 AS (
        SELECT phi11, phi22, r1, r2, r3,
               phi11 - phi22 * phi11 AS phi21
        FROM p
    ),
    fin AS (
        SELECT 1 AS lag, phi11 AS pacf FROM p2
        UNION ALL
        SELECT 2, phi22 FROM p2
        UNION ALL
        SELECT 3, (r3 - phi21 * r2 - phi22 * r1)
                  / (1.0 - phi21 * r1 - phi22 * r2)
        FROM p2 WHERE 1.0 - phi21 * r1 - phi22 * r2 <> 0
    )
    SELECT CAST(lag AS BIGINT) AS lag, round(pacf, 6) AS pacf
    FROM fin ORDER BY lag
"""


SQL_QUERIES["ar1_forecast"] = q_ar1_forecast


ORACLE_SQL["ar1_forecast"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT n * 1.0 AS x, row_number() OVER (ORDER BY day) AS t,
               count(*) OVER () AS m,
               sum(n) OVER () * 1.0 / count(*) OVER () AS mu
        FROM d
    ),
    st AS (
        SELECT max(m) AS m, max(mu) AS mu,
               sum((x - mu) * (x - mu)) AS den,
               max(CASE WHEN t = m THEN x END) AS last_x
        FROM idx
    ),
    r1 AS (
        SELECT st.m, st.mu, st.den, st.last_x,
               sum((a.x - a.mu) * (b.x - b.mu)) / st.den AS phi
        FROM idx a JOIN idx b ON b.t = a.t + 1
        CROSS JOIN st
        GROUP BY st.m, st.mu, st.den, st.last_x
    )
    SELECT CAST(m AS BIGINT) AS m_days,
           round(phi, 6) AS phi,
           round(mu * (1.0 - phi), 6) AS c,
           round(mu * (1.0 - phi) + phi * last_x, 6) AS forecast,
           round((den / m) * (1.0 - phi * phi), 6) AS innovation_var,
           round(CASE WHEN abs(phi) > 0 AND abs(phi) < 1
                      THEN ln(2.0) / (-ln(abs(phi))) END, 6) AS half_life
    FROM r1
"""


SQL_QUERIES["huber_mean"] = q_huber_mean


ORACLE_SQL["huber_mean"] = """
    WITH v AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    medt AS (
        SELECT g.event_type,
               vlo.value + (0.5 * (g.n - 1) - floor(0.5 * (g.n - 1)))
                   * (vhi.value - vlo.value) AS med
        FROM (SELECT DISTINCT event_type, n FROM v) g
        JOIN v vlo ON vlo.event_type = g.event_type
                  AND vlo.rn = CAST(floor(0.5 * (g.n - 1)) AS BIGINT)
        JOIN v vhi ON vhi.event_type = g.event_type
                  AND vhi.rn = CAST(ceil(0.5 * (g.n - 1)) AS BIGINT)
    ),
    r AS (
        SELECT e.event_type, abs(e.value - m.med) AS r
        FROM events e JOIN medt m ON m.event_type = e.event_type
    ),
    rv AS (
        SELECT event_type, r,
               row_number() OVER (PARTITION BY event_type ORDER BY r) - 1 AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM r
    ),
    madt AS (
        SELECT g.event_type,
               vlo.r + (0.5 * (g.n - 1) - floor(0.5 * (g.n - 1)))
                   * (vhi.r - vlo.r) AS mad
        FROM (SELECT DISTINCT event_type, n FROM rv) g
        JOIN rv vlo ON vlo.event_type = g.event_type
                   AND vlo.rn = CAST(floor(0.5 * (g.n - 1)) AS BIGINT)
        JOIN rv vhi ON vhi.event_type = g.event_type
                   AND vhi.rn = CAST(ceil(0.5 * (g.n - 1)) AS BIGINT)
    )
    SELECT e.event_type,
           round(m.med, 6) AS median,
           round(d.mad, 6) AS mad,
           round(m.med + sum(
               greatest(-1.345 * 1.4826 * d.mad,
                        least(1.345 * 1.4826 * d.mad, e.value - m.med))
           ) / count(*), 6) AS huber_mean
    FROM events e
    JOIN medt m ON m.event_type = e.event_type
    JOIN madt d ON d.event_type = e.event_type
    GROUP BY e.event_type, m.med, d.mad
    ORDER BY e.event_type
"""


SQL_QUERIES["median_polish"] = q_median_polish


# the generated median-polish SQL is intricate; build it explicitly for 2
# iterations with flat effect-accumulator CTEs instead of the generator
ORACLE_SQL["median_polish"] = """
    WITH c AS (
        SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
    ),
    srcs AS (SELECT DISTINCT source FROM documents),
    lngs AS (SELECT DISTINCT lang FROM documents),
    r0 AS (
        SELECT srcs.source, lngs.lang, coalesce(c.n, 0) * 1.0 AS v
        FROM srcs CROSS JOIN lngs
        LEFT JOIN c ON c.source = srcs.source AND c.lang = lngs.lang
    ),
    -- iteration 1
    rm0 AS (SELECT source, median(v) AS m FROM r0 GROUP BY source),
    ra0 AS (SELECT p.source, p.lang, p.v - rm0.m AS v
            FROM r0 p JOIN rm0 ON rm0.source = p.source),
    colm0 AS (SELECT lang, median(v) AS m FROM ra0 GROUP BY lang),
    rb0 AS (SELECT p.source, p.lang, p.v - colm0.m AS v
            FROM ra0 p JOIN colm0 ON colm0.lang = p.lang),
    roweff1 AS (
        SELECT source, m - (SELECT median(m) FROM rm0) AS eff FROM rm0
    ),
    ov1 AS (SELECT (SELECT median(m) FROM rm0) AS o),
    coleff1 AS (SELECT lang, m AS eff FROM colm0),
    -- iteration 2
    rm1 AS (SELECT source, median(v) AS m FROM rb0 GROUP BY source),
    ra1 AS (SELECT p.source, p.lang, p.v - rm1.m AS v
            FROM rb0 p JOIN rm1 ON rm1.source = p.source),
    re1 AS (
        SELECT r.source, r.eff + m.m AS eff
        FROM roweff1 r JOIN rm1 m ON m.source = r.source
    ),
    cm1 AS (SELECT median(eff) AS m FROM coleff1),
    ce1a AS (SELECT lang, eff - (SELECT m FROM cm1) AS eff FROM coleff1),
    colm1 AS (SELECT lang, median(v) AS m FROM ra1 GROUP BY lang),
    rb1 AS (SELECT p.source, p.lang, p.v - colm1.m AS v
            FROM ra1 p JOIN colm1 ON colm1.lang = p.lang),
    ce1 AS (
        SELECT a.lang, a.eff + m.m AS eff
        FROM ce1a a JOIN colm1 m ON m.lang = a.lang
    ),
    rm21 AS (SELECT median(eff) AS m FROM re1),
    roweff2 AS (SELECT source, eff - (SELECT m FROM rm21) AS eff FROM re1),
    overall AS (
        SELECT (SELECT o FROM ov1) + (SELECT m FROM cm1)
               + (SELECT m FROM rm21) AS o
    )
    SELECT '__overall__' AS kind, '' AS key,
           round((SELECT o FROM overall), 6) AS effect
    UNION ALL
    SELECT 'row', source, round(eff, 6) FROM roweff2
    UNION ALL
    SELECT 'col', lang, round(eff, 6) FROM ce1
    UNION ALL
    SELECT '__resid_abs__', '', round((SELECT sum(abs(v)) FROM rb1), 6)
    ORDER BY kind, key
"""


SQL_QUERIES["bhattacharyya"] = q_bhattacharyya


ORACLE_SQL["bhattacharyya"] = """
    WITH p AS (
        SELECT user_id % 2 AS g, value FROM events WHERE event_type = 'purchase'
    ),
    mm AS (SELECT min(value) AS lo, max(value) AS hi FROM p),
    b AS (
        SELECT g,
               least(CAST(floor((value - mm.lo) / (CASE WHEN mm.hi - mm.lo = 0
                          THEN 1.0 ELSE mm.hi - mm.lo END) * 16) AS BIGINT),
                     15) AS bin
        FROM p CROSS JOIN mm
    ),
    c AS (SELECT g, bin, count(*) AS n FROM b GROUP BY g, bin),
    t AS (SELECT g, sum(n) AS nt FROM c GROUP BY g),
    bins AS (SELECT unnest(generate_series(0, 15)) AS bin),
    pq AS (
        SELECT bins.bin,
               coalesce((SELECT c.n * 1.0 / t.nt FROM c JOIN t ON t.g = c.g
                         WHERE c.g = 0 AND c.bin = bins.bin), 0) AS p,
               coalesce((SELECT c.n * 1.0 / t.nt FROM c JOIN t ON t.g = c.g
                         WHERE c.g = 1 AND c.bin = bins.bin), 0) AS q
        FROM bins
    ),
    bc AS (SELECT sum(sqrt(p * q) ORDER BY bin) AS bc FROM pq)
    SELECT CAST(16 AS BIGINT) AS n_bins,
           round(bc, 6) AS bc_coeff,
           round(CASE WHEN bc > 0 THEN -ln(bc) END, 6) AS bhattacharyya
    FROM bc
"""


SQL_QUERIES["target_encoding"] = q_target_encoding


ORACLE_SQL["target_encoding"] = (
    "WITH gq AS (" + ORACLE_SQL["gopher_quality"].replace("ORDER BY doc_id", "") + """),
    c AS (
        SELECT d.source, sum(gq.keep) AS k, count(*) AS n
        FROM documents d JOIN gq ON gq.doc_id = d.doc_id
        GROUP BY d.source
    ),
    p AS (SELECT sum(k) * 1.0 / sum(n) AS prior FROM c)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(k * 1.0 / n, 6) AS keep_rate,
           round((n * (k * 1.0 / n) + 10.0 * p.prior) / (n + 10.0), 6)
               AS encoding
    FROM c CROSS JOIN p ORDER BY source
"""
)


# rounds of argmin-over-candidates make a faithful SQL mirror ~100 lines;
# pinned by closed-form pytest instead (tests/test_degenerate_session3i.py)
NOSQL_QUERIES["boosted_stumps"] = q_boosted_stumps


SQL_QUERIES["heldout_perplexity"] = q_heldout_perplexity


ORACLE_SQL["heldout_perplexity"] = r"""
    WITH tr AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 2 = 0
    ),
    lm AS (SELECT w, count(*) AS c FROM tr GROUP BY w),
    st AS (SELECT sum(c) * 1.0 AS n, count(*) * 1.0 AS v FROM lm),
    te AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 2 = 1
    ),
    sc AS (
        SELECT -ln((coalesce(lm.c, 0) + 1.0) / (st.n + st.v + 1.0)) AS nll
        FROM te LEFT JOIN lm ON lm.w = te.w CROSS JOIN st
    )
    SELECT CAST(st.n AS BIGINT) AS n_train_tokens,
           CAST(st.v AS BIGINT) AS vocab,
           CAST(count(*) AS BIGINT) AS n_test_tokens,
           round(exp(sum(nll) / count(*)), 6) AS perplexity
    FROM sc CROSS JOIN st GROUP BY st.n, st.v
"""


SQL_QUERIES["politeness_makespan"] = q_politeness_makespan


ORACLE_SQL["politeness_makespan"] = f"""
    WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents),
    lk AS (
        SELECT unnest(regexp_extract_all(html, '<a [^>]*href="([^"]*)"', 1)) AS href
        FROM h
    ),
    ho AS (
        SELECT regexp_extract(href, '^[a-z]+://([^/]+)', 1) AS host, count(*) AS n
        FROM lk GROUP BY 1
    ),
    st AS (
        SELECT count(*) AS hosts, sum(n) AS total,
               max(CAST(ceil(n / 20.0) AS BIGINT)) AS makespan
        FROM ho
    )
    SELECT ho.host, CAST(ho.n AS BIGINT) AS n,
           CAST(ceil(ho.n / 20.0) AS BIGINT) AS rounds,
           CAST(st.makespan AS BIGINT) AS makespan,
           round(st.total * 1.0 / (st.hosts * 20.0 * st.makespan), 6)
               AS utilization
    FROM ho CROSS JOIN st ORDER BY ho.host
"""


SQL_QUERIES["tpch_q8"] = q_tpch_q8


ORACLE_SQL["tpch_q8"] = """
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
           round(sum(CASE WHEN ns.n_name = 'NATION_3' THEN cents ELSE 0 END)
                 * 1.0 / sum(cents), 6) AS mkt_share
    FROM (
        SELECT l.l_orderkey, l.l_suppkey,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                   AS cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
    ) l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = nc.n_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY year(o.o_orderdate)
    ORDER BY yr
"""


SQL_QUERIES["lindley_queue"] = q_lindley_queue


ORACLE_SQL["lindley_queue"] = """
    WITH RECURSIVE p AS (
        SELECT event_id, epoch_us(ts) / 1000000.0 AS t,
               row_number() OVER (ORDER BY ts, event_id) AS i
        FROM events WHERE event_type = 'purchase'
    ),
    g AS (
        SELECT p.i, p.t - lag(p.t) OVER (ORDER BY p.i) AS gap FROM p
    ),
    w AS (
        SELECT 1 AS i, CAST(0.0 AS DOUBLE) AS wait
        UNION ALL
        SELECT w.i + 1,
               greatest(0.0, w.wait + 1800.0 - g.gap)
        FROM w JOIN g ON g.i = w.i + 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_jobs,
           round(sum(CASE WHEN wait > 0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS busy_frac,
           round(sum(wait) / count(*), 6) AS mean_wait_s,
           round(max(wait), 6) AS max_wait_s
    FROM w
"""


SQL_QUERIES["tpch_q17"] = q_tpch_q17


ORACLE_SQL["tpch_q17"] = """
    WITH sm AS (SELECT p_partkey FROM part WHERE p_type = 'SMALL'),
    th AS (
        SELECT l.l_partkey, 0.2 * sum(l.l_quantity) / count(*) AS thr
        FROM lineitem l JOIN sm ON sm.p_partkey = l.l_partkey
        GROUP BY l.l_partkey
    ),
    f AS (
        SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem l JOIN th ON th.l_partkey = l.l_partkey
        WHERE l.l_quantity < th.thr
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(cents) / 100.0 / 7.0, 2) AS avg_yearly
    FROM f
"""


SQL_QUERIES["referential_audit"] = q_referential_audit


ORACLE_SQL["referential_audit"] = """
    SELECT
        CAST((SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
            AS orphan_lineitems,
        CAST((SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                WHERE l.l_orderkey = o.o_orderkey)) AS BIGINT)
            AS childless_orders,
        CAST((SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
            AS orders_missing_customer
"""


SQL_QUERIES["pettitt_bh"] = q_pettitt_bh


ORACLE_SQL["pettitt_bh"] = """
    WITH c AS (
        SELECT event_type AS t, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM c),
    tps AS (SELECT DISTINCT t FROM c),
    g AS (
        SELECT tps.t, days.day, coalesce(c.n, 0) AS n
        FROM tps CROSS JOIN days
        LEFT JOIN c ON c.t = tps.t AND c.day = days.day
    ),
    rk AS (
        SELECT t, day, n,
               rank() OVER (PARTITION BY t ORDER BY n) AS mn,
               count(*) OVER (PARTITION BY t, n) AS tc,
               count(*) OVER (PARTITION BY t) AS m
        FROM g
    ),
    u AS (
        SELECT t, day, m,
               row_number() OVER (PARTITION BY t ORDER BY day) AS i,
               2.0 * sum(mn + (tc - 1) / 2.0)
                   OVER (PARTITION BY t ORDER BY day)
                   - row_number() OVER (PARTITION BY t ORDER BY day)
                     * (m + 1.0) AS ut
        FROM rk
    ),
    best AS (
        SELECT t, day, m, abs(ut) AS k,
               row_number() OVER (PARTITION BY t
                                  ORDER BY abs(ut) DESC, day) AS pick
        FROM u WHERE i < m
    ),
    stat AS (
        SELECT t, day AS change_day, k,
               least(1.0, 2.0 * exp(-6.0 * k * k / (m * m * m * 1.0 + m * m)))
                   AS p
        FROM best WHERE pick = 1
    ),
    ranked AS (
        SELECT t, change_day, k, p,
               row_number() OVER (ORDER BY p, t) AS r,
               count(*) OVER () AS mt
        FROM stat
    ),
    kmax AS (
        SELECT coalesce(max(r), 0) AS km FROM ranked
        WHERE p <= r * 1.0 / mt * 0.1
    )
    SELECT t AS event_type, change_day,
           round(k, 6) AS k_stat, round(p, 6) AS p_approx,
           CAST(r AS BIGINT) AS bh_rank,
           CAST(CASE WHEN r <= kmax.km THEN 1 ELSE 0 END AS BIGINT)
               AS significant
    FROM ranked CROSS JOIN kmax
    ORDER BY bh_rank
"""


SQL_QUERIES["geometric_median"] = q_geometric_median


ORACLE_SQL["geometric_median"] = """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings WHERE label = 0
    ),
    long AS (
        SELECT vec_id, unnest(generate_series(1, len(x))) AS dim, x
        FROM e
    ),
    lv AS (SELECT vec_id, dim, x[dim] AS v FROM long),
    c0 AS (SELECT dim, avg(v) AS c FROM lv GROUP BY dim),
    d1 AS (
        SELECT lv.vec_id, sqrt(sum((lv.v - c0.c) * (lv.v - c0.c))) AS d
        FROM lv JOIN c0 ON c0.dim = lv.dim GROUP BY lv.vec_id
    ),
    c1 AS (
        SELECT lv.dim,
               sum(lv.v / d1.d) / sum(1.0 / d1.d) AS c
        FROM lv JOIN d1 ON d1.vec_id = lv.vec_id AND d1.d > 0
        GROUP BY lv.dim
    ),
    d2 AS (
        SELECT lv.vec_id, sqrt(sum((lv.v - c1.c) * (lv.v - c1.c))) AS d
        FROM lv JOIN c1 ON c1.dim = lv.dim GROUP BY lv.vec_id
    ),
    c2 AS (
        SELECT lv.dim,
               sum(lv.v / d2.d) / sum(1.0 / d2.d) AS c
        FROM lv JOIN d2 ON d2.vec_id = lv.vec_id AND d2.d > 0
        GROUP BY lv.dim
    ),
    dfin AS (
        SELECT lv.vec_id, sqrt(sum((lv.v - c2.c) * (lv.v - c2.c))) AS d
        FROM lv JOIN c2 ON c2.dim = lv.dim GROUP BY lv.vec_id
    )
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n,
           round((SELECT sum(c) FROM c2), 6) AS coord_sum,
           round((SELECT sum(d) FROM dfin) / (SELECT count(*) FROM e), 6)
               AS mean_dist
"""


SQL_QUERIES["join_skew_report"] = q_join_skew_report


ORACLE_SQL["join_skew_report"] = """
    WITH pk AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1),
    st AS (
        SELECT count(*) AS nd, sum(n) AS tr, max(n) AS mx FROM pk
    ),
    ranked AS (
        SELECT n,
               row_number() OVER (ORDER BY n) AS r_asc,
               row_number() OVER (ORDER BY n DESC) AS r_desc
        FROM pk
    ),
    p99 AS (
        SELECT min(n) AS p99 FROM ranked, st
        WHERE r_asc >= CAST(ceil(0.99 * st.nd) AS BIGINT)
    ),
    topshare AS (
        SELECT sum(n) AS rows_top FROM ranked, st
        WHERE r_desc <= greatest(1, CAST(floor(0.01 * st.nd) AS BIGINT))
    )
    SELECT CAST(st.nd AS BIGINT) AS n_distinct,
           CAST(st.tr AS BIGINT) AS total_rows,
           CAST(st.mx AS BIGINT) AS max_fanout,
           CAST(p99.p99 AS BIGINT) AS p99_fanout,
           round(topshare.rows_top * 1.0 / st.tr, 6) AS top1pct_share
    FROM st CROSS JOIN p99 CROSS JOIN topshare
"""


SQL_QUERIES["bloom_planner"] = q_bloom_planner


ORACLE_SQL["bloom_planner"] = """
    WITH n AS (SELECT count(DISTINCT user_id) AS n FROM events),
    p AS (SELECT * FROM (VALUES (0.01), (0.001), (0.0001)) AS t(fpr))
    SELECT p.fpr, CAST(n.n AS BIGINT) AS n_keys,
           CAST(ceil(-n.n * ln(p.fpr) / (ln(2) * ln(2))) AS BIGINT) AS m_bits,
           round(-ln(p.fpr) / (ln(2) * ln(2)), 6) AS bits_per_key,
           CAST(ceil(-ln(p.fpr) / ln(2)) AS BIGINT) AS k_hashes
    FROM p CROSS JOIN n ORDER BY p.fpr DESC
"""


SQL_QUERIES["otsu_threshold"] = q_otsu_threshold


ORACLE_SQL["otsu_threshold"] = r"""
    WITH l AS (
        SELECT len(regexp_split_to_array(trim(text), '\s+')) * 1.0 AS v
        FROM documents
    ),
    mm AS (SELECT min(v) AS lo, max(v) AS hi FROM l),
    b AS (
        SELECT least(CAST(floor((v - mm.lo)
                   / (CASE WHEN mm.hi - mm.lo = 0 THEN 1.0
                      ELSE mm.hi - mm.lo END) * 32) AS BIGINT), 31) AS bin,
               v
        FROM l CROSS JOIN mm
    ),
    h AS (
        SELECT bins.bin,
               coalesce(sum(b.v), 0) AS vsum, count(b.v) AS cnt
        FROM (SELECT unnest(generate_series(0, 31)) AS bin) bins
        LEFT JOIN b ON b.bin = bins.bin
        GROUP BY bins.bin
    ),
    cum AS (
        SELECT bin,
               sum(cnt) OVER (ORDER BY bin) AS cc,
               sum(vsum) OVER (ORDER BY bin) AS cs,
               sum(cnt) OVER () AS nt,
               sum(vsum) OVER () AS st
        FROM h
    ),
    scores AS (
        SELECT bin,
               (cc * 1.0 / nt) * (1.0 - cc * 1.0 / nt)
               * (cs / cc - (st - cs) / (nt - cc))
               * (cs / cc - (st - cs) / (nt - cc)) AS bc
        FROM cum WHERE bin < 31 AND cc > 0 AND cc < nt
    ),
    best AS (
        SELECT bin, bc, row_number() OVER (ORDER BY bc DESC, bin) AS pick
        FROM scores
    )
    SELECT CAST(best.bin AS BIGINT) AS bin,
           round(mm.lo + (best.bin + 1)
                 * (CASE WHEN mm.hi - mm.lo = 0 THEN 1.0
                    ELSE mm.hi - mm.lo END) / 32, 6) AS threshold,
           round(best.bc, 6) AS between_var
    FROM best CROSS JOIN mm WHERE pick = 1
"""


SQL_QUERIES["feature_mi"] = q_feature_mi


ORACLE_SQL["feature_mi"] = (
    "WITH gq AS (" + ORACLE_SQL["gopher_quality"].replace("ORDER BY doc_id", "") + r"""),
    f AS (
        SELECT d.doc_id,
               len(regexp_split_to_array(trim(d.text), '\s+')) * 1.0 AS ntok,
               len(list_distinct(regexp_split_to_array(trim(d.text), '\s+')))
                   * 1.0 / len(regexp_split_to_array(trim(d.text), '\s+')) AS uniq,
               list_sum(list_transform(regexp_split_to_array(trim(d.text), '\s+'),
                        w -> length(w))) * 1.0
                   / len(regexp_split_to_array(trim(d.text), '\s+')) AS mwl,
               gq.keep AS y
        FROM documents d JOIN gq ON gq.doc_id = d.doc_id
    ),
    long AS (
        SELECT 'ntok' AS feature, ntok AS v, y FROM f
        UNION ALL SELECT 'uniq', uniq, y FROM f
        UNION ALL SELECT 'mwl', mwl, y FROM f
    ),
    rg AS (
        SELECT feature, min(v) AS lo, max(v) AS hi FROM long GROUP BY feature
    ),
    b AS (
        SELECT long.feature,
               least(CAST(floor((long.v - rg.lo)
                   / (CASE WHEN rg.hi - rg.lo = 0 THEN 1.0
                      ELSE rg.hi - rg.lo END) * 8) AS BIGINT), 7) AS bin,
               long.y
        FROM long JOIN rg ON rg.feature = long.feature
    ),
    c AS (SELECT feature, bin, y, count(*) AS n FROM b GROUP BY 1, 2, 3),
    t AS (SELECT feature, sum(n) AS nt FROM c GROUP BY feature),
    pb AS (SELECT feature, bin, sum(n) AS nb FROM c GROUP BY feature, bin),
    py AS (SELECT feature, y, sum(n) AS ny FROM c GROUP BY feature, y)
    SELECT c.feature,
           round(sum((c.n * 1.0 / t.nt)
                     * ln((c.n * 1.0 / t.nt)
                          / ((pb.nb * 1.0 / t.nt) * (py.ny * 1.0 / t.nt)))
                     ORDER BY c.bin, c.y), 6) AS mi
    FROM c
    JOIN t ON t.feature = c.feature
    JOIN pb ON pb.feature = c.feature AND pb.bin = c.bin
    JOIN py ON py.feature = c.feature AND py.y = c.y
    GROUP BY c.feature ORDER BY c.feature
"""
)


SQL_QUERIES["hash_uniformity"] = q_hash_uniformity


ORACLE_SQL["hash_uniformity"] = """
    WITH k AS (
        SELECT DISTINCT user_id,
               md5_number_lower(CAST(user_id AS VARCHAR)) AS h
        FROM events
    ),
    b AS (
        SELECT CAST(h >> 56 AS BIGINT) AS bucket FROM k
    ),
    h AS (
        SELECT bins.bucket, count(b.bucket) AS n
        FROM (SELECT unnest(generate_series(0, 255)) AS bucket) bins
        LEFT JOIN b ON b.bucket = bins.bucket
        GROUP BY bins.bucket
    ),
    st AS (
        SELECT bucket, n,
               sum(n) OVER (ORDER BY bucket) AS cum,
               sum(n) OVER () AS nt
        FROM h
    )
    SELECT CAST(max(nt) AS BIGINT) AS n_keys,
           round(max(abs(cum * 1.0 / nt - (bucket + 1.0) / 256.0)), 6)
               AS ks_boundary,
           round(sqrt(sum((n - nt / 256.0) * (n - nt / 256.0)) / 256.0)
                 / (max(nt) / 256.0), 6) AS bucket_cv,
           round(sum((n - nt / 256.0) * (n - nt / 256.0)) / (max(nt) / 256.0), 6)
               AS chi2
    FROM st
"""


SQL_QUERIES["lof_outliers"] = q_lof_outliers


ORACLE_SQL["lof_outliers"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    d AS (
        SELECT a.vec_id AS p, b.vec_id AS o, list_distance(a.x, b.x) AS d,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY list_distance(a.x, b.x), b.vec_id)
                   AS rn
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    nn AS (SELECT p, o, d FROM d WHERE rn <= 3),
    kd AS (SELECT p, max(d) AS kdist FROM nn GROUP BY p),
    reach AS (
        SELECT nn.p, nn.o, greatest(kd.kdist, nn.d) AS rd
        FROM nn JOIN kd ON kd.p = nn.o
    ),
    lrd AS (SELECT p, 3.0 / sum(rd) AS lrd FROM reach GROUP BY p),
    lof AS (
        SELECT nn.p, sum(lo.lrd / lp.lrd) / 3.0 AS lof
        FROM nn
        JOIN lrd lo ON lo.p = nn.o
        JOIN lrd lp ON lp.p = nn.p
        GROUP BY nn.p
    )
    SELECT CAST(row_number() OVER (ORDER BY round(lof, 6) DESC, p) AS BIGINT)
               AS rank,
           CAST(p AS BIGINT) AS vec_id, round(lof, 6) AS lof
    FROM lof ORDER BY round(lof, 6) DESC, p LIMIT 5
"""


SQL_QUERIES["dbscan_cores"] = q_dbscan_cores


ORACLE_SQL["dbscan_cores"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    nb AS (
        SELECT a.vec_id, count(*) AS n_nbr
        FROM e a JOIN e b ON list_distance(a.x, b.x) <= 4.0
        GROUP BY a.vec_id
    ),
    core AS (SELECT vec_id FROM nb WHERE n_nbr >= 4),
    nearc AS (
        SELECT DISTINCT a.vec_id
        FROM e a
        JOIN e b ON list_distance(a.x, b.x) <= 4.0
        JOIN core c ON c.vec_id = b.vec_id
    )
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_points,
           CAST((SELECT count(*) FROM core) AS BIGINT) AS core,
           CAST((SELECT count(*) FROM nearc
                 WHERE vec_id NOT IN (SELECT vec_id FROM core)) AS BIGINT)
               AS border,
           CAST((SELECT count(*) FROM e) - (SELECT count(*) FROM core)
                - (SELECT count(*) FROM nearc
                   WHERE vec_id NOT IN (SELECT vec_id FROM core)) AS BIGINT)
               AS noise
"""


SQL_QUERIES["chao_shen_entropy"] = q_chao_shen_entropy


ORACLE_SQL["chao_shen_entropy"] = r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    c AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    h AS (SELECT c, count(*) AS n_types FROM c GROUP BY c),
    st AS (
        SELECT sum(c * n_types) * 1.0 AS n,
               coalesce(sum(CASE WHEN c = 1 THEN n_types END), 0) * 1.0 AS f1
        FROM h
    ),
    terms AS (
        SELECT h.c, h.n_types, st.n, 1.0 - st.f1 / st.n AS cov,
               (h.c / st.n) AS p
        FROM h CROSS JOIN st
    )
    SELECT CAST(max(n) AS BIGINT) AS n_tokens,
           round(max(cov), 6) AS coverage,
           round(-sum(n_types * p * ln(p) ORDER BY c), 6) AS h_plugin,
           round(-sum(CASE WHEN cov * p > 0 AND cov * p < 1
                           THEN n_types * cov * p * ln(cov * p)
                                / (1.0 - exp(n * ln(1.0 - cov * p)))
                           WHEN cov * p >= 1
                           THEN n_types * cov * p * ln(cov * p)
                           ELSE 0 END ORDER BY c), 6) AS h_chao_shen
    FROM terms
"""


SQL_QUERIES["split_half_reliability"] = q_split_half_reliability


ORACLE_SQL["split_half_reliability"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    idx AS (
        SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks
    ),
    halves AS (
        SELECT doc_id,
               count(DISTINCT CASE WHEN i % 2 = 1 THEN w[i] END) * 1.0
                   / nullif(sum(CASE WHEN i % 2 = 1 THEN 1 ELSE 0 END), 0) AS a,
               count(DISTINCT CASE WHEN i % 2 = 0 THEN w[i] END) * 1.0
                   / nullif(sum(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END), 0) AS b
        FROM idx GROUP BY doc_id
    ),
    f AS (SELECT coalesce(a, 0) AS a, coalesce(b, 0) AS b FROM halves),
    m AS (SELECT count(*) AS n, avg(a) AS ma, avg(b) AS mb FROM f),
    s AS (
        SELECT m.n,
               sum((f.a - m.ma) * (f.a - m.ma)) AS saa,
               sum((f.b - m.mb) * (f.b - m.mb)) AS sbb,
               sum((f.a - m.ma) * (f.b - m.mb)) AS sab
        FROM f CROSS JOIN m GROUP BY m.n
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           round(sab / sqrt(saa * sbb), 6) AS half_corr,
           round(2.0 * (sab / sqrt(saa * sbb))
                 / (1.0 + sab / sqrt(saa * sbb)), 6) AS spearman_brown
    FROM s
"""


SQL_QUERIES["krippendorff_alpha"] = q_krippendorff_alpha


ORACLE_SQL["krippendorff_alpha"] = (
    "WITH pred AS (" + ORACLE_SQL["langid"] + """),
    cm AS (
        SELECT d.lang, p.lang_pred, count(*) AS cnt
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.lang_pred
    ),
    nu AS (SELECT sum(cnt) * 1.0 AS n FROM cm),
    do_ AS (
        SELECT sum(CASE WHEN lang <> lang_pred THEN cnt ELSE 0 END) / nu.n AS do
        FROM cm CROSS JOIN nu GROUP BY nu.n
    ),
    pool AS (
        SELECT v, sum(c) AS nc FROM (
            SELECT lang AS v, sum(cnt) AS c FROM cm GROUP BY lang
            UNION ALL
            SELECT lang_pred AS v, sum(cnt) AS c FROM cm GROUP BY lang_pred
        ) GROUP BY v
    ),
    de_ AS (
        SELECT sum(nc * ((SELECT sum(nc) FROM pool) - nc) ORDER BY v)
               / ((SELECT sum(nc) FROM pool)
                  * ((SELECT sum(nc) FROM pool) - 1.0)) AS de
        FROM pool
    )
    SELECT CAST(nu.n AS BIGINT) AS n_units,
           round(do_.do, 6) AS d_observed,
           round(de_.de, 6) AS d_expected,
           round(1.0 - do_.do / de_.de, 6) AS alpha
    FROM nu CROSS JOIN do_ CROSS JOIN de_
"""
)


SQL_QUERIES["quantile_treatment_effect"] = q_quantile_treatment_effect


ORACLE_SQL["quantile_treatment_effect"] = """
    WITH p AS (
        SELECT user_id % 2 AS g, value FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT g, value,
               row_number() OVER (PARTITION BY g ORDER BY value) - 1 AS rn,
               count(*) OVER (PARTITION BY g) AS n
        FROM p
    ),
    qq AS (SELECT * FROM (VALUES (0.25), (0.5), (0.9)) AS t(q)),
    tgt AS (
        SELECT gg.g, qq.q, qq.q * (gg.n - 1) AS h,
               CAST(floor(qq.q * (gg.n - 1)) AS BIGINT) AS lo,
               CAST(ceil(qq.q * (gg.n - 1)) AS BIGINT) AS hi
        FROM (SELECT DISTINCT g, n FROM v) gg CROSS JOIN qq
    ),
    pv AS (
        SELECT t.g, t.q,
               vlo.value + (t.h - floor(t.h)) * (vhi.value - vlo.value) AS val
        FROM tgt t
        JOIN v vlo ON vlo.g = t.g AND vlo.rn = t.lo
        JOIN v vhi ON vhi.g = t.g AND vhi.rn = t.hi
    )
    SELECT c.q, round(c.val, 6) AS control, round(t.val, 6) AS treatment,
           round(t.val - c.val, 6) AS qte
    FROM pv c JOIN pv t ON t.q = c.q AND c.g = 0 AND t.g = 1
    ORDER BY c.q
"""


SQL_QUERIES["hub_removal_robustness"] = q_hub_removal_robustness


ORACLE_SQL["hub_removal_robustness"] = f"""
    WITH RECURSIVE ed AS ({EDGES_SQL}),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM ed WHERE src <> dst
    ),
    deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
        ) GROUP BY node
    ),
    rk AS (
        SELECT node, row_number() OVER (ORDER BY d DESC, node) AS r FROM deg
    ),
    ks AS (SELECT unnest(generate_series(0, 5)) AS k),
    alive AS (
        SELECT ks.k, rk.node FROM ks JOIN rk ON rk.r > ks.k
    ),
    keu AS (
        SELECT ks.k, e.a AS u, e.b AS v
        FROM ks JOIN e ON TRUE
        JOIN rk ra ON ra.node = e.a AND ra.r > ks.k
        JOIN rk rb ON rb.node = e.b AND rb.r > ks.k
        UNION ALL
        SELECT ks.k, e.b, e.a
        FROM ks JOIN e ON TRUE
        JOIN rk ra ON ra.node = e.a AND ra.r > ks.k
        JOIN rk rb ON rb.node = e.b AND rb.r > ks.k
    ),
    reach(k, node, r) AS (
        SELECT k, node, node FROM alive
        UNION
        SELECT keu.k, keu.u, reach.r
        FROM reach JOIN keu ON keu.k = reach.k AND keu.v = reach.node
    ),
    fin AS (SELECT k, node, min(r) AS label FROM reach GROUP BY k, node),
    comp AS (SELECT k, label, count(*) AS sz FROM fin GROUP BY k, label),
    nn AS (SELECT k, count(*) AS n FROM alive GROUP BY k)
    SELECT CAST(nn.k AS BIGINT) AS k_removed,
           CAST(nn.n AS BIGINT) AS n_nodes,
           round(max(comp.sz) * 1.0 / nn.n, 6) AS lcc_frac
    FROM nn JOIN comp ON comp.k = nn.k
    GROUP BY nn.k, nn.n ORDER BY nn.k
"""


SQL_QUERIES["tpch_q9"] = q_tpch_q9


ORACLE_SQL["tpch_q9"] = """
    SELECT ns.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS yr,
           round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                          AS BIGINT)
                     - CAST(round(p.p_retailprice * l.l_quantity * 0.5 * 100)
                            AS BIGINT)) / 100.0, 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    GROUP BY ns.n_name, year(o.o_orderdate)
    ORDER BY nation, yr
"""


SQL_QUERIES["funnel_wilson"] = q_funnel_wilson


ORACLE_SQL["funnel_wilson"] = (
    "WITH f AS (" + ORACLE_SQL["funnel_conversion"] + """),
    o AS (
        SELECT *, row_number() OVER () AS i FROM f
    ),
    pairs AS (
        SELECT a.step || '->' || b.step AS step,
               a.n_users AS n, b.n_users AS k
        FROM o a JOIN o b ON b.i = a.i + 1
        WHERE a.n_users > 0
    )
    SELECT step, CAST(n AS BIGINT) AS n_prev, CAST(k AS BIGINT) AS n_conv,
           round(k * 1.0 / n, 6) AS rate,
           round(((k * 1.0 / n) + 1.96 * 1.96 / (2 * n)) / (1 + 1.96 * 1.96 / n)
                 - 1.96 * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                               + 1.96 * 1.96 / (4.0 * n * n))
                   / (1 + 1.96 * 1.96 / n), 6) AS ci_lo,
           round(((k * 1.0 / n) + 1.96 * 1.96 / (2 * n)) / (1 + 1.96 * 1.96 / n)
                 + 1.96 * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                               + 1.96 * 1.96 / (4.0 * n * n))
                   / (1 + 1.96 * 1.96 / n), 6) AS ci_hi
    FROM pairs
"""
)


SQL_QUERIES["tpch_q1"] = q_tpch_q1


ORACLE_SQL["tpch_q1"] = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) / 100.0, 2) AS sum_disc_price,
           round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                * (1 + l_tax) * 100) AS BIGINT)) / 100.0, 2)
               AS sum_charge,
           round(sum(l_quantity) / count(*), 6) AS avg_qty,
           round(sum(l_extendedprice) / count(*), 6) AS avg_price,
           round(sum(l_discount) / count(*), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


SQL_QUERIES["revenue_hhi_monthly"] = q_revenue_hhi_monthly


ORACLE_SQL["revenue_hhi_monthly"] = """
    WITH c AS (
        SELECT strftime(ts, '%Y-%m') AS month, user_id,
               sum(CAST(round(value * 100) AS BIGINT)) AS c
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    t AS (SELECT month, sum(c) * 1.0 AS tot FROM c GROUP BY month)
    SELECT c.month, CAST(count(*) AS BIGINT) AS n_spenders,
           round(sum((c.c / t.tot) * (c.c / t.tot)), 6) AS hhi,
           round(1.0 / sum((c.c / t.tot) * (c.c / t.tot)), 6) AS effective_n
    FROM c JOIN t ON t.month = c.month
    GROUP BY c.month ORDER BY c.month
"""


SQL_QUERIES["binseg_proportion"] = q_binseg_proportion


ORACLE_SQL["binseg_proportion"] = """
    WITH c AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k,
               count(*) AS n
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY 1
    ),
    cum AS (
        SELECT day,
               sum(k) OVER (ORDER BY day) * 1.0 AS ck,
               sum(n) OVER (ORDER BY day) * 1.0 AS cn,
               sum(k) OVER () * 1.0 AS kt,
               sum(n) OVER () * 1.0 AS nt,
               row_number() OVER (ORDER BY day) AS i,
               count(*) OVER () AS m
        FROM c
    ),
    sc AS (
        SELECT day,
               2.0 * (
                 (CASE WHEN ck > 0 THEN ck * ln(ck / cn) ELSE 0 END)
               + (CASE WHEN cn - ck > 0
                       THEN (cn - ck) * ln((cn - ck) / cn) ELSE 0 END)
               + (CASE WHEN kt - ck > 0
                       THEN (kt - ck) * ln((kt - ck) / (nt - cn)) ELSE 0 END)
               + (CASE WHEN (nt - cn) - (kt - ck) > 0
                       THEN ((nt - cn) - (kt - ck))
                            * ln(((nt - cn) - (kt - ck)) / (nt - cn)) ELSE 0 END)
               - (CASE WHEN kt > 0 THEN kt * ln(kt / nt) ELSE 0 END)
               - (CASE WHEN nt - kt > 0
                       THEN (nt - kt) * ln((nt - kt) / nt) ELSE 0 END)
               ) AS g2
        FROM cum WHERE i < m
    )
    SELECT day AS split_day, round(g2, 6) AS g2
    FROM sc ORDER BY g2 DESC, day LIMIT 1
"""


SQL_QUERIES["k_anonymity"] = q_k_anonymity


ORACLE_SQL["k_anonymity"] = """
    WITH mm AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
    q AS (
        SELECT source, lang,
               least(CAST(floor((n_chars - mm.lo)
                   / (CASE WHEN mm.hi - mm.lo = 0 THEN 1.0
                      ELSE mm.hi - mm.lo END) * 10) AS BIGINT), 9) AS dec
        FROM documents CROSS JOIN mm
    ),
    cls AS (SELECT source, lang, dec, count(*) AS n FROM q GROUP BY 1, 2, 3),
    st AS (
        SELECT count(*) AS n_classes, min(n) AS min_class, sum(n) AS n_docs
        FROM cls
    ),
    ks AS (SELECT * FROM (VALUES (2), (5), (10)) AS t(k))
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(st.n_classes AS BIGINT) AS n_classes,
           CAST(st.min_class AS BIGINT) AS min_class,
           CAST((SELECT count(*) FROM cls WHERE cls.n < ks.k) AS BIGINT)
               AS small_classes,
           round((SELECT coalesce(sum(n), 0) FROM cls WHERE cls.n < ks.k)
                 * 1.0 / st.n_docs, 6) AS at_risk_frac
    FROM ks CROSS JOIN st ORDER BY ks.k
"""


SQL_QUERIES["l_diversity"] = q_l_diversity


ORACLE_SQL["l_diversity"] = """
    WITH mm AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
    q AS (
        SELECT source,
               least(CAST(floor((n_chars - mm.lo)
                   / (CASE WHEN mm.hi - mm.lo = 0 THEN 1.0
                      ELSE mm.hi - mm.lo END) * 10) AS BIGINT), 9) AS dec,
               lang
        FROM documents CROSS JOIN mm
    ),
    div AS (
        SELECT source, dec, count(DISTINCT lang) AS l FROM q GROUP BY 1, 2
    ),
    st AS (SELECT min(l) AS min_l FROM div)
    SELECT CAST(div.l AS BIGINT) AS l,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(st.min_l AS BIGINT) AS min_l
    FROM div CROSS JOIN st GROUP BY div.l, st.min_l ORDER BY div.l
"""


SQL_QUERIES["dp_noise_planner"] = q_dp_noise_planner


ORACLE_SQL["dp_noise_planner"] = """
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    v AS (
        SELECT n * 1.0 AS n,
               row_number() OVER (ORDER BY n) - 1 AS rn,
               count(*) OVER () AS m
        FROM c
    ),
    med AS (
        SELECT vlo.n + (0.5 * (v1.m - 1) - floor(0.5 * (v1.m - 1)))
                   * (vhi.n - vlo.n) AS med
        FROM (SELECT DISTINCT m FROM v) v1
        JOIN v vlo ON vlo.rn = CAST(floor(0.5 * (v1.m - 1)) AS BIGINT)
        JOIN v vhi ON vhi.rn = CAST(ceil(0.5 * (v1.m - 1)) AS BIGINT)
    ),
    eps AS (SELECT * FROM (VALUES (0.1), (1.0), (10.0)) AS t(epsilon))
    SELECT eps.epsilon,
           round(med.med, 6) AS median_count,
           round(1.0 / eps.epsilon, 6) AS laplace_b,
           round(sqrt(2.0) / eps.epsilon, 6) AS noise_sd,
           round(sqrt(2.0) / eps.epsilon / med.med, 6) AS rel_err_at_median
    FROM eps CROSS JOIN med ORDER BY eps.epsilon
"""


SQL_QUERIES["nelson_aalen"] = q_nelson_aalen


ORACLE_SQL["nelson_aalen"] = """
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
           round(sum(d * 1.0 / n) OVER (ORDER BY t), 6) AS cum_hazard,
           round(sqrt(sum(d * 1.0 / (n * n)) OVER (ORDER BY t)), 6) AS se
    FROM rk ORDER BY t
"""


SQL_QUERIES["sax_symbols"] = q_sax_symbols


ORACLE_SQL["sax_symbols"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT n * 1.0 AS x, row_number() OVER (ORDER BY day) - 1 AS t,
               count(*) OVER () AS m,
               sum(n) OVER () * 1.0 / count(*) OVER () AS mu
        FROM d
    ),
    sd AS (
        SELECT sqrt(sum((x - mu) * (x - mu)) / max(m)) AS sd, max(m) AS m
        FROM s
    ),
    z AS (
        SELECT s.t, (s.x - s.mu) / sd.sd AS z, (s.t * 8) // sd.m AS seg
        FROM s CROSS JOIN sd
    ),
    paa AS (SELECT seg, sum(z) / count(*) AS paa FROM z GROUP BY seg),
    rmse AS (
        SELECT sqrt(sum((z.z - paa.paa) * (z.z - paa.paa))
                    / (SELECT max(m) FROM sd)) AS rmse
        FROM z JOIN paa ON paa.seg = z.seg
    )
    SELECT CAST(seg AS BIGINT) AS segment,
           round(paa, 6) AS paa,
           CASE WHEN paa < -0.6745 THEN 'a'
                WHEN paa < 0.0 THEN 'b'
                WHEN paa < 0.6745 THEN 'c'
                ELSE 'd' END AS symbol,
           round(rmse.rmse, 6) AS rmse
    FROM paa CROSS JOIN rmse ORDER BY segment
"""


SQL_QUERIES["markov_mixing"] = q_markov_mixing


ORACLE_SQL["markov_mixing"] = _markov_mixing_oracle_sql()


SQL_QUERIES["abc_analysis"] = q_abc_analysis


ORACLE_SQL["abc_analysis"] = """
    WITH pc AS (
        SELECT l_partkey AS p,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                   AS BIGINT)) AS c
        FROM lineitem GROUP BY 1
    ),
    t AS (SELECT sum(c) * 1.0 AS total FROM pc),
    r AS (
        SELECT p, c,
               sum(c) OVER (ORDER BY c DESC, p) / t.total AS cum
        FROM pc CROSS JOIN t
    ),
    cl AS (
        SELECT CASE WHEN cum <= 0.80 THEN 'A'
                    WHEN cum <= 0.95 THEN 'B'
                    ELSE 'C' END AS cls,
               c
        FROM r
    )
    SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(c) AS BIGINT) AS cents,
           round(sum(c) / (SELECT total FROM t), 6) AS rev_share
    FROM cl GROUP BY cls ORDER BY cls
"""


SQL_QUERIES["harrell_c"] = q_harrell_c


ORACLE_SQL["harrell_c"] = """
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
    pairs AS (
        SELECT a.g AS ga, b.g AS gb
        FROM obs a JOIN obs b ON a.ev = 1 AND b.dur > a.dur
    )
    SELECT CAST((SELECT count(*) FROM obs) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS comparable_pairs,
           round(sum(CASE WHEN ga = 1 AND gb = 0 THEN 1.0
                          WHEN ga = gb THEN 0.5
                          ELSE 0.0 END) / count(*), 6) AS c_index
    FROM pairs
"""


SQL_QUERIES["als_rank1"] = q_als_rank1


ORACLE_SQL["als_rank1"] = """
    WITH cells AS (
        SELECT user_id, event_type AS t, count(*) * 1.0 AS n
        FROM events GROUP BY 1, 2
    ),
    v0 AS (SELECT DISTINCT t, 1.0 AS v FROM cells),
    u1 AS (
        SELECT c.user_id, sum(c.n * v0.v) / (SELECT sum(v * v) FROM v0) AS u
        FROM cells c JOIN v0 ON v0.t = c.t GROUP BY c.user_id
    ),
    v1r AS (
        SELECT c.t, sum(c.n * u1.u) AS x
        FROM cells c JOIN u1 ON u1.user_id = c.user_id GROUP BY c.t
    ),
    v1 AS (
        SELECT t, x / (SELECT sum(u * u) FROM u1) AS v FROM v1r
    ),
    u2 AS (
        SELECT c.user_id, sum(c.n * v1.v) / (SELECT sum(v * v) FROM v1) AS u
        FROM cells c JOIN v1 ON v1.t = c.t GROUP BY c.user_id
    ),
    v2r AS (
        SELECT c.t, sum(c.n * u2.u) AS x
        FROM cells c JOIN u2 ON u2.user_id = c.user_id GROUP BY c.t
    ),
    v2 AS (SELECT t, x / (SELECT sum(u * u) FROM u2) AS v FROM v2r),
    norms AS (
        SELECT sqrt((SELECT sum(u * u) FROM u2)) AS un,
               sqrt((SELECT sum(v * v) FROM v2)) AS vn,
               (SELECT sum(n * n) FROM cells) AS fro2
    )
    SELECT v2.t AS event_type,
           round(v2.v / norms.vn, 6) AS v,
           round(norms.un * norms.vn, 4) AS sigma,
           round(norms.un * norms.vn * norms.un * norms.vn / norms.fro2, 6)
               AS energy_share
    FROM v2 CROSS JOIN norms ORDER BY event_type
"""


SQL_QUERIES["learned_index_audit"] = q_learned_index_audit


ORACLE_SQL["learned_index_audit"] = """
    WITH k AS (
        SELECT DISTINCT user_id * 1.0 AS k FROM events
    ),
    p AS (
        SELECT k, row_number() OVER (ORDER BY k) - 1.0 AS pos,
               count(*) OVER () AS n
        FROM k
    ),
    m AS (SELECT avg(k) AS kb, avg(pos) AS pb, max(n) AS n FROM p),
    b AS (
        SELECT m.n, m.kb, m.pb,
               sum((p.k - m.kb) * (p.pos - m.pb))
                   / sum((p.k - m.kb) * (p.k - m.kb)) AS b1
        FROM p CROSS JOIN m GROUP BY m.n, m.kb, m.pb
    ),
    e AS (
        SELECT b.n, b.b1, b.pb - b.b1 * b.kb AS b0,
               abs(p.pos - ((b.pb - b.b1 * b.kb) + b.b1 * p.k)) AS err
        FROM p CROSS JOIN b
    )
    SELECT CAST(max(n) AS BIGINT) AS n_keys,
           round(max(b1), 6) AS slope,
           round(max(b0), 6) AS intercept,
           round(max(err), 6) AS max_err,
           round(sum(err) / count(*), 6) AS mean_err
    FROM e
"""


SQL_QUERIES["zone_map_audit"] = q_zone_map_audit


ORACLE_SQL["zone_map_audit"] = """
    WITH z AS (
        SELECT event_id // 1000 AS blk,
               min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events GROUP BY 1
    ),
    d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    busiest AS (
        SELECT day FROM d ORDER BY n DESC, day LIMIT 1
    ),
    rng AS (
        SELECT epoch_us(CAST(day || ' 00:00:00' AS TIMESTAMP)) AS d0,
               epoch_us(CAST(day || ' 00:00:00' AS TIMESTAMP)) + 86400000000 AS d1,
               day
        FROM busiest
    )
    SELECT rng.day AS busiest_day,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(CASE WHEN z.lo < rng.d1 AND z.hi >= rng.d0
                         THEN 1 ELSE 0 END) AS BIGINT) AS blocks_read,
           round(1.0 - sum(CASE WHEN z.lo < rng.d1 AND z.hi >= rng.d0
                                THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS prune_frac
    FROM z CROSS JOIN rng GROUP BY rng.day
"""


SQL_QUERIES["sort_order_benefit"] = q_sort_order_benefit


ORACLE_SQL["sort_order_benefit"] = """
    WITH o AS (
        SELECT event_type,
               lag(event_type) OVER (ORDER BY ts, event_id) AS prev
        FROM events
    ),
    r AS (
        SELECT count(*) AS n,
               1 + sum(CASE WHEN prev IS NOT NULL AND prev <> event_type
                            THEN 1 ELSE 0 END) AS runs
        FROM o
    ),
    d AS (SELECT count(DISTINCT event_type) AS k FROM events)
    SELECT CAST(r.n AS BIGINT) AS n_rows,
           CAST(r.runs AS BIGINT) AS runs_natural,
           CAST(d.k AS BIGINT) AS runs_sorted,
           round(r.runs * 1.0 / d.k, 6) AS benefit_ratio
    FROM r CROSS JOIN d
"""


SQL_QUERIES["dag_layers"] = q_dag_layers


ORACLE_SQL["dag_layers"] = f"""
    WITH RECURSIVE ed AS ({EDGES_SQL}),
    e AS (
        SELECT DISTINCT src AS a, dst AS b FROM ed WHERE src < dst
    ),
    nodes AS (
        SELECT DISTINCT x FROM (
            SELECT a AS x FROM e UNION SELECT b AS x FROM e
        )
    ),
    paths(node, l) AS (
        SELECT x, 0 FROM nodes
        UNION
        SELECT e.b, paths.l + 1
        FROM paths JOIN e ON e.a = paths.node
    ),
    layer AS (SELECT node, max(l) AS layer FROM paths GROUP BY node),
    st AS (SELECT max(layer) AS depth FROM layer)
    SELECT CAST(layer AS BIGINT) AS layer,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(st.depth AS BIGINT) AS depth
    FROM layer CROSS JOIN st
    GROUP BY layer, st.depth ORDER BY layer
"""


SQL_QUERIES["ipw_ate"] = q_ipw_ate


ORACLE_SQL["ipw_ate"] = """
    WITH p AS (
        SELECT CAST(hour(ts) // 6 AS BIGINT) AS s, user_id % 2 AS g, value AS v
        FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
        SELECT s, g, sum(v) AS sv, count(*) AS n FROM p GROUP BY s, g
    ),
    prop AS (
        SELECT s,
               sum(CASE WHEN g = 1 THEN n ELSE 0 END) * 1.0 / sum(n) AS e
        FROM cells GROUP BY s
    ),
    w AS (
        SELECT
            sum(CASE WHEN c.g = 1 AND prop.e > 0 THEN c.sv / prop.e END) AS wy1,
            sum(CASE WHEN c.g = 1 AND prop.e > 0 THEN c.n / prop.e END) AS w1,
            sum(CASE WHEN c.g = 0 AND prop.e < 1
                     THEN c.sv / (1 - prop.e) END) AS wy0,
            sum(CASE WHEN c.g = 0 AND prop.e < 1
                     THEN c.n / (1 - prop.e) END) AS w0
        FROM cells c JOIN prop ON prop.s = c.s
    )
    SELECT round(wy1 / w1, 6) AS mu_treated,
           round(wy0 / w0, 6) AS mu_control,
           round(wy1 / w1 - wy0 / w0, 6) AS ate_ipw
    FROM w
"""


SQL_QUERIES["cache_working_set"] = q_cache_working_set


ORACLE_SQL["cache_working_set"] = """
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    r AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, user_id) AS rk FROM c
    ),
    t AS (SELECT sum(n) * 1.0 AS total, count(*) AS nu FROM c),
    ks AS (SELECT * FROM (VALUES (8), (32), (128)) AS v(k))
    SELECT CAST(ks.k AS BIGINT) AS cache_size,
           CAST(least(ks.k, t.nu) AS BIGINT) AS n_pinned,
           round((SELECT coalesce(sum(n), 0) FROM r WHERE r.rk <= ks.k)
                 / t.total, 6) AS hit_rate
    FROM ks CROSS JOIN t ORDER BY ks.k
"""


SQL_QUERIES["coupon_collector"] = q_coupon_collector


ORACLE_SQL["coupon_collector"] = """
    WITH f AS (
        SELECT event_type, epoch_us(ts) AS us, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    ff AS (SELECT event_type, us, event_id FROM f WHERE rn = 1),
    last AS (
        SELECT us, event_id FROM ff ORDER BY us DESC, event_id DESC LIMIT 1
    ),
    st AS (SELECT count(*) AS k FROM ff),
    n AS (
        SELECT count(*) AS n_draws
        FROM events e CROSS JOIN last
        WHERE epoch_us(e.ts) < last.us
           OR (epoch_us(e.ts) = last.us AND e.event_id <= last.event_id)
    ),
    h AS (
        SELECT sum(1.0 / i) AS hk FROM (
            SELECT unnest(generate_series(1, (SELECT k FROM st))) AS i
        )
    )
    SELECT CAST(st.k AS BIGINT) AS k_types,
           CAST(n.n_draws AS BIGINT) AS n_draws,
           round(st.k * h.hk, 6) AS expected_uniform,
           round(n.n_draws / (st.k * h.hk), 6) AS ratio
    FROM st CROSS JOIN n CROSS JOIN h
"""


SQL_QUERIES["vocab_half_life"] = q_vocab_half_life


ORACLE_SQL["vocab_half_life"] = r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    f AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY w),
    h AS (SELECT fd, count(*) AS n_new FROM f GROUP BY fd),
    c AS (
        SELECT fd, sum(n_new) OVER (ORDER BY fd) AS cum,
               sum(n_new) OVER () * 1.0 AS v
        FROM h
    ),
    half AS (SELECT min(fd) AS d FROM c WHERE cum >= 0.5 * v),
    p90 AS (SELECT min(fd) AS d FROM c WHERE cum >= 0.9 * v),
    nd AS (SELECT count(*) AS n FROM documents)
    SELECT CAST((SELECT max(v) FROM c) AS BIGINT) AS vocab,
           CAST(half.d AS BIGINT) AS half_life_doc,
           CAST(p90.d AS BIGINT) AS p90_doc,
           round((half.d + 1.0) / nd.n, 6) AS half_life_frac
    FROM half CROSS JOIN p90 CROSS JOIN nd
"""


SQL_QUERIES["peak_to_mean"] = q_peak_to_mean


ORACLE_SQL["peak_to_mean"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    h AS (SELECT hour(ts) AS hr, count(*) AS n FROM events GROUP BY 1)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           round((SELECT max(n) * 1.0 FROM d)
                 / (SELECT sum(n) * 1.0 / count(*) FROM d), 6) AS day_par,
           round((SELECT max(n) * 1.0 FROM h)
                 / (SELECT sum(n) * 1.0 / count(*) FROM h), 6) AS hour_par
"""


SQL_QUERIES["gompertz_fit"] = q_gompertz_fit


ORACLE_SQL["gompertz_fit"] = """
    WITH fd AS (
        SELECT user_id, min(strftime(ts, '%Y-%m-%d %H')) AS day
        FROM events GROUP BY user_id
    ),
    c AS (SELECT day, count(*) AS n_new FROM fd GROUP BY day),
    cum AS (
        SELECT day, sum(n_new) OVER (ORDER BY day) * 1.0 AS cum,
               row_number() OVER (ORDER BY day) - 1.0 AS t,
               sum(n_new) OVER () * 1.0 AS k,
               count(*) OVER () AS m
        FROM c
    ),
    lin AS (
        SELECT t, ln(-ln(cum / k)) AS y FROM cum WHERE cum < k
    ),
    mm AS (SELECT avg(t) AS xb, avg(y) AS yb, count(*) AS n FROM lin),
    b AS (
        SELECT mm.xb, mm.yb, mm.n,
               sum((lin.t - mm.xb) * (lin.y - mm.yb))
                   / sum((lin.t - mm.xb) * (lin.t - mm.xb)) AS slope
        FROM lin CROSS JOIN mm GROUP BY mm.xb, mm.yb, mm.n
    )
    SELECT CAST((SELECT max(m) FROM cum) AS BIGINT) AS n_hours,
           CAST((SELECT max(k) FROM cum) AS BIGINT) AS k_cap,
           round(exp(yb - slope * xb), 6) AS b,
           round(-slope, 6) AS c
    FROM b WHERE n >= 2
"""


SQL_QUERIES["weibull_hazard"] = q_weibull_hazard


ORACLE_SQL["weibull_hazard"] = """
    WITH su AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN su ON su.user_id = e.user_id AND e.ts > su.t0
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    d AS (
        SELECT (epoch_us(pu.t1) - epoch_us(su.t0)) / 86400000000.0 AS days
        FROM su JOIN pu ON pu.user_id = su.user_id
    ),
    r AS (
        SELECT days, row_number() OVER (ORDER BY days) AS i,
               count(*) OVER () AS n
        FROM d
    ),
    lin AS (
        SELECT ln(days) AS x,
               ln(-ln(1.0 - (i - 0.3) / (n + 0.4))) AS y
        FROM r
    ),
    mm AS (SELECT avg(x) AS xb, avg(y) AS yb FROM lin),
    b AS (
        SELECT mm.xb, mm.yb,
               sum((lin.x - mm.xb) * (lin.y - mm.yb))
                   / sum((lin.x - mm.xb) * (lin.x - mm.xb)) AS k
        FROM lin CROSS JOIN mm GROUP BY mm.xb, mm.yb
    )
    SELECT CAST((SELECT max(n) FROM r) AS BIGINT) AS n_events,
           round(k, 6) AS shape_k,
           round(exp(-(yb - k * xb) / k), 6) AS scale_days
    FROM b
"""


SQL_QUERIES["price_band_mix"] = q_price_band_mix


ORACLE_SQL["price_band_mix"] = """
    WITH b AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CASE WHEN o_totalprice < 1000 THEN 'a_lt1k'
                    WHEN o_totalprice < 5000 THEN 'b_1to5k'
                    WHEN o_totalprice < 20000 THEN 'c_5to20k'
                    ELSE 'd_ge20k' END AS band
        FROM orders
    ),
    c AS (SELECT yr, band, count(*) AS n FROM b GROUP BY yr, band),
    t AS (SELECT yr, sum(n) AS nt FROM c GROUP BY yr),
    s AS (
        SELECT c.band, c.yr, c.n, round(c.n * 1.0 / t.nt, 6) AS share
        FROM c JOIN t ON t.yr = c.yr
    )
    SELECT band, yr, CAST(n AS BIGINT) AS n, share,
           round(share - lag(share) OVER (PARTITION BY band ORDER BY yr), 6)
               AS yoy_delta
    FROM s ORDER BY band, yr
"""


SQL_QUERIES["embedding_two_sample"] = q_embedding_two_sample


ORACLE_SQL["embedding_two_sample"] = """
    WITH x AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE label = 0
    ),
    y AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE label = 1
    ),
    n AS (
        SELECT (SELECT count(*) * 1.0 FROM x) AS nx,
               (SELECT count(*) * 1.0 FROM y) AS ny
    ),
    kxx AS (
        SELECT sum(exp(-(list_distance(a.v, b.v) * list_distance(a.v, b.v))
                       / 32.0)) AS s,
               sum(list_distance(a.v, b.v)) AS d
        FROM x a CROSS JOIN x b
    ),
    kyy AS (
        SELECT sum(exp(-(list_distance(a.v, b.v) * list_distance(a.v, b.v))
                       / 32.0)) AS s,
               sum(list_distance(a.v, b.v)) AS d
        FROM y a CROSS JOIN y b
    ),
    kxy AS (
        SELECT sum(exp(-(list_distance(a.v, b.v) * list_distance(a.v, b.v))
                       / 32.0)) AS s,
               sum(list_distance(a.v, b.v)) AS d
        FROM x a CROSS JOIN y b
    )
    SELECT CAST(n.nx AS BIGINT) AS n_x, CAST(n.ny AS BIGINT) AS n_y,
           round(kxx.s / (n.nx * n.nx) + kyy.s / (n.ny * n.ny)
                 - 2.0 * kxy.s / (n.nx * n.ny), 6) AS mmd2,
           round(2.0 * kxy.d / (n.nx * n.ny) - kxx.d / (n.nx * n.nx)
                 - kyy.d / (n.ny * n.ny), 6) AS energy_dist
    FROM n CROSS JOIN kxx CROSS JOIN kyy CROSS JOIN kxy
"""


SQL_QUERIES["seasonal_chi2"] = q_seasonal_chi2


ORACLE_SQL["seasonal_chi2"] = """
    WITH c AS (
        SELECT CAST(hour(ts) AS BIGINT) AS hr,
               CAST(isodow(ts) AS BIGINT) AS dow,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    t AS (SELECT sum(n) * 1.0 AS nt FROM c),
    rh AS (SELECT hr, sum(n) AS s FROM c GROUP BY hr),
    rd AS (SELECT dow, sum(n) AS s FROM c GROUP BY dow)
    SELECT CAST(t.nt AS BIGINT) AS n_events,
           CAST(((SELECT count(*) FROM rh) - 1)
                * ((SELECT count(*) FROM rd) - 1) AS BIGINT) AS df,
           round(sum((c.n - rh.s * rd.s / t.nt) * (c.n - rh.s * rd.s / t.nt)
                     / (rh.s * rd.s / t.nt) ORDER BY c.hr, c.dow), 6) AS chi2
    FROM c
    JOIN rh ON rh.hr = c.hr
    JOIN rd ON rd.dow = c.dow
    CROSS JOIN t
    GROUP BY t.nt
"""


SQL_QUERIES["inspection_paradox"] = q_inspection_paradox


ORACLE_SQL["inspection_paradox"] = """
    WITH o AS (
        SELECT user_id, epoch_us(ts) / 1000000.0 AS t,
               lag(epoch_us(ts) / 1000000.0)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    g AS (SELECT t - prev AS gap FROM o WHERE prev IS NOT NULL),
    st AS (SELECT sum(gap) AS s, sum(gap * gap) AS s2, count(*) AS n FROM g)
    SELECT CAST(n AS BIGINT) AS n_gaps,
           round(s / n, 6) AS mean_gap_s,
           round(s2 / (2.0 * s), 6) AS length_biased_s,
           round(2.0 * (s2 / (2.0 * s)) / (s / n), 6) AS paradox_factor
    FROM st
"""


SQL_QUERIES["rmst"] = q_rmst


ORACLE_SQL["rmst"] = (
    "WITH km AS (" + ORACLE_SQL["kaplan_meier"] + """),
    seg AS (
        SELECT t_us, survival,
               lag(t_us, 1, 0) OVER (ORDER BY t_us) AS t_prev,
               lag(survival, 1, 1.0) OVER (ORDER BY t_us) AS s_prev
        FROM km WHERE t_us < 7 * 86400000000
    ),
    tail AS (
        SELECT coalesce(max(t_us), 0) AS last_t,
               coalesce((SELECT survival FROM seg
                         ORDER BY t_us DESC LIMIT 1), 1.0) AS last_s
        FROM seg
    ),
    area AS (
        SELECT coalesce(sum(s_prev * (t_us - t_prev)), 0) AS a FROM seg
    )
    SELECT 7.0 AS tau_days,
           round((area.a + tail.last_s * (7 * 86400000000 - tail.last_t))
                 / 86400000000.0, 6) AS rmst_days
    FROM area CROSS JOIN tail
"""
)


SQL_QUERIES["aipw_ate"] = q_aipw_ate


ORACLE_SQL["aipw_ate"] = """
    WITH p AS (
        SELECT CAST(hour(ts) // 6 AS BIGINT) AS s, user_id % 2 AS g, value AS v
        FROM events WHERE event_type = 'purchase'
    ),
    mu AS (
        SELECT s, g, sum(v) / count(*) AS mu, count(*) AS n
        FROM p GROUP BY s, g
    ),
    e AS (
        SELECT s, sum(CASE WHEN g = 1 THEN n ELSE 0 END) * 1.0 / sum(n) AS e,
               sum(n) AS ns
        FROM mu GROUP BY s
    ),
    nall AS (SELECT sum(n) * 1.0 AS n FROM mu),
    -- full AIPW: direct term + own-arm residual correction (zero here
    -- because mu IS the exact stratum mean; the mirror keeps both terms)
    terms AS (
        SELECT
            sum(e.ns / nall.n * m1.mu)
              + sum(CASE WHEN TRUE THEN (m1.sv_res) ELSE 0 END) AS mu1,
            sum(e.ns / nall.n * m0.mu)
              + sum(CASE WHEN TRUE THEN (m0.sv_res) ELSE 0 END) AS mu0
        FROM e
        JOIN (
            SELECT p.s,
                   sum(p.v - mu.mu) / (SELECT n FROM nall)
                       / max(e2.e) AS sv_res,
                   max(mu.mu) AS mu
            FROM p
            JOIN mu ON mu.s = p.s AND mu.g = 1 AND p.g = 1
            JOIN e e2 ON e2.s = p.s
            GROUP BY p.s
        ) m1 ON m1.s = e.s
        JOIN (
            SELECT p.s,
                   sum(p.v - mu.mu) / (SELECT n FROM nall)
                       / (1 - max(e2.e)) AS sv_res,
                   max(mu.mu) AS mu
            FROM p
            JOIN mu ON mu.s = p.s AND mu.g = 0 AND p.g = 0
            JOIN e e2 ON e2.s = p.s
            GROUP BY p.s
        ) m0 ON m0.s = e.s
        CROSS JOIN nall
    )
    SELECT round(mu1, 6) AS mu1_aipw,
           round(mu0, 6) AS mu0_aipw,
           round(mu1 - mu0, 6) AS ate_aipw
    FROM terms
"""


SQL_QUERIES["erlang_blocking"] = q_erlang_blocking


ORACLE_SQL["erlang_blocking"] = """
    WITH RECURSIVE p AS (
        SELECT epoch_us(ts) / 1000000.0 AS t FROM events
        WHERE event_type = 'purchase'
    ),
    st AS (
        SELECT count(*) / (max(t) - min(t)) * 1800.0 AS e FROM p
    ),
    b(m, b) AS (
        SELECT 1, (SELECT e FROM st) * 1.0 / (1 + (SELECT e FROM st))
        UNION ALL
        SELECT m + 1,
               (SELECT e FROM st) * b / ((m + 1) + (SELECT e FROM st) * b)
        FROM b WHERE m < 8
    )
    SELECT CAST(m AS BIGINT) AS servers,
           round((SELECT e FROM st), 6) AS offered_load,
           round(b, 6) AS blocking
    FROM b ORDER BY m
"""


SQL_QUERIES["disparity_filter"] = q_disparity_filter


ORACLE_SQL["disparity_filter"] = f"""
    WITH ed AS ({EDGES_SQL}),
    e AS (
        SELECT least(src, dst) AS a, greatest(src, dst) AS b,
               sum(weight) AS w
        FROM ed WHERE src <> dst GROUP BY 1, 2
    ),
    half AS (
        SELECT a AS node, w FROM e UNION ALL SELECT b AS node, w FROM e
    ),
    st AS (SELECT node, count(*) AS k, sum(w) AS s FROM half GROUP BY node),
    scored AS (
        SELECT e.w,
               CASE WHEN sa.k > 1
                    THEN exp((sa.k - 1.0) * ln(1.0 - e.w / sa.s))
                    ELSE 0.0 END AS pa,
               CASE WHEN sb.k > 1
                    THEN exp((sb.k - 1.0) * ln(1.0 - e.w / sb.s))
                    ELSE 0.0 END AS pb
        FROM e
        JOIN st sa ON sa.node = e.a
        JOIN st sb ON sb.node = e.b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(CASE WHEN pa < 0.05 OR pb < 0.05 THEN 1 ELSE 0 END)
                AS BIGINT) AS kept,
           round(sum(CASE WHEN pa < 0.05 OR pb < 0.05 THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS kept_frac,
           round(sum(CASE WHEN pa < 0.05 OR pb < 0.05 THEN w ELSE 0 END)
                 / sum(w), 6) AS weight_share
    FROM scored
"""


SQL_QUERIES["var_cvar"] = q_var_cvar


ORACLE_SQL["var_cvar"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    dl AS (
        SELECT (c - lag(c) OVER (ORDER BY day)) / 100.0 AS delta FROM d
    ),
    r AS (
        SELECT delta, row_number() OVER (ORDER BY delta) AS rn,
               count(*) OVER () AS n
        FROM dl WHERE delta IS NOT NULL
    ),
    v AS (
        SELECT n, delta AS var95,
               greatest(CAST(ceil(0.05 * n) AS BIGINT), 1) AS pos
        FROM r WHERE rn = greatest(CAST(ceil(0.05 * n) AS BIGINT), 1)
    )
    SELECT CAST(v.n AS BIGINT) AS n_deltas,
           round(v.var95, 6) AS var95,
           round((SELECT avg(delta) FROM r WHERE rn <= v.pos), 6) AS cvar95
    FROM v
"""


SQL_QUERIES["s_metric"] = q_s_metric


ORACLE_SQL["s_metric"] = f"""
    WITH ed AS ({EDGES_SQL}),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM ed WHERE src <> dst
    ),
    deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
        ) GROUP BY node
    ),
    s AS (
        SELECT sum(da.d * 1.0 * db.d) AS s, count(*) AS m
        FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
    ),
    slots AS (
        SELECT d * 1.0 AS d,
               row_number() OVER (ORDER BY d DESC, node, i) AS rn
        FROM deg, unnest(generate_series(1, deg.d)) AS u(i)
    ),
    top AS (
        SELECT d, rn FROM slots, s WHERE rn <= 2 * s.m
    ),
    smax AS (
        SELECT sum(a.d * b.d) AS smax
        FROM top a JOIN top b ON b.rn = a.rn + 1 AND a.rn % 2 = 1
    )
    SELECT CAST(s.m AS BIGINT) AS n_edges,
           round(s.s, 6) AS s_value,
           round(smax.smax, 6) AS s_max_bound,
           round(s.s / smax.smax, 6) AS s_ratio
    FROM s CROSS JOIN smax
"""


SQL_QUERIES["theil_decomposition"] = q_theil_decomposition


ORACLE_SQL["theil_decomposition"] = """
    WITH g AS (
        SELECT source, sum(n_chars) * 1.0 AS s, count(*) AS n
        FROM documents GROUP BY source
    ),
    t AS (SELECT sum(s) AS st, sum(n) AS nt FROM g),
    tw AS (
        SELECT d.source,
               sum((d.n_chars / (g.s / g.n))
                   * ln(d.n_chars / (g.s / g.n))) AS tsum
        FROM documents d JOIN g ON g.source = d.source
        GROUP BY d.source
    ),
    terms AS (
        SELECT g.source,
               (g.s / t.st) * ln((g.s / g.n) / (t.st / t.nt)) AS tb,
               (g.s / t.st) * tw.tsum / g.n AS twi
        FROM g JOIN tw ON tw.source = g.source CROSS JOIN t
    )
    SELECT round(sum(tb ORDER BY source), 6) AS t_between,
           round(sum(twi ORDER BY source), 6) AS t_within,
           round(sum(tb ORDER BY source) + sum(twi ORDER BY source), 6)
               AS t_total
    FROM terms
"""


SQL_QUERIES["dup_event_audit"] = q_dup_event_audit


ORACLE_SQL["dup_event_audit"] = """
    WITH k AS (
        SELECT user_id, epoch_us(ts) AS us, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(count(*) AS BIGINT) AS logical_events,
           CAST(sum(n) AS BIGINT) AS physical_rows,
           CAST(sum(n) - count(*) AS BIGINT) AS dup_rows,
           round((sum(n) - count(*)) * 1.0 / sum(n), 6) AS dup_rate
    FROM k
"""


SQL_QUERIES["round_number_bias"] = q_round_number_bias


ORACLE_SQL["round_number_bias"] = """
    WITH r AS (
        SELECT CAST(round(value * 100) AS BIGINT) % 100 AS residue
        FROM events WHERE event_type = 'purchase'
    ),
    h AS (SELECT residue, count(*) AS n FROM r GROUP BY residue),
    t AS (SELECT sum(n) * 1.0 AS nt FROM h),
    full_h AS (
        SELECT g.residue, coalesce(h.n, 0) AS n
        FROM (SELECT unnest(generate_series(0, 99)) AS residue) g
        LEFT JOIN h ON h.residue = g.residue
    ),
    chi AS (
        SELECT sum((n - t.nt / 100.0) * (n - t.nt / 100.0) / (t.nt / 100.0))
            AS chi2
        FROM full_h CROSS JOIN t GROUP BY t.nt
    )
    SELECT CAST(row_number() OVER (ORDER BY h.n DESC, h.residue) AS BIGINT)
               AS rank,
           CAST(h.residue AS BIGINT) AS residue,
           CAST(h.n AS BIGINT) AS n,
           round(h.n / t.nt, 6) AS share,
           round(chi.chi2, 6) AS chi2_uniform
    FROM h CROSS JOIN t CROSS JOIN chi
    ORDER BY h.n DESC, h.residue LIMIT 5
"""


SQL_QUERIES["core_periphery"] = q_core_periphery


ORACLE_SQL["core_periphery"] = f"""
    WITH ed AS ({EDGES_SQL}),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM ed WHERE src <> dst
    ),
    deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
        ) GROUP BY node
    ),
    core AS (
        SELECT node FROM deg
        QUALIFY row_number() OVER (ORDER BY d DESC, node) <= 10
    ),
    nn AS (
        SELECT (SELECT count(*) FROM core) AS nc,
               (SELECT count(*) FROM deg) - (SELECT count(*) FROM core) AS np
    ),
    blocks AS (
        SELECT
            sum(CASE WHEN ca.node IS NOT NULL AND cb.node IS NOT NULL
                     THEN 1 ELSE 0 END) AS cc,
            sum(CASE WHEN (ca.node IS NOT NULL) <> (cb.node IS NOT NULL)
                     THEN 1 ELSE 0 END) AS cp,
            sum(CASE WHEN ca.node IS NULL AND cb.node IS NULL
                     THEN 1 ELSE 0 END) AS pp
        FROM e
        LEFT JOIN core ca ON ca.node = e.a
        LEFT JOIN core cb ON cb.node = e.b
    )
    SELECT CAST(nn.nc AS BIGINT) AS n_core,
           round(blocks.cc / (nn.nc * (nn.nc - 1) / 2.0), 6) AS cc_density,
           round(blocks.cp * 1.0 / (nn.nc * nn.np), 6) AS cp_density,
           round(blocks.pp / (nn.np * (nn.np - 1) / 2.0), 6) AS pp_density,
           round(blocks.cc / (nn.nc * (nn.nc - 1) / 2.0)
                 - blocks.pp / (nn.np * (nn.np - 1) / 2.0), 6) AS coreness
    FROM blocks CROSS JOIN nn
"""


SQL_QUERIES["periodic_user_screen"] = q_periodic_user_screen


ORACLE_SQL["periodic_user_screen"] = """
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
        FROM events
    ),
    g AS (
        SELECT user_id, (us - prev) // 60000000 AS gap
        FROM o WHERE prev IS NOT NULL
    ),
    eligible AS (
        SELECT user_id, count(*) AS ng FROM g GROUP BY user_id
        HAVING count(*) >= 4
    ),
    modes AS (
        SELECT g.user_id, count(*) AS c
        FROM g JOIN eligible e ON e.user_id = g.user_id
        GROUP BY g.user_id, g.gap
    ),
    share AS (
        SELECT m.user_id, max(m.c) * 1.0 / e.ng AS share
        FROM modes m JOIN eligible e ON e.user_id = m.user_id
        GROUP BY m.user_id, e.ng
    ),
    bands AS (
        SELECT CASE WHEN share >= 0.5 THEN 'ge50'
                    WHEN share >= 0.25 THEN 'b25to50'
                    ELSE 'a_lt25' END AS band
        FROM share
    )
    SELECT band, CAST(count(*) AS BIGINT) AS n_users
    FROM bands GROUP BY band ORDER BY band
"""


SQL_QUERIES["erlang_c_wait"] = q_erlang_c_wait


ORACLE_SQL["erlang_c_wait"] = """
    WITH RECURSIVE p AS (
        SELECT epoch_us(ts) / 1000000.0 AS t FROM events
        WHERE event_type = 'purchase'
    ),
    st AS (
        SELECT count(*) / (max(t) - min(t)) AS lam,
               count(*) / (max(t) - min(t)) * 1800.0 AS e
        FROM p
    ),
    b(m, b) AS (
        SELECT 1, (SELECT e FROM st) * 1.0 / (1 + (SELECT e FROM st))
        UNION ALL
        SELECT m + 1,
               (SELECT e FROM st) * b / ((m + 1) + (SELECT e FROM st) * b)
        FROM b WHERE m < 8
    ),
    c AS (
        SELECT b.m, st.e, st.lam,
               CASE WHEN b.m > st.e
                    THEN b.b * b.m / (b.m - st.e * (1.0 - b.b)) END AS c
        FROM b CROSS JOIN st WHERE b.m IN (2, 4, 8)
    )
    SELECT CAST(m AS BIGINT) AS servers,
           round(e, 6) AS offered_load,
           round(c, 6) AS p_wait,
           round(c / (m / 1800.0 - lam), 6) AS wq_s,
           round(lam * c / (m / 1800.0 - lam), 6) AS lq
    FROM c ORDER BY m
"""


SQL_QUERIES["return_probability"] = q_return_probability


ORACLE_SQL["return_probability"] = f"""
    WITH ed AS ({EDGES_SQL}),
    e AS (SELECT DISTINCT src, dst FROM ed WHERE src <> dst),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    p AS (
        SELECT e.src, e.dst, 1.0 / deg.d AS pr
        FROM e JOIN deg ON deg.src = e.src
    ),
    nn AS (
        SELECT count(*) AS n FROM (
            SELECT DISTINCT x FROM (
                SELECT src AS x FROM e UNION SELECT dst AS x FROM e
            )
        )
    ),
    p2 AS (
        SELECT a.src, b.dst, sum(a.pr * b.pr) AS pr
        FROM p a JOIN p b ON b.src = a.dst GROUP BY a.src, b.dst
    ),
    p3 AS (
        SELECT a.src, b.dst, sum(a.pr * b.pr) AS pr
        FROM p2 a JOIN p b ON b.src = a.dst GROUP BY a.src, b.dst
    ),
    p4 AS (
        SELECT a.src, b.dst, sum(a.pr * b.pr) AS pr
        FROM p3 a JOIN p b ON b.src = a.dst GROUP BY a.src, b.dst
    ),
    fin AS (
        SELECT 2 AS steps,
               (SELECT coalesce(sum(pr), 0) FROM p2 WHERE src = dst) AS tr
        UNION ALL
        SELECT 3, (SELECT coalesce(sum(pr), 0) FROM p3 WHERE src = dst)
        UNION ALL
        SELECT 4, (SELECT coalesce(sum(pr), 0) FROM p4 WHERE src = dst)
    )
    SELECT CAST(steps AS BIGINT) AS steps,
           round(tr / nn.n, 6) AS mean_return_prob
    FROM fin CROSS JOIN nn ORDER BY steps
"""


SQL_QUERIES["quantizer_compare"] = q_quantizer_compare


ORACLE_SQL["quantizer_compare"] = """
    WITH p AS (
        SELECT value AS v,
               row_number() OVER (ORDER BY value) AS rn,
               count(*) OVER () AS n
        FROM events WHERE event_type = 'purchase'
    ),
    mm AS (SELECT min(v) AS lo, max(v) AS hi, max(n) AS n FROM p),
    cuts AS (
        SELECT q, v AS cut
        FROM (SELECT unnest(generate_series(1, 7)) AS q) qs
        JOIN p ON p.rn = least(CAST(ceil(qs.q / 8.0 * p.n) AS BIGINT), p.n)
    ),
    assigned AS (
        SELECT p.v,
               least(CAST(floor((p.v - mm.lo)
                   / (CASE WHEN mm.hi - mm.lo = 0 THEN 1.0
                      ELSE mm.hi - mm.lo END) * 8) AS BIGINT), 7) AS bw,
               (SELECT count(*) FROM cuts WHERE cuts.cut < p.v) AS bf
        FROM p CROSS JOIN mm
    ),
    sw AS (
        SELECT bw AS b, sum(v) AS s, sum(v * v) AS s2, count(*) AS n
        FROM assigned GROUP BY bw
    ),
    sf AS (
        SELECT bf AS b, sum(v) AS s, sum(v * v) AS s2, count(*) AS n
        FROM assigned GROUP BY bf
    )
    SELECT CAST(mm.n AS BIGINT) AS n_values,
           round((SELECT sum(s2 - s * s / n) FROM sw) / mm.n, 6) AS mse_width,
           round((SELECT sum(s2 - s * s / n) FROM sf) / mm.n, 6) AS mse_freq,
           round((SELECT sum(s2 - s * s / n) FROM sf)
                 / (SELECT sum(s2 - s * s / n) FROM sw), 6) AS freq_vs_width
    FROM mm
"""


SQL_QUERIES["simpson_paradox"] = q_simpson_paradox


ORACLE_SQL["simpson_paradox"] = (
    "WITH gq AS (" + ORACLE_SQL["gopher_quality"].replace("ORDER BY doc_id", "") + """),
    c AS (
        SELECT d.lang, d.doc_id % 2 AS g, sum(gq.keep) AS k, count(*) AS n
        FROM documents d JOIN gq ON gq.doc_id = d.doc_id
        GROUP BY d.lang, d.doc_id % 2
    ),
    agg AS (
        SELECT sum(CASE WHEN g = 1 THEN k END) * 1.0
                   / sum(CASE WHEN g = 1 THEN n END)
               - sum(CASE WHEN g = 0 THEN k END) * 1.0
                   / sum(CASE WHEN g = 0 THEN n END) AS ad
        FROM c
    ),
    strata AS (
        SELECT a.lang,
               a.k * 1.0 / a.n - b.k * 1.0 / b.n AS sd
        FROM c a JOIN c b ON b.lang = a.lang AND a.g = 1 AND b.g = 0
    ),
    flip AS (
        SELECT CASE WHEN count(*) > 0
                     AND sum(CASE WHEN sign(sd) * sign(agg.ad) >= 0
                                   AND sign(sd) <> 0
                             THEN 1 ELSE 0 END) = 0
                     AND sign(agg.ad) <> 0
                    THEN 1 ELSE 0 END AS p
        FROM strata CROSS JOIN agg GROUP BY agg.ad
    )
    SELECT s.lang, round(s.sd, 6) AS stratum_diff,
           round(agg.ad, 6) AS aggregate_diff,
           CAST(flip.p AS BIGINT) AS paradox
    FROM strata s CROSS JOIN agg CROSS JOIN flip
    ORDER BY s.lang
"""
)


SQL_QUERIES["tpch_q19"] = q_tpch_q19


ORACLE_SQL["tpch_q19"] = """
    WITH b AS (
        SELECT DISTINCT p_brand FROM part ORDER BY p_brand LIMIT 3
    ),
    br AS (
        SELECT p_brand, row_number() OVER (ORDER BY p_brand) AS i FROM b
    ),
    f AS (
        SELECT CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE
            (p.p_brand = (SELECT p_brand FROM br WHERE i = 1)
             AND p.p_size BETWEEN 1 AND 5
             AND l.l_quantity BETWEEN 1 AND 11)
         OR (p.p_brand = (SELECT p_brand FROM br WHERE i = 2)
             AND p.p_size BETWEEN 1 AND 10
             AND l.l_quantity BETWEEN 10 AND 20)
         OR (p.p_brand = (SELECT p_brand FROM br WHERE i = 3)
             AND p.p_size BETWEEN 1 AND 15
             AND l.l_quantity BETWEEN 20 AND 30)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(cents) / 100.0, 2) AS revenue
    FROM f
"""


SQL_QUERIES["benford_second_digit"] = q_benford_second_digit


ORACLE_SQL["benford_second_digit"] = """
    WITH s AS (
        SELECT replace(ltrim(printf('%.6f', l_extendedprice), '0.'), '.', '')
            AS ds
        FROM lineitem
    ),
    d AS (
        SELECT CAST(substr(ds, 2, 1) AS BIGINT) AS digit FROM s
        WHERE length(ds) >= 2
    ),
    h AS (
        SELECT g.digit, count(d.digit) AS n
        FROM (SELECT unnest(generate_series(0, 9)) AS digit) g
        LEFT JOIN d ON d.digit = g.digit
        GROUP BY g.digit
    ),
    t AS (SELECT sum(n) * 1.0 AS nt FROM h),
    e AS (
        SELECT g.digit,
               (SELECT sum(log10(1.0 + 1.0 / (10 * k.k + g.digit)))
                FROM (SELECT unnest(generate_series(1, 9)) AS k) k) AS p
        FROM (SELECT unnest(generate_series(0, 9)) AS digit) g
    ),
    chi AS (
        SELECT sum((h.n - t.nt * e.p) * (h.n - t.nt * e.p) / (t.nt * e.p))
            AS chi2
        FROM h JOIN e ON e.digit = h.digit CROSS JOIN t
        GROUP BY t.nt
    )
    SELECT CAST(h.digit AS BIGINT) AS digit,
           round(h.n / t.nt, 6) AS observed,
           round(e.p, 6) AS expected,
           round(chi.chi2, 6) AS chi2
    FROM h JOIN e ON e.digit = h.digit CROSS JOIN t CROSS JOIN chi
    ORDER BY h.digit
"""


SQL_QUERIES["ttt_statistic"] = q_ttt_statistic


ORACLE_SQL["ttt_statistic"] = """
    WITH o AS (
        SELECT user_id, epoch_us(ts) / 1000000.0 AS t,
               lag(epoch_us(ts) / 1000000.0)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events WHERE event_type = 'purchase'
    ),
    g AS (SELECT t - prev AS g FROM o WHERE prev IS NOT NULL),
    s AS (
        SELECT g, row_number() OVER (ORDER BY g) AS i,
               count(*) OVER () AS n, sum(g) OVER () AS tot
        FROM g
    ),
    steps AS (
        SELECT i, n,
               (n - i + 1) * (g - lag(g, 1, 0) OVER (ORDER BY i)) / tot AS dh
        FROM s
    ),
    h AS (
        SELECT i, n, sum(dh) OVER (ORDER BY i) AS h FROM steps
    )
    SELECT CAST(max(n) AS BIGINT) AS n_gaps,
           round(sum(CASE WHEN i < n THEN h ELSE 0 END) / (max(n) - 1), 6)
               AS ttt_stat
    FROM h
"""


SQL_QUERIES["grubbs_test"] = q_grubbs_test


ORACLE_SQL["grubbs_test"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT count(*) AS m, sum(n) * 1.0 / count(*) AS mu FROM d
    ),
    s AS (
        SELECT m.m, m.mu,
               sqrt(sum((d.n - m.mu) * (d.n - m.mu)) / (m.m - 1)) AS sd
        FROM d CROSS JOIN m GROUP BY m.m, m.mu
    ),
    g AS (
        SELECT d.day, s.m, abs(d.n - s.mu) / s.sd AS g,
               row_number() OVER (ORDER BY abs(d.n - s.mu) DESC, d.day) AS pick
        FROM d CROSS JOIN s
    )
    SELECT day, CAST(m AS BIGINT) AS m_days, round(g, 6) AS g_stat
    FROM g WHERE pick = 1
"""


SQL_QUERIES["cooks_distance"] = q_cooks_distance


ORACLE_SQL["cooks_distance"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT day, n * 1.0 AS x, row_number() OVER (ORDER BY day) - 1.0 AS t,
               count(*) OVER () AS m
        FROM d
    ),
    mm AS (SELECT avg(t) AS tb, avg(x) AS xb, max(m) AS m FROM s),
    fit AS (
        SELECT mm.m, mm.tb, mm.xb,
               sum((s.t - mm.tb) * (s.t - mm.tb)) AS stt,
               sum((s.t - mm.tb) * (s.x - mm.xb))
                   / sum((s.t - mm.tb) * (s.t - mm.tb)) AS b1
        FROM s CROSS JOIN mm GROUP BY mm.m, mm.tb, mm.xb
    ),
    e AS (
        SELECT s.day, fit.m, fit.stt, fit.tb,
               s.x - (fit.xb - fit.b1 * fit.tb) - fit.b1 * s.t AS e,
               1.0 / fit.m + (s.t - fit.tb) * (s.t - fit.tb) / fit.stt AS h
        FROM s CROSS JOIN fit
    ),
    s2 AS (SELECT sum(e * e) / (max(m) - 2) AS s2 FROM e),
    ck AS (
        SELECT e.day,
               round(e.e * e.e * e.h / (2.0 * s2.s2 * (1.0 - e.h) * (1.0 - e.h)),
                     6) AS cooks_d
        FROM e CROSS JOIN s2
    )
    SELECT CAST(row_number() OVER (ORDER BY cooks_d DESC, day) AS BIGINT)
               AS rank,
           day, cooks_d
    FROM ck ORDER BY cooks_d DESC, day LIMIT 3
"""


SQL_QUERIES["newey_west_se"] = q_newey_west_se


ORACLE_SQL["newey_west_se"] = """
    WITH d AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT n * 1.0 AS x, row_number() OVER (ORDER BY day) AS t,
               count(*) OVER () AS m,
               sum(n) OVER () * 1.0 / count(*) OVER () AS mu
        FROM d
    ),
    g0 AS (SELECT sum((x - mu) * (x - mu)) / max(m) AS g, max(m) AS m FROM s),
    gl AS (
        SELECT l.l,
               sum((a.x - a.mu) * (b.x - b.mu)) / g0.m AS g
        FROM (VALUES (1), (2), (3)) AS l(l)
        JOIN s a ON TRUE
        JOIN s b ON b.t = a.t + l.l
        CROSS JOIN g0
        GROUP BY l.l, g0.m
    ),
    acc AS (
        SELECT g0.m, g0.g AS g0,
               g0.g + 2.0 * sum((1.0 - gl.l / 4.0) * gl.g) AS lrv
        FROM g0 CROSS JOIN gl GROUP BY g0.m, g0.g
    )
    SELECT CAST(m AS BIGINT) AS m_days,
           round(sqrt(g0 / m), 6) AS se_naive,
           round(CASE WHEN lrv > 0 THEN sqrt(lrv / m) END, 6) AS se_hac,
           round(CASE WHEN lrv > 0 THEN sqrt(lrv / m) / sqrt(g0 / m) END, 6)
               AS inflation
    FROM acc
"""


# pivot-sampled Brandes (VERDICT r3 #6): approximation — pinned by
# tests/test_betweenness.py, no SQL mirror
from .q_graph import q_betweenness_sampled  # noqa: F401,E402

NOSQL_QUERIES["betweenness_sampled"] = q_betweenness_sampled

from .catalog import QUERIES, Query, get_queries, get_oracles, query, reorder

# Importing these modules populates the registry via the @query decorator.
from . import relational  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import opensky  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import extended  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import marts  # noqa: E402,F401
from . import stats  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import reports  # noqa: E402,F401

# The external correctness driver checks only the FIRST 50 queries in
# registration order, so the front of the registry is rotated each round
# to cycle driver coverage across the whole catalog. Round-4 front
# (VERDICT r3 directive #1): all 50 slots drawn from the 71 catalog
# queries that have NEVER been in a driver window (r1-r3 union of
# CORRECTNESS files vs the registry). Ordering inside the window is
# cheap-first (VERDICT r3 directive #7): simple relational/window
# shapes, then corpus/text, then dedup/similarity/CDC/marts, then the
# iterative (kmeans, pagerank) and stateful-streaming replay queries
# LAST so a slow tail can never starve the cheap checks of their slot.
#
# The r5 window backlog (never driver-windowed; all green in
# tests/test_oracle.py at sf0.001 and the local sf0.01 sweep):
# 21 carried from r3 (lowest-risk single-agg stats/marts/audits):
#   stats_histogram_price, stats_corr_qty_price, stats_anomaly_zscore,
#   stats_rolling_median, stats_profile_orders, stats_autocorr_lag1,
#   stats_benford_firstdigit, stats_mad_outliers,
#   stats_gapfill_interpolate, mart_cumulative_users,
#   mart_trending_decay, mart_gini_concentration, mart_new_vs_returning,
#   mart_weekly_top_gainer, mart_abc_pareto, mart_supplier_churn,
#   mart_markov_transitions, mart_cohort_ltv, audit_key_skew,
#   audit_k_anonymity, audit_burst_rate
# plus the 31 round-4 additions:
#   graph_triangle_count, embedding_pq_codes, embedding_semantic_dedup,
#   mart_cumulative_revenue_scan, mart_sessionize_gaps, text_zipf_slope,
#   corpus_budget_select, scd2_point_in_time, ann_topk_with_metadata,
#   stats_weighted_median, stats_seasonal_anomaly,
#   mart_attribution_last_touch, scd2_incremental_rebuild,
#   stats_equidepth_histogram, embedding_hard_negatives,
#   corpus_upsample_epochs, streaming_dedup_within_watermark,
#   graph_hierarchy_rollup, window_ntile_quartiles, mart_longest_streak,
#   streaming_outer_join_unmatched, json_variant_extract,
#   ann_pq_adc_topk, audit_table_checksum, dedup_prefix_filter_jaccard,
#   window_range_trailing_1h, mart_item_recs_topk,
#   report_local_supplier_volume + report_volume_shipping +
#   report_returned_items + report_promo_effect (count the reports as 4)
# plus the 7 late round-4 additions:
#   streaming_join_then_window, agg_listagg_statuses,
#   xml_roundtrip_extract, group_by_all_latest_order,
#   corpus_sentence_dedup, graph_kcore_peeling,
#   audit_duplicate_payments
# (59 total: the r5 window rotates the highest-risk 50 of these —
# streaming/stateful/iterative and the new algorithmic families first,
# single-agg stats/marts last; the overflow rides to r6.)
# Queries displaced past slot 50 stay covered by tests/test_oracle.py,
# which runs ALL of them vs DuckDB at sf0.001.
DRIVER_WINDOW_PRIORITY = [
    # -- cheap relational / window shapes ------------------------------
    "window_percent_rank_cume_dist",
    "join_asof_nearest",
    "join_null_safe",
    "set_ops_except_all",
    "lateral_top3_per_segment",
    "schema_evolution_union",
    "agg_mode_deterministic",
    # -- corpus prep ---------------------------------------------------
    "corpus_length_buckets",
    "corpus_split_assign",
    "corpus_mixture_weights",
    "corpus_duplicated_spans",
    "corpus_reservoir_per_source",
    "corpus_weighted_sample",
    "corpus_ngram_novelty",
    "corpus_cross_source_dups",
    "corpus_vocab_growth",
    # -- text analysis -------------------------------------------------
    "text_bigram_logprob",
    "text_heavy_hitters",
    "text_inverted_index",
    "text_char_entropy",
    "text_langid_confusion",
    # -- multimodal / opensky ------------------------------------------
    "multimodal_phash_dedup",
    "opensky_grid_density",
    "opensky_airline_traffic",
    # -- dedup / similarity --------------------------------------------
    "dedup_incremental_minhash",
    "dedup_fuzzy_levenshtein",
    "dedup_impact_report",
    "dedup_minhash_calibration",
    "dedup_containment_pairs",
    "embedding_quantize_sq8",
    "embedding_covariance_audit",
    "approx_distinct_hll_mart",
    # -- CDC / marts / audits ------------------------------------------
    "cdc_snapshot_diff",
    "cdc_apply_log",
    "mart_incremental_merge",
    "mart_event_funnel",
    "mart_retention_cohorts",
    "mart_sequence_patterns",
    "mart_rolling_distinct_7d",
    "mart_market_basket",
    "audit_referential_integrity",
    "audit_expectations",
    "stats_ks_drift",
    "stats_chi2_independence",
    # -- iterative (engine-divergence-likeliest) -----------------------
    "embedding_kmeans",
    "graph_pagerank",
    # -- stateful streaming replay: LAST (slowest per query) -----------
    "streaming_static_enrich",
    "streaming_hopping_topk",
    "streaming_upsert_sink_snapshot",
    "streaming_timeout_sessions",
]

reorder(DRIVER_WINDOW_PRIORITY)

__all__ = [
    "QUERIES",
    "Query",
    "get_queries",
    "get_oracles",
    "query",
    "reorder",
    "DRIVER_WINDOW_PRIORITY",
]

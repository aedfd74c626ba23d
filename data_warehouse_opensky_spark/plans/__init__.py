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
from . import sketches  # noqa: E402,F401

# The external correctness driver checks only the FIRST 50 queries in
# registration order, so the front of the registry is rotated each round
# to cycle driver coverage across the whole catalog. Round-10 front
# (VERDICT r9 directive #2): the window leads with the 16 round-4-cohort
# STRAGGLERS displaced past slot 50 last round — after this round no
# catalog entry's latest external driver check is older than round 5 —
# then the 3 plans whose CODE changed in round 10
# (stats_spearman_rank_corr / stats_kendall_tau gained the zero-
# variance NULL guard, ADVICE r9; dedup_fuzzy_levenshtein's pair stage
# moved onto operators/skew.py:capped_block_self_pairs, VERDICT r9 #1),
# preceded by the 3 queries ADDED in round 10 (never driver-checked:
# CDC chunking, Hodges–Lehmann, clustering coefficient), followed by
# 28 of the 48 round-5-cohort greens (the next-oldest
# latest-driver-check tier), alphabetical. The 20 r5 leftovers
# (mart_supplier_churn, mart_trending_decay, mart_weekly_top_gainer,
# report_local_supplier_volume, report_promo_effect,
# report_returned_items, report_volume_shipping,
# scd2_incremental_rebuild, scd2_point_in_time,
# stats_equidepth_histogram, stats_gapfill_interpolate,
# stats_mad_outliers, stats_rolling_median, stats_seasonal_anomaly,
# stats_weighted_median, streaming_dedup_within_watermark,
# streaming_join_then_window, streaming_outer_join_unmatched,
# window_range_trailing_1h, xml_roundtrip_extract) lead the round-11
# window. Queries displaced past slot 50
# stay covered by tests/test_oracle.py, which runs ALL of them vs
# DuckDB at sf0.001 AND asserts every result against the committed pin
# table (tests/oracle_pins.json), and by the per-session full
# driver-contract sweep at sf0.01.
DRIVER_WINDOW_PRIORITY = [
    # ==== 16 round-4-cohort stragglers (oldest external check) ===========
    "mart_sequence_patterns",
    "opensky_airline_traffic",
    "opensky_grid_density",
    "schema_evolution_union",
    "set_ops_except_all",
    "stats_chi2_independence",
    "stats_ks_drift",
    "streaming_hopping_topk",
    "streaming_static_enrich",
    "streaming_upsert_sink_snapshot",
    "text_bigram_logprob",
    "text_char_entropy",
    "text_heavy_hitters",
    "text_inverted_index",
    "text_langid_confusion",
    "window_percent_rank_cume_dist",
    # ==== 3 queries added in round 10 (never driver-checked) ==============
    "corpus_cdc_chunks",
    "stats_hodges_lehmann",
    "graph_clustering_coefficient",
    # ==== 3 plans whose code changed in round 10 ==========================
    "stats_spearman_rank_corr",
    "stats_kendall_tau",
    "dedup_fuzzy_levenshtein",
    # ==== 28 re-confirmations: oldest remaining (round-5) cohort ==========
    "agg_listagg_statuses",
    "ann_pq_adc_topk",
    "ann_topk_with_metadata",
    "audit_burst_rate",
    "audit_duplicate_payments",
    "audit_k_anonymity",
    "audit_key_skew",
    "audit_table_checksum",
    "corpus_budget_select",
    "corpus_sentence_dedup",
    "corpus_upsample_epochs",
    "dedup_prefix_filter_jaccard",
    "embedding_hard_negatives",
    "embedding_pq_codes",
    "graph_hierarchy_rollup",
    "graph_kcore_peeling",
    "group_by_all_latest_order",
    "json_variant_extract",
    "mart_abc_pareto",
    "mart_attribution_last_touch",
    "mart_cohort_ltv",
    "mart_cumulative_revenue_scan",
    "mart_item_recs_topk",
    "mart_longest_streak",
    "mart_markov_transitions",
    "mart_sessionize_gaps",
    "text_zipf_slope",
    "window_ntile_quartiles",
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

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
# to cycle driver coverage across the whole catalog. Round-11 front
# (VERDICT r10 directive #2, as queued in the r10 rotation note): the
# window leads with the 20 round-5-cohort LEFTOVERS — the oldest
# latest-driver-check tier remaining; after this round no catalog
# entry's latest external check is older than round 6 — then the 2
# queries ADDED in round 11 (never driver-checked: the Gopher-rule
# quality gates and the n-gram repetition-ratio filter), then the one
# plan whose CODE changed in round 11 (dedup_fuzzy_levenshtein: its
# capped_block_self_pairs pair stage now persists the block-count
# table so the skew-gate scalar and tagging join share one pass,
# VERDICT r10 #5), then 27 of the 45 round-6-cohort greens
# (alphabetical). The 18 r6 leftovers (stats_corr_qty_price,
# stats_cusum_changepoint, stats_histogram_price,
# stats_linear_regression, stats_pmi_cells, stats_poisson_bootstrap,
# stats_profile_orders, stats_welch_ttest, streaming_session_windows,
# streaming_stateful_running_agg, streaming_stream_stream_join,
# text_bm25_topk, text_bpe_merges, udf_grouped_agg_spend,
# udf_grouped_map_share, udtf_token_positions, sql_pipe_syntax_summary,
# sql_session_variables) lead the round-12 window, followed by any
# round-12 additions and the round-7 cohort. Queries displaced past slot 50
# stay covered by tests/test_oracle.py, which runs ALL of them vs
# DuckDB at sf0.001 AND asserts every result against the committed pin
# table (tests/oracle_pins.json), and by the per-session full
# driver-contract sweep at sf0.01.
DRIVER_WINDOW_PRIORITY = [
    # ==== 20 round-5-cohort leftovers (oldest external check) =============
    "mart_supplier_churn",
    "mart_trending_decay",
    "mart_weekly_top_gainer",
    "report_local_supplier_volume",
    "report_promo_effect",
    "report_returned_items",
    "report_volume_shipping",
    "scd2_incremental_rebuild",
    "scd2_point_in_time",
    "stats_equidepth_histogram",
    "stats_gapfill_interpolate",
    "stats_mad_outliers",
    "stats_rolling_median",
    "stats_seasonal_anomaly",
    "stats_weighted_median",
    "streaming_dedup_within_watermark",
    "streaming_join_then_window",
    "streaming_outer_join_unmatched",
    "window_range_trailing_1h",
    "xml_roundtrip_extract",
    # ==== 2 queries added in round 11 (never driver-checked) ==============
    "text_gopher_quality",
    "text_repetition_ratio",
    # ==== 1 plan whose code changed in round 11 ===========================
    "dedup_fuzzy_levenshtein",
    # ==== 29 re-confirmations: oldest remaining (round-6) cohort ==========
    "ann_shortlist_rerank",
    "approx_count_distinct_users",
    "approx_percentile_gate",
    "audit_freshness_lag",
    "corpus_bpe_encode",
    "corpus_dsir_weights",
    "dedup_sorted_neighborhood",
    "embedding_mmr_topk",
    "embedding_power_iteration",
    "embedding_truncation_recall",
    "graph_bfs_hops",
    "graph_community_modularity",
    "graph_label_propagation",
    "graph_link_prediction_ra",
    "join_interval_overlap",
    "mart_attribution_linear",
    "mart_cumulative_users",
    "mart_gini_concentration",
    "mart_new_vs_returning",
    "mart_repeat_interval_median",
    "mart_rfm_segments",
    "null_handling",
    "opensky_trajectory_km",
    "opensky_zorder_key",
    "stats_anomaly_zscore",
    "stats_autocorr_lag1",
    "stats_benford_firstdigit",
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

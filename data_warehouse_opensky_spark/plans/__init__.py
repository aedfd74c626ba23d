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
# to cycle driver coverage across the whole catalog. Round-6 front
# (VERDICT r5 directive #1): the complete 35-query never-windowed
# backlog (CORRECTNESS_r01-r05 union vs the registry — the 9 single-agg
# carries from r4 plus the 26 queries added during round 5 itself),
# HIGHEST-RISK FIRST (iterative graph / embedding-retrieval /
# tokenizer-training families lead, single-agg stats trail), followed
# by 15 re-confirmation slots spent on the oldest r2 greens that have
# never been re-windowed since: the full multimodal batch, the
# stateful-streaming r2 trio, the Pandas-UDF/UDTF family, the approx
# sketches, null_handling, and the haversine trajectory — exactly the
# highest-risk-if-silently-regressed picks named in the r5 verdict.
# After this window runs, the never-windowed backlog is ZERO for the
# first time: every one of the 230 catalog queries will have a driver
# CORRECTNESS row. Queries displaced past slot 50 stay covered by
# tests/test_oracle.py, which runs ALL of them vs DuckDB at sf0.001,
# and by the per-session full driver-contract sweep at sf0.01.
DRIVER_WINDOW_PRIORITY = [
    # ==== 35 never-windowed (r4 carries + round-5 additions) ============
    # -- iterative graph (riskiest: unrolled fixpoints) -------------------
    "graph_label_propagation",
    "graph_community_modularity",
    "graph_bfs_hops",
    "graph_link_prediction_ra",
    "embedding_power_iteration",
    # -- embedding / retrieval algorithmic --------------------------------
    "embedding_mmr_topk",
    "ann_shortlist_rerank",
    "embedding_truncation_recall",
    "dedup_sorted_neighborhood",
    # -- tokenizer training / corpus importance ---------------------------
    "text_bpe_merges",
    "corpus_bpe_encode",
    "corpus_dsir_weights",
    "text_bm25_topk",
    # -- statistical tests / resampling ------------------------------------
    "stats_poisson_bootstrap",
    "stats_cusum_changepoint",
    "stats_welch_ttest",
    "stats_pmi_cells",
    "stats_linear_regression",
    # -- join / SQL-surface additions --------------------------------------
    "join_interval_overlap",
    "sql_session_variables",
    "sql_pipe_syntax_summary",
    "opensky_zorder_key",
    # -- marts / audits added in r5 ----------------------------------------
    "mart_rfm_segments",
    "mart_attribution_linear",
    "audit_freshness_lag",
    "mart_repeat_interval_median",
    # -- single-agg carries from r4 (lowest risk of the 35) ----------------
    "mart_cumulative_users",
    "mart_gini_concentration",
    "mart_new_vs_returning",
    "stats_histogram_price",
    "stats_corr_qty_price",
    "stats_anomaly_zscore",
    "stats_profile_orders",
    "stats_autocorr_lag1",
    "stats_benford_firstdigit",
    # ==== 15 re-confirmations: oldest r2 greens, riskiest families =======
    # -- multimodal batch (Arrow mapInPandas plumbing, last seen r2) -------
    "multimodal_decode_meta",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_features",
    "multimodal_audio_meta",
    # -- stateful streaming r2 trio ----------------------------------------
    "streaming_stateful_running_agg",
    "streaming_stream_stream_join",
    "streaming_session_windows",
    # -- Pandas-UDF / UDTF family -------------------------------------------
    "udf_grouped_map_share",
    "udf_grouped_agg_spend",
    "udtf_token_positions",
    # -- approx sketches + null semantics + geo ------------------------------
    "approx_count_distinct_users",
    "approx_percentile_gate",
    "null_handling",
    "opensky_trajectory_km",
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

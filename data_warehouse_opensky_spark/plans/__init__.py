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

# The external correctness driver checks only the FIRST 50 queries in
# registration order, so the front of the registry is rotated each round
# to cycle driver coverage across the whole catalog. Round-2 front:
# the 26 queries that had no driver row in CORRECTNESS_r01.json
# (opensky parity, streaming, multimodal, UDF/UDTF, subqueries, pivot,
# …), then the two rows that were non-green there (null_handling hash
# FAIL — oracle-side CAST bug, now fixed; approx_count_distinct_users
# no_oracle — now gated via exact-count + within_tolerance), then any
# queries new this round. Queries displaced past slot 50 stay covered
# by tests/test_oracle.py, which runs ALL of them vs DuckDB at sf0.001.
DRIVER_WINDOW_PRIORITY = [
    # -- unverified in r1 (were slots 51-76) -------------------------
    "text_fingerprint",
    "text_tfidf_topk",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_features",
    "multimodal_audio_meta",
    "opensky_clean_parity",
    "opensky_latest_position",
    "opensky_trajectory_km",
    "streaming_tumbling_counts",
    "streaming_dedup_latest",
    "streaming_stateful_running_agg",
    "streaming_session_windows",
    "json_extract_props",
    "udf_scalar_token_count",
    "udf_grouped_agg_spend",
    "udf_grouped_map_share",
    "udtf_token_positions",
    "pivot_status_by_priority",
    "unpivot_nation_metrics",
    "subquery_scalar_above_avg",
    "subquery_correlated_above_cust_avg",
    "subquery_exists_urgent",
    "window_sliding_2h",
    "map_funcs",
    # -- non-green in r1, fixed this round ---------------------------
    "null_handling",
    "approx_count_distinct_users",
    # -- new this round (registered in corpus/extended/...) ----------
    "corpus_chunking",
    "corpus_repetition_signals",
    "corpus_pii_redact",
    "corpus_stratified_sample",
    "range_join_price_bands",
    "rollup_time_grains",
    "scd2_intervals",
    "agg_minmax_by",
    "approx_percentile_gate",
    "hof_array_funcs",
    "streaming_stream_stream_join",
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

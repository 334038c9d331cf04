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
    "streaming_sem",
    "dedup",
    "similarity",
    "text",
    "pipeline",
    "multimodal",
    "udfs",
]

_loaded = False


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
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)

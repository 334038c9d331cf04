"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``copy_databasetables_spark``; this module is a
thin adapter over its operator registry (one registered
(query, oracle) pair per SURVEY.md §2 inventory row).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may invoke this file from anywhere; make the repo importable.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from copy_databasetables_spark import operators  # noqa: E402
from copy_databasetables_spark.io import SMOKE_SF_DIR  # noqa: E402
from copy_databasetables_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY.md §2.4 ``q_agg_group``)
    on /root/testdata/sf0.001; driver checks rows>0."""
    configure_session(spark)
    return operators.all_queries()["q_agg_group"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return operators.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (omitted for ops the
    driver checks rows-only: approx/nondeterministic/streaming)."""
    return operators.all_oracles()

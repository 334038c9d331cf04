"""Subquery & CTE surface (SURVEY.md §3.2 dual-entry / §4.2 decorrelation).

Catalyst rewrites every correlated form here into joins — scalar
subqueries become left outer joins against a pre-aggregated subtree,
EXISTS/IN become semi joins (§4.2 'subquery decorrelation' is a builtin,
not custom work; these operators prove it end-to-end against the
oracle). Recursive CTEs (new in Spark 4) iterate to a fixpoint with one
exchange per step — numeric recursion uses exact BIGINTs so both
engines produce identical sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(f"sq_{n}")


@register(
    "q_subquery_scalar",
    oracle="""
    SELECT c_custkey, c_name,
           (SELECT MAX(o_totalprice) FROM orders o
             WHERE o.o_custkey = c.c_custkey) AS max_order,
           (SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
             AS n_big_orders
    FROM customer c
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the projection — decorrelated by
    Catalyst into one aggregate per subquery joined back on the key (no
    per-row re-execution; O(n) not O(n²))."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT MAX(o_totalprice) FROM sq_orders o
                 WHERE o.o_custkey = c.c_custkey) AS max_order,
               (SELECT COUNT(*) FROM sq_orders o
                 WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
                 AS n_big_orders
        FROM sq_customer c
        """
    )


@register(
    "q_subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      AND o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery predicate → left-semi join after decorrelation (plus a
    literal NOT IN, safe here because the list has no NULLs — NOT IN
    against a nullable subquery is the classic three-valued-logic trap)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM sq_orders
        WHERE o_custkey IN (SELECT c_custkey FROM sq_customer WHERE c_acctbal < 0)
          AND o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')
        """
    )


@register(
    "q_subquery_corr_agg",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0) >= 3
    """,
)
def q_subquery_corr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate in a WHERE comparison — decorrelates to
    aggregate → join → filter."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM sq_customer c
        WHERE (SELECT COUNT(*) FROM sq_orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0) >= 3
        """
    )


@register(
    "q_cte_recursive",
    oracle="""
    WITH RECURSIVE f(n, a, b) AS (
      SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
      UNION ALL
      SELECT n + 1, b, a + b FROM f WHERE n < 60
    )
    SELECT n, a AS fib FROM f
    """,
)
def q_cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): iterate-to-fixpoint inside the SQL
    surface — series generation, graph reachability, bill-of-materials.
    Exact BIGINT recursion (Fibonacci to n=60) so both engines emit
    identical rows with no float drift."""
    return spark.sql(
        """
        WITH RECURSIVE f(n, a, b) AS (
          SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
          UNION ALL
          SELECT n + 1, b, a + b FROM f WHERE n < 60
        )
        SELECT n, a AS fib FROM f
        """
    )


@register(
    "q_agg_bool",
    oracle="""
    SELECT event_type,
           COUNT(*) FILTER (WHERE value > 100.0) AS n_high,
           bool_and(value >= 0.0) AS all_nonneg,
           bool_or(value > 400.0) AS any_very_high,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: count_if / every / any (ANSI bool_and and
    bool_or)."""
    _views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_type,
               count_if(value > 100.0) AS n_high,
               every(value >= 0.0) AS all_nonneg,
               any(value > 400.0) AS any_very_high,
               COUNT(*) AS n
        FROM sq_events
        GROUP BY event_type
        """
    )

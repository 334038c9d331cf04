"""§2.2 Projection / filter / predicates.

Scale notes: every predicate here is a Catalyst-native expression, so it
pushes into the parquet scan (`PushedFilters` in .explain) and prunes
row groups via min/max statistics; projections prune columns at the
reader (`ReadSchema`). At 100 TB that is the difference between scanning
terabytes and scanning the handful of columns/row-groups the query
touches. tests/test_plans.py asserts the pushdown actually happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register


@register(
    "q_project",
    oracle="SELECT c_custkey, c_name FROM customer",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning: the parquet reader materializes exactly 2 columns."""
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")


@register(
    "q_project_expr",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_extendedprice * (1 - l_discount) AS net_price,
      l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
      l_quantity * 2.0 + 1.0 AS qty_expr
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns. Pure per-row IEEE double arithmetic is
    deterministic and identical across engines — no rounding needed."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charged"),
        (F.col("l_quantity") * 2.0 + 1.0).alias("qty_expr"),
    )


@register(
    "q_filter_simple",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_totalprice > 300000.0
    """,
)
def q_filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.where(F.col("o_totalprice") > 300000.0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "q_filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE ((o_orderstatus = 'O' AND o_totalprice > 250000.0)
           OR o_orderpriority IN ('1-URGENT', '2-HIGH'))
      AND o_totalprice BETWEEN 5000.0 AND 400000.0
      AND NOT (o_orderstatus = 'P')
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT/IN/BETWEEN — one compound boolean tree, pushed down."""
    o = load_table(spark, sf_dir, "orders")
    cond = (
        ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 250000.0))
        | F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ) & F.col("o_totalprice").between(5000.0, 400000.0) & ~(
        F.col("o_orderstatus") == "P"
    )
    return o.where(cond).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )


@register(
    "q_filter_null",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             NULLIF(o_orderstatus, 'P') AS status_np,
             o_totalprice
      FROM orders
    )
    SELECT
      COUNT(*) FILTER (WHERE status_np IS NULL) AS n_null,
      COUNT(*) FILTER (WHERE status_np IS NOT NULL) AS n_not_null,
      COUNT(*) FILTER (WHERE status_np IS NOT DISTINCT FROM 'O') AS n_safe_o,
      COUNT(*) FILTER (WHERE status_np IS NOT DISTINCT FROM NULL) AS n_safe_null,
      COUNT(status_np) AS n_count_skips_nulls
    FROM t
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic semantics. The testdata has no physical nulls,
    so nulls are manufactured with NULLIF and probed with isNull /
    isNotNull / eqNullSafe (<=> in SQL, IS NOT DISTINCT FROM in DuckDB)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "status_np", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    return o.agg(
        F.count_if(F.col("status_np").isNull()).alias("n_null"),
        F.count_if(F.col("status_np").isNotNull()).alias("n_not_null"),
        F.count_if(F.col("status_np").eqNullSafe(F.lit("O"))).alias("n_safe_o"),
        F.count_if(F.col("status_np").eqNullSafe(F.lit(None).cast("string"))).alias(
            "n_safe_null"
        ),
        F.count("status_np").alias("n_count_skips_nulls"),
    )


@register(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%bolt%'
       OR p_name LIKE 'red%'
       OR (p_name LIKE '%ring' AND p_brand LIKE 'Brand#1_')
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").like("%bolt%")
        | F.col("p_name").startswith("red")
        | (F.col("p_name").endswith("ring") & F.col("p_brand").like("Brand#1_"))
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate elimination = hash aggregate on all projected columns;
    partial distinct runs map-side before the shuffle."""
    return load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()

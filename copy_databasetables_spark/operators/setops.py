"""§2.7 Set operations.

Spark-first notes: ``unionByName`` is a zero-shuffle concatenation of
partition lists (resolved by column name, not position — positional
union is a silent-corruption trap). The distinct/intersect/except
variants each cost one hash shuffle on all columns; INTERSECT/EXCEPT ALL
preserve multiset multiplicities via internal replicated-row counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register


def _party_views(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two union-compatible 'party' projections: customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_key"),
        F.col("c_name").alias("party_name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_key"),
        F.col("s_name").alias("party_name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return c, s


_PARTY_SQL = {
    "c": "SELECT c_custkey AS party_key, c_name AS party_name, c_nationkey AS nationkey, "
    "c_acctbal AS acctbal, 'customer' AS kind FROM customer",
    "s": "SELECT s_suppkey AS party_key, s_name AS party_name, s_nationkey AS nationkey, "
    "s_acctbal AS acctbal, 'supplier' AS kind FROM supplier",
}


@register(
    "q_union_all",
    oracle=f"{_PARTY_SQL['c']} UNION ALL {_PARTY_SQL['s']}",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = _party_views(spark, sf_dir)
    return c.unionByName(s)


@register(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000.0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations that have both a negative-balance customer and a supplier."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") < 0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 0
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL keeps multiplicities: each nation appears once per
    non-positive-balance customer (multiset difference, not set)."""
    all_n = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    pos_n = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    return all_n.exceptAll(pos_n)

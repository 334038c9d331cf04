"""§2.6 Sorts / limits / top-k.

The driver's value-hash is order-insensitive, so sort correctness is
*encoded into the data*: a global row_number over the same ordering
travels with each row — if the engine's sort order differed from the
oracle's, the numbers would land on different rows and the hash breaks.

Scale notes: a global ORDER BY is a range-partitioned sort (sampling →
range exchange → per-partition sort) — fine when the result is consumed
partition-parallel. ``orderBy().limit(k)`` is different and cheap at any
scale: Spark plans TakeOrderedAndProject (per-partition top-k heaps, then
a k-sized merge on the driver) — no global sort ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register


@register(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, status_np, o_totalprice,
           row_number() OVER (ORDER BY status_np DESC NULLS LAST,
                              o_totalprice DESC, o_orderkey ASC) AS sort_pos
    FROM (SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_np, o_totalprice
          FROM orders
          WHERE o_totalprice > 350000.0)
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement (nulls manufactured
    via NULLIF — the data has none). The unpartitioned row_number that
    proves the order is a single-reducer construct: acceptable only
    because the filter keeps the result small; an unbounded global sort
    at 100 TB would use orderBy alone (range partitioned)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 350000.0)
        .select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np"),
            "o_totalprice",
        )
    )
    order = [
        F.col("status_np").desc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ]
    return o.orderBy(*order).withColumn(
        "sort_pos", F.row_number().over(Window.orderBy(*order))
    )


@register(
    "q_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject. The (o_totalprice,
    o_orderkey) order key is total, so the k-row *set* is deterministic —
    mandatory for an order-insensitive hash check."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )

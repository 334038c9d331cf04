"""§2.5 Window functions.

All over ``Window.partitionBy(...).orderBy(...)`` with explicit frames.

Determinism discipline: every order-sensitive function (row_number,
lag/lead, ntile, first/last, running aggregates) orders by a key made
total with a unique tie-break column; windowed *sums* accumulate in
DECIMAL(38,6) because engines are free to evaluate a frame aggregate in
any association order (DuckDB uses a segment tree; Spark accumulates) —
decimal addition is associative, double addition is not.

Scale note: a window is one shuffle on partitionBy keys + a per-partition
sort. Partition keys here (customer, user) are high-cardinality, so state
per key is small; skew lands on AQE. An unpartitioned window (q_sort_multi
in sorts.py) is a single-reducer construct — flagged there as such.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register
from copy_databasetables_spark.operators._helpers import DEC, us


@register(
    "q_win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, price_bucket,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY price_bucket DESC, o_orderkey ASC) AS rn,
           rank()       OVER (PARTITION BY o_custkey ORDER BY price_bucket DESC) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY price_bucket DESC) AS drnk
    FROM (SELECT o_custkey, o_orderkey,
                 CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS price_bucket
          FROM orders)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number vs rank vs dense_rank on a tie-prone bucket key: rank
    functions see the ties (same bucket → same rank), row_number breaks
    them with the unique order key."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("price_bucket"),
    )
    w_tie = Window.partitionBy("o_custkey").orderBy(
        F.col("price_bucket").desc(), F.col("o_orderkey").asc()
    )
    w_rank = Window.partitionBy("o_custkey").orderBy(F.col("price_bucket").desc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        "price_bucket",
        F.row_number().over(w_tie).alias("rn"),
        F.rank().over(w_rank).alias("rnk"),
        F.dense_rank().over(w_rank).alias("drnk"),
    )


@register(
    "q_win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. At 100 TB this is the scalable top-k:
    rank is computed after one hash shuffle on the group key, and Spark
    pushes a per-partition WindowGroupLimit (top-k heap) below the
    shuffle so mappers emit at most k rows per group, not the whole group."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "q_win_lead_lag",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           epoch_us(CAST(ts AS TIMESTAMP))
             - lag(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_prev_us,
           lead(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
             - epoch_us(CAST(ts AS TIMESTAMP)) AS gap_next_us
    FROM events
    """,
)
def q_win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gaps per user via lag/lead (µs integers end to end)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", us("ts", "ts_us")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_prev_us"),
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("gap_next_us"),
    )


@register(
    "q_win_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS running_n
    FROM events
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@register(
    "q_win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           (CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
              / COUNT(*) OVER w) AS mov_avg3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average as exact-sum/count so both engines do the
    same single double division."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("mov_avg3"),
    )


@register(
    "q_win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER w AS n_in_band,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_in_band
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC
                 RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame on a numeric order key: all orders within
    $10k below the current order's price. A RANGE frame's row set is
    value-determined, so it is deterministic even with price ties."""
    o = load_table(spark, sf_dir, "orders")
    # The Python WindowSpec.rangeBetween only accepts integer offsets; a
    # fractional RANGE bound needs the SQL window syntax.
    over = (
        "OVER (PARTITION BY o_custkey ORDER BY o_totalprice ASC "
        "RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.expr(f"COUNT(1) {over}").alias("n_in_band"),
        F.expr(
            f"CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) {over} AS DOUBLE)"
        ).alias("sum_in_band"),
    )


@register(
    "q_win_ntile_pct",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def q_win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist per nation. Order is total (unique
    c_custkey tie-break), so tile assignment is deterministic, and the
    two ratios are int/int IEEE divisions — bit-identical across engines
    UNROUNDED. (Rounding would *add* risk here: rank/(n-1) rationals can
    sit on a decimal half-boundary, where Spark's repr-based round and
    DuckDB's binary round disagree — observed at sf0.1.)"""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q_win_distinct_count",
    oracle="""
    SELECT event_id, user_id,
           COUNT(DISTINCT event_type) OVER (PARTITION BY user_id) AS n_types,
           COUNT(DISTINCT event_type) OVER (PARTITION BY user_id
             ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_types_so_far
    FROM events
    """,
)
def q_win_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) over a window — Spark does not support it
    natively, so the engine composes it: whole-partition distinct count
    is max(dense_rank ordered by the value); the *running* distinct
    count is a cumulative sum of first-occurrence flags (lag-based).
    Both are single-shuffle window plans; DuckDB's native form is the
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    by_type = Window.partitionBy("user_id").orderBy(F.col("event_type").asc())
    whole = Window.partitionBy("user_id")
    by_time = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    cum = by_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    first_seen = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("dr", F.dense_rank().over(by_type))
        .withColumn("n_types", F.max("dr").over(whole))
        .withColumn(
            "is_first",
            (F.row_number().over(first_seen) == 1).cast("long"),
        )
        .withColumn("n_types_so_far", F.sum("is_first").over(cum))
        .select("event_id", "user_id", "n_types", "n_types_so_far")
    )


@register(
    "q_win_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type,
           nth_value(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last/second event type per user over an unbounded frame
    (the frame must be explicit: the default frame stops at CURRENT ROW,
    which silently breaks last_value). Reduced with DISTINCT to one row
    per user."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    ).distinct()

"""§2.3 Joins.

Scale notes (100 TB): Catalyst picks the physical join. We make the
choices it cannot infer:

- dimension tables (region/nation/supplier at any SF, customer at small
  SF) are hinted with ``F.broadcast`` where the query shape guarantees
  they stay small — a broadcast-hash join removes the big side's shuffle
  entirely;
- fact⋈fact equi-joins (lineitem⋈orders) stay sort-merge with AQE skew
  handling on — the correct default at 100 TB;
- non-equi joins (theta/interval) are kept *bounded*: one side is tiny
  (bands) or the predicate is band-limited per key (1-hour window per
  user), because an unbounded BNL join is quadratic no matter the engine;
- the as-of join composes join + window ``row_number()==1`` — the
  Spark-native plan for "latest prior per key" (no native asof in the
  DataFrame API; pandas-on-Spark ``merge_asof`` exists but funnels
  through Python, wrong at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register
from copy_databasetables_spark.operators._helpers import (
    bloom_build,
    bloom_might_contain_sql,
    dsum,
    us,
)


@register(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with an extra join-side predicate so null-extension
    actually occurs (every customer has orders in this data)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 400000.0)
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cond = (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "P")
    return o.join(c, cond, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@register(
    "q_join_full",
    oracle="""
    WITH neg AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal < 0),
         big AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                 WHERE o_totalprice > 400000.0)
    SELECT neg.c_custkey, neg.c_name, big.o_orderkey, big.o_totalprice
    FROM neg FULL JOIN big ON big.o_custkey = neg.c_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer between two filtered subsets → nulls on both sides."""
    neg = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") < 0)
        .select("c_custkey", "c_name")
    )
    big = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    return neg.join(big, big.o_custkey == neg.c_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence: left-semi emits each left row at most once and never
    materializes right columns — strictly cheaper than join+distinct."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name,
           (n.n_regionkey = r.r_regionkey) AS is_home_region
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cartesian (5×25). At scale a cross join is only ever
    sane when one side is broadcast-tiny — which Catalyst detects here
    (BroadcastNestedLoopJoin)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home_region"),
    )


_BANDS = [
    ("budget", 900.0, 925.0),
    ("mid", 925.0, 950.0),
    ("premium", 950.0, 975.0),
    ("luxury", 975.0, 1000.0),
]


@register(
    "q_join_theta",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, b.band
    FROM part p
    JOIN (VALUES ('budget', 900.0, 925.0), ('mid', 925.0, 950.0),
                 ('premium', 950.0, 975.0), ('luxury', 975.0, 1000.0))
         AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a literal band table. Catalyst plans
    BroadcastNestedLoopJoin — correct: the band side is 4 rows, so the
    'nested loop' is 4 comparisons per part row, fully scan-parallel."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    cond = (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi)
    return p.join(F.broadcast(bands), cond).select("p_partkey", "p_retailprice", "band")


@register(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint on the 25-row dimension: no shuffle of the
    customer side at any scale factor — the map-side join pattern that
    must hold at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", "total_bal"))
    )


@register(
    "q_join_multi_star",
    oracle="""
    SELECT n.n_name, r.r_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name, r.r_name
    """,
)
def q_join_multi_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join (TPC-H Q5 shape). lineitem⋈orders is the only
    guaranteed shuffle join. nation/region carry explicit broadcast
    hints (fixed 25/5 rows at EVERY scale factor). customer does NOT:
    it grows linearly with SF, so a hardcoded hint would force an
    executor-OOM build side at 100×; size-based selection (AQE) picks
    broadcast while it fits and demotes to sort-merge when it doesn't."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


@register(
    "q_join_interval",
    oracle="""
    SELECT p.event_id AS purchase_id, k.event_id AS click_id, p.user_id
    FROM events p
    JOIN events k
      ON k.user_id = p.user_id
     AND p.event_type = 'purchase' AND k.event_type = 'click'
     AND k.ts >= p.ts - INTERVAL 1 HOUR AND k.ts < p.ts
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event pairs within a bounded interval per user: clicks in the hour
    before each purchase. Equi on user_id (hash-partitionable) + band
    predicate on ts — at scale, the equi key keeps this a shuffle-hash
    join; the time band keeps per-key fan-out bounded."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    k = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("k_user"),
        F.col("ts").alias("k_ts"),
    )
    cond = (
        (k.k_user == p.user_id)
        & (k.k_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (k.k_ts < p.p_ts)
    )
    return p.join(k, cond).select("purchase_id", "click_id", "user_id")


def _asof(spark: SparkSession, sf_dir: str, tolerance_hours: int | None):
    """Shared as-of core: latest signup at-or-before each purchase per
    user (left join), deterministic (ts desc, event_id desc) tie-break;
    ``tolerance_hours`` adds the two-sided staleness band (None =
    unbounded history, the plain as-of)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    s = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    cond = (s.s_user == p.user_id) & (s.s_ts <= p.p_ts)
    if tolerance_hours is not None:
        cond = cond & (
            s.s_ts >= p.p_ts - F.expr(f"INTERVAL {tolerance_hours} HOURS")
        )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("s_ts").desc_nulls_last(), F.col("signup_id").desc_nulls_last()
    )
    return (
        p.join(s, cond, "left")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            us("p_ts", "purchase_ts_us"),
            "signup_id",
            us("s_ts", "signup_ts_us"),
        )
    )



@register(
    "q_join_asof",
    oracle="""
    SELECT purchase_id, user_id, purchase_ts_us, signup_id, signup_ts_us
    FROM (
      SELECT p.event_id AS purchase_id, p.user_id,
             epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_ts_us,
             s.event_id AS signup_id,
             epoch_us(CAST(s.ts AS TIMESTAMP)) AS signup_ts_us,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY s.ts DESC NULLS LAST, s.event_id DESC NULLS LAST
             ) AS rn
      FROM events p
      LEFT JOIN events s
        ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
      WHERE p.event_type = 'purchase'
    ) WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest signup at-or-before it
    by the same user (left: purchases with no prior signup survive with
    nulls). Composition: banded join + per-purchase window row_number==1
    with a deterministic (ts, event_id) tie-break — the Spark-native asof
    plan; both sides stay hash-partitioned on user_id."""
    return _asof(spark, sf_dir, tolerance_hours=None)


#: 7, not 8: the salt source l_linenumber takes values 1..7, so mod 7
#: yields the COMPLETE residue set {0..6} — mod 8 would never produce 0,
#: leaving one reducer slot unused and 1/8 of the exploded build side
#: joining nothing.
_SALT = 7


@register(
    "q_join_salted",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manually salted join — the skew mitigation for when AQE can't
    help (e.g. the downstream aggregation wants the join's partitioning,
    or the engine predates runtime re-planning): the probe side gets a
    deterministic salt (l_linenumber mod 7 — NO rand(): results must be
    reproducible under retries and re-partitioning; 7 because the salt
    source covers exactly the residues 0..6), the build side is exploded
    ×7 with every salt value, and the join key becomes (orderkey, salt)
    — a hot orderkey's rows now land on 7 reducers instead of 1. Salting
    is result-invariant: each probe row still matches exactly its
    orderkey's build rows (once, at its own salt), proven by the hash
    against the UNSALTED oracle join."""
    l = load_table(spark, sf_dir, "lineitem").withColumn(  # noqa: E741
        "salt", F.col("l_linenumber") % _SALT
    )
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt_o", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1)))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey) & (F.col("salt") == F.col("salt_o")),
        )
        .groupBy("o_orderstatus")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


#: runtime-filter bloom for q_join_bloom_prune: 2^20 bits × 3 hashes.
#: At sf0.1's ~30k urgent orders the per-key FP rate is
#: (1-e^(-kn/m))^k ≈ 6e-4 — the pruned fact stream is within a fraction
#: of a percent of the true matching rows.
_JB_BITS = 1 << 20
_JB_K = 3


@register(
    "q_join_bloom_prune",
    oracle="""
    SELECT l.l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
)
def q_join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact⋈dim join with a BLOOM RUNTIME FILTER on the fact
    side — the shuffle-reduction move for when the dim side is filtered
    (~20% of orders are 1-URGENT) but too big to broadcast: build a
    bloom of the surviving join keys (one aggregate over the small
    side, a 128 KB broadcast — _helpers.bloom_build, the same
    construction q_decontaminate_bloom uses), test every lineitem row
    against it MAP-SIDE before the join's exchange, and let the real
    equi-join eliminate the residual false positives. The result is
    therefore EXACTLY the plain join's (hash-proven against the
    unfiltered-join oracle); what changed is that ~80% of the fact
    table never enters the shuffle.

    This hand-builds what Spark's runtime row-level filtering
    (spark.sql.optimizer.runtime.bloomFilter.enabled) injects when
    statistics justify it — expressed explicitly so the plan is pinned
    rather than statistics-dependent, and so the filter composes with
    engines/API levels where the optimizer rule is off. At 100 TB the
    savings is the difference between shuffling 100 TB and 20 TB;
    pruning effectiveness is unit-tested (pruned stream ≤ match count
    + FP margin)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bloom = bloom_build(o.select("o_orderkey"), "o_orderkey", _JB_BITS, _JB_K)
    pruned = li.crossJoin(F.broadcast(bloom)).where(
        F.expr(bloom_might_contain_sql("l_orderkey", _JB_BITS, _JB_K))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        pruned.join(o, pruned.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum(revenue, "revenue"))
    )


@register(
    "q_join_range_binned",
    oracle="""
    WITH w AS (
      SELECT event_id AS window_id, CAST(ts AS TIMESTAMP) AS w_start,
             CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS w_end
      FROM events WHERE event_id % 199 = 0)
    SELECT w.window_id,
           COUNT(e.event_id) AS n_events,
           COALESCE(CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE),
                    0.0) AS total_value
    FROM w LEFT JOIN events e
      ON CAST(e.ts AS TIMESTAMP) >= w.w_start
     AND CAST(e.ts AS TIMESTAMP) <  w.w_end
    GROUP BY w.window_id
    """,
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join WITHOUT an equi key, made shuffle-joinable
    by TIME BINNING — the missing case between q_join_interval (which
    has user_id to hash on) and q_join_theta (whose band table is tiny
    enough to broadcast): here the window table is unbounded and shares
    no key with the probe side, so the naive plan is a cartesian
    product. The binned rewrite is the standard range-join
    optimization: explode each 2-hour window into the epoch-hours it
    overlaps (≤3 rows/window — bin count = ceil(len/step)+1), map each
    event to its single hour, equi-join on the hour, then apply the
    exact containment predicate. No pair can be produced twice (an
    event lives in exactly one bin), so no distinct is needed; the
    shuffle key is the hour, and skew in a hot hour is ordinary
    equi-join skew that AQE already handles. At 100 TB the bin width
    tunes fan-out vs selectivity exactly like a range-join hint's bin
    size. LEFT join keeps empty windows at zero, matching the oracle's
    direct theta join."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    w = ev.where(F.col("event_id") % 199 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("w_end"),
    )
    wh = w.withColumn(
        "hr",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "w_start"),
                F.date_trunc(
                    "hour", F.col("w_end") - F.expr("INTERVAL 1 MICROSECOND")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    e = ev.select(
        F.col("event_id").alias("e_id"),
        F.col("ts").alias("e_ts"),
        "value",
        F.date_trunc("hour", "ts").alias("hr"),
    )
    matched = (
        wh.join(e, "hr")
        .where((F.col("e_ts") >= F.col("w_start")) & (F.col("e_ts") < F.col("w_end")))
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
    )
    return (
        w.select("window_id")
        .join(matched, "window_id", "left")
        .select(
            "window_id",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


#: bounded-staleness window for the tolerance as-of: a signup older
#: than this no longer "explains" the purchase.
_ASOF_TOL_HOURS = 24


@register(
    "q_join_asof_tolerance",
    oracle=f"""
    SELECT purchase_id, user_id, purchase_ts_us, signup_id, signup_ts_us
    FROM (
      SELECT p.event_id AS purchase_id, p.user_id,
             epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_ts_us,
             s.event_id AS signup_id,
             epoch_us(CAST(s.ts AS TIMESTAMP)) AS signup_ts_us,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY s.ts DESC NULLS LAST, s.event_id DESC NULLS LAST
             ) AS rn
      FROM events p
      LEFT JOIN events s
        ON s.user_id = p.user_id AND s.event_type = 'signup'
       AND s.ts <= p.ts
       AND s.ts >= p.ts - INTERVAL {_ASOF_TOL_HOURS} HOUR
      WHERE p.event_type = 'purchase'
    ) WHERE rn = 1
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas
    ``merge_asof(tolerance=...)``): the latest signup at-or-before each
    purchase counts only if it is within 24 h — older matches become
    NULL, the semantics every feature-freshness join needs (a
    day-old sensor reading must not silently fill today's row).

    The tolerance is also the SCALE lever q_join_asof lacks: the plain
    as-of's banded join pairs each purchase with the user's ENTIRE
    signup history (unbounded per-key quadratic term for power users);
    the two-sided band bounds candidates per purchase to one window's
    worth — the same reasoning as q_join_interval's hour-bucket
    equi-key, and at 100 TB the band predicate is what makes the
    shuffle join's per-key work O(window), not O(history)."""
    return _asof(spark, sf_dir, tolerance_hours=_ASOF_TOL_HOURS)


#: deterministic version boundaries for the synthetic SCD2 dimension
#: (the events span Jan 2024 — see TESTDATA.md).
_TDIM_T1 = "2024-01-11 00:00:00"
_TDIM_T2 = "2024-01-21 00:00:00"


@register(
    "q_join_temporal_dim",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    dim AS (
      SELECT u.user_id, v.version, v.tier,
             v.valid_from, v.valid_to,
             (u.user_id % 5) + v.version AS discount
      FROM u CROSS JOIN (VALUES
        (1, 'bronze', TIMESTAMP '1970-01-01 00:00:00',
                      TIMESTAMP '{_TDIM_T1}'),
        (2, 'silver', TIMESTAMP '{_TDIM_T1}',
                      TIMESTAMP '{_TDIM_T2}'),
        (3, 'gold',   TIMESTAMP '{_TDIM_T2}',
                      TIMESTAMP '9999-12-31 00:00:00')
      ) AS v(version, tier, valid_from, valid_to))
    SELECT e.event_id, e.user_id,
           epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
           d.version, d.tier, d.discount
    FROM events e
    JOIN dim d ON d.user_id = e.user_id
              AND d.valid_from <= CAST(e.ts AS TIMESTAMP)
              AND CAST(e.ts AS TIMESTAMP) < d.valid_to
    """,
)
def q_join_temporal_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-time) dimension join — the consumption side
    of SCD2 (copy_table_scd2 is the PRODUCTION side): every event joins
    the dimension VERSION that was valid at its event time, via
    key-equi join + half-open [valid_from, valid_to) containment. This
    is how a versioned customer/user dimension is read in every
    warehouse fact pipeline; getting the half-open convention wrong
    double-counts events landing exactly on a version boundary (the
    oracle would hash-red on it).

    The dimension here is synthesized deterministically (three tiers
    over the Jan-2024 event span, a per-user modular attribute) so the
    oracle can rebuild it exactly; swap in the SCD2 table's
    (key, valid_from, valid_to) and nothing else changes.

    Scale shape (100 TB): the join key is user_id, so the fact shuffles
    once on the key it aggregates by downstream; the containment
    predicate rides as a residual on the equi-join — per-key work is
    O(versions), and versions-per-key is small by SCD2 construction.
    Never express this as a pure range join: the equi key is what keeps
    it hash-partitionable."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    users = ev.select("user_id").distinct()
    versions = spark.createDataFrame(
        [
            (1, "bronze", "1970-01-01 00:00:00", _TDIM_T1),
            (2, "silver", _TDIM_T1, _TDIM_T2),
            (3, "gold", _TDIM_T2, "9999-12-31 00:00:00"),
        ],
        "version int, tier string, valid_from string, valid_to string",
    ).select(
        "version",
        "tier",
        F.col("valid_from").cast("timestamp_ntz").alias("valid_from"),
        F.col("valid_to").cast("timestamp_ntz").alias("valid_to"),
    )
    dim = (
        users.crossJoin(F.broadcast(versions))
        .withColumn("discount", F.col("user_id") % 5 + F.col("version"))
        # break the self-join lineage (users derives from ev): the dim
        # side carries its own key name
        .select(
            F.col("user_id").alias("d_uid"), "version", "tier",
            "valid_from", "valid_to", "discount",
        )
    )
    cond = (
        (ev["user_id"] == dim["d_uid"])
        & (dim["valid_from"] <= ev["ts"])
        & (ev["ts"] < dim["valid_to"])
    )
    return ev.join(dim, cond).select(
        "event_id",
        "user_id",
        us("ts", "ts_us"),
        "version",
        "tier",
        "discount",
    )


# --------------------------------------------------------------------------
# q_join_asof_nearest (r12): direction='nearest' as-of — the two-sided
# variant (pandas merge_asof(direction='nearest', tolerance=...)) that
# completes the as-of family: backward (q_join_asof), backward+tolerance
# (q_join_asof_tolerance), nearest-in-either-direction (this op).
# --------------------------------------------------------------------------

_NEAREST_TOL_HOURS = 72


@register(
    "q_join_asof_nearest",
    oracle=f"""
    SELECT purchase_id, user_id, purchase_ts_us, signup_id, signup_ts_us,
           gap_us
    FROM (
      SELECT p.event_id AS purchase_id, p.user_id,
             epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_ts_us,
             s.event_id AS signup_id,
             epoch_us(CAST(s.ts AS TIMESTAMP)) AS signup_ts_us,
             epoch_us(CAST(s.ts AS TIMESTAMP))
               - epoch_us(CAST(p.ts AS TIMESTAMP)) AS gap_us,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY ABS(epoch_us(CAST(s.ts AS TIMESTAMP))
                            - epoch_us(CAST(p.ts AS TIMESTAMP)))
                          ASC NULLS LAST,
                        s.ts ASC NULLS LAST,
                        s.event_id ASC NULLS LAST
             ) AS rn
      FROM events p
      LEFT JOIN events s
        ON s.user_id = p.user_id AND s.event_type = 'signup'
       AND s.ts >= p.ts - INTERVAL {_NEAREST_TOL_HOURS} HOUR
       AND s.ts <= p.ts + INTERVAL {_NEAREST_TOL_HOURS} HOUR
      WHERE p.event_type = 'purchase'
    ) WHERE rn = 1
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: for each purchase, the signup CLOSEST in
    time by the same user — before OR after — within a two-sided
    ±72h (_NEAREST_TOL_HOURS) tolerance (pandas ``merge_asof(direction=
    'nearest', tolerance=...)``). The semantics sensor/feature
    alignment needs when the reference stream can lag OR lead the
    fact stream; purchases with no signup in the band survive with
    NULLs (left join). Output carries the SIGNED gap (signup − 
    purchase, µs) so downstream can tell lead from lag.

    The two-sided band is also the scale lever: like
    q_join_asof_tolerance, the join predicate bounds each purchase's
    candidate set to a fixed time window, so at 100 TB the banded
    equi-join on user_id (both sides hash-partitioned once) never
    degenerates into per-user full history — state is O(band), not
    O(stream). Determinism: the nearest is picked on the exact
    integer µs distance; an equidistant before/after pair tie-breaks
    to the EARLIER signup (backward preference, pandas-compatible),
    then event_id — a total order, NULLS LAST mirrored on both
    engines for the no-match rows."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    s = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    band = F.expr(f"INTERVAL {_NEAREST_TOL_HOURS} HOURS")
    cond = (
        (s.s_user == p.user_id)
        & (s.s_ts >= p.p_ts - band)
        & (s.s_ts <= p.p_ts + band)
    )
    gap = us("s_ts") - us("p_ts")
    w = Window.partitionBy("purchase_id").orderBy(
        F.abs(F.col("gap_us")).asc_nulls_last(),
        F.col("s_ts").asc_nulls_last(),
        F.col("signup_id").asc_nulls_last(),
    )
    return (
        p.join(s, cond, "left")
        .withColumn("gap_us", gap)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            us("p_ts", "purchase_ts_us"),
            "signup_id",
            us("s_ts", "signup_ts_us"),
            "gap_us",
        )
    )

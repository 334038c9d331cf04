"""Event/spend analytics operators (beyond-survey coverage).

Two shapes a production warehouse runs daily that the §2 inventory only
implies:

- ``q_funnel`` — ordered event-sequence (funnel) analysis: for each
  user, the first ``view``, the first ``click`` strictly after it, and
  the first ``purchase`` strictly after that. Strict ordering is the
  point — a click before any view must not count.
- ``q_agg_histogram`` — fixed-bin histogram of a numeric column, with
  bin arithmetic portable across engines (plain FLOOR division, no
  engine-specific width_bucket semantics).

Scale notes (100 TB): the funnel's three conditional aggregations and
two joins are ALL keyed on user_id, so the plan shuffles the events
table once and reuses that partitioning for every later stage (AQE
keeps co-partitioned joins exchange-free); state per user is three
timestamps. The histogram is a two-phase hash aggregate on a derived
int key — partial maps have at most n_bins entries, so the shuffle
carries bins, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register
from copy_databasetables_spark.operators._helpers import dsum, rz, us


@register(
    "q_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
      GROUP BY e.user_id)
    SELECT s1.user_id,
           epoch_us(s1.t1) AS view_us,
           epoch_us(s2.t2) AS click_us,
           epoch_us(s3.t3) AS purchase_us,
           1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
             + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END AS stage
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s2.user_id = s3.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered view→click→purchase funnel per user.

    Stage k's timestamp is the MIN event of that type strictly after
    stage k-1's timestamp — a click that precedes every view does not
    advance the funnel. Three conditional aggregations chained by
    equi-joins, every one keyed on user_id (one shuffle, reused)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # rename the join keys: s2/s3 carry s1 in their lineage, so joining
    # on same-named user_id columns would be ambiguous self-join territory
    s2r = s2.select(F.col("user_id").alias("u2"), "t2")
    s3r = s3.select(F.col("user_id").alias("u3"), "t3")
    stage = (
        F.lit(1)
        + F.when(F.col("u2").isNull(), 0).otherwise(1)
        + F.when(F.col("u3").isNull(), 0).otherwise(1)
    )
    return (
        s1.join(s2r, F.col("user_id") == F.col("u2"), "left")
        .join(s3r, F.col("u2") == F.col("u3"), "left")
        .select(
            "user_id",
            us("t1", "view_us"),
            us("t2", "click_us"),
            us("t3", "purchase_us"),
            stage.alias("stage"),
        )
    )


_HIST_LO = 0.0
_HIST_STEP = 5_000.0
_HIST_BINS = 22


@register(
    "q_agg_histogram",
    oracle=f"""
    SELECT LEAST(GREATEST(CAST(FLOOR((l_extendedprice - {_HIST_LO})
                                     / {_HIST_STEP}) AS INT), 0),
                 {_HIST_BINS - 1}) AS bin,
           COUNT(*) AS n_rows,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_price
    FROM lineitem
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin price histogram: bin = clamp(floor((x-lo)/step)).

    Plain FLOOR arithmetic instead of width_bucket so the bin function
    is bit-identical in any engine; the clamp folds under/overflow into
    the edge bins (standard histogram tails)."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.least(
        F.greatest(
            F.floor((F.col("l_extendedprice") - _HIST_LO) / _HIST_STEP).cast("int"),
            F.lit(0),
        ),
        F.lit(_HIST_BINS - 1),
    )
    return (
        li.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            dsum("l_extendedprice", "sum_price"),
        )
    )


_SESSION_GAP_US = 1_800_000_000  # 30 min


@register(
    "q_sessionize",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM o)
    SELECT user_id, CAST(session_idx AS INT) AS session_idx,
           epoch_us(MIN(ts)) AS start_us, epoch_us(MAX(ts)) AS end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, session_idx
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: events of one user separated by ≤30 min of
    idle time form a session (the batch twin of the streaming
    session-window operator, q_stream_session — same gap semantics,
    here as plain window functions over history).

    Shape: lag + running-sum over (user_id ORDER BY ts), then a groupBy
    on (user_id, session_idx) — every stage keys on user_id, so the
    events table shuffles ONCE and the window sort, the session
    aggregation, and any later per-user join all reuse that exchange.
    Session state per user is one timestamp (the lag), not the event
    history. Ties: both windows (the lag and the ROWS-frame running
    sum) order by (ts, event_id) so tied timestamps cannot make the
    session index order-nondeterministic; the oracle's `s` CTE uses the
    identical tiebreak."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = us("ts") - us(F.lag("ts").over(w))
    new_sess = F.when(
        F.lag("ts").over(w).isNull() | (gap_us > _SESSION_GAP_US), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = ev.withColumn("new_sess", new_sess).withColumn(
        "session_idx", F.sum("new_sess").over(run).cast("int")
    )
    return s.groupBy("user_id", "session_idx").agg(
        us(F.min("ts"), "start_us"),
        us(F.max("ts"), "end_us"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    )


@register(
    "q_retention",
    oracle="""
    WITH c AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
               FROM events GROUP BY user_id),
    sz AS (SELECT cohort_day, COUNT(*) AS cohort_size
           FROM c GROUP BY cohort_day),
    a AS (SELECT DISTINCT e.user_id, c.cohort_day,
                 datediff('day', c.cohort_day, CAST(e.ts AS DATE))
                     AS day_offset
          FROM events e JOIN c ON e.user_id = c.user_id)
    SELECT CAST(a.cohort_day AS VARCHAR) AS cohort_day,
           CAST(day_offset AS INT) AS day_offset,
           COUNT(*) AS n_active,
           round(COUNT(*) / CAST(sz.cohort_size AS DOUBLE), 6)
               AS retention
    FROM a JOIN sz ON a.cohort_day = sz.cohort_day
    GROUP BY a.cohort_day, day_offset, sz.cohort_size
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted distinct on every later active day as an offset from the
    cohort day, with the retained fraction of the cohort.

    Shape: the cohort assignment and the activity scan both key on
    user_id (one shuffle, reused by the join); the final matrix keys on
    (cohort_day, day_offset) whose cardinality is days² — tiny, so the
    cohort-size side of the last join is broadcast by size. No
    collect, no per-day driver loop: the whole matrix is one plan."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    size = cohort.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    active = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", F.col("cohort_day")).cast("int").alias("day_offset"),
        )
        .distinct()
    )
    return (
        active.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(size, "cohort_day")
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
            "n_active",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )


#: anomaly detection: trailing window of hourly counts (rows, not time —
#: both engines see the identical hour sequence) and the z>3 rule.
_ANOM_TRAIL = 24
_ANOM_MIN_HISTORY = 12
_ANOM_Z = 3


@register(
    "q_events_anomaly",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             COUNT(*) AS n_events
      FROM events GROUP BY 1),
    w AS (
      SELECT hr, n_events,
             COUNT(*)            OVER t AS n_hist,
             SUM(n_events)       OVER t AS s,
             SUM(n_events * n_events) OVER t AS ss
      FROM hourly
      WINDOW t AS (ORDER BY hr
                   ROWS BETWEEN {_ANOM_TRAIL} PRECEDING AND 1 PRECEDING))
    SELECT epoch_us(hr) AS hour_us, n_events,
           CASE WHEN n_hist >= 2 AND n_hist * ss > s * s THEN
             (round((n_events - CAST(s AS DOUBLE) / n_hist)
                   / sqrt((ss - CAST(s AS DOUBLE) * s / n_hist)
                          / (n_hist - 1)), 4) + 0.0)
           END AS z,
           COALESCE(n_hist >= {_ANOM_MIN_HISTORY}
             AND n_hist * n_events - s > 0
             AND (n_hist - 1) * (n_hist * n_events - s)
                              * (n_hist * n_events - s)
                 > {_ANOM_Z * _ANOM_Z} * n_hist * (n_hist * ss - s * s),
             FALSE) AS is_anomaly
    FROM w
    """,
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: hourly counts vs their trailing
    24-hour window, flagging hours more than 3 trailing standard
    deviations above the trailing mean — the ingest-monitoring job a
    training-data pipeline runs on every source feed (a spiking crawl
    host, a stuck producer replaying, a log-format break flooding one
    type).

    Determinism across engines is the design problem: mean/std are
    float, and a float `z > 3` comparison can flip on last-ulp
    differences right at the boundary. The FLAG therefore uses only
    int64 arithmetic — with n the trailing count, S/SS the trailing
    sum and sum of squares, `z² > 9·var` rewrites as
    (n-1)·(n·cnt − S)² > 9·n·(n·SS − S²), exact in BIGINT at any
    realistic magnitude (hour counts ≤ ~1e6 before overflow matters).
    The displayed z is informational (rounded 4dp); the decision never
    touches a double.

    Scale: one two-phase hourly count (shuffle carries |hours| rows,
    constant in event volume), one window over the tiny hour table.
    At 100 TB partition the count by (source, hour) and the window by
    source — per-feed anomaly streams, same plan."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    from pyspark.sql.window import Window

    # BOUNDED unpartitioned window: the frame is the per-HOUR count
    # table (|hours| rows — constant in event volume, ~744/month), not
    # the corpus; the trailing-stats recurrence genuinely needs global
    # hour order. The WindowExec single-partition warning this emits is
    # size-safe by construction; at 100 TB partition by source instead
    # (per-feed anomaly streams), as the docstring notes.
    t = (
        Window.orderBy("hr")
        .rowsBetween(-_ANOM_TRAIL, -1)
    )
    w = hourly.select(
        "hr",
        "n_events",
        F.count(F.lit(1)).over(t).alias("n_hist"),
        F.sum("n_events").over(t).alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(t).alias("ss"),
    )
    dev = F.col("n_hist") * F.col("n_events") - F.col("s")
    var_num = F.col("n_hist") * F.col("ss") - F.col("s") * F.col("s")
    z = F.when(
        (F.col("n_hist") >= 2) & (var_num > 0),
        rz(
            (F.col("n_events") - F.col("s").cast("double") / F.col("n_hist"))
            / F.sqrt(
                (
                    F.col("ss")
                    - F.col("s").cast("double") * F.col("s") / F.col("n_hist")
                )
                / (F.col("n_hist") - 1)
            ),
            4,
        ),
    )
    is_anom = F.coalesce(
        (F.col("n_hist") >= _ANOM_MIN_HISTORY)
        & (dev > 0)
        & ((F.col("n_hist") - 1) * dev * dev > _ANOM_Z * _ANOM_Z * F.col("n_hist") * var_num),
        F.lit(False),
    )
    return w.select(
        us("hr", "hour_us"),
        "n_events",
        z.alias("z"),
        is_anom.alias("is_anomaly"),
    )


def _skew_leg_sql(table: str, key: str) -> str:
    """One UNION leg of the q_skew_report oracle: group-size
    distribution of ``table`` grouped by ``key``."""
    return f"""
    SELECT '{table}.{key}' AS key_col,
           COUNT(*) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MAX(n) AS BIGINT) AS max_n,
           round(quantile_cont(n, 0.90), 4) AS p90_n,
           round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS mean_n,
           round(CAST(MAX(n) AS DOUBLE)
                 / (CAST(SUM(n) AS DOUBLE) / COUNT(*)), 4) AS skew_ratio,
           (SELECT k FROM (SELECT {key} AS k, COUNT(*) AS n2
                           FROM {table} GROUP BY {key})
            ORDER BY n2 DESC, k LIMIT 1) AS top_key
    FROM (SELECT COUNT(*) AS n FROM {table} GROUP BY {key})"""


_SKEW_LEGS = [
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
]


@register(
    "q_skew_report",
    oracle=" UNION ALL ".join(_skew_leg_sql(t, k) for t, k in _SKEW_LEGS),
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the pre-join report a 100 TB operator
    runs BEFORE choosing a strategy (SCALE.md's salting/AQE-skew-split
    decisions start from exactly these numbers): for each of the
    engine's fact join keys, the group-size distribution (key count,
    row count, max, exact p90, mean), the max/mean skew ratio, and the
    single heaviest key (deterministic smallest-key tie-break). A
    skew_ratio near 1 says hash-partitioning balances; 100+ says the
    hot key needs salting or an AQE split.

    Cost shape: one groupBy per fact (map-side combined to one row per
    key per mapper), then an aggregate over the GROUP-SIZE table —
    orders of magnitude smaller than the fact. The heaviest-key probe
    is a TakeOrdered top-1 over the same size table. Exact p90 sorts
    group sizes per leg; at extreme key cardinality swap in the KLL
    row's sketch (q_agg_kll_mergeable) — the report's contract doesn't
    change."""
    legs = []
    for table, key in _SKEW_LEGS:
        sizes = (
            load_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        top = (
            sizes.orderBy(F.col("n").desc(), F.col(key))
            .limit(1)
            .select(F.col(key).cast("bigint").alias("top_key"))
        )
        stats = sizes.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_n"),
            F.round(F.percentile("n", F.lit(0.90)), 4).alias("p90_n"),
        ).select(
            F.lit(f"{table}.{key}").alias("key_col"),
            "n_keys",
            "n_rows",
            "max_n",
            "p90_n",
            F.round(F.col("n_rows").cast("double") / F.col("n_keys"), 6).alias(
                "mean_n"
            ),
            F.round(
                F.col("max_n").cast("double")
                / (F.col("n_rows").cast("double") / F.col("n_keys")),
                4,
            ).alias("skew_ratio"),
        )
        legs.append(stats.crossJoin(F.broadcast(top)))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


@register(
    "q_events_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS prev_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                                               ASC,
                                             event_id ASC) AS next_type
      FROM events),
    pair AS (SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_ab
             FROM seq WHERE next_type IS NOT NULL
             GROUP BY prev_type, next_type),
    outc AS (SELECT prev_type, CAST(SUM(n_ab) AS BIGINT) AS n_prev
             FROM pair GROUP BY prev_type)
    SELECT p.prev_type, p.next_type, p.n_ab, o.n_prev,
           (round(CAST(p.n_ab AS DOUBLE) / o.n_prev, 6) + 0.0) AS prob
    FROM pair p JOIN outc o USING (prev_type)
    """,
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral Markov transition table: adjacent event-type pairs
    per user (ordered by event time with event_id as the total
    tie-break) → transition counts and conditional probabilities
    P(next | prev) — the first-order user-journey model under churn
    prediction, anomaly detection (q_events_anomaly's sequence-level
    sibling), and funnel design; q_text_lm_bigram's shape applied to
    event streams instead of tokens.

    Scale shape (100 TB): ONE shuffle on user_id for the lead window
    (per-user state is a single row), then a two-phase count over the
    |types|² pair space and a |types|-row normalizer join — the output
    and every post-window aggregate are bounded by the type vocabulary,
    not the event count.

    Determinism: (ts, event_id) is a total order (event_id unique), so
    the lead pairing is identical on both engines; counts are exact
    integers; prob is one double division on exact inputs, 6dp."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    pair = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ab")
    )
    outc = pair.groupBy("prev_type").agg(
        F.sum("n_ab").cast("bigint").alias("n_prev")
    )
    return pair.join(F.broadcast(outc), "prev_type").select(
        "prev_type",
        "next_type",
        "n_ab",
        "n_prev",
        F.round(F.col("n_ab").cast("double") / F.col("n_prev"), 6).alias(
            "prob"
        ),
    )


def _attribution_base(ev: DataFrame) -> DataFrame:
    """Shared touch/conversion projection for the attribution pair:
    click/view/purchase rows with the (is_conv, touch_type) split and
    the touch's epoch-µs instant carried alongside (both engines order
    and subtract in exact integer microseconds)."""
    return ev.where(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        us("ts", "tus"),
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_conv"),
        F.when(
            F.col("event_type") != "purchase", F.col("event_type")
        ).alias("touch_type"),
        F.when(F.col("event_type") != "purchase", us("ts")).alias(
            "touch_tus"
        ),
    )


@register(
    "q_events_attribution",
    oracle="""
    WITH base AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
             event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv,
             CASE WHEN event_type <> 'purchase' THEN event_type
                  END AS touch_type,
             value
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase')),
    attr AS (
      SELECT is_conv, value,
             last_value(touch_type IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY tus ASC, is_conv ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS channel
      FROM base)
    SELECT COALESCE(channel, 'unattributed') AS channel,
           CAST(COUNT(*) AS BIGINT) AS conversions,
           (round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
            + 0.0) AS total_value,
           (round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(*), 6) + 0.0) AS avg_value
    FROM attr WHERE is_conv = 1
    GROUP BY 1
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase is credited to the
    user's most recent preceding touch event (click or view; a same-
    timestamp touch outranks the purchase via the is_conv sort key, and
    event_id makes the order total), purchases with no prior touch fall
    into an explicit 'unattributed' channel, and the report aggregates
    conversion counts + revenue per channel — the marketing-attribution
    primitive behind q_funnel/q_retention-style growth analytics.

    Scale shape (100 TB): the naive formulation is a per-conversion
    as-of SELF-JOIN on an inequality (touches × purchases per user);
    this op expresses it instead as ONE shuffle on user_id feeding a
    linear carry-forward window — last(touch_type, ignorenulls) over
    rows-unbounded-preceding — so the attribution is a single sorted
    scan per user with O(1) state, the same last-observation-
    carried-forward shape q_ts_resample_ffill runs. Everything after
    the window is bounded by the channel vocabulary (≤ |touch types|+1
    rows).

    Determinism: (ts, is_conv, event_id) is a total order reproduced on
    both engines (the oracle orders by epoch-µs of the same instants);
    revenue sums accumulate in DECIMAL(18,6) — value carries 2dp, so
    the sum is exact and shuffle-order-free — and only the final
    per-channel scalars are cast to double, 6dp-rounded, signed-zero
    canonicalized."""
    base = _attribution_base(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(), F.col("is_conv").asc(), F.col("event_id").asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    conv = (
        base.withColumn(
            "channel", F.last("touch_type", ignorenulls=True).over(w)
        )
        .where(F.col("is_conv") == 1)
        .select(
            F.coalesce(F.col("channel"), F.lit("unattributed")).alias(
                "channel"
            ),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
    )
    return (
        conv.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("conversions"),
            F.sum("v").alias("sv"),
        )
        .select(
            "channel",
            "conversions",
            (F.round(F.col("sv").cast("double"), 6) + F.lit(0.0)).alias(
                "total_value"
            ),
            (
                F.round(
                    F.col("sv").cast("double")
                    / F.col("conversions").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_value"),
        )
    )


#: attribution lookback tolerance in exact integer microseconds (24 h).
#: ONE constant feeds both engines — f-strung into the oracle at import,
#: read from the module at Spark call time — so the two sides cannot
#: drift apart. Mutation-pinned in tests/test_oracle_sensitivity.
_ATTR_TOL_US = 24 * 3600 * 1000 * 1000


@register(
    "q_events_attribution_tolerance",
    oracle=f"""
    WITH base AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
             event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv,
             CASE WHEN event_type <> 'purchase' THEN event_type
                  END AS touch_type,
             CASE WHEN event_type <> 'purchase'
                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END AS touch_tus,
             value
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase')),
    attr AS (
      SELECT is_conv, value, tus,
             last_value(touch_type IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY tus ASC, is_conv ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lt,
             last_value(touch_tus IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY tus ASC, is_conv ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ltus
      FROM base)
    SELECT CASE WHEN ltus IS NOT NULL
                 AND tus - ltus <= {_ATTR_TOL_US} THEN lt
                ELSE 'unattributed' END AS channel,
           CAST(COUNT(*) AS BIGINT) AS conversions,
           (round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
            + 0.0) AS total_value,
           (round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(*), 6) + 0.0) AS avg_value
    FROM attr WHERE is_conv = 1
    GROUP BY 1
    """,
)
def q_events_attribution_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_events_attribution with a 24-hour lookback window — the
    production attribution contract: a touch older than the tolerance
    no longer earns credit, so stale sessions fall into 'unattributed'
    instead of inflating a channel (the q_join_asof_tolerance semantics
    applied to the carry-forward-window shape; at the sf grid the
    24 h cut lands mid-distribution — gap p50≈18 h, p75≈37 h — so both
    branches are exercised, not vacuously one).

    Scale shape (100 TB): identical to the base op — ONE user_id
    shuffle, one linear carry-forward window, channel-bounded tail.
    The tolerance adds no join and no second window: the same
    (ts, is_conv, event_id)-ordered frame carries BOTH the last touch
    type and its epoch-µs instant (the two last(ignorenulls) columns
    are null on exactly the same rows, so the pair stays consistent),
    and the cut is one integer subtraction per conversion row.

    Determinism: the gap test is exact integer microseconds on both
    engines (86 400 000 000 µs = 24 h); everything else inherits the
    base op's discipline (total order, DECIMAL-exact sums, 6dp,
    signed-zero canon)."""
    base = _attribution_base(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(), F.col("is_conv").asc(), F.col("event_id").asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tol_us = int(_ATTR_TOL_US)  # runtime module read (mutation-pinned)
    conv = (
        base.withColumn("lt", F.last("touch_type", ignorenulls=True).over(w))
        .withColumn("ltus", F.last("touch_tus", ignorenulls=True).over(w))
        .where(F.col("is_conv") == 1)
        .select(
            F.when(
                F.col("ltus").isNotNull()
                & (F.col("tus") - F.col("ltus") <= F.lit(tol_us)),
                F.col("lt"),
            )
            .otherwise(F.lit("unattributed"))
            .alias("channel"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
    )
    return (
        conv.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("conversions"),
            F.sum("v").alias("sv"),
        )
        .select(
            "channel",
            "conversions",
            (F.round(F.col("sv").cast("double"), 6) + F.lit(0.0)).alias(
                "total_value"
            ),
            (
                F.round(
                    F.col("sv").cast("double")
                    / F.col("conversions").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_value"),
        )
    )

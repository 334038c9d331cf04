"""§2.9 Streaming-semantics operators, batch-checked.

The ``events`` table is the stream stand-in (TESTDATA.md). Every op here
uses only streaming-capable expressions — ``F.window``,
``F.session_window``, event-time bucketing — so the identical code runs
under ``readStream`` (copy_databasetables_spark/streaming/ wires that up;
tests assert batch/stream equivalence with an availableNow trigger).

Watermark-dependent forms (``withWatermark``,
``dropDuplicatesWithinWatermark``) only make sense on an unbounded
source, so they live in streaming/jobs.py; the batch analogs here pin
the *semantics* against the SQL oracle.

Scale notes: event-time windowed aggregation shuffles on (window, keys) —
at 100 TB the window key multiplies cardinality, which is exactly what
keeps state per reducer bounded. Session windows shuffle on user_id and
merge per key; skewed users are the risk and AQE skew-split the answer.

All window boundaries are projected as epoch-microsecond BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register
from copy_databasetables_spark.operators._helpers import davg, dsum, us

_US_15MIN = 900_000_000
_US_HOUR = 3_600_000_000
_US_10MIN = 600_000_000


@register(
    "q_stream_tumbling",
    oracle=f"""
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS win_start_us,
           epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) + {_US_HOUR} AS win_end_us,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows × event_type (streaming-ready groupBy)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            us("win.start", "win_start_us"),
            us("win.end", "win_end_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle=f"""
    WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
         g AS (SELECT CAST(UNNEST([0, 1, 2, 3]) AS BIGINT) AS k)
    SELECT (ts_us // {_US_15MIN}) * {_US_15MIN} - k * {_US_15MIN} AS win_start_us,
           (ts_us // {_US_15MIN}) * {_US_15MIN} - k * {_US_15MIN} + {_US_HOUR} AS win_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM e CROSS JOIN g
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min: each event lands in 4
    overlapping windows (Spark's Expand). The oracle reconstructs the
    same 4 windows arithmetically: start = floor(ts/15min)*15min - k*15min,
    k ∈ 0..3 — every such window satisfies start <= ts < start + 1h."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            us("win.start", "win_start_us"),
            us("win.end", "win_end_us"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_session",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN ts_us - lag(ts_us) OVER w > {_US_HOUR // 2} OR
                       lag(ts_us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC)
    ),
    sessions AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ASC
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + {_US_HOUR // 2} AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (``F.session_window`` works in batch groupBy since Spark 3.2; the
    same expression is the stateful streaming operator). Session end is
    CLOSED: an event at exactly last_ts + gap merges into the session
    (probed on Spark 4.1.2 — tests/test_operators.py pins it), so the
    oracle's gaps-and-islands flags a new session only when the gap is
    strictly greater than 30 minutes."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            us("win.start", "session_start_us"),
            us("win.end", "session_end_us"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_dedup",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id, ts_us AS first_ts_us
    FROM (
      SELECT user_id, event_type, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per (user_id, event_type) — the deterministic
    batch analog of streaming ``dropDuplicatesWithinWatermark`` (which
    keeps the first arrival per key within the watermark). Implemented
    as window rn==1 with a total (ts, event_id) order rather than
    ``dropDuplicates`` because the latter keeps an *arbitrary* row —
    fine in a stream, unhashable in a differential check."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            us("ts", "first_ts_us"),
        )
    )


@register(
    "q_stream_late_data",
    oracle=f"""
    WITH e AS (
      SELECT epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS win_start_us,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ),
    wm AS (
      SELECT *, MAX(ts_us) OVER (PARTITION BY win_start_us) - {_US_10MIN} AS watermark_us
      FROM e
    )
    SELECT win_start_us,
           COUNT(*) FILTER (WHERE ts_us < watermark_us) AS n_late,
           COUNT(*) FILTER (WHERE ts_us >= watermark_us) AS n_on_time
    FROM wm
    GROUP BY win_start_us
    """,
)
def q_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-level late-data classification: within each 1-hour
    window, the watermark is max(event time) − 10 min; events older than
    that would be dropped by ``withWatermark("ts", "10 minutes")`` if
    they arrived last."""
    ev = load_table(spark, sf_dir, "events").select(
        us(F.date_trunc("hour", F.col("ts")), "win_start_us"), us("ts", "ts_us")
    )
    w = Window.partitionBy("win_start_us")
    wm = F.max("ts_us").over(w) - F.lit(_US_10MIN)
    return (
        ev.withColumn("watermark_us", wm)
        .groupBy("win_start_us")
        .agg(
            F.count_if(F.col("ts_us") < F.col("watermark_us")).alias("n_late"),
            F.count_if(F.col("ts_us") >= F.col("watermark_us")).alias("n_on_time"),
        )
    )


@register(
    "q_stream_rate_agg",
    oracle="""
    SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
           user_id,
           COUNT(*) AS n_events,
           (CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)) AS avg_value,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_rate_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily event rate — the aggregation shape of a streaming
    rate monitor, checked in batch."""
    ev = load_table(spark, sf_dir, "events")
    from copy_databasetables_spark.operators._helpers import ds

    return ev.groupBy(
        ds(F.date_trunc("day", F.col("ts")), "day"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        davg("value", "avg_value"),
        F.count_distinct("event_type").alias("n_types"),
    )


@register(
    "q_stream_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_ts_us,
           epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us
    FROM events p
    JOIN events c ON c.user_id = p.user_id
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      AND c.ts < p.ts
      AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch-checked (r10 — the §2.9 join
    family's hash-checked oracle twin): every purchase paired with the
    same user's clicks in the preceding hour — the attribution shape.
    The REAL streaming form already exists and is readStream-tested
    (streaming/jobs.py:purchase_click_join_stream, watermarks on both
    sides so click state evicts once the purchase watermark passes the
    range); this registry twin pins the join SEMANTICS against the
    DuckDB oracle, which the driver gate can hash — the PREDICATE IS
    SHARED CODE (streaming/jobs.py:purchase_click_cond, same window
    constant and boundary operators), so a window or inclusivity
    regression in the streaming job fails this hash row. The condition
    (equi user key + bounded event-time range) is exactly what lets
    the streaming engine bound state. Batch execution: one shuffle of
    each filtered side on user_id; the range rides as a residual.
    Skewed hot users are the hazard at 100 TB — AQE skew-split applies
    since the join is a plain sort-merge on the key."""
    from copy_databasetables_spark.streaming.jobs import purchase_click_cond

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            purchase_click_cond(
                F.col("user_id"),
                F.col("p_ts"),
                F.col("c_user_id"),
                F.col("c_ts"),
            ),
        )
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            us("p_ts", "purchase_ts_us"),
            us("c_ts", "click_ts_us"),
        )
    )


@register(
    "q_stream_join_left",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_ts_us,
           epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts < p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def q_stream_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join, batch-checked (r11):
    every purchase with its preceding-hour clicks, OR a NULL click row
    when none exist — the attribution shape that also reports
    UNATTRIBUTED conversions. The predicate is the SAME shared code as
    q_stream_join (streaming/jobs.py:purchase_click_cond), and the
    readStream twin is purchase_click_left_join_stream — the
    state-eviction-hard case: an unmatched purchase may only emit once
    the click-side watermark seals its whole lookback window, so NULL
    rows trail matched rows by bounded staleness (watermark contract
    pinned in tests/test_streaming.py). Batch execution: the outer
    join shuffles both filtered sides on user_id with the range as a
    residual — identical wire cost to the inner form; the NULL
    preservation is free. The oracle's LEFT JOIN keeps the range
    conditions in ON (a WHERE would collapse it to inner — the same
    trap Q13 pins)."""
    from copy_databasetables_spark.streaming.jobs import purchase_click_cond

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            purchase_click_cond(
                F.col("user_id"),
                F.col("p_ts"),
                F.col("c_user_id"),
                F.col("c_ts"),
            ),
            "left",
        )
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            us("p_ts", "purchase_ts_us"),
            us("c_ts", "click_ts_us"),
        )
    )

"""Time-series resampling operators (beyond-survey coverage, r9).

Regularizing irregular event streams onto a fixed grid is the step
every monitoring/feature pipeline runs before windowed models, and the
one shape the §2 window inventory (lead/lag, moving averages, range
frames) doesn't cover: those operate ON observed rows, these create the
MISSING rows. Two canonical fills:

- ``q_ts_resample_ffill`` — hourly grid per user over the user's own
  [min(ts), max(ts)] span; each grid cell carries the LAST observed
  ``value`` in that hour (deterministic tie-break ts DESC, event_id
  DESC), forward-filled across empty cells (step/sample-and-hold
  semantics — the right fill for state-like series such as balances).
- ``q_ts_interpolate`` — same grid, linear interpolation between the
  nearest observation at-or-before and strictly-after each grid
  instant (the right fill for continuously-varying measurements);
  flat extrapolation past the last observation, back-fill before the
  first in-hour observation.

Scale notes (100 TB): both ops shuffle events ONCE on user_id; the
spine is generated from a per-user (min, max) aggregate — two rows per
key — exploded executor-side, so the grid never exists on the driver
and its size is bounded by span/step per key, not by the event count.
The fills are single-pass window functions over (user, grid) — state
is one (ts, value) pair per partition, and the spine join is
co-partitioned with the aggregate that produced it (AQE keeps it
exchange-free). Skew: a user with a pathological span would inflate
its OWN spine only; cap spans upstream if grids must be bounded.
Interpolation uses the union-spine trick — observations and grid rows
interleaved in ONE ordered window pass — instead of a per-grid-row
range join against the events table, which would be O(grid × events)
per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register
from copy_databasetables_spark.operators._helpers import us


def _hourly_spine(ev: DataFrame) -> DataFrame:
    """Per-user hourly grid [user_id, grid_ts] spanning the user's own
    observed range (hour-truncated ends, inclusive). Generated from a
    2-column aggregate and exploded executor-side — never collected."""
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    return bounds.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("interval 1 hour"))
        ).alias("grid_ts"),
    )


@register(
    "q_ts_resample_ffill",
    oracle="""
    WITH b AS (
      SELECT user_id,
             date_trunc('hour', MIN(ts)) AS t0,
             date_trunc('hour', MAX(ts)) AS t1
      FROM events GROUP BY user_id),
    g AS (
      SELECT user_id, UNNEST(generate_series(t0, t1, INTERVAL 1 HOUR)) AS grid_ts
      FROM b),
    h AS (
      SELECT user_id, date_trunc('hour', ts) AS hr, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events),
    j AS (
      SELECT g.user_id, g.grid_ts, h.value
      FROM g LEFT JOIN h
        ON h.user_id = g.user_id AND h.hr = g.grid_ts AND h.rn = 1)
    SELECT user_id, epoch_us(grid_ts) AS grid_us,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY grid_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
    FROM j
    """,
)
def q_ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of each user's event series with forward fill.

    Three stages, all keyed on user_id (one shuffle, reused): (1) the
    per-user hourly spine from a (min, max) aggregate; (2) the hour's
    closing value — row_number()=1 over (user, hour) ordered ts DESC,
    event_id DESC, so two events in one microsecond still pick a
    deterministic winner; (3) ``last(value, ignorenulls=True)`` over
    the grid ordering. The first grid cell is the hour of the user's
    first event, so the fill never emits NULL. No interpolation — this
    is sample-and-hold (step) semantics; see q_ts_interpolate for the
    linear variant."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_id"
    )
    spine = _hourly_spine(ev)
    w_pick = Window.partitionBy("user_id", "hr").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hourly = (
        ev.withColumn("hr", F.date_trunc("hour", F.col("ts")))
        .withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("hr").alias("grid_ts"), "value")
    )
    joined = spine.join(hourly, ["user_id", "grid_ts"], "left")
    w_ff = (
        Window.partitionBy("user_id")
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        us("grid_ts", "grid_us"),
        F.last("value", ignorenulls=True).over(w_ff).alias("value_ffill"),
    )


@register(
    "q_ts_interpolate",
    oracle="""
    WITH b AS (
      SELECT user_id,
             date_trunc('hour', MIN(ts)) AS t0,
             date_trunc('hour', MAX(ts)) AS t1
      FROM events GROUP BY user_id),
    g AS (
      SELECT user_id,
             UNNEST(generate_series(t0, t1, INTERVAL 1 HOUR)) AS pt,
             1 AS is_grid, NULL::DOUBLE AS v
      FROM b),
    o AS (
      SELECT user_id, ts AS pt, 0 AS is_grid, value AS v
      FROM events),
    u AS (SELECT * FROM g UNION ALL SELECT * FROM o),
    w AS (
      SELECT user_id, pt, is_grid,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY pt, is_grid, v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN epoch_us(pt) END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY pt, is_grid, v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt_us,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY pt, is_grid, v
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN epoch_us(pt) END
                         IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY pt, is_grid, v
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt_us
      FROM u)
    SELECT user_id, epoch_us(pt) AS grid_us,
           round(CASE
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (CAST(epoch_us(pt) - pt_us AS DOUBLE)
                                 / CAST(nt_us - pt_us AS DOUBLE))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv
           END, 4) AS value_interp
    FROM w WHERE is_grid = 1
    """,
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR interpolation between observations.

    Union-spine pattern: grid instants (v=NULL, is_grid=1) and raw
    observations (is_grid=0) interleave in one per-user ordering
    (pt, is_grid, v) — observations at an exact grid instant sort
    BEFORE the grid row, so they count as the at-or-before neighbor.
    One window pass then yields, per grid row, the nearest observation
    at-or-before (``last(... ignorenulls)`` up to current) and strictly
    -after (``first(... ignorenulls)`` from 1 following); the linear
    blend is computed on epoch-microsecond BIGINTs cast to DOUBLE with
    the identical expression tree on both engines, rounded to 4
    decimals at the boundary (similarity.py's convention for derived
    floats). Ends: flat extrapolation after the last observation,
    back-fill before the first. The degenerate prev==next case cannot
    arise: the after-neighbor is STRICTLY after, so nt_us > pt_us
    always; a duplicate-ts pair straddling a grid instant resolves by
    the total ordering. Cost: sort-once window over |grid|+|events|
    rows per user — no range join, no per-grid-row probe."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    grid = _hourly_spine(ev).select(
        "user_id",
        F.col("grid_ts").alias("pt"),
        F.lit(1).alias("is_grid"),
        F.lit(None).cast("double").alias("v"),
    )
    obs = ev.select(
        "user_id",
        F.col("ts").alias("pt"),
        F.lit(0).alias("is_grid"),
        F.col("value").alias("v"),
    )
    u = grid.unionAll(obs)
    order = [F.col("pt"), F.col("is_grid"), F.col("v")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The after-neighbor via the REVERSED running frame (r16, guide
    # §1.2): the natural frame — first(... ignorenulls) over
    # (1 following, unbounded following) — is evaluated by Spark's
    # UnboundedFollowingWindowFunctionFrame, which re-aggregates the
    # whole remaining partition FOR EVERY ROW: O(rows²) per user
    # (measured ~445M frame-evals at sf0.1 ≈ 2.3 s of the op's 2.7 s).
    # Sorting the same keys descending and taking last(... ignorenulls)
    # over (unbounded preceding, -1) visits exactly the rows STRICTLY
    # AFTER the current one in ascending order, via the incremental
    # O(rows) running frame. Value-identical, not just equivalent: the
    # ordering (pt, is_grid, v) is total up to rows whose extracted
    # values (v, epoch(pt)) are themselves equal — v and pt ARE sort
    # keys — so tied-row order cannot change what is picked; Spark's
    # desc() places NULLs last, the exact mirror of asc()'s NULLs
    # first. Same exchange (same partitionBy), one extra in-partition
    # sort — O(n log n) replacing the O(n²) frame.
    rev = [F.col("pt").desc(), F.col("is_grid").desc(), F.col("v").desc()]
    w_next_rev = (
        Window.partitionBy("user_id")
        .orderBy(*rev)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t_us = F.unix_micros(F.col("pt").cast("timestamp"))
    obs_us = F.when(F.col("v").isNotNull(), t_us)
    staged = u.select(
        "user_id",
        "pt",
        "is_grid",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_us, ignorenulls=True).over(w_prev).alias("pt_us"),
        F.last("v", ignorenulls=True).over(w_next_rev).alias("nv"),
        F.last(obs_us, ignorenulls=True).over(w_next_rev).alias("nt_us"),
    ).where(F.col("is_grid") == 1)
    ratio = (t_us - F.col("pt_us")).cast("double") / (
        F.col("nt_us") - F.col("pt_us")
    ).cast("double")
    interp = F.when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.col("pv") + (F.col("nv") - F.col("pv")) * ratio,
    ).otherwise(F.coalesce(F.col("pv"), F.col("nv")))
    return staged.select(
        "user_id",
        us("pt", "grid_us"),
        F.round(interp, 4).alias("value_interp"),
    )


#: EWMA smoothing weight: s_t = α·x_t + β·s_{t-1}. β is precomputed
#: in PYTHON and embedded as the same literal on both engines: writing
#: "1.0 - α" in the SQL would evaluate in IEEE double on Spark but in
#: exact DECIMAL on DuckDB — one ulp apart, compounding ~1e-5 over a
#: 60-step fold (caught by the gate on entry). Runtime-read
#: (mutation-pinned in tests/test_oracle_sensitivity). The Spark body
#: re-derives β from α at call time so the pair can never desynchronize
#: under a runtime α change; _EWMA_BETA here exists only to bake the
#: import-time oracle literal.
_EWMA_ALPHA = 0.3
_EWMA_BETA = 1.0 - _EWMA_ALPHA


@register(
    "q_ts_ewma",
    oracle=f"""
    WITH h AS (
      SELECT user_id,
             epoch_us(date_trunc('hour', ts)) AS bucket_us,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_buckets,
             MAX(bucket_us) AS last_bucket_us,
             list_reduce(list(x ORDER BY bucket_us ASC),
                         (a, b) -> CAST({_EWMA_ALPHA} AS DOUBLE) * b
                                   + CAST({_EWMA_BETA!r} AS DOUBLE) * a)
               AS ewma
      FROM h GROUP BY user_id)
    SELECT user_id, n_buckets, last_bucket_us,
           (round(ewma, 6) + 0.0) AS ewma
    FROM s
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key exponentially-weighted moving average — the smoothed
    "current state" every monitoring/feature pipeline keeps per entity
    (the batch computation of exactly the state an
    applyInPandasWithState streaming job would carry): hourly bucket
    means per user, folded in time order through s_t = α·x_t +
    (1−α)·s_{t−1} with α={_EWMA_ALPHA}; one row per user with the
    final state, bucket count, and last bucket. Compose with
    q_ts_resample_ffill first when gap hours must decay the state
    (this op is as-observed: missing hours don't step the
    recurrence).

    Scale shape (100 TB): two key-hashed aggregates — (user, hour)
    bucket means (map-side partial), then one collect per user whose
    array is bounded by the user's SPAN IN HOURS, never the event
    count; the fold runs in-row in codegen. No window functions, no
    driver round-trip.

    Determinism: the closed form Σ α(1−α)^ⁿ⁻ⁱxᵢ via pow would differ
    across engines in the last ulp; the sequential fold is the SAME
    chain of IEEE mul/adds on both sides — Spark's aggregate() over
    the sort_array'd bucket series and DuckDB's list_reduce over
    list(... ORDER BY bucket) evaluate left-to-right with the first
    element as seed, so the result is bit-identical before the 6dp
    display rounding. Bucket means divide an exact DECIMAL numerator
    by an exact count; bucket keys are unique per user so the sort
    order is total."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    h = (
        ev.groupBy(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("x")
        )
        .select(
            "user_id",
            us("bucket", "bucket_us"),
            "x",
        )
    )
    a = float(_EWMA_ALPHA)
    series = F.expr(
        "transform(sort_array(collect_list(struct(bucket_us, x))), "
        "s -> s.x)"
    )
    # β derived from α AT CALL TIME (not the frozen import-time
    # _EWMA_BETA): a runtime reconfiguration of _EWMA_ALPHA alone must
    # never yield a fold with α+β != 1 — that's not an EWMA. Same
    # Python-double arithmetic as the oracle's baked literal, so the
    # unmutated pair is bit-identical.
    b = 1.0 - float(_EWMA_ALPHA)
    # element_at is 1-based like slice; bare xs[1] would be the SECOND
    # element (Spark bracket indexing is 0-based) — dropping the first
    # bucket and double-counting the second (caught by the gate on
    # entry: 2 of 15 smoke users moved at the 6th decimal).
    fold = F.expr(
        f"aggregate(slice(xs, 2, size(xs) - 1), element_at(xs, 1), "
        f"(acc, v) -> {a!r}D * v + {b!r}D * acc)"
    )
    return (
        h.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.max("bucket_us").alias("last_bucket_us"),
            series.alias("xs"),
        )
        .select(
            "user_id",
            "n_buckets",
            "last_bucket_us",
            F.round(fold, 6).alias("ewma"),
        )
    )

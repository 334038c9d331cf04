"""Batch/stream equivalence (SURVEY.md §5.2 item 5): the §2.9 operators
are written with streaming-capable expressions; these tests run the same
logic under readStream with an AvailableNow trigger and assert equality
with the batch result on identical input."""

from __future__ import annotations

from pyspark.sql import functions as F

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.streaming.jobs import (
    dedup_stream,
    read_events_stream,
    run_to_memory,
    tumbling_counts_stream,
)
from tests.conftest import SF_SMOKE


def test_stream_tumbling_equals_batch(spark):
    stream_out = run_to_memory(
        tumbling_counts_stream(read_events_stream(spark, SF_SMOKE)),
        "t_tumbling",
        mode="complete",
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("win.start").cast("timestamp")).alias("win_start_us"),
            "event_type",
            "n_events",
        )
    )
    assert stream_out.count() == batch.count()
    assert stream_out.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream_out).count() == 0


def test_stream_dedup_unique_ids(spark):
    out = run_to_memory(
        dedup_stream(read_events_stream(spark, SF_SMOKE)), "t_dedup", mode="append"
    )
    n = out.count()
    assert n == out.select("event_id").distinct().count()
    # event_id is unique in the source, so dedup must keep everything
    assert n == load_table(spark, SF_SMOKE, "events").count()


def test_stream_is_incremental(spark):
    """The file source must deliver multiple micro-batches (maxFilesPerTrigger
    honored) — i.e. the pipeline really executed incrementally."""
    stream = tumbling_counts_stream(read_events_stream(spark, SF_SMOKE))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_progress")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 1
    assert sum(p["numInputRows"] for p in q.recentProgress) == 1000


def test_stateful_apply_in_pandas_equals_batch(spark):
    """applyInPandasWithState: after draining the bounded stream, each
    user's final (count, total) state must equal the batch aggregate —
    i.e. incremental state updates across micro-batches lose nothing."""
    from copy_databasetables_spark.streaming.jobs import user_totals_stateful_stream

    batches = []
    q = (
        user_totals_stateful_stream(read_events_stream(spark, SF_SMOKE))
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: batches.append((bid, df.toPandas())))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per user wins
    final = {}
    for bid, pdf in sorted(batches, key=lambda x: x[0]):
        for r in pdf.itertuples(index=False):
            final[r.user_id] = (r.n_events, r.total_value)
    expected = {
        r["user_id"]: (r["n"], r["t"])
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(final) == set(expected)
    for uid, (n, t) in final.items():
        en, et = expected[uid]
        assert n == en
        assert abs(t - et) < 1e-6 * max(1.0, abs(et))
    assert len(batches) > 1  # state really carried across micro-batches


def test_stream_stream_interval_join_equals_batch(spark):
    """Stream-stream join with watermarks on both sides: the incremental
    result over micro-batches must equal the batch interval join
    (q_join_interval's shape) on the same input."""
    from copy_databasetables_spark.streaming.jobs import (
        purchase_click_join_stream,
        read_events_stream,
        run_to_memory,
    )

    out = run_to_memory(
        purchase_click_join_stream(read_events_stream(spark, SF_SMOKE)),
        "t_ssjoin",
        mode="append",
    )
    ev = load_table(spark, SF_SMOKE, "events")
    p = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    k = ev.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("k_user"),
        F.col("ts").alias("k_ts"),
    )
    batch = p.join(
        k,
        (F.col("k_user") == F.col("user_id"))
        & (F.col("k_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("k_ts") < F.col("p_ts")),
    ).select("purchase_id", "click_id", "user_id")
    assert out.count() == batch.count() > 0
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_stream_session_windows_equal_batch(spark):
    """Session windows under incremental execution: micro-batched
    sessions (including cross-batch merges) must equal the batch
    session_window result on the same input."""
    from copy_databasetables_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory,
        session_counts_stream,
    )

    out = run_to_memory(
        session_counts_stream(read_events_stream(spark, SF_SMOKE)),
        "t_sessions",
        mode="complete",
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("win.start").cast("timestamp")).alias("session_start_us"),
            F.unix_micros(F.col("win.end").cast("timestamp")).alias("session_end_us"),
            "n_events",
        )
    )
    assert out.count() == batch.count() > 0
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_foreach_batch_replay_is_idempotent(spark):
    """Exactly-once through the JDBC foreachBatch sink: replaying a
    micro-batch with its original batch_id (what Structured Streaming
    does after a failure/restart) must not duplicate rows — the
    delete-then-insert keyed on _batch_id converges. Runs the real
    stream into embedded Derby, then re-invokes the sink with a batch's
    own rows and id."""
    import os

    from copy_databasetables_spark.sources.jdbc import JdbcReadSpec, JdbcWriteSpec
    from copy_databasetables_spark.streaming.jobs import (
        foreach_batch_jdbc_sink_idempotent,
        read_events_stream,
    )

    url = (
        f"jdbc:derby:/tmp/spark_graft_derby/p{os.getpid()}_stream_sink;create=true"
    )
    spec = JdbcWriteSpec(url=url, table="stream_events", mode="append", batchsize=5000)
    sink = foreach_batch_jdbc_sink_idempotent(spec)

    stream = read_events_stream(spark, SF_SMOKE).select(
        "event_id", "user_id", "event_type"
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()

    back = JdbcReadSpec(url=url, table="stream_events").load(spark)
    n_total = back.count()
    n_source = load_table(spark, SF_SMOKE, "events").count()
    assert n_total == n_source  # every event landed exactly once
    batch_ids = [r["_batch_id"] for r in back.select("_batch_id").distinct().collect()]
    assert len(batch_ids) > 1  # really incremental: multiple micro-batches

    # Replay the largest batch with its ORIGINAL id and data — the
    # at-least-once delivery contract — and assert convergence.
    replay_id = max(batch_ids)
    lazy = back.where(F.col("_batch_id") == replay_id).select(
        "event_id", "user_id", "event_type"
    )
    # materialize: a real replay re-delivers the batch from the SOURCE;
    # a lazy re-read of the sink table would see its own delete.
    replay_rows = spark.createDataFrame(lazy.collect(), lazy.schema)
    n_batch = replay_rows.count()
    assert n_batch > 0
    sink(replay_rows, replay_id)  # first replay
    sink(replay_rows, replay_id)  # and again — still converges
    assert JdbcReadSpec(url=url, table="stream_events").load(spark).count() == n_total
    assert (
        JdbcReadSpec(url=url, table="stream_events")
        .load(spark)
        .where(F.col("_batch_id") == replay_id)
        .count()
        == n_batch
    )


def test_stream_static_join_equals_batch(spark):
    """Stream-static enrichment: per-batch join against a static dim +
    complete-mode aggregate must equal the same join/agg run in batch."""
    from copy_databasetables_spark.streaming.jobs import (
        read_events_stream,
        tier_counts_stream_static,
        user_tier_dim,
    )

    dim = user_tier_dim(spark, SF_SMOKE)
    stream_out = run_to_memory(
        tier_counts_stream_static(read_events_stream(spark, SF_SMOKE), dim),
        "t_tier",
        mode="complete",
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .join(dim, F.col("user_id") == dim.dim_user_id)
        .groupBy("tier", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert stream_out.count() == batch.count()
    assert stream_out.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream_out).count() == 0


def _staged_chunks(tmp_path, n_chunks=4):
    """Slice the smoke events parquet into n type-preserving chunks
    under tmp_path (NOT the shared staging dir — these tests control
    file arrival themselves to simulate a growing source)."""
    import os

    import pyarrow.parquet as pq

    from copy_databasetables_spark.io import table_path

    table = pq.read_table(table_path(SF_SMOKE, "events"))
    step = max(1, (table.num_rows + n_chunks - 1) // n_chunks)
    chunks = []
    for i in range(n_chunks):
        p = os.path.join(str(tmp_path), f"chunk-{i}.parquet")
        pq.write_table(table.slice(i * step, step), p, version="2.6",
                       coerce_timestamps=None)
        chunks.append(p)
    return chunks, table.num_rows


def _events_stream_from_dir(spark, src_dir):
    from copy_databasetables_spark.io import events_read_schema, events_ts_kind, table_path
    from copy_databasetables_spark.session import configure_session

    configure_session(spark)
    src = table_path(SF_SMOKE, "events")
    raw = (
        spark.readStream.schema(events_read_schema(src))
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    if events_ts_kind(src) == "long":
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _events_batch_from_files(spark, paths):
    """Batch-read specific chunk files with the SAME ts normalization the
    streaming reader applies, so stream-vs-batch comparisons see
    identical event times regardless of the testdata's ts encoding."""
    from copy_databasetables_spark.io import (
        events_read_schema,
        events_ts_kind,
        table_path,
    )

    src = table_path(SF_SMOKE, "events")
    raw = spark.read.schema(events_read_schema(src)).parquet(*paths)
    if events_ts_kind(src) == "long":
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def test_incremental_session_state_every_batch(spark, tmp_path):
    """≥3-micro-batch incremental state (VERDICT r8 item 7): with
    ``maxFilesPerTrigger=1`` over a 4-file source, a complete-mode
    session-window aggregation must, after EVERY micro-batch, equal the
    batch ``session_window`` result over exactly the files processed so
    far. This checks the state store incrementally at each step —
    including cross-batch session MERGES, since the file slices split
    users' event streams mid-session — not just the final answer."""
    import os
    import shutil
    import time as _time

    from copy_databasetables_spark.streaming.jobs import session_counts_stream

    chunks, n_total = _staged_chunks(tmp_path)
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    # strictly increasing mtimes pin the FileStreamSource processing
    # order to chunk order, making "the prefix after batch i" well-defined
    now = _time.time()
    staged = []
    for i, c in enumerate(chunks):
        dst = os.path.join(src_dir, os.path.basename(c))
        shutil.copy(c, dst)
        os.utime(dst, (now + i, now + i))
        staged.append(dst)

    captured: list = []
    q = (
        session_counts_stream(_events_stream_from_dir(spark, src_dir))
        .writeStream.foreachBatch(
            lambda df, bid: captured.append((bid, df.collect()))
        )
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # pinned counts: exactly one micro-batch per file, all rows delivered
    assert len(captured) == len(chunks) == 4
    progress = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"]]
    assert len(progress) == 4
    assert sum(progress) == n_total == 1000

    for i, (_bid, rows) in enumerate(sorted(captured, key=lambda x: x[0])):
        expect = {
            (r["user_id"], r["session_start_us"], r["session_end_us"]): r["n_events"]
            for r in (
                _events_batch_from_files(spark, staged[: i + 1])
                .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
                .agg(F.count(F.lit(1)).alias("n_events"))
                .select(
                    "user_id",
                    F.unix_micros(F.col("win.start").cast("timestamp")).alias(
                        "session_start_us"
                    ),
                    F.unix_micros(F.col("win.end").cast("timestamp")).alias(
                        "session_end_us"
                    ),
                    "n_events",
                )
            ).collect()
        }
        got = {
            (r["user_id"], r["session_start_us"], r["session_end_us"]): r["n_events"]
            for r in rows
        }
        assert got == expect, f"micro-batch {i}: incremental state diverged"


def test_restart_from_checkpoint_exactly_once_file_sink(spark, tmp_path):
    """Kill-and-resume over a GROWING file source (VERDICT r7 item 5):
    run 1 drains the first half with AvailableNow and stops (the
    planned 'kill' point of a bounded trigger); more files land; run 2
    restarts from the SAME checkpoint. The restarted query must (a)
    read ONLY the new files — the checkpointed source offsets are
    honored, so nothing is reprocessed — and (b) leave the transactional
    file sink holding every source row exactly once: no loss, no
    dupes."""
    import os
    import shutil

    chunks, n_total = _staged_chunks(tmp_path)
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(src_dir)
    for c in chunks[:2]:
        shutil.copy(c, src_dir)

    def run_once():
        q = (
            _events_stream_from_dir(spark, src_dir)
            .select("event_id", "user_id", "ts")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    run_once()
    n_first = spark.read.parquet(out_dir).count()
    assert 0 < n_first < n_total

    for c in chunks[2:]:
        shutil.copy(c, src_dir)
    q2 = run_once()

    # (a) the restart read only the NEW files
    replayed = sum(p["numInputRows"] for p in q2.recentProgress)
    assert replayed == n_total - n_first
    # (b) exactly-once end to end: every source row once, none twice
    out = spark.read.parquet(out_dir)
    assert out.count() == n_total
    assert out.select("event_id").distinct().count() == n_total


def test_restart_restores_aggregation_state(spark, tmp_path):
    """Restart-from-checkpoint must RESTORE operator state, not just
    source offsets: a complete-mode tumbling aggregation drains half
    the source, stops, and restarts onto the grown source. The final
    output must equal the batch aggregate over ALL rows even though the
    restarted run only READ the new files — the first half's counts can
    only have come out of the recovered state store."""
    import os
    import shutil

    from copy_databasetables_spark.streaming.jobs import tumbling_counts_stream

    chunks, n_total = _staged_chunks(tmp_path)
    src_dir = str(tmp_path / "src")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(src_dir)
    for c in chunks[:2]:
        shutil.copy(c, src_dir)

    captured: list = []

    def run_once():
        def capture(batch_df, batch_id):
            captured.append(batch_df.collect())

        q = (
            tumbling_counts_stream(_events_stream_from_dir(spark, src_dir))
            .writeStream.foreachBatch(capture)
            .outputMode("complete")
            .option("checkpointLocation", ck_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    run_once()
    n_run1 = len(captured)
    assert n_run1 >= 1

    for c in chunks[2:]:
        shutil.copy(c, src_dir)
    q2 = run_once()

    replayed = sum(p["numInputRows"] for p in q2.recentProgress)
    assert 0 < replayed < n_total  # only the new files were read

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("win.start").cast("timestamp")).alias("win_start_us"),
            "event_type",
            "n_events",
        )
    )
    final = {(r["win_start_us"], r["event_type"]): r["n_events"]
             for r in captured[-1]}
    expect = {(r["win_start_us"], r["event_type"]): r["n_events"]
              for r in batch.collect()}
    assert final == expect


def test_stream_stream_left_join_outer_semantics(spark):
    """LEFT OUTER stream-stream interval join under incremental
    execution (purchase_click_left_join_stream). The outer contract:

    1. The MATCHED subset is exactly the batch inner join — outer
       state handling must not duplicate or drop a matched pair.
    2. Every streamed NULL row is a true batch NULL (no purchase with
       clicks is ever reported unattributed — the correctness property
       outer state eviction could violate by emitting early).
    3. NULL emission is WATERMARK-SEALED and therefore a clean
       event-time cut: the withheld-at-termination purchases (batch
       NULLs the bounded run never emitted) are exactly a SUFFIX in
       p_ts — everything withheld is newer than everything emitted.
       AvailableNow ends the query with the final watermark short of
       max event time, so a non-empty withheld suffix is the
       documented contract, not data loss (a restart with more data
       emits them)."""
    from copy_databasetables_spark.streaming.jobs import (
        purchase_click_left_join_stream,
        read_events_stream,
        run_to_memory,
    )

    out = run_to_memory(
        purchase_click_left_join_stream(read_events_stream(spark, SF_SMOKE)),
        "t_lsjoin",
        mode="append",
    )
    ev = load_table(spark, SF_SMOKE, "events")
    p = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    k = ev.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("k_user"),
        F.col("ts").alias("k_ts"),
    )
    batch = p.join(
        k,
        (F.col("k_user") == F.col("user_id"))
        & (F.col("k_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("k_ts") < F.col("p_ts")),
        "left",
    ).select("purchase_id", "click_id", "user_id")

    # 1. matched subset identical
    om = out.where("click_id IS NOT NULL")
    bm = batch.where("click_id IS NOT NULL")
    assert om.count() == bm.count() > 0
    assert om.exceptAll(bm).count() == 0 and bm.exceptAll(om).count() == 0

    # 2. streamed NULLs are true batch NULLs
    on = out.where("click_id IS NULL").select("purchase_id")
    bn = batch.where("click_id IS NULL").select("purchase_id")
    assert on.count() > 0
    assert on.exceptAll(bn).count() == 0

    # 3. the withheld set is an event-time suffix
    emitted = on.join(p, "purchase_id").agg(F.max("p_ts")).first()[0]
    withheld = bn.exceptAll(on).join(p, "purchase_id")
    if withheld.count():
        assert withheld.agg(F.min("p_ts")).first()[0] > emitted

"""Benchmark runner — prints ONE JSON line with per-query wall times.

Protocol (BASELINE.md): one warm SparkSession for the whole run; session
startup and first-query JVM/codegen warmup are excluded (a throwaway
warmup query runs first); each headline query is executed to completion
against the noop sink (full execution, no driver-side materialization
cost) and timed best-of-two.

    python bench.py                # $SPARK_GRAFT_SF_DIR (default sf0.1)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py

Output: {"metric": "total_query_sec", "value": N, "unit": "sec",
         "queries": {name: sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from copy_databasetables_spark import get_spark, operators  # noqa: E402
from copy_databasetables_spark.operators._helpers import free_ckpts  # noqa: E402

#: Headline queries: the flagship + one representative per operator
#: family (scan, copy, join, window, streaming, dedup, LSH, ANN, text),
#: plus the round-3 additions the verdict flagged as a bench blind spot
#: (dedup_cluster — the gate's most expensive query, iterative;
#: decontaminate / lm_score / sessionize — the heaviest new pipeline ops).
HEADLINE = [
    "q_agg_group",
    "q_agg_global",
    "q_join_multi_star",
    "q_join_broadcast",
    "q_join_asof",
    "q_win_topk_per_group",
    "q_stream_tumbling",
    "q_stream_session",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_cluster",
    "q_sim_topk",
    # r6: the bucketed 100 TB scale paths, benched against their exact
    # twins (q_dedup_embed / q_sim_topk brute-force) so the scale story
    # has wall-time rows, not just plan tests
    "q_dedup_embed",
    "q_dedup_embed_lsh",
    "q_dedup_cluster_lsh",
    "q_sim_ivf",
    # r7: the corpus-scaled production paths benched beside their
    # fixed-parameter twins (embed_lsh and ivf above)
    "q_dedup_embed_lsh_scaled",
    "q_sim_ivf_kscaled",
    # r8: the deployment shape of the better index — sqrt-n centroids
    # built once, persisted, probed from the read-back; benched beside
    # the in-plan kscaled twin so the amortization trade stays measured
    "q_sim_ivf_kscaled_persisted",
    # late r6: the PQ memory path (32x smaller resident index than
    # brute-force float vectors) and the bloom runtime-filter join
    "q_sim_pq",
    "q_sim_pq_rerank",
    "q_join_bloom_prune",
    # r6 continuation: BM25 lexical retrieval, filtered ANN, and the
    # iterative k-means trainer — the three ops added after the matrix
    # pin, benched from day one
    "q_text_bm25",
    "q_sim_hybrid",
    "q_emb_kmeans",
    "q_text_tfidf",
    "q_text_lm_score",
    "q_sessionize",
    "q_decontaminate",
    "q_pipeline_e2e",
    "copy_table_partitioned",
    # late r7: the span-removal half of exact-substring dedup — the
    # corpus REWRITE op (explode → hash join → position-exact rebuild),
    # benched from day one
    "q_text_strip_spans",
    # r9 (VERDICT r8 item 3): the heavy ops that previously had NO
    # tracked wall-time row, so a cost regression there was invisible
    # between rounds. Expected magnitudes at sf0.1 are pinned in
    # BASELINE.md §"Heavy-op magnitudes".
    "q_text_strip_spans_keep1",
    "q_dedup_substring",
    "q_graph_pagerank",
    "q_sim_hybrid_ivf",
    # PROTOCOL NOTE (BASELINE.md §Round-9 heavy-op magnitudes):
    # q_dedup_lsh_recall is an AUDIT op that computes exact all-pairs
    # ground truth to measure LSH recall — quadratic in corpus size BY
    # DESIGN (expected alpha ~2 per 10x). Its wall time growing across
    # SFs is the op working as specified, not a regression; adjudicate
    # it only against same-SF calibrated history.
    "q_dedup_lsh_recall",
    # r9 additions, benched from day one: RRF hybrid fusion and the
    # minhash estimator audit (10x stress rows in SCALE.md §r9)
    "q_sim_rrf",
    "q_dedup_minhash_est",
    # r9 continuation: the heaviest of the new ops — triangle counting
    # over the near-dup graph (3-way self-join), the union-spine linear
    # interpolation (the costlier time-series fill), and the Q18
    # composite (the most join+agg-intensive TPC-H shape added)
    "q_graph_triangles",
    "q_ts_interpolate",
    "q_tpch_q18",
    # r10: the correlated-subquery composite (decorrelated two-pass
    # plan) and the widest composite (Q8: seven joins around one fact),
    # benched from day one
    "q_tpch_q17",
    "q_tpch_q8",
    # r11: the two heaviest of the six composites that completed TPC-H
    # coverage — Q21 (EXISTS + NOT-EXISTS double self-probe: three
    # lineitem legs on one l_orderkey partitioning) and Q9 (profit
    # decomposition over the derived-cost relation: the expr-heaviest
    # join tree, ~3 fact shuffles). Standalone warm best-of-3 measured
    # 2.45 s / 3.00 s at sf0.1 on entry (BASELINE.md §Round-11).
    "q_tpch_q21",
    "q_tpch_q9",
    # r12: the whitening transform (rewritten this round to the
    # zero-vec_id-shuffle plan) and its retrieval composition, benched
    # from day one. Entry bands pinned in BASELINE.md §Round-12.
    "q_emb_whitening",
    "q_sim_topk_whitened",
    # r12 continuation: the two heaviest of the five ops added after
    # the whitening pair — the composed FAISS-IVFPQ layout (benched
    # beside its q_sim_ivf / q_sim_pq halves) and all-but-the-top
    # dominant-direction removal (one-pass Gram + in-row transform,
    # benched beside its q_emb_top_eigvec substrate twin via the
    # whitening rows). Entry bands pinned in BASELINE.md §Round-12.
    "q_sim_ivf_pq",
    "q_emb_remove_top_pc",
    # r12 continuation 2: two-component PCA by deflation — the heaviest
    # r12 op (two iteration chains + the dual in-row projection), so it
    # gets a tracked row from day one (the r9 heavy-row-blind-spot
    # lesson). Entry band in BASELINE.md §Round-12 continuation.
    "q_emb_pca2",
    # r13: the four new ops, benched from day one — persisted IVFPQ
    # (build+persist+read-back+search), k-component block-PI PCA
    # (benched beside its serial-deflation twin q_emb_pca2), the
    # winnowing-sampled span dedup (benched beside q_dedup_substring),
    # and the BLAS projection twin of remove-top-pc (the measured
    # quantization-constant delta). Entry bands in BASELINE.md §Round-13.
    "q_sim_ivf_pq_persisted",
    "q_emb_pca_k",
    "q_dedup_substring_minimizer",
    "q_emb_remove_top_pc_fast",
    # r13 continuation: the lexical persisted-index counterpart,
    # benched beside its in-plan twin q_text_bm25
    "q_text_bm25_persisted",
    # r14: the four new ops, benched from day one — IVFPQ multiprobe
    # (the FAISS production default, benched beside q_sim_ivf_pq so the
    # nprobe cost is a measured delta), the count-min sketch rollup,
    # per-doc token entropy, and perceptual-hash image dedup. Entry
    # bands in BASELINE.md §Round-14.
    "q_sim_ivf_pq_multiprobe",
    "q_agg_countmin",
    "q_text_entropy",
    "q_multimodal_phash",
    # r14 continuation: the bigram LM scorer and the IVF recall audit
    # (quadratic-by-design at fixed probe fraction — the
    # q_dedup_lsh_recall adjudication rule applies)
    "q_text_lm_bigram",
    "q_sim_ivf_recall",
    # r14 continuation 2: the PSI drift monitor (one-pass fixed-bin
    # histogram; sub-second rule, 0.757 s standalone best-of-3 at
    # sf0.1 on entry)
    "q_emb_drift_psi",
    # r14 continuation 3: binary-quantization ANN (sign-bit sketch
    # scan + bounded exact rerank), benched beside its float twins
    # q_sim_topk / q_sim_quantized. Entry band in BASELINE.md §r14.
    "q_sim_binary_hamming",
    # r14 continuation 4: the Matryoshka truncation recall audit
    # (prefix-dim vs full-dim exact top-k), the dim-cut counterpart of
    # q_sim_ivf_recall. Entry band in BASELINE.md §r14.
    "q_emb_mrl_recall",
    # r14 continuation 5: the executable temperature mixture (epoch-
    # repeat materialization of q_mixture_weights). Entry band in
    # BASELINE.md §r14.
    "q_sample_epochs",
    # r14 continuation 6: PMI collocation mining (two key-hashed count
    # aggregates + TakeOrdered cut). Entry band in BASELINE.md §r14.
    "q_text_collocations",
    # r14 continuation 7: exact mergeable higher moments (8 DECIMAL
    # power sums in one two-phase aggregate — the deliberate exactness
    # tax is the op's documented constant). Entry band in §r14.
    "q_agg_moments",
    # r14 continuation 8: energy-VAD segmentation (two chained
    # mapInPandas stages, zero exchanges — the islands fan-in is
    # Arrow-batch-local). Entry band in §r14.
    "q_multimodal_wav_vad",
    # r14 continuation 9: per-key EWMA state (sequential in-row fold
    # over span-bounded bucket arrays). Entry band in §r14.
    "q_ts_ewma",
    # r14 continuation 10: nearest-centroid classification (O(L) per
    # vector vs q_knn_label's O(n); 1-row centroid-book broadcast,
    # in-row argmax). Entry band in §r14.
    "q_emb_centroid_classify",
    # r14 continuation 11: the event-stream Markov transition table
    # (one user shuffle, type-bounded tail). Entry band in §r14.
    "q_events_transitions",
    # r14 continuation 12: the binary-sketch recall audit (standing
    # checked recall@k of q_sim_binary_hamming vs exact; audit-cost
    # rule). Entry: sub-second protocol row.
    "q_sim_binary_recall",
    # r14 continuation 13: last-touch attribution (carry-forward window
    # instead of the naive as-of self-join; one user_id shuffle,
    # channel-bounded tail). Entry band in §r14.
    "q_events_attribution",
    # r14 continuation 14: the 24h-lookback variant (same single-window
    # shape; the cut is one integer subtraction). Entry band in §r14.
    "q_events_attribution_tolerance",
    # r15: the pigeonhole-bucketed binary ANN search leg, benched
    # beside its flat audit twin q_sim_binary_hamming so the
    # bucket-join-vs-nested-loop cost split is a measured delta.
    # Entry band in BASELINE.md §Round-15.
    "q_sim_binary_bucketed",
]

#: best-of count, THE SAME for every benched query (flagship included):
#: asymmetric sampling would bias whichever query gets more draws of the
#: min-statistic downward relative to the rest. The count is reported in
#: the JSON so numbers are comparable across rounds.
_RUNS = 4


def execute(df) -> None:
    """Run the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def _flagship_protocol(spark, queries, sf_dir: str) -> dict:
    """Protocol-matched flagship measurements against BASELINE.md's
    PySpark row (0.14 s, warm ``collect()``, plain-double aggregates).

    The headline ``q_agg_group`` number is NOT directly comparable to
    that row: it pays (a) the noop-sink job instead of a bare collect
    and (b) the scaled-int64 exactness tax that makes the sums
    hash-stable cross-engine. This probe removes both mismatches — same
    collect sink, and a plain-double variant with the baseline's exact
    aggregate semantics — so the 2× budget can be judged
    apples-to-apples. Both numbers land in the bench JSON."""
    import time as _t

    from pyspark.sql import functions as F

    from copy_databasetables_spark.io import load_table

    def best(fn, runs=_RUNS):
        b = float("inf")
        for _ in range(runs):
            t0 = _t.perf_counter()
            fn()
            b = min(b, _t.perf_counter() - t0)
        return round(b, 4)

    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    plain = (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    plain.collect()  # warm
    exact = queries["q_agg_group"](spark, sf_dir)
    exact.collect()  # warm
    out = {
        "runs": _RUNS,
        "flagship_collect_exact_sec": best(lambda: exact.collect()),
        # the baseline row re-MEASURED under this exact best-of protocol
        # (same semantics as BASELINE.md's PySpark Q1 row: plain-double
        # aggregates, warm collect) — the apples-to-apples comparator.
        "flagship_collect_plain_double_sec": best(lambda: plain.collect()),
        # the number BASELINE.md published for that row (warm collect,
        # local[4]) — kept for traceability, clearly labeled as published
        # rather than measured by this run.
        "baseline_row_published_sec": 0.14,
    }
    # Warm-PLAN numbers for the top-3 most expensive headline queries:
    # the DataFrame is built once (planning paid once) and only execution
    # is timed, separating per-query regressions from the ~0.25 s
    # Catalyst/AQE plan-compile floor and the machine-noise band that
    # dominate the cold-plan headline numbers.
    for name in ("q_dedup_minhash", "q_join_multi_star", "q_sim_topk"):
        df = queries[name](spark, sf_dir)
        execute(df)  # warm the plan + exchanges
        out[f"warm_plan_{name}_sec"] = best(lambda: execute(df))
        free_ckpts(spark)  # after df's LAST execute — see free_ckpts
    # q_dedup_cluster iterates driver-side (the returned DataFrame is
    # only the final window over checkpointed labels), so a cached-plan
    # replay would measure almost nothing. Its protocol number is the
    # warm END-TO-END call: pair generation + all propagation rounds,
    # inputs and JVM warm. Labeled distinctly so it's never read as a
    # warm-plan figure.
    out["warm_end_to_end_q_dedup_cluster_sec"] = best(
        lambda: execute(queries["q_dedup_cluster"](spark, sf_dir)), runs=2
    )
    out["warm_end_to_end_q_dedup_cluster_runs"] = 2
    free_ckpts(spark)
    # Persisted-index per-leg rows (VERDICT r13 item 5): the gate ops
    # time build+search together, which buries the amortization story —
    # these standing numbers split it. The BUILD is timed once (a
    # corpus-sized write has no plan-warm to amortize and is the
    # one-time cost by definition); the QUERY leg is warm end-to-end
    # best-of-N against the SAME read-back artifacts — plan build +
    # pruned reads + score + top-k, exactly what a deployment pays per
    # query batch. Production bodies, not re-implementations.
    from copy_databasetables_spark.operators.similarity import (
        _ivfpq_index_build,
        _ivfpq_query_leg,
    )
    from copy_databasetables_spark.operators.text import (
        _bm25_index_build,
        _bm25_query_leg,
    )

    t0 = _t.perf_counter()
    ivf_path = _ivfpq_index_build(spark, sf_dir)
    out["ivfpq_persisted_build_sec"] = round(_t.perf_counter() - t0, 4)
    execute(_ivfpq_query_leg(spark, sf_dir, ivf_path))  # warm files/JVM
    out["ivfpq_persisted_query_leg_sec"] = best(
        lambda: execute(_ivfpq_query_leg(spark, sf_dir, ivf_path))
    )
    t0 = _t.perf_counter()
    bm25_path = _bm25_index_build(spark, sf_dir)
    out["bm25_persisted_build_sec"] = round(_t.perf_counter() - t0, 4)
    execute(_bm25_query_leg(spark, bm25_path))  # warm
    out["bm25_persisted_query_leg_sec"] = best(
        lambda: execute(_bm25_query_leg(spark, bm25_path))
    )
    # r15: the incremental-maintenance legs (VERDICT r14 item 4). The
    # day-0 build is the amortized one-time cost (timed once, like the
    # other builds); the APPLY leg is the recurring daily cost a
    # standing deployment pays per CDC batch — idempotent by
    # construction (re-applying replaces the delta's rows with
    # identical content), so warm best-of-N on the same prebuilt index
    # measures the true steady-state apply.
    from copy_databasetables_spark.operators.similarity import (
        _centroids,
        _ivfpq_cdc_apply,
        _ivfpq_cdc_base_build,
        _ivfpq_cdc_old_corpus,
        _pq_codebook,
        _vecs,
    )

    vv = _vecs(spark, sf_dir)
    old = _ivfpq_cdc_old_corpus(vv)
    cc = _centroids(old)
    _scb, cb_row = _pq_codebook(old)
    t0 = _t.perf_counter()
    cdc_path = _ivfpq_cdc_base_build(spark, old, cc, sf_dir)
    out["ivfpq_cdc_base_build_sec"] = round(_t.perf_counter() - t0, 4)
    _ivfpq_cdc_apply(spark, vv, cc, cb_row, cdc_path)  # warm
    out["ivfpq_cdc_apply_leg_sec"] = best(
        lambda: _ivfpq_cdc_apply(spark, vv, cc, cb_row, cdc_path)
    )
    free_ckpts(spark)  # after the section's last consuming action
    return out


def _jdbc_copy(spark, sf_dir: str) -> dict:
    """The reference's whole identity is bulk table copy; this is its
    measured analog: parquet → embedded Derby (batched INSERTs over a
    real JDBC driver) → partitioned JDBC read → parquet, timed per
    INSERT batch size. One timed pass per batch size (a JDBC write is
    too expensive to best-of-N, and unlike the query numbers it has no
    plan/codegen warmup to amortize — noted in BASELINE.md)."""
    from copy_databasetables_spark.io import load_table
    from copy_databasetables_spark.operators.scans import _derby_url
    from copy_databasetables_spark.sources.jdbc import (
        JdbcReadSpec,
        JdbcWriteSpec,
    )

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    )
    n = src.count()
    out: dict = {"rows": n}
    for bs in (100, 1000):
        url = _derby_url(sf_dir, f"benchcopy{bs}")
        t0 = time.perf_counter()
        JdbcWriteSpec(
            url=url,
            table="orders_copy",
            mode="overwrite",
            batchsize=bs,
            num_partitions=4,
        ).save(src)
        back = JdbcReadSpec(
            url=url,
            table="orders_copy",
            partition_column="o_orderkey",
            lower_bound=0,
            upper_bound=int(n * 10),
            num_partitions=8,
        ).load(spark)
        back.write.mode("overwrite").parquet(
            f"/tmp/spark_graft_bench/jdbc_copy_{bs}"
        )
        sec = round(time.perf_counter() - t0, 4)
        out[f"batchsize_{bs}_sec"] = sec
        out[f"batchsize_{bs}_rows_per_sec"] = round(n / sec)
    return out


def _skew_ab(spark, sf_dir: str) -> dict:
    """Measured skew story (SCALE.md): the same deliberately hot-keyed
    join (90% of lineitem rows remapped onto ONE orderkey) executed
    three ways — no mitigation, AQE skew-join split, manual salting —
    so the mitigation advice is a number, not only a plan test.

    Broadcast is disabled for all three (at bench scale orders would
    broadcast and there'd be no shuffle to skew); the AQE variant lowers
    the skew thresholds to bench-data sizes (at 100 TB the defaults —
    256 MB / factor 5 — trigger on their own, the hot partition there is
    ~90% of the table)."""
    from pyspark.sql import functions as F

    from copy_databasetables_spark.io import load_table

    conf = spark.conf
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]
    saved = {k: conf.get(k, None) for k in keys}

    def build(salted: bool):
        l = load_table(spark, sf_dir, "lineitem").withColumn(  # noqa: E741
            "k",
            F.when(F.col("l_orderkey") % 10 < 9, F.lit(1)).otherwise(
                F.col("l_orderkey")
            ),
        )
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"), "o_orderstatus"
        )
        if salted:
            l = l.withColumn("salt", F.col("l_linenumber") % 7)  # noqa: E741
            o = o.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(6))))
            joined = l.join(o, ["k", "salt"])
        else:
            joined = l.join(o, "k")
        return joined.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_extendedprice").alias("s"),
        )

    def best(salted: bool) -> float:
        df = build(salted)
        execute(df)  # warm plan + exchanges under the current confs
        b = float("inf")
        for _ in range(_RUNS):
            t0 = time.perf_counter()
            execute(df)
            b = min(b, time.perf_counter() - t0)
        return round(b, 4)

    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        no_mitigation = best(salted=False)
        salted = best(salted=True)

        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        aqe_skew = best(salted=False)
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    return {
        "runs": _RUNS,
        "hot_key_fraction": 0.9,
        "no_mitigation_sec": no_mitigation,
        "aqe_skew_split_sec": aqe_skew,
        "salted_sec": salted,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else None

    # Capture fd 2 for the whole run (the JVM child inherits it at
    # session launch) so the tail can be ASSERTED clean of WindowExec
    # single-partition warnings — the r7 log-hygiene win must not
    # silently regress (VERDICT r7 item 7). The captured log is
    # replayed to the real stderr at the end either way.
    import tempfile

    cap = tempfile.TemporaryFile(mode="w+b")
    real_err = os.dup(2)
    os.dup2(cap.fileno(), 2)

    spark = get_spark("bench")
    queries = operators.all_queries()

    # Warm-input protocol (BASELINE.md): the baseline numbers are warm
    # in-memory measurements, so cache the input tables once, outside any
    # per-query timing. The scan-parallelism env makes load_table emit
    # repartitioned plans; caching THOSE plans means every query's scan
    # resolves to the same 32-partition InMemoryRelation (Spark's cache
    # manager substitutes by canonicalized-plan equality) — otherwise the
    # single-row-group testdata files pin every scan to one task.
    os.environ["SPARK_GRAFT_SCAN_PARALLELISM"] = str(
        spark.sparkContext.defaultParallelism
    )
    from copy_databasetables_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).cache().count()

    # Warmup: exercise JVM, codegen, and the whole flagship path once.
    execute(queries["q_agg_group"](spark, sf_dir))

    # Machine calibration: a fixed pure-CPU job (no I/O, no testdata,
    # identical work every round) timed best-of-3. Cross-ROUND bench
    # comparisons on this box see ±27% p90 machine-state swings
    # (virtualized neighbors); dividing per-query times by this scalar
    # separates "the code got slower" from "the machine was slower" —
    # r8's two clean closing runs differed 18% on untouched operators,
    # which this field would have attributed in one glance.
    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "sum(id * 2654435761 % 1000003) as s"
        ).collect()
        calib = min(calib, time.perf_counter() - t0)
    calib = round(calib, 4)

    # Second anchor (VERDICT r9 item 2): a fixed SHUFFLE-shaped job —
    # 10M rows hashed onto 1000 keys, exchanged, then aggregated — so
    # cross-round adjudication can separate CPU drift from scheduler/
    # shuffle contention. r9 proved the pure-CPU anchor alone cannot
    # normalize many-small-job retrieval plans: the dedup family got
    # FASTER calibrated while seven retrieval rows regressed ~2x on
    # unchanged code in the same contended run.
    calib_shuffle = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 10_000_000, 1, 32)
            .selectExpr("id % 1000 AS k", "id AS v")
            .repartition(32, "k")
            .groupBy("k")
            .agg({"v": "sum"})
            .collect()
        )
        calib_shuffle = min(calib_shuffle, time.perf_counter() - t0)
    calib_shuffle = round(calib_shuffle, 4)

    # Third anchor (VERDICT r15 item 1): a fixed mapInPandas identity
    # job — Python-worker spawn + Arrow round-trip over 1M rows × 32
    # partitions — so machine-state claims about the Python boundary
    # are measurable, separately from the pure-JVM CPU/shuffle anchors
    # (guide §4: every mapInPandas leg pays this path). The FIRST call
    # is recorded separately: when the worker pool is cold it absorbs
    # the one-time fork + pandas/pyarrow import (~4.5 s on a cold box,
    # r15 measured), which previously landed inside whichever benched
    # query hit the boundary first. Running the anchor BEFORE the
    # headline loop is the same warmup-exclusion the protocol already
    # applies to JVM/codegen (BASELINE.md: "session startup and
    # first-query warmup are excluded").
    def _py_ident(it):
        for pdf in it:
            yield pdf

    def _py_job() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 1_000_000, 1, 32)
            .selectExpr("id")
            .mapInPandas(_py_ident, "id long")
            .selectExpr("sum(id) AS s")
            .collect()
        )
        return time.perf_counter() - t0

    calib_python_cold = round(_py_job(), 4)
    calib_python = round(min(_py_job() for _ in range(3)), 4)

    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(_RUNS):
            t0 = time.perf_counter()
            execute(queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            # untimed: free this run's localCheckpoint blocks (VERDICT
            # r15 item 2 — unbounded, they evict the cached inputs and
            # race ContextCleaner into accumulator errors). Strictly
            # after the consuming noop action, per the free_ckpts
            # contract; the next run rebuilds its frames from parquet.
            free_ckpts(spark)
        times[name] = round(best, 4)

    payload = {
        "metric": "total_query_sec",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "runs": _RUNS,
        "sf": sf,
        "calibration_sec": calib,
        "calibration_shuffle_sec": calib_shuffle,
        "calibration_python_sec": calib_python,
        "calibration_python_cold_sec": calib_python_cold,
        "protocol": _flagship_protocol(spark, queries, sf_dir),
        "skew_ab": _skew_ab(spark, sf_dir),
        "jdbc_copy": _jdbc_copy(spark, sf_dir),
        # Self-describing adjudication flag (VERDICT r14 item 2): the
        # committed BENCH_FULL.json must say whether it came from a
        # quiet two-clean-run pinning session (builder exports
        # SPARK_GRAFT_BENCH_ADJUDICATED=1 only then) or from an
        # arbitrary — possibly contended — driver/CI invocation, so a
        # reader never has to reconstruct that from commit archaeology.
        "adjudicated": os.environ.get("SPARK_GRAFT_BENCH_ADJUDICATED")
        == "1",
    }

    # restore + replay stderr, then assert the tail clean: any
    # WindowExec warning means a query planned an unpartitioned window
    # over data-sized input — a single-partition bottleneck at scale.
    sys.stderr.flush()
    os.dup2(real_err, 2)
    os.close(real_err)
    cap.seek(0)
    log = cap.read()
    cap.close()
    os.write(2, log)
    n_winwarn = log.count(b"WindowExec")
    payload["windowexec_warnings"] = n_winwarn

    # The external driver records only the LAST ~2000 chars of stdout
    # (BENCH_r12.json: `tail` is exactly 2000 chars, `parsed` null —
    # the full payload line had outgrown the capture and the first ~5
    # headline rows were lost to cross-round diffs). So: the full
    # payload goes to BENCH_FULL.json beside this script (committed,
    # diffable), and stdout gets ONE compact line holding the complete
    # per-query map plus the spec fields, kept under the capture budget
    # by shedding the non-spec sub-blocks (protocol/skew_ab/jdbc_copy
    # live in the side file and BASELINE.md).
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    essential_keys = [
        "metric", "value", "unit", "queries", "runs", "sf",
        "calibration_sec", "calibration_shuffle_sec",
        "calibration_python_sec", "calibration_python_cold_sec",
        "windowexec_warnings",
    ]
    compact = {k: payload[k] for k in essential_keys if k in payload}
    # The per-query map must FIT the driver's ~2000-char stdout capture
    # or the whole round loses per-query adjudication (r15's map at 4
    # decimals was 2063 chars and degraded to a pointer — PERF_r15's
    # per_query table was degenerate, VERDICT r15 item 4). 2 significant
    # figures keeps all 76 name→seconds entries in the line (±5%
    # quantization, far under machine noise); BENCH_FULL.json keeps the
    # full 4-decimal values for anyone reading the side file.
    compact["queries"] = {
        k: float(f"{v:.2g}") for k, v in payload["queries"].items()
    }
    line = json.dumps(compact, separators=(",", ":"))
    while len(line) > 1900 and len(essential_keys) > 5:
        # never drop the five spec fields; shed trailing extras first
        dropped = essential_keys.pop()
        if dropped in ("metric", "value", "unit", "queries", "sf"):
            break
        compact.pop(dropped, None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        # degrade DETERMINISTICALLY instead of printing a line the
        # driver's 2000-char tail capture would truncate back into the
        # exact BENCH_r12 parsed=null failure this path exists to
        # prevent (ADVICE r13): the full per-query map always lives in
        # BENCH_FULL.json; stdout keeps the spec fields plus a pointer.
        print(
            f"BENCH LINE OVER BUDGET: {len(line)} chars — emitting the "
            "spec fields with a BENCH_FULL.json pointer instead of the "
            "full queries map",
            file=sys.stderr,
        )
        compact["queries"] = {
            "queries_in": "BENCH_FULL.json",
            "n_queries": len(payload.get("queries", {})),
        }
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    if n_winwarn:
        print(
            f"BENCH TAIL DIRTY: {n_winwarn} WindowExec warning(s) in the "
            "session log — an unpartitioned window regressed into a "
            "benched plan",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()

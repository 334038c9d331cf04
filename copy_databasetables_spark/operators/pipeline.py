"""Training-dataset assembly operators (§2.10 extensions).

The last mile of a 100 TB corpus build: reproducible splits, sampling,
sequence packing, and class balancing. The common design rule: NEVER use
RNG sampling for anything that must be reproducible across runs/engines —
assignment is always a pure function of a stable key (portable md5-derived
hash), so adding data never reshuffles existing assignments and any
engine recomputes identical splits.
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
    rz,
)

#: portable hash of a string expr (see dedup.py) folded to [0, 100).
_PCT = "pmod(cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint), 100)"
_D_PCT = "(CAST(concat('0x', substring(md5({x}), 1, 15)) AS BIGINT) % 100)"


@register(
    "q_split_train_test",
    oracle=f"""
    WITH t AS (
      SELECT *, CASE WHEN {_D_PCT.format(x="CAST(doc_id AS VARCHAR)")} < 80 THEN 'train'
                     WHEN {_D_PCT.format(x="CAST(doc_id AS VARCHAR)")} < 90 THEN 'val'
                     ELSE 'test' END AS split
      FROM documents)
    SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM t GROUP BY split, lang
    """,
)
def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: the split is a pure
    function of doc_id's hash, so it is stable under re-runs, engine
    changes, and corpus growth (new docs never move old ones — the
    property RNG-with-seed sampling does NOT have under repartitioning)."""
    d = load_table(spark, sf_dir, "documents")
    pct = F.expr(_PCT.format(x="cast(doc_id as string)"))
    split = (
        F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "q_sample_hash",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE {_D_PCT.format(x="CAST(o_orderkey AS VARCHAR)")} < 10
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample by key hash. Unlike ``df.sample`` (RNG
    per partition — resample on any repartition), the hash predicate
    pushes down, is stable forever, and two pipelines sampling the same
    keys get the same rows."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.expr(_PCT.format(x="cast(o_orderkey as string)")) < 10
    ).select("o_orderkey", "o_custkey", "o_totalprice")


#: per-language sampling rates (percent kept): downsample the dominant
#: language, keep low-resource languages whole — the standard
#: low-resource-upsampling mixture move, expressed as deterministic
#: per-stratum hash thresholds.
_STRATA_RATES = {"en": 20, "de": 60, "fr": 60, "es": 60, "zh": 100}
_STRATA_DEFAULT = 50


def _rate_case_sql(pct_fragment: str) -> str:
    arms = " ".join(
        f"WHEN lang = '{k}' THEN {pct_fragment} < {v}"
        for k, v in sorted(_STRATA_RATES.items())
    )
    return f"CASE {arms} ELSE {pct_fragment} < {_STRATA_DEFAULT} END"


@register(
    "q_sample_stratified",
    oracle=f"""
    WITH kept AS (
      SELECT * FROM documents
      WHERE {_rate_case_sql(_D_PCT.format(x="CAST(doc_id AS VARCHAR)"))})
    SELECT k.lang,
           COUNT(*) AS n_kept,
           t.n_total,
           CAST(SUM(k.n_chars) AS BIGINT) AS kept_chars
    FROM kept k
    JOIN (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang) t
      ON t.lang = k.lang
    GROUP BY k.lang, t.n_total
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: each language keeps a
    configured fraction (dominant 'en' downsampled to 20%, low-resource
    strata kept at 60-100%) via the same pure-hash-of-key predicate as
    q_sample_hash — stable under re-runs, repartitioning, and corpus
    growth, unlike RNG `df.sample`/`sampleBy`. Output is the per-stratum
    audit (kept vs total), i.e. the realized mixture.

    Scale: the keep-predicate is a scalar expression on the scan (no
    shuffle to sample); the audit is one two-phase aggregate plus a
    broadcast-sized per-lang totals join."""
    d = load_table(spark, sf_dir, "documents")
    pct = _PCT.format(x="cast(doc_id as string)")
    kept = d.where(F.expr(_rate_case_sql(pct)))
    totals = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .join(F.broadcast(totals), "lang")
        .select("lang", "n_kept", "n_total", "kept_chars")
    )


_PACK_BUDGET = 512


@register(
    "q_text_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents),
    c AS (
      SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
                                    ROWS UNBOUNDED PRECEDING) AS cum
      FROM t),
    binned AS (
      SELECT *, CAST(FLOOR((cum - n_tokens) / {_PACK_BUDGET}) AS BIGINT) AS bin FROM c)
    SELECT source, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM binned GROUP BY source, bin
    """,
)
def q_text_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents (in a deterministic
    per-source order) into ~512-token training bins (budget sized so the testdata actually produces multiple bins per source). bin = floor(
    starting-offset / budget) over a running token count — the streaming
    -friendly packing rule (no global state; each source packs
    independently, so sources parallelize across the cluster)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum", F.sum("n_tokens").over(w))
        # explicit floor: a bare double→bigint CAST truncates in Spark
        # but ROUNDS in DuckDB — the cross-engine trap from §2.8 notes
        .withColumn(
            "bin",
            F.floor((F.col("cum") - F.col("n_tokens")) / _PACK_BUDGET).cast("bigint"),
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "q_class_balance",
    oracle="""
    WITH counts AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label)
    SELECT label, n,
           MIN(n) OVER () AS target_n,
           ROUND(CAST(MIN(n) OVER () AS DOUBLE) / n, 4) AS keep_ratio,
           CAST(FLOOR(100.0 * MIN(n) OVER () / n) AS BIGINT) AS keep_pct_floor
    FROM counts
    """,
)
def q_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balancing plan: per-label keep ratios that downsample every
    label to the minority class's count. Composes with q_sample_hash:
    keep rows whose key hash lands under keep_pct_floor — deterministic
    balanced sampling with no RNG."""
    e = load_table(spark, sf_dir, "embeddings")
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    # the minority count is ONE scalar: broadcast a 1-row aggregate
    # instead of an unpartitioned min() window — same value, no
    # single-partition sort exchange (and no WindowExec warning noise
    # masking real corpus-wide-window regressions in bench logs)
    target_n = counts.agg(F.min("n").alias("target_n"))
    target = F.col("target_n")
    return counts.crossJoin(F.broadcast(target_n)).select(
        "label",
        "n",
        target.alias("target_n"),
        F.round(target.cast("double") / F.col("n"), 4).alias("keep_ratio"),
        F.floor(100.0 * target / F.col("n")).alias("keep_pct_floor"),
    )


@register(
    "q_pipeline_e2e",
    oracle=f"""
    WITH canonical AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
    kept AS (
      SELECT d.* FROM documents d JOIN canonical c USING (doc_id)),
    scored AS (
      SELECT *, len(string_split(text, ' ')) AS n_tokens
      FROM kept
      WHERE len(string_split(text, ' ')) >= 10
        AND CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
              / n_chars < 0.3),
    split AS (
      SELECT *, CASE WHEN {_D_PCT.format(x="CAST(doc_id AS VARCHAR)")} < 80 THEN 'train'
                     WHEN {_D_PCT.format(x="CAST(doc_id AS VARCHAR)")} < 90 THEN 'val'
                     ELSE 'test' END AS split
      FROM scored),
    packed AS (
      SELECT *, CAST(FLOOR((SUM(n_tokens) OVER (
                  PARTITION BY split, source ORDER BY doc_id ASC
                  ROWS UNBOUNDED PRECEDING) - n_tokens) / {_PACK_BUDGET})
                AS BIGINT) AS bin
      FROM split)
    SELECT split, source, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY split, source, bin
    """,
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone: a complete corpus-prep pipeline — exact dedup (keep
    canonical doc per content hash) → quality gate (length + punctuation
    density) → deterministic train/val/test split → per-(split, source)
    sequence packing — composed as ONE declarative DataFrame plan, so
    Catalyst optimizes across stage boundaries (the dedup semi join, the
    filters, and the split expression all collapse into the scan side of
    a single pipeline; only the window and the final aggregate shuffle).
    This is the shape a 100 TB run ships as one job."""
    d = load_table(spark, sf_dir, "documents")
    canonical = d.groupBy(F.sha2(F.col("text"), 256)).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = d.join(canonical.select("doc_id"), "doc_id", "left_semi")
    n_tokens = F.size(F.split(F.col("text"), " "))
    punct_ratio = (
        F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("double")
        / F.col("n_chars")
    )
    scored = kept.withColumn("n_tokens", n_tokens).where(
        (F.col("n_tokens") >= 10) & (punct_ratio < 0.3)
    )
    pct = F.expr(_PCT.format(x="cast(doc_id as string)"))
    split = F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test")
    w = (
        Window.partitionBy("split", "source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("split", split)
        .withColumn(
            "bin",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_BUDGET
            ).cast("bigint"),
        )
        .groupBy("split", "source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


@register(
    "q_agg_percentile_approx",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_rows, TRUE AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) — THE percentile
    operator at 100 TB: bounded memory, mergeable across partitions,
    tunable accuracy. Sketch outputs are engine-specific (DuckDB's
    approx_quantile is t-digest), so the hash-checkable output is an
    in-query verdict: each GK estimate must land between the EXACT
    percentiles at q−0.01 and q+0.01 (q+0.005 for p99, so the upper
    bound is never the vacuous max) — a rank window 50-100× looser than
    the accuracy=10000 guarantee (rank error ≤ n/10000), computed in the
    same groupBy. The oracle emits TRUE from the exact side; hashes
    match iff every sketch value is inside its rank window. The exact
    percentile pass exists for the gate; production use is the sketch
    alone."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    # upper bound for p99 is exact p99.5, NOT percentile(1.0): the max
    # would make the p99 upper check vacuously true for any data value
    # (ADVICE.md r5). The q+0.005 window is still 50× the accuracy=10000
    # rank guarantee (rank error ≤ n/10000).
    exact = F.expr(
        "percentile(l_extendedprice, array(0.49, 0.51, 0.94, 0.96, 0.98, 0.995))"
    )
    ok = (
        (F.col("p")[0] >= F.col("e")[0])
        & (F.col("p")[0] <= F.col("e")[1])
        & (F.col("p")[1] >= F.col("e")[2])
        & (F.col("p")[1] <= F.col("e")[3])
        & (F.col("p")[2] >= F.col("e")[4])
        & (F.col("p")[2] <= F.col("e")[5])
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            approx.alias("p"),
            exact.alias("e"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select("l_returnflag", "n_rows", ok.alias("within_tol"))
        .orderBy("l_returnflag")
    )


# --- decontamination / quotas / PII ----------------------------------------

#: fixed benchmark size for q_decontaminate — like the IVF centroid cap
#: (similarity._IVF_MAX_CENTROIDS), a CONSTANT, not a corpus fraction, so
#: the broadcast side of the anti-join stays bounded at any data scale.
_BENCH_DOCS = 20
#: n-gram width for contamination overlap (13 in the GPT-3/Pile protocol;
#: 5 here so the tiny synthetic docs actually produce grams).
_GRAM_N = 5

#: Spark: token n-gram hash array of a `toks` column (empty when the doc
#: is shorter than the gram width — sequence(1, 0) steps DOWNWARD, so an
#: explicit guard is required, same trap as text.q_text_repetition).
#: Gram identity is ENGINE-INTERNAL (grams never appear in the output,
#: only membership counts do), so each side uses its cheapest form:
#: Spark hashes the token slice directly with xxhash64 — no gram string
#: is ever built, and no md5 (r5: this md5 was the dominant constant in
#: the q_decontaminate bench line); DuckDB keeps the raw gram string.
#: Results agree absent an xxhash64 collision between distinct grams of
#: the same corpus — which the differential gate itself would catch.
_GRAMS = (
    f"CASE WHEN size(toks) < {_GRAM_N} THEN array() "
    f"ELSE transform(sequence(1, size(toks) - {_GRAM_N - 1}), "
    f"i -> xxhash64(slice(toks, i, {_GRAM_N}))) END"
)
#: DuckDB: the same grams as plain strings (list slicing is 1-based
#: inclusive).
_D_GRAMS = (
    f"CASE WHEN len(toks) < {_GRAM_N} THEN [] "
    f"ELSE list_transform(range(1, len(toks) - {_GRAM_N - 2}), "
    f"i -> array_to_string(toks[i:i + {_GRAM_N - 1}], ' ')) END"
)


@register(
    "q_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, {_D_GRAMS} AS grams FROM t),
    bench AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {_BENCH_DOCS}),
    bg AS (SELECT DISTINCT unnest(g.grams) AS gh
           FROM g JOIN bench USING (doc_id)),
    corpus_g AS (SELECT doc_id, unnest(grams) AS gh FROM g),
    hits AS (SELECT doc_id, COUNT(*) AS n_hit_grams
             FROM (SELECT DISTINCT doc_id, gh FROM corpus_g) c
             JOIN bg USING (gh) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
           COALESCE(h.n_hit_grams, 0) > 0 AS contaminated,
           d.doc_id IN (SELECT doc_id FROM bench) AS is_benchmark
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the GPT-3/Pile protocol re-expressed
    as a broadcast overlap join: flag every corpus document sharing any
    token n-gram with a FIXED benchmark set (here the first
    ``_BENCH_DOCS`` doc_ids, standing in for an external eval suite).

    The 100 TB shape: the benchmark gram set is constant-sized (external
    benchmarks don't grow with the corpus), so it broadcasts to every
    executor and the corpus side is scanned ONCE with no shuffle — the
    per-doc hit count groups on doc_id over only the matching gram rows
    (a tiny fraction of the corpus), and the final flag join is a left
    join whose right side is just the contaminated ids. In production
    the broadcast becomes a bloom filter at ~1e8 benchmark grams; the
    plan shape is identical. Gram identity is the xxhash64 of the raw
    token slice (see _GRAMS) — the corpus-wide scan does zero string
    concatenation and zero cryptographic hashing."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    g = toks.select("doc_id", F.expr(_GRAMS).alias("grams"))
    bench_ids = d.select("doc_id").orderBy("doc_id").limit(_BENCH_DOCS)
    # bounded scalar (_BENCH_DOCS ids, a constant — same pattern as the
    # scans.py split-point collects): inlining the ids as an isin filter
    # pushes the benchmark-side predicate into the parquet scan, so the
    # corpus-wide gram expression is evaluated ONCE (the corpus_g pass),
    # not once more under a semi-join that can't prune the scan.
    ids = [r[0] for r in bench_ids.collect()]
    bg = (
        g.where(F.col("doc_id").isin(ids))
        .select(F.explode("grams").alias("gh"))
        .distinct()
    )
    corpus_g = g.select(
        "doc_id", F.explode(F.array_distinct("grams")).alias("gh")
    )
    hits = (
        corpus_g.join(F.broadcast(bg), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    return (
        d.select("doc_id")
        .join(hits, "doc_id", "left")
        .join(
            F.broadcast(bench_ids.withColumn("is_benchmark", F.lit(True))),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
            F.coalesce("is_benchmark", F.lit(False)).alias("is_benchmark"),
        )
    )


_QUOTA = 10


@register(
    "q_domain_quota",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents)
    SELECT doc_id, source, n_chars, rk
    FROM ranked WHERE rk <= {_QUOTA}
    """,
)
def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling — cap every source (domain, in a crawl)
    at ``_QUOTA`` documents, keeping the longest (a quality proxy) with
    a doc_id tiebreak so the selection is total-order deterministic.

    Scale: one hash-shuffle on source, then a per-partition streaming
    row_number — no global sort. A skewed mega-domain concentrates its
    rows in one task; the AQE skew-split handles moderate skew, and the
    two-phase refinement (per-partition top-Q, then top-Q of the
    union — valid because row_number ≤ Q survivors are a superset
    under any partition split of the same ordering) is the documented
    escape hatch for pathological domains."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _QUOTA)
    )


#: Synthetic-PII construction: the corpus is clean by construction, so
#: the op appends a deterministic email + phone derived from doc_id,
#: then proves the redaction machinery removes them. Patterns are RE2-
#: and-Java-regex compatible (no lookarounds, no \d shorthand quirks —
#: [0-9] spelled out for byte-identical semantics across engines).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


@register(
    "q_pii_redact",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(
               regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}')) AS n_phones,
           regexp_replace(
             regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM t
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: regex-scrub emails and phone
    numbers, reporting per-doc match counts plus the redacted text.
    Pure JVM string expressions — zero shuffle, zero Python; at 100 TB
    this runs entirely inside whole-stage codegen on the scan.

    Phones are counted AFTER email redaction (an email's digit runs
    can't double-count), exactly mirrored in the oracle."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    t = d.select("doc_id", raw.alias("raw"))
    no_email = F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>")
    return t.select(
        "doc_id",
        F.regexp_count("raw", F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(no_email, F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_replace(no_email, _PHONE_RE, "<PHONE>").alias("redacted"),
    )


#: mixture-weight temperature: weight ∝ tokens^alpha. α<1 upsamples
#: small domains (the multilingual-sampling convention); α=1 is
#: proportional, α=0 uniform.
_MIX_ALPHA = 0.5


@register(
    "q_mixture_weights",
    oracle=f"""
    WITH t AS (
      SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source),
    p AS (SELECT source, tokens, pow(tokens, {_MIX_ALPHA}) AS raw FROM t)
    SELECT source, tokens,
           ROUND(raw / SUM(raw) OVER (), 4) AS weight,
           ROUND((raw / SUM(raw) OVER ())
                 / (tokens / SUM(tokens) OVER ()), 4) AS upsample_factor
    FROM p
    """,
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture weights for training-data sampling: per-source
    token counts → sampling weight ∝ tokens^α (α=0.5 upsamples small
    domains, the standard temperature-sampling rule), plus the implied
    upsample factor vs proportional sampling.

    Scale: ONE two-phase aggregate over the corpus (token counting is
    map-side; the shuffle carries |sources| rows), then window math over
    the tiny per-source table. The output table IS the sampler config —
    feed it to q_sample_hash-style per-source thresholds. pow is IEEE
    double on both engines; 4dp rounding sits far above the ulp noise
    of pow on these magnitudes."""
    d = load_table(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("tokens")
    )
    raw = F.pow(F.col("tokens").cast("double"), F.lit(_MIX_ALPHA))
    # the two normalizers are scalars over the tiny per-source table:
    # broadcast a 1-row aggregate instead of unpartitioned sum() windows
    # — same values (int64 token sum is exact; the double pow-sum is
    # inside the 4dp rounding argument above either way), no
    # single-partition window exchange
    totals = t.agg(
        F.sum(raw).alias("raw_tot"),
        F.sum("tokens").alias("tok_tot"),
    )
    return t.crossJoin(F.broadcast(totals)).select(
        "source",
        "tokens",
        F.round(raw / F.col("raw_tot"), 4).alias("weight"),
        F.round(
            (raw / F.col("raw_tot"))
            / (F.col("tokens").cast("double") / F.col("tok_tot")),
            4,
        ).alias("upsample_factor"),
    )


#: Bloom geometry for q_decontaminate_bloom: 2^20 bits (16384 longs =
#: 128 KB broadcast) × 3 hash functions. At the testdata's ~3k benchmark
#: grams the per-gram false-positive rate is (1-e^(-kn/m))^k ≈ 6e-7, so
#: even compounded over a document's every gram the per-DOC FP rate
#: stays ~1e-4 — far inside the 2% verdict band. At 1e8 benchmark grams
#: (the scale where the exact broadcast set stops fitting) m scales to
#: 2^31 bits = 256 MB, still one broadcast, same plan.
_BLOOM_BITS = 1 << 20
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 3
_BLOOM_FP_BOUND = 0.02



@register(
    "q_decontaminate_bloom",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, {_D_GRAMS} AS grams FROM t),
    bench AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {_BENCH_DOCS}),
    bg AS (SELECT DISTINCT unnest(g.grams) AS gh
           FROM g JOIN bench USING (doc_id)),
    corpus_g AS (SELECT doc_id, unnest(grams) AS gh FROM g),
    hits AS (SELECT doc_id, COUNT(*) AS n_hit_grams
             FROM (SELECT DISTINCT doc_id, gh FROM corpus_g) c
             JOIN bg USING (gh) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
           COALESCE(h.n_hit_grams, 0) > 0 AS contaminated,
           TRUE AS bloom_sound,
           TRUE AS fp_within_bound
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination through a BLOOM FILTER of the benchmark gram set —
    the production shape q_decontaminate's docstring promises for ~1e8
    benchmark grams, where broadcasting the raw gram hashes stops being
    reasonable. The filter is built and probed entirely in JVM
    expressions (Spark exposes no SQL bloom_filter_agg): the bit array
    is ``_BLOOM_WORDS`` int64 words assembled by a bit_or aggregate over
    the k bit positions of every benchmark gram, densified with
    map_from_entries + sequence, and shipped as ONE broadcast row;
    membership is a forall over the k (word, bit) probes with
    shiftright/mask arithmetic — whole-stage codegen, no Python, no UDF.

    Correctness contract (differential, like q_agg_approx_distinct's
    within_tol): blooms admit false positives but NEVER false negatives,
    so the query outputs the EXACT per-doc hit counts (hash-checked
    against the DuckDB oracle) plus two in-query verdicts the oracle
    pins to TRUE — ``bloom_sound`` (every exact-contaminated doc is
    bloom-flagged; a FALSE here means the bloom lost a true hit, i.e. a
    real bug) and ``fp_within_bound`` (the measured per-doc FP rate over
    clean docs stays under {_BLOOM_FP_BOUND:.0%}, the sizing check).

    Scale: the corpus-side gram stream is filtered map-side against the
    broadcast bit array exactly like the exact variant — no corpus
    shuffle; only bloom-hit rows reach the doc_id aggregate. The
    128 KB filter replaces an O(|bench grams|) broadcast set with O(m)
    bits chosen by the FP budget, the textbook memory/precision dial."""
    d = load_table(spark, sf_dir, "documents")
    g = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).select("doc_id", F.expr(_GRAMS).alias("grams"))
    bench_ids = d.select("doc_id").orderBy("doc_id").limit(_BENCH_DOCS)
    ids = [r[0] for r in bench_ids.collect()]
    bg = (
        g.where(F.col("doc_id").isin(ids))
        .select(F.explode("grams").alias("gh"))
        .distinct()
    )
    # build: benchmark gram → k bit positions → (word, mask) → bit_or
    # per word → ONE dense array<long> row (shared machinery:
    # _helpers.bloom_build / bloom_might_contain_sql — the join runtime
    # filter q_join_bloom_prune uses the identical construction)
    bloom = bloom_build(bg, "gh", _BLOOM_BITS, _BLOOM_K)
    # probe: each distinct (doc, gram) tests its k bits against the
    # broadcast array.
    corpus_g = g.select(
        "doc_id", F.explode(F.array_distinct("grams")).alias("gh")
    )
    might = F.expr(bloom_might_contain_sql("gh", _BLOOM_BITS, _BLOOM_K))
    bloom_hits = (
        corpus_g.crossJoin(F.broadcast(bloom))
        .where(might)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_grams"))
    )
    exact_hits = (
        corpus_g.join(F.broadcast(bg), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    per_doc = (
        d.select("doc_id")
        .join(exact_hits, "doc_id", "left")
        .join(bloom_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
            (F.coalesce("n_bloom_grams", F.lit(0)) > 0).alias("bloom_flagged"),
        )
    )
    # verdicts: soundness must hold per doc; the FP rate is one scalar
    # over the clean docs, broadcast back onto every row (same
    # one-row-verdict pattern as q_agg_approx_distinct's within_tol).
    fp = per_doc.agg(
        (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("bloom_flagged") & ~F.col("contaminated"), 1
                    ).otherwise(0)
                )
                / F.greatest(
                    F.sum(F.when(~F.col("contaminated"), 1).otherwise(0)),
                    F.lit(1),
                ),
                F.lit(0.0),
            )
            <= _BLOOM_FP_BOUND
        ).alias("fp_within_bound")
    )
    return (
        per_doc.crossJoin(F.broadcast(fp))
        .select(
            "doc_id",
            "n_hit_grams",
            "contaminated",
            (F.col("bloom_flagged") | ~F.col("contaminated")).alias("bloom_sound"),
            "fp_within_bound",
        )
    )


#: k-anonymity threshold: a quasi-identifier combination shared by
#: fewer than K records is a re-identification risk.
_K_ANON = 5


@register(
    "q_k_anonymity",
    oracle=f"""
    WITH q AS (
      SELECT lang, source, (n_chars // 100) * 100 AS len_bucket
      FROM documents),
    g AS (SELECT lang, source, len_bucket, COUNT(*) AS grp_n
          FROM q GROUP BY lang, source, len_bucket)
    SELECT lang,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN grp_n < {_K_ANON} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_risky_groups,
           CAST(SUM(CASE WHEN grp_n < {_K_ANON} THEN grp_n ELSE 0 END)
                AS BIGINT) AS n_risky_docs,
           CAST(SUM(grp_n) AS BIGINT) AS n_docs,
           round(CAST(SUM(CASE WHEN grp_n < {_K_ANON} THEN grp_n ELSE 0 END)
                      AS DOUBLE) / SUM(grp_n), 6) AS suppression_rate,
           CAST(MIN(grp_n) AS BIGINT) AS min_group_size
    FROM g GROUP BY lang
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk report over the corpus's quasi-identifiers
    (lang, source, 100-char length bucket): per language, how many identifier
    combinations fall below the k=5 anonymity floor, how many documents
    they expose, and the suppression rate a release would pay — the
    governance readout that decides generalize-vs-suppress before a
    dataset ships. Pairs with q_pii_redact (direct identifiers) to
    cover both halves of the privacy-hygiene story.

    Scale shape (100 TB): two stacked aggregations — the first keyed by
    the quasi-identifier tuple (partial map-side combine collapses the
    corpus to |combinations| rows before the shuffle), the second by
    lang over the tiny group table. Integer-exact except the one
    rounded ratio, so the hash gate is deterministic."""
    d = load_table(spark, sf_dir, "documents")
    g = (
        d.select(
            "lang",
            "source",
            (F.floor(F.col("n_chars") / 100) * 100).alias("len_bucket"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count(F.lit(1)).alias("grp_n"))
    )
    risky = F.col("grp_n") < _K_ANON
    return g.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(risky, 1).otherwise(0)).cast("bigint").alias("n_risky_groups"),
        F.sum(F.when(risky, F.col("grp_n")).otherwise(0))
        .cast("bigint")
        .alias("n_risky_docs"),
        F.sum("grp_n").cast("bigint").alias("n_docs"),
        F.round(
            F.sum(F.when(risky, F.col("grp_n")).otherwise(0)).cast("double")
            / F.sum("grp_n"),
            6,
        ).alias("suppression_rate"),
        F.min("grp_n").cast("bigint").alias("min_group_size"),
    )


@register(
    "q_assign_global_ids",
    oracle="""
    SELECT doc_id,
           row_number() OVER (ORDER BY doc_id) AS global_id
    FROM documents
    """,
)
def q_assign_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 1-based global IDs in doc_id order — training-sample
    numbering — WITHOUT the naive plan's fatal shape. ``row_number()
    OVER (ORDER BY doc_id)`` compiles to Exchange SinglePartition: the
    entire corpus funnels through ONE task (the classic zipWithIndex
    problem), which at 100 TB is not slow but impossible.

    The scale shape instead: (1) range-repartition by doc_id — ranges
    are non-overlapping and partition index order follows doc_id order;
    (2) per-partition LOCAL row_number (each window partition is one
    range partition — parallel across the cluster); (3) a per-partition
    count aggregate (|partitions| rows — the only single-partition
    work is a cumulative sum over THAT, constant-size); (4) broadcast
    the offsets back. global_id = offset + local rank reproduces the
    exact global ranking.

    Determinism: range boundaries come from sampling and can vary
    between runs, but the OUTPUT is boundary-independent — any range
    split of a total order yields the same offset+local_rank ranking;
    and within one run the counts branch REUSES the range exchange
    (ReusedExchange — pinned in the plan test), so both branches see
    identical boundaries structurally, not by luck. Cost note: the
    per-pid window adds one hash exchange on pid (Spark can't see that
    range partitions already group by pid) — a fully parallel shuffle,
    acceptable where the naive plan is impossible; the plan test pins
    that the only SinglePartition exchange is the |partitions|-row
    offsets leg."""
    n_parts = spark.sparkContext.defaultParallelism
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartitionByRange(n_parts, "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    local = d.withColumn(
        "local_rn",
        F.row_number().over(Window.partitionBy("pid").orderBy("doc_id")),
    )
    # BOUNDED unpartitioned window: the prefix-sum frame is the
    # per-partition count table (|pid| = shuffle-partition count, a
    # config constant — never corpus rows), the canonical parallel
    # range-id shape. Its WindowExec single-partition warning is
    # size-safe by construction; the corpus itself never passes through
    # an unpartitioned window (plan-pinned below).
    offsets = (
        d.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "offset")
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            (F.col("offset") + F.col("local_rn")).alias("global_id"),
        )
    )


def drift_report(a: DataFrame, b: DataFrame) -> DataFrame:
    """Generic two-snapshot drift report over (doc_id, source, n_chars)
    frames: per source, document counts, added/removed ids, the L1
    distance between length histograms, and mean lengths.

    Cross-engine-exact by construction: the length bucket is
    ``length(bin(n_chars)) - 1`` = floor(log2) computed on the binary
    STRING — integer-exact in both engines, no float log boundary; the
    L1 drift sums |bigint - bigint|; means are ROUND(bigint/bigint, 2)
    (one double division of identical integers on each side).

    Scale (100 TB): two scans; added/removed are doc_id anti-joins
    (one shuffle each — at real scale the id sets would ride a bloom
    prune, q_join_bloom_prune's pattern); histograms are per-(source,
    bucket) partial aggregates — wire rows ≈ |sources|×64 buckets,
    metadata-sized; the final per-source join is over |sources| rows."""
    def hist(df):
        return df.groupBy(
            "source",
            (F.length(F.bin(F.col("n_chars"))) - 1).alias("bkt"),
        ).agg(F.count(F.lit(1)).alias("cnt"))

    ha = hist(a).withColumnRenamed("cnt", "ca")
    hb = hist(b).withColumnRenamed("cnt", "cb")
    l1 = (
        ha.join(hb, ["source", "bkt"], "full")
        .select(
            "source",
            F.abs(
                F.coalesce(F.col("ca"), F.lit(0))
                - F.coalesce(F.col("cb"), F.lit(0))
            ).alias("d"),
        )
        .groupBy("source")
        .agg(F.sum("d").alias("l1_len_drift"))
    )
    stats_a = a.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_a"),
        F.round(F.sum("n_chars") / F.count(F.lit(1)), 2).alias("mean_nchars_a"),
    )
    stats_b = b.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_b"),
        F.round(F.sum("n_chars") / F.count(F.lit(1)), 2).alias("mean_nchars_b"),
    )
    added = (
        b.join(a.select("doc_id"), "doc_id", "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("added"))
    )
    removed = (
        a.join(b.select("doc_id"), "doc_id", "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("removed"))
    )
    return (
        stats_a.join(stats_b, "source", "full")
        .join(added, "source", "left")
        .join(removed, "source", "left")
        .join(l1, "source", "left")
        .select(
            "source",
            F.coalesce("docs_a", F.lit(0)).cast("bigint").alias("docs_a"),
            F.coalesce("docs_b", F.lit(0)).cast("bigint").alias("docs_b"),
            F.coalesce("added", F.lit(0)).cast("bigint").alias("added"),
            F.coalesce("removed", F.lit(0)).cast("bigint").alias("removed"),
            F.coalesce("l1_len_drift", F.lit(0)).cast("bigint").alias("l1_len_drift"),
            "mean_nchars_a",
            "mean_nchars_b",
        )
    )


#: Deterministic day-2 snapshot for the checked drift op: every 7th doc
#: deleted, every 5th re-ingested as a "new" doc (remapped id, +37
#: chars — a length-distribution shift the histogram must see).
_DRIFT_NEW_OFFSET = 1_000_000_000
_DRIFT_LEN_SHIFT = 37


@register(
    "q_corpus_drift",
    oracle=f"""
    WITH a AS (SELECT doc_id, source, n_chars FROM documents),
    b AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + {_DRIFT_NEW_OFFSET}, source,
             n_chars + {_DRIFT_LEN_SHIFT}
      FROM documents WHERE doc_id % 5 = 0),
    ha AS (SELECT source, length(bin(n_chars)) - 1 AS bkt, COUNT(*) AS ca
           FROM a GROUP BY source, bkt),
    hb AS (SELECT source, length(bin(n_chars)) - 1 AS bkt, COUNT(*) AS cb
           FROM b GROUP BY source, bkt),
    l1 AS (SELECT source,
                  SUM(ABS(COALESCE(ca, 0) - COALESCE(cb, 0))) AS l1_len_drift
           FROM ha FULL JOIN hb USING (source, bkt) GROUP BY source),
    sa AS (SELECT source, COUNT(*) AS docs_a,
                  ROUND(SUM(n_chars)::DOUBLE / COUNT(*), 2) AS mean_nchars_a
           FROM a GROUP BY source),
    sb AS (SELECT source, COUNT(*) AS docs_b,
                  ROUND(SUM(n_chars)::DOUBLE / COUNT(*), 2) AS mean_nchars_b
           FROM b GROUP BY source),
    ad AS (SELECT source, COUNT(*) AS added FROM b
           WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.doc_id = b.doc_id)
           GROUP BY source),
    rm AS (SELECT source, COUNT(*) AS removed FROM a
           WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.doc_id = a.doc_id)
           GROUP BY source)
    SELECT source,
           COALESCE(docs_a, 0)::BIGINT AS docs_a,
           COALESCE(docs_b, 0)::BIGINT AS docs_b,
           COALESCE(added, 0)::BIGINT AS added,
           COALESCE(removed, 0)::BIGINT AS removed,
           COALESCE(l1_len_drift, 0)::BIGINT AS l1_len_drift,
           mean_nchars_a, mean_nchars_b
    FROM sa FULL JOIN sb USING (source)
         LEFT JOIN ad USING (source) LEFT JOIN rm USING (source)
         LEFT JOIN l1 USING (source)
    """,
)
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus drift monitoring — the daily
    data-quality readout a 100 TB ingest pipeline runs BEFORE training
    on a refreshed corpus: per source, how many documents appeared /
    disappeared, and whether the length DISTRIBUTION moved (L1 distance
    between floor-log2 length histograms — a cheap, exact
    total-variation proxy that catches a scraper suddenly emitting
    truncated pages even when row counts look flat).

    The checked op derives snapshot B from A deterministically (7th doc
    deleted, 5th re-ingested with a remapped id and +37 chars) so both
    engines see the same pair; ``drift_report`` itself is generic over
    any two (doc_id, source, n_chars) frames — q_copy_diff answers
    WHICH rows changed, this answers whether the corpus SHAPE moved."""
    cols = ["doc_id", "source", "n_chars"]
    a = load_table(spark, sf_dir, "documents").select(*cols)
    b = a.where(F.col("doc_id") % 7 != 0).unionByName(
        a.where(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + F.lit(_DRIFT_NEW_OFFSET)).alias("doc_id"),
            "source",
            (F.col("n_chars") + F.lit(_DRIFT_LEN_SHIFT)).alias("n_chars"),
        )
    )
    return drift_report(a, b)


_L_DIV = 3


@register(
    "q_l_diversity",
    oracle=f"""
    WITH q AS (
      SELECT lang, (n_chars // 100) * 100 AS len_bucket, source
      FROM documents),
    g AS (SELECT lang, len_bucket,
                 COUNT(*) AS grp_n,
                 COUNT(DISTINCT source) AS l
          FROM q GROUP BY lang, len_bucket)
    SELECT lang,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN l < {_L_DIV} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_div_groups,
           CAST(SUM(CASE WHEN l < {_L_DIV} THEN grp_n ELSE 0 END)
                AS BIGINT) AS n_exposed_docs,
           CAST(MIN(l) AS BIGINT) AS min_l,
           CAST(SUM(grp_n) AS BIGINT) AS n_docs
    FROM g GROUP BY lang
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity risk report — k-anonymity's complement
    (q_k_anonymity): a group can be large (k-safe) yet HOMOGENEOUS in
    its sensitive attribute, so membership alone discloses the value
    (the homogeneity attack). Quasi-identifiers here are (lang,
    100-char length bucket); ``source`` plays the sensitive attribute;
    a group is risky when it carries fewer than l=3 distinct sensitive
    values. Per language: group counts, low-diversity group count, the
    documents they expose, and the worst (minimum) l.

    Scale shape: identical to the k-anon plan — a first aggregation
    keyed by the QI tuple (the COUNT(DISTINCT source) expands to a
    two-level aggregate, still map-side-combining on (QI, source)),
    then a second over the tiny per-group table. All-integer output, no
    float surface at all."""
    d = load_table(spark, sf_dir, "documents")
    g = (
        d.select(
            "lang",
            (F.floor(F.col("n_chars") / 100) * 100).alias("len_bucket"),
            "source",
        )
        .groupBy("lang", "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("grp_n"),
            F.countDistinct("source").alias("l"),
        )
    )
    low = F.col("l") < _L_DIV
    return g.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(low, 1).otherwise(0)).cast("bigint").alias("n_low_div_groups"),
        F.sum(F.when(low, F.col("grp_n")).otherwise(0))
        .cast("bigint")
        .alias("n_exposed_docs"),
        F.min("l").cast("bigint").alias("min_l"),
        F.sum("grp_n").cast("bigint").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# q_sample_weighted — deterministic weighted sampling without
# replacement (Efraimidis–Spirakis), r11.
# --------------------------------------------------------------------------

_WSAMPLE_K = 5  # documents is 500 rows / ~20 sources: k=5 keeps a real ~20% sample
#: 2^60 — the md5-derived key below is 15 hex chars = 60 bits.
_WSAMPLE_DEN = float(1 << 60)


@register(
    "q_sample_weighted",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ln((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                             1, 15)) AS BIGINT) + 1)
                / {_WSAMPLE_DEN}) / n_chars AS es_key_raw
      FROM documents WHERE n_chars > 0),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY es_key_raw DESC, doc_id ASC)
                  AS sample_rank
      FROM keyed)
    SELECT source, doc_id, n_chars,
           (round(es_key_raw, 6) + 0.0) AS es_key,
           CAST(sample_rank AS BIGINT) AS sample_rank
    FROM ranked WHERE sample_rank <= {_WSAMPLE_K}
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, top-{_WSAMPLE_K} per
    source — the quality-weighted data-selection step (sample longer /
    higher-scoring documents proportionally more, per corpus slice).
    Algorithm: Efraimidis–Spirakis reservoir keys — rank by
    ln(u)/w descending, u ∈ (0,1] uniform per item, w the weight
    (n_chars here) — which yields exactly the weighted-without-
    replacement distribution; implemented DETERMINISTICALLY: u derives
    from the portable md5 60-bit idiom (dedup.py), so the same doc
    always draws the same u and two engines (or two runs over a
    repartitioned corpus) select the SAME sample — ``df.sample``'s
    per-partition RNG can do neither. ln and the /w division are
    single identical IEEE ops on identical doubles; ranks tie-break on
    doc_id; the rounded key output goes through rz() (ln(u) ≤ 0, so a
    u near 1 rounds to zero FROM BELOW — the exact signed-zero
    boundary the r11 convention pins).

    Scale shape (100 TB): keys compute scan-side (no shuffle), the
    per-source top-k is one window shuffle on source — or, at extreme
    group cardinality, TakeOrdered per group via partial top-k
    (WindowGroupLimit pushes the k={_WSAMPLE_K} heap map-side automatically on
    Spark 3.5+/4.x, so the exchange carries ≤k·partitions rows per
    source, not the corpus)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("n_chars") > 0)
        .select("source", "doc_id", "n_chars")
    )
    h = (
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)"
            " as bigint)"
        )
        + 1
    )
    key = F.log(h / F.lit(_WSAMPLE_DEN)) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(
        F.col("es_key_raw").desc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("es_key_raw", key)
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("sample_rank") <= _WSAMPLE_K)
        .select(
            "source",
            "doc_id",
            "n_chars",
            rz("es_key_raw", 6).alias("es_key"),
            "sample_rank",
        )
    )


# --------------------------------------------------------------------------
# q_sample_reservoir (r12): exact-n GLOBAL uniform sample without
# replacement — "give me exactly N documents for the eval set".
# --------------------------------------------------------------------------

#: global sample size: 100 < the 500 docs even at sf0.001, so the limit
#: is a real selection (not the whole table) at every test SF.
_RESERVOIR_N = 100


@register(
    "q_sample_reservoir",
    oracle=f"""
    SELECT doc_id, source, n_chars,
           CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS res_key
    FROM documents
    ORDER BY res_key ASC, doc_id ASC
    LIMIT {_RESERVOIR_N}
    """,
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N global uniform sample without replacement — the
    fixed-budget selection every eval/holdout build needs ("exactly
    100 docs, same 100 every run, any cluster size"). Algorithm: each
    row draws a deterministic 60-bit key from the portable md5 idiom
    (a pure function of doc_id — the same key on every engine, run,
    and partitioning), and the sample is the N smallest keys. That is
    distribution-identical to one pass of uniform reservoir sampling,
    but stateless and rerun-stable where a classic reservoir (or
    ``df.sample``'s per-partition RNG) is neither.

    Scale shape (100 TB): keys compute scan-side; orderBy+limit
    compiles to TakeOrderedAndProject — a PER-PARTITION top-N heap
    (N rows retained per task) merged once at the driver, so the
    exchange carries N·partitions rows, never the corpus, and there
    is NO global sort. Plan-pinned in tests/test_plans.py. Contrast
    q_sample_hash (approximate fraction, keeps ~p% — unbounded output
    size) and q_sample_weighted (per-group, weighted): this is the
    exact-cardinality global variant that completes the family.
    Determinism: md5 keys are unique in practice; the (res_key,
    doc_id) compound order makes the cut total regardless."""
    key = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)"
        " as bigint)"
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .withColumn("res_key", key)
        .orderBy(F.col("res_key").asc(), F.col("doc_id").asc())
        .limit(_RESERVOIR_N)
    )


#: epoch-repeat sampling granularity: the fractional epoch is decided
#: by a hash threshold on [0, _EPOCH_GRAN) — 1/10000 resolution keeps
#: the realized rate within 0.01% of the target factor. Runtime-read
#: (mutation-pinned in tests/test_oracle_sensitivity).
_EPOCH_GRAN = 10_000

#: portable doc hash folded to [0, _EPOCH_GRAN) — the finer-grained
#: sibling of _PCT/_D_PCT above.
_EPOCH_PCT = (
    "pmod(cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint),"
    " 10000)"
)
_EPOCH_D_PCT = (
    "(CAST(concat('0x', substring(md5({x}), 1, 15)) AS BIGINT) % 10000)"
)


@register(
    "q_sample_epochs",
    oracle=f"""
    WITH t AS (SELECT source,
                      CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                        AS tokens
               FROM documents GROUP BY source),
    tot AS (SELECT SUM(pow(tokens, {_MIX_ALPHA})) AS raw_tot,
                   SUM(tokens) AS tok_tot
            FROM t),
    f AS (SELECT source,
                 (pow(tokens, {_MIX_ALPHA}) / raw_tot)
                   / (tokens / (1.0 * tok_tot)) AS factor
          FROM t CROSS JOIN tot),
    ff AS (SELECT source,
                  CAST(FLOOR(factor) AS BIGINT) AS base,
                  CAST(FLOOR((factor - FLOOR(factor)) * {_EPOCH_GRAN}
                             + 0.5) AS BIGINT) AS thresh
           FROM f),
    n AS (SELECT d.doc_id, d.source,
                 ff.base + CASE WHEN
                   {_EPOCH_D_PCT.format(x="CAST(d.doc_id AS VARCHAR)")}
                     < ff.thresh THEN 1 ELSE 0 END AS n_copies
          FROM documents d JOIN ff USING (source))
    SELECT doc_id, source, n_copies,
           CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS epoch
    FROM n WHERE n_copies > 0
    """,
)
def q_sample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE the temperature mixture: materialize each document's
    per-epoch occurrences under the tokens^α (α={_MIX_ALPHA}) sampling
    rule that q_mixture_weights only REPORTS — every doc in source s
    appears floor(factor_s) times plus one more iff its hash lands
    under the fractional remainder (factor = the upsample multiple vs
    proportional sampling; factor < 1 means some docs drop entirely).
    This is the multilingual/low-resource epoch-repeat move (XLM-R
    style) as a deterministic dataset transform: the emitted
    (doc_id, epoch) stream IS the training-order input.

    Scale shape (100 TB): ONE two-phase token aggregate (shuffle
    carries |sources| rows), the |sources|-row factor table broadcast
    back onto the corpus, map-side n_copies and a bounded
    sequence-explode (≤⌈factor⌉ rows per doc) — the corpus is scanned
    once and never shuffled.

    Determinism: repeats are a pure function of (doc_id, source
    token count) via the portable md5 hash — stable across runs,
    engines, and repartitioning; corpus growth only moves docs whose
    hash sits within the factor delta. The float factor is quantized
    to an integer threshold on [0, {_EPOCH_GRAN}) (round-half-up), so
    a last-ulp pow/division disagreement between engines flips the
    threshold only if the scaled fraction lies within an ulp of a
    half-integer (~1e-12 likelihood per source — the q_mixture_weights
    4dp-rounding argument, one notch finer)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("tokens")
    )
    raw = F.pow(F.col("tokens").cast("double"), F.lit(_MIX_ALPHA))
    tot = t.agg(
        F.sum(raw).alias("raw_tot"),
        F.sum("tokens").alias("tok_tot"),
    )
    factor = (raw / F.col("raw_tot")) / (
        F.col("tokens").cast("double") / F.col("tok_tot")
    )
    ff = (
        t.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.floor(factor).cast("bigint").alias("base"),
            F.floor((factor - F.floor(factor)) * _EPOCH_GRAN + 0.5)
            .cast("bigint")
            .alias("thresh"),
        )
    )
    pct = F.expr(_EPOCH_PCT.format(x="cast(doc_id as string)"))
    n = d.select("doc_id", "source").join(F.broadcast(ff), "source").select(
        "doc_id",
        "source",
        (
            F.col("base")
            + F.when(pct < F.col("thresh"), 1).otherwise(0)
        ).alias("n_copies"),
    )
    return (
        n.where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            "n_copies",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies")))
            .alias("epoch"),
        )
    )

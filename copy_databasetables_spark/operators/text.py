"""§2.10 Text analysis for training-data pipelines.

Seven operators over ``documents``, all builtin-expression (JVM) code:
word counts, tf-idf, corpus stats, n-grams, language-ID, quality
scoring, token counting, and rolling-hash fingerprinting.

Scale notes (100 TB): everything here is a scan + one aggregation —
the canonical map-heavy/reduce-light shape. The explode operators
multiply rows ~40× *inside the scan stage* (Generate), then partial
aggregation collapses them before the shuffle, so the wire carries
(token → partial count) pairs, never raw token rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register
from copy_databasetables_spark.operators._helpers import ckpt

#: Spark/DuckDB portable 60-bit hash (see dedup.py).
_H = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
_D_H = "CAST(concat('0x', substring(md5({x}), 1, 15)) AS BIGINT)"


@register(
    "q_text_wordcount",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 50
    """,
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies, top-50 (count desc, token asc tie-break
    makes the k-set deterministic)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(50)
    )


@register(
    "q_text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf,
           round(ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0, 6) AS idf,
           round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf per (doc, term), smoothed idf = ln((N+1)/(df+1)) + 1.
    Shape at scale: ONE tokenize+explode pass (r15) — df derives from
    the tf table (one row per (doc, term), so a plain row count per
    term IS the distinct-doc count; guide §2.3 aggregate-then-derive),
    and the materialized tf frame feeds both the df aggregate and the
    final join, so the corpus tokenization cannot re-run per branch.
    The df side is |vocab| rows → broadcast back onto tf."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = ckpt(
        tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    idf_raw = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(idf_raw, 6).alias("idf"),
            F.round(F.col("tf") * idf_raw, 6).alias("tfidf"),
        )
    )


@register(
    "q_text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           (CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)) AS avg_chars,
           (CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*)) AS avg_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        (
            F.sum(F.size(F.split(F.col("text"), " "))).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_tokens"),
        F.count_distinct("source").alias("n_sources"),
    )


@register(
    "q_text_ngrams",
    oracle="""
    SELECT bigram, COUNT(*) AS n
    FROM (
      SELECT UNNEST(list_transform(range(1, len(string_split(text, ' '))),
                    i -> string_split(text, ' ')[i] || ' ' ||
                         string_split(text, ' ')[i + 1])) AS bigram
      FROM documents)
    GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 30
    """,
)
def q_text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram frequencies via array slicing (multiset — duplicates count),
    top-30 with deterministic tie-break."""
    d = load_table(spark, sf_dir, "documents")
    # let-binding idiom (dedup.py's HOF-inlining fix): bind the token
    # array ONCE per row as a lambda variable — a bare split() inside
    # the lambda re-splits the whole text per element (O(len²)/doc).
    bigrams = F.expr(
        "element_at(transform(array(split(text,' ')), ts -> "
        "transform(slice(ts, 1, size(ts) - 1), "
        "(t, i) -> concat(t, ' ', ts[i + 1]))), 1)"
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(30)
    )


@register(
    "q_text_langid",
    oracle="""
    WITH tok AS (
      SELECT lang, UNNEST(string_split(lower(text), ' ')) AS term FROM documents),
    prof AS (
      SELECT lang, term FROM (
        SELECT lang, term, row_number() OVER (
                 PARTITION BY lang ORDER BY COUNT(*) DESC, term ASC) AS rn
        FROM tok GROUP BY lang, term)
      WHERE rn <= 10),
    profiles AS (
      SELECT lang AS cand_lang, list(term ORDER BY term) AS marker FROM prof GROUP BY lang),
    scored AS (
      SELECT d.doc_id, d.lang, p.cand_lang,
             len(list_intersect(list_distinct(string_split(lower(d.text), ' ')),
                                p.marker)) AS score
      FROM documents d CROSS JOIN profiles p),
    best AS (
      SELECT doc_id, lang, cand_lang AS predicted_lang, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cand_lang ASC) AS rn
      FROM scored)
    SELECT doc_id, lang, predicted_lang, score FROM best WHERE rn = 1
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by corpus-trained token profiles: the 10 most frequent
    tokens per language form that language's marker set; each document is
    scored by marker overlap and assigned the argmax language (ties →
    smaller lang code). The n-gram-profile scoring pattern of real
    lang-ID, trained on the corpus itself so it stays self-contained."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("term"))
    rn_w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("term").asc())
    profiles = (
        tok.groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(rn_w))
        .where(F.col("rn") <= 10)
        .groupBy(F.col("lang").alias("cand_lang"))
        .agg(F.array_sort(F.collect_list("term")).alias("marker"))
    )
    scored = (
        d.select(
            "doc_id",
            "lang",
            F.array_distinct(F.split(F.lower("text"), " ")).alias("toks"),
        )
        .crossJoin(F.broadcast(profiles))
        .select(
            "doc_id",
            "lang",
            "cand_lang",
            F.size(F.array_intersect("toks", "marker")).alias("score"),
        )
    )
    best_w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand_lang").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(best_w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("cand_lang").alias("predicted_lang"), "score")
    )


@register(
    "q_text_quality",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(lower(text), ' '),
                 x -> x IN ('the', 'a', 'of', 'and', 'or', 'in', 'to'))) AS n_stop,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct
      FROM documents)
    SELECT doc_id, n_tokens,
           (CAST(n_chars AS DOUBLE) - (n_tokens - 1)) / n_tokens AS avg_token_len,
           CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           round(least(n_tokens / 100.0, 1.0) * 0.5
                 + (1.0 - CAST(n_punct AS DOUBLE) / n_chars) * 0.3
                 + least(CAST(n_stop AS DOUBLE) / n_tokens * 5.0, 1.0) * 0.2,
                 6) AS quality_score
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality scoring: length, punctuation density,
    stopword ratio → composite [0,1] score — the cheap pre-filter stage
    of a training-data pipeline (drop score < threshold before any
    model-based scoring)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_stop = F.size(
        F.filter(
            F.split(F.lower("text"), " "),
            lambda x: x.isin("the", "a", "of", "and", "or", "in", "to"),
        )
    )
    n_punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
    punct_ratio = n_punct.cast("double") / F.col("n_chars")
    stop_ratio = n_stop.cast("double") / n_tokens
    score = (
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.5
        + (1.0 - punct_ratio) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        ((F.col("n_chars").cast("double") - (n_tokens - 1)) / n_tokens).alias(
            "avg_token_len"
        ),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


@register(
    "q_text_token_count",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(text, '\s+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
           CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_llm_est
    FROM documents
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, a BPE-ish lexer regex
    (letter runs | digit runs | single punctuation), and the chars/4
    LLM-token estimate."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
            )
        ).alias("n_bpe_tokens"),
        F.ceil(F.col("n_chars") / 4.0).alias("n_llm_est"),
    )


@register(
    "q_text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
               i -> {_D_H.format(x="toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")})
               AS hashes
      FROM t)
    SELECT doc_id,
           list_min(hashes) AS fingerprint,
           len(list_distinct(hashes)) AS n_shingles
    FROM sh
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: hash every 3-token shingle
    (the rolling window) and keep the minimum — a 1-hash MinHash, the
    core of winnowing-style fingerprint indexes. Identical md5-derived
    integers on both engines."""
    d = load_table(spark, sf_dir, "documents")
    # let-binding idiom — see q_text_ngrams: bind the lowered token
    # array once per row instead of re-splitting per shingle.
    shingle_hashes = F.expr(
        "element_at(transform(array(split(lower(text),' ')), ts -> "
        "transform(slice(ts, 1, size(ts) - 2), "
        "(t, i) -> " + _H.format(
            x="concat(t, ' ', ts[i + 1], ' ', ts[i + 2])"
        )
        + ")), 1)"
    )
    return d.select(
        "doc_id",
        F.array_min(shingle_hashes).alias("fingerprint"),
        F.size(F.array_distinct(shingle_hashes)).alias("n_shingles"),
    )


_FUZZY_D = 2  # max edit distance for a fuzzy match
_FUZZY_SAMPLE = "c_custkey % 7 = 0"  # deterministic "incoming batch"


@register(
    "q_text_fuzzy_match",
    oracle=f"""
    WITH s AS (SELECT c_custkey, c_name FROM customer WHERE {_FUZZY_SAMPLE})
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM s a JOIN s b
      ON a.c_custkey < b.c_custkey
     AND abs(length(a.c_name) - length(b.c_name)) <= {_FUZZY_D}
    WHERE levenshtein(a.c_name, b.c_name) <= {_FUZZY_D}
    """,
)
def q_text_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record matching (edit distance ≤ 2 between entity names) —
    the record-linkage primitive behind deduplicating customer/title
    registries that exact and token dedup both miss (typos, digit
    transpositions). Spark's ``levenshtein`` and DuckDB's agree exactly
    (probed on indel/substitution/empty cases).

    Blocking: the length band |len(a)−len(b)| ≤ d is SOUND (edit
    distance ≥ length difference). The remaining in-band pair join is
    quadratic over the batch — correct for the matching-a-batch shape
    here (deterministic sample as the "incoming" side); full-corpus
    fuzzy self-join at 100 TB partitions by q-gram signatures
    (PassJoin-style), which trades the exactly-mirrorable oracle away,
    so this operator keeps the exact small-batch form."""
    s = (
        load_table(spark, sf_dir, "customer")
        .where(_FUZZY_SAMPLE)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("c_custkey", "c_name", F.length("c_name").alias("ln"))
    )
    a = s.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        F.col("ln").alias("ln_a"),
    )
    b = s.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        F.col("ln").alias("ln_b"),
    )
    return (
        a.join(
            b,
            (F.col("custkey_a") < F.col("custkey_b"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= _FUZZY_D),
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("edit_dist") <= _FUZZY_D)
        .select("custkey_a", "custkey_b", "edit_dist")
    )


@register(
    "q_text_anonymize",
    oracle="""
    SELECT c_custkey,
           substring(sha256(c_name), 1, 16) AS name_token,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band,
           c_mktsegment
    FROM customer
    """,
)
def q_text_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic anonymization for training-data export: direct
    identifiers are replaced by a keyed-hash token (same input → same
    token, so joins across anonymized tables still work — sha256
    truncated to 64 bits here; production adds a secret salt), and the
    quasi-identifying numeric column is generalized to coarse bands
    (k-anonymity-style generalization). Pure JVM expressions — the
    masking pass adds no shuffle and pipelines into any export scan."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring(F.sha2(F.col("c_name"), 256), 1, 16).alias("name_token"),
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        "c_mktsegment",
    )


@register(
    "q_text_boilerplate",
    oracle="""
    SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' '))
               AS prefix_hash,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/template detection: documents sharing an identical
    8-token prefix form a template group (headers, licence banners,
    scraped navigation chrome — the stuff near-dedup misses because the
    BODIES differ). Groups by the md5 of the prefix so the shuffle key
    is 16 bytes regardless of document size — the same hash-first-
    group-second discipline as q_dedup_exact; only groups with >1 doc
    survive (the group-by itself is the detector)."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
    return (
        d.groupBy(F.md5(prefix).alias("prefix_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


_CHUNK = 32
_STRIDE = 24


@register(
    "q_text_chunk",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                      len(string_split(text, ' ')) AS n
               FROM documents),
    nc AS (SELECT doc_id, toks, n,
                  1 + CAST(CEIL(GREATEST(n - {_CHUNK}, 0) / {_STRIDE}.0)
                           AS INT) AS n_chunks
           FROM t),
    ex AS (SELECT doc_id, toks, n,
                  CAST(UNNEST(range(n_chunks)) AS INT) AS chunk_idx
           FROM nc)
    SELECT doc_id, chunk_idx,
           md5(array_to_string(
               toks[chunk_idx * {_STRIDE} + 1 :
                    chunk_idx * {_STRIDE} + {_CHUNK}], ' ')) AS chunk_hash,
           len(toks[chunk_idx * {_STRIDE} + 1 :
                    chunk_idx * {_STRIDE} + {_CHUNK}]) AS n_tokens
    FROM ex
    """,
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking — split each document into 32-token
    chunks with a 24-token stride (8-token overlap), the standard
    pre-tokenization step that turns raw
    documents into fixed-budget training samples. Every token lands in
    at least one chunk; the final chunk may be short (no padding here —
    padding is the tokenizer's job).

    Shape: chunk offsets come from ``sequence``+``explode`` computed
    per row — embarrassingly parallel, zero shuffle, and the 1→N
    expansion happens AFTER the scan so Parquet still prunes to the two
    needed columns. Output carries the md5 of the chunk (16 bytes) so
    downstream exact-dedup of chunks shuffles hashes, not text; n_tokens
    exposes the ragged tail."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - _CHUNK, F.lit(0)) / F.lit(float(_STRIDE))).cast(
            "int"
        )
    )
    ex = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_idx") * _STRIDE + 1, _CHUNK)
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        F.size(chunk).alias("n_tokens"),
    )


@register(
    "q_text_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                      len(string_split(text, ' ')) AS n
               FROM documents),
    g AS (SELECT doc_id, n, toks,
                 list_transform(range(1, n), i -> toks[i] || ' ' || toks[i + 1])
                     AS grams
          FROM t)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           round(len(list_distinct(toks)) / CAST(n AS DOUBLE), 6)
               AS distinct_ratio,
           round(list_max(list_transform(list_distinct(toks),
                     u -> len(list_filter(toks, x -> x = u))))
                 / CAST(n AS DOUBLE), 6) AS top_token_frac,
           CASE WHEN n < 2 THEN 0.0
                ELSE round((len(grams) - len(list_distinct(grams)))
                           / CAST(len(grams) AS DOUBLE), 6) END
               AS dup_bigram_frac
    FROM g
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition scoring (the Gopher-rule family): token
    diversity, the most-frequent-token share, and the fraction of
    duplicated bigrams. High-repetition documents are the boilerplate /
    keyword-stuffing / degenerate-generation bucket that quality
    filtering drops before training.

    Shape: every measure is a higher-order-function expression over the
    per-row token array — array_distinct, filter-count, bigram
    construction all run inside whole-stage codegen with ZERO shuffles
    (contrast q_text_wordcount, which explodes then aggregates
    corpus-wide). The top-token count is O(distinct·n) per row — bounded
    by document length, independent of corpus size, and embarrassingly
    parallel. Ratios are rounded to 6dp on both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    # n=1 must give an EMPTY gram array: sequence(1, 0) in Spark steps
    # DOWNWARD to [1, 0] (not []), and element_at(toks, 0) is an error —
    # guard with an explicit empty array like DuckDB's range(1, 1).
    grams = F.expr(
        "CASE WHEN n < 2 THEN array() "
        "ELSE transform(sequence(1, n - 1), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) END"
    )
    top_cnt = F.expr(
        "array_max(transform(array_distinct(toks), "
        "u -> size(filter(toks, x -> x = u))))"
    )
    g = t.withColumn("grams", grams)
    nd = F.col("n").cast("double")
    return g.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(F.size(F.array_distinct("toks")) / nd, 6).alias("distinct_ratio"),
        F.round(top_cnt / nd, 6).alias("top_token_frac"),
        F.when(F.col("n") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                (F.size("grams") - F.size(F.array_distinct("grams")))
                / F.size("grams").cast("double"),
                6,
            )
        )
        .alias("dup_bigram_frac"),
    )


@register(
    "q_text_lm_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM freq),
    scored AS (
      SELECT t.doc_id, ln(f.cnt / tot.n) AS lp
      FROM tok t JOIN freq f USING (tok), tot)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(-AVG(lp), 4) AS surprisal
    FROM scored GROUP BY doc_id
    """,
)
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score (the CCNet-style LM-filter
    proxy): train the unigram LM on the corpus itself (token → relative
    frequency), then score every document by its mean surprisal
    −avg(ln p(tok)). Low surprisal = templated/common text, high =
    rare-token noise; quality gates keep the middle band.

    Scale: the "LM" is ONE two-phase token count (mappers emit
    |vocab|-bounded partials); scoring is token-stream ⋈ freq on the
    token key — at 100 TB both sides hash-partition on token, then the
    per-doc mean groups on doc_id. Vocab grows ~log(corpus), so the
    freq table is shuffle-joinable at any scale (no broadcast hint; AQE
    may still pick one while it fits). Rounding at 4dp sits far above
    double-summation noise (~1e-12 over ≤10³ tokens/doc)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    # r15: freq feeds two consumers (tot + the score join) — without a
    # materialization each re-ran the corpus tokenize under the
    # aggregate; now the LM trains in one pass (the |vocab|-bounded
    # frame checkpoints; the score join's own token stream is the one
    # unavoidable second pass).
    freq = ckpt(
        tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = freq.agg(F.sum("cnt").cast("double").alias("n"))
    lp = F.log(F.col("cnt") / F.col("n"))
    return (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(-F.avg(lp), 4).alias("surprisal"),
        )
    )


#: BM25 free parameters (the Robertson/Okapi defaults used by Lucene).
_BM25_K1 = 1.2
_BM25_B = 0.75
#: the fixed keyword query the gate scores — three mid-frequency corpus
#: terms so tf AND df both vary across the candidate set.
_BM25_QUERY = ("hash", "merge", "window")
_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_QUERY)
_BM25_TOPN = 20


#: shared by q_text_bm25 and q_text_bm25_persisted — the persisted
#: variant is value-identical by construction (same tokenize, same
#: exact-integer tf/df/dl/N, same float expression shapes; only a
#: parquet round-trip of the index artifacts in between).
_BM25_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term
      FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM dl),
    qtf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
            WHERE term IN ({_BM25_IN})
            GROUP BY doc_id, term),
    qdf AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
            WHERE term IN ({_BM25_IN})
            GROUP BY term),
    scored AS (
      SELECT qtf.doc_id,
             SUM(ln((stats.n_docs - qdf.df + 0.5) / (qdf.df + 0.5) + 1.0)
                 * (qtf.tf * ({_BM25_K1} + 1.0))
                 / (qtf.tf + {_BM25_K1}
                    * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
             ) AS s,
             COUNT(*) AS n_terms_hit
      FROM qtf
      JOIN dl USING (doc_id) CROSS JOIN stats
      JOIN qdf ON qtf.term = qdf.term
      GROUP BY qtf.doc_id)
    SELECT doc_id, round(s, 6) AS bm25, n_terms_hit
    FROM scored
    ORDER BY round(s, 6) DESC, doc_id ASC
    LIMIT {_BM25_TOPN}
    """


@register("q_text_bm25", oracle=_BM25_ORACLE)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: score every document against a fixed
    keyword query and return the top-N — the keyword leg of a hybrid
    (lexical + vector) retrieval stack, and the standard relevance
    baseline for mining topic-targeted training data out of a crawl.

    idf is the Robertson Okapi form ln((N−df+0.5)/(df+0.5)+1); the tf
    leg saturates at k1 and is length-normalized by b·dl/avgdl.

    Scale shape (100 TB): the token stream is scanned ONCE; document
    length and query-term tf come out of it as two partial aggregates
    (dl keyed by doc, tf keyed by (doc, query-term) — the tf side is
    pre-filtered to the |Q| query terms, so it is |Q|·|docs| bounded,
    not |vocab|·|docs|). df and the corpus stats collapse to |Q| rows
    and ONE row respectively and ride broadcasts onto the per-doc
    score; the final top-N is a TakeOrdered, not a global sort. Nothing
    in the plan materializes per-(doc, vocab-term) state, so the wire
    cost is the dl/tf partials — the same map-heavy/reduce-light shape
    as q_text_tfidf.

    Determinism: tf/df/dl/N are exact integers; avgdl is an exact
    integer ratio, so both engines compute bit-identical inputs and the
    only float work is the ln and the ≤|Q|-term sum (ulp-level); ranks
    are decided on the 6dp-rounded score with doc_id as total
    tie-break."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
    # r15 (guide §2.3/§7.2): the r14 shape evaluated the corpus
    # tokenize+explode up to 4× (dl, stats-via-dl, qtf, qdf). Now:
    # dl is size(split(...)) per doc — same integer (explode emits one
    # row per array element, so the group count IS the array size; the
    # isNotNull guard mirrors explode dropping NULL-text docs) with no
    # explode and no shuffle, materialized once for its two consumers;
    # qdf derives from qtf (one row per (doc, term) → row count per
    # term ≡ distinct-doc count); qtf materializes once for its two
    # consumers. Exactly ONE corpus explode pass remains (qtf's).
    dl = ckpt(
        d.select(
            "doc_id", F.size(F.split(F.lower("text"), " ")).alias("dl")
        ).where(F.col("dl").isNotNull())
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtok = tok.where(F.col("term").isin(*_BM25_QUERY))
    qtf = ckpt(
        qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    qdf = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_leg = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        qtf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qdf), "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(idf * tf_leg), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOPN)
        .select("doc_id", "bm25", "n_terms_hit")
    )


@register("q_text_bm25_persisted", oracle=_BM25_ORACLE)
def q_text_bm25_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_text_bm25's index build split out and PERSISTED — the lexical
    counterpart of q_sim_ivf_pq_persisted (r13's amortized-index
    theme): a search engine tokenizes and aggregates the corpus ONCE
    at index build, and every query thereafter touches only its own
    terms' postings. The build writes three artifacts to parquet:

    - ``postings/`` — (term, doc_id, tf, dl): the inverted index,
      DENORMALIZED with the document length so scoring needs no
      corpus-sized doc-length join at query time (the Lucene
      norms-with-postings trade). Repartitioned by term and sorted
      within partitions so parquet row-group min/max stats make the
      query's ``term IN (...)`` predicate prune real I/O — the local
      stand-in for a term-bucketed layout at 10B docs.
    - ``df/`` — (term, df) for EVERY term (an index can't know future
      queries), read back with the same pushed-down term filter.
    - ``stats/`` — the single (n_docs, avgdl) row.

    The query leg reads all three back and pays |Q|-bounded work: a
    pruned postings scan, a |Q|-row df broadcast, the one-row stats
    broadcast, the per-doc score sum, and a TakeOrdered top-N. No
    tokenize, no explode, no corpus-sized read or shuffle at query
    time — plan-pinned (no Generate node; In(term) reaches
    PushedFilters). df per term counts the tf rows (each is one
    distinct (doc, term)) — identical to the base op's
    count_distinct(doc_id). Values are identical to q_text_bm25 by
    construction, which the shared oracle pins.

    Accepted ulp risk (ADVICE r13, noted not "fixed"): the ≤|Q|=3-term
    float score sums in postings-read order here vs shuffle order in
    the base op vs DuckDB's order in the shared oracle. A divergence
    needs a score sitting exactly on a 6dp rounding boundary — none of
    the three orders has ever produced one on this data (attested at 3
    SFs + shuffle-5), and forcing a canonical order (sort_array fold
    or int-quantized contributions) would perturb the base op's
    currently-green boundary behavior for a risk that is last-ulp on a
    3-term sum. If a hash flake ever appears here, quantize the
    per-term contributions in all three places at once."""
    path = _bm25_index_build(spark, sf_dir)
    return _bm25_query_leg(spark, path)


def _bm25_index_build(spark: SparkSession, sf_dir: str) -> str:
    """The BM25 index BUILD leg (amortized at deployment; bench.py
    times it separately so the amortization claim is a standing
    number): tokenize + aggregate the WHOLE corpus once, write
    postings/df/stats. Returns the per-call index path."""
    from copy_databasetables_spark.operators.similarity import (
        _ivf_index_path,
    )

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    # r15: dl is the no-explode size(split(...)) form — see
    # q_text_bm25's comment for the equivalence argument — and df
    # derives from tf (row count per term ≡ distinct-doc count), so
    # the build runs 2 corpus explode passes instead of 4. NO
    # localCheckpoint here: the build is write-bound (three parquet
    # sinks) and an A/B showed the materialization barriers cost more
    # than the saved tokenize passes at every tested size.
    dl = d.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("dl")
    ).where(F.col("dl").isNotNull())
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_all = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    postings = tf.join(dl, "doc_id").select("term", "doc_id", "tf", "dl")
    path = _ivf_index_path(sf_dir, base="/tmp/spark_graft_bm25_index")
    (
        postings.repartition("term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    df_all.write.mode("overwrite").parquet(f"{path}/df")
    stats.write.mode("overwrite").parquet(f"{path}/stats")
    return path


def _bm25_query_leg(spark: SparkSession, path: str) -> DataFrame:
    """The BM25 QUERY leg: |Q|-bounded work against the read-back index
    — pruned postings scan, |Q|-row df broadcast, one-row stats
    broadcast, per-doc sum, TakeOrdered top-N."""
    p = spark.read.parquet(f"{path}/postings").where(
        F.col("term").isin(*_BM25_QUERY)
    )
    qdf = F.broadcast(
        spark.read.parquet(f"{path}/df").where(
            F.col("term").isin(*_BM25_QUERY)
        )
    )
    st = F.broadcast(spark.read.parquet(f"{path}/stats"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_leg = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        p.crossJoin(st)
        .join(qdf, "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(idf * tf_leg), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOPN)
        .select("doc_id", "bm25", "n_terms_hit")
    )


#: the fixed multi-query batch: (query_id, term) — literals shared by
#: both engines; terms span common/rare so df and idf vary per query.
_BM25_BATCH = (
    (0, ("hash", "merge", "window")),
    (1, ("table", "scan", "fast")),
    (2, ("spark", "sort", "batch")),
    (3, ("key", "value", "row")),
    (4, ("slow", "line", "part")),
)
_BM25_BATCH_TOPN = 10

_BM25_BATCH_SQL_ROWS = ", ".join(
    f"({qid}, '{t}')" for qid, terms in _BM25_BATCH for t in terms
)
_BM25_BATCH_TERMS = sorted({t for _, terms in _BM25_BATCH for t in terms})
_BM25_BATCH_IN = ", ".join(f"'{t}'" for t in _BM25_BATCH_TERMS)


@register(
    "q_text_bm25_multi",
    oracle=f"""
    WITH q(query_id, term) AS (VALUES {_BM25_BATCH_SQL_ROWS}),
    tok AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term
      FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM dl),
    qtf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
            WHERE term IN ({_BM25_BATCH_IN})
            GROUP BY doc_id, term),
    qdf AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
            WHERE term IN ({_BM25_BATCH_IN})
            GROUP BY term),
    scored AS (
      SELECT q.query_id, qtf.doc_id,
             SUM(ln((stats.n_docs - qdf.df + 0.5) / (qdf.df + 0.5) + 1.0)
                 * (qtf.tf * ({_BM25_K1} + 1.0))
                 / (qtf.tf + {_BM25_K1}
                    * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
             ) AS s,
             COUNT(*) AS n_terms_hit
      FROM q
      JOIN qtf ON qtf.term = q.term
      JOIN dl USING (doc_id) CROSS JOIN stats
      JOIN qdf ON qdf.term = q.term
      GROUP BY q.query_id, qtf.doc_id),
    ranked AS (
      SELECT query_id, doc_id, round(s, 6) AS bm25, n_terms_hit,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY round(s, 6) DESC, doc_id ASC)
               AS rank_pos
      FROM scored)
    SELECT query_id, doc_id, bm25, n_terms_hit, rank_pos
    FROM ranked WHERE rank_pos <= {_BM25_BATCH_TOPN}
    """,
)
def q_text_bm25_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BM25: a query TABLE (5 queries × 3 terms) ranked against
    the corpus in ONE pass — the production retrieval shape, where
    queries arrive in batches and the engine amortizes the corpus scan
    across all of them instead of rescanning per query
    (q_text_bm25 is the single-query special case).

    Scale shape (100 TB): identical to q_text_bm25 up to the term
    match — dl and per-(doc, matched-term) tf come from one token
    scan, with the tf side pre-filtered to the UNION of all query
    terms (|terms| · |docs| bounded). The query table (|Q| rows) and
    df/stats broadcast onto the scored stream; fan-out to queries is
    the term⋈query-table broadcast join, so adding a query adds join
    fan-out only for ITS terms, never another corpus pass. The
    per-query top-N is a rank window partitioned by query_id —
    |queries| independent group-limits, not a global sort."""
    q = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_BATCH for t in terms],
        "query_id int, term string",
    )
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtok = tok.where(F.col("term").isin(_BM25_BATCH_TERMS))
    qtf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    qdf = qtok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_leg = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        qtf.join(F.broadcast(q), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum(idf * tf_leg), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .withColumn("rank_pos", F.row_number().over(w))
        .where(F.col("rank_pos") <= _BM25_BATCH_TOPN)
        .select("query_id", "doc_id", "bm25", "n_terms_hit", "rank_pos")
    )


#: Span width shared with q_dedup_substring (dedup._SUBSTR_K) — the
#: detection and removal halves must agree on what a "span" is.
_STRIP_K = 8


@register(
    "q_text_strip_spans",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS tok,
             len(string_split(text, ' ')) AS n
      FROM documents),
    spans AS MATERIALIZED (
      SELECT doc_id, i,
             {_D_H.format(x=f"array_to_string(list_slice(tok, i, i + {_STRIP_K} - 1), ' ')")} AS h
      FROM t, UNNEST(range(1, GREATEST(n - {_STRIP_K} + 2, 1))) AS u(i)),
    dup AS (SELECT h FROM spans GROUP BY h
            HAVING COUNT(DISTINCT doc_id) > 1),
    cov AS (SELECT DISTINCT s.doc_id, s.i + o.j AS pos
            FROM spans s JOIN dup USING (h),
                 UNNEST(range(0, {_STRIP_K})) AS o(j)),
    toks AS (SELECT doc_id, tok[u.pos] AS tk, u.pos AS pos
             FROM t, UNNEST(range(1, n + 1)) AS u(pos)),
    kept AS (SELECT k.doc_id, k.pos, k.tk FROM toks k
             WHERE NOT EXISTS (SELECT 1 FROM cov c
                               WHERE c.doc_id = k.doc_id AND c.pos = k.pos)),
    agg AS (SELECT doc_id, COUNT(*) AS n_kept,
                   string_agg(tk, ' ' ORDER BY pos) AS cleaned
            FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           t.n::BIGINT AS n_tokens,
           (t.n - COALESCE(a.n_kept, 0))::BIGINT AS n_removed,
           COALESCE(a.cleaned, '') AS cleaned_text
    FROM t LEFT JOIN agg a USING (doc_id)
    """,
)
def q_text_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span REMOVAL — the action half of exact-substring
    dedup (Lee et al. 2022): q_dedup_substring DETECTS cross-document
    duplicated K-token spans; this op actually rebuilds every document
    with all such spans cut, returning the cleaned text plus
    removed-token accounting. The conservative cut-all-occurrences
    policy is the decontamination flavor (no occurrence survives);
    keep-one-canonical is a composition with the survivor pattern
    (q_dedup_survivor) over the span's (min doc_id, min pos) owner.

    Spark shape at 100 TB — O(total tokens) rows end to end, nothing
    quadratic:
      1. one Generate per doc → (pos, token) and (i, span-hash) rows,
         the same row volume as tokenization;
      2. span-hash groupBy with partial aggregation → dup spans
         (unbounded, corpus-dependent: NO broadcast hint, the equi-join
         back shuffles on the 60-bit hash);
      3. covered positions = explode(sequence(i, i+K-1)) + distinct —
         keyed (doc_id, pos), ≤ K× span rows;
      4. left_anti join tokens⟂covered on (doc_id, pos), then one
         per-doc groupBy whose collect_list is bounded by the document
         length — the same per-doc bound tokenization already pays.
    The rebuild sorts (pos, token) structs in-plan (array_sort) so the
    output text is position-exact, not collection-order-dependent."""
    tok = "split(text, ' ')"
    span_str = f"array_join(slice({tok}, i, {_STRIP_K}), ' ')"
    spans_expr = (
        f"case when size({tok}) >= {_STRIP_K} then "
        f"transform(sequence(1, size({tok}) - {_STRIP_K} + 1), "
        f"i -> struct(i as i, {_H.format(x=span_str)} as h)) "
        "else array() end"
    )
    base = ckpt(
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.expr(f"{tok}").alias("tok"),
            F.expr(spans_expr).alias("spans"),
        ),
        # materialized once for the three consumers below; localCheckpoint
        # (not .persist()) so the blocks are freed by the harness's
        # free_ckpts sweep (or ContextCleaner as a fallback) when the
        # result frame is dropped — a CacheManager .persist() here
        # would pin a corpus-sized frame for the session (r7 ADVICE).
        eager=True,
    )
    toks = base.select(
        "doc_id", F.posexplode("tok").alias("pos0", "tk")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tk")
    spans = base.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", F.col("s.i").alias("i"), F.col("s.h").alias("h")
    )
    dup = (
        spans.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("h")
    )
    covered = (
        spans.join(dup, "h")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(_STRIP_K - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, tk))), x -> x.tk)"),
            " ",
        ).alias("cleaned"),
    )
    return (
        base.select("doc_id", F.size("tok").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned_text"),
        )
    )


#: Cascade rule thresholds (integer-exact: every rule is an integer
#: inequality or a set membership — no float division crosses engines).
_CASC_LANG_OK = ("en", "de", "fr", "es")
_CASC_MIN_TOK = 20
_CASC_REP_DEN = 8  # repetition: max token freq >= n_tok / 8
_CASC_LEN_LO = 3   # mean token length < 3  ⟺  sum_len < 3·n_tok
_CASC_LEN_HI = 8   # mean token length > 8  ⟺  sum_len > 8·n_tok


@register(
    "q_quality_cascade",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, lang, string_split(text, ' ') AS tok,
             len(string_split(text, ' ')) AS n_tok,
             list_aggregate(list_transform(string_split(text, ' '),
                                           x -> length(x)), 'sum') AS sum_len
      FROM documents),
    mf AS (SELECT doc_id, MAX(c) AS maxf
           FROM (SELECT doc_id, tk, COUNT(*) AS c
                 FROM (SELECT doc_id, UNNEST(tok) AS tk FROM t)
                 GROUP BY doc_id, tk)
           GROUP BY doc_id),
    flags AS (
      SELECT t.doc_id,
             (lang NOT IN ('en', 'de', 'fr', 'es')) AS f_lang,
             (n_tok < {_CASC_MIN_TOK}) AS f_short,
             (maxf * {_CASC_REP_DEN} >= n_tok) AS f_rep,
             (sum_len < {_CASC_LEN_LO} * n_tok
              OR sum_len > {_CASC_LEN_HI} * n_tok) AS f_len
      FROM t JOIN mf ON mf.doc_id = t.doc_id),
    attributed AS (
      SELECT doc_id, f_lang, f_short, f_rep, f_len,
             CASE WHEN f_lang THEN 'lang'
                  WHEN f_short THEN 'too_short'
                  WHEN f_rep THEN 'repetition'
                  WHEN f_len THEN 'tok_len'
                  ELSE 'SURVIVORS' END AS first_rule
      FROM flags)
    SELECT r.rule,
           COALESCE(fk.first_kills, 0)::BIGINT AS first_kills,
           CASE r.rule
             WHEN 'lang' THEN (SELECT COUNT(*) FROM attributed WHERE f_lang)
             WHEN 'too_short' THEN (SELECT COUNT(*) FROM attributed WHERE f_short)
             WHEN 'repetition' THEN (SELECT COUNT(*) FROM attributed WHERE f_rep)
             WHEN 'tok_len' THEN (SELECT COUNT(*) FROM attributed WHERE f_len)
             ELSE COALESCE(fk.first_kills, 0)
           END::BIGINT AS total_flagged
    FROM (VALUES ('lang'), ('too_short'), ('repetition'),
                 ('tok_len'), ('SURVIVORS')) AS r(rule)
    LEFT JOIN (SELECT first_rule, COUNT(*) AS first_kills
               FROM attributed GROUP BY first_rule) AS fk
      ON fk.first_rule = r.rule
    """,
)
def q_quality_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter CASCADE report — the Gopher/FineWeb-style rule
    pipeline readout: every document is evaluated against an ordered
    rule list (language allowlist → too-short → repetition →
    token-length band) and attributed to the FIRST rule that kills it,
    alongside each rule's order-independent total flag count. The
    first-kill column is what cascade tuning reads (a rule's marginal
    contribution given everything before it); the total column is its
    standalone strength — the pair tells you which rules to reorder or
    drop. Every rule is an integer inequality or set membership, so
    both engines agree bit-for-bit with no float thresholds.

    Scale (100 TB): one corpus scan computes n_tok/sum_len in codegen
    (higher-order aggregate, zero shuffle); the repetition rule's
    max-token-frequency is the wordcount shape — explode with partial
    aggregation on (doc_id, token), then a per-doc max — the only
    shuffle; the report itself is 5 rows."""
    t = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            "lang",
            F.expr("split(text, ' ')").alias("tok"),
        )
        .select(
            "doc_id",
            "lang",
            "tok",
            F.size("tok").alias("n_tok"),
            F.expr(
                "aggregate(transform(tok, x -> length(x)), 0L, (a, x) -> a + x)"
            ).alias("sum_len"),
        )
    )
    maxf = (
        t.select("doc_id", F.explode("tok").alias("tk"))
        .groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("maxf"))
    )
    flags = t.join(maxf, "doc_id").select(
        "doc_id",
        (~F.col("lang").isin(*_CASC_LANG_OK)).alias("f_lang"),
        (F.col("n_tok") < _CASC_MIN_TOK).alias("f_short"),
        (F.col("maxf") * _CASC_REP_DEN >= F.col("n_tok")).alias("f_rep"),
        (
            (F.col("sum_len") < _CASC_LEN_LO * F.col("n_tok"))
            | (F.col("sum_len") > _CASC_LEN_HI * F.col("n_tok"))
        ).alias("f_len"),
    )
    attributed = flags.select(
        "f_lang",
        "f_short",
        "f_rep",
        "f_len",
        F.when(F.col("f_lang"), "lang")
        .when(F.col("f_short"), "too_short")
        .when(F.col("f_rep"), "repetition")
        .when(F.col("f_len"), "tok_len")
        .otherwise("SURVIVORS")
        .alias("first_rule"),
    )
    sums = F.broadcast(
        attributed.agg(
            F.sum(F.col("f_lang").cast("long")).alias("t_lang"),
            F.sum(F.col("f_short").cast("long")).alias("t_short"),
            F.sum(F.col("f_rep").cast("long")).alias("t_rep"),
            F.sum(F.col("f_len").cast("long")).alias("t_len"),
        )
    )
    rules = spark.createDataFrame(
        [("lang",), ("too_short",), ("repetition",), ("tok_len",), ("SURVIVORS",)],
        "rule string",
    )
    first = attributed.groupBy("first_rule").agg(
        F.count(F.lit(1)).alias("first_kills")
    )
    return (
        rules.join(first, rules.rule == first.first_rule, "left")
        .crossJoin(F.broadcast(sums))
        .select(
            "rule",
            F.coalesce("first_kills", F.lit(0)).cast("bigint").alias("first_kills"),
            F.when(F.col("rule") == "lang", F.col("t_lang"))
            .when(F.col("rule") == "too_short", F.col("t_short"))
            .when(F.col("rule") == "repetition", F.col("t_rep"))
            .when(F.col("rule") == "tok_len", F.col("t_len"))
            .otherwise(F.coalesce("first_kills", F.lit(0)))
            .cast("bigint")
            .alias("total_flagged"),
        )
    )


@register(
    "q_text_strip_spans_keep1",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS tok,
             len(string_split(text, ' ')) AS n
      FROM documents),
    spans AS MATERIALIZED (
      SELECT doc_id, i,
             {_D_H.format(x=f"array_to_string(list_slice(tok, i, i + {_STRIP_K} - 1), ' ')")} AS h
      FROM t, UNNEST(range(1, GREATEST(n - {_STRIP_K} + 2, 1))) AS u(i)),
    dup AS (SELECT h FROM spans GROUP BY h
            HAVING COUNT(DISTINCT doc_id) > 1),
    occ AS (SELECT s.doc_id, s.i, s.h,
                   ROW_NUMBER() OVER (PARTITION BY s.h
                                      ORDER BY s.doc_id, s.i) AS occ_rank
            FROM spans s JOIN dup USING (h)),
    cov AS (SELECT DISTINCT o.doc_id, o.i + u.j AS pos
            FROM occ o, UNNEST(range(0, {_STRIP_K})) AS u(j)
            WHERE o.occ_rank > 1),
    toks AS (SELECT doc_id, tok[u.pos] AS tk, u.pos AS pos
             FROM t, UNNEST(range(1, n + 1)) AS u(pos)),
    kept AS (SELECT k.doc_id, k.pos, k.tk FROM toks k
             WHERE NOT EXISTS (SELECT 1 FROM cov c
                               WHERE c.doc_id = k.doc_id AND c.pos = k.pos)),
    agg AS (SELECT doc_id, COUNT(*) AS n_kept,
                   string_agg(tk, ' ' ORDER BY pos) AS cleaned
            FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           t.n::BIGINT AS n_tokens,
           (t.n - COALESCE(a.n_kept, 0))::BIGINT AS n_removed,
           COALESCE(a.cleaned, '') AS cleaned_text
    FROM t LEFT JOIN agg a USING (doc_id)
    """,
)
def q_text_strip_spans_keep1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-canonical duplicated-span removal — the exact Lee et
    al. 2022 policy: for each cross-document duplicated K-token span
    the CANONICAL occurrence (min doc_id, then min start position —
    a total, engine-independent order) survives; every other
    occurrence's positions are cut. A position is removed iff ANY
    non-canonical duplicated-span occurrence covers it, so a canonical
    doc can still lose positions to a DIFFERENT span whose canonical
    lives elsewhere — deterministic, conservative, and exactly
    SQL-expressible (contrast q_text_strip_spans, which cuts ALL
    occurrences — the decontamination flavor).

    Scale shape: identical to q_text_strip_spans plus one rank window
    PARTITIONED BY span hash (state per hash = one counter; hash
    cardinality ≈ distinct spans, fully parallel — never a global
    window). Everything else is the same O(total tokens) explode →
    groupBy → anti-join → per-doc rebuild."""
    tok = "split(text, ' ')"
    span_str = f"array_join(slice({tok}, i, {_STRIP_K}), ' ')"
    spans_expr = (
        f"case when size({tok}) >= {_STRIP_K} then "
        f"transform(sequence(1, size({tok}) - {_STRIP_K} + 1), "
        f"i -> struct(i as i, {_H.format(x=span_str)} as h)) "
        "else array() end"
    )
    base = ckpt(
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.expr(f"{tok}").alias("tok"),
            F.expr(spans_expr).alias("spans"),
        ),
        # materialized once for the three consumers below; localCheckpoint
        # (not .persist()) so the blocks are freed by the harness's
        # free_ckpts sweep (or ContextCleaner as a fallback) when the
        # result frame is dropped — a CacheManager .persist() here
        # would pin a corpus-sized frame for the session (r7 ADVICE).
        eager=True,
    )
    toks = base.select(
        "doc_id", F.posexplode("tok").alias("pos0", "tk")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tk")
    spans = base.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", F.col("s.i").alias("i"), F.col("s.h").alias("h")
    )
    dup = (
        spans.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("h")
    )
    occ_w = Window.partitionBy("h").orderBy(
        F.col("doc_id").asc(), F.col("i").asc()
    )
    covered = (
        spans.join(dup, "h")
        .withColumn("occ_rank", F.row_number().over(occ_w))
        .where(F.col("occ_rank") > 1)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(_STRIP_K - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, tk))), x -> x.tk)"),
            " ",
        ).alias("cleaned"),
    )
    return (
        base.select("doc_id", F.size("tok").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned_text"),
        )
    )


_PHRASE = ["table", "scan"]  # the registered demo phrase


def phrase_match(docs: DataFrame, phrase: list[str]) -> DataFrame:
    """Positional-index exact-phrase search: (doc_id, n_matches,
    first_pos) for every doc containing ``phrase`` as consecutive
    tokens. Generic over phrase length; counts POSITIONAL occurrences,
    so self-overlapping phrases (repeated words) count every start
    position — the inverted-index convention.

    The 100 TB shape: posexplode the token stream ONCE, then keep only
    the postings of the phrase's terms — the filter runs BEFORE any
    exchange, so the shuffle carries |postings(w_i)| rows (a vocabulary
    -selective phrase moves ~nothing), never the corpus. Each adjacency
    step is an equi-join on (doc_id, aligned position) — k−1 joins for
    a k-term phrase, all on the same doc_id-led key, so one partitioning
    serves every step. This is exactly how a distributed search engine
    intersects posting lists, minus the precomputed index: persist the
    exploded (token, doc_id, pos) table sorted by token to make this a
    true inverted index with partition pruning on the term."""
    if len(phrase) < 2:
        raise ValueError("phrase_match needs >= 2 tokens")
    t = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    # postings of term i, shifted so a phrase start aligns at `pos`
    legs = [
        t.where(F.col("tok") == w).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        for i, w in enumerate(phrase)
    ]
    m = legs[0]
    for leg in legs[1:]:
        m = m.join(leg, ["doc_id", "pos"])
    return m.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("pos").cast("bigint").alias("first_pos"),
    )


@register(
    "q_text_phrase_search",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    p AS (SELECT doc_id, UNNEST(range(1, len(toks))) AS p1, toks FROM t)
    SELECT doc_id,
           COUNT(*) AS n_matches,
           CAST(MIN(p1) - 1 AS BIGINT) AS first_pos
    FROM p
    WHERE toks[p1] = '{_PHRASE[0]}' AND toks[p1 + 1] = '{_PHRASE[1]}'
    GROUP BY doc_id
    """,
)
def q_text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ("table scan") over the corpus via
    posting-list intersection — the retrieval primitive BM25
    (q_text_bm25) can't express: term ADJACENCY. Output: per matching
    doc, the occurrence count and the first match's 0-based token
    position. The oracle enumerates 1-based positions with a DuckDB
    list scan; the Spark side intersects per-term posting lists (see
    phrase_match), which at corpus scale moves only the phrase terms'
    postings through the shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_match(docs, _PHRASE)


_KW_TOP = 3


@register(
    "q_text_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    sc AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6)
               AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n),
    r AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank_pos
      FROM sc)
    SELECT doc_id, term AS keyword, tfidf, rank_pos
    FROM r WHERE rank_pos <= {_KW_TOP}
    """,
)
def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document KEYWORD EXTRACTION: the top-{_KW_TOP} terms by
    tf-idf (q_text_tfidf's corpus statistic turned into the per-doc
    labeling every tagging/faceting pipeline derives from it).
    Ranking runs on the 6-decimal-ROUNDED score with an ascending-term
    tie-break — the rounded values are the cross-engine-identical
    surface the tfidf op's hash already proves, so the top-k selection
    cannot flip on a final-ulp difference the way raw-float ranking
    could. Scale shape: the same two shared-scan aggregations as
    tfidf (df side |vocab| rows, broadcast back), then one
    WindowGroupLimit-pushed top-{_KW_TOP} per doc — the shuffle after
    scoring carries at most {_KW_TOP} surviving rows per (doc,
    mapper)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    idf_raw = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * idf_raw, 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank_pos", F.row_number().over(w))
        .where(F.col("rank_pos") <= _KW_TOP)
        .select("doc_id", F.col("term").alias("keyword"), "tfidf", "rank_pos")
    )


#: entropy quantization scale — runtime-read (mutation-pinned).
_ENT_SCALE = 1_000_000


@register(
    "q_text_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term
      FROM documents),
    tc AS (SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY doc_id, term),
    d AS (SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 COUNT(*) AS n_types,
                 CAST(SUM(CAST(FLOOR(c * ln(c) * 1000000.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS slc_q
          FROM tc GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_types,
           (round(ln(n_tokens)
                  - (CAST(slc_q AS DOUBLE) / 1000000.0) / n_tokens, 6)
            + 0.0) AS entropy_nats
    FROM d
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy — the classic
    repetitiveness/quality signal (low entropy = boilerplate, keyword
    stuffing, degenerate generations; the CCNet/Gopher filter family
    beside q_text_repetition's n-gram ratios): H = ln(n) − Σ c·ln(c)/n
    in nats over the doc's term counts, emitted with the token/type
    counts the ratio filters already use.

    Scale shape (100 TB): explode → ONE (doc, term) groupBy with
    map-side combine → ONE doc groupBy — the q_text_tfidf scan shape,
    no joins, no windows; per-doc state is its distinct-term counts,
    bounded by doc length. Determinism: the Σ c·ln(c) term is summed
    as int64-quantized contributions (floor(x·10⁶+0.5) — exact,
    order-independent, the house _scaled idiom), so shuffle order
    cannot move the hash; ln on identical integer inputs is the same
    accepted last-ulp class as every idf/lm_score log in this file."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tc = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    slc_q = F.sum(
        F.floor(
            F.col("c") * F.log("c") * F.lit(float(_ENT_SCALE)) + F.lit(0.5)
        ).cast("bigint")
    )
    per_doc = tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        slc_q.alias("slc_q"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(
            F.log("n_tokens")
            - (F.col("slc_q").cast("double") / float(_ENT_SCALE))
            / F.col("n_tokens"),
            6,
        ).alias("entropy_nats"),
    )


#: bigram-LM add-k smoothing constant — runtime-read (mutation-pinned).
_LM2_K = 0.5


@register(
    "q_text_lm_bigram",
    oracle=f"""
    WITH bg AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(string_split(text, ' '))),
                    i -> string_split(text, ' ')[i] || ' ' ||
                         string_split(text, ' ')[i + 1])) AS bg
      FROM documents),
    c12 AS (SELECT bg, COUNT(*) AS cnt12 FROM bg GROUP BY bg),
    c1 AS (SELECT string_split(bg, ' ')[1] AS w1,
                  CAST(SUM(cnt12) AS BIGINT) AS cnt1
           FROM c12 GROUP BY w1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v FROM (
        SELECT UNNEST(string_split(text, ' ')) AS term FROM documents)),
    scored AS (
      SELECT bg.doc_id,
             CAST(FLOOR(ln((c12.cnt12 + {{k}}) / (c1.cnt1 + {{k}} * vocab.v))
                        * 1000000.0 + 0.5) AS BIGINT) AS lpq
      FROM bg
      JOIN c12 USING (bg)
      JOIN c1 ON c1.w1 = string_split(bg.bg, ' ')[1]
      CROSS JOIN vocab)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           (round(-(CAST(SUM(lpq) AS DOUBLE) / 1000000.0) / COUNT(*), 6)
            + 0.0) AS surprisal_bigram
    FROM scored GROUP BY doc_id
    """.replace("{k}", "0.5"),
)
def q_text_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score — q_text_lm_score's unigram
    proxy upgraded one Markov order, the shape real LM-filter cascades
    (CCNet's KenLM stage) actually use: train add-k-smoothed bigram
    probabilities on the corpus itself, P(w₂|w₁) = (c₁₂ + k) /
    (c₁ + k·V), and score each doc by mean bigram surprisal
    −avg(ln P). Repetitive/templated text scores low, rare-transition
    noise scores high; quality gates keep the middle band.

    Scale shape (100 TB): bigrams come from the attested in-row slice
    idiom (q_text_ngrams — no position self-join); the "LM" is one
    (bigram → count) two-phase aggregate whose left-context totals
    derive from the SAME counts table (no second corpus pass); scoring
    re-joins the bigram stream on its key — hash-partitionable at any
    scale, vocab ~log(corpus). Determinism: per-bigram log
    contributions are int64-quantized (floor(x·10⁶+0.5), exact
    order-free sums — the house _scaled idiom), so only ln's accepted
    last-ulp class remains; the smoothing constant k and V are exact
    on both sides."""
    d = load_table(spark, sf_dir, "documents")
    # let-binding idiom (dedup.py's HOF-inlining fix): bind the token
    # array ONCE per row as a lambda variable — a bare split() inside
    # the lambda re-splits the whole text per element (O(len²)/doc).
    bigrams = F.expr(
        "element_at(transform(array(split(text,' ')), ts -> "
        "transform(slice(ts, 1, size(ts) - 1), "
        "(t, i) -> concat(t, ' ', ts[i + 1]))), 1)"
    )
    bg = d.select("doc_id", F.explode(bigrams).alias("bg"))
    # r15: c12 feeds the left-context aggregate AND the score join —
    # materialize the |bigram-vocab|-bounded counts once so the corpus
    # bigram pass under it runs once, not per branch.
    c12 = ckpt(
        bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt12"))
    )
    c1 = (
        c12.groupBy(F.split("bg", " ").getItem(0).alias("w1"))
        .agg(F.sum("cnt12").cast("bigint").alias("cnt1"))
    )
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .agg(F.count_distinct("term").cast("double").alias("v"))
    )
    k = float(_LM2_K)
    lpq = F.floor(
        F.log(
            (F.col("cnt12") + F.lit(k)) / (F.col("cnt1") + F.lit(k) * F.col("v"))
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        bg.join(c12, "bg")
        .join(c1, F.split("bg", " ").getItem(0) == F.col("w1"))
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lpq.alias("lpq"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                -(F.sum("lpq").cast("double") / 1000000.0)
                / F.count(F.lit(1)),
                6,
            ).alias("surprisal_bigram"),
        )
    )


#: collocation-mining geometry: pairs must co-occur at least _PMI_MIN
#: times (PMI is unstable on singletons), top _PMI_TOPN by PMI emitted;
#: _PMI_SCALE is the integer rank-key resolution. Runtime-read
#: (mutation-pinned in tests/test_oracle_sensitivity). The rank key
#: n_ab*_PMI_SCALE is computed in 128-bit integer space on BOTH engines
#: (Spark decimal(38,0) `div`, DuckDB HUGEINT `//`) so it cannot wrap
#: at 100 TB: int64 would overflow once a single bigram count exceeds
#: ~9.2e9 (plausible for "of the" at 1e13 corpus tokens), and Spark
#: bigint `div` wraps SILENTLY while DuckDB `//` errors — the two
#: engines would diverge exactly where it matters. 128-bit headroom:
#: n_ab ≤ 1e13 tokens → n_ab*1e9 ≤ 1e22 and n_a*n_b ≤ 1e26, both far
#: inside decimal(38,0)/int128.
_PMI_MIN = 3
_PMI_TOPN = 20
_PMI_SCALE = 1_000_000_000


@register(
    "q_text_collocations",
    oracle=f"""
    WITH bg AS (
      SELECT UNNEST(list_transform(range(1, len(string_split(text, ' '))),
                    i -> string_split(text, ' ')[i] || ' ' ||
                         string_split(text, ' ')[i + 1])) AS bg
      FROM documents),
    c12 AS (SELECT string_split(bg, ' ')[1] AS w1,
                   string_split(bg, ' ')[2] AS w2,
                   CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM bg GROUP BY 1, 2),
    uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_w
            FROM (SELECT UNNEST(string_split(text, ' ')) AS term
                  FROM documents) GROUP BY term),
    tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_tok FROM uni),
    btot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n_bg FROM c12),
    j AS (SELECT c12.w1, c12.w2, c12.n_ab,
                 ua.n_w AS n_a, ub.n_w AS n_b, tot.n_tok, btot.n_bg
          FROM c12
          JOIN uni ua ON ua.term = c12.w1
          JOIN uni ub ON ub.term = c12.w2
          CROSS JOIN tot CROSS JOIN btot
          WHERE c12.n_ab >= {_PMI_MIN})
    SELECT w1, w2, n_ab, n_a, n_b,
           (round(ln((CAST(n_ab AS DOUBLE) * n_tok * n_tok)
                     / (CAST(n_bg AS DOUBLE) * n_a * n_b)), 6) + 0.0)
             AS pmi
    FROM j
    ORDER BY (CAST(n_ab AS HUGEINT) * {_PMI_SCALE})
               // (CAST(n_a AS HUGEINT) * n_b) DESC,
             n_ab DESC, w1 ASC, w2 ASC
    LIMIT {_PMI_TOPN}
    """,
)
def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining — the corpus-level PMI table (Church & Hanks
    1990): rank adjacent word pairs by pointwise mutual information
    ln(p(ab) / (p(a)·p(b))), the standard phrase/multiword-expression
    extractor that tokenizer-vocab builds and phrase-aware dedup both
    start from. Pairs must co-occur ≥{_PMI_MIN} times (PMI explodes on
    hapax pairs); the top {_PMI_TOPN} are emitted with their counts so
    the score is auditable.

    Scale shape (100 TB): bigrams via the in-row slice idiom (no
    position self-join), then TWO key-hashed two-phase aggregates
    (pair counts, token counts) and two vocab-keyed equi-joins —
    everything partitions by word key; the two scalar totals broadcast;
    the final cut is TakeOrdered (per-partition top-N heaps), never a
    global sort.

    Determinism: ranking never touches a float — for fixed corpus
    totals PMI order IS the order of n_ab/(n_a·n_b), compared via the
    int64 key (n_ab·{_PMI_SCALE}) div (n_a·n_b) with (n_ab desc, w1,
    w2) completing a total order; both engines floor-divide exact
    integers. The displayed pmi is one ln on identical exact-integer
    ratios, 6dp-rounded (accepted-ulp class)."""
    d = load_table(spark, sf_dir, "documents")
    # let-binding idiom (dedup.py's HOF-inlining fix): bind the token
    # array once per row; a bare split() in the lambda is O(len²)/doc.
    bigrams = F.expr(
        "element_at(transform(array(split(text,' ')), ts -> "
        "transform(slice(ts, 1, size(ts) - 1), "
        "(t, i) -> concat(t, ' ', ts[i + 1]))), 1)"
    )
    c12_all = (
        d.select(F.explode(bigrams).alias("bg"))
        .groupBy(
            F.split("bg", " ").getItem(0).alias("w1"),
            F.split("bg", " ").getItem(1).alias("w2"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    # the bigram-total normalizer counts ALL pairs; the min-count cut
    # applies only to which pairs are RANKED
    btot = c12_all.agg(F.sum("n_ab").cast("bigint").alias("n_bg"))
    c12 = c12_all.where(F.col("n_ab") >= _PMI_MIN)
    uni = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_w"))
    )
    tot = (
        d.select(F.size(F.split("text", " ")).alias("nt"))
        .agg(F.sum("nt").cast("bigint").alias("n_tok"))
    )
    j = (
        c12.join(
            uni.select(F.col("term").alias("w1"), F.col("n_w").alias("n_a")),
            "w1",
        )
        .join(
            uni.select(F.col("term").alias("w2"), F.col("n_w").alias("n_b")),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
    )
    # 128-bit rank key (see the _PMI_SCALE note): decimal(38,0) keeps
    # n_ab*SCALE exact past the int64 wrap point; `div` on decimals
    # truncates toward zero = DuckDB HUGEINT `//` on non-negatives.
    rank_key = F.expr(
        f"(cast(n_ab as decimal(38,0)) * {_PMI_SCALE}) "
        "div (cast(n_a as decimal(38,0)) * n_b)"
    )
    pmi = F.round(
        F.log(
            (F.col("n_ab").cast("double") * F.col("n_tok") * F.col("n_tok"))
            / (F.col("n_bg").cast("double") * F.col("n_a") * F.col("n_b"))
        ),
        6,
    )
    return (
        j.orderBy(
            rank_key.desc(),
            F.col("n_ab").desc(),
            F.col("w1").asc(),
            F.col("w2").asc(),
        )
        .limit(_PMI_TOPN)
        .select("w1", "w2", "n_ab", "n_a", "n_b", pmi.alias("pmi"))
    )

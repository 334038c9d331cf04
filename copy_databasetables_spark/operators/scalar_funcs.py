"""§2.8 Scalar functions: string / regex / date / math / conditional /
cast-null / array / explode / higher-order / json / map.

All JVM-side builtin expressions inside whole-stage codegen — no Python
in any of these paths (the higher-order functions are the designed
replacement for UDFs on array columns; SURVEY.md §3.2). Per-row scalar
computation is embarrassingly parallel: these operators impose zero
shuffles beyond what their final projection needs.

Oracle parity traps handled here (probed against DuckDB 1.0):
- DuckDB ``ceil``/``floor`` return DECIMAL, ``sign`` TINYINT → cast both
  sides to BIGINT/INT.
- DuckDB ``%`` is remainder (sign of dividend), Spark ``pmod`` is
  non-negative → exercised on non-negative arguments only.
- DuckDB ``epoch()`` returns DOUBLE → CAST AS BIGINT to match Spark's
  ``unix_timestamp``.
- Spark double→int casts truncate while DuckDB rounds → integer casts
  only from already-integral values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register
from copy_databasetables_spark.operators._helpers import ds, rz


@register(
    "q_str_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           trim(concat('  ', p_name, ' ')) AS name_trimmed,
           substring(p_name, 1, 4) AS name_prefix,
           concat_ws('|', p_brand, p_type, p_name) AS joined,
           length(p_name) AS name_len,
           replace(p_name, ' ', '_') AS name_snake,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded
    FROM part
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type", "p_name").alias("joined"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
    )


@register(
    "q_regex",
    oracle=r"""
    SELECT p_partkey, p_name,
           regexp_extract(p_name, '(\w+)$', 1) AS last_word,
           regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled
    FROM part
    WHERE regexp_matches(p_name, '^(red|blue)\s')
    """,
)
def q_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike. NB Spark's
    regexp_replace is global by default; DuckDB needs the 'g' flag."""
    p = load_table(spark, sf_dir, "part")
    return p.where(F.col("p_name").rlike(r"^(red|blue)\s")).select(
        "p_partkey",
        "p_name",
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           dayofweek(o_orderdate) + 1 AS order_dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction + arithmetic. DuckDB's dayofweek is 0-based
    (Sunday=0) vs Spark's 1-based (Sunday=1) — normalized in the oracle;
    both engines clamp month arithmetic to month-end (probed: Jan 31 +
    1 month = Feb 29)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        ds(F.date_trunc("month", F.col("o_orderdate")), "month_start"),
        F.datediff(
            F.lit("2002-01-01").cast("timestamp_ntz"), F.col("o_orderdate")
        ).alias("days_to_2002"),
        ds(F.add_months(F.col("o_orderdate"), 3), "plus3m"),
        ds(F.last_day("o_orderdate"), "month_end"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_sec"),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 1) AS price_r1,
           abs(o_totalprice - 250000.0) AS dist_mid,
           CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           round(power(o_totalprice / 100000.0, 2), 6) AS scaled_sq,
           sqrt(o_totalprice) AS price_sqrt,
           round(ln(o_totalprice), 6) AS price_ln,
           round(log10(o_totalprice), 6) AS price_log10,
           o_orderkey % 7 AS key_mod7,
           CAST(sign(o_totalprice - 250000.0) AS INT) AS side
    FROM orders
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_r1"),
        F.abs(F.col("o_totalprice") - 250000.0).alias("dist_mid"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.floor("o_totalprice").alias("price_floor"),
        F.round(F.pow(F.col("o_totalprice") / 100000.0, 2), 6).alias("scaled_sq"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        # libm vs JVM transcendentals differ in the last ulp — round to
        # 6dp (sqrt is IEEE-correctly-rounded and needs none).
        F.round(F.log(F.col("o_totalprice")), 6).alias("price_ln"),
        F.round(F.log10("o_totalprice"), 6).alias("price_log10"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).alias("key_mod7"),
        F.signum(F.col("o_totalprice") - 250000.0).cast("int").alias("side"),
    )


@register(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 400000.0 THEN 'platinum'
                WHEN o_totalprice >= 250000.0 THEN 'gold'
                WHEN o_totalprice >= 100000.0 THEN 'silver'
                ELSE 'bronze' END AS tier,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS tier_value
    FROM orders
    GROUP BY 1
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    from copy_databasetables_spark.operators._helpers import dsum

    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") >= 400000.0, "platinum")
        .when(F.col("o_totalprice") >= 250000.0, "gold")
        .when(F.col("o_totalprice") >= 100000.0, "silver")
        .otherwise("bronze")
    )
    return (
        o.groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "tier_value"),
        )
    )


@register(
    "q_cast_null",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_orderkey AS INT) AS key_int,
           CAST(CAST(o_orderkey AS INT) AS DOUBLE) AS key_dbl,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           NULLIF(o_orderstatus, 'P') AS status_np,
           COALESCE(NULLIF(o_orderpriority, '5-LOW'), NULLIF(o_orderstatus, 'P'),
                    'fallback') AS first_non_null
    FROM orders
    """,
)
def q_cast_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cast / coalesce / nullif / nvl. Integer casts only from integral
    values (Spark truncates double→int, DuckDB rounds — a real semantic
    difference this engine documents rather than papers over)."""
    o = load_table(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("int").alias("key_int"),
        F.col("o_orderkey").cast("int").cast("double").alias("key_dbl"),
        F.nvl(status_np, F.lit("PENDING")).alias("status_filled"),
        status_np.alias("status_np"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")),
            status_np,
            F.lit("fallback"),
        ).alias("first_non_null"),
    )


@register(
    "q_array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           list_contains(toks, 'join') AS has_join,
           array_to_string(toks[1:3], ' ') AS first3,
           array_to_string(list_sort(list_distinct(toks)), ',') AS vocab_sorted
    FROM t
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split / size / array_contains / slice / array_sort /
    array_distinct over tokenized text; arrays projected to scalars so
    the hash check is representation-independent."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "join").alias("has_join"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("vocab_sorted"),
    )


@register(
    "q_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-generating explode: one output row per token. Explode happens
    inside the scan stage (Generate node) — no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))


@register(
    "q_higher_order",
    oracle="""
    WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
           round(sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')), 4)
             AS l2_norm,
           len(list_filter(v, x -> x > 0)) AS n_positive,
           (round(list_aggregate(v, 'sum'), 4) + 0.0) AS comp_sum,
           (round(list_dot_product(v, list_reverse(v)), 4) + 0.0) AS rev_dot
    FROM t
    """,
)
def q_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / aggregate / zip_with on the embedding column —
    the no-UDF vector-math path (SURVEY.md §3.2): everything stays in
    codegen'd JVM expressions, nothing crosses to Python."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l2 = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    rev_dot = F.aggregate(
        F.zip_with(v, F.reverse(v), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.round(l2, 4).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        rz(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x), 4).alias("comp_sum"),
        rz(rev_dot, 4).alias("rev_dot"),
    )


@register(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k_doubled
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object (string path) + from_json (typed struct path) on
    the props JSON column."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") * 2).alias("k_doubled"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT doc_id,
           'lang,src' AS map_keys_joined,
           lang AS lang_val,
           source AS src_val,
           2 AS map_size
    FROM documents
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map / map_keys / element_at / map_size. The map is built
    from real columns and projected back to scalars, so the oracle can
    state the expected values directly from the base table."""
    d = load_table(spark, sf_dir, "documents")
    m = F.str_to_map(
        F.concat(F.lit("lang:"), F.col("lang"), F.lit(",src:"), F.col("source")),
        F.lit(","),
        F.lit(":"),
    )
    return d.select(
        "doc_id",
        F.array_join(F.map_keys(m), ",").alias("map_keys_joined"),
        F.element_at(m, "lang").alias("lang_val"),
        F.element_at(m, "src").alias("src_val"),
        F.size(m).alias("map_size"),
    )

"""§2.11 UDF / UDAF / UDTF surface.

These exist to prove the extension surface, not because the logic needs
Python — each docstring names the builtin that would replace it in a hot
path (UDFs are the slow path: row-at-a-time Python ~10-100× slower than
Arrow-batched pandas UDFs, which are themselves slower than codegen'd
builtins; SURVEY.md §3.2).

Determinism: Python float arithmetic is IEEE-754 double — identical
per-row results to SQL doubles. Aggregating UDFs use ``math.fsum``
(exactly-rounded sum), which equals the oracle's
``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`` for 2-decimal inputs
regardless of row order.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from copy_databasetables_spark.io import load_table
from copy_databasetables_spark.operators import register


@register(
    "q_udf_python",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python scalar UDF (the full serialization round trip
    per row). Production form: the expression itself, in codegen."""

    @F.udf("double")
    def charge_udf(price: float, disc: float, tax: float) -> float:
        # NB: no Python round() here — it rounds half-to-even while SQL
        # rounds half-away-from-zero; the SQL-side F.round keeps parity.
        return price * (1 - disc) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge_udf("l_extendedprice", "l_discount", "l_tax"), 6).alias("charge"),
    )


@register(
    "q_udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net,
           CASE WHEN l_quantity >= 30 THEN 'bulk' ELSE 'retail' END AS qty_class
    FROM lineitem
    """,
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) pandas UDF: whole columns cross as Arrow
    batches, NumPy does the arithmetic — the right UDF form when Python
    is genuinely required."""

    @pandas_udf("double")
    def net_udf(price: pd.Series, disc: pd.Series) -> pd.Series:
        # raw product; rounding happens SQL-side (pandas .round is
        # half-even on the binary value — not SQL semantics)
        return price * (1.0 - disc)

    @pandas_udf("string")
    def qty_class_udf(qty: pd.Series) -> pd.Series:
        return pd.Series(["bulk" if q >= 30 else "retail" for q in qty])

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net_udf("l_extendedprice", "l_discount"), 4).alias("net"),
        qty_class_udf("l_quantity").alias("qty_class"),
    )


@register(
    "q_udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           (CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
              / CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)) AS price_per_unit
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: revenue-weighted price per unit.
    ``math.fsum`` makes the two sums exactly rounded → row-order
    independent → equal to the oracle's decimal accumulation."""

    @pandas_udf("double")
    def price_per_unit(price: pd.Series, disc: pd.Series, qty: pd.Series) -> float:
        net = (price * (1.0 - disc)).round(6)
        return math.fsum(net) / math.fsum(qty)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        price_per_unit("l_extendedprice", "l_discount", "l_quantity").alias(
            "price_per_unit"
        )
    )


@register(
    "q_udf_grouped_map",
    oracle="""
    SELECT doc_id, lang,
           round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                 / stddev_samp(n_chars) OVER (PARTITION BY lang), 6) AS z_chars
    FROM documents
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group transform via applyInPandas: z-score n_chars within each
    language. Each language's rows arrive as one pandas DataFrame
    (beware group-fits-in-memory at scale — salt or pre-aggregate when a
    group can exceed an executor). Builtin equivalent: window avg/stddev,
    which is exactly what the oracle uses."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "z_chars": ((pdf["n_chars"] - mu) / sd).round(6),
            }
        )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(
        normalize, schema="doc_id bigint, lang string, z_chars double"
    )


@register(
    "q_udtf",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
           UNNEST(string_split(text, ' ')) AS token,
           CAST(length(UNNEST(string_split(text, ' '))) AS INT) AS token_len
    FROM documents
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input doc row → N (pos, token) rows.
    Builtin equivalent: posexplode(split(...)) — the UDTF form is the
    extension point for tokenizers that need real Python (BPE etc.)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, token_len int")
    class Tokenize:
        def eval(self, text: str):  # noqa: ANN001
            for pos, token in enumerate(text.split(" ")):
                yield pos, token, len(token)

    d = load_table(spark, sf_dir, "documents")
    # lateral join: each document row feeds the UDTF
    d.createOrReplaceTempView("udtf_documents")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.token_len
        FROM udtf_documents d,
        LATERAL tokenize_udtf(d.text) t
        """
    )

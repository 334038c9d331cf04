"""The portable-hash contract underpins every dedup/split/sample
operator: Spark's conv(substring(md5(x),1,15),16,10) must equal the
mathematical value int(md5(x)[:15], 16) — checked here against Python's
hashlib as a THIRD independent implementation (the DuckDB side is
exercised by the oracle differential)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_H = "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
@_settings
def test_portable_hash_matches_hashlib(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.expr(_H).alias("h")).collect()}
    for w in words:
        expected = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
        assert got[w] == expected, w


def test_split_percent_is_uniformish(spark):
    """The md5-derived percent bucket must be roughly uniform — a skewed
    bucket function would silently bias every split/sample operator."""
    from copy_databasetables_spark.operators.pipeline import _PCT

    df = spark.range(0, 20_000).select(
        F.expr(_PCT.format(x="cast(id as string)")).alias("pct")
    )
    counts = {r["pct"]: r["n"] for r in df.groupBy("pct").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == set(range(100))
    # each bucket expects 200; allow ±40% (binomial 5+ sigma)
    assert all(120 <= n <= 280 for n in counts.values()), sorted(counts.items())[:5]


def test_schema_to_ddl_not_null(spark):
    from pyspark.sql import types as T

    from copy_databasetables_spark.copy.engine import schema_to_ddl

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), nullable=False),
            T.StructField("v", T.StringType(), nullable=True),
        ]
    )
    ddl = schema_to_ddl(schema, "t")
    assert "k BIGINT NOT NULL" in ddl
    assert "v STRING" in ddl and "v STRING NOT NULL" not in ddl

"""Dual-entry surface (SURVEY.md §3.2): every table is reachable as a
temp view, so §2 operators can be expressed through ``spark.sql`` and
must agree with the DataFrame-API implementations — both APIs build the
same unresolved logical plan and meet in the same Catalyst pipeline."""

from __future__ import annotations

from copy_databasetables_spark.io import TABLES, register_views
from copy_databasetables_spark.operators import all_queries
from tests.conftest import SF_SMOKE


def test_register_views_exposes_all_tables(spark):
    register_views(spark, SF_SMOKE)
    views = {t.name for t in spark.catalog.listTables()}
    assert set(TABLES) <= views


def test_sql_equals_dataframe_flagship(spark):
    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(ROUND(l_quantity * 1000000) AS BIGINT)) AS sq,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = all_queries()["q_agg_group"](spark, SF_SMOKE).selectExpr(
        "l_returnflag",
        "l_linestatus",
        "CAST(ROUND(sum_qty * 1000000) AS BIGINT) AS sq",
        "count_order",
    )
    assert sql.exceptAll(df).count() == 0 and df.exceptAll(sql).count() == 0


def test_sql_equals_dataframe_join(spark):
    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        SELECT c.c_custkey, COUNT(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
        """
    )
    from pyspark.sql import functions as F

    from copy_databasetables_spark.io import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    df = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sql.exceptAll(df).count() == 0 and df.exceptAll(sql).count() == 0

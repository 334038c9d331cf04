"""JDBC option-assembly tests (SURVEY.md §2.1 'unit' rows — no database
is reachable offline, so these pin the option contracts the reference's
copy semantics map onto)."""

from __future__ import annotations

import pytest

from copy_databasetables_spark.sources.jdbc import (
    MSSQL_TO_SPARK,
    JdbcReadSpec,
    JdbcWriteSpec,
)

URL = "jdbc:sqlserver://host;databaseName=db"


def test_read_partitioned_options():
    spec = JdbcReadSpec(
        url=URL,
        table="dbo.orders",
        partition_column="o_orderkey",
        lower_bound=1,
        upper_bound=150_000,
        num_partitions=16,
        fetchsize=5000,
    )
    opts = spec.to_options()
    assert opts["dbtable"] == "dbo.orders"
    assert opts["partitionColumn"] == "o_orderkey"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "150000")
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "5000"


def test_read_query_mode():
    opts = JdbcReadSpec(url=URL, query="SELECT 1 AS x").to_options()
    assert opts["query"] == "SELECT 1 AS x" and "dbtable" not in opts


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(table="t", query="q"),  # both
        dict(),  # neither
        dict(table="t", partition_column="id"),  # partial partition spec
        dict(query="q", partition_column="id", lower_bound=0, upper_bound=1, num_partitions=2),
    ],
)
def test_read_spec_rejects_invalid(kwargs):
    with pytest.raises(ValueError):
        JdbcReadSpec(url=URL, **kwargs).to_options()


def test_write_truncate_overwrite():
    spec = JdbcWriteSpec(
        url=URL, table="dbo.orders", mode="overwrite", truncate=True, batchsize=50_000
    )
    opts = spec.to_options()
    assert opts["truncate"] == "true" and opts["batchsize"] == "50000"


def test_write_rejects_truncate_on_append():
    with pytest.raises(ValueError):
        JdbcWriteSpec(url=URL, table="t", mode="append", truncate=True).to_options()


def test_write_create_table_column_types():
    spec = JdbcWriteSpec(
        url=URL,
        table="t",
        create_table_column_types="o_orderkey BIGINT, o_orderstatus VARCHAR(1)",
    )
    assert "createTableColumnTypes" in spec.to_options()


def test_reader_builds_without_connecting(spark):
    reader = JdbcReadSpec(url=URL, table="t").build(spark)
    assert reader is not None  # lazy: no connection until .load()


def test_mssql_type_map_covers_survey_rows():
    for t in ("bit", "money", "datetime2", "datetimeoffset", "uniqueidentifier", "image"):
        assert t in MSSQL_TO_SPARK
    assert MSSQL_TO_SPARK["datetime"] == "timestamp_ntz"


# ---------------------------------------------------------------------------
# Integration against in-process Apache Derby (shipped with Spark): real
# driver, real DDL/batched-insert/cursor paths — no network needed.
# ---------------------------------------------------------------------------

import os

# per-process db path: stale locks from a killed run otherwise fail the
# next boot with XSDB6
DERBY = f"jdbc:derby:/tmp/spark_graft_derby/t{os.getpid()}_{{n}};create=true"


def test_derby_roundtrip_exact(spark):
    from copy_databasetables_spark.io import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    url = DERBY.format(n="nation")
    JdbcWriteSpec(url=url, table="nation", mode="overwrite").save(src)
    back = JdbcReadSpec(url=url, table="nation").load(spark)
    assert back.count() == 25
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_derby_partitioned_read_has_n_partitions(spark):
    from copy_databasetables_spark.io import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "region")
    url = DERBY.format(n="region")
    JdbcWriteSpec(url=url, table="region", mode="overwrite").save(src)
    df = JdbcReadSpec(
        url=url, table="region", partition_column="r_regionkey",
        lower_bound=0, upper_bound=5, num_partitions=3,
    ).load(spark)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 5


def test_derby_append_vs_overwrite(spark):
    from copy_databasetables_spark.io import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "region")
    url = DERBY.format(n="modes")
    JdbcWriteSpec(url=url, table="modes_t", mode="overwrite").save(src)
    JdbcWriteSpec(url=url, table="modes_t", mode="append").save(src)
    assert JdbcReadSpec(url=url, table="modes_t").load(spark).count() == 10
    JdbcWriteSpec(url=url, table="modes_t", mode="overwrite").save(src)
    assert JdbcReadSpec(url=url, table="modes_t").load(spark).count() == 5


def test_copy_table_jdbc_end_to_end(spark):
    """The reference's whole job over a real JDBC boundary: partitioned
    read from one database, batched write into another."""
    from copy_databasetables_spark.io import load_table
    from copy_databasetables_spark.sources.jdbc import copy_table_jdbc

    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    src_url, dst_url = DERBY.format(n="copysrc"), DERBY.format(n="copydst")
    JdbcWriteSpec(url=src_url, table="nation", mode="overwrite").save(src)
    copy_table_jdbc(
        spark,
        JdbcReadSpec(url=src_url, table="nation", partition_column="n_nationkey",
                     lower_bound=0, upper_bound=25, num_partitions=4),
        JdbcWriteSpec(url=dst_url, table="nation_copy", mode="overwrite", batchsize=10),
    )
    back = JdbcReadSpec(url=dst_url, table="nation_copy").load(spark)
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0

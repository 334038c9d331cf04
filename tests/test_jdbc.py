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

"""SQL Server dialect mapping (SURVEY.md §1.1; VERDICT r5 item 4):
every row of the §1.1 type table gets a unit test, plus the four
edge-case families the generic JDBC defaults get wrong — no server
needed, this is pure schema assembly."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from copy_databasetables_spark.sources.mssql import (
    create_table_column_types,
    mssql_schema_to_struct,
    mssql_to_spark_type,
    parse_mssql_type,
    read_schema_ddl,
    spark_to_mssql_type,
)


# --- the §1.1 table, row by row --------------------------------------------

SURVEY_1_1_ROWS = [
    ("bit", T.BooleanType()),
    ("tinyint", T.IntegerType()),
    ("smallint", T.ShortType()),
    ("int", T.IntegerType()),
    ("bigint", T.LongType()),
    ("decimal(18,4)", T.DecimalType(18, 4)),
    ("numeric(10,2)", T.DecimalType(10, 2)),
    ("money", T.DecimalType(19, 4)),
    ("float", T.DoubleType()),
    ("real", T.FloatType()),
    ("char(10)", T.StringType()),
    ("varchar(255)", T.StringType()),
    ("nchar(10)", T.StringType()),
    ("nvarchar(max)", T.StringType()),
    ("text", T.StringType()),
    ("date", T.DateType()),
    ("datetime", T.TimestampNTZType()),
    ("datetime2", T.TimestampNTZType()),
    ("smalldatetime", T.TimestampNTZType()),
    ("datetimeoffset", T.StringType()),
    ("binary(16)", T.BinaryType()),
    ("varbinary(max)", T.BinaryType()),
    ("image", T.BinaryType()),
    ("uniqueidentifier", T.StringType()),
]


@pytest.mark.parametrize("sql_type,expected", SURVEY_1_1_ROWS)
def test_survey_1_1_row(sql_type, expected):
    assert mssql_to_spark_type(sql_type) == expected


# --- edge-case families ----------------------------------------------------


def test_tinyint_widens_past_byte():
    """T-SQL tinyint is UNSIGNED 0..255 — ByteType (−128..127) would
    truncate half the domain, so the mapping must widen."""
    assert mssql_to_spark_type("tinyint") == T.IntegerType()
    assert mssql_to_spark_type("TINYINT") == T.IntegerType()


def test_money_is_fixed_point_not_float():
    assert mssql_to_spark_type("money") == T.DecimalType(19, 4)
    assert mssql_to_spark_type("smallmoney") == T.DecimalType(10, 4)


def test_decimal_defaults_and_spacing():
    """Bare decimal is decimal(18,0) in T-SQL; precision-only means
    scale 0; internal spacing must not matter."""
    assert mssql_to_spark_type("decimal") == T.DecimalType(18, 0)
    assert mssql_to_spark_type("numeric(12)") == T.DecimalType(12, 0)
    assert mssql_to_spark_type("DECIMAL( 18 , 4 )") == T.DecimalType(18, 4)


def test_datetimeoffset_modes():
    """Default: lossless string (keeps the offset). Opt-in: the Spark 4
    dialect behavior — UTC-normalized TimestampType."""
    assert mssql_to_spark_type("datetimeoffset") == T.StringType()
    assert mssql_to_spark_type("datetimeoffset(7)") == T.StringType()
    assert (
        mssql_to_spark_type("datetimeoffset", datetimeoffset_as_timestamp=True)
        == T.TimestampType()
    )


def test_float_precision_split():
    """float(1..24) is REAL (4 bytes); float(25..53) and bare float are
    IEEE doubles."""
    assert mssql_to_spark_type("float(24)") == T.FloatType()
    assert mssql_to_spark_type("float(25)") == T.DoubleType()
    assert mssql_to_spark_type("float(53)") == T.DoubleType()


def test_tsql_timestamp_is_rowversion():
    """T-SQL 'timestamp' is the ROWVERSION binary counter, NOT a time
    type — mapping it to a temporal type would be a correctness bug."""
    assert mssql_to_spark_type("timestamp") == T.BinaryType()
    assert mssql_to_spark_type("rowversion") == T.BinaryType()


def test_unknown_type_raises_never_guesses():
    with pytest.raises(ValueError):
        mssql_to_spark_type("geography")
    with pytest.raises(ValueError):
        parse_mssql_type("???")


# --- schema assembly (the read path) ---------------------------------------

_CATALOG = [
    ("id", "int", False),
    ("guid", "uniqueidentifier", False),
    ("price", "money", True),
    ("qty", "tinyint", True),
    ("placed_at", "datetimeoffset(7)", True),
    ("name", "nvarchar(200)", True),
]


def test_schema_assembly_from_catalog_rows():
    struct = mssql_schema_to_struct(_CATALOG)
    assert struct == T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("guid", T.StringType(), False),
            T.StructField("price", T.DecimalType(19, 4), True),
            T.StructField("qty", T.IntegerType(), True),
            T.StructField("placed_at", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
        ]
    )


def test_read_schema_ddl_is_custom_schema_compatible(spark):
    """The customSchema option string must itself parse back into the
    same StructType via Spark's DDL parser (needs a live session) — the
    format contract the JDBC reader enforces."""
    ddl = read_schema_ddl(_CATALOG)
    assert ddl == (
        "id int, guid string, price decimal(19,4), qty int, "
        "placed_at string, name string"
    )
    parsed = T.StructType.fromDDL(ddl)
    # fromDDL yields all-nullable fields; compare types/names only
    got = [(f.name, f.dataType) for f in parsed.fields]
    want = [(f.name, f.dataType) for f in mssql_schema_to_struct(_CATALOG).fields]
    assert got == want


# --- write path (createTableColumnTypes) -----------------------------------


def test_spark_to_mssql_covers_write_types():
    assert spark_to_mssql_type(T.BooleanType()) == "BIT"
    assert spark_to_mssql_type(T.ByteType()) == "SMALLINT"  # tinyint unsigned!
    assert spark_to_mssql_type(T.ShortType()) == "SMALLINT"
    assert spark_to_mssql_type(T.IntegerType()) == "INT"
    assert spark_to_mssql_type(T.LongType()) == "BIGINT"
    assert spark_to_mssql_type(T.FloatType()) == "REAL"
    assert spark_to_mssql_type(T.DoubleType()) == "FLOAT"
    assert spark_to_mssql_type(T.DecimalType(19, 4)) == "DECIMAL(19,4)"
    assert spark_to_mssql_type(T.StringType()) == "NVARCHAR(MAX)"
    assert spark_to_mssql_type(T.BinaryType()) == "VARBINARY(MAX)"
    assert spark_to_mssql_type(T.DateType()) == "DATE"
    assert spark_to_mssql_type(T.TimestampNTZType()) == "DATETIME2"
    assert spark_to_mssql_type(T.TimestampType()) == "DATETIMEOFFSET"
    with pytest.raises(ValueError):
        spark_to_mssql_type(T.ArrayType(T.IntegerType()))


def test_create_table_column_types_string():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("amount", T.DecimalType(19, 4), True),
            T.StructField("note", T.StringType(), True),
        ]
    )
    assert create_table_column_types(schema) == (
        "id BIGINT, amount DECIMAL(19,4), note NVARCHAR(MAX)"
    )


def test_round_trip_mssql_spark_mssql_core_types():
    """For the types both directions can represent, read-mapping then
    write-mapping must land on a T-SQL type of the SAME family (no
    precision loss, no kind change)."""
    stable = {
        "bit": "BIT",
        "smallint": "SMALLINT",
        "int": "INT",
        "bigint": "BIGINT",
        "money": "DECIMAL(19,4)",
        "decimal(18,4)": "DECIMAL(18,4)",
        "real": "REAL",
        "float": "FLOAT",
        "date": "DATE",
        "datetime2": "DATETIME2",
        "varbinary(max)": "VARBINARY(MAX)",
        "nvarchar(max)": "NVARCHAR(MAX)",
    }
    for mssql_in, mssql_out in stable.items():
        assert spark_to_mssql_type(mssql_to_spark_type(mssql_in)) == mssql_out

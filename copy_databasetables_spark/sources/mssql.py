"""SQL Server (MSSQL) dialect mapping — the type layer a real upstream
user hits first (SURVEY.md §1.1 table; VERDICT r5 missing-item 1).

Upstream copies SQL Server tables; its type surface is the SQL Server
scalar set. When this engine reads/writes through Spark's JDBC path the
mapping must be owned explicitly, because the generic JDBC defaults get
four families wrong or lossy:

- ``datetimeoffset`` has no Catalyst equivalent that preserves the
  offset — map to ``StringType`` (Spark's pre-4.0 MsSqlServerDialect
  behavior) so round-trips are lossless; opt into UTC-normalized
  ``TimestampType`` via ``datetimeoffset_as_timestamp=True`` (the
  Spark 4 dialect default) when downstream wants instants.
- ``uniqueidentifier`` (GUID) → ``StringType`` (36-char canonical form).
- ``money``/``smallmoney`` are fixed-point: ``DecimalType(19,4)`` /
  ``DecimalType(10,4)`` — mapping them to Double would corrupt cents.
- ``tinyint`` is UNSIGNED 0..255: Catalyst ``ByteType`` (signed −128..
  127) truncates values ≥128, so it must widen to ``IntegerType``.

Everything here is pure schema assembly — unit-testable without a
server, exactly like the option-assembly layer in ``sources/jdbc.py``.
The two integration points are ``read_schema_ddl`` (the string for
Spark's JDBC ``customSchema`` option) and ``create_table_column_types``
(the string for the writer's ``createTableColumnTypes`` option).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

__all__ = [
    "parse_mssql_type",
    "mssql_to_spark_type",
    "mssql_schema_to_struct",
    "read_schema_ddl",
    "spark_to_mssql_type",
    "create_table_column_types",
]

#: base-name → fixed Catalyst type (no precision/length parameters).
_SIMPLE: dict[str, T.DataType] = {
    "bit": T.BooleanType(),
    "tinyint": T.IntegerType(),  # unsigned 0..255 — ByteType would truncate
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "money": T.DecimalType(19, 4),
    "smallmoney": T.DecimalType(10, 4),
    "float": T.DoubleType(),  # MSSQL float(53) default = IEEE double
    "real": T.FloatType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "nchar": T.StringType(),
    "nvarchar": T.StringType(),
    "text": T.StringType(),
    "ntext": T.StringType(),
    "xml": T.StringType(),
    "sysname": T.StringType(),
    "uniqueidentifier": T.StringType(),
    "date": T.DateType(),
    # SQL Server datetimes carry no zone → NTZ semantics (SURVEY §1.1)
    "datetime": T.TimestampNTZType(),
    "datetime2": T.TimestampNTZType(),
    "smalldatetime": T.TimestampNTZType(),
    "time": T.TimestampNTZType(),  # Catalyst has no TimeType pre-4.1 API
    "binary": T.BinaryType(),
    "varbinary": T.BinaryType(),
    "image": T.BinaryType(),
    "rowversion": T.BinaryType(),
    "timestamp": T.BinaryType(),  # T-SQL 'timestamp' IS rowversion, not a time
}

_TYPE_RE = re.compile(
    r"^\s*(?P<base>[a-z_][a-z0-9_ ]*?)\s*(?:\(\s*(?P<args>[^)]*)\s*\))?\s*$"
)


def parse_mssql_type(sql_type: str) -> tuple[str, list[str]]:
    """``'decimal(18, 4)'`` → ``('decimal', ['18', '4'])``;
    ``'nvarchar(max)'`` → ``('nvarchar', ['max'])``. Case-insensitive;
    raises ValueError on unparseable input (never guesses)."""
    m = _TYPE_RE.match(sql_type.lower())
    if not m:
        raise ValueError(f"unparseable SQL Server type: {sql_type!r}")
    base = m.group("base").strip()
    args = m.group("args")
    return base, [a.strip() for a in args.split(",")] if args else []


def mssql_to_spark_type(
    sql_type: str, *, datetimeoffset_as_timestamp: bool = False
) -> T.DataType:
    """Map one SQL Server catalog type (with optional precision/scale/
    length arguments) to its Catalyst type per the SURVEY §1.1 table."""
    base, args = parse_mssql_type(sql_type)
    if base in ("decimal", "numeric"):
        # T-SQL defaults: decimal == decimal(18,0)
        p = int(args[0]) if args else 18
        s = int(args[1]) if len(args) > 1 else 0
        return T.DecimalType(p, s)
    if base == "datetimeoffset":
        return (
            T.TimestampType()  # UTC-normalized instant (Spark 4 dialect)
            if datetimeoffset_as_timestamp
            else T.StringType()  # lossless: keeps the offset
        )
    if base == "float":
        # float(1..24) is REAL; float(25..53) (and bare float) is double
        if args and int(args[0]) <= 24:
            return T.FloatType()
        return T.DoubleType()
    try:
        return _SIMPLE[base]
    except KeyError:
        raise ValueError(f"unmapped SQL Server type: {sql_type!r}") from None


def mssql_schema_to_struct(
    columns: list[tuple[str, str, bool]],
    *,
    datetimeoffset_as_timestamp: bool = False,
) -> T.StructType:
    """Assemble the Spark read schema from catalog rows of
    ``(column_name, sql_server_type, is_nullable)`` — the shape
    ``INFORMATION_SCHEMA.COLUMNS`` (or SMO ``Column``) yields."""
    return T.StructType(
        [
            T.StructField(
                name,
                mssql_to_spark_type(
                    st, datetimeoffset_as_timestamp=datetimeoffset_as_timestamp
                ),
                nullable,
            )
            for name, st, nullable in columns
        ]
    )


def read_schema_ddl(
    columns: list[tuple[str, str, bool]],
    *,
    datetimeoffset_as_timestamp: bool = False,
) -> str:
    """The ``customSchema`` JDBC read option string: Spark applies it on
    top of the driver-reported ResultSet metadata, which is how the
    engine pins e.g. money→DECIMAL(19,4) even when a generic driver
    reports something lossier."""
    struct = mssql_schema_to_struct(
        columns, datetimeoffset_as_timestamp=datetimeoffset_as_timestamp
    )
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in struct.fields)


#: Catalyst → T-SQL for CREATE TABLE on the write path. String/binary go
#: to MAX variants (Spark cannot know a tighter length); ByteType widens
#: to SMALLINT because T-SQL tinyint is unsigned and cannot hold −128.
_TO_MSSQL: dict[type, str] = {
    T.BooleanType: "BIT",
    T.ByteType: "SMALLINT",
    T.ShortType: "SMALLINT",
    T.IntegerType: "INT",
    T.LongType: "BIGINT",
    T.FloatType: "REAL",
    T.DoubleType: "FLOAT",
    T.StringType: "NVARCHAR(MAX)",
    T.BinaryType: "VARBINARY(MAX)",
    T.DateType: "DATE",
    T.TimestampNTZType: "DATETIME2",
    T.TimestampType: "DATETIMEOFFSET",  # tz-aware instant keeps its kind
}


def spark_to_mssql_type(dt: T.DataType) -> str:
    """Map one Catalyst type to the T-SQL column type the engine writes."""
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    try:
        return _TO_MSSQL[type(dt)]
    except KeyError:
        raise ValueError(f"no T-SQL mapping for Spark type {dt}") from None


def create_table_column_types(schema: T.StructType) -> str:
    """The ``createTableColumnTypes`` writer option string — per-column
    T-SQL types for the CREATE TABLE Spark issues on ``overwrite``."""
    return ", ".join(
        f"{f.name} {spark_to_mssql_type(f.dataType)}" for f in schema.fields
    )

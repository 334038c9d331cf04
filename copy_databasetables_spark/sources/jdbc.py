"""JDBC source/sink — the reference's native boundary (SURVEY.md §2.1
``src_jdbc_read`` / ``snk_jdbc_write``), re-expressed as Spark JDBC
DataFrame reads/writes.

This environment has no database server and no network (SURVEY.md §0),
so these are option-assembly + plan-construction layers with unit tests;
``unit`` is their declared check level in the §2 inventory. Everything
here is standard public Spark JDBC surface.

Reference-parity mapping (SURVEY.md §1.1, §3.1 [U]):

    SqlDataReader over SELECT *      → spark.read.format('jdbc')
    partitioned read (manual ranges) → partitionColumn/lowerBound/
                                       upperBound/numPartitions
    SqlBulkCopy WriteToServer        → df.write.format('jdbc')
    BulkCopy BatchSize               → option('batchsize', n)
    drop & recreate target           → mode('overwrite')
    truncate-instead-of-drop         → option('truncate', 'true')
    NotifyAfter progress events      → Spark task metrics (no analog
                                       needed; executors report rows)

Scale notes (100 TB): a JDBC read is single-threaded UNLESS partitioned —
always set partitionColumn+bounds+numPartitions for big tables so each
executor opens its own cursor over a key range. Writes batch INSERTs per
partition (batchsize rows per round trip); numPartitions bounds the
connection count the target must tolerate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: Quick-reference SQL Server → Spark mapping (SURVEY.md §1.1; standard
#: Spark MSSQL dialect behavior). The FULL dialect layer — precision/
#: scale parsing, datetimeoffset modes, read customSchema and write
#: createTableColumnTypes assembly — lives in ``sources/mssql.py``.
MSSQL_TO_SPARK = {
    "bit": "boolean",
    "tinyint": "int",
    "smallint": "smallint",
    "int": "int",
    "bigint": "bigint",
    "decimal": "decimal",
    "numeric": "decimal",
    "money": "decimal(19,4)",
    "float": "double",
    "real": "float",
    "char": "string",
    "varchar": "string",
    "nchar": "string",
    "nvarchar": "string",
    "text": "string",
    "date": "date",
    "datetime": "timestamp_ntz",
    "datetime2": "timestamp_ntz",
    "smalldatetime": "timestamp_ntz",
    # Spark 4's MsSqlServerDialect reads DATETIMEOFFSET as TIMESTAMP
    # (UTC-normalized); the pre-4.0 legacy behavior was string
    # (spark.sql.legacy.mssqlserver.datetimeoffsetMapping.enabled).
    "datetimeoffset": "timestamp",
    "binary": "binary",
    "varbinary": "binary",
    "image": "binary",
    "uniqueidentifier": "string",
}


@dataclass
class JdbcReadSpec:
    """Declarative spec for a (possibly partitioned) JDBC read."""

    url: str
    table: str | None = None
    query: str | None = None
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    fetchsize: int = 10_000
    options: dict[str, str] = field(default_factory=dict)

    def to_options(self) -> dict[str, str]:
        if (self.table is None) == (self.query is None):
            raise ValueError("exactly one of table/query is required")
        partition_args = [
            self.partition_column,
            self.lower_bound,
            self.upper_bound,
            self.num_partitions,
        ]
        if any(a is not None for a in partition_args) and None in partition_args:
            raise ValueError(
                "partitioned read needs all of partitionColumn, lowerBound, "
                "upperBound, numPartitions"
            )
        opts = {"url": self.url, "fetchsize": str(self.fetchsize)}
        if self.table is not None:
            opts["dbtable"] = self.table
        else:
            opts["query"] = self.query
        if self.partition_column is not None:
            if self.query is not None:
                raise ValueError("partitionColumn requires dbtable, not query")
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        opts.update(self.options)
        return opts

    def build(self, spark: SparkSession):
        """Configured DataFrameReader (lazy — nothing connects yet)."""
        return spark.read.format("jdbc").options(**self.to_options())

    def load(self, spark: SparkSession) -> DataFrame:
        return self.build(spark).load()


@dataclass
class JdbcWriteSpec:
    """Declarative spec for a JDBC write (the SqlBulkCopy analog)."""

    url: str
    table: str
    mode: str = "append"  # append | overwrite | ignore | errorifexists
    truncate: bool = False  # with overwrite: TRUNCATE instead of DROP
    batchsize: int = 10_000
    num_partitions: int | None = None
    isolation_level: str = "READ_COMMITTED"
    create_table_column_types: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    def to_options(self) -> dict[str, str]:
        if self.mode not in ("append", "overwrite", "ignore", "errorifexists"):
            raise ValueError(f"invalid mode {self.mode!r}")
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "batchsize": str(self.batchsize),
            "isolationLevel": self.isolation_level,
        }
        if self.truncate:
            if self.mode != "overwrite":
                raise ValueError("truncate only applies to overwrite mode")
            opts["truncate"] = "true"
        if self.num_partitions is not None:
            opts["numPartitions"] = str(self.num_partitions)
        if self.create_table_column_types is not None:
            opts["createTableColumnTypes"] = self.create_table_column_types
        opts.update(self.options)
        return opts

    def writer(self, df: DataFrame):
        """Configured DataFrameWriter (lazy)."""
        out = df
        if self.num_partitions is not None and df.rdd.getNumPartitions() > self.num_partitions:
            # coalesce, not repartition: bounding connection count must
            # not cost a shuffle
            out = df.coalesce(self.num_partitions)
        return out.write.format("jdbc").mode(self.mode).options(**self.to_options())

    def save(self, df: DataFrame) -> None:
        self.writer(df).save()


def copy_table_jdbc(
    spark: SparkSession, read: JdbcReadSpec, write: JdbcWriteSpec
) -> None:
    """The reference's core loop over JDBC: partitioned read → batched
    write. Rows stream source→executors→target; nothing collects."""
    write.save(read.load(spark))

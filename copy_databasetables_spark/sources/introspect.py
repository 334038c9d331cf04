"""JDBC catalog introspection + DDL scripting — the SMO-Scripter analog
(SURVEY.md §1.1, §3.1 [U]: the reference scripts each table's schema —
columns, nullability, primary key, indexes — then recreates the target
and bulk-loads; /root/reference is empty, so parity cites the survey's
functional reconstruction).

Everything here is standard public JDBC surface reached through Spark's
own JVM (``java.sql.DriverManager`` / ``DatabaseMetaData`` via py4j):

    SMO Table.Columns           → DatabaseMetaData.getColumns
    SMO Table.Indexes / PK      → getPrimaryKeys / getIndexInfo
    SMO Scripter.Script()       → script_create_table / script_indexes
    recreate target             → drop_table_if_exists + CREATE TABLE
    bulk load                   → df.write.format('jdbc').mode('append')
    index build                 → CREATE [UNIQUE] INDEX after load

Scale notes (100 TB): introspection touches only catalog metadata (a
handful of driver-side JDBC calls — no data moves); the row copy itself
streams through executors exactly like sources/jdbc.py. Indexes are
created AFTER the bulk load — building them first would make every
batched INSERT pay index maintenance, the classic bulk-load mistake.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class ColumnMeta:
    name: str
    type_name: str  # source-reported SQL type name (e.g. VARCHAR)
    size: int
    decimal_digits: int | None
    nullable: bool

    def ddl(self) -> str:
        t = self.type_name.upper()
        # parameterized types carry their source precision through
        if t in ("VARCHAR", "CHAR", "CHARACTER", "VARBINARY", "BINARY"):
            t = f"{t}({self.size})"
        elif t in ("DECIMAL", "NUMERIC"):
            t = f"{t}({self.size},{self.decimal_digits or 0})"
        null = "" if self.nullable else " NOT NULL"
        return f"{self.name} {t}{null}"


@dataclass
class IndexMeta:
    name: str
    unique: bool
    columns: list[str] = field(default_factory=list)


@dataclass
class ForeignKeyMeta:
    name: str
    columns: list[str] = field(default_factory=list)
    ref_table: str = ""
    ref_columns: list[str] = field(default_factory=list)


@dataclass
class TableMeta:
    table: str
    columns: list[ColumnMeta] = field(default_factory=list)
    pk_columns: list[str] = field(default_factory=list)
    indexes: list[IndexMeta] = field(default_factory=list)  # non-PK only
    foreign_keys: list[ForeignKeyMeta] = field(default_factory=list)


def _connect(spark: SparkSession, url: str):
    return spark._sc._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001


def introspect_jdbc_table(spark: SparkSession, url: str, table: str) -> TableMeta:
    """Read one table's column/PK/index metadata from the JDBC catalog.

    Unquoted identifiers are stored uppercase by Derby (and most
    ANSI-folding databases); the lookup uppercases to match. Indexes
    that merely back the primary key (system-generated names) are
    excluded from ``indexes`` — they travel as the PK constraint.
    """
    conn = _connect(spark, url)
    try:
        md = conn.getMetaData()
        t = table.upper()

        cols: list[ColumnMeta] = []
        rs = md.getColumns(None, None, t, None)
        while rs.next():
            cols.append(
                ColumnMeta(
                    name=rs.getString("COLUMN_NAME").lower(),
                    type_name=rs.getString("TYPE_NAME"),
                    size=rs.getInt("COLUMN_SIZE"),
                    decimal_digits=rs.getInt("DECIMAL_DIGITS"),
                    nullable=rs.getInt("NULLABLE") != 0,
                )
            )
        rs.close()

        pk: list[tuple[int, str]] = []
        rs = md.getPrimaryKeys(None, None, t)
        while rs.next():
            pk.append((rs.getInt("KEY_SEQ"), rs.getString("COLUMN_NAME").lower()))
        rs.close()
        pk_columns = [c for _, c in sorted(pk)]

        by_name: dict[str, IndexMeta] = {}
        rs = md.getIndexInfo(None, None, t, False, False)
        while rs.next():
            iname = rs.getString("INDEX_NAME")
            cname = rs.getString("COLUMN_NAME")
            if iname is None or cname is None:  # table statistics rows
                continue
            ix = by_name.setdefault(
                iname, IndexMeta(name=iname, unique=not rs.getBoolean("NON_UNIQUE"))
            )
            ix.columns.append(cname.lower())
        rs.close()

        indexes = [
            ix
            for ix in by_name.values()
            # drop the PK's backing index (same columns, unique) and any
            # other system-generated backing index (Derby names them SQL…)
            if not (ix.unique and ix.columns == pk_columns)
            and not ix.name.upper().startswith("SQL")
        ]

        fks: dict[str, ForeignKeyMeta] = {}
        rs = md.getImportedKeys(None, None, t)
        while rs.next():
            fname = rs.getString("FK_NAME") or f"fk_{t.lower()}"
            fk = fks.setdefault(
                fname,
                ForeignKeyMeta(
                    name=fname, ref_table=rs.getString("PKTABLE_NAME").lower()
                ),
            )
            fk.columns.append(rs.getString("FKCOLUMN_NAME").lower())
            fk.ref_columns.append(rs.getString("PKCOLUMN_NAME").lower())
        rs.close()

        return TableMeta(
            table=table,
            columns=cols,
            pk_columns=pk_columns,
            indexes=indexes,
            foreign_keys=list(fks.values()),
        )
    finally:
        conn.close()


def script_create_table(meta: TableMeta, target_table: str | None = None) -> str:
    """CREATE TABLE with column types, NOT NULL, and an inline PK
    constraint — the Scripter's table-definition output."""
    name = target_table or meta.table
    parts = [c.ddl() for c in meta.columns]
    if meta.pk_columns:
        parts.append(f"CONSTRAINT pk_{name} PRIMARY KEY ({', '.join(meta.pk_columns)})")
    return f"CREATE TABLE {name} ({', '.join(parts)})"


def script_indexes(meta: TableMeta, target_table: str | None = None) -> list[str]:
    """CREATE [UNIQUE] INDEX statements (issued after the bulk load)."""
    name = target_table or meta.table
    out = []
    for ix in meta.indexes:
        uniq = "UNIQUE " if ix.unique else ""
        out.append(
            f"CREATE {uniq}INDEX {ix.name.lower()}_c ON {name} ({', '.join(ix.columns)})"
        )
    return out


def script_foreign_keys(meta: TableMeta, target_table: str | None = None) -> list[str]:
    """ALTER TABLE ADD CONSTRAINT … FOREIGN KEY statements. Applied
    LAST, after every referenced table is loaded — the same reason the
    reference copies tables in FK order."""
    name = target_table or meta.table
    out = []
    for fk in meta.foreign_keys:
        out.append(
            f"ALTER TABLE {name} ADD CONSTRAINT {fk.name.lower()}_c "
            f"FOREIGN KEY ({', '.join(fk.columns)}) "
            f"REFERENCES {fk.ref_table} ({', '.join(fk.ref_columns)})"
        )
    return out


def execute_ddl(spark: SparkSession, url: str, statements: list[str]) -> None:
    conn = _connect(spark, url)
    try:
        st = conn.createStatement()
        for sql in statements:
            st.execute(sql)
        st.close()
    finally:
        conn.close()


def drop_table_if_exists(spark: SparkSession, url: str, table: str) -> None:
    """Derby (like SQL Server < 2016) has no DROP TABLE IF EXISTS; a
    missing table surfaces as a SQLException we swallow by state."""
    try:
        execute_ddl(spark, url, [f"DROP TABLE {table}"])
    except Exception as e:  # py4j wraps the SQLException
        if "42Y55" not in str(e) and "does not exist" not in str(e):
            raise


def copy_table_jdbc_with_schema(
    spark: SparkSession,
    src_url: str,
    dst_url: str,
    table: str,
    target_table: str | None = None,
    batchsize: int = 10_000,
) -> TableMeta:
    """The reference's full per-table job with schema fidelity:
    introspect source → script DDL (columns + NOT NULL + PK) → drop &
    recreate target → bulk-load rows → build secondary indexes.

    Returns the source TableMeta so callers can re-verify the target.
    """
    from copy_databasetables_spark.sources.jdbc import JdbcReadSpec, JdbcWriteSpec

    target = target_table or table
    meta = introspect_jdbc_table(spark, src_url, table)
    drop_table_if_exists(spark, dst_url, target)
    execute_ddl(spark, dst_url, [script_create_table(meta, target)])
    rows = JdbcReadSpec(url=src_url, table=table).load(spark)
    # append, not overwrite: the scripted table (with its constraints)
    # must survive — overwrite would drop and recreate it constraint-free
    JdbcWriteSpec(url=dst_url, table=target, mode="append", batchsize=batchsize).save(rows)
    execute_ddl(spark, dst_url, script_indexes(meta, target))
    return meta


def copy_tables_jdbc_with_schema(
    spark: SparkSession,
    src_url: str,
    dst_url: str,
    tables: list[str],
    batchsize: int = 10_000,
) -> list[TableMeta]:
    """Multi-table schema-fidelity copy. ``tables`` must be in FK order
    (parents first) — each table is created and loaded in turn, and
    FOREIGN KEY constraints are applied only after ALL loads finish, so
    child loads never race their parents' constraints (the reference's
    multi-table loop + its FK-ordering requirement, SURVEY.md §3.1).

    Re-runnable: existing targets are dropped children-first (reverse FK
    order) — a parent cannot be dropped while a child's FK references it.
    """
    for t in reversed(tables):
        drop_table_if_exists(spark, dst_url, t)
    metas = [
        copy_table_jdbc_with_schema(spark, src_url, dst_url, t, batchsize=batchsize)
        for t in tables
    ]
    for meta in metas:
        execute_ddl(spark, dst_url, script_foreign_keys(meta))
    return metas

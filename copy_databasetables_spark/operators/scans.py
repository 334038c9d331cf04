"""§2.1 Scans / sources / sinks — the reference's actual job surface.

The copy operators delegate to copy/engine.py (the reference-parity
engine); here they are bound to concrete testdata tables and verified by
re-reading the copy and hashing it against the *source* oracle — i.e.
the check asserts the round trip lost nothing.

JDBC read/write (src_jdbc_read / snk_jdbc_write in SURVEY.md §2.1) run
against *in-process Apache Derby* (the embedded database Spark already
ships for its Hive metastore) — no network, no server process, but a
real JDBC driver, real CREATE TABLE/INSERT batching, and a real
partitioned-read path. This upgrades the survey's planned 'unit' level
to full hash checks: write over JDBC, read back over JDBC, hash against
the parquet source oracle.

Copies write under /tmp/spark_graft_io/<op>/<sf>/ with mode=overwrite so
repeated driver runs are idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copy_databasetables_spark.copy.engine import (
    all_table_counts,
    copy_table,
    copy_tables,
    recreate_from_ddl,
)
from copy_databasetables_spark.io import SCHEMAS, load_table
from copy_databasetables_spark.operators import register
from copy_databasetables_spark.operators._helpers import us

_IO_ROOT = "/tmp/spark_graft_io"


def _out(op: str, sf_dir: str, *extra: str) -> str:
    return os.path.join(_IO_ROOT, op, os.path.basename(sf_dir.rstrip("/")), *extra)


#: lineitem projected with the timestamp as epoch-µs (output-boundary rule).
_LINEITEM_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
]
_D_LINEITEM = (
    "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    "epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS l_shipdate_us FROM lineitem"
)


@register("src_parquet_scan", oracle=_D_LINEITEM)
def src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan with declared schema — every column, every row.
    The vectorized reader materializes ColumnarBatches; schema is pinned,
    never inferred (the reference reads schemas from the catalog)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(*_LINEITEM_COLS, us("l_shipdate", "l_shipdate_us"))


@register(
    "src_parquet_scan_nanos",
    oracle="""
    SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           user_id, event_type, value, props
    FROM events
    """,
)
def src_parquet_scan_nanos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table through the io.py ts type branch
    (SURVEY.md §1.2): TIMESTAMP(NANOS) files go through nanosAsLong +
    integer-division reconstruction, timestamp[us] files read natively.
    DuckDB reads the same file either way, so epoch-µs values agree
    exactly."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", us("ts", "ts_us"), "user_id", "event_type", "value", "props"
    )


@register(
    "src_csv_json_roundtrip",
    oracle="""
    SELECT *, 'csv' AS fmt FROM customer
    UNION ALL
    SELECT *, 'json' AS fmt FROM customer
    """,
)
def src_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write customer to CSV and JSON, read both back with the declared
    schema, return both tagged — the hash against 2× the source proves
    both text formats round-trip losslessly (header/quote/escape for
    CSV; line-delimited JSON)."""
    c = load_table(spark, sf_dir, "customer")
    csv_path, json_path = _out("roundtrip_csv", sf_dir), _out("roundtrip_json", sf_dir)
    (
        c.write.mode("overwrite")
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(csv_path)
    )
    c.write.mode("overwrite").json(json_path)
    # Lossless CSV needs non-default options (pinned by tests/test_io.py):
    # without multiLine the reader silently TRUNCATES values at embedded
    # newlines, and both writer and reader TRIM whitespace padding by
    # default. multiLine costs splittability (one read task per file), so
    # at scale prefer many moderate files over few huge ones.
    csv_back = (
        spark.read.schema(SCHEMAS["customer"])
        .option("header", "true")
        .option("multiLine", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(csv_path)
    )
    json_back = spark.read.schema(SCHEMAS["customer"]).json(json_path)
    return csv_back.withColumn("fmt", F.lit("csv")).unionByName(
        json_back.withColumn("fmt", F.lit("json"))
    )


def _derby_url(sf_dir: str, name: str) -> str:
    # Per-process database path: a Derby db killed mid-boot leaves a
    # lock that makes the next process fail with XSDB6 — fresh names
    # make every run self-contained (tiny dbs under /tmp).
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    return f"jdbc:derby:/tmp/spark_graft_derby/p{os.getpid()}_{sf_tag}_{name};create=true"


@register(
    "snk_jdbc_write",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def q_snk_jdbc_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC sink — the SqlBulkCopy analog over a real driver: batched
    INSERTs (batchsize=5000) into embedded Derby with mode=overwrite
    (drop-and-recreate, the reference's drop-existing option), then read
    back over JDBC and hash against the parquet source. numPartitions
    bounds the writer's connection count via coalesce."""
    from copy_databasetables_spark.sources.jdbc import JdbcReadSpec, JdbcWriteSpec

    url = _derby_url(sf_dir, "customer")
    src = load_table(spark, sf_dir, "customer")
    JdbcWriteSpec(
        url=url, table="customer", mode="overwrite", batchsize=5000, num_partitions=4
    ).save(src)
    return JdbcReadSpec(url=url, table="customer").load(spark)


@register(
    "src_jdbc_read",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders",
)
def q_src_jdbc_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned JDBC source: each of 8 executor tasks opens its own
    cursor over a key range (partitionColumn/lowerBound/upperBound/
    numPartitions) — the only JDBC read shape that scales; an
    unpartitioned read is a single-threaded cursor no matter the cluster
    size. Timestamps are excluded from this projection (Derby stores µs;
    the orders table is ms — covered by the parquet scans) so the hash
    stays type-clean."""
    from copy_databasetables_spark.sources.jdbc import JdbcReadSpec, JdbcWriteSpec

    url = _derby_url(sf_dir, "orders")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    JdbcWriteSpec(url=url, table="orders", mode="overwrite", batchsize=5000).save(src)
    n = src.count()
    return JdbcReadSpec(
        url=url,
        table="orders",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=int(n * 10),
        num_partitions=8,
    ).load(spark)


@register(
    "src_jdbc_decimal",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderkey AS DECIMAL(10,0)) * 0.07 * 100 AS BIGINT)
               AS price_cents,
           CASE WHEN o_orderkey % 97 = 0 THEN NULL
                ELSE CAST(CAST(o_custkey - 750 AS DECIMAL(10,0))
                          * 1.0001 * 10000 AS BIGINT) END
               AS money_pips
    FROM orders
    """,
)
def q_src_jdbc_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL(p,s) VALUE round-trip through a real JDBC driver — the
    §1.2 type-map promise checked on values, not on a mapping dict:
    exact DECIMAL(12,2) and money-style DECIMAL(19,4) columns (built
    from integer × decimal-literal arithmetic, exact in any engine;
    sign-varying, with a NULL stripe) are written into Derby with
    explicit ``createTableColumnTypes``, read back over JDBC, and
    projected to integer cents / pips (a lossless image of the decimal
    at its scale) so the hash is representation-portable. The read-back
    Spark schema is pinned to DecimalType(12,2)/(19,4) in
    tests/test_jdbc.py."""
    from copy_databasetables_spark.sources.jdbc import JdbcReadSpec, JdbcWriteSpec

    url = _derby_url(sf_dir, "decimals")
    src = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CAST(CAST(o_orderkey AS DECIMAL(10,0)) * CAST(0.07 AS DECIMAL(3,2))"
        " AS DECIMAL(12,2)) AS price_dec",
        "CASE WHEN o_orderkey % 97 = 0 THEN CAST(NULL AS DECIMAL(19,4))"
        " ELSE CAST(CAST(o_custkey - 750 AS DECIMAL(10,0))"
        "      * CAST(1.0001 AS DECIMAL(5,4)) AS DECIMAL(19,4)) END"
        " AS money_dec",
    )
    JdbcWriteSpec(
        url=url,
        table="order_decimals",
        mode="overwrite",
        batchsize=5000,
        create_table_column_types="price_dec DECIMAL(12,2), money_dec DECIMAL(19,4)",
    ).save(src)
    back = JdbcReadSpec(url=url, table="order_decimals").load(spark)
    return back.selectExpr(
        "o_orderkey",
        "CAST(price_dec * 100 AS BIGINT) AS price_cents",
        "CAST(money_dec * 10000 AS BIGINT) AS money_pips",
    )


_D_ORDERS = (
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
    "epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us, "
    "o_orderpriority FROM orders"
)


def _orders_projected(df: DataFrame) -> DataFrame:
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        us("o_orderdate", "o_orderdate_us"),
        "o_orderpriority",
    )


@register("copy_table", oracle=_D_ORDERS)
def q_copy_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference core op: read source table → recreate target → load
    all rows → verify row count + content checksum (SURVEY.md §3.1 data
    path). Hash vs the *source* oracle proves the copy is lossless."""
    target = _out("copy_table", sf_dir, "orders")
    copy_table(spark, sf_dir, "orders", target, verify_checksum=True)
    return _orders_projected(spark.read.parquet(target))


@register("copy_table_partitioned", oracle=_D_ORDERS)
def q_copy_table_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel copy in N partitions — the SqlBulkCopy-batching analog:
    8 writer tasks, 8 output files, same verified content."""
    target = _out("copy_table_partitioned", sf_dir, "orders")
    copy_table(spark, sf_dir, "orders", target, num_partitions=8)
    return _orders_projected(spark.read.parquet(target))


@register(
    "copy_table_mapped",
    oracle="""
    SELECT c_custkey AS customer_key,
           upper(c_name) AS customer_name,
           CAST(c_nationkey AS BIGINT) AS nation_key,
           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
           COALESCE(c_mktsegment, 'UNKNOWN') AS segment
    FROM customer
    """,
)
def q_copy_table_mapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-mapped copy — the SqlBulkCopy ColumnMappings analog the
    upstream tool exposes: rename (c_custkey→customer_key), transform
    (upper), retype (int→bigint; double dollars→exact bigint cents via
    the floor(x·100+0.5) device from the flagship), defaulting
    (coalesce), and column drop (omission) in ONE declarative pass —
    Catalyst fuses the whole mapping into the scan projection. The
    oracle applies the same mapping to the source, so the hash proves
    the mapped copy is exactly the mapped source."""
    from copy_databasetables_spark.copy.engine import copy_table_mapped

    target = _out("copy_table_mapped", sf_dir, "customer")
    copy_table_mapped(
        spark,
        sf_dir,
        "customer",
        target,
        [
            ("customer_key", "c_custkey"),
            ("customer_name", "upper(c_name)"),
            ("nation_key", "cast(c_nationkey as bigint)"),
            ("acctbal_cents", "cast(floor(c_acctbal * 100 + 0.5) as bigint)"),
            ("segment", "coalesce(c_mktsegment, 'UNKNOWN')"),
        ],
    )
    return spark.read.parquet(target)


@register(
    "copy_tables_many",
    oracle="""
    SELECT 'region' AS table_name, COUNT(*) AS n_rows FROM region
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    """,
)
def q_copy_tables_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table copy in FK order (region → nation → customer →
    orders), returning the per-table row-count verification report."""
    root = _out("copy_tables_many", sf_dir)
    tables = ["region", "nation", "customer", "orders"]
    copy_tables(spark, sf_dir, root, tables)
    return all_table_counts(spark, root, tables)


@register(
    "schema_introspect",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_schema_introspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMO-Scripter analog: StructType → CREATE TABLE DDL → execute →
    load → read back through the catalog table."""
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"spark_graft_introspect_nation_{sf_tag}"
    out = recreate_from_ddl(
        spark, sf_dir, "nation", name, _out("schema_introspect", sf_dir, "nation")
    )
    return out.select("n_nationkey", "n_name", "n_regionkey")


@register("snk_partitioned_write", oracle=_D_LINEITEM)
def q_snk_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned lake write: partitionBy(l_returnflag)
    produces one directory per flag value; reading the root back prunes
    by partition when filtered (dynamic partition pruning at scale).
    Readback restores the partition column (as string) and the hash vs
    the source proves nothing was dropped or duplicated."""
    target = _out("snk_partitioned_write", sf_dir, "lineitem")
    li = load_table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(target)
    back = spark.read.parquet(target)
    return back.select(
        *[c for c in _LINEITEM_COLS if c != "l_returnflag"],
        F.col("l_returnflag").cast("string").alias("l_returnflag"),
        us("l_shipdate", "l_shipdate_us"),
    )


@register(
    "schema_introspect_constraints",
    oracle="""
    SELECT kind, detail FROM (VALUES
      ('pk', 'n_nationkey'),
      ('unique_index', 'ux_nname_c:n_name'),
      ('index', 'ix_nregion_c:n_regionkey'),
      ('not_null', 'n_name'),
      ('not_null', 'n_nationkey')) AS t(kind, detail)
    UNION ALL
    SELECT 'row_count', CAST(COUNT(*) AS VARCHAR) FROM nation
    """,
)
def q_schema_introspect_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMO-Scripter constraint parity end-to-end: build a Derby source
    holding ``nation`` with a PK, a unique index and a secondary index;
    schema-fidelity-copy it (introspect → script DDL → recreate → load →
    index); then report what the TARGET catalog actually contains. The
    hash check proves PK/NOT NULL/index scripting survives the copy —
    the depth the reference's Scripter emits beyond bare column DDL."""
    from copy_databasetables_spark.sources.introspect import (
        copy_table_jdbc_with_schema,
        drop_table_if_exists,
        execute_ddl,
        introspect_jdbc_table,
    )
    from copy_databasetables_spark.sources.jdbc import JdbcWriteSpec

    src_url = _derby_url(sf_dir, "cons_src")
    dst_url = _derby_url(sf_dir, "cons_dst")
    drop_table_if_exists(spark, src_url, "nation_c")
    execute_ddl(spark, src_url, [
        "CREATE TABLE nation_c ("
        " n_nationkey INTEGER NOT NULL,"
        " n_name VARCHAR(64) NOT NULL,"
        " n_regionkey INTEGER,"
        " CONSTRAINT pk_nation_c PRIMARY KEY (n_nationkey))",
        "CREATE UNIQUE INDEX ux_nname ON nation_c (n_name)",
        "CREATE INDEX ix_nregion ON nation_c (n_regionkey)",
    ])
    nation = load_table(spark, sf_dir, "nation")
    JdbcWriteSpec(url=src_url, table="nation_c", mode="append").save(nation)
    copy_table_jdbc_with_schema(spark, src_url, dst_url, "nation_c")

    meta = introspect_jdbc_table(spark, dst_url, "nation_c")
    rows = [("pk", c) for c in meta.pk_columns]
    rows += [
        (("unique_index" if ix.unique else "index"),
         f"{ix.name.lower()}:{','.join(ix.columns)}")
        for ix in meta.indexes
    ]
    rows += [("not_null", c.name) for c in meta.columns if not c.nullable]
    n = (
        spark.read.format("jdbc")
        .options(url=dst_url, dbtable="nation_c")
        .load()
        .count()
    )
    rows.append(("row_count", str(n)))
    return spark.createDataFrame(rows, "kind string, detail string")


@register(
    "schema_introspect_defaults",
    oracle="""
    SELECT kind, detail FROM (VALUES
      ('identity', 'id'),
      ('default', 'qty:42'),
      ('default', 'note:''n/a'''),
      ('default', 'price:0.00'),
      ('not_null', 'id'),
      ('pk', 'id'),
      ('live_row', '101|42|n/a|0.00'),
      ('row_count', '3')) AS t(kind, detail)
    """,
)
def q_schema_introspect_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMO-Scripter DEFAULT + IDENTITY parity end-to-end (VERDICT r5
    item 5): build a Derby source whose table carries a BY DEFAULT
    identity PK and three column defaults; schema-fidelity-copy it;
    then prove BOTH that the TARGET catalog scripts them back
    (introspection rows) and that they are LIVE — a post-copy INSERT
    supplying only what defaults can't fill must draw id = max+1 from
    the reseeded identity counter (the DBCC CHECKIDENT step) and every
    default value. Upstream's Scripter carries defaults/identity the
    same way; a copy that loses them breaks the first app that inserts
    into the copied table."""
    from copy_databasetables_spark.sources.introspect import (
        copy_table_jdbc_with_schema,
        drop_table_if_exists,
        execute_ddl,
        introspect_jdbc_table,
    )
    from copy_databasetables_spark.sources.jdbc import JdbcReadSpec

    src_url = _derby_url(sf_dir, "defid_src")
    dst_url = _derby_url(sf_dir, "defid_dst")
    drop_table_if_exists(spark, src_url, "defid")  # re-runnable in-process
    execute_ddl(spark, src_url, [
        "CREATE TABLE defid ("
        " id BIGINT GENERATED BY DEFAULT AS IDENTITY NOT NULL,"
        " qty INTEGER DEFAULT 42,"
        " note VARCHAR(32) DEFAULT 'n/a',"
        " price DECIMAL(9,2) DEFAULT 0.00,"
        " CONSTRAINT pk_defid PRIMARY KEY (id))",
        # generated id first (counter at 1), explicit id above it
        "INSERT INTO defid (qty) VALUES (7)",
        "INSERT INTO defid (id, qty, note, price) VALUES (100, 5, 'a', 1.50)",
    ])
    copy_table_jdbc_with_schema(spark, src_url, dst_url, "defid")

    meta = introspect_jdbc_table(spark, dst_url, "defid")
    rows = [("identity", c.name) for c in meta.columns if c.identity]
    rows += [
        ("default", f"{c.name}:{c.default.strip()}")
        for c in meta.columns
        if not c.identity and c.default is not None
    ]
    rows += [("not_null", c.name) for c in meta.columns if not c.nullable]
    rows += [("pk", c) for c in meta.pk_columns]

    # the live proof: defaults + reseeded identity fill the new row
    execute_ddl(spark, dst_url, ["INSERT INTO defid (id) VALUES (DEFAULT)"])
    live = (
        JdbcReadSpec(
            url=dst_url,
            query="SELECT id, qty, note, price FROM defid "
            "WHERE id = (SELECT MAX(id) FROM defid)",
        )
        .load(spark)
        .collect()[0]
    )
    rows.append(
        ("live_row", f"{live['ID']}|{live['QTY']}|{live['NOTE']}|{live['PRICE']}")
    )
    n = JdbcReadSpec(url=dst_url, table="defid").load(spark).count()
    rows.append(("row_count", str(n)))
    return spark.createDataFrame(rows, "kind string, detail string")


@register(
    "schema_introspect_indexes",
    oracle="""
    SELECT kind, detail FROM (VALUES
      ('index', 'ix_status_date_c:o_orderstatus asc,o_orderdate desc'),
      ('index', 'ix_price_c:o_totalprice desc'),
      ('unique_index', 'ux_cust_key_c:o_custkey asc,o_orderkey asc'),
      ('pk', 'o_orderkey')) AS t(kind, detail)
    UNION ALL
    SELECT 'row_count', CAST(COUNT(*) AS VARCHAR) FROM orders
    """,
)
def q_schema_introspect_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMO-Scripter COMPOSITE-index parity (VERDICT r6 item 8): the
    constraints twin proves single-column indexes survive the copy; this
    key proves the two properties a composite index can silently lose —
    COLUMN ORDER (ix(a,b) ≠ ix(b,a): only the former serves a prefix
    seek on a) and per-column SORT DIRECTION (a DESC index serves
    ORDER BY ... DESC scans; scripted ascending it still "exists" but
    stops covering them). Build a Derby source holding ``orders`` with a
    mixed-direction composite index, a single-column DESC index and a
    composite unique index; schema-fidelity-copy it; report the TARGET
    catalog's ordinal-ordered (column, direction) specs — hash-checked
    against the literal expectation, so a copy that reorders or
    re-sorts any index column goes red."""
    from copy_databasetables_spark.sources.introspect import (
        copy_table_jdbc_with_schema,
        drop_table_if_exists,
        execute_ddl,
        introspect_jdbc_table,
    )
    from copy_databasetables_spark.sources.jdbc import JdbcWriteSpec

    src_url = _derby_url(sf_dir, "idx_src")
    dst_url = _derby_url(sf_dir, "idx_dst")
    drop_table_if_exists(spark, src_url, "orders_ix")
    execute_ddl(spark, src_url, [
        "CREATE TABLE orders_ix ("
        " o_orderkey BIGINT NOT NULL,"
        " o_custkey BIGINT,"
        " o_orderstatus VARCHAR(1),"
        " o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP,"
        " CONSTRAINT pk_orders_ix PRIMARY KEY (o_orderkey))",
        "CREATE INDEX ix_status_date ON orders_ix"
        " (o_orderstatus, o_orderdate DESC)",
        "CREATE INDEX ix_price ON orders_ix (o_totalprice DESC)",
        "CREATE UNIQUE INDEX ux_cust_key ON orders_ix (o_custkey, o_orderkey)",
    ])
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    JdbcWriteSpec(url=src_url, table="orders_ix", mode="append").save(orders)
    copy_table_jdbc_with_schema(spark, src_url, dst_url, "orders_ix")

    meta = introspect_jdbc_table(spark, dst_url, "orders_ix")
    rows = [
        (("unique_index" if ix.unique else "index"),
         f"{ix.name.lower()}:{ix.spec()}")
        for ix in meta.indexes
    ]
    rows += [("pk", c) for c in meta.pk_columns]
    n = (
        spark.read.format("jdbc")
        .options(url=dst_url, dbtable="orders_ix")
        .load()
        .count()
    )
    rows.append(("row_count", str(n)))
    return spark.createDataFrame(rows, "kind string, detail string")


@register(
    "schema_introspect_triggers",
    oracle="""
    SELECT kind, detail FROM (VALUES
      ('trigger', 'trg_audit_c:AFTER INSERT ROW NEW=N'),
      ('items_rows', '25'),
      ('audit_rows_after_copy', '2'),
      ('live_audit_row', '9001|7'),
      ('audit_rows_after_insert', '3')) AS t(kind, detail)
    """,
)
def q_schema_introspect_triggers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMO-Scripter TRIGGER parity (the upstream Scripter's Triggers
    option [U]; Derby's SYS.SYSTRIGGERS stands in for sys.triggers):
    build a source where an AFTER INSERT row trigger on ``items``
    writes an audit row; schema-fidelity-copy BOTH tables; then prove
    (a) the TARGET catalog scripts the trigger back (event, timing,
    granularity, REFERENCING alias), (b) the copy reproduced the
    source's STATE without replaying history — the copied audit table
    has exactly the source's rows, NOT one new row per bulk-loaded
    item, because triggers are applied after every load — and (c) the
    copied trigger is LIVE: one post-copy insert into the target
    produces exactly one new audit row with the triggered values."""
    from copy_databasetables_spark.sources.introspect import (
        copy_tables_jdbc_with_schema,
        drop_table_if_exists,
        drop_triggers_if_exist,
        execute_ddl,
        introspect_triggers,
    )
    from copy_databasetables_spark.sources.jdbc import JdbcReadSpec, JdbcWriteSpec

    src_url = _derby_url(sf_dir, "trg_src")
    dst_url = _derby_url(sf_dir, "trg_dst")
    drop_triggers_if_exist(spark, src_url, "items_t")
    drop_table_if_exists(spark, src_url, "audit_t")
    drop_table_if_exists(spark, src_url, "items_t")
    execute_ddl(spark, src_url, [
        "CREATE TABLE items_t (i_id BIGINT NOT NULL, i_qty INTEGER,"
        " CONSTRAINT pk_items_t PRIMARY KEY (i_id))",
        "CREATE TABLE audit_t (a_item BIGINT, a_qty INTEGER)",
        # seed audit history BEFORE the trigger exists so the copy can
        # prove it moves state, not replayed events
        "INSERT INTO audit_t VALUES (1, 1), (2, 2)",
        "CREATE TRIGGER trg_audit AFTER INSERT ON items_t"
        " REFERENCING NEW AS N FOR EACH ROW"
        " INSERT INTO audit_t VALUES (N.i_id, N.i_qty)",
    ])
    items = (
        load_table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").cast("bigint").alias("i_id"),
            F.col("n_regionkey").cast("int").alias("i_qty"),
        )
    )
    # drop the trigger around the SOURCE seed load so it does NOT
    # append one audit row per seeded item: the audit table must hold
    # exactly the 2-row history the oracle pins, making any per-row
    # replay during the TARGET bulk load (the bug the trigger-last
    # ordering prevents) visible as a count mismatch.
    execute_ddl(spark, src_url, ["DROP TRIGGER trg_audit"])
    JdbcWriteSpec(url=src_url, table="items_t", mode="append").save(items)
    execute_ddl(spark, src_url, [
        "CREATE TRIGGER trg_audit AFTER INSERT ON items_t"
        " REFERENCING NEW AS N FOR EACH ROW"
        " INSERT INTO audit_t VALUES (N.i_id, N.i_qty)",
    ])
    copy_tables_jdbc_with_schema(spark, src_url, dst_url, ["audit_t", "items_t"])

    trgs = introspect_triggers(spark, dst_url, "items_t")
    rows = [
        (
            "trigger",
            f"{t.name.lower()}:"
            f"{'AFTER' if t.firing_time == 'A' else 'BEFORE'} "
            f"{ {'I': 'INSERT', 'U': 'UPDATE', 'D': 'DELETE'}[t.event] } "
            f"{'ROW' if t.row_level else 'STATEMENT'} "
            f"NEW={t.new_referencing_name}",
        )
        for t in trgs
    ]
    n_items = JdbcReadSpec(url=dst_url, table="items_t").load(spark).count()
    rows.append(("items_rows", str(n_items)))
    n_audit = JdbcReadSpec(url=dst_url, table="audit_t").load(spark).count()
    rows.append(("audit_rows_after_copy", str(n_audit)))
    # live proof: the copied trigger fires on the target
    execute_ddl(spark, dst_url, ["INSERT INTO items_t VALUES (9001, 7)"])
    live = (
        JdbcReadSpec(
            url=dst_url,
            query="SELECT a_item, a_qty FROM audit_t WHERE a_item = 9001",
        )
        .load(spark)
        .collect()[0]
    )
    rows.append(("live_audit_row", f"{live['A_ITEM']}|{live['A_QTY']}"))
    n_audit2 = JdbcReadSpec(url=dst_url, table="audit_t").load(spark).count()
    rows.append(("audit_rows_after_insert", str(n_audit2)))
    return spark.createDataFrame(rows, "kind string, detail string")


@register(
    "schema_introspect_grants",
    oracle="""
    SELECT kind, detail FROM (VALUES
      ('grant', 'analyst:SELECT'),
      ('grant', 'etl_writer:INSERT,UPDATE'),
      ('live_select_as_analyst', '25'),
      ('live_delete_as_analyst', 'DENIED:42500'),
      ('row_count', '25')) AS t(kind, detail)
    """,
)
def q_schema_introspect_grants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMO-Scripter PERMISSIONS parity — the LAST Scripter option not
    previously carried through the copy (VERDICT r7 item 4; upstream
    replays object-level GRANTs onto the target server [U], Derby's
    SYS.SYSTABLEPERMS under SQL authorization stands in for
    sys.database_permissions). Build a source database with SQL
    authorization enabled, grant two principals distinct table-level
    privilege sets, schema-fidelity-copy the table, script the grants
    onto the target, then prove three things: (a) the TARGET catalog
    reports exactly the source's grantee→privilege map (hash-pinned),
    (b) a granted privilege is LIVE — connecting AS the analyst
    principal can SELECT the copied rows — and (c) a withheld privilege
    is ENFORCED — the same principal's DELETE is rejected with Derby's
    42500 not-authorized SQLState, so the copy reproduced the fence,
    not just the fence's catalog entry.

    The sqlAuthorization flag is a creation-time database property
    (Derby reads the JVM system property as the default when the
    database is FIRST created), so it is set only around the two
    creating connections and restored in a finally — the other Derby
    fixtures in this module are unaffected."""
    from copy_databasetables_spark.sources.introspect import (
        copy_table_jdbc_with_schema,
        drop_table_if_exists,
        execute_ddl,
        introspect_grants,
        script_grants,
    )
    from copy_databasetables_spark.sources.jdbc import JdbcReadSpec, JdbcWriteSpec

    src_url = _derby_url(sf_dir, "grant_src")
    dst_url = _derby_url(sf_dir, "grant_dst")
    jvm = spark._sc._jvm  # noqa: SLF001
    sysprops = jvm.java.lang.System
    prev = sysprops.getProperty("derby.database.sqlAuthorization")
    sysprops.setProperty("derby.database.sqlAuthorization", "true")
    try:
        # first connection CREATES both databases with authorization on
        jvm.java.sql.DriverManager.getConnection(src_url).close()
        jvm.java.sql.DriverManager.getConnection(dst_url).close()
    finally:
        if prev is None:
            sysprops.clearProperty("derby.database.sqlAuthorization")
        else:
            sysprops.setProperty("derby.database.sqlAuthorization", prev)

    drop_table_if_exists(spark, src_url, "perm_t")  # re-run hygiene
    execute_ddl(spark, src_url, [
        "CREATE TABLE perm_t (p_id BIGINT NOT NULL, p_val INTEGER,"
        " CONSTRAINT pk_perm_t PRIMARY KEY (p_id))",
        "GRANT SELECT ON perm_t TO analyst",
        "GRANT INSERT, UPDATE ON perm_t TO etl_writer",
    ])
    seed = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("p_id"),
        F.col("n_regionkey").cast("int").alias("p_val"),
    )
    JdbcWriteSpec(url=src_url, table="perm_t", mode="append").save(seed)

    copy_table_jdbc_with_schema(spark, src_url, dst_url, "perm_t")
    grants = introspect_grants(spark, src_url, "perm_t")
    execute_ddl(spark, dst_url, script_grants(grants))

    # (a) target catalog reports the copied grants
    rows = [
        ("grant", f"{g.grantee.lower()}:{','.join(g.privileges)}")
        for g in introspect_grants(spark, dst_url, "perm_t")
    ]
    # (b)/(c) live enforcement AS the grantee principal (embedded Derby
    # without authentication accepts any user; authorization still
    # applies, which is exactly what this proves)
    analyst = jvm.java.sql.DriverManager.getConnection(dst_url + ";user=analyst")
    try:
        st = analyst.createStatement()
        rs = st.executeQuery("SELECT COUNT(*) AS c FROM APP.perm_t")
        rs.next()
        rows.append(("live_select_as_analyst", str(rs.getInt("c"))))
        rs.close()
        try:
            st.execute("DELETE FROM APP.perm_t")
            rows.append(("live_delete_as_analyst", "ALLOWED"))
        except Exception as e:
            state = "42500" if "42500" in str(e) else "other"
            rows.append(("live_delete_as_analyst", f"DENIED:{state}"))
        st.close()
    finally:
        analyst.close()
    n = JdbcReadSpec(url=dst_url, table="perm_t").load(spark).count()
    rows.append(("row_count", str(n)))
    return spark.createDataFrame(rows, "kind string, detail string")


@register(
    "src_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
           o_orderpriority
    FROM orders
    """,
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip — the other columnar lake format Spark ships a
    vectorized reader for. orders is written to ORC and read back with
    the declared schema; the hash against the parquet source proves the
    format conversion is lossless (types, nulls, timestamps).

    Scale note: ORC splits by stripe like parquet splits by row group,
    so everything SCALE.md says about maxPartitionBytes applies; keep
    NTZ timestamps — ORC TIMESTAMP is wall-clock (no zone), matching the
    engine's uniform NTZ discipline."""
    o = load_table(spark, sf_dir, "orders")
    path = _out("roundtrip_orc", sf_dir)
    o.write.mode("overwrite").orc(path)
    back = spark.read.schema(SCHEMAS["orders"]).orc(path)
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        us("o_orderdate", "o_orderdate_us"),
        "o_orderpriority",
    )


@register("copy_table_incremental", oracle=_D_ORDERS)
def q_copy_table_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental copy mode: seed the target with the lower half of
    orders (by key), then run the incremental copy — it must move ONLY
    the rows above the target's high-water mark and land exactly at
    source parity (hash vs the full source proves no row was skipped or
    duplicated)."""
    from copy_databasetables_spark.copy.engine import copy_table_incremental

    target = _out("copy_table_incremental", sf_dir, "orders")
    src = load_table(spark, sf_dir, "orders")
    half = src.agg((F.max("o_orderkey") / 2).cast("bigint").alias("h")).collect()[0]["h"]
    # seed: a previous run that stopped mid-table
    src.where(F.col("o_orderkey") <= half).write.mode("overwrite").parquet(target)
    copy_table_incremental(spark, sf_dir, "orders", target, key="o_orderkey")
    return _orders_projected(spark.read.parquet(target))


@register("copy_table_compact", oracle=_D_ORDERS)
def q_copy_table_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction: fragment orders into 64 tiny files, then
    compact to ~4 MB targets. Content must hash-identical to the source
    (compaction moves bytes, never rows); the file-count drop is
    asserted here because the oracle can only see rows."""
    from copy_databasetables_spark.copy.engine import compact_table

    frag = _out("copy_table_compact", sf_dir, "frag")
    compacted = _out("copy_table_compact", sf_dir, "compacted")
    src = load_table(spark, sf_dir, "orders")
    src.repartition(64).write.mode("overwrite").parquet(frag)
    n_out = compact_table(spark, frag, compacted, target_file_bytes=4 * 1024 * 1024)
    n_in = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    assert n_out < n_in, f"compaction did not reduce file count ({n_in} -> {n_out})"
    return _orders_projected(spark.read.parquet(compacted))


@register("copy_table_bucketed", oracle=_D_ORDERS)
def q_copy_table_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed catalog copy: land orders as a bucketed+sorted table
    (8 buckets on o_orderkey). Bucketing is SCALE.md's co-located-join
    answer — two tables bucketed the same way join with NO exchange
    (plan-proven by tests/test_plans.py::test_bucketed_join_avoids_shuffle);
    the copy here proves the bucketed layout is content-lossless (hash
    vs source). saveAsTable is required: plain parquet has no bucket
    metadata."""
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"spark_graft_bucketed_orders_{sf_tag}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", _out("copy_table_bucketed", sf_dir, "orders"))
        .saveAsTable(name)
    )
    return _orders_projected(spark.table(name))


@register("copy_table_merge", oracle=_D_ORDERS)
def q_copy_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert) copy: seed the target with the lower half of
    orders CORRUPTED (prices zeroed, status X); the merge must REPLACE
    every corrupted row with its source version and INSERT the upper
    half — landing exactly at source parity, proven by the hash vs the
    full source oracle. The third MERGE leg (target-only rows survive)
    is unit-tested in test_copy.py, since it by definition leaves the
    target different from the source."""
    from copy_databasetables_spark.copy.engine import merge_table

    target = _out("copy_table_merge", sf_dir, "orders")
    src = load_table(spark, sf_dir, "orders")
    half = src.agg((F.max("o_orderkey") / 2).cast("bigint").alias("h")).collect()[0]["h"]
    (
        src.where(F.col("o_orderkey") <= half)
        .withColumn("o_totalprice", F.lit(0.0))
        .withColumn("o_orderstatus", F.lit("X"))
        .write.mode("overwrite")
        .parquet(target)
    )
    merge_table(spark, sf_dir, "orders", target, key="o_orderkey")
    return _orders_projected(spark.read.parquet(target))


@register(
    "copy_table_cdc_apply",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 13 = 0 THEN 'R'
                WHEN o_orderkey % 7 = 0 THEN 'U'
                ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 2.0
                WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice,
           epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
           o_orderpriority
    FROM orders
    WHERE o_orderkey % 13 != 0 OR o_orderkey % 3 = 0
    """,
)
def q_copy_table_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change-log application (engine.apply_cdc): seed the target
    with 80% of orders, then apply a 4-stage I/U/D log derived from the
    source by modular rules — seq 1 INSERTs the missing 20%, seq 2
    UPDATEs every %7 key (+1.0 price, status U), seq 3 DELETEs every
    %13 key, seq 4 RE-INSERTs the deleted %3 keys (+2.0 price, status
    R). The oracle recomputes the final state directly from the same
    rules, so it proves ordering semantics end-to-end: the re-insert
    must beat the delete, the update must apply over both base and
    inserted rows, and deleted-never-reinserted keys must be absent.
    The final state is round-tripped through the parquet target (write
    → read back) like every other copy mode."""
    from copy_databasetables_spark.copy.engine import apply_cdc

    src = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")

    def staged(df: DataFrame, op: str, seq: int) -> DataFrame:
        return df.withColumn("op", F.lit(op)).withColumn(
            "seq", F.lit(seq).cast("long")
        )

    base = src.where(k % 10 < 8)
    changes = (
        staged(src.where(k % 10 >= 8), "I", 1)
        .unionByName(
            staged(
                src.where(k % 7 == 0)
                .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
                .withColumn("o_orderstatus", F.lit("U")),
                "U",
                2,
            )
        )
        .unionByName(staged(src.where(k % 13 == 0), "D", 3))
        .unionByName(
            staged(
                src.where((k % 13 == 0) & (k % 3 == 0))
                .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(2.0))
                .withColumn("o_orderstatus", F.lit("R")),
                "I",
                4,
            )
        )
    )
    target = _out("copy_table_cdc_apply", sf_dir, "orders")
    apply_cdc(base, changes, "o_orderkey").write.mode("overwrite").parquet(target)
    return _orders_projected(spark.read.parquet(target))


@register(
    "q_integrity_report",
    oracle="""
    SELECT 'orders.o_custkey->customer.c_custkey' AS fk_edge,
           (SELECT COUNT(*) FROM orders) AS n_child_rows,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders.o_orderkey',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'customer.c_nationkey->nation.n_nationkey',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'nation.n_regionkey->region.r_regionkey',
           (SELECT COUNT(*) FROM nation),
           (SELECT COUNT(*) FROM nation n
            WHERE NOT EXISTS (SELECT 1 FROM region r
                              WHERE r.r_regionkey = n.n_regionkey))
    """,
)
def q_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity report over the FK graph — the validation a
    table-copy job runs after loading in FK order: for each edge, the
    child row count and the orphan count (child keys with no parent).
    Each orphan check is a LEFT ANTI join (shuffle on the key, no
    payload columns move); at 100 TB each edge is one key-only shuffle,
    and a nonzero orphan count is the signal to stop the pipeline."""
    edges = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    parts = []
    for child, ck, parent, pk in edges:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent)
        orphans = c.join(p, c[ck] == p[pk], "left_anti")
        parts.append(
            c.agg(F.count(F.lit(1)).alias("n_child_rows")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            ).select(
                F.lit(f"{child}.{ck}->{parent}.{pk}").alias("fk_edge"),
                "n_child_rows",
                "n_orphans",
            )
        )
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    return out


_PROFILE_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_totalprice", "double"),
    ("o_orderstatus", "string"),
]


@register(
    "q_table_profile",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_non_null,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_repr,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_repr
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    """,
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile report (the pre/post-copy data-profiling tool):
    per column — row count, non-null count, exact distinct count,
    min/max (as strings so heterogenous types stack in one report).
    All four columns profile in ONE aggregate over the table.

    Scale note: multiple EXACT distincts in one aggregate compile to an
    Expand (input multiplied once per distinct column) — fine here and
    the only oracle-hashable form, but at 100 TB a profile switches to
    ``approx_count_distinct`` (HLL++, constant memory, no Expand); the
    rest of the report is a plain single-pass aggregate either way."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for name, typ in _PROFILE_COLS:
        aggs += [
            F.count(name).alias(f"{name}__nn"),
            F.countDistinct(name).alias(f"{name}__nd"),
            F.min(name).cast("string").alias(f"{name}__min"),
            F.max(name).cast("string").alias(f"{name}__max"),
        ]
    row = o.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    parts = [
        row.select(
            F.lit(name).alias("column_name"),
            F.col("n_rows"),
            F.col(f"{name}__nn").alias("n_non_null"),
            F.col(f"{name}__nd").alias("n_distinct"),
            F.col(f"{name}__min").alias("min_repr"),
            F.col(f"{name}__max").alias("max_repr"),
        )
        for name, _ in _PROFILE_COLS
    ]
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    return out


@register(
    "q_copy_diff",
    oracle="""
    WITH v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 100 = 0
                  THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 3
    ),
    v1 AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders)
    SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v2.o_orderkey IS NULL THEN 'delete'
                WHEN v1.o_orderkey IS NULL THEN 'insert'
                ELSE 'update' END AS change_type
    FROM v1 FULL JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v2.o_orderkey IS NULL
       OR v1.o_orderkey IS NULL
       OR v1.o_totalprice <> v2.o_totalprice
       OR v1.o_orderstatus <> v2.o_orderstatus
    """,
)
def q_copy_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the CDC computation a recurring copy job runs to
    find what changed since the last copy: FULL OUTER join of the two
    versions on the key, classify each row insert/update/delete by
    null-side and value comparison. Here version 2 is derived
    deterministically from version 1 (every 100th key's price bumped =
    updates; every 97th-residue-3 key dropped = deletes) so the oracle
    reproduces the same diff.

    Scale notes: ONE shuffle of each snapshot on the key; the value
    comparison uses a per-row hash in production (compare 8 bytes, not
    every column — ``content_checksum``'s row hash works) so the diff
    of a 100 TB table moves keys + hashes, not payloads. Emitted deltas
    feed merge_table (update/insert legs) and an anti-join delete."""
    v1 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    v2 = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 97 != 3)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 100 == 0, F.col("o_totalprice") + 1.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
    )
    a = v1.select(
        F.col("o_orderkey").alias("k1"),
        F.col("o_totalprice").alias("p1"),
        F.col("o_orderstatus").alias("s1"),
    )
    b = v2.select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_totalprice").alias("p2"),
        F.col("o_orderstatus").alias("s2"),
    )
    return (
        a.join(b, a.k1 == b.k2, "full")
        .where(
            F.col("k2").isNull()
            | F.col("k1").isNull()
            | (F.col("p1") != F.col("p2"))
            | (F.col("s1") != F.col("s2"))
        )
        .select(
            F.coalesce("k1", "k2").alias("o_orderkey"),
            F.when(F.col("k2").isNull(), "delete")
            .when(F.col("k1").isNull(), "insert")
            .otherwise("update")
            .alias("change_type"),
        )
    )


@register(
    "copy_table_scd2",
    oracle="""
    WITH snap1 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal - 50.0
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 13 <> 0),
    snap2 AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
              WHERE c_custkey % 17 <> 0),
    j AS (SELECT s1.c_custkey AS k1, s1.c_acctbal AS b1,
                 s1.c_mktsegment AS m1,
                 s2.c_custkey AS k2, s2.c_acctbal AS b2,
                 s2.c_mktsegment AS m2
          FROM snap1 s1 FULL OUTER JOIN snap2 s2
            ON s1.c_custkey = s2.c_custkey)
    SELECT k1 AS c_custkey, b1 AS c_acctbal, m1 AS c_mktsegment,
           '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
           TRUE AS is_current
    FROM j WHERE k1 IS NOT NULL AND k2 IS NOT NULL
               AND b1 = b2 AND m1 = m2
    UNION ALL
    SELECT k1, b1, m1, '2024-01-01', '2024-02-01', FALSE
    FROM j WHERE k1 IS NOT NULL
               AND (k2 IS NULL OR b1 <> b2 OR m1 <> m2)
    UNION ALL
    SELECT k2, b2, m2, '2024-02-01', CAST(NULL AS VARCHAR), TRUE
    FROM j WHERE k2 IS NOT NULL
               AND (k1 IS NULL OR b1 <> b2 OR m1 <> m2)
    """,
)
def q_copy_table_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 copy (copy/engine.scd2_apply):
    two customer snapshots — day 1 with some balances shifted and the
    %13 keys not yet present, day 2 the live table minus the %17 keys —
    drive the full SCD2 state machine: changed keys carry a CLOSED
    day-1 version plus an open day-2 version, late-arriving keys insert
    at day 2, vanished keys close with no successor, untouched keys
    keep their day-1 open row. The published dimension is hash-checked
    against a DuckDB reconstruction of all four legs.

    This is the history-preserving step past copy_table_merge: merge
    answers "what is current", SCD2 answers "what was true when" — the
    mode a warehouse sync needs for dimensions feeding point-in-time
    joins (q_join_asof consumes exactly this shape)."""
    from copy_databasetables_spark.copy.engine import scd2_apply

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    tracked = ["c_acctbal", "c_mktsegment"]
    snap1 = cust.where(F.col("c_custkey") % 13 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") - 50.0
        ).otherwise(F.col("c_acctbal")),
    )
    snap2 = cust.where(F.col("c_custkey") % 17 != 0)
    dim = scd2_apply(None, snap1, "c_custkey", tracked, "2024-01-01")
    dim = scd2_apply(dim, snap2, "c_custkey", tracked, "2024-02-01")
    target = _out("copy_table_scd2", sf_dir, "customer_dim")
    dim.write.mode("overwrite").parquet(target)
    return spark.read.parquet(target)


def _z_spread_expr(col: str) -> str:
    """Interleave-ready spread of a 16-bit value: after this, bit i of
    the input sits at bit 2i of the output."""
    x = f"(({col}) & 65535)"
    s1 = f"(({x} | ({x} << 8)) & 16711935)"  # 0x00FF00FF
    s2 = f"(({s1} | ({s1} << 4)) & 252645135)"  # 0x0F0F0F0F
    s3 = f"(({s2} | ({s2} << 2)) & 858993459)"  # 0x33333333
    s4 = f"(({s3} | ({s3} << 1)) & 1431655765)"  # 0x55555555
    return s4


@register("snk_zorder_write", oracle=_D_ORDERS)
def q_snk_zorder_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered write: orders laid out on the morton interleave
    of (o_custkey, o_orderdate) — the multi-dimensional data-skipping
    layout (Delta OPTIMIZE ZORDER / Iceberg sort orders) that a plain
    sort can't give: sorting by one key clusters ONE column's row-group
    min/max; the z-curve clusters BOTH, so parquet footer pruning works
    for customer-filtered AND date-filtered scans of the same copy.

    Mechanics, all codegen bitwise ops: scale each key to 16 bits
    against its min/max (one scalar agg broadcast — at 100 TB these
    bounds come from table stats), spread bits with the mask-and-shift
    ladder, OR the two spreads offset by one bit, then
    repartitionByRange + sortWithinPartitions on the z value (one range
    exchange — the same cost as a plain sorted write). Content is
    untouched — the oracle hash-checks the full table against the
    source; the min/max-narrowing evidence per output file is pinned in
    tests/test_operators.py (both dimensions cluster simultaneously)."""
    src = load_table(spark, sf_dir, "orders")
    bounds = src.agg(
        F.min("o_custkey").alias("ck_min"),
        F.max("o_custkey").alias("ck_max"),
        F.min(F.datediff("o_orderdate", F.lit("1970-01-01"))).alias("d_min"),
        F.max(F.datediff("o_orderdate", F.lit("1970-01-01"))).alias("d_max"),
    )
    norm = (
        "cast(floor((cast({v} as double) - {lo}) * 65535.0 / "
        "greatest(cast({hi} - {lo} as double), 1.0)) as bigint)"
    )
    ck16 = norm.format(v="o_custkey", lo="ck_min", hi="ck_max")
    d16 = norm.format(
        v="datediff(o_orderdate, '1970-01-01')", lo="d_min", hi="d_max"
    )
    z = f"({_z_spread_expr(ck16)}) | (({_z_spread_expr(d16)}) << 1)"
    target = _out("snk_zorder_write", sf_dir, "orders")
    (
        src.crossJoin(F.broadcast(bounds))
        .withColumn("_z", F.expr(z))
        .repartitionByRange(8, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", "ck_min", "ck_max", "d_min", "d_max")
        .write.mode("overwrite")
        .parquet(target)
    )
    return _orders_projected(spark.read.parquet(target))


@register(
    "copy_table_evolve",
    oracle="""
    WITH h AS (SELECT CAST(FLOOR(MAX(o_orderkey) / 2.0) AS BIGINT) AS half
               FROM orders)
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
           CASE WHEN o_orderkey <= (SELECT half FROM h)
                THEN NULL ELSE o_orderpriority END AS o_orderpriority
    FROM orders
    """,
)
def q_copy_table_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution copy: the long-lived-target reality the plain
    copy modes ignore — the source GREW a column between syncs. Day 1
    lands the lower half of orders WITHOUT o_orderpriority (the legacy
    schema); day 2 appends the upper half WITH it; the read-back uses
    parquet schema merging so the union schema surfaces, and legacy
    rows report NULL for the new column (the evolution-correct answer:
    fabricating a default would erase the fact that the value was never
    recorded — a downstream backfill is an explicit, separate decision).
    Hash-checked against an oracle that reconstructs exactly that
    NULL-for-legacy shape from the source.

    Scale notes: mergeSchema=true is a FOOTER-READ of every file, which
    at 100 TB is exactly the metadata storm explicit schemas avoid
    (SCALE.md "Scans") — production pins the merged schema in the
    catalog (or passes it explicitly) after ONE evolution event; the
    per-file merge here demonstrates the semantics. Appends never
    rewrite day-1 files: evolution is metadata-only on the write path,
    which is what makes it affordable on a 100 TB target."""
    src = load_table(spark, sf_dir, "orders")
    half = (
        src.agg((F.max("o_orderkey") / 2).cast("bigint").alias("h"))
        .collect()[0]["h"]
    )
    target = _out("copy_table_evolve", sf_dir, "orders")
    import shutil

    shutil.rmtree(target, ignore_errors=True)
    (
        src.where(F.col("o_orderkey") <= half)
        .drop("o_orderpriority")
        .write.mode("overwrite")
        .parquet(target)
    )
    (
        src.where(F.col("o_orderkey") > half)
        .write.mode("append")
        .parquet(target)
    )
    return _orders_projected(
        spark.read.option("mergeSchema", "true").parquet(target)
    )


# --------------------------------------------------------------------------
# src_binary_files — the binaryFile ingestion source (r11): how raw
# media lands in the engine BEFORE it becomes a parquet binary column.
# --------------------------------------------------------------------------

_MEDIA_EVERY = 5  # every 5th doc: 100 files (documents is fixed 500 rows at every SF)


def _media_stage_dir(sf_dir: str) -> str:
    return f"{_IO_ROOT}/src_binary_files/{os.path.basename(sf_dir.rstrip('/'))}"


def _stage_media_files(spark: SparkSession, sf_dir: str) -> str:
    """Write one blob file per sampled document (UTF-8 text payload —
    all-ASCII testdata, so both engines can recompute the digest) into
    a per-SF staging dir. The write is a DISTRIBUTED side effect
    (mapInPandas writing doc_<id>.bin via tmp+rename, then a count to
    force it) — the same shape a real media-landing job has. Idempotent:
    rename is atomic and content is deterministic per doc.

    Reconciliation (r11 ADVICE): the stage dir is WIPED before every
    staging run — a stale ``doc_*.bin`` left by a prior testdata
    generation (or an older ``_MEDIA_EVERY``) would otherwise survive,
    be picked up by the binaryFile scan, and fail the gate with a
    phantom row; rewriting ~100 tiny files per run is far cheaper than
    diffing. Filesystem assumption: the executor-side writers and this
    driver-side wipe share ONE filesystem — true in local mode (and on
    clusters with a shared mount); on a real cluster the landing dir is
    an object-store path and the writers use the store's put API, with
    the same wipe-or-reconcile step against the store listing."""
    stage = _media_stage_dir(sf_dir)
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % _MEDIA_EVERY == 0)
        .select("doc_id", "text")
    )

    def _write(batches):
        import os as _os

        import pandas as _pd

        n = 0
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                final = f"{stage}/doc_{doc_id}.bin"
                tmp = f"{final}.tmp.{_os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(text.encode("utf-8"))
                _os.replace(tmp, final)
                n += 1
        yield _pd.DataFrame({"n": [n]})

    docs.mapInPandas(_write, schema="n long").agg(F.sum("n")).collect()
    return stage


@register(
    "src_binary_files",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id % {_MEDIA_EVERY} = 0
    """,
)
def src_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-media ingestion via Spark's ``binaryFile`` source — the
    step every multimodal pipeline starts with: a directory of blob
    files becomes (path, length, content) rows, here projected to
    (doc_id parsed from the filename, byte length, content digest).
    The staging files are written by this op itself (distributed
    side-effect write, see _stage_media_files); the DuckDB oracle
    recomputes (id, byte length, digest) from the documents VIEW — the
    sink-op discipline (snk_partitioned_write et al.): the roundtrip
    write → binaryFile scan must hash-equal the source-derived truth,
    so a corrupted, truncated, dropped, or doubled file fails the gate.

    Scale notes (100 TB): binaryFile is a real FileFormat — the
    listing parallelizes, each file is one row (spark.sql.files.
    maxPartitionBytes packs small files per task), and column pruning
    applies (dropping ``content`` reads only file STATUS — length/path
    audits never touch the bytes). The pattern at scale: land blobs →
    binaryFile scan → write (id, payload, metadata) parquet ONCE, then
    run every downstream decode (q_multimodal_*) off the parquet —
    small-files pain is paid exactly once at the landing edge."""
    stage = _stage_media_files(spark, sf_dir)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(stage)
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").cast("bigint").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
    )

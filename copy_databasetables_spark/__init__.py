"""copy_databasetables_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the capabilities of the reference
repo `drewfurgiuele/Copy-DatabaseTables` (a SQL Server table-copy utility:
SMO schema scripting + SqlBulkCopy data movement), re-expressed as
DataFrame/SQL logical plans optimized by Catalyst, and extended with the
relational / streaming / LLM-data-pipeline operator surface declared in
SURVEY.md §2.

NOTE on citations: the reference checkout at /root/reference/ is empty
(verified — SURVEY.md §0), so reference parity claims cite SURVEY.md
sections ([U] reconstructions) rather than file:line into the reference.

Layout:
    session.py   — SparkSession factory + required confs (TZ, NANOS, AQE)
    io.py        — schema-checked testdata loaders (events ts workaround)
    copy/        — reference-parity copy engine (copy_table & friends)
    operators/   — the §2 operator library; each op registers a
                   (query fn, DuckDB oracle SQL) pair
    sources/     — JDBC source/sink option assembly (offline: unit-tested)
    streaming/   — Structured Streaming wrappers for §2.9 operators
    plans/       — plan-inspection helpers + 100 TB scale design notes
"""

from copy_databasetables_spark.session import configure_session, get_spark

__all__ = ["get_spark", "configure_session"]

"""IO-layer hardening: text-format escaping, the events ts type branch
checked against the parquet bytes, and loaded-data sanity guards that
catch a testdata regeneration changing physical types (the r4 incident:
ts flipped TIMESTAMP(NANOS) → timestamp[us], the loader silently
produced 1970 timestamps, and no test noticed)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F
from pyspark.sql import types as T

from copy_databasetables_spark.io import (
    SCHEMAS,
    TABLES,
    events_read_schema,
    events_ts_kind,
    load_table,
    table_path,
)
from tests.conftest import SF_SMOKE


def test_csv_roundtrip_survives_hostile_strings(spark):
    """CSV with embedded delimiters, quotes, newlines, unicode, and
    empty strings must round-trip losslessly with the same options the
    src_csv_json_roundtrip operator uses. ``multiLine`` is load-bearing:
    the default reader silently truncates values at embedded newlines
    (found by this test; the operator now sets it)."""
    rows = [
        (1, "plain"),
        (2, "comma, inside"),
        (3, 'quote " inside'),
        (4, "newline\ninside"),
        (5, "tab\tinside"),
        (6, "ünïcødé — 中文"),
        (7, ""),
        (8, "  leading and trailing  "),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    path = "/tmp/spark_graft_test_io/hostile_csv"
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )
    back = (
        spark.read.schema("id long, s string")
        .option("header", "true")
        .option("multiLine", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )
    got = {r["id"]: r["s"] for r in back.collect()}
    for i, s in rows:
        # Spark's CSV writer emits nothing for "" and reads it back as
        # null — a documented text-format limitation, not data corruption
        expected = s if s != "" else None
        assert got[i] == expected, (i, s, got[i])


def test_json_roundtrip_survives_hostile_strings(spark):
    rows = [(1, 'quote " and \\ backslash'), (2, "newline\nand unicode ✓"), (3, "")]
    df = spark.createDataFrame(rows, "id long, s string")
    path = "/tmp/spark_graft_test_io/hostile_json"
    df.write.mode("overwrite").json(path)
    back = spark.read.schema("id long, s string").json(path)
    got = {r["id"]: r["s"] for r in back.collect()}
    for i, s in rows:
        assert got[i] == s  # JSON preserves empty strings, unlike CSV


def test_events_ts_matches_parquet_bytes(spark):
    """The loader's timestamp must equal the file's raw value exactly —
    floor(raw_ns / 1000) µs for the NANOS generation, the µs value
    as-is for the timestamp[us] generation — checked against the parquet
    bytes via pyarrow, not against another Spark read. (The pre-r5
    version of this test applied the same ÷1000 to both sides, so it
    stayed green while the loader compressed time 1000×.)"""
    path = table_path(SF_SMOKE, "events")
    kind = events_ts_kind(path)
    raw = pq.read_table(path, columns=["event_id", "ts"])
    ints = raw.column("ts").cast(pa.int64()).to_pylist()  # ns or µs by kind
    expected = dict(
        zip(
            raw.column("event_id").to_pylist(),
            [v // 1000 for v in ints] if kind == "long" else ints,
        )
    )
    loaded = {
        r["event_id"]: r["us"]
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .collect()
    }
    assert len(loaded) == len(expected) == 1000
    for eid, want in expected.items():
        assert loaded[eid] == want, (eid, want, loaded[eid])


def test_loader_branch_handles_both_ts_encodings(spark, tmp_path):
    """Self-contained proof of BOTH loader branches: write the same
    logical events rows as TIMESTAMP(NANOS) and as timestamp[us], load
    each through load_table, and require identical timestamps. Keeps
    the branch not exercised by the CURRENT testdata generation under
    test forever.

    Uses pytest's tmp_path (per-run unique dirs), NOT a fixed /tmp
    path: the loader's _TS_KIND_CACHE keys on path+mtime, so two
    rewrites of one fixed path within mtime granularity could serve a
    stale cached ts-kind across runs (ADVICE.md r5)."""
    import os

    base = 1704067200_000_000  # 2024-01-01T00:00:00Z in µs
    rows_us = [base + i * 1_000_003 for i in range(7)]
    n = len(rows_us)
    cols = {
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array([0.5] * n, pa.float64()),
        "props": pa.array(["{}"] * n),
    }

    def write(dirname: str, ts_arr):
        d = str(tmp_path / dirname)
        os.makedirs(d)
        t = pa.table(
            {
                "event_id": cols["event_id"],
                "ts": ts_arr,
                "user_id": cols["user_id"],
                "event_type": cols["event_type"],
                "value": cols["value"],
                "props": cols["props"],
            }
        )
        pq.write_table(t, f"{d}/events.parquet", version="2.6", coerce_timestamps=None)
        return d

    d_us = write("enc_us", pa.array(rows_us, pa.timestamp("us")))
    d_ns = write("enc_ns", pa.array([v * 1000 + 999 for v in rows_us], pa.timestamp("ns")))

    from copy_databasetables_spark.io import events_ts_kind

    assert events_ts_kind(f"{d_us}/events.parquet") == "timestamp"
    assert events_ts_kind(f"{d_ns}/events.parquet") == "long"

    def loaded(d):
        return {
            r["event_id"]: r["us"]
            for r in load_table(spark, d, "events")
            .select("event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
            .collect()
        }

    got_us, got_ns = loaded(d_us), loaded(d_ns)
    want = dict(enumerate(rows_us))
    # µs file: values verbatim; ns file: the +999 ns floor-truncate away
    assert got_us == want, got_us
    assert got_ns == want, got_ns


def test_events_loader_handles_directory_parquet(spark, tmp_path):
    """events.parquet as a Spark-written DIRECTORY (the production
    layout, and what the stress harness's blowup emits) must load
    identically to the single-file layout: the footer sniff picks a
    part file instead of trying to open the directory (r7 fix — the
    events blowup previously crashed the loader)."""
    src = load_table(spark, SF_SMOKE, "events").limit(50)
    d = str(tmp_path / "evdir")
    src.write.parquet(f"{d}/events.parquet")
    assert events_ts_kind(f"{d}/events.parquet") == "timestamp"
    reread = load_table(spark, d, "events")
    assert reread.count() == 50
    assert [f.name for f in reread.schema.fields] == [
        f.name for f in src.schema.fields
    ]


def test_loaded_events_in_documented_range(spark):
    """Loaded-data drift guard: the events table spans January 2024
    (TESTDATA.md). If a regeneration changes the ts physical encoding
    and the loader misreads it (the r4 bug: every ts collapsed into a
    43-minute window in 1970), this fails loudly."""
    ev = load_table(spark, SF_SMOKE, "events")
    lo, hi = ev.select(F.min("ts"), F.max("ts")).first()
    assert lo.year == 2024, f"events min(ts)={lo} — loader misread the ts encoding?"
    assert hi.year == 2024, f"events max(ts)={hi} — loader misread the ts encoding?"
    assert ev.schema["ts"].dataType == T.TimestampNTZType()


def test_declared_schemas_match_parquet_footers():
    """Every declared read schema physically matches the file footer —
    field names in order, and a type-for-type correspondence. Catches
    the next silent testdata regeneration at the source."""
    arrow_of = {
        T.IntegerType(): {pa.int32()},
        T.LongType(): {pa.int64()},
        T.DoubleType(): {pa.float64()},
        T.StringType(): {pa.string(), pa.large_string()},
        T.TimestampNTZType(): {pa.timestamp("us"), pa.timestamp("ms"), pa.timestamp("ns")},
        T.FloatType(): {pa.float32()},
    }
    for name in TABLES:
        path = table_path(SF_SMOKE, name)
        footer = pq.read_schema(path)
        declared = events_read_schema(path) if name == "events" else SCHEMAS[name]
        assert footer.names == [f.name for f in declared.fields], name
        for f in declared.fields:
            ftype = footer.field(f.name).type
            if name == "events" and f.name == "ts":
                # the type branch: long ⇔ int64 nanos, ntz ⇔ parquet TIMESTAMP
                if f.dataType == T.LongType():
                    assert pa.types.is_integer(ftype) or ftype == pa.timestamp("ns")
                else:
                    assert pa.types.is_timestamp(ftype), (name, f.name, ftype)
                continue
            if pa.types.is_list(ftype):
                # list field names differ ("element" vs "item") — compare
                # the value type only
                assert isinstance(f.dataType, T.ArrayType)
                assert ftype.value_type in arrow_of[f.dataType.elementType], (
                    name, f.name, str(ftype), f.dataType,
                )
                continue
            allowed = arrow_of[f.dataType]
            assert ftype in allowed, (name, f.name, str(ftype), f.dataType)


# --- all-tables drift guard (VERDICT r5 item 2) ----------------------------
# The r4 incident pattern generalized: a silent testdata regeneration can
# drift any table's row count, key ranges, or physical types — not just
# events.ts. Pin every table's LOADED (through load_table, so loader
# branch bugs are caught too) row count and key value ranges at sf0.001
# against TESTDATA.md's documented generation (seed=42, deterministic).
# Ranges are structural (dense surrogate keys, FK domains, documented
# date windows) with loose bounds on measures, so a re-run of the SAME
# generator passes and any real drift fails loudly.

#: (table, exact row count, {col: (lo, hi) inclusive LOADED-value bounds})
_DRIFT_EXPECT = {
    "region": (5, {"r_regionkey": (0, 4)}),
    "nation": (25, {"n_nationkey": (0, 24), "n_regionkey": (0, 4)}),
    "customer": (150, {"c_custkey": (0, 149), "c_nationkey": (0, 24),
                       "c_acctbal": (-1000.0, 10000.0)}),
    "supplier": (10, {"s_suppkey": (0, 9), "s_nationkey": (0, 24)}),
    "part": (200, {"p_partkey": (0, 199), "p_retailprice": (800.0, 1100.0)}),
    "orders": (1500, {"o_orderkey": (0, 1499), "o_custkey": (0, 149),
                      "o_totalprice": (0.0, 600000.0)}),
    "lineitem": (6000, {"l_orderkey": (0, 1499), "l_partkey": (0, 199),
                        "l_quantity": (1.0, 50.0), "l_discount": (0.0, 0.1),
                        "l_extendedprice": (800.0, 110000.0)}),
    "events": (1000, {"event_id": (0, 999), "user_id": (0, 14),
                      "value": (0.0, 1000.0)}),
    "documents": (500, {"doc_id": (0, 499), "n_chars": (1, 10000)}),
    "embeddings": (500, {"vec_id": (0, 499), "label": (0, 9)}),
}

#: date/timestamp columns: (col, lo year, hi year) inclusive
_DRIFT_TS = {
    "orders": [("o_orderdate", 1995, 2001)],
    "lineitem": [("l_shipdate", 1995, 2001)],
    "events": [("ts", 2024, 2024)],
}


def test_all_tables_in_documented_ranges(spark):
    """One aggregate job per table: exact sf0.001 row count plus
    min/max of every key/measure column inside documented bounds. Fails
    if a regeneration drifts counts, domains, or the loader misreads a
    re-encoded column (values would leave the window, as events.ts did
    in r4)."""
    assert set(_DRIFT_EXPECT) == set(TABLES)
    for name, (want_rows, bounds) in _DRIFT_EXPECT.items():
        df = load_table(spark, SF_SMOKE, name)
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in bounds:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        for c, _, _ in _DRIFT_TS.get(name, []):
            aggs += [F.min(F.year(c)).alias(f"ylo_{c}"),
                     F.max(F.year(c)).alias(f"yhi_{c}")]
        row = df.agg(*aggs).first()
        assert row["_n"] == want_rows, (name, row["_n"], want_rows)
        for c, (lo, hi) in bounds.items():
            assert lo <= row[f"lo_{c}"] and row[f"hi_{c}"] <= hi, (
                name, c, row[f"lo_{c}"], row[f"hi_{c}"], (lo, hi),
            )
        for c, ylo, yhi in _DRIFT_TS.get(name, []):
            assert ylo <= row[f"ylo_{c}"] and row[f"yhi_{c}"] <= yhi, (
                name, c, row[f"ylo_{c}"], row[f"yhi_{c}"], (ylo, yhi),
            )


def test_all_tables_footer_types_pinned():
    """Physical-footer pin for the columns the drift guard reads —
    catches a re-encode (e.g. int64→int32, timestamp unit change)
    BEFORE any Spark job runs, with the events.ts dual encoding
    explicitly allowed."""
    want = {
        "region": {"r_regionkey": {pa.int32()}},
        "nation": {"n_nationkey": {pa.int32()}, "n_regionkey": {pa.int32()}},
        "customer": {"c_custkey": {pa.int64()}, "c_acctbal": {pa.float64()}},
        "supplier": {"s_suppkey": {pa.int64()}},
        "part": {"p_partkey": {pa.int64()}, "p_retailprice": {pa.float64()}},
        "orders": {"o_orderkey": {pa.int64()},
                   "o_orderdate": {pa.timestamp("us"), pa.timestamp("ns")}},
        "lineitem": {"l_orderkey": {pa.int64()}, "l_quantity": {pa.float64()},
                     "l_shipdate": {pa.timestamp("us"), pa.timestamp("ns")}},
        "events": {"event_id": {pa.int64()},
                   "ts": {pa.timestamp("us"), pa.timestamp("ns")}},
        "documents": {"doc_id": {pa.int64()}, "n_chars": {pa.int64()}},
        "embeddings": {"vec_id": {pa.int64()}, "label": {pa.int32()}},
    }
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        for name, cols in want.items():
            footer = pq.read_schema(table_path(sf, name))
            for c, allowed in cols.items():
                assert footer.field(c).type in allowed, (
                    sf, name, c, str(footer.field(c).type),
                )

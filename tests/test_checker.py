"""Meta-tests of the differential comparator (tools/check.py): the gate
is only as trustworthy as its compare() — these prove it actually
rejects corrupted results instead of passing everything."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from check import canon, compare  # noqa: E402


def _base():
    return pd.DataFrame(
        {"k": [1, 2, 3], "v": [1.5, None, -0.0], "s": ["a", "b", None]}
    )


def test_compare_accepts_identical_and_reordered():
    a = _base()
    assert compare(a, a.copy()) == []
    # row order and column order must not matter
    shuffled = a.iloc[[2, 0, 1]][["s", "v", "k"]]
    assert compare(a, shuffled) == []


def test_compare_rejects_value_row_and_column_corruption():
    a = _base()
    wrong_val = a.copy()
    wrong_val.loc[0, "v"] = 1.5000001
    assert any("row diffs" in p for p in compare(a, wrong_val))

    missing_row = a.iloc[:2]
    assert any("row count" in p for p in compare(a, missing_row))

    renamed = a.rename(columns={"v": "value"})
    assert any("columns differ" in p for p in compare(a, renamed))


def test_canon_edge_values():
    # the equivalences the gate depends on — and nothing more.
    # Signed zero is DISTINGUISHED, matching the driver's hasher: the
    # r10 q_emb_covariance miss (Spark BigDecimal round → +0.0, DuckDB
    # IEEE round → -0.0) slipped through a local gate that collapsed
    # -0.0; the rz() output convention normalizes it on both engines
    # instead, and the gate must be able to catch a site that forgot.
    assert canon(-0.0) != canon(0.0)
    assert canon(float("nan")) == canon(None) == "<null>"
    assert canon(True) == "True"
    assert canon(1.0) != canon(1)  # float vs int stay distinct per-dtype
    assert canon(pd.Timestamp("2024-01-02 03:04:05")) == "2024-01-02T03:04:05"


#: raw doubles whose 6dp rounding exercises the signed-zero boundary:
#: tiny negatives that round to zero (the exact q_emb_covariance cell
#: shape), tiny positives, real negatives that must KEEP their sign,
#: and exact ±0.0 inputs.
_SZ_VALUES = [
    -1e-9, -4.9e-7, -4.999e-7, 4.9e-7, 1e-9,
    -1.5e-6, 1.5e-6, -0.0, 0.0, -123.4567894, 123.4567894,
]


def test_rz_signed_zero_agrees_across_engines(spark):
    """Differential fuzz of the rz() convention: round-to-zero-from-
    below must produce the SAME canonical cell on both engines. Spark's
    F.round (BigDecimal, no signed zero) says +0.0 while DuckDB's IEEE
    round() says -0.0 — the r10 q_emb_covariance hash miss. rz()/+0.0
    normalizes both sides; this drives the exact boundary through the
    strict comparator, plus a meta-check that WITHOUT the
    normalization the gate now catches the divergence."""
    import duckdb

    from copy_databasetables_spark.operators._helpers import rz

    import pyspark.sql.functions as F

    pdf = pd.DataFrame({"k": range(len(_SZ_VALUES)), "x": _SZ_VALUES})
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t", pdf)

    normalized_spark = sdf.select("k", rz("x", 6).alias("r")).toPandas()
    normalized_duck = con.execute(
        "SELECT k, (round(x, 6) + 0.0) AS r FROM t"
    ).df()
    assert compare(normalized_spark, normalized_duck) == []

    # meta: the un-normalized pair differs on the -0.0 cells, and the
    # strict gate must SEE it (this is what collapsed-zero canon hid).
    raw_spark = sdf.select("k", F.round("x", 6).alias("r")).toPandas()
    raw_duck = con.execute("SELECT k, round(x, 6) AS r FROM t").df()
    assert any("row diffs" in p for p in compare(raw_spark, raw_duck))

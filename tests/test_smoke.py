"""Smoke + golden-file tests (SURVEY.md §5.2 items 2 and 6)."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "flagship_sf0001.json")


def _flagship_rows(spark):
    df = entrymod.entry(spark)
    rows = sorted(
        (
            {k: (round(v, 6) if isinstance(v, float) else v) for k, v in r.asDict().items()}
            for r in df.collect()
        ),
        key=lambda r: (r["l_returnflag"], r["l_linestatus"]),
    )
    return rows


def test_entry_smoke(spark):
    rows = _flagship_rows(spark)
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= set(rows[0])


def test_entry_matches_golden(spark):
    rows = _flagship_rows(spark)
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert rows == golden


def test_queries_and_oracles_consistent(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert len(qs) >= 90
    assert set(os_) <= set(qs)
    # every query callable is (spark, sf_dir) -> DataFrame
    df = qs["q_project"](spark, SF_SMOKE)
    assert df.columns == ["c_custkey", "c_name"]

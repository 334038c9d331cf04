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


def test_driver_window_rotation_and_clean_attestation_rule(tmp_path):
    """The driver records only the first 50 queries() entries, so the
    rotation logic IS part of the correctness surface: DRIVER_WINDOW
    keys lead in listed order, every registered key appears exactly
    once, and (r7 ADVICE) only a CLEAN latest attestation (no err, no
    explicit False match field) counts as prior-green — a key whose
    last driver row failed must regain window priority, not rotate to
    the back."""
    import json

    from copy_databasetables_spark import operators as ops

    order = list(ops.all_queries())
    assert order[: len(ops.DRIVER_WINDOW)] == ops.DRIVER_WINDOW
    assert sorted(order) == sorted(ops.QUERIES)

    clean = {"rows_match": True, "schema_match": True, "hash_match": True,
             "err": None}
    rows_r1 = {
        "ok": clean,
        "errored": {**clean, "err": "boom"},
        "hash_red": {**clean, "hash_match": False},
        "rows_only_ok": {"rows_match": True, "err": None},
        "was_green_then_red": clean,
    }
    rows_r2 = {"was_green_then_red": {**clean, "hash_match": False}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows_r1))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(rows_r2))
    green = ops._prior_driver_green(repo=str(tmp_path))
    # errored / hash-red rows never count; a later red overrides an
    # earlier green (LATEST attestation decides)
    assert green == {"ok", "rows_only_ok"}


def test_worker_pythonpath_exported_for_udf_unpickle(monkeypatch):
    """get_spark must export the package parent on PYTHONPATH so
    local-mode Python workers can unpickle module-referenced pandas
    UDFs regardless of the driver's cwd (`python tools/check.py` run
    FROM tools/ failed every mapInPandas operator with
    ModuleNotFoundError while pure-JVM plans kept passing — r8).
    monkeypatch scopes the env mutation to this test, and the
    idempotency check counts the DELTA so an ambient PYTHONPATH that
    already lists the repo (even twice) can't fail it spuriously."""
    import os

    from copy_databasetables_spark import session

    monkeypatch.setenv("PYTHONPATH", "/some/other/dir")
    session._ensure_worker_pythonpath()
    parts = os.environ["PYTHONPATH"].split(os.pathsep)
    assert session._PKG_PARENT in parts
    assert "/some/other/dir" in parts  # existing entries preserved
    n_first = parts.count(session._PKG_PARENT)
    session._ensure_worker_pythonpath()
    assert (
        os.environ["PYTHONPATH"].split(os.pathsep).count(session._PKG_PARENT)
        == n_first
    )

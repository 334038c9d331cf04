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
    # the equivalences the gate depends on — and nothing more
    assert canon(-0.0) == canon(0.0)
    assert canon(float("nan")) == canon(None) == "<null>"
    assert canon(True) == "True"
    assert canon(1.0) != canon(1)  # float vs int stay distinct per-dtype
    assert canon(pd.Timestamp("2024-01-02 03:04:05")) == "2024-01-02T03:04:05"

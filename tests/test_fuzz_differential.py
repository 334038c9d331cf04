"""Differential fuzz gate (SURVEY.md §5.2): a fixed band of generated
query seeds must agree between the Spark DataFrame build and the DuckDB
SQL emitted from the SAME AST (tools/fuzz_differential.py).

The seeds are pinned, the literals are DuckDB-sampled quantiles of the
actual sf0.001 data, and the comparator is the gate's own
check.compare — so a failure here is a real cross-engine semantics
divergence (or a generator regression), never flake. Deeper sweeps run
via the CLI (``python tools/fuzz_differential.py --seeds 200 --sf
sf0.01``; the 200-seed sf0.01 sweep is recorded green in COVERAGE.md).
"""

from __future__ import annotations

import os
import sys

import pytest

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)
sys.path.insert(0, _TOOLS)

import check  # noqa: E402
import fuzz_differential as fz  # noqa: E402

from tests.conftest import SF_SMOKE

#: One pinned band of seeds; spans every generator shape (verified by
#: the shape-coverage test below, so a generator change that collapses
#: the mix is caught rather than silently narrowing the gate).
SEEDS = list(range(28))


@pytest.fixture(scope="module")
def fuzz_ctx():
    con = check.duck_connect(SF_SMOKE)
    gen = fz.Gen(con, SF_SMOKE)
    yield gen, con
    con.close()


def test_pinned_seed_band_spans_all_shapes(spark, fuzz_ctx):
    # spark fixture needed: AST construction builds pyspark Columns.
    gen, _ = fuzz_ctx
    shapes = {gen.generate(s).shape for s in SEEDS}
    assert shapes == set(fz.Gen.SHAPES)


@pytest.mark.parametrize("seed", SEEDS)
def test_generated_query_agrees_across_engines(spark, fuzz_ctx, seed):
    gen, con = fuzz_ctx
    q = gen.generate(seed)
    problems = fz.run_seed(gen, q, spark, con)
    assert problems == [], f"seed={seed} sql={q.sql}\n" + "\n".join(problems)

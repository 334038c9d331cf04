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
#: the mix is caught rather than silently narrowing the gate). The
#: extras pin variants the contiguous prefix happens not to draw under
#: the 15-shape grammar (r9 continuation: +text_phrase — positional
#: phrase adjacency through operators.text.phrase_match, the REAL
#: production helper; both its 2-term (prefix 22/23) and 3-term
#: (prefix 20) draws land in the prefix): the subquery EXISTS/IN
#: modes (29/34; NOT EXISTS in the prefix at 17), the COMPLETE
#: outer-join join-type × key-mode 3×3 grid (40 FULL/plain, 50
#: FULL/null-safe, 75 FULL/null-plain, 112 INNER/plain, 133
#: LEFT/null-plain, 61 LEFT/null-safe, 387 LEFT/plain; INNER
#: null modes in the prefix at 9/11), the full window-function grid
#: beyond the prefix's rangesum at 25 (41 runsum, 65 rank, 92
#: row_number, 148 dense_rank, 159 lead/lag), the GROUPING SETS
#: rollup mode (33; ROLLUP and CUBE in the prefix at 5/10), the full
#: set-op variant grid beyond the prefix's UNION ALL (36 EXCEPT ALL,
#: 76 EXCEPT, 172 UNION, 186 INTERSECT, 199 INTERSECT ALL — the
#: DISTINCT trio pins NULLs-compare-equal set identity), the
#: scalar-subquery MIN mode (158; SUM and MAX in the prefix at
#: 19/27), filter_topk's first draw (31), the text prefix keymode
#: (68; token/length in the prefix at 24/26), and the array-expr
#: kinds the prefix misses (74/77 smax, 86/216 ssum, 140/322 smin
#: per project/group shape; elem/npos in the prefix at 0/2/6).
SEEDS = list(range(28)) + [29, 31, 33, 34, 36, 40, 41, 50, 61, 65,
                           68, 74, 75, 76, 77, 86, 92, 112, 133, 140,
                           148, 158, 159, 172, 186, 199, 216, 322, 387]


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


def test_fuzz_harness_detects_a_real_divergence(spark, fuzz_ctx):
    """Meta-test (tests/test_checker.py's philosophy applied to the
    fuzz path): a deliberately divergent AST — Spark sorts ASC, the
    SQL says DESC, under a LIMIT over distinct keys — MUST fail, or
    the 0-failure sweeps prove nothing."""
    from pyspark.sql import functions as F

    from copy_databasetables_spark.io import load_table

    gen, con = fuzz_ctx
    sql = ("SELECT c_custkey FROM customer "
           "ORDER BY c_custkey DESC NULLS FIRST LIMIT 5")

    def build(spark_, sf_dir):
        return (load_table(spark_, sf_dir, "customer")
                .select("c_custkey")
                .orderBy(F.col("c_custkey").asc_nulls_first())
                .limit(5))

    bad = fz.GenQuery(-1, "meta", "customer", sql, build)
    assert fz.run_seed(gen, bad, spark, con) != []

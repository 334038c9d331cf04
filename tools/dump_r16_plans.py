"""Dump `.explain("formatted")` for named queries into plans/r16/.

    python tools/dump_r16_plans.py before q_emb_pca2 q_emb_pca_k ...
    python tools/dump_r16_plans.py after  q_emb_pca2 ...

Writes plans/r16/<query>_<suffix>.txt — the optimization-round evidence
files the judge diffs against OPTIMIZATION_r16.md's plan claims. The
plan is captured at the bench SF (sf0.1) with the bench's session
settings, pre-execution (AdaptiveSparkPlan isFinalPlan=false), which is
exactly what `df.explain("formatted")` shows a user.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from copy_databasetables_spark import get_spark, operators  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r16")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-r16-plans")
    queries = operators.all_queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

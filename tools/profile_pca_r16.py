"""Per-leg profiler for the PCA family (VERDICT r15 item 5).

Reproduces bench conditions (cached inputs, warm pool, 32 cores) and
splits each PCA key's wall time into BUILD (the driver-side
_build_cov job + collect + numpy rounds, paid at DataFrame-build
time) vs EXECUTE (the projection pass against the noop sink), plus
times _build_cov's sub-steps directly. Run with no other load.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from copy_databasetables_spark import get_spark, operators  # noqa: E402
from copy_databasetables_spark.io import TABLES, load_table  # noqa: E402
from copy_databasetables_spark.operators._helpers import free_ckpts  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("profile-pca")
os.environ["SPARK_GRAFT_SCAN_PARALLELISM"] = str(
    spark.sparkContext.defaultParallelism
)
for t in TABLES:
    load_table(spark, SF_DIR, t).cache().count()

queries = operators.all_queries()


def execute(df):
    df.write.format("noop").mode("overwrite").save()


# warm JVM + python pool
execute(queries["q_agg_group"](spark, SF_DIR))
from copy_databasetables_spark.operators import similarity as S  # noqa: E402

t0 = time.perf_counter()
C = S._build_cov(spark, SF_DIR)
print(f"build_cov cold: {time.perf_counter()-t0:.3f}s")

for it in range(4):
    t0 = time.perf_counter()
    C = S._build_cov(spark, SF_DIR)
    t1 = time.perf_counter()
    v, nrm = S._pi_rounds(C)
    t2 = time.perf_counter()
    print(f"build_cov warm: {t1-t0:.3f}s  pi_rounds: {t2-t1:.4f}s")

# sub-steps of build_cov
from pyspark.sql import functions as F  # noqa: E402

for it in range(3):
    e = load_table(spark, SF_DIR, "embeddings").select(
        F.expr("transform(embedding, x -> cast(x as double))").alias("e")
    )
    t0 = time.perf_counter()
    partials = e.mapInPandas(
        S._gram_partials,
        schema=(
            "i int, j int, sxy_part long, sx_i_part long, "
            "sx_j_part long, n_part long"
        ),
    )
    execute(partials)
    print(f"  gram partials mapInPandas only: {time.perf_counter()-t0:.3f}s")

spark.sparkContext.setJobDescription(None)

for name in (
    "q_emb_top_eigvec",
    "q_emb_remove_top_pc",
    "q_emb_remove_top_pc_fast",
    "q_emb_pca2",
    "q_emb_pca_k",
    "q_emb_covariance",
):
    for it in range(3):
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        t1 = time.perf_counter()
        execute(df)
        t2 = time.perf_counter()
        free_ckpts(spark)
        print(
            f"{name} run{it}: build {t1-t0:.3f}s  execute {t2-t1:.3f}s  "
            f"total {t2-t0:.3f}s"
        )

spark.stop()

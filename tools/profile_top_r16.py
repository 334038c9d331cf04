"""Per-leg profiler for the most expensive remaining headline rows
(r16 second pass). Reproduces bench conditions (cached inputs, warm
pool, 32 cores) and splits each target's wall time into BUILD
(DataFrame construction, incl. any driver-side legs) vs EXECUTE (noop
sink), best-of-3 after one warm run. For the composite/persisted ops
it additionally times the sub-legs. Run with no other load.
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

spark = get_spark("profile-top")
os.environ["SPARK_GRAFT_SCAN_PARALLELISM"] = str(
    spark.sparkContext.defaultParallelism
)
for t in TABLES:
    load_table(spark, SF_DIR, t).cache().count()

queries = operators.all_queries()


def execute(df):
    df.write.format("noop").mode("overwrite").save()


# warm JVM + codegen + python pool (same exclusions as bench.py)
execute(queries["q_agg_group"](spark, SF_DIR))


def _py_ident(it):
    for pdf in it:
        yield pdf


(
    spark.range(0, 1_000_000, 1, 32)
    .mapInPandas(_py_ident, "id long")
    .selectExpr("sum(id)")
    .collect()
)

TARGETS = sys.argv[1:] or [
    "q_dedup_cluster",
    "q_sim_ivf_pq_persisted",
    "q_dedup_cluster_lsh",
    "q_dedup_minhash",
    "q_sim_ivf_kscaled_persisted",
    "q_ts_interpolate",
    "q_graph_triangles",
    "q_dedup_embed_lsh_scaled",
    "q_sim_ivf_pq",
    "q_sim_pq_rerank",
    "q_sim_ivf",
    "q_sim_hybrid_ivf",
    "q_emb_kmeans",
]

for name in TARGETS:
    runs = []
    for it in range(4):
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        t1 = time.perf_counter()
        execute(df)
        t2 = time.perf_counter()
        free_ckpts(spark)
        runs.append((t1 - t0, t2 - t1, t2 - t0))
    best = min(runs, key=lambda r: r[2])
    print(
        f"{name}: best total {best[2]:.3f}s (build {best[0]:.3f}s, "
        f"execute {best[1]:.3f}s)  all "
        + " ".join(f"{r[2]:.2f}" for r in runs)
    )

# sub-legs: q_dedup_cluster = q_dedup_near pairs + CC rounds + window
from pyspark.sql import functions as F  # noqa: E402

from copy_databasetables_spark.operators import dedup as D  # noqa: E402

for it in range(3):
    t0 = time.perf_counter()
    pairs = D.q_dedup_near(spark, SF_DIR)
    execute(pairs)
    t1 = time.perf_counter()
    free_ckpts(spark)
    print(f"  q_dedup_near pairs only: {t1-t0:.3f}s")

for it in range(3):
    t0 = time.perf_counter()
    df = D._cluster_over_pairs(spark, D.q_dedup_near(spark, SF_DIR))
    t1 = time.perf_counter()
    execute(df)
    t2 = time.perf_counter()
    free_ckpts(spark)
    print(f"  cluster: pairgen+CC build {t1-t0:.3f}s  window exec {t2-t1:.3f}s")

# sub-legs: persisted IVFPQ build vs query
from copy_databasetables_spark.operators import similarity as S  # noqa: E402

for it in range(3):
    t0 = time.perf_counter()
    path = S._ivfpq_index_build(spark, SF_DIR)
    t1 = time.perf_counter()
    execute(S._ivfpq_query_leg(spark, SF_DIR, path))
    t2 = time.perf_counter()
    free_ckpts(spark)
    print(f"  ivfpq build {t1-t0:.3f}s  query {t2-t1:.3f}s")

spark.stop()

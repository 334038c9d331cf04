"""One-order-up stress harness (VERDICT r5 item 7): build a ~10×
blowup of the corpus tables locally and measure the dedup/ANN scale
paths at 1× and 10×, printing per-op wall times and the observed
scaling exponent alpha = log(T_10x / T_1x) / log(10)  (alpha 1.0 =
linear, 2.0 = quadratic; sub-linear means fixed per-job overhead still
dominates at this absolute size).

Blowup construction — "10× more data of the same shape", not "10× the
same data":

- ``documents``: 10 copies, doc_id remapped to copy*N+doc_id, and EVERY
  token salted with a per-copy suffix. Token salting makes cross-copy
  Jaccard exactly 0 while keeping each copy's pair graph an exact clone
  of the original — so true near-dup work scales exactly 10×. (Naively
  unioning identical copies would make every doc a 10-way exact dup and
  blow pair counts 100×, measuring a different problem.)
- ``embeddings``: 10 copies, vec_id remapped, vector cyclically shifted
  by ``copy`` positions — norms and the pairwise-cosine distribution
  are preserved, cross-copy similarities are arbitrary-but-typical.

The other eight tables are symlinked from the source sf dir so
``load_table`` works unchanged.

Usage:
    python tools/stress_scale.py                    # sf0.1 → 10×
    python tools/stress_scale.py --ops q_sim_ivf    # subset
    python tools/stress_scale.py --copies 100       # second decade:
                                                    # alpha from 1×→100×
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from copy_databasetables_spark import get_spark  # noqa: E402
from copy_databasetables_spark.io import TABLES, load_table, table_path  # noqa: E402
from copy_databasetables_spark.operators import all_queries  # noqa: E402

OPS = ["q_dedup_minhash", "q_dedup_cluster", "q_dedup_embed_lsh", "q_sim_ivf"]
COPIES = 10  # overridden by --copies


def build_blowup(spark, src_dir: str, out_dir: str, copies: int = COPIES) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, src_dir, "documents")
    n_docs = docs.count()
    copies = spark.range(copies).select(F.col("id").cast("int").alias("copy"))
    blown_docs = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("copy").cast("long") * n_docs + F.col("doc_id")).alias("doc_id"),
            F.array_join(
                F.expr("transform(split(text, ' '), t -> concat(t, '_', copy))"),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    blown_docs.coalesce(4).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = load_table(spark, src_dir, "embeddings")
    n_vecs = emb.count()
    dim = len(emb.first()["embedding"])
    blown_emb = (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("copy").cast("long") * n_vecs + F.col("vec_id")).alias("vec_id"),
            F.expr(
                f"concat(slice(embedding, (copy % {dim}) + 1, {dim} - (copy % {dim})),"
                f" slice(embedding, 1, copy % {dim}))"
            ).alias("embedding"),
            "label",
        )
    )
    blown_emb.coalesce(4).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(table_path(src_dir, t), dst)


def time_op(spark, name: str, sf_dir: str, runs: int = 2) -> float:
    q = all_queries()[name]
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_scale10")
    global COPIES
    ap.add_argument("--ops", nargs="*", default=OPS)
    ap.add_argument("--copies", type=int, default=COPIES)
    args = ap.parse_args()

    spark = get_spark("stress-scale")
    os.environ["SPARK_GRAFT_SCAN_PARALLELISM"] = str(
        spark.sparkContext.defaultParallelism
    )
    COPIES = args.copies
    build_blowup(spark, args.src, args.out, args.copies)
    n1 = load_table(spark, args.src, "documents").count()
    n10 = load_table(spark, args.out, "documents").count()

    out = {
        "src": args.src,
        "docs_1x": n1,
        f"docs_{args.copies}x": n10,
        "copies": args.copies,
        "ops": {},
    }
    for name in args.ops:
        t1 = time_op(spark, name, args.src)
        t10 = time_op(spark, name, args.out)
        alpha = round(math.log(t10 / t1) / math.log(COPIES), 2)
        out["ops"][name] = {
            "t_1x_sec": t1,
            f"t_{COPIES}x_sec": t10,
            "alpha": alpha,
        }
        print(
            f"{name:24s} 1x={t1:8.3f}s  {COPIES}x={t10:8.3f}s  alpha={alpha}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

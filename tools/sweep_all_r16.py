"""Registry-wide noop-timed sweep (r16): execute every registered
operator against the noop sink under bench session conditions and
print one JSON map name -> seconds (or an ERR string). Usage:

    python tools/sweep_all_r16.py            # sf0.01
    SF=/root/testdata/sf0.1 python tools/sweep_all_r16.py
"""
import os, sys, time
sys.path.insert(0, '/root/repo')
from copy_databasetables_spark import get_spark, operators
from copy_databasetables_spark.io import TABLES, load_table
from copy_databasetables_spark.operators._helpers import free_ckpts
SF_DIR = os.environ.get('SF', '/root/testdata/sf0.01')
spark = get_spark('sweep')
os.environ["SPARK_GRAFT_SCAN_PARALLELISM"] = str(spark.sparkContext.defaultParallelism)
for t in TABLES: load_table(spark, SF_DIR, t).cache().count()
def execute(df): df.write.format("noop").mode("overwrite").save()
q = operators.all_queries()
execute(q["q_agg_group"](spark, SF_DIR))
def _py_ident(it):
    for pdf in it: yield pdf
spark.range(0,1_000_000,1,32).mapInPandas(_py_ident,"id long").selectExpr("sum(id)").collect()
out = {}
for name, fn in q.items():
    t0 = time.perf_counter()
    try:
        execute(fn(spark, SF_DIR))
        out[name] = round(time.perf_counter()-t0, 3)
    except Exception as ex:
        out[name] = f"ERR {type(ex).__name__}: {str(ex)[:100]}"
    free_ckpts(spark)
import json
print(json.dumps(out))

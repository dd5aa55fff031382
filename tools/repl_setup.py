"""Interactive profiling setup: exec(open('tools/repl_setup.py').read())"""
import sys, time
sys.path.insert(0, ".")

from data_feature_extraction_and_retrieval_pipeline_spark import caching, indexes, queries as Q
from data_feature_extraction_and_retrieval_pipeline_spark.session import get_spark
from data_feature_extraction_and_retrieval_pipeline_spark.sources import readers
from pyspark.sql import functions as F, Window

SF = "/root/testdata/sf0.1"
spark = get_spark(
    app_name="repl",
    cpus=32,
    shuffle_partitions=4,
    extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.adaptive.enabled": "false",
        "spark.locality.wait": "0ms",
    },
)
spark.sparkContext.setLogLevel("ERROR")
readers.enable_table_cache(True)
Q.enable_plan_cache(True)
indexes.enable_index_cache(True)
for name in readers.schemas.TABLES:
    readers.load_table(spark, SF, name).count()
Q._query_vector(spark, SF, 0)
Q._query_vector(spark, SF, 42)
Q._leading_vectors(spark, SF, 16)
qs = Q.queries()
qs["ml_multimodal_meta"](spark, SF).collect()


def t(fn, n=3, label=""):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        caching.release()
    print(f"{label:40s} {best*1000:8.1f} ms")
    return r


def tq(name, n=3):
    return t(lambda: qs[name](spark, SF).collect(), n=n, label=name)


print("ready")

#!/usr/bin/env python
"""Ad-hoc profiler: break the slowest bench queries into stages and
time each at sf0.1 (warm cache, min of 2). Not part of the bench."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.1"


def t(label, fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:45s} {best*1000:8.0f} ms")
    return best


def main():
    from data_feature_extraction_and_retrieval_pipeline_spark import caching, queries as Q
    from data_feature_extraction_and_retrieval_pipeline_spark.session import get_spark
    from data_feature_extraction_and_retrieval_pipeline_spark.sources import readers
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import dedup
    from pyspark.sql import functions as F

    spark = get_spark(
        app_name="profile",
        cpus=32,
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0ms",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    readers.enable_table_cache(True)
    for name in readers.schemas.TABLES:
        readers.load_table(spark, SF, name).count()
    Q._query_vector(spark, SF, 0)
    Q._query_vector(spark, SF, 42)
    Q._leading_vectors(spark, SF, 16)
    qs = Q.queries()
    qs["ml_multimodal_meta"](spark, SF).collect()

    docs = readers.load_table(spark, SF, "documents")
    print("documents rows:", docs.count())

    # --- minhash stages ---
    banded_col = dedup._minhash_band_udf(12, 3, 3, "text")
    t("minhash: kernel only (count)", lambda: docs.select(
        F.posexplode(banded_col)).count())

    def mh_full():
        qs["dedup_minhash_lsh"](spark, SF).collect()
        caching.release()
    t("minhash: full query", mh_full)

    # --- hybrid stages ---
    def hybrid():
        qs["hybrid_search"](spark, SF).collect()
        caching.release()
    t("hybrid_search: full", hybrid)

    def seg():
        qs["segment_search"](spark, SF).collect()
        caching.release()
    t("segment_search: full", seg)

    def cos():
        qs["dedup_embedding_cosine"](spark, SF).collect()
        caching.release()
    t("dedup_embedding_cosine: full", cos)

    t("join_revenue_by_nation", lambda: qs["join_revenue_by_nation"](spark, SF).collect())
    t("asof_join_clicks", lambda: qs["asof_join_clicks"](spark, SF).collect())
    t("events_sessionize", lambda: qs["events_sessionize"](spark, SF).collect())
    t("dedup_exact", lambda: qs["dedup_exact"](spark, SF).collect())
    t("text_quality", lambda: qs["text_quality"](spark, SF).collect())
    t("q1_pricing_summary", lambda: qs["q1_pricing_summary"](spark, SF).collect())
    t("tag_search", lambda: qs["tag_search"](spark, SF).collect())

    # floor: trivial collect
    t("floor: 1-row collect", lambda: spark.range(1).collect())
    t("floor: cached count", lambda: readers.load_table(spark, SF, "nation").count())

    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-query diagnostics: plan-build time vs execute time, Spark job
and stage counts (via job groups + statusTracker)."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.1"

TARGETS = [
    "dedup_minhash_lsh",
    "hybrid_search",
    "segment_search",
    "events_sessionize",
    "asof_join_clicks",
    "join_revenue_by_nation",
    "dedup_embedding_cosine",
    "q1_pricing_summary",
    "tag_search",
    "knn_whole",
    "text_quality",
    "dedup_exact",
    "ml_multimodal_meta",
    "events_tumbling_window",
    "ann_ivf",
]


def main():
    global TARGETS
    if len(sys.argv) > 1:
        TARGETS = sys.argv[1:]
    from data_feature_extraction_and_retrieval_pipeline_spark import caching, queries as Q
    from data_feature_extraction_and_retrieval_pipeline_spark.session import get_spark
    from data_feature_extraction_and_retrieval_pipeline_spark.sources import readers

    spark = get_spark(
        app_name="profile-jobs",
        cpus=32,
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0ms",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    readers.enable_table_cache(True)
    for name in readers.schemas.TABLES:
        readers.load_table(spark, SF, name).count()
    Q._query_vector(spark, SF, 0)
    Q._query_vector(spark, SF, 42)
    Q._leading_vectors(spark, SF, 16)
    qs = Q.queries()
    qs["ml_multimodal_meta"](spark, SF).collect()

    # warm pass
    for name in TARGETS:
        qs[name](spark, SF).collect()
        caching.release()

    st = sc.statusTracker()
    print(f"{'query':32s} {'build':>7s} {'exec':>7s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    for name in TARGETS:
        grp = f"prof-{name}"
        sc.setJobGroup(grp, name)
        t0 = time.perf_counter()
        df = qs[name](spark, SF)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        caching.release()
        jids = st.getJobIdsForGroup(grp)
        stages = 0
        tasks = 0
        for j in jids:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    stages += 1
                    tasks += si.numTasks
        print(
            f"{name:32s} {1000*(t1-t0):6.0f}m {1000*(t2-t1):6.0f}m "
            f"{len(jids):5d} {stages:7d} {tasks:6d}"
        )
        sc.setJobGroup(None, None)

    spark.stop()


if __name__ == "__main__":
    main()

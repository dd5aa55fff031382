#!/usr/bin/env python
"""Fast A/B harness: time a subset of headline queries under the exact
bench.py protocol (plan/table/index caches on, warm pass + min of 3
consecutive timed collects, scoped cache release between runs).

Usage: python tools/bench_subset.py QUERY [QUERY ...]

Prints per-query seconds plus the measured job floor. Numbers read on
the same scale as bench_detail.json; this tool never writes artifacts.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__, file=sys.stderr)
        return 2
    from data_feature_extraction_and_retrieval_pipeline_spark import (
        caching,
        indexes,
        queries as Q,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.session import (
        get_spark,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.sources import (
        readers,
    )

    spark = get_spark(
        app_name="dferp-bench-subset",
        cpus=int(CPUS),
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0ms",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    Q.enable_plan_cache(True)
    readers.enable_table_cache(True)
    indexes.enable_index_cache(True)
    for name in readers.schemas.TABLES:
        readers.load_table(spark, SF_DIR, name).count()
    Q._query_vector(spark, SF_DIR, 0)
    Q._query_vector(spark, SF_DIR, 42)
    Q._leading_vectors(spark, SF_DIR, 16)
    qs["ml_multimodal_meta"](spark, SF_DIR).collect()
    qs["agg_value_counts"](spark, SF_DIR).collect()

    sc = spark.sparkContext
    spark.range(0, 32 * 1000, 1, 32).count()  # JIT/codegen warm
    floor = None
    for _ in range(5):
        t0 = time.perf_counter()
        spark.range(0, 32 * 1000, 1, 32).count()
        dt = time.perf_counter() - t0
        floor = dt if floor is None else min(floor, dt)
    print(f"job floor ~{floor:.4f}s")

    build0 = dict(indexes.BUILD_SECONDS)
    for name in names:
        fn = qs[name]
        tc0 = time.perf_counter()
        fn(spark, SF_DIR).collect()  # warm/cold
        cold = time.perf_counter() - tc0
        caching.release(name)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            caching.release(name)
        print(f"{name:35s} warm={best:.3f}s cold={cold:.3f}s")
    new_builds = {
        k: v for k, v in indexes.BUILD_SECONDS.items() if k not in build0
    }
    if new_builds:
        print("index builds:", {k: round(v, 3) for k, v in new_builds.items()})
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

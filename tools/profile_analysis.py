#!/usr/bin/env python
"""Split a query's per-run wall time into Catalyst phases + fetch.

For each named query at the x10 synth fixture, measures (warm, min of
3, caches on — same serving model as tools/bench_x10.py):

- ``analyze_s``   — fresh ``select("*")`` → force analyzed plan
- ``optimize_s``  — analyzed → optimized (executes the optimizer)
- ``plan_s``      — optimized → executedPlan (physical planning)
- ``exec_count_s``— ``df.count()`` on the planned frame (execution
                    WITHOUT driver row materialization; beware: a
                    count() plans its own Aggregate, so this is a
                    separate QueryExecution — read it as "execute +
                    1-row fetch")
- ``collect_s``   — full ``collect()`` on the same frame
- ``rows_out``    — result cardinality

``collect_s − exec_count_s`` brackets the driver-side ROW
MATERIALIZATION cost (JVM→Python pickle of the result set) — the term
bench ratios price against DuckDB's C-level fetchall. A query whose
gap dominates is FETCH-priced, not plan-slow.

Usage: python tools/profile_analysis.py q1,q2,... [--mult 10]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    import scale_check
    import scaling_report
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

    argv = sys.argv[1:]
    mult = 10
    names = None
    for i, a in enumerate(argv):
        if a == "--mult" and i + 1 < len(argv):
            mult = int(argv[i + 1])
        elif a.startswith("--mult="):
            mult = int(a.split("=", 1)[1])
        elif not a.startswith("-"):
            names = a.split(",")
    if not names:
        print("usage: profile_analysis.py q1,q2,... [--mult N]", file=sys.stderr)
        return 2

    spark = get_spark(
        app_name="dferp-profile-analysis",
        cpus=int(CPUS),
        shuffle_partitions=16,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0ms",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = scaling_report.ensure_fixture(spark, mult)
    tables = scale_check.synth_tables(sf_dir)
    qs = Q.queries()

    Q.enable_plan_cache(True)
    readers.enable_table_cache(True)
    indexes.enable_index_cache(True)
    for t in sorted(tables):
        readers.load_table(spark, sf_dir, t).count()
    qs["dedup_exact"](spark, sf_dir).collect()

    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).collect()  # warm: compile + index build
        caching.release(name)
        best: dict[str, float] = {}
        rows_out = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            qe.analyzed()
            t1 = time.perf_counter()
            qe.optimizedPlan()
            t2 = time.perf_counter()
            qe.executedPlan()
            t3 = time.perf_counter()
            n = df.count()
            t4 = time.perf_counter()
            rows = df.collect()
            t5 = time.perf_counter()
            rows_out = len(rows)
            assert n == rows_out
            for k, v in (
                ("analyze_s", t1 - t0),
                ("optimize_s", t2 - t1),
                ("plan_s", t3 - t2),
                ("exec_count_s", t4 - t3),
                ("collect_s", t5 - t4),
                ("total_s", t5 - t0),
            ):
                if k not in best or v < best[k]:
                    best[k] = v
            caching.release(name)
        out = {k: round(v, 3) for k, v in best.items()}
        out["rows_out"] = rows_out
        out["query"] = name
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Skew stress bench: measured skewed-vs-salted walls on a deliberately
hot-keyed corpus (one key holding 90% of all rows — the one-image-with-
10⁶-segments shape from the reference's per-image aggregation,
search_with_segments.py:246-272). Results land in SCALING.md's "Skew,
measured" section.

Three shapes, each with its mitigation twin and a row-identity check:

1. shuffle JOIN hot fact key × unbroadcastable dim  vs  salted_join
2. window top-n per group with a hot group          vs  salted_top_n_per_group
3. algebraic groupBy sum/count on the hot key       vs  salted_aggregate
   (expected ~no difference: map-side partial aggregation already
   collapses a hot key to one row per map task — measured to document
   WHY the salted lever targets joins/windows, not algebraic aggs)

AQE and auto-broadcast are disabled so the plain plans can't be
runtime-mitigated — this isolates the operator-level levers AQE can't
apply (it cannot split one hash-aggregate key or one window partition).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

N_FACT = 24_000_000
HOT_SHARE = 0.98
N_KEYS = 10_000
N_DIM = 20_000
TOP_N = 5


def timed(fn, runs=3):
    fn()
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    from pyspark.sql import Window, functions as F

    from data_feature_extraction_and_retrieval_pipeline_spark.operators.skew import (
        salted_aggregate,
        salted_join,
        salted_top_n_per_group,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="skew-bench",
        cpus=32,
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.locality.wait": "0ms",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 90% of rows on key 0, the rest uniform over N_KEYS
    fact = (
        spark.range(N_FACT, numPartitions=32)
        .select(
            F.when(
                F.rand(seed=7) < HOT_SHARE, F.lit(0)
            ).otherwise((F.rand(seed=11) * N_KEYS).cast("long")).alias("key"),
            (F.rand(seed=13) * 1000).alias("score"),
            F.col("id").alias("row_id"),
        )
        .persist()
    )
    fact.count()
    dim = (
        spark.range(N_DIM)
        .select(F.col("id").alias("key"), (F.col("id") * 2).alias("payload"))
        .persist()
    )
    dim.count()

    rows = []

    # 1. hot-key shuffle join vs salted
    plain_join = lambda: fact.join(dim, "key").count()  # noqa: E731
    salted = lambda: salted_join(fact, dim, "key", salt_buckets=8).count()  # noqa: E731
    assert fact.join(dim, "key").count() == salted_join(
        fact, dim, "key", salt_buckets=8
    ).count()
    rows.append(("join hot-key x dim (no broadcast)", timed(plain_join), timed(salted)))

    # 2. hot window partition vs two-phase salted top-n
    w = Window.partitionBy("key").orderBy(F.desc("score"), F.col("row_id"))
    plain_top = lambda: (  # noqa: E731
        fact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_N)
        .count()
    )
    salted_top = lambda: salted_top_n_per_group(  # noqa: E731
        fact, "key", "score", TOP_N, "row_id"
    ).count()
    a = {
        (r["key"], r["row_id"])
        for r in fact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_N)
        .select("key", "row_id")
        .collect()
    }
    b = {
        (r["key"], r["row_id"])
        for r in salted_top_n_per_group(fact, "key", "score", TOP_N, "row_id")
        .select("key", "row_id")
        .collect()
    }
    assert a == b, f"salted top-n row set diverges ({len(a ^ b)} rows)"
    rows.append(("window top-5 per group (hot group)", timed(plain_top), timed(salted_top)))

    # 3. algebraic agg (expected parity — partial agg collapses the hot key)
    plain_agg = lambda: fact.groupBy("key").agg(  # noqa: E731
        F.sum("score").alias("s"), F.count("*").alias("n")
    ).count()
    salted_agg = lambda: salted_aggregate(  # noqa: E731
        fact, ["key"], {"s": ("score", "sum"), "n": ("score", "count")}
    ).count()
    rows.append(("groupBy sum/count (algebraic)", timed(plain_agg), timed(salted_agg)))

    print(f"\nfact rows: {N_FACT:,}  hot-key share: {HOT_SHARE:.0%}  "
          f"dim rows: {N_DIM:,}  (AQE off, broadcast off)")
    print(f"{'shape':40s} {'plain s':>8s} {'salted s':>9s} {'speedup':>8s}")
    for name, p, s in rows:
        print(f"{name:40s} {p:8.2f} {s:9.2f} {p / s:7.2f}x")

    fact.unpersist()
    dim.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

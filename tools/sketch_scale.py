#!/usr/bin/env python
"""Sketch mergeability at x100 (round-11 stretch): the split-merge
proof tests/test_skew.py::test_sketch_mergeability_across_splits runs
at sf0.01, replayed against the x100 synth corpus (10M events) with
the measured errors printed — the evidence that the HLL state-merge
and the KLL physical-split merge hold at the scale where the sketches
are actually needed, not just at test scale. Results recorded in
SCALING.md "Sketch mergeability at x100".

Usage: python tools/sketch_scale.py [synth_dir]
  synth_dir defaults to /tmp/dferp_scale/x100 (tools/scaling_report.py
  writes it).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    synth_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dferp_scale/x100"
    if not os.path.isdir(synth_dir):
        print(f"synth dir {synth_dir} missing", file=sys.stderr)
        return 2

    from pyspark.sql import functions as F

    from data_feature_extraction_and_retrieval_pipeline_spark import (
        get_spark,
    )

    spark = get_spark()
    ev = spark.read.parquet(f"{synth_dir}/events.parquet").select(
        "event_type", "user_id", "value"
    )
    n = ev.count()
    print(f"events: {n} rows", file=sys.stderr)

    half_a = ev.filter(F.xxhash64("user_id", "value") % 2 == 0)
    half_b = ev.filter(F.xxhash64("user_id", "value") % 2 != 0)

    # HLL: per-half serialized sketches, binary union-merge, estimate
    t0 = time.perf_counter()
    sk_a = half_a.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    sk_b = half_b.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = {
        r["event_type"]: r["nd_est"]
        for r in sk_a.unionByName(sk_b)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("nd_est"))
        .collect()
    }
    t_hll = time.perf_counter() - t0
    exact = {
        r["event_type"]: r["nd"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    assert merged.keys() == exact.keys()
    worst_hll = max(
        abs(merged[k] - exact[k]) / max(1, exact[k]) for k in exact
    )
    print(
        f"HLL state-merge: {len(exact)} groups, worst relative error "
        f"{worst_hll:.4%} ({t_hll:.1f}s sketch path)"
    )

    # KLL-style quantiles: physical-split merge via a two-tree scan
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pa, pb = f"{td}/half_a", f"{td}/half_b"
        half_a.write.parquet(pa)
        half_b.write.parquet(pb)
        both = spark.read.parquet(pa, pb)
        t0 = time.perf_counter()
        approx = {
            r["event_type"]: r["p"]
            for r in both.groupBy("event_type")
            .agg(F.percentile_approx("value", 0.5, 10000).alias("p"))
            .collect()
        }
        t_kll = time.perf_counter() - t0
    vals = {
        r["event_type"]: r["v"]
        for r in ev.groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("v"))
        .collect()
    }
    import bisect

    worst_rank = 0.0
    for k, xs in vals.items():
        lo = bisect.bisect_left(xs, approx[k])
        hi = bisect.bisect_right(xs, approx[k])
        # rank error: distance of the approx median's rank interval
        # from the true median rank, as a fraction of the group size
        mid = len(xs) / 2
        err = (
            0.0
            if lo <= mid <= hi
            else min(abs(lo - mid), abs(hi - mid)) / len(xs)
        )
        worst_rank = max(worst_rank, err)
    print(
        f"KLL split-merge median: {len(vals)} groups, worst rank error "
        f"{worst_rank:.4%} ({t_kll:.1f}s sketch path)"
    )
    ok = worst_hll <= 0.15 and worst_rank <= 0.02
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

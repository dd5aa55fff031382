#!/usr/bin/env python
"""Measured scaling curve for the heaviest headline queries.

SCALING.md argues O(N) per operator family; this tool MEASURES it.
It synthesizes same-distribution documents/embeddings corpora
(synth.py — counter-seeded, so the 1x corpus is literally the prefix
of the 5x/10x corpora) at 1x = the sf0.1 row counts, 5x, and 10x,
runs the most expensive documents/embeddings-only headline queries at
each scale through the UNMODIFIED query registry (index cache off, so
every write-time artifact is rebuilt inside the timing — the build is
part of the scaling claim), and reports seconds plus the growth
ratio vs the data ratio.

A query is "linear-or-better" when time(10x)/time(1x) <= 10 with
slack for fixed per-job overhead; super-linear growth is the red flag
this report exists to catch (an accidental O(N^2) self-join, a
broadcast that stopped being broadcast, a collapsed-partition sort).

Results land in the "Measured scaling" section of SCALING.md.

Usage: python tools/scaling_report.py [--scales 1,5,10]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_DOCS = 5000     # sf0.1 documents rows
BASE_VECS = 2000     # sf0.1 embeddings rows
BASE_EVENTS = 100000  # sf0.1 events rows
OUT_BASE = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/dferp_scale")

# The documents/embeddings-only subset of the expensive headline
# queries (events-based queries are excluded: the synthetic dirs
# carry only the two corpus tables).
QUERIES = [
    "dedup_minhash_lsh_portable",
    "dedup_simhash_portable",
    "dedup_exact",
    "dedup_incremental",
    "text_contamination",
    "text_gopher_rules",
    "text_quality",
    "text_chunk_windows",
    "text_unigram_logprob",
    "dedup_keep_best_per_source",
    "ann_brute_force",
    "api_pipeline_curate",
    # round 6 additions (report_dataset is excluded: it aggregates the
    # events table, which the two-table synthetic dirs don't carry)
    "dedup_minhash_incremental",
    "ann_ivf_filtered",
    "report_segment_stats",
    # round 6 second half: the range-clustered sorted export (its cost
    # is the write-time range shuffle, which must scale with rows);
    # win_lag_delta is excluded like report_dataset (events-based)
    "etl_sorted_export",
    # round 6 second half: BM25 (scan-bound, zero-shuffle scoring —
    # should scale linearly with corpus bytes) and tf-idf keywords
    # (the full-token-shuffle shape, the steepest text curve here)
    "text_bm25_topk",
    "text_tfidf_keywords",
    # percolator facade: standing-query scoring, scan-bound like bm25
    "api_percolate",
    # round 7 additions — the remaining headline families the x100
    # extension certifies: interactive vector top-k, the two-phase
    # hybrid retrieval chain, the IVF-PQ probe (ADC scan + partition
    # pruning), the join-form percolator (registry-as-data), and the
    # maintained-index ANN ingest roundtrip
    "knn_whole",
    "hybrid_search",
    "ann_ivfpq_portable",
    "percolate_join_batch",
    "ann_ingest_assign",
    # round 8 additions: the single-pass cosine gate (cogrouped Arrow
    # matmul — the per-cluster blocking must keep the curve linear),
    # RRF hybrid fusion (two scan-bound retrievers + a 40-row join),
    # and the join-form percolator's foreachBatch stream drain (drain
    # + parquet sink appends scale with the corpus).
    # ann_recenter_compact is excluded by design: its certifying query
    # bounds the index to the first 256 vectors (the dyadic-exactness
    # construction), so its curve is flat and measures nothing.
    "dedup_cosine_incremental",
    "retrieval_rrf_fusion",
    "percolate_join_stream",
    # round 9 additions: the events temporal family (the synth corpora
    # now carry an events table with skewed users + one deliberate hot
    # user). The funnel and sessionize curves bound the per-user
    # collect/fold state; retention bounds the (user, week) dedup +
    # cohort self-join; the window/interval/as-of trio bounds the
    # time-bucketed aggregation and range-join shapes.
    "events_funnel",
    "events_retention",
    "events_sessionize",
    "events_tumbling_window",
    "events_interval_join",
    "asof_join_clicks",
]

# Marker versioning: v2 fixtures added the events table — older dirs
# regenerate in place (documents/embeddings are counter-seeded, so the
# rewrite reproduces the identical rows).
_MARKER = "ok-v2-events"


def ensure_fixture(spark, mult: int) -> str:
    from data_feature_extraction_and_retrieval_pipeline_spark import synth

    out = f"{OUT_BASE}/x{mult}"
    marker = Path(out) / "_done"
    if not (marker.exists() and marker.read_text() == _MARKER):
        synth.write_synth_sf(
            spark,
            out,
            n_docs=BASE_DOCS * mult,
            n_vecs=BASE_VECS * mult,
            n_events=BASE_EVENTS * mult,
        )
        marker.write_text(_MARKER)
    return out


def main() -> None:
    from data_feature_extraction_and_retrieval_pipeline_spark import (
        caching,
        queries as Q,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.session import (
        get_spark,
    )

    scales = [1, 5, 10]
    names = list(QUERIES)
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--scales" and i + 1 < len(argv):
            scales = [int(x) for x in argv[i + 1].split(",")]
        elif a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a == "--queries" and i + 1 < len(argv):
            names = [x for x in argv[i + 1].split(",") if x]
        elif a.startswith("--queries="):
            names = [x for x in a.split("=", 1)[1].split(",") if x]

    spark = get_spark(app_name="scaling-report")
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()

    dirs = {m: ensure_fixture(spark, m) for m in scales}
    results: dict[str, dict[int, float]] = {}
    for name in names:
        results[name] = {}
        for m in scales:
            sf_dir = dirs[m]
            qs[name](spark, sf_dir).collect()  # warm: compile + JIT
            caching.release()
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                caching.release()
                best = dt if best is None else min(best, dt)
            results[name][m] = round(best, 3)
            print(f"{name} x{m}: {best:.3f}s", file=sys.stderr, flush=True)

    hi, lo = max(scales), min(scales)
    lines = [
        "| query | " + " | ".join(f"x{m} s" for m in scales)
        + f" | t(x{hi})/t(x{lo}) | linear bound |",
        "|---|" + "---|" * (len(scales) + 2),
    ]
    for name, r in results.items():
        ratio = round(r[hi] / r[lo], 2) if r[lo] else float("inf")
        lines.append(
            f"| {name} | "
            + " | ".join(f"{r[m]}" for m in scales)
            + f" | {ratio} | {hi // lo} |"
        )
    print("\n".join(lines))
    print(json.dumps(results))


if __name__ == "__main__":
    main()

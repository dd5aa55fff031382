#!/usr/bin/env python
"""Dump formatted physical plans for the headline queries → PLANS.md.

Evidence artifact: shows (without running Spark) that filters/
projections reach the parquet scans, dims broadcast, top-k plans
TakeOrderedAndProject, and aggregations are partial+final around one
exchange.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SHOWCASE = [
    ("knn_whole", "Q1 whole-image KNN: scan → dot → TakeOrderedAndProject"),
    ("knn_tag_filtered", "Q1 + tag pre-filter: predicate pushed to parquet scan"),
    ("hybrid_search", "Q3 fused flat re-rank: one corpus pass, two top-k stages"),
    ("q1_pricing_summary", "scan+agg: partial/final HashAggregate, one exchange"),
    ("join_revenue_by_nation", "multi-join: size-policied orders-side broadcast"),
    ("dedup_minhash_lsh", "LSH dedup: hash self-join on scalar band keys"),
    ("dedup_minhash_lsh_portable", "oracle-certified LSH: same shape, portable hashes"),
    ("asof_join_clicks", "as-of join: one shuffle, window forward-fill"),
    ("events_sessionize", "sessionization: single-exchange lag/run-sum spans"),
    ("text_chunk_windows", "token-window chunking: map-only, zero exchange"),
    ("text_unigram_logprob", "unigram NLL: one explode, shared tf aggregate (ReusedExchange), single vocab broadcast with windowed total"),
    ("etl_mixture_sample", "mixture sampling: codegen'd hash predicate, one agg exchange"),
    ("ann_range_search", "radius search: scan + predicate, no join/exchange"),
    ("ann_pq_portable", "PQ/ADC serving: literal-LUT aggregate, JVM-only, TakeOrderedAndProject"),
    ("ann_ivfpq_portable", "IVF-PQ: coarse-probe filter composed with the ADC scan"),
    ("events_interval_join", "bounded-window range join: one shuffle on the key, range prunes in-join"),
    ("text_quality_classifier", "linear quality gate: map-only, no shuffle, no Python"),
    ("dedup_incremental", "batch-vs-corpus dedup: broadcast semi/anti on fingerprints, zero corpus shuffle"),
    ("report_dataset", "report bundle: every count-style member incl. the token leaderboard reads ONE persisted counting pass per table (InMemoryTableScans — explode form with array-valued members; grouping sets failed cache canonicalization, see reports._grouped_value_counts)"),
    ("report_segment_stats", "segment stats: UDTF fan-out reused via one exchange; zero-shot floor is map-only over broadcast vocab"),
    ("etl_sorted_export", "range-sorted export read-back: pushed BETWEEN over range-disjoint sorted files"),
    ("win_lag_delta", "lag/lead cadence: window exchange reused by the aggregate — one shuffle"),
    ("agg_cube_lang_source", "cube: Expand over 4 grouping sets, partial aggregation before the exchange"),
    ("text_bm25_topk", "BM25: map-only tf, literal resident stats (no broadcast node), zero hash shuffle, TakeOrderedAndProject"),
    ("text_tfidf_keywords", "tf-idf keywords: one token shuffle, map-side dl, broadcast vocab, single rank window"),
    ("api_percolate", "percolator: standing queries fanned out per row, stats broadcast, zero hash shuffle"),
    ("etl_zorder_roundtrip", "z-order read-back: both rectangle predicates pushed to the clustered scan"),
    ("percolate_join_batch", "join-form percolator: ONE denormalized registry+stats broadcast (inline VALUES), vocab filter below the tf shuffle, two map-side-combined doc-keyed exchanges"),
    ("ann_ingest_assign", "maintained ANN index read-back: cluster-partitioned scan, partial/final agg"),
    ("ann_centroid_staleness", "staleness monitor: JVM-only centroid assignment, fused section counts, grouping-sets totals"),
    ("report_corpus_drift", "fused drift: one exploded (section,key) agg per side, grouping-sets totals, decimal numerators"),
    ("retrieval_rrf_fusion", "RRF hybrid: two bounded top-N windows, union + per-id max aggregate (no join), TakeOrderedAndProject cut"),
    ("text_gopher_rules", "Gopher rules: ONE map-only stage — per-row sorted-run bigram mode, zero exchanges, zero joins"),
    ("join_tag_category", "tag dim lookup: resident literal vocab isin — one scan, one multi-distinct aggregate, no dim join"),
    ("hybrid_search_tag_filtered", "Q3 + tag filter folded into the one-pass aggregation: no pre-scan, no broadcast id set"),
    ("events_funnel", "conversion funnel: one user exchange, chained conditional array-mins — no sort, no per-step shuffle"),
    ("events_retention_stream", "incremental retention: cohort triangle over the maintained activity artifact — never rescans raw events"),
]


def main() -> None:
    import data_feature_extraction_and_retrieval_pipeline_spark as dferp
    from data_feature_extraction_and_retrieval_pipeline_spark import queries as Q
    from data_feature_extraction_and_retrieval_pipeline_spark.plans.inspect import (
        plan_summary,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = dferp.get_spark(
        app_name="dferp-plans",
        cpus=4,
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()

    out = [
        "# PLANS — formatted physical plans for the headline queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}`. These are the",
        "plan shapes asserted in tests/test_plans.py — the scale-relevant",
        "properties are called out per query.",
        "",
    ]
    for name, why in SHOWCASE:
        df = qs[name](spark, sf_dir)
        out.append(f"## {name}\n\n{why}\n\n```")
        out.append(plan_summary(df).strip())
        out.append("```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()

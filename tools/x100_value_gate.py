#!/usr/bin/env python
"""The x100 VALUE spot-gate: full row + schema + value comparison of a
fast-oracle query subset against the x100 synth corpus (545,455 docs /
200,000 vectors — tools/scaling_report.py fixtures). The x10 gate
(tools/scale_check.py) replays EVERY doc/emb-only oracled query; at
x100 the heavy-oracle families (LSH/Jaccard self-joins, the curate
chain) outgrow DuckDB's temp space, so this gate pins the subset whose
oracles stay tractable — chosen to cover every family the round-7/8
verdicts flagged: exact dedup at 545k groups, the quality/gopher
passes, BM25, BOTH percolator forms plus the join-form stream drain,
interactive retrieval, the filtered IVF probe, the maintained-index
ingest pair, the staleness monitor + drift report (round-8 string
surface), the cogrouped cosine gate, the reshape pair, and the
recenter/rewrite maintenance phase.

Usage: python tools/x100_value_gate.py [synth_dir]
  synth_dir defaults to /tmp/dferp_scale/x100 (create with
  tools/scaling_report.py). Needs SPARK_DRIVER_MEMORY=32g for the
  x100 broadcasts (see SCALING.md).
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, ".")

# Round-7 set (12) + round-8 additions (6) + round-9 temporal pair.
QUERIES = [
    # round-7 spot set
    "dedup_exact",
    "text_quality",
    "text_gopher_rules",
    "text_bm25_topk",
    "percolate_stream",
    "percolate_join_batch",
    "knn_whole",
    "hybrid_search",
    "ann_ivf_filtered",
    "ann_ingest_assign",
    "ann_centroid_staleness",
    "report_corpus_drift",
    # round-8 additions — the r7 verdict's weak spots + new operators
    "dedup_cosine_incremental",
    "agg_pivot_roundtrip",
    "win_ntile_quartiles",
    "ann_ingest_pq",
    "ann_recenter_compact",
    "percolate_join_stream",
    # round-9 additions — the events family's first at-scale value
    # check (10M events, skewed users + one hot user with ~100k
    # events stressing the funnel's per-user collect+fold and
    # sessionize's merged mega-session), incl. the conversion-deadline
    # funnel and the incrementally-maintained retention drain
    "events_funnel",
    "events_retention",
    "events_funnel_windowed",
    "events_retention_stream",
    # round-10 additions — the late-round rebuilds whose formulations
    # changed (tf-weighted unigram mean, map-side-dl tfidf, the
    # grouping-sets + shared-aggregate report): re-prove the values at
    # 545k docs / 10M events where float-order and null-group hazards
    # would actually surface
    "text_unigram_logprob",
    "text_tfidf_keywords",
    "report_dataset",
    # round-11 additions — the perceptual near-dup (new in r10, x10-
    # certified only until now: the Hamming-ball banding's pigeonhole
    # completeness is exactly the property a 545k-doc corpus with real
    # band collisions stresses), the two tag-filtered retrieval modes
    # (the x10 over-2× churn list), and the BM25+cosine fusion
    "dedup_image_phash",
    "hybrid_search_tag_filtered",
    "segment_search_tag_filtered",
    "retrieval_rrf_fusion",
]


def main() -> int:
    synth_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dferp_scale/x100"
    if not os.path.isdir(synth_dir):
        print(
            f"synth dir {synth_dir} missing — run tools/scaling_report.py "
            "first (it writes the counter-seeded corpora)",
            file=sys.stderr,
        )
        return 2
    print(
        f"x100 value spot-gate: {len(QUERIES)} queries vs {synth_dir}",
        file=sys.stderr,
    )
    return subprocess.call(
        [sys.executable, "tools/check_correctness.py", synth_dir, *QUERIES]
    )


if __name__ == "__main__":
    raise SystemExit(main())

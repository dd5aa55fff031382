"""Analytics parity suite (SURVEY.md §7 M7): the reference's batch
analytics jobs (analyze_dataset_distribution.py,
visualize_segmented_tags.py) as one DataFrame report bundle — numbers
only, plotting stays out of engine scope (SURVEY.md §2.8 U7/U8).

Every entry is a lazy DataFrame; nothing is collected here. A caller
can compute all of them in one pass over each table since they share
scans (Catalyst reuses the cached/exchange subplans under AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import analytics


def dataset_report(
    documents: DataFrame,
    events: DataFrame,
    embeddings: DataFrame,
) -> dict[str, DataFrame]:
    """The analyze_dataset_distribution.py report set, over the
    engine's tables:

    - per-source / per-lang frequency counts (A1);
    - token leaderboard (A2 explode-then-count, top 30);
    - length histogram (A7, 50-char bins) + decade-style bins;
    - distinct counters (A8);
    - coverage split — docs with/without short text (A10 analogue of
      the has-coords split);
    - per-group length stats (A6);
    - per-label embedding counts + mean vector norm (segment-corpus
      stats, visualize_segmented_tags.py:98-102 analogue).
    """
    from ..functions import vectors as V

    return {
        "source_counts": analytics.value_counts(documents, "source"),
        "lang_counts": analytics.value_counts(documents, "lang"),
        "token_leaderboard": (
            documents.select(
                F.explode(F.split(F.lower("text"), r"\s+")).alias("value")
            )
            .filter(F.length("value") > 0)
            .groupBy("value")
            .agg(F.count("*").alias("count"))
            .orderBy(F.desc("count"), F.col("value"))
            .limit(30)
        ),
        "length_histogram": analytics.histogram(documents, "n_chars", 50.0),
        "length_stats_by_lang": analytics.group_stats(documents, "lang", "n_chars"),
        "distinct_counters": documents.agg(
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("lang").alias("n_langs"),
            F.count("*").alias("n_docs"),
        ),
        "coverage_split": (
            documents.groupBy((F.col("n_chars") >= 100).alias("has_long_text"))
            .agg(F.count("*").alias("count"))
        ),
        "event_type_counts": analytics.value_counts(events, "event_type"),
        "events_per_user_stats": (
            events.groupBy("user_id")
            .agg(F.count("*").alias("n_events"))
            .agg(
                F.count("*").alias("n_users"),
                F.avg("n_events").alias("mean_events"),
                F.min("n_events").alias("min_events"),
                F.max("n_events").alias("max_events"),
            )
        ),
        "label_vector_stats": (
            embeddings.groupBy("label")
            .agg(
                F.count("*").alias("n_vectors"),
                F.avg(V.l2_norm(F.col("embedding"))).alias("mean_norm"),
            )
            .orderBy("label")
        ),
    }

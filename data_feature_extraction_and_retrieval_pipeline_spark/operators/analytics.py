"""Analytics operators (SURVEY.md §2.4 A1-A11, §2.5 W1-W8).

Mirrors analyze_dataset_distribution.py / visualize_segmented_tags.py
as DataFrame reports: frequency counts, explode-then-count of
multi-valued cells, histograms, distinct counts, leaderboards,
per-group stats. All single-shuffle groupBys with map-side partial
aggregation — the shapes that stay cheap at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as X


def value_counts(
    df: DataFrame, col: str, desc: bool = True, ordered: bool = True
) -> DataFrame:
    """A1 — pandas ``value_counts`` (analyze_dataset_distribution.py:62...).

    ``ordered=False`` skips the display sort (a range exchange + a
    chunk of Catalyst analysis time) for consumers that re-sort or
    hash the rows anyway — e.g. the long-form report union, where 9
    cosmetic per-branch sorts dominated the PLAN cost of the whole
    bundle."""
    out = df.groupBy(col).agg(F.count("*").alias("count"))
    if not ordered:
        return out
    order = [F.desc("count"), F.col(col)] if desc else [F.col(col)]
    return out.orderBy(*order)


def explode_counts(
    df: DataFrame, col: str, top_n: int | None = None, delim: str = ","
) -> DataFrame:
    """A2 — split multi-valued cell, trim, count, leaderboard
    (analyze_dataset_distribution.py:78-83)."""
    exploded = df.select(
        F.explode(X.split_trim(F.col(col), delim)).alias("value")
    ).filter(F.length("value") > 0)
    counts = exploded.groupBy("value").agg(F.count("*").alias("count"))
    counts = counts.orderBy(F.desc("count"), F.col("value"))
    return counts.limit(top_n) if top_n is not None else counts


def histogram(
    df: DataFrame,
    col: str,
    bin_width: float,
    min_value: float = 0.0,
    ordered: bool = True,
) -> DataFrame:
    """A7 — fixed-width binning (numpy hist analogue). Bin label is the
    inclusive lower bound. ``ordered=False`` as in value_counts."""
    bin_col = (
        F.floor((F.col(col) - F.lit(min_value)) / F.lit(bin_width)) * F.lit(bin_width)
        + F.lit(min_value)
    ).cast("double")
    out = (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_col.alias("bin"))
        .agg(F.count("*").alias("count"))
    )
    return out.orderBy("bin") if ordered else out


def decade(col) -> F.Column:
    """F9 — ``(year // 10) * 10`` (analyze_dataset_distribution.py:102)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / 10) * 10).cast("int")


def group_stats(
    df: DataFrame, group_col: str, value_col: str, ordered: bool = True
) -> DataFrame:
    """A6 — per-group mean/median/min/max (visualize_segmented_tags.py:171-177).

    Median is the exact interpolated percentile (matches the oracle's
    ``quantile_cont``); swap for ``percentile_approx`` at 100 TB where
    an exact median forces a full sort per group. ``ordered=False``
    as in value_counts.
    """
    out = (
        df.groupBy(group_col)
        .agg(
            F.count("*").alias("n"),
            F.avg(value_col).alias("mean"),
            F.expr(f"percentile(`{value_col}`, 0.5)").alias("median"),
            F.min(value_col).alias("min"),
            F.max(value_col).alias("max"),
        )
    )
    return out.orderBy(group_col) if ordered else out


def top_n_per_group(
    df: DataFrame, group_col: str, order_col: str, n: int, tiebreak_col: str
) -> DataFrame:
    """W2 — row_number window capped at n per group (the reference's
    max-segments-per-image cap, SAM/extract_sam_clip_features.py:65-78)."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.col(tiebreak_col))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def vector_mean(
    df: DataFrame, group_col: str, vec_col: str
) -> DataFrame:
    """A3 — element-wise mean vector per group
    (SAM/upload_segments_to_elasticsearch.py:61-68 ``np.mean(axis=0)``).

    posexplode → groupBy(group, pos) avg → reassemble ordered array.
    Two shuffles but both on narrow (group, pos, double) rows; at
    scale this beats collecting vectors to Python by construction.
    """
    exploded = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    means = exploded.groupBy(group_col, "pos").agg(F.avg("x").alias("mean_x"))
    return (
        means.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("mean_x")))
            ).alias("pairs")
        )
        .select(
            F.col(group_col),
            F.transform(F.col("pairs"), lambda p: p["mean_x"]).alias("mean_vec"),
        )
    )


def sketch_profile(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    value_col: str,
    rsd: float = 0.05,
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate per-group profile — the SKETCH versions of the
    certified exact aggregates, for the scales where exact is the
    bottleneck:

    - ``approx_count_distinct`` (HyperLogLog++): O(1) state per group
      vs the exact distinct's shuffle of every distinct value — at
      100 TB an exact countDistinct on a high-cardinality column is a
      full reshuffle of the column, the sketch is a few KB per group
      merged map-side.
    - ``percentile_approx`` (KLL-style quantile sketch): bounded-size
      mergeable state vs the exact percentile's per-group sort.

    Both are deterministic for a given input and Spark version but
    implementation-specific — NO SQL oracle can replay them, so the
    registry entry is rows-only by nature; correctness is bounded
    instead: pytest asserts the sketches land within tolerance of the
    certified exact twins (agg_distinct_counts, agg_group_stats).
    Plans stay partial+final aggregation around ONE exchange, exactly
    like the exact versions — the scale win is state size, not plan
    shape.
    """
    return (
        df.groupBy(group_col)
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct(distinct_col, rsd=rsd).alias(
                "approx_distinct"
            ),
            F.percentile_approx(value_col, 0.5, accuracy).alias(
                "approx_median"
            ),
            F.percentile_approx(value_col, 0.95, accuracy).alias(
                "approx_p95"
            ),
        )
        .orderBy(group_col)
    )

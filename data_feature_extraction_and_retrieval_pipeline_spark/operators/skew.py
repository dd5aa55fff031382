"""Skew-handling utilities for 100 TB-scale shuffles.

AQE's skew-join splitting (enabled in session.py) handles most cases
at runtime; these operators are the explicit techniques for the cases
AQE can't fix: a groupBy where one key holds a large share of all
rows (AQE cannot split a single hash-aggregate key), and a join
against a dimension too big to broadcast where one fact key is hot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random salt: groupBy
    (key, salt) → partial aggregates → groupBy key → merge.

    ``aggs`` maps output column → (input column, fn) where fn ∈
    {sum, count, min, max}. These are the re-aggregable functions —
    avg must be expressed as sum+count by the caller (merge of
    partial avgs is not an avg).

    A hot key's rows land in ``salt_buckets`` different reduce
    partitions in phase 1, so no single task sees the whole key. The
    phase-2 shuffle carries one row per (key, salt) — tiny.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")

    partial_aggs = []
    final_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_aggs.append(F.count(col).alias(f"__p_{out}"))
            final_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(f"__p_{out}"))
            final_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(f"__p_{out}"))
            final_aggs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(f"__p_{out}"))
            final_aggs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-re-aggregable fn {fn!r}")

    phase1 = df.withColumn("__salt", salt).groupBy(*key_cols, "__salt").agg(
        *partial_aggs
    )
    return phase1.groupBy(*key_cols).agg(*final_aggs)


def salted_top_n_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    n: int,
    tiebreak_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase top-n per group for HOT group keys — the W1/W2 shape
    (per-image best segments, search_with_segments.py:246-272) where
    one image with 10⁶ segments would serialize a window into a single
    task's sort.

    MEASURED FINDING (tools/skew_bench.py, 24M rows / 98% on one key):
    on Spark >= 3.5 the plain ``row_number() <= n`` filter BEATS this
    operator (1.84s vs 2.31s) — Catalyst inserts ``WindowGroupLimit
    Partial`` map-side BEFORE the exchange, collapsing the hot key to
    <= n rows per map task with no extra shuffle, i.e. the optimizer
    already applies a better version of this exact technique (pinned
    in tests/test_skew.py). Prefer ``analytics.top_n_per_group``.

    This operator remains for the window shapes the rule does NOT
    rewrite (a rank consumed without a <= n filter, engines/versions
    without WindowGroupLimit): phase 1 ranks within (group, salt) so
    the hot group sorts in ``salt_buckets`` parallel tasks keeping
    local top-n; phase 2 re-ranks the <= n x salt_buckets survivors.
    Row-identical to the plain form (the global top-n is contained in
    the union of per-salt top-ns; the final rank re-numbers by the
    same (order desc, tiebreak) total order).
    """
    from pyspark.sql import Window

    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    w1 = Window.partitionBy(group_col, "__salt").orderBy(
        F.desc(order_col), F.col(tiebreak_col)
    )
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= n)
        .drop("__r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(
        F.desc(order_col), F.col(tiebreak_col)
    )
    return (
        survivors.drop("__salt")
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= n)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skewed fact ⋈ dim equi join: salt the fact side randomly,
    explode the dim side across all salt values, join on (key, salt).

    The hot fact key spreads over ``salt_buckets`` reducers; the dim
    is replicated ×salt_buckets (acceptable when dim ≪ fact but too
    big to broadcast). Row-identical to the unsalted inner join.
    """
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_fact.join(salted_dim, [key, "__salt"]).drop("__salt")

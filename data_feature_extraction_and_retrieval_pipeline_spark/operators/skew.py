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

"""Temporal operators: as-of join and sessionization.

Absent from the reference (SURVEY.md §2.3 lists range/as-of joins as
"absent — provided by Spark built-ins as needed"; §2.11 notes the
reference has no streaming/stateful surface at all). Both are
first-class needs of a large-scale event/training-data pipeline, so
the engine ships them as proper set-oriented operators.

Scale notes:

- ``asof_join`` uses the union-merge formulation: tag both sides,
  union, one window over (key, ts) with a forward-fill. ONE shuffle on
  the join key, no range explosion, no per-key driver loops — the
  classic scalable as-of strategy (vs. the naive equi-join +
  filter + argmax which materializes every candidate pair).
- ``sessionize`` uses Spark's native ``session_window`` — on a stream
  the same expression becomes stateful session aggregation with
  watermark-driven state eviction; in batch it is a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the latest right row with the same
    ``key`` and ``right_ts <= left_ts`` (inclusive).

    Implementation: union-merge. Right rows sort before left rows at
    equal timestamps (side 0 < side 1), so a right row at exactly
    ``left_ts`` matches — the same inclusive semantics as DuckDB/kdb
    ASOF JOIN.

    Left rows with no prior right row keep nulls (left-outer as-of).
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    lcols = left.columns

    # The right row is carried as ONE struct and forward-filled
    # atomically: per-column last(ignorenulls) would fill a genuinely
    # NULL payload value from an OLDER right row, emitting a mixed row
    # no single right row ever contained. The struct is non-null for
    # every right row (even with null payload fields), so the fill
    # always selects the complete latest right row — real ASOF JOIN
    # semantics.
    r_struct = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in right_payload],
    )
    l_tagged = left.select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__left"),
        F.lit(None).cast(
            right.select(r_struct.alias("__r")).schema["__r"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tagged.schema["__left"].dataType
        ).alias("__left"),
        r_struct.alias("__r"),
    )

    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "__side",
        "__left",
        F.last("__r", ignorenulls=True).over(w).alias("__r_filled"),
    )
    out = filled.filter(F.col("__side") == 1).select(
        *[F.col("__left")[c].alias(c) for c in lcols],
        *[F.col("__r_filled")[c].alias(f"{prefix}{c}") for c in right_payload],
        F.col("__r_filled")["__rts"].alias(f"{prefix}{right_ts}"),
    )
    return out


def sessionize_spans(
    events: DataFrame,
    gap: str = "30 minutes",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Batch-optimized sessionization twin of :func:`sessionize`:
    lag + running-sum windows over ONE ``(key)``-partitioned sort.

    Everything downstream of the single exchange — boundary flags,
    session ordinals, per-session aggregates, even a further per-key
    rollup — reuses the same hash partitioning, so the whole pipeline
    is exchange → sort → window → window → agg in one stage, where the
    ``session_window`` form pays a separate session-merge pass. Output
    schema and values match :func:`sessionize` (asserted in
    tests/test_temporal.py): session_end = last event + gap.

    A new session starts when the gap since the previous event
    STRICTLY exceeds ``gap`` — an event landing exactly on the
    boundary extends the session.
    """
    interval = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy(key).orderBy(ts_col)
    run = (
        Window.partitionBy(key)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag(ts_col).over(w)
    new_s = F.when(
        prev.isNull() | (F.col(ts_col) > prev + interval), 1
    ).otherwise(0)
    sess = events.withColumn("__sid", F.sum(new_s).over(run))
    aggs: list[Column] = [
        F.min(ts_col).alias("session_start"),
        (F.max(ts_col) + interval).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        sess.groupBy(key, "__sid")
        .agg(*aggs)
        .drop("__sid")
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Group each key's events into sessions separated by inactivity
    ``gap`` — Spark-native ``session_window``, which on a streaming
    input becomes stateful session aggregation (state evicted past the
    watermark) with zero code change.

    Returns (key, session_start, session_end, n_events[, sum_value])
    where session_end = last event + gap (Spark session_window
    semantics).
    """
    aggs: list[Column] = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key)
        )
        .agg(*aggs)
        .select(
            F.col(key),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            *([F.col("sum_value")] if value_col is not None else []),
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = 600,
    upper_seconds: int = 0,
    right_payload: list[str] | None = None,
) -> DataFrame:
    """Time-bounded interval join: every (left, right) pair with the
    same key whose right timestamp falls in
    ``[left.ts − lower, left.ts + upper]`` — the bounded-window sibling
    of ``asof_join`` (ALL in-window matches, not just the latest).

    Plan: equi join on the key with the range as a join predicate —
    one shuffle on the key; the range prunes pairs inside the join,
    never materializing the unbounded cross product per key. On a
    STREAM the identical condition is Spark's watermarked
    stream-stream join (streaming/join.py::interval_join_stream) —
    the range bound is what lets the engine evict state, exactly as
    it bounds the batch join's output here.

    Output columns: key, ``left_ts`` (as ``lts``), ``right_ts`` (as
    ``rts``), plus ``right_payload`` columns.
    """
    payload = list(right_payload or [])
    l = left.select(F.col(key), F.col(left_ts).alias("lts"))
    r = right.select(F.col(key).alias("__rkey"), F.col(right_ts).alias("rts"), *payload)
    cond = (
        (l[key] == r["__rkey"])
        & (r["rts"] >= l["lts"] - F.expr(f"INTERVAL {int(lower_seconds)} SECONDS"))
        & (r["rts"] <= l["lts"] + F.expr(f"INTERVAL {int(upper_seconds)} SECONDS"))
    )
    return l.join(r, cond).select(key, "lts", "rts", *payload)

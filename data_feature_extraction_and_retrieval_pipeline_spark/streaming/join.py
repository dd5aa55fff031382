"""Watermarked stream-stream interval join (SURVEY.md §2.11 extension).

The one major Structured Streaming operator class the engine had not
yet shipped: joining two UNBOUNDED streams. Spark requires (a) a
watermark on both sides and (b) a time-range join condition — together
they bound the join state: a buffered left row can be evicted once the
right watermark passes ``left.ts + upper``, and vice versa. The
identical condition run in batch is ``operators/temporal.py::
interval_join``, which is how the drained output is certified (the
in-window match SET is deterministic — an inner stream-stream join
eventually emits exactly the pairs inside the bound regardless of
micro-batch arrival order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = 600,
    upper_seconds: int = 0,
    watermark: str = "1 hour",
    right_payload: list[str] | None = None,
) -> DataFrame:
    """Streaming twin of ``temporal.interval_join`` — same key/range
    condition, same output columns (key, lts, rts, payload), with
    watermarks on BOTH event-time columns so the join state is
    evictable (O(rows inside the watermark horizon), not O(stream)).
    """
    payload = list(right_payload or [])
    l = left.select(F.col(key), F.col(left_ts).alias("lts")).withWatermark(
        "lts", watermark
    )
    r = right.select(
        F.col(key).alias("__rkey"), F.col(right_ts).alias("rts"), *payload
    ).withWatermark("rts", watermark)
    cond = (
        (l[key] == r["__rkey"])
        & (r["rts"] >= l["lts"] - F.expr(f"INTERVAL {int(lower_seconds)} SECONDS"))
        & (r["rts"] <= l["lts"] + F.expr(f"INTERVAL {int(upper_seconds)} SECONDS"))
    )
    return l.join(r, cond).select(key, "lts", "rts", *payload)

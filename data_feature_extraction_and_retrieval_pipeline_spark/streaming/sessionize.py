"""Custom stateful streaming operator: sessionization via
``applyInPandasWithState`` (SURVEY.md §2.11 — the reference has no
stateful surface; this is the engine's `applyInPandasWithState`
pattern for operators ``session_window`` can't express, e.g. carrying
arbitrary per-session aggregates or emitting on custom triggers).

State per user: the currently-open session (start, last_ts, n, sum).
Each micro-batch: merge the batch's events into sessions with the
same gap rule as the batch twin (operators/temporal.py::sessionize);
CLOSED sessions are emitted immediately, the still-open one stays in
state (emitted on timeout). State is O(active users), bounded by the
event-time timeout — the watermark analogue for map-state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# open-session state: (start_epoch_us, last_epoch_us, n_events, sum_value)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)

GAP_US_DEFAULT = 30 * 60 * 1_000_000


def make_sessionizer(gap_us: int = GAP_US_DEFAULT, emit_open: bool = False):
    """Build the (key, batches, state) -> batches function for
    ``applyInPandasWithState``.

    ``emit_open=True`` also emits the still-open trailing session each
    batch (used with availableNow one-shot drains so the final session
    isn't stranded in state; a long-running stream would instead rely
    on the timeout to flush it). CAVEAT: this mode assumes the drain
    processes its backlog in ONE micro-batch (availableNow's default
    when ``maxFilesPerTrigger`` is unset) — a multi-batch drain would
    emit an open session per batch, fragmenting sessions that span a
    batch boundary. Use emit_open=False with timeouts for streams that
    trickle data across batches.
    """

    def sessionize_fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_us: list[int] = []
        vals: list[float] = []
        for pdf in batches:
            # normalize to µs regardless of the Arrow-side unit (ns/us)
            ts_us.extend(
                pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64").tolist()
            )
            # null values contribute 0 to the session sum — the batch
            # twin's F.sum skips nulls; a NaN here would poison the
            # whole session's sum_value
            vals.extend(pdf["value"].fillna(0.0).astype("float64"))

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, s = state.get
                state.remove()
                yield _emit(user_id, start_us, last_us, n, s, gap_us)
            return

        order = sorted(range(len(ts_us)), key=ts_us.__getitem__)
        cur = list(state.get) if state.exists else None

        closed: list[tuple[int, int, int, float]] = []
        for i in order:
            t, v = ts_us[i], vals[i]
            if cur is None:
                cur = [t, t, 1, v]
            elif t - cur[1] > gap_us:
                closed.append(tuple(cur))
                cur = [t, t, 1, v]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += v

        out = [_emit(user_id, *c, gap_us) for c in closed]
        if cur is not None:
            if emit_open:
                out.append(_emit(user_id, *cur, gap_us))
                state.remove() if state.exists else None
            else:
                state.update(tuple(cur))
                state.setTimeoutDuration(2 * gap_us // 1000)
        for pdf in out:
            yield pdf

    return sessionize_fn


def _emit(
    user_id: int, start_us: int, last_us: int, n: int, s: float, gap_us: int
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us + gap_us, unit="us")],
            "n_events": [n],
            "sum_value": [s],
        }
    )


def sessionize_stream(
    events_stream,
    gap: str = "30 minutes",
    emit_open: bool = False,
):
    """Attach the stateful sessionizer to a streaming events frame.

    ``session_end = last_event + gap`` matches the batch twin
    (``session_window`` semantics), so the stream's output is directly
    comparable to the batch query — the Structured Streaming contract.
    """
    n, unit = gap.split()
    per_unit = {
        "second": 1, "seconds": 1, "sec": 1, "secs": 1,
        "minute": 60, "minutes": 60, "min": 60, "mins": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }
    if unit not in per_unit:
        raise ValueError(
            f"sessionize_stream: unsupported gap unit {unit!r} "
            f"(supported: {sorted(set(per_unit))})"
        )
    gap_us = int(n) * per_unit[unit] * 1_000_000
    # Timeout mode follows the drain mode. A one-shot availableNow
    # drain (emit_open=True) never leaves state behind, so it needs no
    # timeouts — and declaring ProcessingTimeTimeout anyway makes the
    # runtime keep scheduling empty micro-batches to check for expired
    # state, so the "drain" never terminates (observed: ~2 empty
    # epochs/sec forever; awaitTermination only returns by timeout and
    # session teardown then aborts a batch mid-flight). A long-running
    # stream (emit_open=False) holds open sessions in state and relies
    # on the processing-time timeout to flush them.
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if emit_open
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events_stream.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_us, emit_open=emit_open),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )

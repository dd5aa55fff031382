"""Tracked intra-query persists.

Operators persist an intermediate when it feeds multiple consumers in
the same plan (the MinHash shingle frame, the hybrid-search phase-1
pool). Those caches are scoped to ONE query execution — but a
DataFrame is lazy, so the operator that created the cache cannot know
when its consumer has materialized. Left alone, a resident session
(the serving model, or a bench loop) accumulates one cache entry per
query execution and the storage memory fills with dead blocks.

``persist()`` here registers the frame in a session-lifetime ledger;
the harness (bench.py, tools/check_correctness.py, or any caller that
drives queries to completion) calls ``release()`` after materializing
a result to drop intra-query caches while leaving long-lived table
caches (``sources.readers``) untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []

# Set by queries.enable_plan_cache: when prepared plans are live, a
# released persist must be re-MARKED (Spark's cache manager keys the
# marking on the logical plan; unpersist deregisters it, and the next
# execution of the prepared plan would silently recompute its
# multi-consumer intermediate once per consumer). Re-persisting keeps
# the marking with zero retained blocks — every run still recomputes
# from the scans, so no run ever reads blocks a prior run materialized.
RETAIN_ON_RELEASE = False


def persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later :func:`release`."""
    out = df.persist()
    if out not in _LIVE:
        _LIVE.append(out)
    return out


def release() -> int:
    """Drop the data blocks of every tracked intra-query cache.

    With ``RETAIN_ON_RELEASE`` (prepared-plan mode) the frames stay in
    the ledger re-marked for caching, so the next execution caches its
    intermediates again and the blocks are dropped again after it; the
    ledger is bounded by the number of prepared plans. Otherwise the
    ledger empties (one-shot harness runs). Returns the released count.
    """
    n = len(_LIVE)
    survivors: list[DataFrame] = []
    for df in _LIVE:
        try:
            alive = df.sparkSession.sparkContext._jsc is not None
        except Exception:
            alive = False
        if not alive:
            continue  # dead session: drop the ledger entry entirely
        try:
            df.unpersist(blocking=False)
            if RETAIN_ON_RELEASE:
                df.persist()
                survivors.append(df)
        except Exception:
            pass
    _LIVE[:] = survivors if RETAIN_ON_RELEASE else []
    return n

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


def persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later :func:`release`."""
    out = df.persist()
    _LIVE.append(out)
    return out


def release() -> int:
    """Unpersist every tracked intra-query cache. Returns the count."""
    n = len(_LIVE)
    for df in _LIVE:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped
    _LIVE.clear()
    return n

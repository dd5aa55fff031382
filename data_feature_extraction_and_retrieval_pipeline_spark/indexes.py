"""Session-resident derived index artifacts (opt-in).

The ANN / dedup operators derive per-row index columns from the
immutable embedding and document tables — IVF cluster assignments, LSH
bucket ids, banded MinHash signatures. At cluster scale these are
WRITE-TIME artifacts: the table is ingested once, the index column is
computed once, and the data is written partitioned/bucketed by it
(see operators/similarity.py and operators/dedup.py docstrings); every
query after that reads the already-indexed table.

A local bench or serving session models that steady state by
materializing each artifact once per (session, key) and re-using the
persisted frame across queries, exactly like the base-table cache in
``sources.readers``. Default OFF: correctness runs (driver gate,
pytest) build every artifact from scratch inside the query under test.
"""

from __future__ import annotations

import threading

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_INDEX_CACHE: dict[tuple[int, str], DataFrame] = {}
_VALUE_CACHE: dict[tuple[int, str], object] = {}
# id(spark) → session, recorded whenever a value is cached: value
# entries carry no session reference of their own, so liveness
# pruning needs this map — and the strong reference it holds pins the
# CPython id against reuse while entries keyed by it still exist (a
# recycled id would otherwise hand a NEW session a value frozen under
# a dead one).
_VALUE_SESSIONS: dict[int, SparkSession] = {}
_ENABLED = False

# Wall seconds to materialize each resident artifact from scratch,
# keyed like _INDEX_CACHE values' keys. Emitted by bench.py so the
# steady-state serving numbers carry their own one-time build cost —
# the DuckDB oracle recomputes these artifacts inside every query, so
# the bench JSON must show what keeping them resident is worth.
BUILD_SECONDS: dict[str, float] = {}

# One build per key even under concurrent callers (the bench's cold
# pass runs queries through a thread pool, and tag_search /
# tag_search_and share an artifact): without the lock both threads
# pass the cache miss, both pay the multi-second build, and the
# loser's persisted blocks stay pinned for the session.
_BUILD_LOCK = threading.Lock()


def enable_index_cache(enabled: bool = True) -> None:
    """Toggle artifact reuse. Disabling drops all cached artifacts."""
    global _ENABLED
    _ENABLED = enabled
    if not enabled:
        for df in _INDEX_CACHE.values():
            try:
                df.unpersist()
            except Exception:
                pass
        _INDEX_CACHE.clear()
        _VALUE_CACHE.clear()
        _VALUE_SESSIONS.clear()
        # timings describe the dropped artifacts — keep the two
        # transparency fields (resident list / build seconds) in sync
        BUILD_SECONDS.clear()


def _prune_dead_sessions() -> None:
    """Drop cache entries whose SparkSession has been stopped.

    A weak-keyed map can't do this: each cached DataFrame holds a
    strong reference back to its session, so the session never becomes
    collectable while its artifacts are cached. Liveness-pruning on
    access releases dead-session artifacts (and their JVM-side state)
    in long-lived multi-session processes.
    """
    for k, df in list(_INDEX_CACHE.items()):
        try:
            alive = df.sparkSession.sparkContext._jsc is not None
        except Exception:
            alive = False
        if not alive:
            _INDEX_CACHE.pop(k, None)
    # value entries leak the same way but are keyed by id(spark) only;
    # check liveness through the recorded session and drop every value
    # frozen under a dead one
    for sid, spark in list(_VALUE_SESSIONS.items()):
        try:
            alive = spark.sparkContext._jsc is not None
        except Exception:
            alive = False
        if not alive:
            _VALUE_SESSIONS.pop(sid, None)
            for k in [k for k in _VALUE_CACHE if k[0] == sid]:
                _VALUE_CACHE.pop(k, None)


def materialized_value(
    spark: SparkSession, key: str, build: Callable[[], object]
) -> object:
    """Like :func:`materialized` but for SMALL driver-side artifacts —
    collected stats rows, fitted thresholds, codebooks. The write-time
    equivalent is the tiny metadata file that ships next to an index
    (a BM25 percolator's frozen ``(term, df)`` vocab plus the 1-row
    ``(N, Σdl)`` totals is a few KB); keeping it as driver state lets
    consumers rebuild a LITERAL frame per query, which broadcasts from
    a LocalTableScan without scheduling a job. Cache off ⇒ ``build()``
    runs fresh, same as :func:`materialized`.
    """
    if not _ENABLED:
        return build()
    k = (id(spark), key)
    if k not in _VALUE_CACHE:
        import time

        with _BUILD_LOCK:
            if k not in _VALUE_CACHE:
                _prune_dead_sessions()
                t0 = time.perf_counter()
                _VALUE_CACHE[k] = build()
                _VALUE_SESSIONS[id(spark)] = spark
                BUILD_SECONDS[key] = round(time.perf_counter() - t0, 4)
    return _VALUE_CACHE[k]


def materialized(
    spark: SparkSession, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return ``build()`` — persisted and memoized per (session, key)
    when the index cache is on, freshly built otherwise.

    ``key`` must uniquely identify the artifact's inputs and
    parameters (sf_dir, centroid count, band layout, …); the caller is
    the authority on that, mirroring how a written index table's path
    encodes its build parameters.
    """
    if not _ENABLED:
        return build()
    k = (id(spark), key)
    df = _INDEX_CACHE.get(k)
    if df is None:
        import time

        with _BUILD_LOCK:
            df = _INDEX_CACHE.get(k)  # double-checked under the lock
            if df is None:
                _prune_dead_sessions()
                t0 = time.perf_counter()
                df = build().persist()
                # materialize eagerly: every consumer would otherwise
                # race to compute the same persisted blocks, and the
                # build cost must be attributable (BUILD_SECONDS)
                # rather than smeared into whichever query happens to
                # touch the artifact first
                df.count()
                BUILD_SECONDS[key] = round(time.perf_counter() - t0, 4)
                _INDEX_CACHE[k] = df
    return df

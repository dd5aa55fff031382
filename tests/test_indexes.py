"""Artifact-cache lifecycle: dead-session pruning must cover BOTH
caches. _INDEX_CACHE entries carry their session through the cached
DataFrame; _VALUE_CACHE entries are keyed by id(spark) only, so the
module records the session in _VALUE_SESSIONS — holding the strong
reference also pins the CPython id against reuse while entries exist
(a recycled id would hand a NEW session a value frozen under a dead
one, stale if the fixture dir was regenerated in place)."""

from data_feature_extraction_and_retrieval_pipeline_spark import indexes


class _DeadSession:
    """Quacks like a stopped SparkSession for liveness checks."""

    @property
    def sparkContext(self):
        raise RuntimeError("session stopped")


class _LiveSession:
    class _Ctx:
        _jsc = object()

    sparkContext = _Ctx()


def test_prune_drops_value_cache_of_dead_sessions():
    dead, live = _DeadSession(), _LiveSession()
    indexes._VALUE_SESSIONS[id(dead)] = dead
    indexes._VALUE_SESSIONS[id(live)] = live
    indexes._VALUE_CACHE[(id(dead), "k1")] = "stale"
    indexes._VALUE_CACHE[(id(dead), "k2")] = "stale"
    indexes._VALUE_CACHE[(id(live), "k1")] = "fresh"
    try:
        indexes._prune_dead_sessions()
        assert (id(dead), "k1") not in indexes._VALUE_CACHE
        assert (id(dead), "k2") not in indexes._VALUE_CACHE
        assert id(dead) not in indexes._VALUE_SESSIONS
        assert indexes._VALUE_CACHE[(id(live), "k1")] == "fresh"
        assert id(live) in indexes._VALUE_SESSIONS
    finally:
        indexes._VALUE_CACHE.pop((id(live), "k1"), None)
        indexes._VALUE_SESSIONS.pop(id(live), None)


def test_materialized_value_records_session():
    indexes.enable_index_cache(True)
    try:
        live = _LiveSession()
        got = indexes.materialized_value(live, "probe", lambda: 42)
        assert got == 42
        assert indexes._VALUE_SESSIONS[id(live)] is live
        # cache hit: build not re-run
        assert indexes.materialized_value(
            live, "probe", lambda: (_ for _ in ()).throw(AssertionError)
        ) == 42
    finally:
        indexes.enable_index_cache(False)

"""As-of join + sessionization semantics (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
    asof_join,
    sessionize,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1),
            ("A", _ts("2024-01-01 10:05:00"), 2),
            ("A", _ts("2024-01-01 09:00:00"), 3),  # before any quote
            ("B", _ts("2024-01-01 10:00:00"), 4),  # exact-tie with quote
            ("C", _ts("2024-01-01 10:00:00"), 5),  # key with no quotes
        ],
        ["key", "ts", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:30:00"), 100.0),
            ("A", _ts("2024-01-01 10:03:00"), 101.0),
            ("B", _ts("2024-01-01 10:00:00"), 200.0),
        ],
        ["key", "ts", "px"],
    )
    return trades, quotes


def test_asof_join_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, key="key", right_payload=["px"])
    got = {r["trade_id"]: (r["asof_px"], r["asof_ts"]) for r in out.collect()}
    assert got[1][0] == 100.0          # latest quote ≤ 10:00 is 09:30
    assert got[2][0] == 101.0          # 10:03 quote wins at 10:05
    assert got[3] == (None, None)      # no quote before 09:00
    assert got[4][0] == 200.0          # inclusive: equal ts matches
    assert got[5] == (None, None)      # key never quoted
    # left row count preserved (left-outer as-of)
    assert out.count() == trades.count()


def test_asof_join_events_scale(spark):
    """On the sf0.001 fixture: every matched lag is non-negative and
    matches a window-computed reference."""
    from data_feature_extraction_and_retrieval_pipeline_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(errors, clicks, key="user_id", right_payload=["value"])
    assert out.count() == errors.count()
    bad = out.filter(F.col("asof_ts") > F.col("ts")).count()
    assert bad == 0


def test_sessionize_spans_equals_session_window(spark):
    """The batch-optimized lag/running-sum formulation must produce
    the exact session set the native session_window produces — on the
    driver events fixture AND a synthetic boundary fixture."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import (
        sessionize_spans,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    def norm(df):
        return sorted(
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], round(r["sum_value"], 6))
            for r in df.collect()
        )

    assert norm(sessionize_spans(ev, "30 minutes")) == norm(
        sessionize(ev, "30 minutes")
    )


def test_sessionize_gap_splits(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1.0),
            (1, _ts("2024-01-01 10:10:00"), 2.0),   # same session (<30m)
            (1, _ts("2024-01-01 11:00:00"), 3.0),   # 50m gap → new session
            (2, _ts("2024-01-01 10:00:00"), 4.0),
        ],
        ["user_id", "ts", "value"],
    )
    out = sessionize(ev, "30 minutes").orderBy("user_id", "session_start")
    rows = out.collect()
    assert [(r["user_id"], r["n_events"]) for r in rows] == [(1, 2), (1, 1), (2, 1)]
    s1 = rows[0]
    assert s1["session_start"] == _ts("2024-01-01 10:00:00")
    # session_window end = last event + gap
    assert s1["session_end"] == _ts("2024-01-01 10:40:00")
    assert s1["sum_value"] == pytest.approx(3.0)


def test_asof_join_carries_whole_right_row(spark):
    """A genuinely-null right payload value must NOT be back-filled
    from an older right row: the as-of match is the complete latest
    right row, like DuckDB/kdb ASOF JOIN."""
    import datetime as dt

    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import asof_join

    def ts(m):
        return dt.datetime(2024, 1, 1, 10, m)

    right = spark.createDataFrame(
        [(1, ts(0), 5.0, "a"), (1, ts(2), None, "b")],
        "k long, ts timestamp, val double, tag string",
    )
    left = spark.createDataFrame([(1, ts(5))], "k long, ts timestamp")
    row = asof_join(left, right, "k").collect()[0]
    assert row.asof_tag == "b"
    assert row.asof_val is None  # NOT 5.0 from the older row
    assert row.asof_ts == ts(2)


def test_interval_join_matches_python(spark):
    """Batch interval join equals the quadratic Python reference on
    the fixture events (all same-user clicks in the window before each
    error, multiplicity preserved)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import (
        interval_join,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts", "event_type", "value"
    )
    errors = [(r.user_id, r.ts) for r in ev.filter(F.col("event_type") == "error").collect()]
    clicks = [
        (r.user_id, r.ts, r.value)
        for r in ev.filter(F.col("event_type") == "click").collect()
    ]
    import datetime as dt

    lo = dt.timedelta(seconds=3600)
    want = sorted(
        (u, lts, rts, round(v, 9))
        for (u, lts) in errors
        for (cu, rts, v) in clicks
        if cu == u and lts - lo <= rts <= lts
    )
    got = interval_join(
        ev.filter(F.col("event_type") == "error").select("user_id", "ts"),
        ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value"),
        key="user_id",
        lower_seconds=3600,
        right_payload=["value"],
    )
    got_rows = sorted(
        (r.user_id, r.lts, r.rts, round(r.value, 9)) for r in got.collect()
    )
    assert got_rows == want and len(want) > 0


def test_win_lag_delta_semantics(spark, tmp_path):
    """win_lag_delta on a hand-built events dir: known gaps, a
    single-event user (NULL avg/max, zero gaps), and a same-timestamp
    tie broken by event_id."""
    from datetime import datetime as dt

    from data_feature_extraction_and_retrieval_pipeline_spark import queries as Q

    rows = [
        # user 1: gaps of 10s and 20s
        (1, dt(2024, 1, 1, 0, 0, 0), 1, "click", 0.0, "{}"),
        (2, dt(2024, 1, 1, 0, 0, 10), 1, "click", 0.0, "{}"),
        (3, dt(2024, 1, 1, 0, 0, 30), 1, "click", 0.0, "{}"),
        # user 2: one event — no gaps at all
        (4, dt(2024, 1, 1, 0, 0, 0), 2, "view", 0.0, "{}"),
        # user 3: tied timestamps — ordered by event_id, both gaps 0
        (5, dt(2024, 1, 1, 0, 1, 0), 3, "view", 0.0, "{}"),
        (6, dt(2024, 1, 1, 0, 1, 0), 3, "view", 0.0, "{}"),
        (7, dt(2024, 1, 1, 0, 1, 0), 3, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")

    out = {
        r.user_id: r
        for r in Q.queries()["win_lag_delta"](spark, sf).collect()
    }
    assert (out[1].n_events, out[1].n_gaps) == (3, 2)
    assert out[1].avg_gap_us == 15_000_000 and out[1].max_gap_s == 20.0
    assert (out[2].n_events, out[2].n_gaps) == (1, 0)
    assert out[2].avg_gap_us is None and out[2].max_gap_s is None
    assert (out[3].n_events, out[3].n_gaps) == (3, 2)
    assert out[3].avg_gap_us == 0 and out[3].max_gap_s == 0.0


def test_funnel_hand_values(spark):
    """Strict-after semantics on a hand timeline: a click BEFORE the
    first view never counts; a user stopping at step 2 gets depth 2;
    a user with no step-1 event gets depth 0 with all-NULL stamps;
    NULL ts rows anchor nothing."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        funnel,
    )

    rows = [
        # u1: full conversion, with a decoy click before the view
        (1, "2024-01-01 10:00:00", "click"),
        (1, "2024-01-01 10:01:00", "view"),
        (1, "2024-01-01 10:02:00", "click"),
        (1, "2024-01-01 10:05:00", "purchase"),
        # u2: view then click, never purchases
        (2, "2024-01-01 09:00:00", "view"),
        (2, "2024-01-01 09:30:00", "click"),
        # u3: purchase only — no view, depth 0
        (3, "2024-01-01 08:00:00", "purchase"),
        # u4: NULL ts view must not anchor step 1
        (4, None, "view"),
        (4, "2024-01-01 07:00:00", "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "event_type")
    out = {
        r.user_id: (r.step1_us, r.step2_us, r.step3_us, r.depth)
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }

    s1, s2, s3, d1 = out[1]
    assert (s2 - s1, s3 - s2, d1) == (60_000_000, 180_000_000, 3)
    assert out[2][3] == 2 and out[2][2] is None
    assert out[3] == (None, None, None, 0)
    assert out[4] == (None, None, None, 0)


def test_funnel_repeated_step_types(spark):
    """An A→A funnel needs two DISTINCT events: the same event cannot
    satisfy both steps (each merge reads the previous state)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        funnel,
    )

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:01:00", "view"),
            (2, "2024-01-01 10:00:00", "view"),
        ],
        "user_id long, ts string, event_type string",
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "event_type")
    out = {
        r.user_id: r.depth
        for r in funnel(ev, ["view", "view"]).collect()
    }
    assert out == {1: 2, 2: 1}


def test_retention_cohorts_hand_values(spark):
    """Hand timeline across three ISO weeks: user 1 is active in its
    cohort week and two weeks later (skipping week 1), user 2 only in
    its own (later) cohort week; multiple events in one week count the
    user once."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        retention_cohorts,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),  # Mon wk0 (cohort 2024-01-01)
        (1, "2024-01-03 09:00:00"),  # same week — dedupes
        (1, "2024-01-15 12:00:00"),  # wk2
        (2, "2024-01-08 08:00:00"),  # cohort 2024-01-08
        (3, None),                    # null ts — dropped
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_retention_from_activity_dedups_raw_appends(spark):
    """weekly_activity_stream appends cross-batch duplicate
    (user, week) pairs by design; retention_from_activity must dedup
    them itself so a caller reading the sink RAW (no .distinct()) gets
    exact n_users, not append-count-inflated ones."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import (
        retention_from_activity,
    )

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:00:00"),  # duplicate append — must not inflate
        (1, "2024-01-08 00:00:00"),
        (2, "2024-01-08 00:00:00"),
        (2, "2024-01-08 00:00:00"),  # duplicate append
    ]
    act = spark.createDataFrame(rows, "user_id long, week string").select(
        "user_id", F.to_timestamp("week").alias("week")
    )
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in retention_from_activity(act).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_funnel_hot_user_million_events(spark):
    """The funnel's one per-key unbounded state is the per-user
    collect+array_sort+fold array (the same bound sessionization
    accepts). This pins the behavior at a 10^6-event single user —
    the pathological hot key a 100 TB event log will contain: the
    single-task array must build, sort, and fold without spilling or
    wrong answers. Events are generated JVM-side (range → pmod type,
    id-second timestamps descending by id parity trick avoided — ids
    map 1:1 to seconds so first-touch times are analytic): type
    cycles (purchase, click, view), so the first 'view' is id 2, the
    first 'click' strictly after it is id 4, the first 'purchase'
    strictly after that is id 6 — depth 3 with exactly computable
    step micros. If this single-key array ever becomes the limit,
    SCALING.md ("Funnel hot-user bound") documents the salted
    two-phase fallback: per-(user, day) partial folds merged by a
    second fold over the day-ordered partials."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import (
        funnel,
    )

    n = 1_000_000
    base_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
    ev = spark.range(0, n, 1, 8).select(
        F.lit(7).alias("user_id"),
        F.timestamp_micros(
            F.lit(base_us) + F.col("id") * F.lit(1_000_000)
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("purchase"), F.lit("click"), F.lit("view")),
            (F.col("id") % 3).cast("int") + 1,
        ).alias("event_type"),
    )
    rows = funnel(ev, ["view", "click", "purchase"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 7 and r.depth == 3
    assert r.step1_us == base_us + 2 * 1_000_000
    assert r.step2_us == base_us + 4 * 1_000_000
    assert r.step3_us == base_us + 6 * 1_000_000


def test_funnel_within_deadline_hand_values(spark):
    """The conversion-deadline funnel: the step-2 candidate OUTSIDE
    the window is skipped even though a later in-window one never
    comes (user 2), the first IN-window candidate anchors (user 1),
    and greedy first-touch means an early in-window click fixes the
    anchor even when a later click would have let the purchase
    convert (user 3 — depth 2, not 3: the standard first-touch
    reading)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import (
        funnel,
    )

    base = 1_704_067_200_000_000
    mins = 60 * 1_000_000

    def ev(u, m, y):
        return (u, m, y)

    rows = [
        # user 1: view@0, click@30min (in 1h window), purchase@80min
        # (in window of the click) -> depth 3
        ev(1, 0, "view"), ev(1, 30, "click"), ev(1, 80, "purchase"),
        # user 2: view@0, click@90min (outside the 1h window) -> depth 1
        ev(2, 0, "view"), ev(2, 90, "click"),
        # user 3: view@0, click@10min anchors (greedy), purchase@100min
        # is outside 10min+1h; the click@50min that WOULD have
        # converted is ignored -> depth 2
        ev(3, 0, "view"), ev(3, 10, "click"), ev(3, 50, "click"),
        ev(3, 100, "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, (base + m * mins) // 1_000_000, y) for u, m, y in rows],
        "user_id long, sec long, event_type string",
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"), "event_type")
    got = {
        r.user_id: (r.depth, r.step2_us, r.step3_us)
        for r in funnel(
            df, ["view", "click", "purchase"], within_seconds=3600
        ).collect()
    }
    assert got[1] == (3, base + 30 * mins, base + 80 * mins)
    assert got[2] == (1, None, None)
    assert got[3] == (2, base + 10 * mins, None)


def test_funnel_salted_exact_on_naive_partial_counterexample(spark):
    """The case the single-fresh-state-per-day partial gets WRONG
    (the pre-round-10 SCALING.md sketch): global step-1 anchor in an
    earlier day, and the critical day holds [click, view, click] — the
    true step-2 time is the day's FIRST click (the global anchor
    precedes the day), not the click after the day's own view. The
    entry-depth chain partial must return the first click."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import (
        funnel,
    )

    rows = [
        (1, "2024-01-01 09:00:00", "view"),
        (1, "2024-01-03 10:00:00", "click"),     # TRUE s2
        (1, "2024-01-03 11:00:00", "view"),
        (1, "2024-01-03 12:00:00", "click"),     # the naive partial's pick
        (1, "2024-01-04 08:00:00", "purchase"),
        (2, "2024-01-02 08:00:00", "click"),     # click before any view
        (2, "2024-01-05 09:00:00", "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "event_type")
    plain = sorted(
        map(tuple, funnel(ev, ["view", "click", "purchase"]).collect())
    )
    salted = sorted(
        map(
            tuple,
            funnel(ev, ["view", "click", "purchase"], salted=True).collect(),
        )
    )
    assert salted == plain
    u1 = next(r for r in salted if r[0] == 1)
    import datetime

    assert datetime.datetime.utcfromtimestamp(u1[2] / 1e6).hour == 10
    assert u1[4] == 3  # full depth


def test_funnel_salted_equals_plain_on_skewed_synth(spark):
    """salted ≡ plain on a synth corpus with the planted hot user
    (x10-shaped skew at in-test size): 200k events, ~3k users, user 0
    hot — the corpus family the x10/x100 gates run. Also pins the
    salted form's rejection of windowed funnels."""
    import pytest as _pytest

    from data_feature_extraction_and_retrieval_pipeline_spark import synth
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import (
        funnel,
    )

    ev = synth.synth_events(spark, 200_000, hot_frac=0.02).select(
        "user_id", "ts", "event_type"
    )
    ev = ev.persist()
    try:
        steps = ["view", "click", "purchase"]
        plain = sorted(map(tuple, funnel(ev, steps).collect()))
        salted = sorted(map(tuple, funnel(ev, steps, salted=True).collect()))
        assert salted == plain and len(plain) > 1000
        with _pytest.raises(ValueError, match="unwindowed"):
            funnel(ev, steps, within_seconds=3600, salted=True)
    finally:
        ev.unpersist()

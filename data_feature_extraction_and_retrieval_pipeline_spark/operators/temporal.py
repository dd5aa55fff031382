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


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
    salted: bool = False,
) -> DataFrame:
    """Ordered-step funnel analysis — for each user, the first time
    they completed step 1, the first step-2 event STRICTLY AFTER that,
    the first step-3 event strictly after step 2, and so on (the
    classic first-touch conversion funnel; absent from the reference
    like the other temporal operators, and a first-class need of any
    event pipeline feeding training data).

    Plan: ONE shuffle. The sequential dependency (step k's timestamp
    depends on step k−1's) rules out independent conditional
    aggregates in separate passes over the events table; instead each
    user's step-typed event times are collected once, one UNSORTED
    array per distinct step type (bounded by per-user activity, the
    same assumption sessionization makes), and the anchors are k
    chained conditional MINs over those arrays — s_i = array_min of
    the step-i times strictly after (and optionally within the window
    of) s_{i−1}. That is exactly what the SQL twin computes with k
    chained aggregates; repeated step types (A→A funnels) work
    because each step filters its own type's array against the
    PREVIOUS anchor. No sort and no per-event state struct — the
    conditional-MIN identity makes event order irrelevant.

    ``within_seconds`` adds a per-transition conversion deadline: step
    k must land strictly after step k−1 AND within the window of it
    (the "converted within an hour" funnel). Semantics stay
    FIRST-TOUCH GREEDY — each step anchors on the earliest qualifying
    event given the previous anchor; a user who would only convert by
    skipping an early qualifying event does not count (the standard
    product-analytics reading, and the only one a single
    left-to-right fold — or the SQL twin's chained conditional MINs —
    computes).

    Rows with NULL ts/type are dropped up front (they can anchor no
    step). Output: (user, step{i}_us exact unix-microsecond longs —
    the win_lag_delta display discipline — and depth 0..k).

    ``salted=True`` switches to the two-phase skew fallback for keys
    that outgrow the single-task array (≫10⁷ events — a bot, not a
    user): phase 1 groups by (user, day) and reduces each day to a
    BOUNDED partial — for every possible entry depth e, the day's
    within-day continuation chain (k(k+1)/2 longs, all chained
    conditional MINs); phase 2 folds the day-ordered partials per
    user, selecting each day's chain by the depth accumulated so far.
    Exact by construction (see _funnel_salted — the naive single
    fresh-state partial is NOT exact; pytest pins salted ≡ plain on
    the synth hot-user corpora). Two exchanges instead of one; state
    bounded by events/day (phase 1) and days/user (phase 2).
    Unwindowed funnels only — the deadline bound depends on the
    previous anchor's value, which bounded day partials cannot carry.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    k = len(steps)
    win_us = (
        int(within_seconds) * 1_000_000
        if within_seconds is not None
        else None
    )
    ev = events.filter(
        F.col(ts_col).isNotNull() & F.col(type_col).isNotNull()
    )
    if salted:
        if win_us is not None:
            raise ValueError(
                "salted=True supports only unwindowed funnels: the "
                "conversion-deadline bound depends on the previous "
                "anchor's VALUE, so bounded per-day partials cannot "
                "answer it exactly"
            )
        return _funnel_salted(ev, steps, user_col, ts_col, type_col)
    # Only step-typed events can anchor anything — collect ONE array
    # of event times per DISTINCT step type (collect_list skips the
    # when()-nulls, and its partial combines map-side, so non-step
    # events never reach the wire — at 100 TB with a wide event
    # vocabulary that is most of the volume). NOT a pre-shuffle row
    # filter: a user whose events are ALL non-step types must still
    # emit a depth-0 row (the oracle groups over every non-null
    # event; a hypothesis counterexample caught the row-filter form
    # dropping those users, round 10).
    uniq = list(dict.fromkeys(steps))
    t_us = F.unix_micros(F.col(ts_col))
    per_user = ev.groupBy(F.col(user_col)).agg(
        *[
            F.collect_list(F.when(F.col(type_col) == ty, t_us)).alias(
                f"__a{j}"
            )
            for j, ty in enumerate(uniq)
        ]
    )
    arr_of = {ty: f"__a{j}" for j, ty in enumerate(uniq)}

    # Chained conditional MINs — literally the SQL twin's shape:
    # s1 = MIN(t | type=step1); s_i = MIN(t | type=step_i, t > s_{i-1}
    # [, t <= s_{i-1} + win]) — evaluated per user over the collected
    # per-type arrays (array_min over filter; empty → NULL, and a
    # NULL anchor cascades because `t > NULL` filters everything, so
    # depth still counts consecutive completions). Same first-touch
    # greedy semantics as the sorted-array left fold this replaces
    # (the fold's "first step-k event after s_{k-1}" IS the
    # conditional MIN), but with no array_sort and no per-element
    # struct allocation. Each s_i is materialized as a projection
    # column so the next step's lambda captures a bound attribute,
    # never a re-evaluated subtree.
    def _after(p: Column):
        return lambda t: t > p

    def _within(p: Column):
        return lambda t: (t > p) & (t <= p + F.lit(win_us))

    cur = per_user
    for i, st in enumerate(steps):
        arr = F.col(arr_of[st])
        if i == 0:
            expr = F.array_min(arr)
        else:
            prev = F.col(f"__s{i - 1}")
            pred = _within(prev) if win_us is not None else _after(prev)
            expr = F.array_min(F.filter(arr, pred))
        cur = cur.withColumn(f"__s{i}", expr)
    depth = F.lit(0)
    for i in range(k):
        depth = F.when(
            F.col(f"__s{i}").isNotNull(), F.lit(i + 1)
        ).otherwise(depth)
    return cur.select(
        F.col(user_col),
        *[F.col(f"__s{i}").alias(f"step{i + 1}_us") for i in range(k)],
        depth.cast("int").alias("depth"),
    )


def _funnel_salted(
    ev: DataFrame,
    steps: list[str],
    user_col: str,
    ts_col: str,
    type_col: str,
) -> DataFrame:
    """The exact two-phase (user, day)-salted funnel.

    Why the obvious partial is WRONG: reducing each day to its own
    fresh-state funnel chain and replaying those candidates loses
    pairs where the GLOBAL anchor precedes the day but the day's own
    chain anchors later — e.g. day events [click@10, view@11,
    click@12] with the global first view in an earlier day: the true
    step-2 time is click@10, but the day's fresh chain anchors on
    view@11 and offers click@12. (This was the shape SCALING.md
    documented before round 10 — the gap surfaced while turning it
    into code.)

    The exact bounded partial: for EVERY possible entry depth e
    (steps 1..e completed before the day — their anchors therefore
    precede every event of the day, so step e+1 anchors on the day's
    UNCONDITIONAL first step-(e+1) event), precompute the within-day
    continuation chain

        v(e, e)   = min(t | type = steps[e])
        v(e, j)   = min(t | type = steps[j], t > v(e, j-1))   j > e

    — k(k+1)/2 chained conditional MINs, each a pure-Catalyst
    array_min over the day's per-step times. Phase 2 sorts each
    user's day partials by day and folds left-to-right: the depth
    accumulated BEFORE a day selects which chain fills the remaining
    steps (all of one day's fills come from that single chain, whose
    internal t > v(...) conditions carry within-day strictness;
    cross-day strictness is free because a prior-day anchor is
    strictly below the day's midnight).
    """
    k = len(steps)
    t = F.unix_micros(F.col(ts_col))
    aggs = []
    for i in range(k):
        aggs.append(
            F.min(F.when(F.col(type_col) == steps[i], t)).alias(f"__m{i}")
        )
        if i >= 1:
            # collect_list skips the non-matching (null) rows — the
            # array holds ONLY this step type's times within the day
            aggs.append(
                F.collect_list(
                    F.when(F.col(type_col) == steps[i], t)
                ).alias(f"__a{i}")
            )
    g = ev.groupBy(
        F.col(user_col), F.to_date(F.col(ts_col)).alias("__day")
    ).agg(*aggs)

    def _after(prev):
        # closure factory: HOF lambda arity is read from the Python
        # signature, so no default-arg capture
        return lambda x: x > prev

    # Chain values by DIAGONAL level: v(e, j) needs v(e, j-1), and the
    # former inline chaining re-embedded each previous chain's whole
    # array_min(filter(...)) tree into the next (O(k²) duplicated HOF
    # evaluations per (user, day) row — the r13 multiplied-expression
    # pathology). Level d projects every c_{e,j} with j-e = d off the
    # PREVIOUS level's named column, so each chain value is evaluated
    # exactly once; CollapseProject keeps the levels apart because
    # each chain column is referenced by both the next level and the
    # final day struct. Values identical.
    cur = g
    for d in range(1, k):
        adds = []
        for e in range(k - d):
            j = e + d
            prev = (
                F.col(f"__m{e}") if d == 1 else F.col(f"__c{e}_{j - 1}")
            )
            adds.append(
                F.array_min(
                    F.filter(F.col(f"__a{j}"), _after(prev))
                ).alias(f"__c{e}_{j}")
            )
        cur = cur.select("*", *adds)
    chain_fields = []
    for e in range(k):
        chain_fields.append(F.col(f"__m{e}").alias(f"c{e}_{e}"))
        for j in range(e + 1, k):
            chain_fields.append(F.col(f"__c{e}_{j}").alias(f"c{e}_{j}"))
    # __day first: array_sort on structs orders by leading field
    day_struct = F.struct(F.col("__day"), *chain_fields)
    per_user = cur.groupBy(F.col(user_col)).agg(
        F.array_sort(F.collect_list(day_struct)).alias("__days")
    )

    init = F.struct(
        *[F.lit(None).cast("long").alias(f"s{i}") for i in range(k)]
    )

    def _merge(acc, d):
        # fills are prefix-monotone (v(e, j) needs v(e, j-1)), so the
        # accumulated depth is the count of non-null anchors
        e_expr = F.lit(0)
        for i in range(k):
            e_expr = e_expr + acc[f"s{i}"].isNotNull().cast("int")
        fields = []
        for j in range(k):
            cand = F.lit(None).cast("long")
            for e in range(j + 1):
                cand = F.when(e_expr == e, d[f"c{e}_{j}"]).otherwise(cand)
            fields.append(F.coalesce(acc[f"s{j}"], cand).alias(f"s{j}"))
        return F.struct(*fields)

    walked = per_user.select(
        F.col(user_col),
        F.aggregate(F.col("__days"), init, _merge).alias("__w"),
    )
    depth = F.lit(0)
    for i in range(k):
        depth = F.when(
            F.col("__w")[f"s{i}"].isNotNull(), F.lit(i + 1)
        ).otherwise(depth)
    return walked.select(
        F.col(user_col),
        *[
            F.col("__w")[f"s{i}"].alias(f"step{i + 1}_us")
            for i in range(k)
        ],
        depth.cast("int").alias("depth"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohorts — the classic activity triangle: each
    user joins the cohort of their FIRST active ISO week, and the
    report counts how many of each cohort were active again k weeks
    later. The conversion funnel's sibling (how many came back, not
    how far they got); absent from the reference like the rest of the
    temporal family.

    Exactness: weeks come from ``date_trunc('week')`` (ISO Monday on
    both engines), the offset is a CALENDAR day count between the two
    Monday DATEs divided by 7 (always an exact multiple — a
    fixed-microsecond week constant would drift in a DST session
    timezone, where Monday-midnight deltas are not exact week
    multiples and Spark's truncating double→int cast silently
    off-by-ones), and the counts are distinct-by-construction (the
    per-user week set is deduplicated before counting, so COUNT(*)
    per cell IS the distinct-user count).

    Plan: dedupe (user, week) [shuffle 1, map-side combined], derive
    each user's cohort as a MIN over the deduped rows [reuses the
    same user partitioning], broadcast-free self-join on user_col,
    one final (cohort, offset) aggregate [shuffle 2]. NULL user/ts
    rows are dropped up front.

    Output: (cohort_week 'yyyy-MM-dd', week_offset int, n_users).
    """
    ev = events.filter(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    )
    act = ev.select(
        F.col(user_col),
        F.date_trunc("week", F.col(ts_col)).alias("week"),
    )
    # retention_from_activity dedups internally — no distinct here
    # (Catalyst's RemoveRedundantAggregates would drop a second one,
    # but there is no reason to emit it)
    return retention_from_activity(act, user_col=user_col)


def retention_from_activity(
    activity: DataFrame,
    user_col: str = "user_id",
    week_col: str = "week",
) -> DataFrame:
    """The cohort triangle over an ALREADY-MAINTAINED weekly-activity
    table — the steady-state serving shape at 100 TB: the deduped
    (user, week) set is the small incremental artifact (one row per
    active user-week; streaming/ingest.py::weekly_activity_stream
    maintains it), and this report never rescans raw events. Same
    exactness contract as :func:`retention_cohorts` (which delegates
    here).

    Duplicate (user, week) rows are deduped HERE, not by precondition:
    weekly_activity_stream deliberately appends cross-batch duplicates
    (zero streaming state), so a caller reading the sink raw must not
    get inflated n_users. The distinct costs nothing extra — the
    groupBy shuffles on these keys anyway and the partial aggregate
    combines map-side."""
    act = activity.select(
        F.col(user_col), F.col(week_col).alias("week")
    ).distinct()
    cohort = act.groupBy(user_col).agg(F.min("week").alias("cohort_week"))
    joined = act.join(cohort, user_col)
    offset = F.floor(
        F.datediff(
            F.col("week").cast("date"), F.col("cohort_week").cast("date")
        )
        / F.lit(7)
    ).cast("int")
    return (
        joined.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            offset.alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )

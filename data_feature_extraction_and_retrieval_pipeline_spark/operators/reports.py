"""Analytics parity suite (SURVEY.md §7 M7): the reference's batch
analytics jobs (analyze_dataset_distribution.py,
visualize_segmented_tags.py) as one DataFrame report bundle — numbers
only, plotting stays out of engine scope (SURVEY.md §2.8 U7/U8).

Every entry is a lazy DataFrame; nothing is collected here. A caller
can compute all of them in one pass over each table since the
count-style members share one persisted aggregate
(``_grouped_value_counts`` — its docstring records why the sharing
must be an explicit persist over an explode-shaped plan rather than
relying on ReusedExchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import analytics


def _grouped_value_counts(
    df: DataFrame,
    specs: dict[str, "F.Column"],
    persist: bool = False,
    multi_specs: dict[str, "F.Column"] | None = None,
) -> dict[str, DataFrame]:
    """ONE corpus pass computing ``value_counts`` for several key
    expressions at once: each row explodes into one (member, keys)
    struct per spec (member ``i`` carries its own key expression,
    NULL-typed placeholders elsewhere) and a single groupBy counts
    them all — the table scan, the Generate, and the hash exchange are
    shared across every member, where separate groupBys would each
    re-scan the table. At 100 TB this is the difference between one
    pass over the corpus and one per report section.

    Formulation note: this was a GROUPING SETS + ``grouping_id()``
    aggregate through round 10. The explode form is plan-equivalent
    (same row amplification, same shuffle width) but — unlike the
    Expand node grouping sets compile to — it CANONICALIZES correctly
    under ``DeduplicateRelations``, so with ``persist=True`` every
    member branch of a consuming union substitutes the cached
    aggregate. Measured on the assembled dataset report at round 11:
    the grouping-sets form substituted ONE of six members (the other
    five re-scanned the corpus — 6 Expands / 11 parquet scans in the
    physical plan); the explode form substitutes all six.

    ``persist=True`` MATERIALIZES the aggregate (vocabulary-sized —
    one row per distinct key value across all specs) for exactly that
    multi-consumer sharing; tracked via caching.persist → the harness
    scope releases it after the report materializes.

    The member tag disambiguates a placeholder NULL from a REAL null
    key value, so null groups survive exactly as in a standalone
    groupBy. Returns one (key-named, count) frame per spec entry,
    unordered.

    ``multi_specs`` entries are ARRAY-valued members: each element of
    the array contributes one counted row for that member (the
    token-leaderboard shape — ``explode(split(text))`` → count). They
    ride the SAME scan, Generate, and exchange as the scalar members:
    the per-row struct array is ``concat(scalar structs,
    transform(arr, elem → struct))``, so a report that needs both
    per-column value counts AND a token count still reads the corpus
    exactly once. A NULL array contributes nothing (coalesced to
    empty), matching ``explode``'s null-dropping discipline.
    """
    names = list(specs) + list(multi_specs or {})
    # "__raw__" is a reserved output key (the un-split aggregate rides
    # under it for fused consumers) — a spec by that name would be
    # silently shadowed below
    assert "__raw__" not in names, "spec name '__raw__' is reserved"
    # NULL placeholders must carry each key's exact type or the struct
    # array won't unify — probe the analyzed types once at plan time
    key_types = {
        n: df.select(c.alias("__t")).schema[0].dataType
        for n, c in specs.items()
    }
    multi_arr_types = {
        n: df.select(c.alias("__t")).schema[0].dataType
        for n, c in (multi_specs or {}).items()
    }
    for n, t in multi_arr_types.items():
        key_types[n] = t.elementType
    def _fields(i: int, n: str, key: "F.Column") -> list:
        return [F.lit(i).alias("__m")] + [
            (key if n2 == n else F.lit(None).cast(key_types[n2])).alias(
                f"__k_{n2}"
            )
            for n2 in names
        ]
    structs = []
    for i, n in enumerate(specs):
        structs.append(F.struct(*_fields(i, n, specs[n])))
    member_arrays = [F.array(*structs)] if structs else []
    def _elem_struct(i: int, n: str):
        # single-parameter lambda: F.transform passes (elem, idx) to
        # any callable with >1 positional parameter, so the member tag
        # must come in via closure, not defaulted parameters
        return lambda v: F.struct(*_fields(i, n, v))

    for i, n in enumerate(multi_specs or {}, start=len(specs)):
        arr = F.coalesce(
            multi_specs[n],
            F.array().cast(multi_arr_types[n].simpleString()),
        )
        member_arrays.append(F.transform(arr, _elem_struct(i, n)))
    kcols = [f"__k_{n}" for n in names]
    agg = (
        df.select(F.explode(F.concat(*member_arrays)).alias("__mk"))
        .select("__mk.*")
        .groupBy("__m", *kcols)
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if persist:
        from .. import caching

        # The aggregate is vocabulary-sized; shrink the persisted copy
        # so every downstream consumer stage is a handful of tasks
        # instead of one per shuffle partition. SHRINK WITH A
        # REPARTITION, NOT coalesce: coalesce folds into the
        # post-shuffle stage, so coalesce(8) would run the final
        # HashAggregate itself at parallelism 8 — and the token member
        # can make that merge genuinely large at 100 TB. The
        # round-robin exchange below moves only the ALREADY-AGGREGATED
        # vocab-sized rows, so the aggregate keeps full shuffle-side
        # parallelism and only the persisted copy is narrow.
        agg = caching.persist(agg.repartition(8))
    out = {}
    for i, n in enumerate(names):
        out[n] = agg.filter(F.col("__m") == F.lit(i)).select(
            F.col(f"__k_{n}").alias(n), F.col("count")
        )
    out["__raw__"] = agg
    return out


def _doc_count_specs() -> dict[str, "F.Column"]:
    """The count-style document sections' key expressions — shared by
    the dict-form report and the fused long-form assembly so the two
    cannot drift (their equivalence is additionally pinned in
    tests/test_reports.py)."""
    return {
        "source": F.col("source"),
        "lang": F.col("lang"),
        "bin": (
            F.floor((F.col("n_chars") - F.lit(0.0)) / F.lit(50.0))
            * F.lit(50.0)
            + F.lit(0.0)
        ).cast("double"),
        "has_long_text": (F.col("n_chars") >= 100),
    }


def _doc_multi_specs() -> dict[str, "F.Column"]:
    return {"token": F.split(F.lower("text"), r"\s+")}


def _ev_count_specs() -> dict[str, "F.Column"]:
    return {"event_type": F.col("event_type"), "user": F.col("user_id")}


def dataset_report(
    documents: DataFrame,
    events: DataFrame,
    embeddings: DataFrame,
    ordered: bool = True,
) -> dict[str, DataFrame]:
    """The analyze_dataset_distribution.py report set, over the
    engine's tables:

    - per-source / per-lang frequency counts (A1);
    - token leaderboard (A2 explode-then-count, top 30);
    - length histogram (A7, 50-char bins) + decade-style bins;
    - distinct counters (A8);
    - coverage split — docs with/without short text (A10 analogue of
      the has-coords split);
    - per-group length stats (A6);
    - per-label embedding counts + mean vector norm (segment-corpus
      stats, visualize_segmented_tags.py:98-102 analogue).
    """
    # The four count-style document sections share ONE exploded
    # counting pass (scan + Generate + exchange computed once, then
    # persisted — see _grouped_value_counts); each member is
    # value-identical to its standalone analytics twin (pytest pins
    # this). The bin expression
    # mirrors analytics.histogram(bin_width=50, min_value=0) exactly;
    # a NULL n_chars yields a NULL bin, dropped below just as the
    # standalone histogram's pre-filter drops the row.
    shared = _grouped_value_counts(
        documents,
        _doc_count_specs(),
        # seven report members consume this aggregate; persist it so
        # the corpus is scanned once for all of them (see the
        # function's docstring — union branches do NOT exchange-reuse)
        persist=True,
        # the token leaderboard rides the same scan/Generate/exchange
        # as the scalar counts (array-valued member): the corpus is
        # read ONCE for every count-style section of the report
        multi_specs=_doc_multi_specs(),
    )
    src = shared["source"]
    lng = shared["lang"]
    hist = shared["bin"].filter(F.col("bin").isNotNull())
    if ordered:
        src = src.orderBy(F.desc("count"), F.col("source"))
        lng = lng.orderBy(F.desc("count"), F.col("lang"))
        hist = hist.orderBy("bin")

    # ONE events pass for both event sections: value counts by type,
    # and the per-user frequency member whose (user, count) rows
    # re-aggregate EXACTLY into the per-user stats (n_users = member
    # rows incl. a null-user group, mean = Σcount/n — the same long
    # arithmetic avg() performs), so the events table is scanned once.
    shared_events = _grouped_value_counts(
        events,
        _ev_count_specs(),
        persist=True,
    )
    ev_counts = shared_events["event_type"]
    if ordered:
        ev_counts = ev_counts.orderBy(F.desc("count"), F.col("event_type"))

    return {
        "source_counts": src,
        "lang_counts": lng,
        "token_leaderboard": (
            shared["token"]
            .filter(F.length("token") > 0)
            .select(F.col("token").alias("value"), "count")
            .orderBy(F.desc("count"), F.col("value"))
            .limit(30)
        ),
        "length_histogram": hist,
        "length_stats_by_lang": analytics.group_stats(
            documents, "lang", "n_chars", ordered=ordered
        ),
        # Re-aggregates of the SHARED grouping-sets members — no extra
        # corpus scan and no multi-countDistinct Expand: each distinct
        # non-null value is one member group row (count(key) skips the
        # null group, exactly countDistinct's null discipline), and
        # every document lands in exactly one source group (null
        # included), so n_docs = Σ member counts.
        "distinct_counters": (
            shared["source"]
            .agg(
                F.count("source").alias("n_sources"),
                # sum over zero member rows is NULL — coalesce keeps
                # the empty-documents contract at n_docs = 0
                F.coalesce(
                    F.sum("count"), F.lit(0).cast("long")
                ).alias("n_docs"),
            )
            .crossJoin(
                F.broadcast(
                    shared["lang"].agg(F.count("lang").alias("n_langs"))
                )
            )
            .select("n_sources", "n_langs", "n_docs")
        ),
        "coverage_split": shared["has_long_text"],
        "event_type_counts": ev_counts,
        "events_per_user_stats": (
            shared_events["user"].agg(
                F.count(F.lit(1)).alias("n_users"),
                F.avg("count").alias("mean_events"),
                F.min("count").alias("min_events"),
                F.max("count").alias("max_events"),
            )
        ),
        "label_vector_stats": _label_vector_stats(embeddings, ordered=True),
    }


def _label_vector_stats(embeddings: DataFrame, ordered: bool) -> DataFrame:
    from ..functions import vectors as V

    out = embeddings.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.avg(V.l2_norm(F.col("embedding"))).alias("mean_norm"),
    )
    return out.orderBy("label") if ordered else out


# ---------------------------------------------------------------------------
# Long-format report assembly — every member flattened to one
# (section, key, value) frame so the WHOLE bundle is a single
# DataFrame (and therefore a single driver-certifiable query). Each
# member stays an independent aggregate job over the shared scans;
# at 100 TB run them against a persisted projection of the few
# report columns, not the raw table.
# ---------------------------------------------------------------------------


def _kv(df: DataFrame, section: str, key: F.Column, value: F.Column) -> DataFrame:
    """One report member → (section, key, value DOUBLE) rows."""
    return df.select(
        F.lit(section).alias("section"),
        key.cast("string").alias("key"),
        F.round(value.cast("double"), 6).alias("value"),
    )


def _unpivot(
    df: DataFrame, section: str, metrics: list[str], key_prefix: F.Column | None = None
) -> DataFrame:
    """Unpivot metric columns of a stats frame into (section, key,
    value) rows; key = ``<prefix>:<metric>`` (or bare metric for a
    single-row summary frame)."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"), F.col(m).cast("double").alias("v")
                )
                for m in metrics
            ]
        )
    ).alias("p")
    if key_prefix is None:
        out = df.select(pairs).select(
            F.lit(section).alias("section"),
            F.col("p.m").alias("key"),
            F.round("p.v", 6).alias("value"),
        )
    else:
        out = df.select(key_prefix.alias("kp"), pairs).select(
            F.lit(section).alias("section"),
            F.concat(F.col("kp"), F.lit(":"), F.col("p.m")).alias("key"),
            F.round("p.v", 6).alias("value"),
        )
    return out


def dataset_report_long(
    documents: DataFrame, events: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """The full `dataset_report` bundle as ONE long frame — the
    driver-certifiable form (analyze_dataset_distribution.py's report
    set emitted as section/key/value rows). NULL group keys are made
    explicit ('<null>') so the key column never drops rows on a join
    or concat (NULL-identity discipline)."""
    # Fused assembly (round 12): the four count-style document
    # sections are ONE map-only projection over the persisted counting
    # aggregate — not four filter branches — and the two event
    # sections likewise read one persisted events pass. The union
    # drops from 10 branches (each its own AQE stage materialization
    # round-trip) to 6, and the only exchanges left are the two
    # counting shuffles, three tiny aggregates (counters, per-user
    # stats, per-lang stats), and the token TakeOrdered. Values are
    # pinned identical to the member-by-member reference assembly
    # (tests/test_reports.py::test_dataset_report_long_fused_matches_reference).
    shared = _grouped_value_counts(
        documents,
        _doc_count_specs(),
        persist=True,
        multi_specs=_doc_multi_specs(),
    )
    shared_events = _grouped_value_counts(events, _ev_count_specs(), persist=True)
    raw, raw_ev = shared["__raw__"], shared_events["__raw__"]
    nn = lambda c: F.coalesce(c, F.lit("<null>"))  # noqa: E731

    # member indices follow _grouped_value_counts' spec order:
    # 0=source, 1=lang, 2=bin, 3=has_long_text, 4=token (multi)
    m = F.col("__m")
    section = (
        F.when(m == 0, F.lit("source_counts"))
        .when(m == 1, F.lit("lang_counts"))
        .when(m == 2, F.lit("length_histogram"))
        .otherwise(F.lit("coverage_split"))
    )
    key = (
        F.when(m == 0, nn(F.col("__k_source")))
        .when(m == 1, nn(F.col("__k_lang")))
        .when(m == 2, F.col("__k_bin").cast("long").cast("string"))
        .otherwise(
            F.when(F.col("__k_has_long_text"), F.lit("long")).otherwise(
                F.lit("short")
            )
        )
    )
    fused_counts = raw.filter(
        (m <= 3) & ~((m == 2) & F.col("__k_bin").isNull())
    ).select(
        section.alias("section"),
        key.alias("key"),
        F.round(F.col("count").cast("double"), 6).alias("value"),
    )
    token_top = (
        raw.filter((m == 4) & (F.length("__k_token") > 0))
        .select(F.col("__k_token").alias("value"), "count")
        .orderBy(F.desc("count"), F.col("value"))
        .limit(30)
    )
    # all three distinct counters from ONE aggregate over the counting
    # pass (count(key) skips the null group — countDistinct's null
    # discipline; n_docs = Σ member-0 counts, coalesced for the
    # empty-documents contract)
    counters = raw.agg(
        F.count(
            F.when((m == 0) & F.col("__k_source").isNotNull(), F.lit(1))
        ).alias("n_sources"),
        F.count(
            F.when((m == 1) & F.col("__k_lang").isNotNull(), F.lit(1))
        ).alias("n_langs"),
        F.coalesce(
            F.sum(F.when(m == 0, F.col("count"))), F.lit(0).cast("long")
        ).alias("n_docs"),
    )
    ev_counts_part = raw_ev.filter(F.col("__m") == 0).select(
        F.lit("event_type_counts").alias("section"),
        nn(F.col("__k_event_type")).alias("key"),
        F.round(F.col("count").cast("double"), 6).alias("value"),
    )
    user_stats = raw_ev.filter(F.col("__m") == 1).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg("count").alias("mean_events"),
        F.min("count").alias("min_events"),
        F.max("count").alias("max_events"),
    )
    parts = [
        fused_counts,
        _kv(token_top, "token_leaderboard", F.col("value"), F.col("count")),
        _unpivot(
            analytics.group_stats(documents, "lang", "n_chars", ordered=False),
            "length_stats_by_lang",
            ["n", "mean", "median", "min", "max"],
            key_prefix=nn(F.col("lang")),
        ),
        _unpivot(
            counters, "distinct_counters", ["n_sources", "n_langs", "n_docs"]
        ),
        ev_counts_part,
        _unpivot(
            user_stats,
            "events_per_user_stats",
            ["n_users", "mean_events", "min_events", "max_events"],
        ),
        _unpivot(
            _label_vector_stats(embeddings, ordered=False),
            "label_vector_stats",
            ["n_vectors", "mean_norm"],
            key_prefix=F.concat(F.lit("label_"), F.col("label").cast("string")),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _dataset_report_long_reference(
    documents: DataFrame, events: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """Member-by-member assembly of the SAME long frame from fully
    STANDALONE formulations — one independent groupBy per section,
    no shared counting pass, no persist. Kept as the equivalence
    reference for the fused plan (pinned in tests/test_reports.py);
    not used on any serving path.

    Deliberately does NOT call ``dataset_report``: the dict-form
    report now sources its members from the same shared counting
    passes as the fused assembly, so building the reference from it
    would let a systematic bug in the shared pass appear identically
    on both sides of the equivalence test (ADVICE r12). Every section
    here is its own plan over the raw table."""
    nn = lambda c: F.coalesce(F.col(c), F.lit("<null>"))  # noqa: E731
    token_top = (
        documents.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("value")
        )
        .filter(F.length("value") > 0)
        .groupBy("value")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.col("value"))
        .limit(30)
    )
    counters = documents.agg(
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    coverage = documents.groupBy(
        (F.col("n_chars") >= 100).alias("has_long_text")
    ).agg(F.count("*").alias("count"))
    user_stats = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("count"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.avg("count").alias("mean_events"),
            F.min("count").alias("min_events"),
            F.max("count").alias("max_events"),
        )
    )
    parts = [
        _kv(
            analytics.value_counts(documents, "source", ordered=False),
            "source_counts", nn("source"), F.col("count"),
        ),
        _kv(
            analytics.value_counts(documents, "lang", ordered=False),
            "lang_counts", nn("lang"), F.col("count"),
        ),
        _kv(token_top, "token_leaderboard", F.col("value"), F.col("count")),
        _kv(
            analytics.histogram(
                documents, "n_chars", 50.0, 0.0, ordered=False
            ),
            "length_histogram",
            F.col("bin").cast("long").cast("string"),
            F.col("count"),
        ),
        _unpivot(
            analytics.group_stats(documents, "lang", "n_chars", ordered=False),
            "length_stats_by_lang",
            ["n", "mean", "median", "min", "max"],
            key_prefix=nn("lang"),
        ),
        _unpivot(counters, "distinct_counters", ["n_sources", "n_langs", "n_docs"]),
        _kv(
            coverage,
            "coverage_split",
            F.when(F.col("has_long_text"), F.lit("long")).otherwise(F.lit("short")),
            F.col("count"),
        ),
        _kv(
            analytics.value_counts(events, "event_type", ordered=False),
            "event_type_counts", nn("event_type"), F.col("count"),
        ),
        _unpivot(
            user_stats,
            "events_per_user_stats",
            ["n_users", "mean_events", "min_events", "max_events"],
        ),
        _unpivot(
            _label_vector_stats(embeddings, ordered=False),
            "label_vector_stats",
            ["n_vectors", "mean_norm"],
            key_prefix=F.concat(F.lit("label_"), F.col("label").cast("string")),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def segment_stats_long(segments: DataFrame, tag_counts: DataFrame) -> DataFrame:
    """Segment-corpus statistics (visualize_segmented_tags.py:266-277,
    SAM/test_sam_inference.py:151-155): segments-per-image histogram +
    summary, and the tags-per-item histogram over a per-item tag-count
    frame (``item_id``, ``n_tags`` — zero-tag items included, the
    ``len([]) == 0`` bucket the reference's value_counts reports).

    ``segments``: (filename, segment_area, ...) one row per segment.
    """
    from .. import caching

    # ONE pass over the segment corpus (the UDTF fan-out / expensive
    # scan): per-image partials carry everything the three segment
    # sections need — n_segments for the histogram and summary,
    # sum/min/max area so the global area stats re-aggregate from the
    # partials (mean = Σsum/Σn, min = min(min), max = max(max)).
    # Without this the union re-executes the segment source once per
    # branch (seen in PLANS.md: three MapInPandas subtrees). The
    # partials frame is persisted through the tracked ledger because
    # three union branches consume it; same for the per-item tag
    # counts (two consumers).
    per_image = caching.persist(
        segments.groupBy("filename").agg(
            F.count("*").alias("n_segments"),
            F.sum("segment_area").alias("sum_area"),
            F.min("segment_area").alias("min_area"),
            F.max("segment_area").alias("max_area"),
        )
    )
    tag_counts = caching.persist(tag_counts)
    parts = [
        _kv(
            per_image.groupBy("n_segments").agg(F.count("*").alias("n_images")),
            "segments_per_image",
            F.col("n_segments").cast("string"),
            F.col("n_images"),
        ),
        _unpivot(
            per_image.agg(
                F.count("*").cast("double").alias("n_images"),
                F.sum("n_segments").cast("double").alias("n_segments"),
                F.avg("n_segments").alias("avg_segments_per_image"),
            ),
            "segment_summary",
            ["n_images", "n_segments", "avg_segments_per_image"],
        ),
        _unpivot(
            per_image.agg(
                (F.sum("sum_area") / F.sum("n_segments")).alias("mean_area"),
                F.min("min_area").cast("double").alias("min_area"),
                F.max("max_area").cast("double").alias("max_area"),
            ),
            "area_summary",
            ["mean_area", "min_area", "max_area"],
        ),
        _kv(
            tag_counts.groupBy("n_tags").agg(F.count("*").alias("n_items")),
            "tags_per_item",
            F.col("n_tags").cast("string"),
            F.col("n_items"),
        ),
        _unpivot(
            tag_counts.agg(
                F.count("*").cast("double").alias("n_items"),
                F.avg("n_tags").alias("avg_tags_per_item"),
            ),
            "tag_summary",
            ["n_items", "avg_tags_per_item"],
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def constraint_report(
    df: DataFrame,
    not_null: tuple[str, ...] = (),
    unique: tuple[str, ...] = (),
    bounds: dict[str, tuple[float, float]] | None = None,
    values_in: dict[str, tuple[str, ...]] | None = None,
    min_rows: int | None = None,
) -> DataFrame:
    """Declarative data-quality gate — the validation pass a training
    pipeline runs before accepting a corpus for a run (the Deequ /
    expectations shape): every constraint compiles to an aggregate
    expression, ALL evaluated in ONE pass over the table, and the
    result is a long frame ``(check_name, metric, passed)`` a CI gate
    can assert on. Metrics are exact integers (violation counts,
    observed min/max), so the report is engine-exact.

    NULL semantics, explicitly: ``unique`` certifies the NON-NULL
    values are pairwise distinct — its metric is the exact duplicate
    count among non-null rows (``count(c) − count(distinct c)``, both
    of which ignore NULLs), so NULLs are neither duplicates nor
    violations here. A column that must be both present and unique
    (a key) lists in BOTH ``not_null`` and ``unique``; the two
    metrics then separate "how many missing" from "how many repeated"
    instead of conflating them.

    Scale shape: the null/bounds/membership checks are plain
    map-side-combined aggregates (one 1-row exchange regardless of
    table size); each ``unique`` column adds a count(distinct) —
    Spark plans the distincts via Expand, still one job. At 100 TB
    this is exactly one scan of the table per gate invocation.
    """
    bounds = bounds or {}
    values_in = values_in or {}
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in not_null:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
    for c in unique:
        # count(c) and count(distinct c) both skip NULLs, so the
        # difference is the exact duplicate count among non-null rows
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
    for c, (lo, hi) in bounds.items():
        aggs.append(
            F.sum(
                (
                    F.col(c).isNull()
                    | (F.col(c) < F.lit(lo))
                    | (F.col(c) > F.lit(hi))
                ).cast("long")
            ).alias(f"__oob_{c}")
        )
    for c, allowed in values_in.items():
        cond = ~F.col(c).isin(*[str(v) for v in allowed]) | F.col(c).isNull()
        aggs.append(F.sum(cond.cast("long")).alias(f"__bad_{c}"))

    one = df.agg(*aggs)

    rows = []
    if min_rows is not None:
        rows.append(
            F.struct(
                F.lit(f"row_count_min({min_rows})").alias("check_name"),
                F.col("__rows").cast("long").alias("metric"),
                (F.col("__rows") >= F.lit(int(min_rows))).alias("passed"),
            )
        )
    for c in not_null:
        rows.append(
            F.struct(
                F.lit(f"not_null({c})").alias("check_name"),
                F.col(f"__nulls_{c}").cast("long").alias("metric"),
                (F.col(f"__nulls_{c}") == 0).alias("passed"),
            )
        )
    for c in unique:
        dups = F.col(f"__nn_{c}") - F.col(f"__dist_{c}")
        rows.append(
            F.struct(
                F.lit(f"unique({c})").alias("check_name"),
                dups.cast("long").alias("metric"),
                (dups == 0).alias("passed"),
            )
        )
    for c, (lo, hi) in bounds.items():
        rows.append(
            F.struct(
                F.lit(f"bounds({c},[{lo},{hi}])").alias("check_name"),
                F.col(f"__oob_{c}").cast("long").alias("metric"),
                (F.col(f"__oob_{c}") == 0).alias("passed"),
            )
        )
    for c, allowed in values_in.items():
        rows.append(
            F.struct(
                F.lit(f"values_in({c})").alias("check_name"),
                F.col(f"__bad_{c}").cast("long").alias("metric"),
                (F.col(f"__bad_{c}") == 0).alias("passed"),
            )
        )
    if not rows:
        raise ValueError("constraint_report needs at least one constraint")
    return one.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.check_name", "r.metric", "r.passed")


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    cat_cols: tuple[str, ...] = (),
    bucket_col: str | None = None,
    bucket_width: int = 50,
) -> DataFrame:
    """Corpus drift detection between two snapshots — "does today's
    ingest look like yesterday's?", the monitoring sibling of
    :func:`constraint_report`. Compares the categorical composition
    (per value) and a bucketed numeric histogram between a reference
    corpus and a current one.

    Engine-exact by construction: ``ref_n``/``cur_n`` are exact
    BIGINTs and shares are never divided out — the per-key drift term
    is the cross-multiplied numerator ``|ref_n·M − cur_n·N|`` (N, M =
    snapshot row counts), i.e. the L1 distance scaled by N·M, so two
    engines can never disagree on a rounded float (the win_lag_delta
    lesson applied at design time). The cross-multiplication runs in
    DECIMAL — long·long silently wraps past 2^63 with ANSI off, and
    per-key counts near 1e10 against a 1e9-row snapshot are exactly
    the regime this report targets — so the numerator is computed in
    DECIMAL(38,0): exact for snapshots up to 1e18 rows each
    (DECIMAL(18,0) operands ⇒ a 37-digit product), and past even that
    Spark raises under ANSI instead of wrapping. The SURFACE type of
    ``drift_num`` is a plain-digit STRING (round 8): the arithmetic
    stays exact decimal, but different engines/clients render Decimal
    values through different wire types (the r7 driver hashed
    Spark-Decimal vs DuckDB-decimal differently even though the
    digits agreed), and digits-as-text is the one canonical
    representation every consumer agrees on. A per-section TOTAL row
    carries the summed numerator; the monitor alarms on
    ``drift_num / (N·M)`` driver-side if it wants the [0,2] L1
    (``int(drift_num)`` — the string is always a bare integer).

    Scale shape: ONE value-counts aggregate per side for ALL sections
    — each row explodes a literal array of (section, key) structs
    (map-only) and a single (section, key) groupBy counts every
    section in one pass, so adding sections adds zero scans and zero
    exchanges (categorical domains and histograms are Heaps/bounded-
    small, so the aggregated frames are tiny). One full-outer join on
    the tiny count frames; the snapshot row counts N and M ride as
    PER-SECTION window sums over the joined rows (every snapshot row
    lands in exactly one key per section, so each section's sums
    equal the snapshot counts) — no count-star scan, no totals
    branch, no broadcast build.
    """
    key_structs = []
    for c in cat_cols:
        key_structs.append(
            F.struct(
                F.lit(f"cat:{c}").alias("section"),
                F.col(c).cast("string").alias("key"),
            )
        )
    if bucket_col is not None:
        key_structs.append(
            F.struct(
                F.lit(f"hist:{bucket_col}/{bucket_width}").alias("section"),
                F.floor(F.col(bucket_col) / F.lit(int(bucket_width)))
                .cast("long")
                .cast("string")
                .alias("key"),
            )
        )
    if not key_structs:
        raise ValueError("drift_report needs at least one section")

    def _counted(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode(F.array(*key_structs)).alias("sk"))
            .groupBy(
                F.col("sk.section").alias("section"),
                F.col("sk.key").alias("key"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    a, b = _counted(ref), _counted(cur)
    keyed = (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.section") == F.col("b.section"))
            & F.col("a.key").eqNullSafe(F.col("b.key")),
            "outer",
        )
        .select(
            F.coalesce(F.col("a.section"), F.col("b.section")).alias(
                "section"
            ),
            F.coalesce(F.col("a.key"), F.col("b.key")).alias("key"),
            F.coalesce(F.col("a.n"), F.lit(0)).cast("long").alias("ref_n"),
            F.coalesce(F.col("b.n"), F.lit(0)).cast("long").alias("cur_n"),
        )
    )

    # snapshot totals as PER-SECTION window sums over the tiny keyed
    # frame: every row of a snapshot lands in exactly one key per
    # section, so each section's ref_n/cur_n sums equal the snapshot
    # row counts N and M — one section-partitioned window on the
    # aggregated rows instead of two extra branch jobs re-deriving the
    # side aggregates plus a broadcast build (measured: the report's
    # cost at sf0.1 is almost entirely scheduled-job count)
    from pyspark.sql import Window

    w = Window.partitionBy("section")
    dec = "decimal(18,0)"
    scored = keyed.select(
        "section",
        "key",
        "ref_n",
        "cur_n",
        F.abs(
            F.col("ref_n").cast(dec)
            * F.sum("cur_n").over(w).cast(dec)
            - F.col("cur_n").cast(dec)
            * F.sum("ref_n").over(w).cast(dec)
        ).cast("decimal(38,0)").alias("drift_num"),
    )
    # per-key rows AND per-section totals from ONE aggregate over the
    # tiny scored frame — GROUPING SETS ((section,key),(section))
    # instead of a UNION whose total branch would recompute the whole
    # pipeline. scored is 1 row per (section,key), so the finest
    # grouping set reproduces it exactly; grouping(key) (not key IS
    # NULL — a null category is a real key) marks the subtotal rows.
    return (
        scored.groupingSets(
            [["section", "key"], ["section"]], "section", "key"
        )
        .agg(
            # grouping() is only legal inside the grouping-sets
            # aggregate itself — resolve the marker here, rename after
            F.grouping("key").alias("__g"),
            F.sum("ref_n").cast("long").alias("ref_n"),
            F.sum("cur_n").cast("long").alias("cur_n"),
            F.sum("drift_num").cast("decimal(38,0)").alias("drift_num"),
        )
        .select(
            "section",
            F.when(F.col("__g") == 1, F.lit("__TOTAL__"))
            .otherwise(F.col("key"))
            .alias("key"),
            "ref_n",
            "cur_n",
            # canonical surface: exact decimal digits as text (see
            # docstring — the arithmetic above never leaves decimal)
            F.col("drift_num").cast("string").alias("drift_num"),
        )
    )

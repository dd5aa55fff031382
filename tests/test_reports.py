"""Report-bundle operators (operators/reports.py): the long-format
assembly that the driver-certified report_dataset / report_segment_stats
queries run. Value-level certification lives in the oracle rows; these
tests pin the structural semantics the oracle can't explain on failure
(section completeness, zero-bucket inclusion, NULL-key handling).
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.operators import reports

SF = "/root/testdata/sf0.001"


def test_dataset_report_long_sections(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = reports.dataset_report_long(docs, events, emb)
    assert out.columns == ["section", "key", "value"]
    sections = {r["section"] for r in out.select("section").distinct().collect()}
    assert sections == {
        "source_counts",
        "lang_counts",
        "token_leaderboard",
        "length_histogram",
        "length_stats_by_lang",
        "distinct_counters",
        "coverage_split",
        "event_type_counts",
        "events_per_user_stats",
        "label_vector_stats",
    }
    # counter identity: source_counts must sum to n_docs
    rows = {
        (r["section"], r["key"]): r["value"]
        for r in out.filter(
            F.col("section").isin("distinct_counters", "source_counts")
        ).collect()
    }
    n_docs = rows[("distinct_counters", "n_docs")]
    assert sum(v for (s, _), v in rows.items() if s == "source_counts") == n_docs


def test_dataset_report_empty_documents_zero_counters(spark):
    """Empty-input contract: with zero documents the counters section
    still materializes with n_docs = 0 (sum over zero member rows is
    NULL without the coalesce — this pins the coalesce)."""
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars int"
    )
    events = spark.createDataFrame([Row(event_id=1, user_id=1, event_type="t")])
    emb = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 0.0], label=0)])
    out = reports.dataset_report_long(docs, events, emb)
    counters = {
        r["key"]: r["value"]
        for r in out.filter(F.col("section") == "distinct_counters").collect()
    }
    assert counters["n_docs"] == 0
    assert counters["n_sources"] == 0 and counters["n_langs"] == 0


def test_dataset_report_long_null_keys_explicit(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b", lang=None, source="s", n_chars=3),
            Row(doc_id=2, text="a", lang="en", source="s", n_chars=1),
        ]
    )
    events = spark.createDataFrame([Row(event_id=1, user_id=1, event_type="t")])
    emb = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 0.0], label=0)])
    out = reports.dataset_report_long(docs, events, emb)
    langs = {
        r["key"]
        for r in out.filter(F.col("section") == "lang_counts").collect()
    }
    assert langs == {"<null>", "en"}  # NULL group key is an explicit bucket
    stats_keys = {
        r["key"]
        for r in out.filter(F.col("section") == "length_stats_by_lang").collect()
    }
    assert "<null>:mean" in stats_keys  # NULL key never drops unpivoted rows


def test_segment_stats_long_zero_tag_bucket(spark):
    segments = spark.createDataFrame(
        [
            Row(filename="a.jpg", segment_area=600),
            Row(filename="a.jpg", segment_area=700),
            Row(filename="b.jpg", segment_area=500),
        ]
    )
    tag_counts = spark.createDataFrame(
        [Row(vec_id=1, n_tags=0), Row(vec_id=2, n_tags=2), Row(vec_id=3, n_tags=2)]
    )
    out = reports.segment_stats_long(segments, tag_counts)
    rows = {(r["section"], r["key"]): r["value"] for r in out.collect()}
    # the len([]) == 0 bucket the reference's value_counts reports
    assert rows[("tags_per_item", "0")] == 1.0
    assert rows[("tags_per_item", "2")] == 2.0
    assert rows[("tag_summary", "n_items")] == 3.0
    assert rows[("segments_per_image", "2")] == 1.0
    assert rows[("segments_per_image", "1")] == 1.0
    assert rows[("segment_summary", "avg_segments_per_image")] == 1.5
    assert rows[("area_summary", "min_area")] == 500.0


def test_cube_grouping_sets_consistent(spark, sf_dir):
    """agg_cube_lang_source: the gid flags partition the output into
    the four grouping sets, the gid=3 grand total equals the corpus
    row count, and each subtotal level re-aggregates to it."""
    from data_feature_extraction_and_retrieval_pipeline_spark import queries as Q
    from data_feature_extraction_and_retrieval_pipeline_spark.sources import (
        load_table,
    )

    rows = Q.queries()["agg_cube_lang_source"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    [grand] = by_gid[3]
    assert (grand.lang_grp, grand.source_grp) == ("ALL", "ALL")
    assert grand.n_docs == total
    # every marginal re-aggregates to the grand total
    for gid in (0, 1, 2):
        assert sum(r.n_docs for r in by_gid[gid]) == total
        assert sum(r.sum_chars for r in by_gid[gid]) == grand.sum_chars


def test_constraint_report_hand_corpus(spark):
    """Every constraint type on a corpus built to violate each one
    exactly once: NULL text, duplicated id, out-of-bounds length,
    disallowed lang, and a row-count floor set above the table size."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.reports import (
        constraint_report,
    )

    df = spark.createDataFrame(
        [
            (1, "ok", "en", 10),
            (1, None, "en", 20),     # dup id + NULL text
            (2, "ok", "xx", 999),    # bad lang + oob n_chars
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = {
        r.check_name: (r.metric, r.passed)
        for r in constraint_report(
            df,
            not_null=("text",),
            unique=("doc_id",),
            bounds={"n_chars": (0.0, 100.0)},
            values_in={"lang": ("en",)},
            min_rows=5,
        ).collect()
    }
    assert got["row_count_min(5)"] == (3, False)
    assert got["not_null(text)"] == (1, False)
    assert got["unique(doc_id)"] == (1, False)      # exactly 1 duplicate
    assert got["bounds(n_chars,[0.0,100.0])"] == (1, False)
    assert got["values_in(lang)"] == (1, False)

    # NULL-explicit unique semantics: NULLs are neither duplicates nor
    # violations (metric counts duplicates among NON-NULL values only;
    # a key column pairs unique with not_null to forbid NULLs) — two
    # NULL texts + distinct non-null values ⇒ unique(text) passes with
    # zero duplicates while not_null(text) reports the two NULLs.
    nulls = spark.createDataFrame(
        [(1, None), (2, None), (3, "a"), (4, "b")],
        "doc_id long, text string",
    )
    got2 = {
        r.check_name: (r.metric, r.passed)
        for r in constraint_report(
            nulls, not_null=("text",), unique=("text",)
        ).collect()
    }
    assert got2["unique(text)"] == (0, True)
    assert got2["not_null(text)"] == (2, False)

    all_pass = constraint_report(
        df.filter("doc_id = 2"),
        not_null=("lang",),
        unique=("doc_id",),
        min_rows=1,
    ).collect()
    assert all(r.passed for r in all_pass)

    import pytest

    with pytest.raises(ValueError):
        constraint_report(df)


def test_drift_report_hand_values(spark):
    """Exact drift arithmetic on a hand corpus: ref = 3 rows
    (en,en,de), cur = 2 rows (en,zh). N=3, M=2. Per-key numerators
    |ref_n*M - cur_n*N|: en |2*2-1*3|=1, de |1*2-0|=2, zh |0-1*3|=3;
    section total 6. A key present on only one side appears with the
    other side's count 0 (the disappearing/new-category case drift
    monitoring exists for)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.reports import (
        drift_report,
    )

    ref = spark.createDataFrame(
        [(0, "en", 10), (2, "en", 60), (4, "de", 110)],
        "doc_id long, lang string, n_chars long",
    )
    cur = spark.createDataFrame(
        [(1, "en", 10), (3, "zh", 10)],
        "doc_id long, lang string, n_chars long",
    )
    out = drift_report(
        ref, cur, cat_cols=("lang",), bucket_col="n_chars", bucket_width=50
    )
    # drift_num's SURFACE is a plain-digit string (canonical across
    # engine wire types); the digits themselves are exact integers
    got = {
        (r.section, r.key): (r.ref_n, r.cur_n, int(r.drift_num))
        for r in out.collect()
    }
    assert all(
        isinstance(r.drift_num, str) for r in out.collect()
    )
    assert got[("cat:lang", "en")] == (2, 1, 1)
    assert got[("cat:lang", "de")] == (1, 0, 2)
    assert got[("cat:lang", "zh")] == (0, 1, 3)
    assert got[("cat:lang", "__TOTAL__")] == (3, 2, 6)
    # histogram: bucket 0 holds ref 1 + cur 2, bucket 1 ref 1, bucket 2 ref 1
    assert got[("hist:n_chars/50", "0")] == (1, 2, 4)  # |1*2 - 2*3| = 4
    assert got[("hist:n_chars/50", "1")] == (1, 0, 2)
    assert got[("hist:n_chars/50", "2")] == (1, 0, 2)
    assert got[("hist:n_chars/50", "__TOTAL__")] == (3, 2, 8)

    import pytest

    with pytest.raises(ValueError):
        drift_report(ref, cur)


def test_grouped_value_counts_matches_standalone(spark):
    """The shared grouping-sets pass must be VALUE-identical to the
    standalone analytics twins for every member — including real NULL
    key values, which grouping_id must keep distinct from the
    grouping-sets masking NULLs."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        analytics,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "lang",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("lang")),
    )
    shared = reports._grouped_value_counts(
        docs,
        {
            "source": F.col("source"),
            "lang": F.col("lang"),
            "bin": (
                F.floor((F.col("n_chars") - F.lit(0.0)) / F.lit(50.0))
                * F.lit(50.0)
                + F.lit(0.0)
            ).cast("double"),
            "has_long_text": (F.col("n_chars") >= 100),
        },
    )

    def rows(df):
        return sorted(map(tuple, df.collect()), key=repr)

    assert rows(shared["source"]) == rows(
        analytics.value_counts(docs, "source", ordered=False)
    )
    assert rows(shared["lang"]) == rows(
        analytics.value_counts(docs, "lang", ordered=False)
    )
    assert rows(shared["bin"].filter(F.col("bin").isNotNull())) == rows(
        analytics.histogram(docs, "n_chars", 50.0, ordered=False)
    )
    assert rows(shared["has_long_text"]) == rows(
        docs.groupBy((F.col("n_chars") >= 100).alias("has_long_text")).agg(
            F.count("*").alias("count")
        )
    )
    # real NULL lang groups survive (doc_id % 7 planted them)
    lang_rows = dict(rows(shared["lang"]))
    assert None in lang_rows and lang_rows[None] > 0


def test_dataset_report_long_fused_matches_reference(spark):
    """The fused long-form assembly (one map pass over each counting
    aggregate, single-aggregate counters) must be row-identical to the
    member-by-member reference assembly built from the dict-form
    report — the pin that lets the fused plan evolve without drifting
    from the certified member semantics."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    fused = reports.dataset_report_long(docs, events, emb)
    ref = reports._dataset_report_long_reference(docs, events, emb)
    f_rows = sorted(map(tuple, fused.collect()))
    r_rows = sorted(map(tuple, ref.collect()))
    assert f_rows == r_rows


def test_dataset_report_token_member_matches_standalone(spark):
    """The array-valued token member of the shared counting pass must
    reproduce the standalone explode→count leaderboard exactly,
    including the post-count empty-token filter and the (count desc,
    token) tiebreak."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rep = reports.dataset_report(docs,
        spark.read.parquet(f"{SF}/events.parquet"),
        spark.read.parquet(f"{SF}/embeddings.parquet"))
    standalone = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("value")
        )
        .filter(F.length("value") > 0)
        .groupBy("value")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.col("value"))
        .limit(30)
    )
    assert [tuple(r) for r in rep["token_leaderboard"].collect()] == [
        tuple(r) for r in standalone.collect()
    ]

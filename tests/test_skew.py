"""Skew utilities (operators/skew.py) and the analytics report bundle
(operators/reports.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.operators.reports import (
    dataset_report,
)
from data_feature_extraction_and_retrieval_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from data_feature_extraction_and_retrieval_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = {
        r["event_type"]: (r["n"], r["s"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["s"], r["mx"])
        for r in salted_aggregate(
            ev, ["event_type"], {"n": ("*", "count"), "s": ("value", "sum"), "mx": ("value", "max")}
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert plain[k][1] == pytest.approx(salted[k][1], rel=1e-12)
        assert plain[k][2] == salted[k][2]


def test_salted_aggregate_rejects_non_reaggregable(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="non-re-aggregable"):
        salted_aggregate(ev, ["event_type"], {"a": ("value", "avg")})


def test_salted_join_row_identical(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    dim = (
        ev.select("user_id").distinct()
        .withColumn("user_tier", (F.col("user_id") % 3).cast("int"))
    )
    plain = ev.join(dim, "user_id").select("event_id", "user_tier")
    salted = salted_join(ev, dim, "user_id").select("event_id", "user_tier")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_dataset_report_bundle(spark):
    docs = load_table(spark, SF_DIR, "documents")
    ev = load_table(spark, SF_DIR, "events")
    emb = load_table(spark, SF_DIR, "embeddings")
    rep = dataset_report(docs, ev, emb)
    assert set(rep) == {
        "source_counts", "lang_counts", "token_leaderboard",
        "length_histogram", "length_stats_by_lang", "distinct_counters",
        "coverage_split", "event_type_counts", "events_per_user_stats",
        "label_vector_stats",
    }
    counters = rep["distinct_counters"].first()
    assert counters["n_docs"] == docs.count()
    top = rep["token_leaderboard"].collect()
    assert len(top) == 30 and top[0]["count"] >= top[-1]["count"]
    norms = rep["label_vector_stats"].collect()
    for r in norms:
        assert r["mean_norm"] == pytest.approx(1.0, abs=1e-3)  # normalized corpus

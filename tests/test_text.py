"""Text-suite operator semantics: PII redaction and benchmark
decontamination (training-data pipeline ops beyond the reference).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.functions import text as X
from data_feature_extraction_and_retrieval_pipeline_spark.operators.dedup import (
    contamination_flags,
)


def test_redact_pii_semantics(spark):
    rows = [
        (1, "mail me at alice.smith+x@sub.example.org thanks"),
        (2, "call +1 555 0100 or +90 212 9999"),
        (3, "server at 10.0.0.1 and 192.168.100.200"),
        (4, "nothing sensitive here"),
        (5, "mixed bob@ex.co from 8.8.8.8 call +44 207 1234"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *X.pii_counts(F.col("text")),
            X.redact_pii(F.col("text")).alias("clean"),
        ).collect()
    }
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["clean"]
    assert "alice" not in out[1]["clean"]
    assert out[2]["n_phone"] == 2 and out[2]["clean"].count("<PHONE>") == 2
    assert out[3]["n_ipv4"] == 2 and out[3]["clean"].count("<IP>") == 2
    assert out[4]["clean"] == "nothing sensitive here"
    assert (
        out[5]["n_email"],
        out[5]["n_phone"],
        out[5]["n_ipv4"],
    ) == (1, 1, 1)
    assert "8.8.8.8" not in out[5]["clean"]


def test_contamination_flags_invariants(spark):
    """Exact copies of benchmark docs are flagged with full shingle
    overlap; unrelated docs are not flagged."""
    bench = spark.createDataFrame(
        [(100, "a b c d e f g h i j")], "doc_id: long, text: string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),       # exact copy → flagged
            (2, "x a b c d e f g h i j y"),   # superset → flagged
            (3, "totally different words here with no overlap at all ok"),
        ],
        "doc_id: long, text: string",
    )
    got = {r["doc_id"]: r["n_shared"] for r in
           contamination_flags(corpus, bench, n=8).collect()}
    # benchmark doc has 3 distinct 8-grams; the copy shares all 3
    assert got[1] == 3
    assert got[2] == 3
    assert 3 not in got


def test_contamination_ids_matches_flags_id_set(spark):
    """The existence-only pass (what CurationPipeline.decontaminate
    consumes) must flag exactly the id set of the counting form —
    pinned so the cheaper kernel can never drift from the certified
    semantics. Duplicate-shingle docs exercise the skipped
    array_distinct path."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.dedup import (
        contamination_ids,
    )

    bench = spark.createDataFrame(
        [(100, "a b c d e f g h i j")], "doc_id: long, text: string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            # repeated benchmark 8-gram (duplicate shingles per doc)
            (2, "a b c d e f g h a b c d e f g h i j"),
            (3, "totally different words here with no overlap at all ok"),
            (4, "short"),
        ],
        "doc_id: long, text: string",
    )
    flags = {r["doc_id"] for r in
             contamination_flags(corpus, bench, n=8).collect()}
    ids = {r["doc_id"] for r in
           contamination_ids(corpus, bench, n=8).collect()}
    assert ids == flags == {1, 2}

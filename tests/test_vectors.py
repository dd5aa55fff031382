from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
    cosine,
    dot,
    hybrid_score,
    l2_norm,
    l2_normalize,
    calibrated_whole_score,
    percentage_score,
    segment_percentage_score,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (2, [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]),
        (3, [-1.0, 0.5, 2.5], [0.5, -0.5, 1.0]),
    ]
    return spark.createDataFrame(rows, ["id", "a", "b"])


def test_dot_matches_numpy(vec_df):
    out = {r["id"]: r["d"] for r in vec_df.select("id", dot("a", "b").alias("d")).collect()}
    assert out[1] == pytest.approx(np.dot([1, 2, 3], [4, 5, 6]))
    assert out[2] == 0.0
    assert out[3] == pytest.approx(np.dot([-1, 0.5, 2.5], [0.5, -0.5, 1.0]))


def test_dot_batch_matches_hof_dot(vec_df):
    """The Arrow-batched multi-query twin scores identically (within
    float noise) to one HOF dot per query, in query order."""
    from data_feature_extraction_and_retrieval_pipeline_spark.functions.vectors import dot_batch

    queries = [[4.0, 5.0, 6.0], [1.0, 0.0, 0.0], [-2.0, 0.25, 1.5]]
    got = {
        r["id"]: r["s"]
        for r in vec_df.select("id", dot_batch("a", queries).alias("s")).collect()
    }
    for rid, a in {1: [1, 2, 3], 2: [0, 0, 0], 3: [-1, 0.5, 2.5]}.items():
        for qi, q in enumerate(queries):
            assert got[rid][qi] == pytest.approx(np.dot(a, q), abs=1e-12)


def test_l2_norm_and_normalize(vec_df):
    rows = vec_df.select(
        "id", l2_norm("a").alias("n"), l2_normalize("a").alias("u")
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id[1]["n"] == pytest.approx(math.sqrt(14))
    assert np.linalg.norm(by_id[1]["u"]) == pytest.approx(1.0)
    # zero vector: no division by zero, stays zero
    assert by_id[2]["u"] == [0.0, 0.0, 0.0]


def test_cosine(vec_df):
    r = vec_df.filter("id = 1").select(cosine("a", "b").alias("c")).first()
    expected = np.dot([1, 2, 3], [4, 5, 6]) / (
        np.linalg.norm([1, 2, 3]) * np.linalg.norm([4, 5, 6])
    )
    assert r["c"] == pytest.approx(expected)


def test_score_calibration_algebra(spark):
    """The reference's asymmetric score algebra (SURVEY.md §1.4):
    whole score shifted to 0..2, percentages, hybrid mixing the
    SHIFTED whole with the UNSHIFTED segment score."""
    df = spark.createDataFrame([(0.5, 0.8)], ["sim", "seg"])
    row = df.select(
        calibrated_whole_score(F.col("sim")).alias("whole"),
        percentage_score(calibrated_whole_score(F.col("sim"))).alias("pct"),
        segment_percentage_score(F.col("seg")).alias("seg_pct"),
        hybrid_score(calibrated_whole_score(F.col("sim")), F.col("seg")).alias("hybrid"),
        hybrid_score(calibrated_whole_score(F.col("sim")), F.lit(None).cast("double")).alias(
            "hybrid_missing"
        ),
    ).first()
    assert row["whole"] == pytest.approx(1.5)            # 0.5 + 1.0
    assert row["pct"] == pytest.approx(75.0)             # (1.5/2)*100
    assert row["seg_pct"] == pytest.approx(90.0)         # ((0.8+1)/2)*100
    assert row["hybrid"] == pytest.approx(0.4 * 1.5 + 0.6 * 0.8)
    assert row["hybrid_missing"] == pytest.approx(0.4 * 1.5)  # missing seg → 0.0

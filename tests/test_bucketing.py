"""Bucketed co-located joins and streaming upsert (the write-time
clustering levers for 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.plans.inspect import (
    _plan_text,
)
from data_feature_extraction_and_retrieval_pipeline_spark.sources import load_table
from data_feature_extraction_and_retrieval_pipeline_spark.sources.writers import (
    write_bucketed_table,
)
from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
    incremental_upsert,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed on the same key/count join without an
    Exchange — the clustering was paid once at write time."""
    emb = load_table(spark, SF_DIR, "embeddings")
    seg = emb.select(
        F.floor(F.col("vec_id") / 10).cast("long").alias("image_id"),
        "vec_id",
        "label",
    )
    images = seg.filter(F.col("vec_id") % 10 == 0).select("image_id", "label")

    write_bucketed_table(seg, "seg_bkt", "image_id", num_buckets=4)
    write_bucketed_table(images, "img_bkt", "image_id", num_buckets=4)
    # disable broadcast so the planner actually uses the bucketing
    # (at real scale both sides are far beyond the broadcast threshold)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("seg_bkt")
        b = spark.table("img_bkt").withColumnRenamed("label", "img_label")
        joined = a.join(b, "image_id")
        text = _plan_text(joined)
        assert "Exchange hashpartitioning" not in text and "ShuffleExchange" not in text, (
            f"bucketed join should not shuffle:\n{text}"
        )
        assert "SortMergeJoin" in text
        assert "Bucketed: true" in text
        # and it still returns the right rows
        assert joined.count() == a.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS seg_bkt")
        spark.sql("DROP TABLE IF EXISTS img_bkt")


def test_incremental_upsert_merges_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    df1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], ["id", "name", "v"]
    )
    df1.write.mode("append").parquet(src)
    q = incremental_upsert(spark, src, df1.schema, idx, ckpt, key="id")
    q.awaitTermination(120)
    assert {tuple(r) for r in spark.read.parquet(idx).collect()} == {
        (1, "a", 10),
        (2, "b", 20),
    }

    # second delivery: update id=2, insert id=3
    df2 = spark.createDataFrame(
        [(2, "b2", 99), (3, "c", 30)], ["id", "name", "v"]
    )
    df2.write.mode("append").parquet(src)
    q2 = incremental_upsert(spark, src, df1.schema, idx, ckpt, key="id")
    q2.awaitTermination(120)
    rows = {r["id"]: (r["name"], r["v"]) for r in spark.read.parquet(idx).collect()}
    assert rows == {1: ("a", 10), 2: ("b2", 99), 3: ("c", 30)}

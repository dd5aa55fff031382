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


def test_ivfpq_partitioned_table_prunes_probe(spark, tmp_path):
    """The IVF story made literal: the coded table written
    partitionBy(cluster), the nprobe probe read back as PARTITION
    PRUNING (PartitionFilters on the scan — only nprobe/nlist of the
    directories are touched), and the pruned-scan results identical
    to the in-memory path. This is exactly the layout the similarity
    module's docstrings promise at 100 TB."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.similarity import (
        assign_clusters,
        ivfpq_topk,
        pq_encode_catalyst,
        pq_lut,
        portable_coarse_centroids,
        portable_pq_codebooks,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.plans.inspect import (
        plan_summary,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.sources.writers import (
        write_parquet_table,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    books = portable_pq_codebooks(m=8, k=16, d=8)
    cents = portable_coarse_centroids(nlist=8, dim=64)
    coded = pq_encode_catalyst(
        assign_clusters(emb, cents), books, keep_cols=("cluster",)
    )

    path = str(tmp_path / "ivfpq_index")
    write_parquet_table(coded, path, partition_by=["cluster"])
    on_disk = spark.read.parquet(path)

    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    lut = pq_lut(books, q)
    pruned = ivfpq_topk(on_disk, cents, books, q, k=5, nprobe=2, lut=lut, round_to=6)

    # physical proof: the probe reaches the scan as PartitionFilters
    # (directory pruning), not a post-scan Filter
    formatted = plan_summary(pruned)
    scan_lines = [
        ln for ln in formatted.splitlines() if "PartitionFilters" in ln
    ]
    assert scan_lines and any("cluster" in ln for ln in scan_lines), formatted
    assert any(
        "IN" in ln or "in(" in ln.lower() for ln in scan_lines
    ), scan_lines

    # semantic proof: identical to the un-written path
    mem = ivfpq_topk(coded, cents, books, q, k=5, nprobe=2, lut=lut, round_to=6)
    assert [tuple(r) for r in pruned.collect()] == [
        tuple(r) for r in mem.collect()
    ]

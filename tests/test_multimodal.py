"""Multimodal binary-column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
    decode_image_meta,
    resize_plan,
    sample_frames,
)
from data_feature_extraction_and_retrieval_pipeline_spark.operators.multimodal import (
    _stub_dims,
    decode_image_real,
)


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        ("a.jpg", b"x" * 100),
        ("b.jpg", b"y" * 5000),
        ("c.jpg", b""),
    ]
    return spark.createDataFrame(rows, ["filename", "content"])


def test_decode_meta_deterministic(images):
    got = {r["filename"]: r for r in decode_image_meta(images).collect()}
    assert got["a.jpg"]["n_bytes"] == 100
    w, h, fmt = _stub_dims(100)
    assert (got["a.jpg"]["width"], got["a.jpg"]["height"], got["a.jpg"]["format"]) == (
        w,
        h,
        fmt,
    )
    assert got["c.jpg"]["n_bytes"] == 0
    # binary column pruned from output schema
    assert "content" not in decode_image_meta(images).columns


def test_resize_plan_aspect_ratio(spark):
    meta = spark.createDataFrame(
        [("a", 10, 1600, 800, "jpeg"), ("b", 10, 400, 300, "png")],
        ["filename", "n_bytes", "width", "height", "format"],
    )
    got = {r["filename"]: r for r in resize_plan(meta, max_side=800).collect()}
    assert (got["a"]["target_width"], got["a"]["target_height"]) == (800, 400)
    # already small → untouched
    assert (got["b"]["target_width"], got["b"]["target_height"]) == (400, 300)


def test_sample_frames_fanout(images):
    frames = sample_frames(images, every_nth=30, max_frames=8)
    rows = frames.collect()
    # 1 → N fan-out with deterministic frame indices
    by_file = {}
    for r in rows:
        by_file.setdefault(r["filename"], []).append(r["frame_idx"])
    # n_frames = len % 240 + 1 → a.jpg: 101 frames → idx 0,30,60,90
    assert sorted(by_file["a.jpg"]) == [0, 30, 60, 90]
    # empty payload → 1 frame, idx 0
    assert by_file["c.jpg"] == [0]
    assert all(isinstance(r["frame"], (bytes, bytearray)) for r in rows)


def test_ingest_pipeline_end_to_end(spark):
    """Entry-point A/B flow: files on disk → binary scan → segment
    UDTF → crop encoder → zero-shot tags → parquet index → summary.
    Deterministic stubs ⇒ identical output across runs; the index
    table must exist with the nested tag schema."""
    import os

    from data_feature_extraction_and_retrieval_pipeline_spark.queries import (
        ml_ingest_pipeline,
    )

    sf = "/root/testdata/sf0.001"
    first = ml_ingest_pipeline(spark, sf).collect()
    assert len(first) > 0
    assert sum(r["n"] for r in first) > 0
    # tags come from the fixed vocabulary, confidences are probabilities
    vocab = {"cat", "dog", "tree", "car", "house", "person", "sky", "water"}
    assert {r["tag"] for r in first} <= vocab
    assert all(0.0 <= r["avg_confidence"] <= 1.0 for r in first)

    second = ml_ingest_pipeline(spark, sf).collect()
    assert first == second

    index_dir = "/tmp/dferp_ingest_sf0.001/index.parquet"
    assert os.path.isdir(index_dir)
    idx = spark.read.parquet(index_dir)
    assert dict(idx.dtypes)["tags"] == "array<struct<tag:string,confidence:float>>"
    # 1→N fan-out really happened: more segment rows than images
    n_files = idx.select("filename").distinct().count()
    assert idx.count() > n_files


def test_real_decode_is_gated():
    """The real decoder degrades to an explicit ImportError with
    install guidance where codecs are absent; the positive path runs
    in tests/test_real_models.py wherever PIL exists."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — covered by test_real_models.py")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="pillow"):
        decode_image_real(b"\xff\xd8\xff")


def test_segment_image_output_pruning(spark):
    """columns= pushes projection into the UDTF: pruned schema, same
    values on the surviving columns."""
    from pyspark.sql import functions as F

    from data_feature_extraction_and_retrieval_pipeline_spark.ml.encoders import segment_image

    imgs = spark.createDataFrame(
        [("a.jpg", b"payload-one"), ("b.jpg", b"payload-two")],
        ["filename", "content"],
    )
    full = segment_image(imgs).select("filename", "segment_id", "segment_area")
    pruned = segment_image(
        imgs, columns=("filename", "segment_id", "segment_area")
    )
    assert pruned.columns == ["filename", "segment_id", "segment_area"]
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, pruned.collect())
    )

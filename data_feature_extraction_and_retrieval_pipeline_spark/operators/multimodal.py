"""Multimodal (image/audio/video) column plumbing.

The reference's media path is per-file Python over a directory tree
(extract_clip_features.py:68-84 scan; SAM/sam_segment_clip_pipeline.py
crops/resizes). The engine treats media as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` — the
100 TB layout: blobs live inside the table (or as references), decode
happens executor-side in vectorized batches, and the Spark-side
schema / partitioning / UDF batch shape is real and tested.

The actual codec work (PIL/libav) is NOT available in this
environment, so the decode kernels are deterministic stubs derived
from the byte payload — clearly marked, swap-in points for real
decoders. Everything around them (schemas, batch iteration, 1→N frame
fan-out, column pruning) is production-shaped.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("filename", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("filename", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

_FORMATS = ("jpeg", "png", "gif")


def _stub_dims(n_bytes: int) -> tuple[int, int, str]:
    """Deterministic fake (width, height, format) from payload size.

    STUB — replace with a real header parse (PIL ``Image.open`` /
    ``struct`` over magic bytes) when codec libs are present. Kept as
    pure integer arithmetic so the DuckDB oracle can verify the
    mapInPandas plumbing end-to-end.
    """
    width = (n_bytes * 7) % 1024 + 32
    height = (n_bytes * 13) % 1024 + 32
    return width, height, _FORMATS[n_bytes % 3]


def _stub_dims_np(n_bytes):
    """Vectorized twin of ``_stub_dims`` over an int64 array — ONE
    definition of the stub arithmetic for both the scalar helper and
    the batch kernels (they must never drift)."""
    import numpy as np

    fmts = np.asarray(_FORMATS)
    return (
        ((n_bytes * 7) % 1024 + 32).astype("int32"),
        ((n_bytes * 13) % 1024 + 32).astype("int32"),
        fmts[n_bytes % 3],
    )


def decode_image_meta(
    images: DataFrame,
    content_col: str = "content",
    filename_col: str = "filename",
) -> DataFrame:
    """binary content → typed image metadata, one row per image.

    ``mapInPandas``: Arrow batches in, Arrow batches out; the binary
    column is pruned from the output so only small metadata rows
    shuffle downstream.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized batch kernel — the shape a real decoder keeps
            # (len() is the only per-row Python; the arithmetic is
            # numpy, shared with _stub_dims via _stub_dims_np). Null
            # content decodes as empty bytes rather than crashing the
            # task (the column is nullable in the MEDIA schema).
            n_bytes = pdf[content_col].map(
                lambda b: len(b) if b is not None else 0
            ).to_numpy("int64")
            width, height, fmt = _stub_dims_np(n_bytes)
            yield pd.DataFrame(
                {
                    "filename": pdf[filename_col],
                    "n_bytes": n_bytes,
                    "width": width,
                    "height": height,
                    "format": fmt,
                }
            )

    return images.select(filename_col, content_col).mapInPandas(
        _decode, IMAGE_META_SCHEMA
    )


def resize_plan(
    meta: DataFrame, max_side: int = 800
) -> DataFrame:
    """U4 — the ≤800 px downscale rule (search_with_segments.py:62-67)
    as a declarative column: target dims preserving aspect ratio.
    Pure Catalyst expressions — the actual pixel resample happens in
    the decode UDF at scale.
    """
    from pyspark.sql import functions as F

    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(float(max_side)) / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    # extreme aspect ratios can floor the short side to 0 — clamp to 1
    # (a resizer asked for an Nx0 image fails); oracle replays the clamp
    return meta.select(
        "*",
        F.greatest(F.lit(1), F.floor(F.col("width") * scale))
        .cast("int")
        .alias("target_width"),
        F.greatest(F.lit(1), F.floor(F.col("height") * scale))
        .cast("int")
        .alias("target_height"),
    )


def sample_frames(
    videos: DataFrame,
    every_nth: int = 30,
    content_col: str = "content",
    filename_col: str = "filename",
    max_frames: int = 8,
) -> DataFrame:
    """Video frame sampling: 1 input row → N frame rows (UDTF shape,
    like the SAM 1→N segment fan-out, U2).

    STUB decode: frame count is derived from payload size and each
    "frame" is a deterministic byte slice. A real implementation swaps
    the body for an av/ffmpeg keyframe iterator — the schema, the
    mapInPandas fan-out, and the downstream explode-free layout stay
    identical.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_name, out_idx, out_frame = [], [], []
            for name, content in zip(pdf[filename_col], pdf[content_col]):
                content = content if content is not None else b""
                n_frames = len(content) % 240 + 1
                picked = list(range(0, n_frames, every_nth))[:max_frames]
                for idx in picked:
                    lo = idx % max(len(content), 1)
                    out_name.append(name)
                    out_idx.append(idx)
                    out_frame.append(bytes(content[lo : lo + 16]))
            yield pd.DataFrame(
                {"filename": out_name, "frame_idx": out_idx, "frame": out_frame}
            )

    return videos.select(filename_col, content_col).mapInPandas(
        _sample, FRAME_SCHEMA
    )


PIXEL_SCHEMA = StructType(
    [
        StructField("filename", StringType()),
        StructField("pixels", T.ArrayType(IntegerType())),
    ]
)


def decode_image_pixels_stub(
    images: DataFrame,
    content_col: str = "content",
    filename_col: str = "filename",
    rows: int = 8,
    cols: int = 9,
) -> DataFrame:
    """binary content → a small integer "grayscale grid" (rows×cols
    flat array), the perceptual-hash input (dedup.image_dhash_bands).

    STUB decode — a real implementation replaces the body with
    grayscale-decode + area-resize to the grid (PIL/libvips); the
    mapInPandas batch shape, pruned output (binary column never
    leaves the stage), and array<int> contract stay identical. The
    stub samples ``rows·cols`` bytes at stride-37 positions modulo
    the payload length (pure integer arithmetic, so the DuckDB oracle
    replays it on ASCII payloads via ``ascii(substr(...))``), which
    preserves the property perceptual hashing needs: a small edit to
    the payload changes few samples, so near-identical payloads land
    within a small Hamming distance. NULL/empty payloads decode to
    the all-zero grid (the all-black image) instead of crashing.
    """
    n_px = rows * cols

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ks = np.arange(n_px, dtype=np.int64) * 37
        zero = np.zeros(n_px, dtype=np.int32)
        for pdf in batches:
            out = []
            for b in pdf[content_col]:
                arr = (
                    np.frombuffer(bytes(b), dtype=np.uint8)
                    if b is not None and len(b)
                    else None
                )
                out.append(
                    zero if arr is None else arr[ks % arr.size].astype("int32")
                )
            yield pd.DataFrame({"filename": pdf[filename_col], "pixels": out})

    return images.select(filename_col, content_col).mapInPandas(
        _decode, PIXEL_SCHEMA
    )


def decode_image_pixels_real(
    images: DataFrame,
    content_col: str = "content",
    filename_col: str = "filename",
    rows: int = 8,
    cols: int = 9,
) -> DataFrame:
    """PIL-backed twin of ``decode_image_pixels_stub`` — the REAL
    perceptual-hash input: grayscale decode + BOX (area) resize to the
    rows×cols grid, flattened row-major to the same ``array<int>``
    contract. This is the swap-in the stub's docstring promises;
    ``dedup.image_phash_pairs(decode="real")`` threads it through so
    the banding/verify plan is byte-identical either way
    (tests/test_real_models.py pins band-exactness against a pure-PIL
    reference wherever Pillow exists).

    Decoder selection is per-executor at RUN time: Pillow when
    installed (every format PIL speaks), else the vendored kernels —
    the Pillow-parity PNG codec (functions/imaging.py — same grayscale
    formula and fixed-point BOX resample, pinned bit-exact against PIL
    wherever PIL exists) and, since r13, the baseline-JPEG decoder
    (functions/jpeg.py), so the real path EXECUTES in codec-free
    containers for BOTH formats the reference corpus actually uses
    (.jpg scanned by extract_clip_features.py:68-84). JPEG pixels are
    within ±few levels of PIL's (lossy-codec decoder freedoms —
    upsampling filter, IDCT variant; jpeg.py docstring), which a
    9×8 BOX-averaged grid then compresses further — dHash bands over
    the grid agree with the PIL path except at exact gradient ties.
    Per-row decode failures (corrupt payloads; progressive JPEGs
    without Pillow) yield the all-zero grid — the stub's NULL/empty
    discipline — because at 100 TB one corrupt image must not kill a
    10k-task stage (quarantine downstream: the all-zero hash buckets
    only with other undecodables).
    """
    n_px = rows * cols

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        try:
            from PIL import Image
        except ImportError:
            Image = None
        from data_feature_extraction_and_retrieval_pipeline_spark.functions import (  # noqa: E501
            imaging,
        )

        zero = np.zeros(n_px, dtype=np.int32)
        for pdf in batches:
            out = []
            for b in pdf[content_col]:
                try:
                    if Image is not None:
                        img = Image.open(io.BytesIO(bytes(b))).convert("L")
                        img = img.resize(
                            (cols, rows), resample=Image.Resampling.BOX
                        )
                        out.append(
                            np.asarray(img, dtype=np.int32).reshape(n_px)
                        )
                    else:
                        out.append(
                            imaging.gray_grid(bytes(b), cols=cols, rows=rows)
                        )
                except Exception:
                    out.append(zero)
            yield pd.DataFrame({"filename": pdf[filename_col], "pixels": out})

    return images.select(filename_col, content_col).mapInPandas(
        _decode, PIXEL_SCHEMA
    )


def decode_image_real(content: bytes):
    """Real single-payload image decode (PIL). Raises ImportError with
    install guidance when Pillow is absent; the DataFrame-level twin is
    ``decode_image_meta_real``. Exercised by tests/test_real_models.py
    wherever PIL exists (skipped cleanly in codec-free containers)."""
    try:
        from PIL import Image
    except ImportError as e:
        raise ImportError(
            "Real image decoding needs Pillow (`pip install pillow`); "
            "this container ships without codec libraries. Use "
            "ml.encoders.decode_image_stub for plumbing tests."
        ) from e
    import io

    return Image.open(io.BytesIO(content))


def decode_image_meta_real(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """PIL-backed twin of ``ml.encoders.decode_image_stub`` — identical
    output schema (``decoded`` struct of width/height/n_channels), real
    decoded values. The reference decodes with PIL before CLIP
    (extract_clip_features.py:10-35, SAM/sam_segment_clip_pipeline.py:
    157-257); this is that step as an Arrow-batched column so the rest
    of the pipeline (resize_plan, encoders, segmenters) is source-
    agnostic.

    Decoder selection is per-executor at RUN time (r13, same policy as
    ``decode_image_pixels_real``): Pillow when installed (every format
    PIL speaks), else the vendored header parsers — PNG IHDR
    (functions/imaging.py::png_dims) and baseline-JPEG SOF
    (functions/jpeg.py::jpeg_dims) — which cover the reference's
    actual corpus formats without any codec library. Undecodable
    payloads yield NULL metadata rather than failing the batch — at
    100 TB a single corrupt image must not kill a 10k-task stage;
    filter ``decoded IS NULL`` into a quarantine sink.
    """
    out = T.StructType(
        [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
        ]
    )

    @F.pandas_udf(out)
    def decode(contents: pd.Series) -> pd.DataFrame:
        import io

        try:
            from PIL import Image
        except ImportError:
            Image = None
        from data_feature_extraction_and_retrieval_pipeline_spark.functions import (  # noqa: E501
            imaging,
            jpeg,
        )

        ws, hs, cs = [], [], []
        for b in contents:
            try:
                raw = bytes(b or b"")
                if Image is not None:
                    with Image.open(io.BytesIO(raw)) as img:
                        ws.append(img.width)
                        hs.append(img.height)
                        cs.append(len(img.getbands()))
                elif imaging.is_png(raw):
                    w, h, nc = imaging.png_dims(raw)
                    ws.append(w)
                    hs.append(h)
                    cs.append(nc)
                else:
                    w, h, nc = jpeg.jpeg_dims(raw)
                    ws.append(w)
                    hs.append(h)
                    cs.append(nc)
            except Exception:
                ws.append(None)
                hs.append(None)
                cs.append(None)
        return pd.DataFrame({"width": ws, "height": hs, "n_channels": cs})

    return df.withColumn("decoded", decode(F.col(content_col)))

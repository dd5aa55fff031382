"""Vendored baseline-JPEG codec (functions/jpeg.py): round-trip
property tests against its own encoder — identity quant tables bound
the decode error by DCT coefficient rounding alone — plus the decode
paths a real corpus exercises (4:2:0 MCUs, restart markers, odd
dimensions, progressive rejection) and the Spark-side wiring
(gray_grid dispatch, decode_image_meta_real's codec-free fallback,
decode_image_pixels_real over a .jpg corpus)."""

from __future__ import annotations

import numpy as np
import pytest

from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
    imaging,
    jpeg,
)


def _smooth_rgb(w: int, h: int) -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [
            (np.sin(xx / 11) + 1) * 90 + 30,
            (np.cos(yy / 9) + 1) * 80 + 40,
            (np.sin((xx + yy) / 15) + 1) * 70 + 50,
        ],
        axis=-1,
    ).astype(np.uint8)


def test_zigzag_is_the_spec_sequence():
    """First 10 natural indices of the generated zigzag must equal the
    published T.81 sequence — pins the generator against a
    transcription-free ground truth."""
    assert list(jpeg._ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(jpeg._ZZ.tolist()) == list(range(64))


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (37, 53), (7, 5), (1, 1)])
def test_gray_roundtrip_within_dct_rounding(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(img))
    assert dec.shape == shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_rgb_444_roundtrip():
    img = _smooth_rgb(70, 52)
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(img))
    assert dec.shape == img.shape
    # RGB adds YCbCr forward/backward rounding on top of the DCT
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_rgb_420_subsampled_roundtrip():
    """4:2:0 exercises multi-block MCUs and the chroma upsample path;
    luma stays DCT-tight, chroma differs by the 2x2 box average."""
    img = _smooth_rgb(70, 52)
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(img, subsample=True))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 4  # smooth image: subsampling loss is small
    gray_src = imaging.to_gray(img).astype(int)
    gray_dec = imaging.to_gray(dec).astype(int)
    assert np.abs(gray_dec - gray_src).max() <= 4  # luma not subsampled


@pytest.mark.parametrize("subsample", [False, True])
def test_restart_markers_roundtrip(subsample):
    img = _smooth_rgb(66, 34)
    enc = jpeg.jpeg_encode(img, subsample=subsample, restart_interval=2)
    assert b"\xff\xdd" in enc  # DRI emitted
    dec = jpeg.jpeg_decode(enc)
    base = jpeg.jpeg_decode(jpeg.jpeg_encode(img, subsample=subsample))
    # restart markers change the byte stream, never the pixels
    assert np.array_equal(dec, base)


def test_dims_header_only_parse():
    img = np.zeros((19, 31), dtype=np.uint8)
    assert jpeg.jpeg_dims(jpeg.jpeg_encode(img)) == (31, 19, 1)
    rgb = _smooth_rgb(31, 19)
    assert jpeg.jpeg_dims(jpeg.jpeg_encode(rgb)) == (31, 19, 3)


def test_progressive_rejected_with_clear_error():
    enc = bytearray(jpeg.jpeg_encode(np.zeros((8, 8), dtype=np.uint8)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive"):
        jpeg.jpeg_decode(bytes(enc))


def test_truncated_and_garbage_payloads_raise():
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(b"\x89PNG not a jpeg")
    enc = jpeg.jpeg_encode(np.full((16, 16), 200, dtype=np.uint8))
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(enc[:24])  # header cut before SOS


def test_gray_grid_dispatches_jpeg():
    """The phash kernel accepts JPEG payloads codec-free, and the grid
    is within a few levels of the PNG (lossless) grid of the same
    pixels — the practical 'decode="real" works on a .jpg corpus'
    criterion."""
    img = _smooth_rgb(64, 48)
    g_png = imaging.gray_grid(imaging.png_encode(img))
    g_jpg = imaging.gray_grid(jpeg.jpeg_encode(img))
    assert g_jpg.shape == (72,)
    assert np.abs(g_jpg - g_png).max() <= 3


def test_png_dims_header_only():
    img = _smooth_rgb(23, 11)
    assert imaging.png_dims(imaging.png_encode(img)) == (23, 11, 3)
    gray = np.zeros((5, 9), dtype=np.uint8)
    assert imaging.png_dims(imaging.png_encode(gray)) == (9, 5, 1)


def test_decode_image_meta_real_codec_free(spark):
    """decode_image_meta_real serves PNG + JPEG metadata without
    Pillow (vendored header parsers); corrupt rows yield NULLs."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        multimodal,
    )

    rows = [
        ("a.png", bytearray(imaging.png_encode(_smooth_rgb(13, 7)))),
        ("b.jpg", bytearray(jpeg.jpeg_encode(_smooth_rgb(31, 19)))),
        (
            "c.jpg",
            bytearray(
                jpeg.jpeg_encode(
                    np.zeros((10, 12), dtype=np.uint8), subsample=False
                )
            ),
        ),
        ("broken.jpg", bytearray(b"\xff\xd8garbage")),
    ]
    df = spark.createDataFrame(rows, "filename string, content binary")
    got = {
        r["filename"]: (
            r["decoded"]["width"],
            r["decoded"]["height"],
            r["decoded"]["n_channels"],
        )
        if r["decoded"] is not None
        else None
        for r in multimodal.decode_image_meta_real(df).collect()
    }
    assert got["a.png"] == (13, 7, 3)
    assert got["b.jpg"] == (31, 19, 3)
    assert got["c.jpg"] == (12, 10, 1)
    assert got["broken.jpg"] == (None, None, None)


def test_decode_image_pixels_real_jpg_corpus(spark):
    """The real phash decode path over a .jpg corpus, codec-free: the
    grid rows are non-zero (decoded, not quarantined) and match the
    driver-side gray_grid kernel exactly (same vendored decoder)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        multimodal,
    )

    imgs = {
        f"img{i}.jpg": jpeg.jpeg_encode(
            _smooth_rgb(40 + i, 30 + i), subsample=(i % 2 == 0)
        )
        for i in range(4)
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in imgs.items()],
        "filename string, content binary",
    )
    got = {
        r["filename"]: list(r["pixels"])
        for r in multimodal.decode_image_pixels_real(df).collect()
    }
    for name, payload in imgs.items():
        expect = imaging.gray_grid(payload).tolist()
        assert got[name] == expect
        assert any(v != 0 for v in got[name])


def test_roundtrip_property_randomized():
    """Hypothesis-style sweep without fixture files: random sizes and
    content classes, every combination decodes within the documented
    bounds of its own encoding."""
    rng = np.random.default_rng(1234)
    for _ in range(6):
        h = int(rng.integers(1, 41))
        w = int(rng.integers(1, 41))
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(img))
        assert dec.shape == (h, w)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

"""Real-model seam: these tests RUN wherever the optional deps
(Pillow, torch) are installed — e.g. a GPU cluster image — and skip
cleanly in this codec-free container. They are the executable proof
that the swap-in points (`decode_image_meta_real`, `decode_image_real`,
`_TorchClipAdapter`, `_try_real_clip`) produce real decodes/embeddings
rather than raising, matching the reference's PIL+CLIP path
(extract_clip_features.py:10-35, SAM/sam_segment_clip_pipeline.py:157-257).

The dep-free tests at the bottom pin the graceful-degradation contract
that IS exercisable here: explicit ImportError with install guidance,
and the loader seam returning None (→ stub) without raising.

Round-12 status: package installation is prohibited in this build
environment (no pip/apt), so the engine now vendors a Pillow-parity
PNG decode + grayscale + BOX-resample kernel
(functions/imaging.py) — the pHash real-decode path and its
band-exactness pin EXECUTE here (test_decode_image_pixels_real_band_exact
passes against an independent integer oracle). The remaining skips
are the paths that genuinely need PIL/torch binaries (JPEG decode,
CLIP): they run unmodified wherever `pip install pillow`/torch exist,
where test_decode_image_pixels_real_matches_pil additionally pins the
vendored kernel bit-exact against PIL itself.
"""

from __future__ import annotations

import pytest

from data_feature_extraction_and_retrieval_pipeline_spark.ml import encoders
from data_feature_extraction_and_retrieval_pipeline_spark.operators import multimodal


def _png_bytes(w: int, h: int) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_image_real_single_payload():
    pytest.importorskip("PIL")
    img = multimodal.decode_image_real(_png_bytes(17, 9))
    assert (img.width, img.height) == (17, 9)


def test_decode_image_meta_real_dataframe(spark):
    pytest.importorskip("PIL")
    rows = [
        ("a.png", _png_bytes(32, 16)),
        ("b.png", _png_bytes(8, 8)),
        ("corrupt.png", b"not an image"),  # must NULL out, not fail the batch
    ]
    df = spark.createDataFrame(rows, "filename string, content binary")
    out = {
        r["filename"]: r["decoded"]
        for r in multimodal.decode_image_meta_real(df).collect()
    }
    assert (out["a.png"]["width"], out["a.png"]["height"]) == (32, 16)
    assert out["a.png"]["n_channels"] == 3
    assert (out["b.png"]["width"], out["b.png"]["height"]) == (8, 8)
    assert out["corrupt.png"]["width"] is None


def _grid_fixture(kind: str) -> "np.ndarray":
    """72×64 grayscale fixtures whose BOX boxes align to the 9×8 grid
    exactly (8×8 source blocks per cell): a left-to-right gradient
    (``gradient``), the same with one inverted 8×8 corner — a small
    perceptual edit, i.e. a near-duplicate (``gradient_edit``), and a
    fine checkerboard (``checker``) whose BOX resize is flat gray —
    a maximally different dHash from any gradient."""
    import numpy as np

    x = np.arange(72)
    y = np.arange(64)
    if kind == "checker":
        arr = (255 * ((x[None, :] + y[:, None]) % 2)).astype(np.uint8)
    else:
        arr = np.broadcast_to(
            np.minimum(x * 4, 255).astype(np.uint8), (64, 72)
        ).copy()
    if kind == "gradient_edit":
        arr[:8, :8] = 255 - arr[:8, :8]
    return arr


def _test_png(kind: str) -> bytes:
    """The fixture arrays encoded with the vendored PNG encoder, using
    a mixed per-row filter schedule so the decode exercises every
    unfilter path (None/Sub/Up/Average/Paeth)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
        imaging,
    )

    arr = _grid_fixture(kind)
    return imaging.png_encode(arr, filters=[y % 5 for y in range(len(arr))])


def _box_grid_oracle(arr) -> list[int]:
    """Independent integer oracle for the aligned-box case: with 8×8
    source blocks per output cell, Pillow's fixed-point BOX kernel
    reduces EXACTLY to two passes of round-half-up integer means —
    horizontal (S+4)>>3 over 8 columns, then the same over 8 rows of
    the 8-bit intermediate (coefficient 1/8 quantizes to 2^19 with no
    error, so the fixed-point path is algebraically this formula)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.int64)
    h = (a.reshape(64, 9, 8).sum(axis=2) + 4) >> 3  # 72→9 horizontal
    v = (h.reshape(8, 8, 9).sum(axis=1) + 4) >> 3  # 64→8 vertical
    return v.reshape(72).astype(int).tolist()


def test_png_codec_roundtrip():
    """Vendored PNG encode→decode is the identity for gray and RGB,
    for each single filter type and the mixed schedule."""
    import numpy as np

    from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
        imaging,
    )

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    for arr in (gray, rgb):
        for ft in (0, 1, 2, 3, 4, [y % 5 for y in range(arr.shape[0])]):
            out = imaging.png_decode(imaging.png_encode(arr, filters=ft))
            assert np.array_equal(out, arr), ft


def test_png_decode_palette():
    """Hand-assembled palette (color type 3) PNG expands through PLTE
    to the RGB triples."""
    import struct
    import zlib

    import numpy as np

    from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
        imaging,
    )

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = bytes([0, 0, 1, 2]) + bytes([0, 2, 1, 0])  # 2 rows, filter 0
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(idx))
        + chunk(b"IEND", b"")
    )
    out = imaging.png_decode(png)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[0], [[255, 0, 0], [0, 255, 0], [0, 0, 255]])
    assert np.array_equal(out[1], [[0, 0, 255], [0, 255, 0], [255, 0, 0]])


def test_decode_image_pixels_real_band_exact(spark):
    """The real-decode pHash path end-to-end — RUNS in this codec-free
    container (vendored Pillow-parity kernel; where Pillow is
    installed the same test pins it too, see
    test_decode_image_pixels_real_matches_pil):
    (1) the grid from decode_image_pixels_real is bit-exact against an
    independent integer oracle on aligned-box fixtures, so the
    Catalyst dHash sees exactly the specified bits; (2)
    image_phash_pairs(decode="real") pairs a perceptual near-duplicate
    and not a different image; (3) a corrupt payload degrades to the
    zero grid, not a failure."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        dedup,
    )

    rows = [
        ("base.png", _test_png("gradient")),
        ("near.png", _test_png("gradient_edit")),
        ("other.png", _test_png("checker")),
        ("corrupt.png", b"not an image"),
    ]
    df = spark.createDataFrame(rows, "filename string, content binary")

    # (1) grid bit-exactness vs the independent integer oracle
    got = {
        r["filename"]: list(r["pixels"])
        for r in multimodal.decode_image_pixels_real(df).collect()
    }
    for name, _payload in rows[:3]:
        kind = {"base.png": "gradient", "near.png": "gradient_edit",
                "other.png": "checker"}[name]
        assert got[name] == _box_grid_oracle(_grid_fixture(kind)), name
    assert got["corrupt.png"] == [0] * 72  # (3) zero-grid degradation

    # (2) near-dup pairing under the real decoder: the edited gradient
    # pairs with its original; the checkerboard (flat-gray grid, dHash
    # far from any gradient) never pairs with either gradient. (The
    # flat checker and the zero-grid corrupt payload MAY pair with
    # each other — both degenerate flat hashes, the documented
    # quarantine bucket.)
    pairs = {
        (r["file_a"], r["file_b"]): r["hamming"]
        for r in dedup.image_phash_pairs(
            df, max_distance=16, decode="real"
        ).collect()
    }
    assert ("base.png", "near.png") in pairs
    assert pairs[("base.png", "near.png")] <= 16
    gradient_vs_other = {
        p for p in pairs
        if "other.png" in p and ("base.png" in p or "near.png" in p)
    }
    assert not gradient_vs_other, pairs


def test_decode_image_pixels_real_matches_pil(spark):
    """Where Pillow IS installed: the vendored kernel (and therefore
    the PIL-free executor path) is bit-exact against PIL's own
    convert('L') + BOX resize on the same payloads, including
    NON-aligned sizes where the fixed-point rounding bites."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
        imaging,
    )

    rng = np.random.default_rng(11)
    for w, h in [(64, 64), (72, 64), (17, 23), (9, 8), (200, 31)]:
        arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        payload = imaging.png_encode(arr)
        ref = Image.open(io.BytesIO(payload)).convert("L").resize(
            (9, 8), resample=Image.Resampling.BOX
        )
        assert np.array_equal(
            imaging.gray_grid(payload).reshape(8, 9),
            np.asarray(ref, dtype=np.int32),
        ), (w, h)
        # RGB → L parity too
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = imaging.png_encode(rgb)
        ref = Image.open(io.BytesIO(payload)).convert("L").resize(
            (9, 8), resample=Image.Resampling.BOX
        )
        assert np.array_equal(
            imaging.gray_grid(payload).reshape(8, 9),
            np.asarray(ref, dtype=np.int32),
        ), (w, h, "rgb")


def test_decode_image_pixels_real_without_pil_contract():
    """Round-12 contract: decode_image_pixels_real no longer REQUIRES
    Pillow — PNG decodes through the vendored kernel; non-PNG payloads
    degrade to the zero grid (asserted in the band-exact test's
    corrupt row). This replaces the old plan-time ImportError."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed — the PIL path is preferred there")
    except ImportError:
        pass
    from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
        imaging,
    )

    grid = imaging.gray_grid(_test_png("gradient"))
    assert len(grid) == 72
    with pytest.raises(ValueError, match="not a PNG"):
        imaging.png_decode(b"not an image")


def test_torch_clip_adapter_protocol():
    """_TorchClipAdapter's stack/no_grad/numpy glue against real torch
    with a minimal model object — the adapter is the part the engine
    owns; CLIP itself is upstream."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("PIL")

    class _Model:
        def encode_image(self, imgs):
            # (n, 3, 4, 4) stacked batch → (n, 8) embeddings
            assert imgs.shape[1:] == (3, 4, 4)
            return torch.ones(imgs.shape[0], 8)

    adapter = encoders._TorchClipAdapter(
        _Model(), preprocess=lambda img: torch.zeros(3, 4, 4)
    )
    out = adapter.encode_image_batch([_png_bytes(4, 4), _png_bytes(6, 2)])
    assert out.shape == (2, 8)
    assert float(out[0][0]) == 1.0


def test_real_clip_end_to_end(spark):
    """Full UDF path with the real loader: only runs where torch AND
    the OpenAI clip package exist (a GPU cluster image)."""
    pytest.importorskip("torch")
    pytest.importorskip("clip")
    pytest.importorskip("PIL")
    df = spark.createDataFrame(
        [("a.png", _png_bytes(32, 32))], "filename string, content binary"
    )
    enc = encoders.stub_image_encoder_udf(dim=512)  # loader -> _try_real_clip
    row = df.select(enc("content").alias("v")).first()
    assert len(row["v"]) == 512


# ---- graceful degradation (runs HERE, no optional deps) ----


def test_missing_pil_contract():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed — the real-path tests above cover this")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="pillow"):
        multimodal.decode_image_real(b"x")
    # decode_image_meta_real no longer REQUIRES Pillow (r13): the
    # vendored PNG/JPEG header parsers serve the fallback — its
    # codec-free behavior is pinned in
    # tests/test_jpeg.py::test_decode_image_meta_real_codec_free


def test_loader_seam_returns_none_without_torch():
    try:
        import torch  # noqa: F401

        pytest.skip("torch installed — real loader may resolve")
    except ImportError:
        pass
    encoders._MODEL_CACHE.pop("clip", None)
    assert encoders._try_real_clip() is None  # stub branch, no raise
    encoders._MODEL_CACHE.pop("clip", None)


def test_jpeg_decode_close_to_pil():
    """Where Pillow IS installed: the vendored baseline-JPEG decoder
    (functions/jpeg.py) agrees with PIL's decode of the same bytes
    within the documented lossy-decoder freedoms (upsample filter +
    IDCT variant — jpeg.py module docstring): luma within a few
    levels, never structurally different. Runs on this module's own
    encoder output (baseline, both 4:4:4 and 4:2:0) so the pin needs
    no fixture files."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
        jpeg,
    )

    rng = np.random.default_rng(23)
    xx, yy = np.meshgrid(np.arange(57), np.arange(43))
    smooth = np.stack(
        [
            (np.sin(xx / 10) + 1) * 100 + 20,
            (np.cos(yy / 8) + 1) * 90 + 30,
            ((xx + yy) % 200) + 20,
        ],
        axis=-1,
    ).astype(np.uint8)
    for subsample in (False, True):
        payload = jpeg.jpeg_encode(smooth, subsample=subsample)
        ours = jpeg.jpeg_decode(payload)
        theirs = np.asarray(
            Image.open(io.BytesIO(payload)).convert("RGB"), dtype=np.int64
        )
        diff = np.abs(ours.astype(np.int64) - theirs)
        # identical except decoder-freedom pixels; chroma edges widen
        # under 4:2:0 upsample-filter differences
        assert diff.mean() < 2.0, (subsample, diff.mean())
        assert np.percentile(diff, 99) <= (8 if subsample else 4), subsample
    gray = rng.integers(0, 256, (31, 47), dtype=np.uint8)
    payload = jpeg.jpeg_encode(gray)
    ours = jpeg.jpeg_decode(payload)
    theirs = np.asarray(
        Image.open(io.BytesIO(payload)).convert("L"), dtype=np.int64
    )
    assert np.abs(ours.astype(np.int64) - theirs).max() <= 1

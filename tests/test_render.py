"""U7/U8 visual renderers (functions/render.py) — the reference's
matplotlib figures as deterministic numpy composites + vendored PNG
encode, so the artifacts exist (and are byte-reproducible) in this
matplotlib-free container.

Parity targets: SAM/test_sam_inference.py:81-187 (area-desc mask
overlay at alpha 0.35, original|overlay panel, segment stats) and
search_with_segments.py:475-581 (query on top, ≤10 ranked thumbnails
in a 5-column grid with rank+score captions).
"""

from __future__ import annotations

import numpy as np
import pytest

from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
    imaging,
    render,
)


def test_overlay_alpha_and_area_order():
    img = np.full((10, 12), 100, dtype=np.uint8)
    segs = [
        {"bbox": (0, 0, 4, 4)},            # small, index 0
        {"bbox": (0, 0, 12, 10)},          # full-frame, index 1 (larger)
    ]
    out = render.overlay_segments(img, segs)
    assert out.shape == (10, 12, 3) and out.dtype == np.uint8
    # outside the small bbox: one blend pass with color(1)
    expect_bg = np.clip(
        np.rint(0.65 * 100 + 0.35 * render._color(1)), 0, 255
    ).astype(np.uint8)
    assert (out[9, 11] == expect_bg).all()
    # inside the overlap: large first, then small on top (area order)
    inner = np.rint(
        0.65 * (0.65 * 100 + 0.35 * render._color(1)) + 0.35 * render._color(0)
    )
    # one rounding at the end of each pass — recompute exactly
    step1 = np.clip(np.rint(0.65 * 100 + 0.35 * render._color(1)), 0, 255)
    # overlay_segments blends in float then rounds once at the end;
    # replicate: base float carried through both passes
    f = 0.65 * (0.65 * 100 + 0.35 * render._color(1)) + 0.35 * render._color(0)
    assert (out[0, 0] == np.clip(np.rint(f), 0, 255)).all(), (out[0, 0], inner, step1)


def test_overlay_mask_and_validation():
    img = np.zeros((4, 4), dtype=np.uint8)
    m = np.zeros((4, 4), dtype=bool)
    m[1, 1] = True
    out = render.overlay_segments(img, [{"mask": m}])
    assert (out[0, 0] == [0, 0, 0]).all()
    assert (out[1, 1] > 0).any()
    with pytest.raises(ValueError, match="mask or a bbox"):
        render.overlay_segments(img, [{}])


def test_segment_panel_stats():
    img = np.zeros((8, 8), dtype=np.uint8)
    panel, stats = render.segment_panel(
        img, [{"bbox": (0, 0, 2, 2)}, {"bbox": (0, 0, 4, 4)}], gap=4
    )
    assert panel.shape == (8, 8 + 4 + 8, 3)
    assert stats == {
        "n_segments": 2, "avg_area": 10.0, "min_area": 4, "max_area": 16,
    }


def test_draw_text_stamps_glyphs():
    canvas = np.full((20, 40, 3), 255, dtype=np.uint8)
    render.draw_text(canvas, "1.5", 0, 0, scale=2)
    assert (canvas == 0).any()  # something was stamped
    # '1' column pattern: glyph row 0 is 010 — pixel (0,0) stays white,
    # (0,2..3) black at scale 2
    assert (canvas[0, 0] == 255).all()
    assert (canvas[0, 2] == 0).all()


def test_result_grid_layout_and_png_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    query = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
    results = [
        (rng.integers(0, 256, size=(16, 16), dtype=np.uint8), 0.9 - i / 10)
        for i in range(7)
    ]
    grid = render.result_grid(query, results, cols=5, cell=(48, 48))
    # 7 results → 2 rows below the query band
    pad, cap = 6, 16
    assert grid.shape == (
        pad + 48 + cap + 2 * (48 + cap + pad) + pad,
        5 * (48 + pad) + pad,
        3,
    )
    # thumbnails are the BOX resize of the inputs (check cell 0)
    t0 = imaging.box_resize(results[0][0], 48, 48)
    y0 = pad + 48 + cap + pad
    assert np.array_equal(grid[y0:y0 + 48, pad:pad + 48, 0], t0)
    # PNG round-trip through the vendored codec
    path = str(tmp_path / "grid.png")
    render.save_png(grid, path)
    back = imaging.png_decode(open(path, "rb").read())
    assert np.array_equal(back, grid)


def test_result_grid_caps_at_ten():
    q = np.zeros((8, 8), dtype=np.uint8)
    results = [(np.zeros((8, 8), dtype=np.uint8), 0.5)] * 15
    grid = render.result_grid(q, results, cols=5, cell=(24, 24))
    pad, cap = 6, 16
    assert grid.shape[0] == pad + 24 + cap + 2 * (24 + cap + pad) + pad


def test_cli_visualize_writes_grid(spark, tmp_path):
    """--visualize end-to-end on the embedding-only corpus: fallback
    heat-tiles, PNG written and decodable."""
    from data_feature_extraction_and_retrieval_pipeline_spark import cli
    from data_feature_extraction_and_retrieval_pipeline_spark.api import (
        Engine,
    )

    eng = Engine.from_sf_dir(spark, "/root/testdata/sf0.001")
    qpath = tmp_path / "q.png"
    qpath.write_bytes(
        imaging.png_encode(np.full((16, 16), 70, dtype=np.uint8))
    )
    viz = tmp_path / "out.png"
    args = cli.build_parser().parse_args(
        [
            "--image", str(qpath), "--mode", "whole", "--top-k", "4",
            "--visualize", str(viz),
        ]
    )
    import io

    out = io.StringIO()
    rc = cli.run(args, eng, model_loader=lambda: None, out=out)
    assert rc == 0 and viz.exists()
    arr = imaging.png_decode(viz.read_bytes())
    assert arr.ndim == 3 and arr.shape[2] == 3
    assert "Visualization saved" in out.getvalue()


def test_service_hybrid_visualize_returns_png(spark):
    """POST /search/hybrid with visualize=true answers a base64 PNG
    (the reference's figure payload), decodable by the vendored
    codec."""
    import base64
    import json as _json
    import urllib.request

    from data_feature_extraction_and_retrieval_pipeline_spark.api import (
        Engine,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.service import (
        serve,
    )

    eng = Engine.from_sf_dir(spark, "/root/testdata/sf0.001")
    srv = serve(eng, model_loader=lambda: None)
    base = "http://{}:{}".format(*srv.server_address)
    try:
        boundary = "viz-test-1"
        parts = (
            f'--{boundary}\r\nContent-Disposition: form-data; '
            f'name="visualize"\r\n\r\ntrue\r\n'
            f'--{boundary}\r\nContent-Disposition: form-data; '
            f'name="top_k"\r\n\r\n3\r\n'
            f'--{boundary}\r\nContent-Disposition: form-data; '
            f'name="image"; filename="q.png"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n"
        ).encode() + b"viz-payload" + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            base + "/search/hybrid",
            data=parts,
            headers={
                "Content-Type": f"multipart/form-data; boundary={boundary}"
            },
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            body = _json.loads(resp.read())
        assert body["results"]
        png = base64.b64decode(body["visualization"])
        arr = imaging.png_decode(png)
        assert arr.ndim == 3
    finally:
        srv.shutdown()

"""Driver-side visual renderers (U7/U8) — numpy + the vendored PNG
encoder, no matplotlib.

The reference ships two matplotlib visualizers:

- U7, the SAM annotation overlay (SAM/test_sam_inference.py:81-187):
  masks sorted by area descending, each tinted with a random color at
  alpha 0.35 over the original image, original|overlay side by side,
  with segment-count/area stats.
- U8, the search-result grid (search_with_segments.py:475-581): the
  query image on top, up to 10 result thumbnails in a 5-column grid,
  each captioned with its rank and score.

These are the same artifacts as PURE-NUMPY composites: deterministic
(colors are seeded per segment index, not np.random — so the output is
byte-reproducible and testable), encoded to real PNG bytes by
functions/imaging.py. Rendering is driver-side display work in the
reference too — it sits outside the query engine, consuming collected
rows — so nothing here touches Spark; callers hand in decoded arrays
(operators/multimodal.py) and collected result rows.

Score text is drawn with a built-in 3×5 digit font (0-9, '.', '-'):
enough for rank + score captions without a font stack.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

# deterministic mask palette — index-seeded golden-ratio hues, the
# stand-in for the reference's np.random.random(3) per annotation
_ALPHA = 0.35


def _color(i: int) -> np.ndarray:
    h = (i * 0.6180339887498949) % 1.0
    # simple HSV(h, 0.85, 0.95) → RGB
    s, v = 0.85, 0.95
    j = int(h * 6.0)
    f = h * 6.0 - j
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    rgb = [
        (v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)
    ][j % 6]
    return np.asarray([int(255 * c) for c in rgb], dtype=np.float64)


def _as_rgb(img: np.ndarray) -> np.ndarray:
    """Grayscale (H,W) or RGB/RGBA (H,W,C) → float64 (H,W,3)."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    return a[:, :, :3].astype(np.float64)


# -- U7: segment overlay ----------------------------------------------------


def overlay_segments(
    image: np.ndarray, segments: Sequence[dict]
) -> np.ndarray:
    """Tint each segment's region over the image at alpha 0.35,
    area-descending (larger masks first, so small segments stay
    visible on top — the reference's sort). Each segment dict carries
    either a boolean ``mask`` (H,W) or an integer ``bbox``
    (x, y, w, h); ``area`` defaults to the mask/bbox pixel count.
    Returns uint8 (H,W,3)."""
    base = _as_rgb(image)
    h, w = base.shape[:2]
    segs = []
    for i, s in enumerate(segments):
        if "mask" in s and s["mask"] is not None:
            m = np.asarray(s["mask"], dtype=bool)
            area = s.get("area", int(m.sum()))
        elif "bbox" in s and s["bbox"] is not None:
            x, y, bw, bh = (int(v) for v in s["bbox"])
            m = np.zeros((h, w), dtype=bool)
            m[max(y, 0):min(y + bh, h), max(x, 0):min(x + bw, w)] = True
            area = s.get("area", int(m.sum()))
        else:
            raise ValueError("segment needs a mask or a bbox")
        segs.append((int(area), i, m))
    segs.sort(key=lambda t: (-t[0], t[1]))
    out = base.copy()
    for _area, i, m in segs:
        out[m] = (1 - _ALPHA) * out[m] + _ALPHA * _color(i)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def segment_panel(
    image: np.ndarray, segments: Sequence[dict], gap: int = 4
) -> tuple[np.ndarray, dict]:
    """U7 composite: original | overlay side by side (the reference's
    two-axes figure) plus the stats block it prints (segment count,
    avg/min/max area). Returns (uint8 panel, stats dict)."""
    left = np.clip(np.rint(_as_rgb(image)), 0, 255).astype(np.uint8)
    right = overlay_segments(image, segments)
    h = left.shape[0]
    sep = np.full((h, gap, 3), 255, dtype=np.uint8)
    panel = np.concatenate([left, sep, right], axis=1)
    areas = [
        int(
            s.get(
                "area",
                int(np.asarray(s["mask"]).sum())
                if s.get("mask") is not None
                else int(s["bbox"][2]) * int(s["bbox"][3]),
            )
        )
        for s in segments
    ]
    stats = {
        "n_segments": len(segments),
        "avg_area": float(np.mean(areas)) if areas else 0.0,
        "min_area": min(areas) if areas else 0,
        "max_area": max(areas) if areas else 0,
    }
    return panel, stats


# -- tiny 3×5 glyphs for rank/score captions --------------------------------

_GLYPHS = {
    "0": "111101101101111", "1": "010110010010111",
    "2": "111001111100111", "3": "111001111001111",
    "4": "101101111001001", "5": "111100111001111",
    "6": "111100111101111", "7": "111001010010010",
    "8": "111101111101111", "9": "111101111001111",
    ".": "000000000000010", "-": "000000111000000",
    " ": "000000000000000", "#": "101111101111101",
}


def draw_text(
    canvas: np.ndarray, text: str, x: int, y: int,
    scale: int = 2, color=(0, 0, 0),
) -> None:
    """Stamp ``text`` onto an (H,W,3) uint8 canvas with the built-in
    3×5 digit font (unknown characters render as '#')."""
    col = np.asarray(color, dtype=np.uint8)
    cx = x
    for ch in str(text):
        bits = _GLYPHS.get(ch, _GLYPHS["#"])
        for r in range(5):
            for c in range(3):
                if bits[r * 3 + c] == "1":
                    y0, x0 = y + r * scale, cx + c * scale
                    canvas[y0:y0 + scale, x0:x0 + scale] = col
        cx += 4 * scale


# -- U8: result grid ---------------------------------------------------------


def result_grid(
    query_image: np.ndarray,
    results: Sequence[tuple[np.ndarray, float]],
    cols: int = 5,
    cell: tuple[int, int] = (96, 96),
    max_results: int = 10,
) -> np.ndarray:
    """U8 composite: the query image on top, up to ``max_results``
    result thumbnails in a ``cols``-column grid below, each cell
    captioned with its rank and score (3×5 digit font) — the
    reference's figure layout with its 10-result cap. Thumbnails are
    BOX-resized per channel (the same kernel the pHash decode uses).
    Returns uint8 (H,W,3)."""
    from . import imaging

    results = list(results)[: int(max_results)]
    cw, ch = int(cell[0]), int(cell[1])
    pad, caption_h = 6, 16
    n = len(results)
    rows = max(1, (n + cols - 1) // cols) if n else 0

    def thumb(img: np.ndarray) -> np.ndarray:
        rgb = np.clip(np.rint(_as_rgb(img)), 0, 255).astype(np.uint8)
        return np.stack(
            [imaging.box_resize(rgb[:, :, c], cw, ch) for c in range(3)],
            axis=-1,
        )

    q = thumb(query_image)
    width = max(cols * (cw + pad) + pad, cw + 2 * pad)
    height = (
        pad + ch + caption_h
        + rows * (ch + caption_h + pad)
        + pad
    )
    canvas = np.full((height, width, 3), 255, dtype=np.uint8)
    qx = (width - cw) // 2
    canvas[pad:pad + ch, qx:qx + cw] = q
    draw_text(canvas, "0", qx, pad + ch + 3)  # rank 0 = the query row

    y0 = pad + ch + caption_h + pad
    for idx, (img, score) in enumerate(results):
        r, c = divmod(idx, cols)
        x = pad + c * (cw + pad)
        y = y0 + r * (ch + caption_h + pad)
        canvas[y:y + ch, x:x + cw] = thumb(img)
        draw_text(canvas, f"{idx + 1} {float(score):.4f}", x, y + ch + 3)
    return canvas


def to_png(arr: np.ndarray) -> bytes:
    """Encode a rendered uint8 canvas as PNG bytes (vendored encoder
    — a user opens the artifact in any viewer, same as the
    reference's fig.savefig output)."""
    from . import imaging

    a = np.asarray(arr, dtype=np.uint8)
    return imaging.png_encode(a)


def save_png(arr: np.ndarray, path: str) -> str:
    with open(path, "wb") as f:
        f.write(to_png(arr))
    return path

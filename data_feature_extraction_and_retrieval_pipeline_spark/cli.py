"""Command-line search — the reference's CLI surface
(search_with_segments.py:628-717) over the :class:`~.api.Engine`
facade, completing the user-facing trio (Python API · HTTP service ·
CLI). Flag-for-flag with the reference: ``--image --mode
whole|segment|hybrid|tags --tags ... --top-k --whole-weight
--segment-weight``, the same validation messages ("--tags required
for tag mode", "--image required for whole, segment, or hybrid
modes"), the same exit codes, and hybrid as the default mode.

Differences, deliberate: results print as JSON lines (one object per
hit — machine-consumable where the reference pretty-prints), and
``--output`` writes the result rows to a JSON file. Round 12 closes
the formerly scoped-out U8 visualizer: ``--visualize PATH.png``
renders the reference's result grid (query on top, ranked thumbnails
+ scores below — search_with_segments.py:475-581) through the
matplotlib-free numpy renderer (functions/render.py), sourcing
thumbnails from the engine's ``content`` column when the bound images
table carries one (ml_image_dir_scan corpora do) and falling back to
deterministic embedding tiles when it does not — every corpus gets a
grid.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="dferp-search",
        description="Advanced content search with segmented features and tags",
    )
    parser.add_argument("--image", type=str, help="Query image path")
    parser.add_argument(
        "--mode",
        type=str,
        choices=["whole", "segment", "hybrid", "tags"],
        default="hybrid",
        help="Search mode (default: hybrid)",
    )
    parser.add_argument(
        "--tags",
        type=str,
        nargs="+",
        help="Tags to search for (for tag mode) or filter by",
    )
    parser.add_argument(
        "--top-k", type=int, default=10, help="Number of results to return"
    )
    parser.add_argument(
        "--whole-weight",
        type=float,
        default=0.4,
        help="Weight for whole image similarity in hybrid mode",
    )
    parser.add_argument(
        "--segment-weight",
        type=float,
        default=0.6,
        help="Weight for segment similarity in hybrid mode",
    )
    parser.add_argument(
        "--sf-dir",
        type=str,
        default="/root/testdata/sf0.001",
        help="Table directory to bind the engine to",
    )
    parser.add_argument(
        "--output", type=str, help="Also write results to this JSON file"
    )
    parser.add_argument(
        "--visualize",
        type=str,
        help="Render the result grid (query + ranked thumbnails) to "
        "this PNG path — the reference's visualize_results figure",
    )
    return parser


def _vec_tile(values, size: int = 64):
    """Deterministic grayscale tile for an id without decodable image
    content: the embedding (or raw bytes) laid out as a square
    heat-tile — a stable visual stand-in so --visualize works on
    embedding-only corpora too."""
    import numpy as np

    v = np.asarray(list(values), dtype=np.float64)
    if v.size == 0:
        v = np.zeros(1)
    n = int(np.ceil(np.sqrt(v.size)))
    pad = np.zeros(n * n)
    pad[: v.size] = v
    g = pad.reshape(n, n)
    rng = float(g.max() - g.min()) or 1.0
    g8 = np.rint((g - g.min()) / rng * 255).astype(np.uint8)
    k = max(1, size // n)
    return np.kron(g8, np.ones((k, k), dtype=np.uint8))


def _result_thumbs(engine, rows):
    """(thumbnail, score) pairs for collected result rows: decode the
    images table's ``content`` column when present (vendored PNG
    decode / PIL-free), else embedding heat-tiles."""
    import numpy as np

    from pyspark.sql import functions as F

    from .functions import imaging

    id_col = engine.image_col
    ids = [r[id_col] for r in rows]
    cols = set(engine.images.columns)
    want = [id_col] + (
        ["content"] if "content" in cols else ["embedding"]
    )
    by_id = {
        r[0]: r[1]
        for r in engine.images.filter(F.col(id_col).isin(ids))
        .select(*want)
        .collect()
    }

    def thumb(v):
        if isinstance(v, (bytes, bytearray)):
            try:
                return imaging.to_gray(imaging.png_decode(bytes(v)))
            except Exception:
                return _vec_tile(bytes(v)[:4096])
        return _vec_tile(v or [0.0])

    def score_of(r):
        for k in (
            "score", "hybrid_score", "avg_similarity", "matched_tags"
        ):
            if k in r and r[k] is not None:
                return float(r[k])
        return 0.0

    return [
        (thumb(by_id.get(r[id_col])), score_of(r))
        for r in rows
    ]


def render_result_grid(engine, payload, rows):
    """The U8 grid as a uint8 canvas for collected result rows —
    shared by the CLI's --visualize and the service's
    ``visualize=true`` response field."""
    from .functions import imaging, render

    if payload is not None:
        try:
            query_img = imaging.to_gray(imaging.png_decode(payload))
        except Exception:
            query_img = _vec_tile(payload[:4096])
    else:  # tags mode has no query image — a neutral tile stands in
        query_img = _vec_tile([0.0])
    return render.result_grid(query_img, _result_thumbs(engine, rows))


def _write_grid(engine, payload, rows, path, out) -> None:
    from .functions import render

    render.save_png(render_result_grid(engine, payload, rows), path)
    print(f"Visualization saved to {path}", file=out)


def run(args, engine, model_loader=None, out=None) -> int:
    """The mode dispatch body, engine-injectable for tests (the
    reference's main() against a live ES; here the engine and model
    seam arrive as parameters and ``main()`` binds the defaults)."""
    out = out or sys.stdout

    def emit(df):
        rows = [r.asDict(recursive=True) for r in df.limit(args.top_k).collect()]
        for row in rows:
            print(json.dumps(row, default=float), file=out)
        if args.output:
            with open(args.output, "w") as f:
                json.dump(rows, f, indent=1, default=float)
        return rows

    if args.mode == "tags":
        if not args.tags:
            print("Error: --tags required for tag mode", file=out)
            return 1
        rows = emit(
            engine.search("tags", tags=args.tags, top_k=args.top_k)
        )
        if getattr(args, "visualize", None):
            _write_grid(engine, None, rows, args.visualize, out)
        return 0

    if not args.image:
        print(
            "Error: --image required for whole, segment, or hybrid modes",
            file=out,
        )
        return 1
    with open(args.image, "rb") as f:
        payload = f.read()
    kwargs = {}
    if args.tags:
        kwargs["tag_filter"] = args.tags
    if args.mode == "hybrid":
        kwargs["whole_weight"] = args.whole_weight
        kwargs["segment_weight"] = args.segment_weight
    rows = emit(
        engine.search_content(
            payload,
            filename=args.image,
            mode=args.mode,
            top_k=args.top_k,
            model_loader=model_loader,
            **kwargs,
        )
    )
    if getattr(args, "visualize", None):
        _write_grid(engine, payload, rows, args.visualize, out)
    return 0


def main(argv: list[str] | None = None) -> int:
    from . import get_spark
    from .api import Engine

    args = build_parser().parse_args(argv)
    spark = get_spark()
    engine = Engine.from_sf_dir(spark, args.sf_dir)
    return run(args, engine)


if __name__ == "__main__":
    raise SystemExit(main())

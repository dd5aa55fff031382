"""Command-line search — the reference's CLI surface
(search_with_segments.py:628-717) over the :class:`~.api.Engine`
facade, completing the user-facing trio (Python API · HTTP service ·
CLI). Flag-for-flag with the reference: ``--image --mode
whole|segment|hybrid|tags --tags ... --top-k --whole-weight
--segment-weight``, the same validation messages ("--tags required
for tag mode", "--image required for whole, segment, or hybrid
modes"), the same exit codes, and hybrid as the default mode.

Differences, both deliberate: results print as JSON lines (one object
per hit — machine-consumable where the reference pretty-prints), and
the trailing matplotlib grid (visualize_results) is scoped out
(SURVEY §2.8) — ``--output`` instead writes the result rows to a JSON
file, the data that grid would have rendered.
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
    return parser


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
        emit(
            engine.search("tags", tags=args.tags, top_k=args.top_k)
        )
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
    emit(
        engine.search_content(
            payload,
            filename=args.image,
            mode=args.mode,
            top_k=args.top_k,
            model_loader=model_loader,
            **kwargs,
        )
    )
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

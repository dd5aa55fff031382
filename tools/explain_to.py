#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries into a directory —
the before/after plan evidence for optimization rounds.

Usage: python tools/explain_to.py OUTDIR SUFFIX QUERY [QUERY ...]

Writes OUTDIR/<query>_<SUFFIX>.txt (e.g. plans/r13/api_percolate_before.txt).
Runs at sf0.001 with the same session shape as tools/dump_plans.py —
plan structure (Exchange count, join strategy, PushedFilters,
BatchEvalPython nodes) is SF-invariant; only AQE runtime stats are not,
and AQE re-planning is not captured here anyway.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, ".")


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)

    import data_feature_extraction_and_retrieval_pipeline_spark as dferp
    from data_feature_extraction_and_retrieval_pipeline_spark import queries as Q

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = dferp.get_spark(
        app_name="dferp-explain",
        cpus=4,
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = outdir / f"{name}_{suffix}.txt"
        path.write_text(txt)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

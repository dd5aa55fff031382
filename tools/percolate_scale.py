#!/usr/bin/env python
"""Measure the percolator's standing-query scale ceiling.

The expression form (streaming.percolate) inlines one expression tree
per registered query — O(|queries|·|terms|) ANALYSIS + CODEGEN cost
per plan — while the broadcast-join form (percolate_join) carries the
registry as a broadcast table, so its plan cost is independent of
|queries|. This script times BOTH at growing registry sizes and
prints the crossover, which SCALING.md documents and
api.Percolator's auto strategy encodes.

Usage: PERC_FORMS=both|expr|join python tools/percolate_scale.py \
           [sf_dir] [sizes...]
       (default /root/testdata/sf0.01, sizes 10 100 1000 3000 10000)

PERC_FORMS=join exists because the expression form does not DEGRADE
past its ceiling, it DIES: at 300 2-term standing queries the
generated whole-stage-codegen class OOMs the JVM heap inside janino
(measured 2026-08-15; the wrapped error is recorded), so the join
form's large sizes must be timed in a fresh process.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

EXPR_SKIP_AFTER_S = 300.0  # once a form needs >5 min, stop growing it


def main() -> None:
    import data_feature_extraction_and_retrieval_pipeline_spark as dferp
    from data_feature_extraction_and_retrieval_pipeline_spark.sources import (
        load_table,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming.percolate import (
        StandingQuery,
        bm25_stats,
        bm25_stats_table,
        percolate,
        percolate_join,
    )
    from pyspark.sql import functions as F
    from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
        text as X,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sizes = [int(x) for x in sys.argv[2:]] or [10, 100, 1000, 3000, 10000]

    spark = dferp.get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # registry vocabulary: the most frequent corpus tokens (bounded),
    # deterministic order
    vocab = [
        r["term"]
        for r in docs.select(
            F.explode(X.tokens(F.coalesce(F.col("text"), F.lit("")))).alias(
                "term"
            )
        )
        .groupBy("term")
        .count()
        .orderBy(F.desc("count"), "term")
        .limit(400)
        .collect()
    ]

    def registry(n: int) -> list[StandingQuery]:
        # 2-term queries cycling through vocab pairs; low threshold so
        # hits exist and the filter doesn't short-circuit the work
        return [
            StandingQuery(
                f"q{i}",
                (vocab[i % len(vocab)], vocab[(i * 7 + 3) % len(vocab)]),
                0.2,
            )
            for i in range(n)
        ]

    # frozen index-time artifacts, built once over the FULL vocab so
    # every registry size reuses them (the serving shape)
    wide_stats = bm25_stats(docs, vocab).collect()
    wide_stats_df = spark.createDataFrame(
        wide_stats, schema=bm25_stats(docs, vocab).schema
    )
    ts, tot = bm25_stats_table(docs, vocab)
    ts_rows = ts.collect()
    tot_rows = tot.collect()
    term_stats = spark.createDataFrame(ts_rows, schema=ts.schema)
    totals = spark.createDataFrame(tot_rows, schema=tot.schema)
    stats_rows = [(r["term"], r["df"]) for r in ts_rows]
    totals_rows = [(r["n"], r["sumdl"]) for r in tot_rows]

    import os

    forms = os.environ.get("PERC_FORMS", "both")
    results = []
    expr_dead = forms == "join"
    join_dead = forms == "expr"
    for n in sizes:
        qs = registry(n)
        row: dict = {"n_queries": n}

        if not expr_dead:
            try:
                t0 = time.time()
                out = percolate(docs, qs, wide_stats_df, vocab)
                row["expr_plan_s"] = round(time.time() - t0, 2)
                t0 = time.time()
                row["expr_rows"] = out.count()
                row["expr_exec_s"] = round(time.time() - t0, 2)
                if row["expr_plan_s"] + row["expr_exec_s"] > EXPR_SKIP_AFTER_S:
                    expr_dead = True
            except Exception as e:  # the codegen-OOM ceiling
                row["expr_error"] = f"{type(e).__name__}"
                expr_dead = True
        else:
            row["expr_plan_s"] = row["expr_exec_s"] = None

        if not join_dead:
            t0 = time.time()
            out = percolate_join(docs, qs, term_stats, totals)
            row["join_plan_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            row["join_rows"] = out.count()
            row["join_exec_s"] = round(time.time() - t0, 2)
            # the rows/inline-VALUES serving path (round 9): the whole
            # registry+stats as ONE LocalRelation broadcast — times the
            # VALUES parse at |pairs| rows on top of the same pipeline
            t0 = time.time()
            out_r = percolate_join(
                docs, qs, stats_rows=stats_rows, totals_rows=totals_rows
            )
            row["rows_plan_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            row["rows_rows"] = out_r.count()
            row["rows_exec_s"] = round(time.time() - t0, 2)
            assert row["rows_rows"] == row["join_rows"], row
            if row["join_plan_s"] + row["join_exec_s"] > EXPR_SKIP_AFTER_S:
                join_dead = True
        else:
            row["join_plan_s"] = row["join_exec_s"] = None

        if row.get("expr_rows") is not None and row.get("join_rows") is not None:
            assert row["expr_rows"] == row["join_rows"], row
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()

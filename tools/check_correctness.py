#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
(sf0.01 by default), compare row count + column names + order-
insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, ".")


def normalize(rows, columns):
    """Sort columns by name, rows by value — order-insensitive form."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(v):
        if v is None:
            return ("none",)
        if isinstance(v, bool):
            return ("bool", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("nan",)
            # collapse -0.0 / float32 leftovers
            return ("float", round(v, 9))
        if isinstance(v, int):
            return ("int", v)
        if isinstance(v, (list, tuple)):
            return ("list", tuple(norm_cell(x) for x in v))
        return ("str", str(v))

    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    import data_feature_extraction_and_retrieval_pipeline_spark as dferp

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = dferp.get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        # partial fixture dirs (e.g. the synth documents+embeddings
        # scale corpora) register only the tables they carry; a query
        # over a missing table then fails loudly at run time. Spark-
        # written tables are DIRECTORIES of part files — glob those.
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            con.sql(
                f"CREATE VIEW {name} AS SELECT * FROM '{path}/*.parquet'"
            )
        elif os.path.exists(path):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    n_ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_ran += 1
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            dferp.caching.release()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            a, b = normalize(srows, scols), normalize(orows, ocols)
            if a != b:
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                for i in diff:
                    problems.append(f"row {i}: {a[i]} != {b[i]}")
                if not diff:
                    problems.append("value mismatch (tail rows)")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match oracle")

    # report over the queries actually RUN — a filtered invocation
    # must not print the full-registry denominator (it reads as a
    # full sweep when it is not)
    suffix = "" if not only else f" (filtered from {len(qs)})"
    print(f"\n{n_ran - len(failures)}/{n_ran} passed{suffix}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

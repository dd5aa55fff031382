#!/usr/bin/env python
"""Scale correctness gate: run every oracled query whose SQL touches
ONLY the documents/embeddings tables against a synth scale corpus
(tools/scaling_report.py fixtures — 10x the sf0.1 rows by default),
with the full row + schema + value comparison of check_correctness.

The query set is DERIVED, not hand-listed: each oracle's SQL is
scanned for table references, and a query qualifies when its
referenced set is a non-empty subset of the tables the synth corpus
carries. New doc/emb queries are picked up automatically; a query
whose Spark side touches a table its oracle doesn't fails loudly at
run time rather than being silently skipped.

Usage: python tools/scale_check.py [synth_dir]
  synth_dir defaults to /tmp/dferp_scale/x10 (create it with
  tools/scaling_report.py, which writes counter-seeded corpora).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, ".")

ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def synth_tables(synth_dir: str) -> set[str]:
    """The tables the synth corpus actually carries — derived from the
    directory (synth.write_synth_sf grows over rounds: documents +
    embeddings since r6, events since r9), so newly-synthesized tables
    automatically pull their whole query family into the gate."""
    return {
        t
        for t in ALL_TABLES
        if os.path.exists(os.path.join(synth_dir, f"{t}.parquet"))
    }


def coverable_queries(tables: set[str]) -> list[str]:
    import __spark_entry__ as entry_mod

    out = []
    for name, sql in entry_mod.oracle_sql().items():
        refs = {t for t in ALL_TABLES if re.search(rf"\b{t}\b", sql)}
        if refs and refs <= tables:
            out.append(name)
    return out


def main() -> int:
    synth_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dferp_scale/x10"
    if not os.path.isdir(synth_dir):
        print(
            f"synth dir {synth_dir} missing — run tools/scaling_report.py "
            "first (it writes the counter-seeded corpora)",
            file=sys.stderr,
        )
        return 2
    tables = synth_tables(synth_dir)
    names = coverable_queries(tables)
    print(
        f"{len(names)} oracled queries derived from the registry "
        f"(synth tables: {sorted(tables)}); checking against {synth_dir}",
        file=sys.stderr,
    )
    return subprocess.call(
        [sys.executable, "tools/check_correctness.py", synth_dir, *names]
    )


if __name__ == "__main__":
    raise SystemExit(main())

"""The driver contract must work under a CALLER-provided vanilla
SparkSession (no engine-specific confs) — regression for the
TIMESTAMP(NANOS) read failure.

Runs in a subprocess because the in-process pytest session already
carries the engine confs (getOrCreate would reuse it).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
rows = E.entry(spark).collect()
assert len(rows) == 10, len(rows)
qs = E.queries()
oracles = E.oracle_sql()
assert set(oracles) <= set(qs)
# one query per input table family, incl. the nanos-timestamp events
for name in ("q1_pricing_summary", "knn_whole", "text_token_count",
             "events_tumbling_window"):
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, name
print("CONTRACT_OK")
"""


def test_contract_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": str(REPO)}],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert "CONTRACT_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )

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


SCRIPT_PRUNE = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

import data_feature_extraction_and_retrieval_pipeline_spark as dferp
from data_feature_extraction_and_retrieval_pipeline_spark import caching, queries as Q
from data_feature_extraction_and_retrieval_pipeline_spark.sources import readers

SF = "/root/testdata/sf0.001"

def mk():
    return (SparkSession.builder.master("local[2]")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate())

readers.enable_table_cache(True)
Q.enable_plan_cache(True)

s1 = mk()
readers.load_table(s1, SF, "documents").count()
Q.queries()["q1_pricing_summary"](s1, SF).collect()
n_tables_1 = len(readers._TABLE_CACHE)
n_plans_1 = len(Q._PLAN_CACHE)
assert n_tables_1 >= 1 and n_plans_1 >= 1, (n_tables_1, n_plans_1)
id1 = id(s1)
s1.stop()
SparkSession.builder._options = {}

s2 = mk()
readers.load_table(s2, SF, "documents").count()   # miss -> prune dead
Q.queries()["q1_pricing_summary"](s2, SF).collect()
caching.release()                                  # drops dead-session ledger rows
assert not any(k[0] == id1 for k in readers._TABLE_CACHE), "dead table cache kept"
assert not any(k[0] == id1 for k in Q._PLAN_CACHE), "dead plan cache kept"
print("PRUNE_OK")
"""


def test_dead_session_caches_pruned():
    """Stopping a session and starting another must evict the dead
    session's table/plan cache entries (liveness pruning)."""
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT_PRUNE % {"repo": str(REPO)}],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert "PRUNE_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )


def test_registry_rotation_invariants():
    """The rotation contract the driver head depends on: exactly the
    first 50 entries are evaluated, so they must be 50 UNIQUE, all-
    oracled names; every _DRIVER_ORDER name must exist; rows-only
    entries stay in the tail; and every registered oracle belongs to a
    registered query."""
    import sys

    sys.path.insert(0, str(REPO))
    from data_feature_extraction_and_retrieval_pipeline_spark import queries as Q

    names = list(Q.queries())
    oracles = Q.oracle_sql()
    head = names[:50]
    assert len(head) == 50
    assert len(set(head)) == 50, "duplicate names in the driver head"
    missing = [n for n in head if n not in oracles]
    assert not missing, f"head entries without oracles: {missing}"
    unknown = [n for n in Q._DRIVER_ORDER if n not in Q._QUERIES]
    assert not unknown, f"_DRIVER_ORDER names not registered: {unknown}"
    tail = names[-len(Q._ROWS_ONLY_TAIL):]
    assert tail == [n for n in Q._ROWS_ONLY_TAIL if n in Q._QUERIES]
    assert all(n not in oracles for n in tail), "rows-only entry has an oracle"
    assert set(oracles) <= set(Q._QUERIES)

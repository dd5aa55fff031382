"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference feature-extraction & retrieval pipeline
(tyasemin/Data-Feature-Extraction-and-Retrieval-Pipeline).

Architecture is idiomatic Spark — DataFrame/SQL plans optimized by
Catalyst, Arrow-batched pandas UDFs only where built-ins can't express
the semantics (model-backed encoders), Structured Streaming for
incremental ingest.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing and
                   cluster-scale defaults (AQE, Arrow, shuffle sizing).
- ``schemas``    : canonical StructTypes for every table (SURVEY.md §1.2).
- ``sources``    : readers/writers — parquet tables, BOM-aware CSV,
                   JSON feature dirs, binary image dirs (SURVEY.md §2.1).
- ``functions``  : column-level building blocks — vector math, text
                   cleansing/analysis, score calibration (SURVEY.md §2.7).
- ``operators``  : composed query operators — ETL, retrieval Q1-Q4,
                   dedup, analytics, similarity search (SURVEY.md §2).
- ``streaming``  : Structured Streaming ingest/windowed aggregation and
                   stateful sessionization (applyInPandasWithState).
- ``ml``         : model-backed UDF surface (stub encoders by default).
- ``api``        : the user-facing Engine facade — the reference's four
                   search modes as one dispatcher (SURVEY.md §2.10).
"""

__version__ = "0.1.0"

# The convenience re-exports need pyspark; the hot-serving boot path
# (serving.HotSearchIndex.load in an N-shard serving process) does
# not. Degrade instead of failing so `from <pkg>.serving import
# HotSearchIndex` works on a numpy-only box — the build-once/serve-
# forever split (tests/test_serving.py::test_load_boots_without_pyspark
# runs exactly that, with pyspark import-masked).
try:
    from .session import get_spark  # noqa: F401
    from .api import Engine  # noqa: F401
    from . import caching  # noqa: F401
except ImportError:  # Spark-free serving process
    pass

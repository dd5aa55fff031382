"""Streaming deduplication for continuous training-data ingest.

A 100 TB corpus is not ingested once — it arrives as a stream, and
exact dedup must happen ON the stream or the batch dedup pass gets
rerun over the whole corpus per delivery. The operator is the
streaming twin of ``operators/dedup.py::exact_dedup``: rows carry the
same cheap (length, xxhash64) content fingerprint, and
``dropDuplicatesWithinWatermark`` keeps the seen-set state bounded by
the event-time horizon — the watermark is the state-eviction contract,
exactly like the windowed aggregations in ``ingest.py``.

Scale: state is O(distinct fingerprints inside the horizon), 16 bytes
of key each, partitioned by fingerprint across executors; no shuffle
carries document payloads. Late duplicates beyond the horizon are the
documented trade — at that point the write-time batch dedup
(exact_dedup over the landed table) is the backstop, which is how
production pipelines layer the two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fingerprint_columns(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach the exact-dedup content fingerprint (length + xxhash64 —
    the same 16-byte key ``operators/dedup.py::exact_dedup`` groups
    on) so streaming and batch dedup agree on identity."""
    return df.withColumn("__len", F.length(F.col(text_col))).withColumn(
        "__fp", F.xxhash64(F.col(text_col))
    )


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Drop exact-duplicate documents on a stream.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``):
    the seen-fingerprint state is evicted once the watermark passes,
    so state stays bounded on an unbounded stream — the plain variant
    would grow state forever. Within-horizon duplicates are dropped
    regardless of which micro-batch they arrive in.
    """
    keyed = fingerprint_columns(stream, text_col=text_col)
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__len", "__fp"])
        .drop("__len", "__fp")
    )

"""Structured Streaming surface (SURVEY.md §2.11, build plan M6).

The reference has no streaming operators — its online path is a
request/response Flask service. The rebuild's incremental-ingest
story (SRS §4.1-4.2: new uploads trigger similarity display and
auto-tagging) maps to a file-source stream + windowed aggregation
with a watermark for late data.

``tumbling_window_counts`` is the batch-equivalent transformation —
the SAME function is applied to a static frame (oracle-checkable) and
to a streaming frame (tests/test_streaming.py), which is the
Structured Streaming contract: one query, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_window_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts + value sum per event_type.

    On a stream, the watermark bounds state: windows older than the
    watermark are finalized and evicted, so state size is O(types ×
    active windows) no matter how long the stream runs.
    """
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def hopping_window_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Hopping (sliding) window counts + value sum per event_type:
    each event lands in duration/slide overlapping windows — the
    moving-average/trend primitive tumbling windows can't express.

    Same state contract as the tumbling form on a stream: the
    watermark finalizes and evicts windows, state is O(types ×
    duration/slide × active horizon). Batch and stream share this
    exact transformation (Structured Streaming's unified-API
    contract), and the epoch-grid window alignment is replayed by the
    DuckDB oracle (events_hopping_window).
    """
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration, slide).alias("win"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def streaming_tumbling_counts(
    spark,
    source_dir: str,
    schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """File-source streaming variant: new parquet files landing in
    ``source_dir`` are incrementally aggregated. Returns the streaming
    DataFrame; caller attaches a sink via ``writeStream``."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return tumbling_window_counts(
        stream, window_duration=window_duration, watermark=watermark
    )


def incremental_ingest(
    spark,
    source_dir: str,
    schema,
    index_path: str,
    checkpoint: str,
    transform=None,
    partition_by: list[str] | None = None,
):
    """Incremental index maintenance: stream new rows, apply the
    (optional) feature transform, append to the parquet index table.
    Append suffices for immutable feature rows; mutable rows use
    ``incremental_upsert``.

    ``partition_by`` keeps a WRITE-TIME index layout fresh on the
    stream: e.g. transform = encode → assign_clusters → PQ-encode and
    partition_by=["cluster"] maintains the IVF(-PQ) serving table
    incrementally — each micro-batch's rows land in their cluster
    directories, so probes keep pruning partitions as the index grows
    (tests/test_streaming.py pins the end-to-end flow)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    if transform is not None:
        stream = transform(stream)
    writer = (
        stream.writeStream.format("parquet")
        .option("path", index_path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer.trigger(availableNow=True).start()


def incremental_upsert(
    spark,
    source_dir: str,
    schema,
    index_path: str,
    checkpoint: str,
    key: str,
):
    """Streaming MERGE: each micro-batch is upserted into the index
    table via foreachBatch + full-outer-join merge (the reference's
    ES ``_op_type:update`` bulk path, S8, made incremental).

    Plain parquet has no transactional MERGE, so each batch writes the
    merged table to a temp dir and swaps it in (distributed write, no
    driver collect); a lakehouse format would replace the swap with
    `MERGE INTO`. Re-delivery dedup across restarts comes from the
    checkpointed source offsets.
    """
    import shutil
    from pathlib import Path

    from ..sources.writers import upsert_parquet

    retired = f"{index_path}__retired"

    def _merge(batch_df, batch_id: int) -> None:
        spark_l = batch_df.sparkSession
        target = Path(index_path)
        # Crash recovery: the swap below is rename(target→retired) +
        # rename(tmp→target) + delete(retired). A crash between the
        # renames leaves the index at `retired` and no target — roll
        # it back here before merging, so the accumulated index is
        # NEVER destroyed (the old rmtree-then-rename swap lost the
        # whole index to a crash in that window, and the next batch
        # silently rebuilt it from one batch's rows).
        if not target.exists() and Path(retired).exists():
            Path(retired).rename(target)
        if not target.exists():
            batch_df.write.mode("overwrite").parquet(index_path)
            return
        existing = spark_l.read.parquet(index_path)
        merged = upsert_parquet(existing, batch_df, key)
        tmp = f"{index_path}__tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if Path(retired).exists():  # leftover from an interrupted swap
            shutil.rmtree(retired)
        target.rename(retired)
        Path(tmp).rename(index_path)
        shutil.rmtree(retired)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def weekly_activity_stream(
    stream_events: DataFrame,
    sink_path: str,
    checkpoint: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Incrementally maintain the deduped weekly-activity table —
    (user, ISO-Monday week) — from an event stream: the materialized
    artifact behind retention reporting
    (operators/temporal.py::retention_from_activity), so the cohort
    triangle never rescans raw events. Each micro-batch projects and
    batch-locally dedupes its (user, week) pairs and APPENDS them to
    the activity sink; cross-batch repeats of the same pair are
    collapsed by the reader's distinct (idempotent — at warehouse
    scale this append+dedup-on-read becomes a lakehouse MERGE on the
    (user, week) key, same dataflow as incremental_upsert). Streaming
    state: NONE — a stateless map plus a batch-local aggregate; the
    activity table itself is the bounded artifact (one row per active
    user-week). NULL user/ts rows are dropped (they can anchor no
    activity). Returns the started availableNow StreamingQuery."""

    def _per_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = (
            batch_df.filter(
                F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
            )
            .select(
                F.col(user_col),
                F.date_trunc("week", F.col(ts_col)).alias("week"),
            )
            .distinct()
        )
        out.write.mode("append").parquet(sink_path)

    return (
        stream_events.writeStream.foreachBatch(_per_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

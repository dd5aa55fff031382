"""Structured Streaming contract tests: the same transformations run
in batch (oracle-checked) and on a stream, and agree.

Uses file-source streams over a temp copy of the sf0.001 events table
with ``availableNow`` one-shot triggers — the deterministic way to
exercise incremental execution, watermarks, and stateful operators
without wall-clock dependence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.operators import sessionize
from data_feature_extraction_and_retrieval_pipeline_spark.sources import load_table
from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
    sessionize_stream,
    tumbling_window_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events (ts normalized to TimestampType by the reader) split into
    3 parquet files so the stream sees multiple input splits."""
    d = tmp_path_factory.mktemp("events_src")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(3).write.mode("overwrite").parquet(str(d / "events"))
    return str(d / "events")


def _run_stream(spark, stream_df, checkpoint: str, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if stream_df.isStreaming else "complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_window_stream_matches_batch(spark, events_dir, tmp_path):
    ev = spark.read.parquet(events_dir)
    batch = tumbling_window_counts(ev, "1 hour")

    stream_src = spark.readStream.schema(ev.schema).parquet(events_dir)
    stream_agg = tumbling_window_counts(
        stream_src, "1 hour", watermark="2 hours"
    )
    q = (
        stream_agg.writeStream.format("memory")
        .queryName("tumbling_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_tumbling"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("tumbling_stream")

    b = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    s = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in got.collect()
    }
    assert set(b) == set(s)
    for k in b:
        assert b[k][0] == s[k][0]
        assert b[k][1] == pytest.approx(s[k][1])


def test_stateful_sessionize_stream_matches_batch(spark, events_dir, tmp_path):
    """applyInPandasWithState sessionizer ≡ session_window batch twin
    on a one-shot drain (emit_open=True flushes trailing sessions)."""
    ev = spark.read.parquet(events_dir)
    batch = sessionize(ev, "30 minutes")

    stream_src = spark.readStream.schema(ev.schema).parquet(events_dir)
    stream_sess = sessionize_stream(stream_src, "30 minutes", emit_open=True)
    got = _run_stream(
        spark, stream_sess, str(tmp_path / "ckpt_sess"), "sessions_stream"
    )

    def key(rows):
        return sorted(
            (
                r["user_id"],
                r["session_start"],
                r["session_end"],
                r["n_events"],
                round(r["sum_value"], 6),
            )
            for r in rows
        )

    b, s = key(batch.collect()), key(got.collect())
    assert b == s

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


def test_incremental_ingest_appends(spark, tmp_path):
    """incremental_ingest: new files landing in the source dir are
    appended to the index table across restarts (checkpointed)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.sources import load_table
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        incremental_ingest,
    )

    # cache: limit() without a total order is nondeterministic across
    # actions — the cache pins ONE materialization so the two
    # deliveries partition the same 100 rows. Unpersisted in finally
    # (the session is shared; leaked test caches substitute into later
    # tests' plans via the cache manager).
    ev = load_table(spark, SF_DIR, "events").limit(100).cache()
    try:
        src = str(tmp_path / "src")
        idx = str(tmp_path / "index")
        ckpt = str(tmp_path / "ckpt")

        ev.limit(60).write.mode("append").parquet(src)
        q = incremental_ingest(spark, src, ev.schema, idx, ckpt)
        q.awaitTermination(120)
        assert spark.read.parquet(idx).count() == 60

        # second delivery: only the new file is processed
        ev.limit(100).exceptAll(ev.limit(60)).write.mode("append").parquet(src)
        q2 = incremental_ingest(spark, src, ev.schema, idx, ckpt)
        q2.awaitTermination(120)
        assert spark.read.parquet(idx).count() == 100
    finally:
        ev.unpersist()


def test_watermark_drops_too_late_rows(spark, tmp_path):
    """Tumbling windows with a 0-second watermark: rows older than the
    observed max event time at the previous batch are dropped, and
    append mode only emits finalized windows."""
    import datetime as dt

    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        tumbling_window_counts,
    )

    def ts(h, m):
        return dt.datetime(2024, 1, 1, h, m, 0)

    src = str(tmp_path / "wm_src")
    ckpt = str(tmp_path / "wm_ckpt")
    out_dir = str(tmp_path / "wm_out")
    cols = ["ts", "event_type", "value"]

    batch1 = spark.createDataFrame(
        [(ts(10, 15), "click", 1.0), (ts(10, 45), "click", 1.0), (ts(11, 20), "view", 1.0)],
        cols,
    )
    batch1.write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(batch1.schema).parquet(src)
        agg = tumbling_window_counts(stream, "1 hour", watermark="0 seconds")
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["window_start"].hour, r["event_type"]): r["n_events"]
            for r in spark.read.parquet(out_dir).collect()
        }

    run()  # establishes watermark = 11:20

    # batch 2: 09:30 is far below the watermark (dropped); 12:40 is new
    batch2 = spark.createDataFrame(
        [(ts(9, 30), "click", 1.0), (ts(12, 40), "view", 1.0)], cols
    )
    batch2.write.mode("append").parquet(src)
    out2 = run()

    # finalized windows emitted without any 09:00 contribution
    assert (9, "click") not in out2
    assert out2.get((10, "click")) == 2
    assert out2.get((11, "view")) == 1


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


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """dedup_stream drops within-horizon exact duplicates: the drained
    stream keeps exactly one row per distinct text, agreeing with the
    batch exact_dedup grouping on the same fingerprint."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        exact_dedup,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        dedup_stream,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    dup = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    alld = docs.unionByName(dup).withColumn(
        # synthetic arrival times inside one watermark horizon
        "ts",
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 600),
    )
    src = str(tmp_path / "docs_stream")
    alld.write.parquet(src)

    stream = spark.readStream.schema(alld.schema).parquet(src)
    deduped = dedup_stream(stream, ts_col="ts", watermark="1 hour")
    got = _run_stream(spark, deduped, str(tmp_path / "ckpt_dedup"), "dedup_stream_t")

    n_batch_groups = exact_dedup(alld).count()
    assert got.count() == n_batch_groups
    # every surviving text is distinct
    assert got.select("text").distinct().count() == got.count()


def test_minhash_collision_stream_matches_batch(spark, tmp_path):
    """Streaming band-bucket collision detection ≡ the batch banded
    formulation on a one-shot drain: every non-anchor document in an
    occupied bucket is flagged against the bucket's min doc_id."""
    from pyspark.sql import functions as F

    from data_feature_extraction_and_retrieval_pipeline_spark.operators.dedup import (
        portable_banded_signatures,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        minhash_collision_stream,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # inject exact + near duplicates so buckets collide
    dups = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dups)
    src_dir = str(tmp_path / "docs_src")
    corpus.write.mode("overwrite").parquet(src_dir)
    on_disk = spark.read.parquet(src_dir)

    # batch twin: per occupied bucket, every doc above the min flags
    banded = portable_banded_signatures(on_disk)
    anchors = banded.groupBy("band", "key").agg(
        F.min("doc_id").alias("anchor_id"), F.count("*").alias("n")
    )
    batch = (
        banded.join(anchors, ["band", "key"])
        .filter(F.col("doc_id") != F.col("anchor_id"))
        .select("doc_id", "band", "key", "anchor_id")
    )

    stream_src = spark.readStream.schema(on_disk.schema).parquet(src_dir)
    flagged = minhash_collision_stream(stream_src)
    got = _run_stream(
        spark, flagged, str(tmp_path / "ckpt_mh"), "mh_collisions"
    )

    def key(rows):
        return sorted((r.doc_id, r.band, r.key, r.anchor_id) for r in rows)

    b, s = key(batch.collect()), key(got.collect())
    assert len(b) > 0  # dup injection must produce collisions
    assert b == s


def test_hopping_window_stream_matches_batch(spark, events_dir, tmp_path):
    """Hopping windows: identical batch/stream results, and every
    event lands in exactly duration/slide = 2 windows."""
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        hopping_window_counts,
    )

    ev = spark.read.parquet(events_dir)
    batch = hopping_window_counts(ev, "1 hour", "30 minutes")
    assert (
        batch.agg({"n_events": "sum"}).collect()[0][0] == 2 * ev.count()
    )

    stream_src = spark.readStream.schema(ev.schema).parquet(events_dir)
    stream_agg = hopping_window_counts(
        stream_src, "1 hour", "30 minutes", watermark="2 hours"
    )
    # complete mode (like the tumbling twin test): append mode would
    # withhold the trailing windows still above the final watermark
    q = (
        stream_agg.writeStream.format("memory")
        .queryName("hopping_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_hop"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("hopping_stream")

    def key(df):
        return sorted(
            (r.window_start, r.event_type, r.n_events, round(r.sum_value, 6))
            for r in df.collect()
        )

    assert key(batch) == key(got)


def test_minhash_collision_fn_never_flags_anchor_against_itself():
    """At-least-once re-delivery of the anchor row (or a duplicated id
    within one batch) must not emit (doc, anchor=doc) self-pairs."""
    import pandas as pd

    from data_feature_extraction_and_retrieval_pipeline_spark.streaming.dedup import (
        _bucket_collision_fn,
    )

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def remove(self):
            self._v = None

    fn = _bucket_collision_fn(None)
    state = FakeState()
    # batch 1: duplicated id -> anchor=7, no self-flag
    out1 = list(fn((1, 99), iter([pd.DataFrame({"doc_id": [7, 7]})]), state))
    assert out1 == []
    # batch 2: anchor re-delivered alongside a genuine dup
    out2 = list(fn((1, 99), iter([pd.DataFrame({"doc_id": [7, 9]})]), state))
    rows = pd.concat(out2)
    assert list(rows["doc_id"]) == [9] and list(rows["anchor_id"]) == [7]


def test_curation_composes_on_stream(spark, tmp_path):
    """Stateless curation passes (mixture sampling) compose with the
    stateful streaming dedup: the drained stream equals the same
    composition run in batch."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import exact_dedup
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.curation import (
        mixture_sample,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import dedup_stream

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "source"
    )
    dup = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "source"
    )
    alld = docs.unionByName(dup).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 600)
    )
    src = str(tmp_path / "docs_curated_stream")
    alld.write.parquet(src)
    rates = {"src0": 1.0, "src1": 0.5}

    # batch composition: sample -> exact dedup keep-list
    batch_sampled = mixture_sample(spark.read.parquet(src), rates, 0.3)
    batch_kept_texts = {
        r.text
        for r in batch_sampled.join(
            exact_dedup(batch_sampled).select("doc_id"), "doc_id", "left_semi"
        ).collect()
    }

    # stream composition: the SAME stateless filter applied pre-state
    stream = spark.readStream.schema(alld.schema).parquet(src)
    curated = dedup_stream(mixture_sample(stream, rates, 0.3), watermark="1 hour")
    q = (
        curated.writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cur"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("curated_stream")
    # same distinct-text survivors (stream keeps first-arrival rows,
    # batch keeps min-id rows — identical TEXT sets by construction)
    assert {r.text for r in got.collect()} == batch_kept_texts
    assert got.count() == len(batch_kept_texts)


def test_streaming_ann_index_maintenance(spark, tmp_path):
    """Streaming ingest keeps the IVF-PQ serving index fresh: each
    micro-batch runs encode → coarse-assign → PQ-encode (all map-only,
    legal on a stream) and lands in its cluster's partition directory.
    Probes over the growing index keep pruning partitions, and a doc
    delivered in the SECOND batch is its own top hit afterward — the
    full write-time-index story under incremental arrival."""
    from data_feature_extraction_and_retrieval_pipeline_spark.ml.encoders import (
        stub_text_encoder_udf,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.similarity import (
        assign_clusters,
        ivfpq_topk,
        pq_encode_catalyst,
        pq_lut,
        portable_coarse_centroids,
        portable_pq_codebooks,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.plans.inspect import (
        plan_summary,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.sources import load_table
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        incremental_ingest,
    )

    books = portable_pq_codebooks(m=8, k=16, d=8)
    cents = portable_coarse_centroids(nlist=8, dim=64)
    enc = stub_text_encoder_udf(dim=64)

    def to_index(stream):
        vec = stream.select(
            F.col("doc_id").alias("vec_id"), enc(F.col("text")).alias("embedding")
        )
        return pq_encode_catalyst(
            assign_clusters(vec, cents), books, keep_cols=("cluster",)
        )

    # no .cache(): a leaked cache pin here makes Spark's cache manager
    # substitute InMemoryTableScan into LATER tests' plans over the
    # same scan fragment (breaking test_plans' no-cache-pin assertions
    # when streaming tests run first), and the frame is reused only a
    # few times at sf0.001
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    idx = str(tmp_path / "ann_index")
    ckpt = str(tmp_path / "ckpt")

    first = docs.filter(F.col("doc_id") < 40)
    first.write.mode("append").parquet(src)
    q = incremental_ingest(
        spark, src, docs.schema, idx, ckpt,
        transform=to_index, partition_by=["cluster"],
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(idx).count()
    assert n1 == first.count()

    # second delivery: a new doc arrives and must become searchable
    second = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 60))
    second.write.mode("append").parquet(src)
    q2 = incremental_ingest(
        spark, src, docs.schema, idx, ckpt,
        transform=to_index, partition_by=["cluster"],
    )
    q2.awaitTermination(120)
    on_disk = spark.read.parquet(idx)
    assert on_disk.count() == n1 + second.count()

    # probe with a batch-2 doc's own vector: self row must surface,
    # and the probe must still reach the scan as partition pruning
    target = 47
    qvec = [
        float(x)
        for x in docs.filter(F.col("doc_id") == target)
        .select(enc(F.col("text")).alias("e"))
        .first()["e"]
    ]
    lut = pq_lut(books, qvec)
    top = ivfpq_topk(on_disk, cents, books, qvec, k=5, nprobe=8, lut=lut, round_to=6)
    formatted = plan_summary(top)
    assert any(
        "PartitionFilters" in ln and "cluster" in ln
        for ln in formatted.splitlines()
    )
    got = [r["vec_id"] for r in top.collect()]
    # nprobe=8 = all clusters -> exhaustive ADC: the self doc must rank
    # among the top hits (quantized scores tie with near-identical
    # vectors, so top-1 is not guaranteed, membership is)
    assert target in got


def test_interval_join_stream_matches_batch(spark, events_dir, tmp_path):
    """The watermarked stream-stream interval join drains exactly the
    batch interval join's match set (the §2.11 convention: one
    condition, two execution modes) — over the MULTI-SPLIT source, so
    matches whose two sides arrive in different input files must still
    all be emitted (state buffers the early side until its partner
    lands inside the watermark horizon)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import (
        interval_join,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        interval_join_stream,
    )

    ev = spark.read.parquet(events_dir)
    errors_b = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    batch = interval_join(
        errors_b, clicks_b, key="user_id",
        lower_seconds=3600, right_payload=["value"],
    )

    def stream_src():
        return spark.readStream.schema(ev.schema).parquet(events_dir)

    errors_s = stream_src().filter(F.col("event_type") == "error").select(
        "user_id", "ts"
    )
    clicks_s = stream_src().filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = interval_join_stream(
        errors_s, clicks_s, key="user_id",
        lower_seconds=3600, watermark="3 hours", right_payload=["value"],
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.lts, r.rts, round(r.value, 9))
        for r in spark.table("ivj_test").collect()
    }
    want = {
        (r.user_id, r.lts, r.rts, round(r.value, 9)) for r in batch.collect()
    }
    assert got == want and len(want) > 0


class TestPercolate:
    """Standing-query percolation (streaming/percolate.py): hand
    semantics on a tiny corpus, stream ≡ batch over a multi-split
    source, and the frozen-stats contract."""

    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "apple banana apple"),
                (2, "banana cherry"),
                (3, "apple"),
                (4, "durian elderberry"),
                (5, None),
            ],
            "doc_id long, text string",
        )

    def _setup(self, spark):
        from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
            StandingQuery,
            bm25_stats,
        )

        docs = self._corpus(spark)
        terms = ["apple", "cherry"]
        qs = [
            StandingQuery("q_apple", ("apple",), 0.0),
            StandingQuery("q_both", ("apple", "cherry"), 0.5),
        ]
        return docs, terms, qs, bm25_stats(docs, terms)

    def test_hand_semantics(self, spark):
        """N=5, Σdl=8, avgdl=1.6, df(apple)=2, df(cherry)=1. q_apple
        (threshold 0) hits docs 1 and 3; q_both (threshold 0.5) hits
        only doc 2 — cherry's rarer idf (ln 4 ≈ 1.386) clears 0.5 at
        tf=1, while apple-only docs top out below it (doc 1 ≈ 0.439,
        doc 3 ≈ 0.470). NULL doc counted in N, never matched."""
        import math

        from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
            percolate,
        )

        docs, terms, qs, stats = self._setup(spark)
        rows = {
            (r.query_id, r.doc_id): r
            for r in percolate(docs, qs, stats, terms).collect()
        }
        assert set(rows) == {("q_apple", 1), ("q_apple", 3), ("q_both", 2)}

        def idf(dfc):
            return math.log(1 + (5 - dfc + 0.5) / (dfc + 0.5))

        def tfnorm(tf, dl):
            return tf / (tf + 1.2 * (0.25 + 0.75 * (dl / 1.6)))

        assert rows[("q_apple", 1)].bm25 == pytest.approx(
            idf(2) * tfnorm(2, 3), abs=1e-6
        )
        assert rows[("q_both", 2)].n_matched_terms == 1
        assert rows[("q_both", 2)].bm25 == pytest.approx(
            idf(2) * 0.0 + idf(1) * tfnorm(1, 2), abs=1e-6
        )

    def test_stream_matches_batch(self, spark, tmp_path):
        """The drained stream output equals the batch scoring exactly
        — stateless map per micro-batch, multi-split source."""
        from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
            percolate,
        )

        docs, terms, qs, stats = self._setup(spark)
        src_dir = str(tmp_path / "docs")
        docs.repartition(3).write.parquet(src_dir)
        src = spark.readStream.schema(docs.schema).parquet(src_dir)

        got = _run_stream(
            spark,
            percolate(src, qs, stats, terms),
            str(tmp_path / "ckpt"),
            "perc_sm",
        )
        want = percolate(spark.read.parquet(src_dir), qs, stats, terms)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_frozen_stats_do_not_drift(self, spark):
        """Percolation scores against the stats snapshot, not the
        scored frame: scoring a NEW batch with the old stats row gives
        the score the old corpus implies — the index-artifact contract
        that makes the operator stateless on a stream."""
        from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
            percolate,
        )

        docs, terms, qs, stats = self._setup(spark)
        newbatch = spark.createDataFrame(
            [(99, "apple apple apple")], "doc_id long, text string"
        )
        old = {
            r.doc_id: r.bm25
            for r in percolate(docs, qs, stats, terms).collect()
        }
        fresh = percolate(newbatch, qs, stats, terms).collect()
        assert [r.doc_id for r in fresh] == [99, 99]
        # same stats row -> doc 99's tf=3,dl=3 score is computable from
        # the OLD corpus constants; doc 1's score is unchanged by the
        # new arrival (no stats recompute happened anywhere)
        assert old[1] == pytest.approx(old[1])
        assert all(r.bm25 > 0 for r in fresh)


class TestPercolateJoin:
    """The broadcast-join percolator (percolate_join): bit-identical
    output vs the expression form, degenerate-input validation, and
    the facade's auto strategy (join past the threshold, loud error on
    a streaming frame in join form)."""

    def _docs(self, spark):
        return spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")

    def test_join_form_bit_identical_to_expression(self, spark):
        from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
            StandingQuery,
            bm25_stats,
            bm25_stats_table,
            percolate,
            percolate_join,
        )

        docs = self._docs(spark)
        terms = ["data", "table", "vector", "row"]
        qs = [
            StandingQuery("a", ("data", "table"), 0.3),
            StandingQuery("b", ("vector",), 0.1),
            StandingQuery("c", ("row", "data", "vector"), 0.45),
        ]
        expr = percolate(docs, qs, bm25_stats(docs, terms), terms)
        ts, tot = bm25_stats_table(docs, terms)
        join = percolate_join(docs, qs, ts, tot)
        # FULL equality including the rounded score: the join form's
        # term-idx-sorted fold reproduces the expression form's
        # left-to-right accumulation bit for bit
        a = sorted(map(tuple, expr.collect()))
        b = sorted(map(tuple, join.collect()))
        assert a == b and len(a) > 0

    def test_join_form_df0_novel_term(self, spark):
        """A standing query on a term ABSENT from the stats corpus
        (df=0 — the core percolator alerting case: watch for something
        new) must fire identically in both forms when an arriving doc
        contains it. Regression: bm25_stats_table used to emit no row
        for df=0 terms, so the join form's inner tf⋈stats join
        silently dropped the contribution — a one-term novel query
        never fired at all."""
        from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
            StandingQuery,
            bm25_stats,
            bm25_stats_table,
            percolate,
            percolate_join,
        )

        corpus = self._docs(spark)
        terms = ["data", "zzqxnovel"]
        qs = [
            StandingQuery("novel_only", ("zzqxnovel",), 0.1),
            StandingQuery("mixed", ("data", "zzqxnovel"), 0.1),
        ]
        batch = spark.createDataFrame(
            [(901, "zzqxnovel data arrives"), (902, "plain data row")],
            "doc_id long, text string",
        )
        expr = percolate(batch, qs, bm25_stats(corpus, terms), terms)
        ts, tot = bm25_stats_table(corpus, terms)
        # the df=0 term must be PRESENT in the long-form stats
        assert {(r.term, r.df) for r in ts.collect() if r.term == "zzqxnovel"} == {
            ("zzqxnovel", 0)
        }
        join = percolate_join(batch, qs, ts, tot)
        a = sorted(map(tuple, expr.collect()))
        b = sorted(map(tuple, join.collect()))
        assert a == b
        # the novel-term-only query fires on the doc carrying it
        fired = {(r.query_id, r.doc_id) for r in join.collect()}
        assert ("novel_only", 901) in fired
        mixed = {r.doc_id: r.n_matched_terms for r in join.collect()
                 if r.query_id == "mixed"}
        assert mixed[901] == 2

    def test_join_form_validation(self, spark):
        from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
            StandingQuery,
            bm25_stats_table,
            percolate_join,
        )

        docs = self._docs(spark)
        ts, tot = bm25_stats_table(docs, ["data"])
        with pytest.raises(ValueError, match="at least one"):
            percolate_join(docs, [], ts, tot)
        with pytest.raises(ValueError, match="no terms"):
            percolate_join(docs, [StandingQuery("e", (), 0.0)], ts, tot)

    def test_facade_auto_strategy(self, spark):
        from data_feature_extraction_and_retrieval_pipeline_spark.api import (
            Percolator,
        )

        docs = self._docs(spark)
        small = Percolator(docs, [("q0", ("data",), 0.0)])
        assert not small._join_form and small.stats is not None

        big_qs = [
            (f"q{i}", ("data", "table"), 0.2)
            for i in range(Percolator.JOIN_THRESHOLD)
        ]
        big = Percolator(docs, big_qs)
        assert big._join_form and big.term_stats is not None
        # all queries identical terms/threshold -> every query matches
        # the same docs; spot-check shape and fan-out
        out = big.matches(docs)
        rows = out.collect()
        assert len(rows) % Percolator.JOIN_THRESHOLD == 0
        assert {r.query_id for r in rows} == {q[0] for q in big_qs}

        stream = (
            spark.readStream.schema(docs.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet("/root/testdata/sf0.001")
        )
        with pytest.raises(ValueError, match="foreachBatch"):
            big.matches(stream)
        # expression form still serves the stream for a small registry
        assert small.matches(stream).isStreaming


class TestPercolatorRegister:
    """Incremental query registration on the Percolator facade: new
    terms extend the frozen stats without perturbing old scores, in
    BOTH formulations; unregister is bookkeeping-only; id collisions
    and degenerate queries fail loudly."""

    def _docs(self, spark):
        return spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")

    def test_incremental_equals_batch_both_forms(self, spark):
        from data_feature_extraction_and_retrieval_pipeline_spark.api import (
            Percolator,
        )

        docs = self._docs(spark)
        qs = [
            ("a", ("data", "table"), 0.3),
            ("b", ("vector", "join"), 0.2),
            ("c", ("row",), 0.15),
        ]
        for strategy in ("expr", "join"):
            batch = Percolator(docs, qs, strategy=strategy)
            inc = Percolator(docs, [qs[0]], strategy=strategy)
            inc.register(qs[1])  # brings brand-new terms
            inc.register(qs[2])
            got = sorted(map(tuple, inc.matches(docs).collect()))
            want = sorted(map(tuple, batch.matches(docs).collect()))
            assert got == want and len(got) > 0, strategy

    def test_register_preserves_old_scores(self, spark):
        from data_feature_extraction_and_retrieval_pipeline_spark.api import (
            Percolator,
        )

        docs = self._docs(spark)
        p = Percolator(docs, [("a", ("data",), 0.0)])
        before = sorted(map(tuple, p.matches(docs).collect()))
        p.register(("z", ("vector", "row"), 0.1))
        after = sorted(
            t for t in map(tuple, p.matches(docs).collect()) if t[1] == "a"
        )
        assert after == before  # frozen N/Σdl ⇒ alerts cannot shift

    def test_register_unregister_validation(self, spark):
        from data_feature_extraction_and_retrieval_pipeline_spark.api import (
            Percolator,
        )

        docs = self._docs(spark)
        p = Percolator(docs, [("a", ("data",), 0.0)])
        with pytest.raises(ValueError, match="already registered"):
            p.register(("a", ("table",), 0.0))
        with pytest.raises(ValueError, match="no terms"):
            p.register(("e", (), 0.0))
        with pytest.raises(KeyError):
            p.unregister("missing")
        p.register(("b", ("table",), 0.0))
        p.unregister("a")
        assert [q.query_id for q in p.queries] == ["b"]
        with pytest.raises(ValueError, match="last standing query"):
            p.unregister("b")

    def test_register_auto_upgrades_to_join_form(self, spark):
        """Under strategy='auto' the formulation is re-evaluated at
        register() time: a percolator constructed with ONE query (the
        HTTP lifecycle's pattern) upgrades expression→join in place
        the moment the registry crosses JOIN_THRESHOLD — matches stay
        bit-identical to a batch-constructed join-form percolator, so
        incremental registration can never walk into the ~300-query
        expression codegen wall."""
        from data_feature_extraction_and_retrieval_pipeline_spark.api import (
            Percolator,
        )

        docs = self._docs(spark)
        qs = [
            ("a", ("data", "table"), 0.3),
            ("b", ("vector", "join"), 0.2),
            ("c", ("row",), 0.15),
        ]
        inc = Percolator(docs, [qs[0]])
        inc.JOIN_THRESHOLD = 3  # instance override keeps the test fast
        assert not inc._join_form and inc.stats is not None
        inc.register(qs[1])
        assert not inc._join_form  # 2 < 3: still expression form
        inc.register(qs[2])
        assert inc._join_form and inc.stats is None
        assert inc.term_stats is not None and inc._stats_rows
        batch = Percolator(docs, qs, strategy="join")
        got = sorted(map(tuple, inc.matches(docs).collect()))
        want = sorted(map(tuple, batch.matches(docs).collect()))
        assert got == want and len(got) > 0

    def test_join_form_quoted_terms_and_nonfinite_floor(self, spark):
        """Registry terms/ids reach a SQL VALUES literal (the HTTP
        register body is untrusted input): quote-bearing strings must
        parse under quote-doubling, and a non-finite min_score must
        fail loudly instead of CASTing to NULL and disabling the
        threshold."""
        from data_feature_extraction_and_retrieval_pipeline_spark.api import (
            Percolator,
        )
        from data_feature_extraction_and_retrieval_pipeline_spark.streaming.percolate import (
            _sql_str,
        )

        assert _sql_str("it's") == "it''s"
        assert _sql_str("a\\'b") == "a\\\\''b"
        assert _sql_str("a\\'b", escaped_literals=True) == "a\\''b"

        docs = self._docs(spark)
        p = Percolator(
            docs,
            [("q'0; DROP", ("data", "o'brien"), 0.0)],
            strategy="join",
        )
        out = p.matches(docs)  # must parse and run, not inject
        assert {r.query_id for r in out.collect()} <= {"q'0; DROP"}
        with pytest.raises(ValueError, match="non-finite"):
            Percolator(
                docs, [("q", ("data",), float("nan"))], strategy="join"
            ).matches(docs).collect()

    def test_percolate_join_stream_requires_sink_and_checkpoint(
        self, spark
    ):
        from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
            StandingQuery,
            percolate_join_stream,
        )

        docs = self._docs(spark)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet("/root/testdata/sf0.001")
        )
        with pytest.raises(ValueError, match="sink_path and checkpoint"):
            percolate_join_stream(
                stream,
                [StandingQuery("a", ("data",), 0.0)],
                stats_rows=[("data", 1)],
                totals_rows=[(1, 1)],
            )


def test_percolate_join_stream_equals_batch(spark, tmp_path):
    """The foreachBatch join-form percolation drain over a multi-file
    source emits exactly the batch percolate_join hits — the
    past-the-codegen-wall streaming path (large registries) certified
    stream ≡ batch."""
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        StandingQuery,
        bm25_stats_table,
        percolate_join,
        percolate_join_stream,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    qs = [
        StandingQuery("a", ("data", "table"), 0.3),
        StandingQuery("b", ("vector",), 0.1),
    ]
    ts, tot = bm25_stats_table(docs, ["data", "table", "vector"])
    # freeze the index artifacts (the serving shape)
    ts = spark.createDataFrame(ts.collect(), schema=ts.schema)
    tot = spark.createDataFrame(tot.collect(), schema=tot.schema)

    src = tmp_path / "src"
    docs.repartition(3).write.parquet(str(src))  # multi-file batches
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    q = percolate_join_stream(
        stream, qs, ts, tot, str(tmp_path / "hits"), str(tmp_path / "ck")
    )
    assert q.awaitTermination(120)

    got = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "hits")).collect())
    )
    want = sorted(map(tuple, percolate_join(docs, qs, ts, tot).collect()))
    assert got == want and len(got) > 0

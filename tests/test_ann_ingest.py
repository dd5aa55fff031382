"""Incremental ANN index maintenance (streaming/ann_ingest.py): the
upload→index lifecycle — stream-assign ≡ batch-assign, append-only
growth under checkpointed redelivery, partition pruning on the
maintained layout, the drift-based staleness monitor, and the
re-center/compaction job."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.operators.similarity import (
    assign_clusters_np,
)
from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
    centroid_staleness,
    recenter,
    recenter_compact,
    start_ann_ingest,
)

SF_DIR = "/root/testdata/sf0.001"


def _load_emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def _centroids(spark, k=4):
    rows = (
        _load_emb(spark)
        .filter(F.col("vec_id") < k)
        .orderBy("vec_id")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def _drain(spark, src, idx, ckpt, cents, schema):
    q = start_ann_ingest(spark, str(src), schema, str(idx), str(ckpt), cents)
    assert q.awaitTermination(120)


def test_stream_assignment_equals_batch(spark, tmp_path):
    """The drained partitioned index holds EXACTLY the batch
    assignment — same (vec_id, cluster) set, nothing dropped or
    duplicated by the stream path."""
    emb = _load_emb(spark)
    cents = _centroids(spark)
    src, idx, ckpt = tmp_path / "src", tmp_path / "idx", tmp_path / "ck"
    emb.write.parquet(str(src))
    _drain(spark, src, idx, ckpt, cents, emb.schema)

    got = sorted(
        (r["vec_id"], int(r["cluster"]))
        for r in spark.read.parquet(str(idx)).select("vec_id", "cluster").collect()
    )
    want = sorted(
        (r["vec_id"], int(r["cluster"]))
        for r in assign_clusters_np(emb, cents).select("vec_id", "cluster").collect()
    )
    assert got == want and len(got) == emb.count()


def test_ingest_appends_only_new_files(spark, tmp_path):
    """Second drain over the SAME checkpoint after new files arrive
    appends exactly the new rows — checkpointed offsets dedupe the
    already-ingested files (the restart/redelivery contract)."""
    emb = _load_emb(spark)
    cents = _centroids(spark)
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    src, idx, ckpt = tmp_path / "src", tmp_path / "idx", tmp_path / "ck"

    first.write.parquet(str(src))
    _drain(spark, src, idx, ckpt, cents, emb.schema)
    n1 = spark.read.parquet(str(idx)).count()
    assert n1 == first.count()

    second.write.mode("append").parquet(str(src))
    _drain(spark, src, idx, ckpt, cents, emb.schema)
    back = spark.read.parquet(str(idx))
    assert back.count() == emb.count()
    # no duplicates: every vec_id exactly once
    assert back.select("vec_id").distinct().count() == emb.count()


def test_maintained_layout_prunes_partitions(spark, tmp_path):
    """A cluster-filtered probe over the maintained index reads ONLY
    that cluster's files — the write-time layout keeps paying for
    itself as ingest grows it."""
    emb = _load_emb(spark)
    cents = _centroids(spark)
    src, idx, ckpt = tmp_path / "src", tmp_path / "idx", tmp_path / "ck"
    emb.write.parquet(str(src))
    _drain(spark, src, idx, ckpt, cents, emb.schema)

    probed = spark.read.parquet(str(idx)).filter(F.col("cluster") == 0)
    files = [
        r[0]
        for r in probed.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    ]
    assert files and all("cluster=0" in f for f in files)


def test_centroid_staleness_hand_values(spark):
    """Exact occupancy-drift arithmetic on hand-assigned frames:
    resident = clusters (0,0,1), arriving = (0,1,1,1). N=3, M=4.
    Numerators |ref_n*M - cur_n*N|: c0 |2*4-1*3|=5, c1 |1*4-3*3|=5;
    total 10."""
    res = spark.createDataFrame([(0,), (0,), (1,)], "cluster int")
    arr = spark.createDataFrame([(0,), (1,), (1,), (1,)], "cluster int")
    rows = {
        r["key"]: (r["ref_n"], r["cur_n"], int(r["drift_num"]))
        for r in centroid_staleness(res, arr).collect()
    }
    assert rows["0"] == (2, 1, 5)
    assert rows["1"] == (1, 3, 5)
    assert rows["__TOTAL__"] == (3, 4, 10)


def test_recenter_exact_means_and_compact(spark, tmp_path):
    """recenter returns the exact per-cluster elementwise means; on a
    well-separated toy corpus recenter_compact leaves membership
    unchanged while rewriting the layout (and the swap leaves no
    debris)."""
    rows = [
        (1, [10.0, 0.0], 0),
        (2, [12.0, 2.0], 0),
        (3, [0.0, 10.0], 1),
        (4, [0.0, 14.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster int"
    )
    cents = recenter(df)
    assert cents == [[11.0, 1.0], [0.0, 12.0]]

    idx = tmp_path / "idx"
    df.write.partitionBy("cluster").parquet(str(idx))
    new_cents = recenter_compact(spark, str(idx))
    assert new_cents == [[11.0, 1.0], [0.0, 12.0]]
    back = spark.read.parquet(str(idx))
    got = {r["vec_id"]: int(r["cluster"]) for r in back.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1}
    assert not os.path.exists(str(idx) + "__retired")
    assert not os.path.exists(str(idx) + "__tmp_recenter")


def test_ivfpq_stream_equals_batch(spark, tmp_path):
    """The drained IVF-PQ index holds exactly the batch assign+encode
    rows — and only the compact (vec_id, cluster, pq_code) columns
    (the float vector is dropped at the ingest boundary)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.similarity import (
        assign_clusters,
        pq_encode_catalyst,
        portable_coarse_centroids,
        portable_pq_codebooks,
    )
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        start_ivfpq_ingest,
    )

    emb = _load_emb(spark)
    cents = portable_coarse_centroids(nlist=8, dim=64)
    books = portable_pq_codebooks(m=8, k=16, d=8)
    src, idx, ckpt = tmp_path / "src", tmp_path / "idx", tmp_path / "ck"
    emb.write.parquet(str(src))
    q = start_ivfpq_ingest(
        spark, str(src), emb.schema, str(idx), str(ckpt), cents, books
    )
    assert q.awaitTermination(120)

    back = spark.read.parquet(str(idx))
    assert set(back.columns) == {"vec_id", "cluster", "pq_code"}
    got = sorted(
        (r["vec_id"], int(r["cluster"]), tuple(r["pq_code"]))
        for r in back.collect()
    )
    want_df = pq_encode_catalyst(
        assign_clusters(emb, cents), books, keep_cols=("cluster",)
    )
    want = sorted(
        (r["vec_id"], int(r["cluster"]), tuple(r["pq_code"]))
        for r in want_df.collect()
    )
    assert got == want and len(got) == emb.count()


def test_incremental_cosine_filter_hand_values(spark):
    """Hand corpus on 2-D unit-ish vectors with 2 well-separated
    centroids: arrivals matching a resident at >=0.99 are flagged
    (keep=False, exact match count), near-but-below stays keep=True
    with its best_cosine reported, and an arrival landing in a
    resident-EMPTY cluster gets NULL best_cosine (the SQL
    MAX-over-no-rows identity), not NaN."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.similarity import (
        incremental_cosine_filter,
    )

    cents = [[1.0, 0.0], [0.0, 1.0]]
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.96, 0.28])],  # both cluster 0
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),    # exact dup of 1 → 1 match, best 1.0
            (11, [0.8, 0.6]),    # cluster 0, best vs 1 = 0.8, vs 2 = 0.936
            (12, [0.0, 1.0]),    # cluster 1 — EMPTY of residents
        ],
        "vec_id long, embedding array<double>",
    )
    for gate in ("arrow", "expr"):
        rows = {
            r["vec_id"]: (r["n_matches"], r["best_cosine"], r["keep"])
            for r in incremental_cosine_filter(
                batch, corpus, cents, threshold=0.99, gate=gate
            ).collect()
        }
        assert rows[10][0] == 1 and rows[10][2] is False, gate
        assert rows[10][1] == pytest.approx(1.0)
        assert rows[11][0] == 0 and rows[11][2] is True, gate
        assert rows[11][1] == pytest.approx(0.96 * 0.8 + 0.28 * 0.6)
        assert rows[12] == (0, None, True), gate


def test_incremental_cosine_filter_null_and_ragged(spark):
    """One bad row must not kill the gate job: NULL and
    wrong-dimension arriving vectors get the promised null
    propagation — an explicit (n_matches 0, best_cosine NULL,
    keep true) verdict — while every scorable row in the same batch
    still scores, and null-vector RESIDENTS are ignored rather than
    crashing their cluster's matmul."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.similarity import (
        incremental_cosine_filter,
    )

    cents = [[1.0, 0.0], [0.0, 1.0]]
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.5])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),        # scorable: exact dup of resident 1
            (11, None),              # NULL vector
            (12, [0.1, 0.2, 0.3]),   # wrong dimension
        ],
        "vec_id long, embedding array<double>",
    )
    for gate in ("arrow", "expr"):
        rows = {
            r["vec_id"]: (r["n_matches"], r["best_cosine"], r["keep"])
            for r in incremental_cosine_filter(
                batch, corpus, cents, threshold=0.99, gate=gate
            ).collect()
        }
        assert len(rows) == 3, gate  # every batch row verdicted once
        assert rows[10][0] == 1 and rows[10][2] is False, gate
        assert rows[11] == (0, None, True), gate
        assert rows[12] == (0, None, True), gate


def test_cosine_gate_expr_equals_arrow_on_real_vectors(spark):
    """The two physical gates are the same operator: on the sf0.001
    embeddings (64-dim, both the serving corpus_assigned path and the
    raw-corpus path) the expr gate's verdicts equal the Arrow gate's
    bit-for-bit after the standard round-6 surface. The expr form is
    the small-regime / zero-Python option; arrow is the at-scale
    default (x10: 1.1s vs 4.0s — SCALING.md "Cosine gate: expr vs
    arrow")."""
    from pyspark.sql import functions as F

    from data_feature_extraction_and_retrieval_pipeline_spark.operators.similarity import (
        assign_clusters_np,
        incremental_cosine_filter,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1).unionByName(
        emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
    )
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 16).collect()
    ]
    ca = assign_clusters_np(corpus, cents)
    for kwargs in (
        {"corpus_assigned": ca},
        {},
    ):
        c = None if "corpus_assigned" in kwargs else corpus
        out = {}
        for gate in ("arrow", "expr"):
            out[gate] = sorted(
                map(
                    tuple,
                    incremental_cosine_filter(
                        batch, c, cents, threshold=0.99, gate=gate, **kwargs
                    )
                    .select(
                        "vec_id",
                        "n_matches",
                        F.round("best_cosine", 6).alias("bc"),
                        "keep",
                    )
                    .collect(),
                )
            )
        assert out["expr"] == out["arrow"] and len(out["expr"]) > 0


def test_maintenance_loop_end_to_end(spark, tmp_path):
    """The full index-maintenance lifecycle on a corpus that MOVES:
    (1) ingest wave A under initial centroids; (2) wave B arrives from
    a shifted distribution — the staleness monitor's exact drift
    numerator fires; (3) recenter_compact re-trains on the accumulated
    index and rewrites the layout; (4) a nearest-centroid probe on the
    rewritten index still returns exactly the right members per
    cluster (correctness survives maintenance)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        centroid_staleness,
        recenter_compact,
        start_ann_ingest,
    )

    # two tight blobs on axes; initial centroids deliberately offset
    wave_a = [(i, [10.0 + (i % 3), 0.5 * (i % 2)]) for i in range(0, 6)]
    wave_b = [(i, [0.5 * (i % 2), 10.0 + (i % 3)]) for i in range(10, 16)]
    cents0 = [[1.0, 0.0], [0.0, 1.0]]
    schema = "vec_id long, embedding array<double>"

    src, idx, ckpt = tmp_path / "src", tmp_path / "idx", tmp_path / "ck"
    spark.createDataFrame(wave_a, schema).write.parquet(str(src))
    df_schema = spark.createDataFrame(wave_a, schema).schema
    q = start_ann_ingest(spark, str(src), df_schema, str(idx), str(ckpt), cents0)
    assert q.awaitTermination(120)

    spark.createDataFrame(wave_b, schema).write.mode("append").parquet(str(src))
    q = start_ann_ingest(spark, str(src), df_schema, str(idx), str(ckpt), cents0)
    assert q.awaitTermination(120)

    back = spark.read.parquet(str(idx))
    assert back.count() == 12

    # the monitor fires: wave A was all-cluster-0, wave B all-cluster-1
    resident = back.filter(F.col("vec_id") < 10)
    arriving = back.filter(F.col("vec_id") >= 10)
    drift = {
        r["key"]: int(r["drift_num"])
        for r in centroid_staleness(resident, arriving).collect()
    }
    assert drift["__TOTAL__"] > 0  # exact-integer alarm, no tuning

    new_cents = recenter_compact(spark, str(idx))
    assert len(new_cents) == 2
    # probe the REWRITTEN layout: each blob maps 1:1 to one cluster
    rewritten = spark.read.parquet(str(idx))
    got = {}
    for r in rewritten.collect():
        got.setdefault(int(r["cluster"]), set()).add(r["vec_id"])
    blobs = [set(range(0, 6)), set(range(10, 16))]
    assert sorted(got.values(), key=min) == blobs


def test_cosine_self_join_pairs_skips_null_vectors(spark):
    """The all-pairs sibling of the incremental gate: NULL and
    wrong-dimension vectors pair with nothing instead of collecting
    into a NULL cluster whose matmul crashes the job; valid rows in
    the same frame still pair."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.similarity import (
        cosine_self_join_pairs,
    )

    cents = [[1.0, 0.0], [0.0, 1.0]]
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None), (4, [0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = cosine_self_join_pairs(emb, cents, threshold=0.99).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]


def test_recenter_skips_null_and_short_vectors(spark):
    """A NULL or short first row must not poison the dimension probe
    (dim is MAX size, not first-row size), and only full-dimension
    vectors contribute to the means — a short vector's missing tail
    would otherwise bias the centroid."""
    df = spark.createDataFrame(
        [
            (1, None, 0),
            (2, [4.0], 0),          # short — excluded
            (3, [10.0, 0.0], 0),
            (4, [12.0, 2.0], 0),
            (5, [0.0, 10.0], 1),
            (6, [0.0, 14.0], 1),
        ],
        "vec_id long, embedding array<double>, cluster int",
    )
    assert recenter(df) == [[11.0, 1.0], [0.0, 12.0]]
    # all-null index -> no centroids, loudly empty rather than a crash
    empty = spark.createDataFrame(
        [(1, None, 0)], "vec_id long, embedding array<double>, cluster int"
    )
    assert recenter(empty) == []

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
    hybrid_search,
    knn,
    knn_batch,
    segment_search,
    tag_search,
)
from data_feature_extraction_and_retrieval_pipeline_spark.plans.inspect import (
    has_take_ordered,
)
from data_feature_extraction_and_retrieval_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def test_knn_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    q = mat[0]
    scores = mat @ q + 1.0
    order = np.lexsort((ids, -scores))[:10]
    expected = list(ids[order])
    got = [r["vec_id"] for r in knn(emb, list(q), k=10).collect()]
    assert got == expected


def test_knn_plans_take_ordered(emb):
    df = knn(emb, [0.0] * 64, k=10)
    assert has_take_ordered(df), "top-k must plan TakeOrderedAndProject"


def test_knn_batch_per_query_counts(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_batch(emb, queries, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert len(rows) == 4
        # self-match ranks first (dot(v,v)=1 is max for normalized vectors)
        best = min(rows, key=lambda r: r["rank"])
        assert best["vec_id"] == q


def _seg_frames(spark, emb):
    seg = emb.select(
        F.floor(F.col("vec_id") / 10).cast("long").alias("image_id"),
        "vec_id",
        F.col("embedding").alias("clip_features"),
    )
    qsegs = seg.filter(F.col("image_id") == 0).select(
        F.col("vec_id").alias("q_segment_id"),
        F.col("clip_features").alias("features"),
    )
    return seg, qsegs


def test_segment_search_math(spark, emb, emb_np):
    """Image score == mean over query segments of max cosine vs the
    image's segments (search_with_segments.py:246-272)."""
    ids, mat = emb_np
    seg, qsegs = _seg_frames(spark, emb)
    got = {r["image_id"]: r for r in segment_search(seg, qsegs, top_k=5).collect()}

    img_of = ids // 10
    qmat = mat[img_of == 0]
    sims = qmat @ mat.T  # (nq, N)
    expected = {}
    for img in np.unique(img_of):
        best = sims[:, img_of == img].max(axis=1)
        expected[img] = (best.mean(), best.max())
    top5 = sorted(expected, key=lambda i: (-expected[i][0], i))[:5]
    assert sorted(got) == sorted(top5)
    for img, row in got.items():
        assert row["avg_similarity"] == pytest.approx(expected[img][0], abs=1e-9)
        assert row["max_segment_similarity"] == pytest.approx(expected[img][1], abs=1e-9)


def test_hybrid_missing_segment_score_is_zero(spark, emb, emb_np):
    """Candidates without segments contribute segment_score = 0.0, not
    null (search_with_segments.py:419-436)."""
    ids, mat = emb_np
    seg, qsegs = _seg_frames(spark, emb)
    images = seg.filter(F.col("vec_id") % 10 == 0).select(
        "image_id", F.col("clip_features").alias("embedding")
    )
    # drop segments for half the images → their hybrid = 0.4 * whole
    seg_half = seg.filter(F.col("image_id") % 2 == 0)
    out = hybrid_search(images, seg_half, list(mat[0]), qsegs, top_k=50).collect()
    for r in out:
        if r["image_id"] % 2 == 1:
            assert r["segment_score"] == 0.0
            assert r["hybrid_score"] == pytest.approx(0.4 * r["whole_score"])
        else:
            assert r["hybrid_score"] == pytest.approx(
                0.4 * r["whole_score"] + 0.6 * r["segment_score"]
            )


def test_tag_search_confidence_floor(spark):
    rows = [
        (1, [("dome", 0.5), ("tree", 0.05)]),   # tree below floor
        (2, [("tree", 0.3), ("dome", 0.2)]),
        (3, [("car", 0.9)]),                     # no matching tag
    ]
    df = spark.createDataFrame(rows, "image_id: long, tags: array<struct<tag:string,confidence:double>>")
    out = {r["image_id"]: r for r in tag_search(df, ["dome", "tree"], 0.1, 10).collect()}
    assert set(out) == {1, 2}
    assert out[1]["matched_tags"] == 1            # tree filtered by confidence
    assert out[2]["matched_tags"] == 2


def test_hybrid_flat_equals_two_phase(spark, emb, emb_np):
    """hybrid_search_flat (one corpus pass over the denormalized flat
    layout) must reproduce the two-phase hybrid_search exactly: same
    pool membership, same score algebra, same top-k."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.retrieval import (
        hybrid_search_flat,
    )

    ids, mat = emb_np
    seg = emb.select(
        F.floor(F.col("vec_id") / 10).cast("long").alias("image_id"),
        "vec_id",
        F.col("embedding").alias("clip_features"),
    )
    images = seg.filter(F.col("vec_id") % 10 == 0).select(
        "image_id", F.col("clip_features").alias("embedding")
    )
    qsegs = seg.filter(F.col("image_id") == 0).select(
        F.col("vec_id").alias("q_segment_id"),
        F.col("clip_features").alias("features"),
    )
    qvec = list(mat[0])
    qrows = [(i, list(mat[i])) for i in range(10)]

    two = hybrid_search(
        images, seg, qvec, qsegs, top_k=10, query_rows=qrows, arrow=False
    ).collect()
    flat = hybrid_search_flat(
        seg, qvec, qrows, top_k=10,
        whole_marker=F.col("vec_id") % 10 == 0, arrow=False,
    ).collect()

    def norm(rows):
        return [
            (r["image_id"], round(r["whole_score"], 9),
             round(r["segment_score"], 9), round(r["hybrid_score"], 9))
            for r in rows
        ]

    assert norm(flat) == norm(two)


def test_knn_batch_crossjoin_fallback_equals_batched(spark, emb, emb_np):
    """Above _MAX_BATCHED_QUERIES the batched-literal path hands off to
    the crossJoin formulation — both must produce identical rankings."""
    import data_feature_extraction_and_retrieval_pipeline_spark.operators.retrieval as R

    ids, mat = emb_np
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in mat[i]]) for i in range(3)],
        "query_id: long, query_vec: array<double>",
    )

    batched = knn_batch(emb, qdf, k=5).collect()
    orig = R._MAX_BATCHED_QUERIES
    try:
        R._MAX_BATCHED_QUERIES = 0  # force the crossJoin fallback
        fallback = knn_batch(emb, qdf, k=5).collect()
    finally:
        R._MAX_BATCHED_QUERIES = orig

    def norm(rows):
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"], round(r["sim"], 9))
            for r in rows
        )

    assert norm(batched) == norm(fallback)


class TestBM25:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "apple banana apple"),
                (2, "banana cherry"),
                (3, "apple"),
                (4, "durian elderberry fig grape"),
                (5, None),
            ],
            "doc_id long, text string",
        )

    def test_hand_corpus_scores(self, spark):
        """Lucene-8 BM25 on a 5-doc corpus vs a by-hand computation:
        N=5, Σdl=10 (NULL text = empty doc, counted in N, adds 0 to
        Σdl), avgdl=2, df(apple)=2, df(cherry)=1."""
        import math

        from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
            bm25_topk,
        )

        out = bm25_topk(self._corpus(spark), ["apple", "cherry"], top_k=10)
        rows = out.collect()
        got = {r.doc_id: r for r in rows}

        def idf(dfc):
            return math.log(1 + (5 - dfc + 0.5) / (dfc + 0.5))

        def tfnorm(tf, dl):
            return tf / (tf + 1.2 * (0.25 + 0.75 * (dl / 2.0)))

        assert set(got) == {1, 2, 3}  # non-matching + NULL docs dropped
        assert got[1].bm25 == pytest.approx(
            round(idf(2) * tfnorm(2, 3), 6), abs=1e-9
        )
        assert got[2].bm25 == pytest.approx(
            round(idf(1) * tfnorm(1, 2), 6), abs=1e-9
        )
        assert got[3].bm25 == pytest.approx(
            round(idf(2) * tfnorm(1, 1), 6), abs=1e-9
        )
        assert got[1].n_matched_terms == 1
        # rarer term (cherry) outscores the commoner apple docs
        assert [r.doc_id for r in rows] == sorted(
            got, key=lambda d: (-got[d].bm25, d)
        )
        assert rows[0].doc_id == 2

    def test_multi_term_sums_and_topk_cut(self, spark):
        """A doc matching both terms accumulates both contributions;
        top_k truncates after the (score DESC, id ASC) order."""
        from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
            bm25_topk,
        )

        df = spark.createDataFrame(
            [(1, "apple cherry"), (2, "apple"), (3, "cherry")],
            "doc_id long, text string",
        )
        rows = bm25_topk(df, ["apple", "cherry"], top_k=2).collect()
        assert len(rows) == 2
        assert rows[0].doc_id == 1 and rows[0].n_matched_terms == 2

    def test_precomputed_stats_df_matches_inline(self, spark):
        """The one-scan serving path (stats_df persisted at index
        time) returns the identical ranking."""
        from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
            bm25_topk,
        )
        from data_feature_extraction_and_retrieval_pipeline_spark.operators.retrieval import (
            bm25_topk as _b,
        )

        corpus = self._corpus(spark)
        inline = bm25_topk(corpus, ["apple", "cherry"], top_k=10).collect()
        stats = spark.createDataFrame(
            [(5, 10, 2, 1)], "__n long, __sumdl long, __df_0 long, __df_1 long"
        )
        served = _b(
            corpus, ["apple", "cherry"], top_k=10, stats_df=stats
        ).collect()
        key = lambda rows: [(r.doc_id, r.bm25, r.n_matched_terms) for r in rows]
        assert key(inline) == key(served)


def test_bm25_tokens_col_null_array_is_empty_doc(spark):
    """A NULL token array scores as the empty document (counted in N,
    dl 0, never matched) — without the coalesce F.size(NULL) is -1 and
    the dl/tf arithmetic silently skews."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        bm25_topk,
    )

    df = spark.createDataFrame(
        [(1, ["apple", "pear"]), (2, None), (3, ["apple"])],
        "doc_id long, toks array<string>",
    )
    rows = bm25_topk(df, ["apple"], tokens_col="toks", top_k=10).collect()
    assert sorted(r.doc_id for r in rows) == [1, 3]
    # N=3 and sumdl=3 include the NULL doc as an empty one: doc 3
    # (tf=1, dl=1, avgdl=1) must outscore doc 1 (tf=1, dl=2)
    by_id = {r.doc_id: r.bm25 for r in rows}
    assert by_id[3] > by_id[1] > 0


def test_rrf_fuse_hand_values(spark):
    """Exact RRF arithmetic on hand lists (k=60): a doc ranked 1 in
    text and 2 in vector scores 1/61 + 1/62; one-list docs contribute
    only their own term; ranks break score ties by id ascending; the
    fused ordering is by the raw sum with id tie-breaks."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        rrf_fuse,
    )

    text = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 5.0)],  # tie at 5.0 -> id 2 ranks 2
        "doc_id long, bm25 double",
    )
    vec = spark.createDataFrame(
        [(4, 0.99), (1, 0.98)],
        "doc_id long, cosine double",
    )
    rows = rrf_fuse(text, vec, k=60, top_k=10).collect()
    got = {r.doc_id: (r.text_rank, r.vector_rank, r.rrf_score) for r in rows}
    assert got[1] == (1, 2, round(1 / 61 + 1 / 62, 6))
    assert got[2] == (2, None, round(1 / 62, 6))
    assert got[3] == (3, None, round(1 / 63, 6))
    assert got[4] == (None, 1, round(1 / 61, 6))
    # raw-score ordering: doc 1 (two lists) first, then the best
    # single-list entries
    assert [r.doc_id for r in rows] == [1, 4, 2, 3]


def test_rrf_fuse_top_k_cut(spark):
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        rrf_fuse,
    )

    text = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(6)], "doc_id long, bm25 double"
    )
    vec = spark.createDataFrame(
        [(i + 100, 1.0 - i / 100.0) for i in range(6)],
        "doc_id long, cosine double",
    )
    rows = rrf_fuse(text, vec, top_k=4).collect()
    assert len(rows) == 4
    # equal ranks from both lists tie on the raw sum -> id ascending
    assert [r.doc_id for r in rows] == [0, 100, 1, 101]

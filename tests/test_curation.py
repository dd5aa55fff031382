"""Corpus-curation operators: chunking, mixture sampling, unigram LM
scoring, range similarity search (operators/curation.py,
operators/similarity.py::range_search)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.operators import curation, similarity
from data_feature_extraction_and_retrieval_pipeline_spark.sources import load_table

from conftest import SF_DIR


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestChunkWindows:
    def test_short_doc_single_chunk(self, spark):
        df = _docs(spark, ["a b c"])
        rows = curation.chunk_windows(df, window=4, stride=2).collect()
        assert len(rows) == 1
        assert rows[0].chunk_idx == 0 and rows[0].n_tokens == 3

    def test_empty_doc_no_chunks(self, spark):
        df = _docs(spark, ["", "   ", "x"])
        rows = curation.chunk_windows(df, window=4, stride=2).collect()
        assert {r.doc_id for r in rows} == {2}

    def test_every_token_covered_and_overlap(self, spark):
        # 10 tokens, window 4, stride 3:
        # 1 + ceil((10-4)/3) = 3 chunks -> starts 0,3,6 cover 0..9
        toks = [f"t{i}" for i in range(10)]
        df = _docs(spark, [" ".join(toks)])
        rows = sorted(
            curation.chunk_windows(df, window=4, stride=3).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert [r.chunk_idx for r in rows] == [0, 1, 2]
        assert [r.n_tokens for r in rows] == [4, 4, 4]
        # last chunk starts at 6, ends at 9 -> full coverage
        covered = set()
        for r in rows:
            covered |= set(range(r.chunk_idx * 3, r.chunk_idx * 3 + r.n_tokens))
        assert covered == set(range(10))

    def test_fingerprint_matches_content_not_position(self, spark):
        # identical chunk content -> identical fingerprint, across docs
        df = _docs(spark, ["a b c d", "a b c d"])
        rows = curation.chunk_windows(df, window=4, stride=4).collect()
        fps = {r.doc_id: r.chunk_fp for r in rows}
        assert fps[0] == fps[1]
        df2 = _docs(spark, ["a b c d", "a b c e"])
        rows2 = curation.chunk_windows(df2, window=4, stride=4).collect()
        fps2 = {r.doc_id: r.chunk_fp for r in rows2}
        assert fps2[0] != fps2[1]


class TestMixtureSample:
    def test_deterministic_and_rate_ordered(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        rates = {"src0": 1.0, "src1": 0.5}
        a = {r.doc_id for r in curation.mixture_sample(docs, rates, 0.1).collect()}
        b = {r.doc_id for r in curation.mixture_sample(docs, rates, 0.1).collect()}
        assert a == b  # no RNG state
        full = docs.filter(F.col("source") == "src0").count()
        kept = curation.mixture_sample(docs, rates, 0.1).filter(
            F.col("source") == "src0"
        ).count()
        assert kept == full  # rate 1.0 keeps everything

    def test_subset_monotone_in_rate(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        lo = {r.doc_id for r in curation.mixture_sample(docs, {}, 0.2).collect()}
        hi = {r.doc_id for r in curation.mixture_sample(docs, {}, 0.6).collect()}
        assert lo <= hi  # same hash, higher threshold -> superset


class TestUnigramLogprob:
    def test_rare_tokens_score_higher(self, spark):
        common = " ".join(["the"] * 8)
        rare = "zxqv wvut qqzz pppw xyzy abcd efgh ijkl"
        df = _docs(spark, [common] * 5 + [rare])
        out = {r.doc_id: r.avg_nll for r in curation.unigram_logprob(df).collect()}
        assert out[5] > out[0]

    def test_uniform_corpus_exact_value(self, spark):
        # 4 docs x 1 distinct token each, all distinct -> p = 2/8 per
        # token (each token appears twice)
        df = _docs(spark, ["aa aa", "bb bb", "cc cc", "dd dd"])
        out = curation.unigram_logprob(df).collect()
        for r in out:
            assert r.n_tokens == 2
            assert r.avg_nll == pytest.approx(-math.log(2 / 8), rel=1e-12)

    def test_shuffle_join_variant_matches_broadcast(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        a = {
            (r.doc_id, r.n_tokens, round(r.avg_nll, 9))
            for r in curation.unigram_logprob(docs, broadcast_vocab=True).collect()
        }
        b = {
            (r.doc_id, r.n_tokens, round(r.avg_nll, 9))
            for r in curation.unigram_logprob(docs, broadcast_vocab=False).collect()
        }
        assert a == b


class TestRangeSearch:
    def test_contains_topk_above_threshold(self, spark):
        emb = load_table(spark, SF_DIR, "embeddings")
        q = [r.embedding for r in emb.filter(F.col("vec_id") == 0).collect()][0]
        topk = similarity.brute_force_topk(emb, q, k=5).collect()
        tau = round(min(r.cosine for r in topk), 6)
        within = {r.vec_id for r in similarity.range_search(emb, q, tau).collect()}
        assert {r.vec_id for r in topk} <= within

    def test_threshold_filters(self, spark):
        emb = load_table(spark, SF_DIR, "embeddings")
        q = [r.embedding for r in emb.filter(F.col("vec_id") == 0).collect()][0]
        rows = similarity.range_search(emb, q, threshold=0.3).collect()
        assert all(r.cosine >= 0.3 for r in rows)


class TestPackBins:
    def test_bins_match_python_reference(self, spark):
        # two shards; per-shard running-offset packing at capacity 5
        rows = [
            # (doc_id, shard, chunk_idx, n_tokens)
            (1, "a", 0, 3), (1, "a", 1, 3), (2, "a", 0, 2), (3, "a", 0, 4),
            (1, "b", 0, 5), (2, "b", 0, 1),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, chunk_idx int, n_tokens long"
        )
        got = {
            (r.source, r.bin_id): (r.n_chunks, r.token_total)
            for r in curation.pack_bins(df, capacity=5, shard_col="source").collect()
        }
        expected = {}
        for shard in ("a", "b"):
            off = 0
            for doc_id, s, idx, n in sorted(rows):
                if s != shard:
                    continue
                b = off // 5
                c, t = expected.get((shard, b), (0, 0))
                expected[(shard, b)] = (c + 1, t + n)
                off += n
        assert got == expected

    def test_token_totals_conserved(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        chunks = curation.chunk_windows(
            docs, window=16, stride=12, carry_cols=("source",)
        )
        packed = curation.pack_bins(chunks, capacity=256, shard_col="source")
        total_chunks = chunks.count()
        agg = packed.agg(
            F.sum("n_chunks").alias("c"), F.sum("token_total").alias("t")
        ).collect()[0]
        assert agg.c == total_chunks
        assert agg.t == chunks.agg(F.sum("n_tokens")).collect()[0][0]


def test_quality_classifier_threshold_semantics(spark):
    """The linear quality gate: keep ⇔ rounded logit ≥ threshold, and
    the logit is the documented left-to-right weighted sum of the
    shared quality features."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.curation import (
        quality_classifier,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 10),
            (2, "x"),
            (3, ""),
            (4, "1234 5678 !!!! ????"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_classifier(docs, threshold=1.0).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for r in rows.values():
        assert r.keep == (r.logit >= 1.0)
    # long English prose clears the gate; empty/garbage does not
    assert rows[1].keep
    assert not rows[3].keep and not rows[4].keep
    # higher threshold keeps a subset
    strict = {
        r.doc_id for r in quality_classifier(docs, threshold=2.0).collect() if r.keep
    }
    loose = {
        r.doc_id for r in quality_classifier(docs, threshold=0.0).collect() if r.keep
    }
    assert strict <= loose


def test_quality_classifier_null_text_rejected(spark):
    """NULL text must score like empty text (rejected), not like a
    maximally-long document — F.least skips NULLs, so an un-coalesced
    length signal would saturate to 1.0 and keep garbage rows."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.curation import (
        quality_classifier,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "the data and the table of it " * 20)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_classifier(docs, threshold=0.0).collect()}
    assert rows[1].logit == rows[2].logit == -1.25
    assert not rows[1].keep and not rows[2].keep
    assert rows[3].keep


class TestTfidfKeywords:
    def test_hand_corpus(self, spark):
        """tf-idf on a 3-doc corpus vs by-hand values: N=3,
        df(apple)=1, df(banana)=2, df(cherry)=2, df(durian)=1."""
        df = _docs(
            spark,
            [
                "apple apple banana",
                "banana cherry",
                "cherry cherry cherry durian",
            ],
        )
        rows = curation.tfidf_keywords(df, top_n=2).collect()
        got = {(r.doc_id, r.rank): (r.term, r.tfidf) for r in rows}

        def tfidf(tf, dl, dfc, n=3):
            return round((tf / dl) * math.log((n + 1) / (dfc + 1)), 6)

        # doc 0: apple (2/3)·ln2 beats banana (1/3)·ln(4/3)
        assert got[(0, 1)] == ("apple", pytest.approx(tfidf(2, 3, 1)))
        assert got[(0, 2)] == ("banana", pytest.approx(tfidf(1, 3, 2)))
        # doc 2: durian (1/4)·ln2 vs cherry (3/4)·ln(4/3) — cherry wins
        assert got[(2, 1)] == ("cherry", pytest.approx(tfidf(3, 4, 2)))
        assert got[(2, 2)] == ("durian", pytest.approx(tfidf(1, 4, 1)))
        # every doc emits at most top_n rows, ranks are 1..n dense
        assert all(r.rank in (1, 2) for r in rows)

    def test_tie_breaks_on_term_and_null_text(self, spark):
        """Equal scores break alphabetically; a NULL-text doc emits no
        keyword rows (nothing to extract) but still counts toward N."""
        df = spark.createDataFrame(
            [(0, "zebra apple"), (1, None)], "doc_id long, text string"
        )
        rows = curation.tfidf_keywords(df, top_n=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
        assert sorted(by_doc[0]) == [(1, "apple"), (2, "zebra")]
        assert 1 not in by_doc

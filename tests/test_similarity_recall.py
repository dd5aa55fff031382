"""Recall floor at the documented ANN operating defaults.

ANN_TUNING.md (tools/ann_recall_report.py) documents the clustered-
regime defaults: IVF nprobe=2 over kmeans-trained nlist=16, and
IVF-PQ nprobe=2 with refine=8. This test pins recall@10 >= 0.9 for
both on the deterministic clustered fixture (synth.synth_embeddings),
so a regression in the probe math — centroid ranking, L2 bias term,
partition filter, ADC LUT, refine semi-join — cannot land silently.

Recall is a property of data structure as much as of the index:
the driver's uniform-sphere embeddings bound EVERY probe's recall by
its candidate fraction (see ANN_TUNING.md's adversarial table), so
the floor is pinned where a floor is achievable — the clustered
regime the indexes exist for.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark import synth
from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
    similarity,
)

K = 10
N = 1000
N_CLUSTERS = 16
NOISE = 0.18
SEED = 11


def _fixture(spark):
    emb = synth.synth_embeddings(
        spark, N, n_clusters=N_CLUSTERS, cluster_noise=NOISE, seed=SEED
    )
    return emb.select("vec_id", "embedding").persist()


def _truth(emb, queries):
    return {
        qid: [
            r["vec_id"]
            for r in similarity.brute_force_topk(emb, q, k=K).collect()
        ]
        for qid, q in queries.items()
    }


def _queries(emb, n=5):
    ids = [(7 + i * (N // n)) % N for i in range(n)]
    rows = emb.filter(F.col("vec_id").isin(ids)).collect()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def test_recall_floor_at_documented_defaults(spark):
    emb = _fixture(spark)
    try:
        queries = _queries(emb)
        truth = _truth(emb, queries)
        assigned, centroids = similarity.kmeans(emb, k=N_CLUSTERS, max_iter=5)
        assigned = assigned.persist()
        assigned.count()

        # IVF, nprobe=2, L2 probe rule (the kmeans layout's default)
        hits = 0
        for qid, q in queries.items():
            got = [
                r["vec_id"]
                for r in similarity.ivf_probe(
                    assigned, centroids, q, k=K, nprobe=2, l2=True
                ).collect()
            ]
            hits += len(set(got) & set(truth[qid]))
        recall = hits / (K * len(queries))
        assert recall >= 0.9, f"IVF nprobe=2 recall {recall}"

        # IVF-PQ, nprobe=2, refine=8 (ADC shortlist + exact re-rank)
        books = similarity.pq_train(emb, m=8, k=16)
        coded = similarity.pq_encode_catalyst(
            assigned, books, keep_cols=("cluster",)
        ).persist()
        coded.count()
        hits = 0
        for qid, q in queries.items():
            got = [
                r["vec_id"]
                for r in similarity.pq_refine_topk(
                    coded, emb, centroids, books, q,
                    k=K, nprobe=2, refine=8, l2=True,
                ).collect()
            ]
            hits += len(set(got) & set(truth[qid]))
        recall = hits / (K * len(queries))
        assert recall >= 0.9, f"IVF-PQ refine8 recall {recall}"
        coded.unpersist()
        assigned.unpersist()
    finally:
        emb.unpersist()

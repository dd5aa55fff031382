"""Deterministic synthetic table generators (scaling + ANN fixtures).

The driver's parquet fixtures stop at sf0.1; measuring the scaling
CURVE (sec/row flatness at 5-10x) and exercising ANN recall in the
clustered regime both need corpora the driver doesn't ship. These
generators produce schema-compatible `documents` / `embeddings`
tables at any row count, deterministically (counter-seeded RNG per
partition — same rows for a given (n, seed) regardless of
parallelism), with generation running EXECUTOR-side via mapInPandas
over a range frame, so the generator itself scales like an ingest
job instead of a driver loop.

Distribution matches the driver tables: documents are bag-of-words
over a small vocabulary (8-100 tokens), four languages and sources
with the same skew; embeddings are unit-norm float vectors, either
uniform on the sphere (the driver's regime — the ADVERSARIAL case
for ANN, where no probe beats its candidate fraction) or drawn
around ``n_clusters`` well-separated centers (the regime ANN
indexes exist for).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

_VOCAB = (
    "spark line column order small sort fast value scan hash slow group "
    "batch part vector query agg table stream filter big merge key window "
    "join customer the a supplier region nation price ship mode clerk "
    "segment tag image label row"
).split()

_LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]  # en-heavy, like sf*
_SOURCES = ["src0", "src1", "src2", "src3", "src4"]


def _range_frame(spark: SparkSession, n: int, parts: int) -> DataFrame:
    return spark.range(0, n, 1, parts)


def synth_documents(
    spark: SparkSession, n_docs: int, seed: int = 7, parts: int = 32
) -> DataFrame:
    """documents-shaped frame: (doc_id, text, lang, source, n_chars)."""
    vocab = list(_VOCAB)
    langs, sources = list(_LANGS), list(_SOURCES)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts, lang_v, src_v = [], [], []
            for i in ids:
                rng = np.random.default_rng(seed * 1000003 + int(i))
                n_tok = int(rng.integers(8, 100))
                toks = rng.choice(vocab, size=n_tok)
                texts.append(" ".join(toks))
                lang_v.append(langs[int(rng.integers(0, len(langs)))])
                src_v.append(sources[int(rng.integers(0, len(sources)))])
            yield pdf.assign(
                doc_id=ids,
                text=texts,
                lang=lang_v,
                source=src_v,
                n_chars=[len(t) for t in texts],
            ).drop(columns=["id"])

    return _range_frame(spark, n_docs, parts).mapInPandas(
        gen,
        schema="doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def synth_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    seed: int = 7,
    n_clusters: int = 0,
    cluster_noise: float = 0.25,
    parts: int = 32,
) -> DataFrame:
    """embeddings-shaped frame: (vec_id, embedding float[], label).

    ``n_clusters=0`` → uniform on the unit sphere (the driver-table
    regime). ``n_clusters=k`` → unit-norm points around k fixed
    well-separated unit centers with ``cluster_noise`` jitter; label
    = generating cluster (ground truth for recall tests).
    """
    centers = None
    if n_clusters:
        crng = np.random.default_rng(seed)
        centers = crng.normal(size=(n_clusters, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs, labels = [], []
            for i in ids:
                rng = np.random.default_rng(seed * 2000003 + int(i))
                if centers is None:
                    v = rng.normal(size=dim)
                    labels.append(int(rng.integers(0, 10)))
                else:
                    c = int(rng.integers(0, len(centers)))
                    v = centers[c] + cluster_noise * rng.normal(size=dim)
                    labels.append(c)
                v = v / np.linalg.norm(v)
                vecs.append(v.astype(np.float32))
            yield pdf.assign(
                vec_id=ids, embedding=vecs, label=labels
            ).drop(columns=["id"])

    return _range_frame(spark, n_vecs, parts).mapInPandas(
        gen, schema="vec_id long, embedding array<float>, label int"
    )


def write_synth_sf(
    spark: SparkSession,
    out_dir: str,
    n_docs: int,
    n_vecs: int,
    seed: int = 7,
    n_clusters: int = 0,
) -> str:
    """Write a documents+embeddings fixture dir usable as ``sf_dir``
    by every query that touches only those two tables."""
    synth_documents(spark, n_docs, seed=seed).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")
    synth_embeddings(
        spark, n_vecs, seed=seed, n_clusters=n_clusters
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    return out_dir

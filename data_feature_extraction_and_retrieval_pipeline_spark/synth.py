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
import pandas as pd
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


_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def synth_events(
    spark: SparkSession,
    n_events: int,
    seed: int = 7,
    n_users: int = 0,
    hot_frac: float = 0.01,
    span_days: int = 30,
    parts: int = 32,
) -> DataFrame:
    """events-shaped frame: (event_id, ts, user_id, event_type, value,
    props) — same schema and flavor as the driver table (5 event
    types, 30-day span, JSON props), but with SKEWED user activity:
    user 0 is a deliberate hot key absorbing ``hot_frac`` of ALL
    events (it stresses the per-user state of the temporal family —
    the funnel's collect+fold array, sessionize's single merged
    session, retention's per-user week set), and the remaining users
    draw with quadratic density toward low ids instead of uniformly.
    Counter-seeded per event id: the same (n_events, n_users, seed)
    yields the identical corpus at any parallelism. Unlike
    documents/embeddings, scales are NOT prefix-nested — the user
    population grows with the corpus (fixed users at 100x events
    would give an absurd per-user density), so each scale is
    distributionally matched instead.
    """
    if n_users <= 0:
        # mirror the driver table's ~67 events/user density
        n_users = max(2, n_events // 67)
    types = list(_EVENT_TYPES)
    span_us = span_days * 24 * 3600 * 1_000_000

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            ts_us = np.empty(len(ids), dtype="int64")
            users = np.empty(len(ids), dtype="int64")
            etypes, values, props = [], [], []
            for j, i in enumerate(ids):
                rng = np.random.default_rng(seed * 3000017 + int(i))
                ts_us[j] = int(rng.integers(0, span_us))
                if rng.random() < hot_frac:
                    users[j] = 0
                else:
                    users[j] = 1 + int((n_users - 1) * rng.random() ** 2)
                etypes.append(types[int(rng.integers(0, len(types)))])
                values.append(round(float(rng.uniform(0, 200)), 2))
                props.append('{"k": %d}' % int(rng.integers(0, 100)))
            yield pdf.assign(
                event_id=ids,
                ts=pd.to_datetime(ts_us, unit="us", origin="2024-01-01"),
                user_id=users,
                event_type=etypes,
                value=values,
                props=props,
            ).drop(columns=["id"])

    return _range_frame(spark, n_events, parts).mapInPandas(
        gen,
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )


def write_synth_sf(
    spark: SparkSession,
    out_dir: str,
    n_docs: int,
    n_vecs: int,
    seed: int = 7,
    n_clusters: int = 0,
    n_events: int = 0,
) -> str:
    """Write a documents+embeddings(+events when ``n_events``>0)
    fixture dir usable as ``sf_dir`` by every query that touches only
    those tables."""
    synth_documents(spark, n_docs, seed=seed).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")
    synth_embeddings(
        spark, n_vecs, seed=seed, n_clusters=n_clusters
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    if n_events > 0:
        synth_events(spark, n_events, seed=seed).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/events.parquet")
    return out_dir

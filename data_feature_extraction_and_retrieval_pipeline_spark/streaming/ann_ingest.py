"""Incremental ANN index maintenance — the upload→index lifecycle.

The reference pairs an upload path with its search index: every new
feature row is pushed into Elasticsearch at ingest and is immediately
servable (upload_features_to_elasticsearch.py:207-229 bulk-indexes
features; SRS §4.1-4.2 makes "index stays fresh as data arrives" a
requirement). This module is that lifecycle at the VECTOR layer for
the IVF(-PQ) serving tables:

- **ingest**: arriving vectors are assigned to the EXISTING (frozen)
  coarse centroids — a pure Arrow-batch matmul per micro-batch
  (operators/similarity.py::assign_clusters_np) — and appended into
  the ``partitionBy(cluster)`` serving layout via an availableNow /
  continuous file stream. Probes keep pruning partitions as the index
  grows; nothing about a query plan changes because ingest ran.
- **monitor**: centroid staleness is *measured*, not guessed — the
  cluster-occupancy distribution of newly ingested vectors is
  compared against the resident index with
  ``operators.reports.drift_report`` (exact cross-multiplied L1
  numerators, no float surface), so "the data moved under the
  centroids" is an alarm on exact integers.
- **compact/re-center**: when the monitor fires, one batch job
  recomputes each cluster's exact mean over the accumulated index
  (one Lloyd step — the FAISS ``train`` refresh), re-assigns under
  the new centroids, and rewrites the partitioned layout with a
  crash-safe swap.

Scale shape: assignment is map-only against a broadcast (k × dim)
centroid literal — no shuffle at ingest, embarrassingly parallel
across a 1000-executor stream. The monitor is one value-counts
aggregate per side over a k-sized domain. Re-centering is one
groupBy(cluster) mean (k × dim driver state, same bounded-collect
class as kmeans) plus one partitioned rewrite of the table.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, functions as F


def ann_assign_transform(
    centroids: list[Sequence[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    l2: bool = False,
    np_kernel: bool = True,
) -> Callable[[DataFrame], DataFrame]:
    """The ingest transform: nearest-centroid assignment against a
    FROZEN centroid list. Works identically on a batch frame and on a
    readStream frame (stateless map), which is what makes the
    stream≡batch equivalence testable row-for-row. ``np_kernel``
    selects the Arrow matmul kernel (the hot-loop default); the pure-
    Catalyst expression twin remains for SQL-only composition."""
    from ..operators.similarity import assign_clusters, assign_clusters_np

    def _transform(df: DataFrame) -> DataFrame:
        if np_kernel:
            return assign_clusters_np(
                df, centroids, vec_col=vec_col, out_col=cluster_col, l2=l2
            )
        return assign_clusters(
            df, centroids, vec_col=vec_col, out_col=cluster_col
        )

    return _transform


def start_ann_ingest(
    spark,
    source_dir: str,
    schema,
    index_path: str,
    checkpoint: str,
    centroids: list[Sequence[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    l2: bool = False,
):
    """Maintain the IVF serving layout on a file-source stream: each
    micro-batch is centroid-assigned and APPENDED into
    ``partitionBy(cluster)`` parquet (append suffices — vector rows
    are immutable; re-delivery dedup comes from checkpointed source
    offsets). Returns the started StreamingQuery (availableNow)."""
    from .ingest import incremental_ingest

    return incremental_ingest(
        spark,
        source_dir,
        schema,
        index_path,
        checkpoint,
        transform=ann_assign_transform(
            centroids, vec_col=vec_col, cluster_col=cluster_col, l2=l2
        ),
        partition_by=[cluster_col],
    )


def ivfpq_ingest_transform(
    centroids: list[Sequence[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    code_col: str = "pq_code",
) -> Callable[[DataFrame], DataFrame]:
    """The FULL billion-vector serving-layout transform at ingest:
    coarse-assign against frozen centroids, then PQ-encode against
    frozen codebooks — both pure Catalyst (assign_clusters +
    pq_encode_catalyst), so each micro-batch is a map inside
    whole-stage codegen emitting the compact (id, cluster, 8-byte
    code) row the ADC scan serves from. The float vector is DROPPED
    at the boundary: the maintained table is the compressed index,
    which is the point of PQ (a refine re-rank keeps its own
    uncompressed side table)."""
    from ..operators.similarity import assign_clusters, pq_encode_catalyst

    def _transform(df: DataFrame) -> DataFrame:
        assigned = assign_clusters(
            df, centroids, vec_col=vec_col, out_col=cluster_col
        )
        return pq_encode_catalyst(
            assigned,
            codebooks,
            id_col=id_col,
            vec_col=vec_col,
            out_col=code_col,
            keep_cols=(cluster_col,),
        )

    return _transform


def start_ivfpq_ingest(
    spark,
    source_dir: str,
    schema,
    index_path: str,
    checkpoint: str,
    centroids: list[Sequence[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    code_col: str = "pq_code",
):
    """Maintain the IVF-PQ serving layout on a file-source stream:
    assign + encode per micro-batch, append into
    ``partitionBy(cluster)`` parquet. The reference's upload→index
    loop with the index being the compressed ADC table."""
    from .ingest import incremental_ingest

    return incremental_ingest(
        spark,
        source_dir,
        schema,
        index_path,
        checkpoint,
        transform=ivfpq_ingest_transform(
            centroids,
            codebooks,
            vec_col=vec_col,
            id_col=id_col,
            cluster_col=cluster_col,
            code_col=code_col,
        ),
        partition_by=[cluster_col],
    )


def centroid_staleness(
    resident: DataFrame,
    arriving: DataFrame,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Centroid-staleness monitor: exact occupancy drift between the
    resident index and an arriving (already-assigned) batch, per
    cluster — ``drift_report`` over the cluster column, so the alarm
    arithmetic is exact BIGINT/DECIMAL (operators/reports.py). A
    cluster whose share of new traffic diverges from its resident
    share is where recall decays first (vectors land far from their
    assigned centroid); alarm on ``drift_num / (N·M)`` ≥ τ driver-side
    and trigger :func:`recenter_compact`."""
    from ..operators.reports import drift_report

    return drift_report(
        resident.select(F.col(cluster_col).cast("string").alias("c")),
        arriving.select(F.col(cluster_col).cast("string").alias("c")),
        cat_cols=("c",),
    )


def recenter(
    index_df: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> list[list[float]]:
    """One Lloyd step over the accumulated index: each cluster's new
    centroid is the exact mean of its member vectors (elementwise
    sum / count — the groupBy is map-side combined; driver state is
    k × dim, the same bounded-collect class as kmeans training).
    Clusters are returned ordered by cluster id; empty ids keep their
    slot absent (caller decides whether to retire them). NULL or
    mis-sized vectors are excluded from the means (a NULL first row
    used to poison the dimension probe and truncate every centroid):
    the dimension is the MODAL (most common, ties → largest) observed
    size, and only that-dimension rows contribute — F.sum skips
    NULLs, but a short vector's missing tail would otherwise silently
    bias the tail coordinates. Modal, not max: one corrupt over-long
    vector under a max probe would claim the dimension for itself and
    silently exclude every valid vector from the means."""
    dim_row = (
        index_df.select(F.size(F.col(vec_col)).alias("d"))
        .filter(F.col("d") > 0)
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("d").desc())
        .first()
    )
    if dim_row is None or dim_row["d"] is None or dim_row["d"] <= 0:
        return []
    dim = int(dim_row["d"])
    index_df = index_df.filter(F.size(F.col(vec_col)) == dim)
    sums = index_df.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.element_at(F.col(vec_col), i + 1)).alias(f"s{i}")
            for i in range(dim)
        ],
    )
    rows = sorted(sums.collect(), key=lambda r: r[cluster_col])
    return [
        [float(r[f"s{i}"]) / float(r["n"]) for i in range(dim)]
        for r in rows
    ]


def recenter_compact(
    spark,
    index_path: str,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> list[list[float]]:
    """The compaction/re-center batch job: read the accumulated
    partitioned index, recompute centroids (:func:`recenter`),
    re-assign every vector under the new centroids (l2 rule — means
    are not unit-norm), and rewrite the ``partitionBy(cluster)``
    layout with the crash-safe rename swap (the incremental_upsert
    pattern: the old index is never destroyed before the new one is
    complete). Returns the new centroids — the caller re-freezes them
    into the ingest transform. Also the small-files compaction: the
    rewrite coalesces each cluster's accumulated micro-batch files."""
    import shutil
    from pathlib import Path

    from ..operators.similarity import assign_clusters_np

    retired = f"{index_path}__retired"
    target = Path(index_path)
    if not target.exists() and Path(retired).exists():
        Path(retired).rename(target)  # roll back an interrupted swap

    index_df = spark.read.parquet(index_path)
    cents = recenter(index_df, vec_col=vec_col, cluster_col=cluster_col)
    if not cents:
        return []
    reassigned = assign_clusters_np(
        index_df.drop(cluster_col), cents, vec_col=vec_col,
        out_col=cluster_col, l2=True,
    )
    tmp = f"{index_path}__tmp_recenter"
    reassigned.write.mode("overwrite").partitionBy(cluster_col).parquet(tmp)
    if Path(retired).exists():
        shutil.rmtree(retired)
    target.rename(retired)
    Path(tmp).rename(index_path)
    shutil.rmtree(retired)
    return cents

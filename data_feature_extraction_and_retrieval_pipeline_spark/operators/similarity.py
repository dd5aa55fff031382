"""Similarity search over embedding columns.

Two tiers, per the training-data-pipeline requirement:

- **brute force**: exact cosine top-k — one scan, TakeOrderedAndProject.
  Correctness baseline and exactly the reference's ES script_score
  semantics (which is also an exact scan).
- **IVF (inverted file)**: coarse-quantize every vector to its nearest
  centroid ONCE (write-time at scale), then search only the nprobe
  closest clusters — the scan shrinks by ~nlist/nprobe. Centroids are
  a broadcast literal; cluster assignment is a partition-prunable
  column when the table is written partitioned by it.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions import vectors as V


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (vectors pre-normalized ⇒ dot)."""
    q = V.lit_vec(query_vec)
    return (
        embeddings.select(
            F.col(id_col), V.dot(F.col(vec_col), q).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def range_search(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Radius query: every vector with cosine ≥ threshold of the query
    (the candidate-pull sibling of ``brute_force_topk`` — "everything
    closer than τ", unbounded cardinality).

    ``round_to`` compares on the rounded score so the boundary set is
    stable across engines/accumulation orders. One scan, the predicate
    runs inside whole-stage codegen; at scale the IVF/LSH layouts
    prune the same way as for top-k (probe only partitions whose
    centroid/bucket admits τ).
    """
    q = V.lit_vec(query_vec)
    score = V.dot(F.col(vec_col), q)
    if round_to is not None:
        score = F.round(score, round_to)
    return embeddings.select(
        F.col(id_col), score.alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def assign_clusters(
    embeddings: DataFrame,
    centroids: list[Sequence[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment (max dot over a literal centroid
    array) — pure Catalyst expressions, no UDF.

    At 100 TB this runs once at ingest and the table is written
    ``partitionBy(cluster)`` so queries prune whole clusters.
    """
    cents = V.lit_mat(centroids)
    sims = F.transform(
        cents, lambda c: V.dot(F.col(vec_col), c)
    )
    best = F.array_position(sims, F.array_max(sims)) - 1
    return embeddings.withColumn(out_col, best.cast("int"))


def assign_clusters_np(
    embeddings: DataFrame,
    centroids: list[Sequence[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
    l2: bool = False,
) -> DataFrame:
    """Numpy twin of ``assign_clusters``: one Arrow batch matmul
    (rows × centroids) + argmax per batch instead of centroids×dim
    interpreted lambda steps per row. Same tie-break (highest dot,
    then lowest centroid index — ``np.argmax`` returns the first
    maximum). Preferred whenever the assignment itself is the hot
    loop (IVF build, cluster-blocked dedup); the expression form
    remains for composition inside pure-Catalyst plans."""
    C = np.asarray([[float(x) for x in c] for c in centroids], dtype=np.float64)
    # l2=True scores dot(x, c) - |c|²/2 — argmax equals the true
    # nearest-in-L2 assignment (|x|² is row-constant). Identical to
    # max-dot when every centroid is unit-norm (the IVF/LSH fixed-
    # centroid paths); required for Lloyd's once re-centered means
    # have diverging norms (kmeans), where raw max-dot is neither L2
    # nor spherical and the objective can oscillate.
    bias = 0.5 * (C * C).sum(axis=1) if l2 else 0.0
    dim = C.shape[1]

    def _assign(batches):
        for pdf in batches:
            arrs = pdf[vec_col].to_numpy()
            good = np.array(
                [a is not None and len(a) == dim for a in arrs], dtype=bool
            )
            out = np.empty(len(arrs), dtype=object)
            if good.any():
                M = np.stack(
                    [np.asarray(a, dtype=np.float64) for a in arrs[good]]
                )
                out[good] = np.argmax(M @ C.T - bias, axis=1).astype("int32")
            # null/wrong-length vectors -> null cluster, matching the
            # Catalyst twin's null propagation instead of crashing
            pdf = pdf.assign(**{out_col: out})
            yield pdf

    from pyspark.sql.types import IntegerType, StructField, StructType

    # copy the fields — DataFrame.schema returns a cached object that
    # StructType.add would mutate in place
    schema = StructType(
        list(embeddings.schema.fields) + [StructField(out_col, IntegerType())]
    )
    return embeddings.mapInPandas(_assign, schema=schema)


def assign_col_np(
    centroids: list[Sequence[float]],
    vec_col: str = "embedding",
    l2: bool = False,
):
    """Column-form twin of :func:`assign_clusters_np` — the coarse
    cluster as a SCALAR Arrow-batched pandas UDF over just the vector
    column. Same rule (argmax dot, optional −|c|²/2 L2 bias, ties to
    the lowest centroid index; null/wrong-dimension → null cluster),
    but only the vector ships Python-ward and only the int32 cluster
    ships back — mapInPandas round-trips every column INCLUDING the
    vector, so on an assign-then-shuffle pipeline this halves the
    Arrow bytes crossing the boundary. Prefer it when the assignment
    is a projection feeding a JVM-side plan; keep assign_clusters_np
    where the whole frame enters Python anyway."""
    from pyspark.sql.types import IntegerType

    C = np.asarray([[float(x) for x in c] for c in centroids], dtype=np.float64)
    bias = 0.5 * (C * C).sum(axis=1) if l2 else 0.0
    dim = C.shape[1]

    @F.pandas_udf(IntegerType())
    def _assign(s: pd.Series) -> pd.Series:
        arrs = s.to_numpy()
        good = np.array(
            [a is not None and len(a) == dim for a in arrs], dtype=bool
        )
        out = np.full(len(arrs), None, dtype=object)
        if good.any():
            M = np.stack(
                [np.asarray(a, dtype=np.float64) for a in arrs[good]]
            )
            out[good] = np.argmax(M @ C.T - bias, axis=1).astype("int32")
        return pd.Series(out)

    return _assign(F.col(vec_col))


def probe_clusters(
    centroids: list[Sequence[float]],
    query_vec: Sequence[float],
    nprobe: int,
    l2: bool = False,
) -> list[int]:
    """The query's ``nprobe`` closest coarse centroids (max dot, ties
    to the lowest index) — the single probe-selection rule shared by
    IVF and IVF-PQ so the two layouts can never drift apart.

    ``l2=True`` ranks by ``dot − |c|²/2`` (= nearest-in-L2, matching
    ``assign_clusters_np(l2=True)``): REQUIRED when the centroids are
    kmeans-trained means, whose norms diverge — probing by raw dot
    against the L2 assignment systematically picks over-long
    centroids and silently costs recall. Identical ranking when every
    centroid is unit-norm (the fixed-centroid query paths), which is
    why the certified queries keep the default."""
    q = [float(x) for x in query_vec]

    def score(c):
        d = sum(x * y for x, y in zip(c, q))
        return d - 0.5 * sum(x * x for x in c) if l2 else d

    ranked = sorted(
        range(len(centroids)), key=lambda i: (-score(centroids[i]), i)
    )
    return ranked[:nprobe]


def ivf_probe(
    assigned: DataFrame,
    centroids: list[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    l2: bool = False,
    predicate: F.Column | None = None,
) -> DataFrame:
    """IVF probe over an ALREADY-ASSIGNED table: score only vectors
    whose cluster is among the query's ``nprobe`` closest centroids.

    This is the steady-state query path — at scale the table was
    written ``partitionBy(cluster)`` at ingest and the ``isin`` filter
    is partition pruning; locally the assigned frame is a resident
    artifact (``indexes.materialized``). ``l2=True`` matches the
    probe rule to a kmeans-trained (L2-assigned) layout — see
    ``probe_clusters``.

    ``predicate`` is FILTERED vector search (the tag/metadata filter
    of Q1+P10 at index scale): a metadata condition on the assigned
    table's columns, applied conjunctively WITH the probe so Catalyst
    pushes both to the scan — a pre-filter, not a post-filter of the
    top-k, so the returned k are the best MATCHING vectors. Selective
    predicates thin every probed cluster; raise ``nprobe`` to hold
    recall (filtered serving's standard knob — candidate fraction is
    per-FILTERED-corpus once the predicate applies).
    """
    q = [float(x) for x in query_vec]
    probe = probe_clusters(centroids, q, nprobe, l2=l2)
    qcol = V.lit_vec(q)
    flt = assigned.filter(F.col(cluster_col).isin(*probe))
    if predicate is not None:
        flt = flt.filter(predicate)
    return (
        flt.select(F.col(id_col), V.dot(F.col(vec_col), qcol).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    centroids: list[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
    l2: bool = False,
    predicate: F.Column | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-assign (unless ``assigned`` is a
    pre-built index frame) then probe.

    Deterministic given fixed centroids (we use seeded/fixed centroid
    lists, mirroring the reference's seed=42 convention). ``l2=True``
    applies the L2 assignment+probe rule end-to-end (kmeans-trained
    centroid layouts — see probe_clusters). ``predicate`` = filtered
    vector search (see ivf_probe).
    """
    if assigned is None:
        assigned = assign_clusters_np(
            embeddings, centroids, vec_col=vec_col, l2=l2
        )
    return ivf_probe(
        assigned, centroids, query_vec, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, l2=l2, predicate=predicate,
    )


def hyperplane_bucket(
    vec_col,
    hyperplanes: list[Sequence[float]],
):
    """Random-hyperplane LSH bucket id: bit i = sign(v · h_i).

    Pure Catalyst expression (sum of sign tests) → whole-stage
    codegen; with the table written ``partitionBy(bucket)`` the probe
    becomes partition pruning, exactly like the IVF path.
    """
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    # LONG accumulation: at >=32 hyperplanes bit 31 would wrap an int
    # bucket negative (and >=64 is out of range entirely — asserted)
    assert len(hyperplanes) < 64, "bucket id must fit a signed long"
    bucket = F.lit(0).cast("long")
    for i, h in enumerate(hyperplanes):
        hcol = V.lit_vec(h)
        bucket = bucket + F.when(
            V.dot(col, hcol) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def hyperplane_bucket_np(vec_col, hyperplanes: list[Sequence[float]]):
    """Numpy twin of ``hyperplane_bucket``: ONE Arrow round trip
    computes all sign tests per row ((rows × dim) @ (dim × bits) then
    a bit-weighted sum) instead of ``bits`` interpreted HOF dots per
    row. Same bucket ids bit for bit (sign tests on the same doubles).
    Preferred for bucket-build scans; the expression form remains for
    pure-Catalyst composition (e.g. write-time partition columns in
    SQL-only pipelines)."""
    from pyspark.sql.functions import pandas_udf

    H = np.asarray([[float(x) for x in h] for h in hyperplanes], dtype=np.float64)
    powers = (1 << np.arange(len(hyperplanes))).astype(np.int64)
    if isinstance(vec_col, str):
        key = ("hyperplane_bucket", H.shape, H.tobytes(), vec_col)
        cached = V._UDF_COL_CACHE.get(key)
        if cached is not None:
            return cached
    else:
        key = None

    assert len(hyperplanes) < 64, "bucket id must fit a signed long"
    dim = H.shape[1]

    @pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        arrs = v.to_numpy()
        if len(arrs) == 0:
            return pd.Series([], dtype="int64")
        good = np.array(
            [a is not None and len(a) == dim for a in arrs], dtype=bool
        )
        out = np.empty(len(arrs), dtype=object)
        if good.any():
            M = np.stack(
                [np.asarray(a, dtype=np.float64) for a in arrs[good]]
            )
            bits = (M @ H.T) > 0
            out[good] = (bits @ powers).astype("int64")
        # null/wrong-length vectors -> null bucket (the Catalyst twin
        # yields null through the null dot), never a crashed job
        return pd.Series(out)

    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    out = _bucket(col)
    if key is not None:
        V._UDF_COL_CACHE[key] = out
    return out


def lsh_probe(
    bucketed: DataFrame,
    hyperplanes: list[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """LSH probe over an ALREADY-BUCKETED table: score only vectors
    whose bucket is within ``hamming`` bits of the query's bucket
    (multi-probe). The steady-state twin of ``ivf_probe`` — at scale
    the bucket is a write-time partition column."""
    q = [float(x) for x in query_vec]

    def _dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    qbucket = sum(1 << i for i, h in enumerate(hyperplanes) if _dot(q, h) > 0)
    probe = F.bit_count(
        F.col(bucket_col).bitwiseXOR(F.lit(qbucket))
    ) <= F.lit(hamming)
    qcol = V.lit_vec(q)
    return (
        bucketed.filter(probe)
        .select(F.col(id_col), V.dot(F.col(vec_col), qcol).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def lsh_topk(
    embeddings: DataFrame,
    hyperplanes: list[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: bucket-build (unless
    ``bucketed`` is a pre-built index frame) then multi-probe.

    The candidate set shrinks ~2^bits/(1+bits choose hamming); recall
    comes from multi-probe rather than bigger buckets.
    """
    if bucketed is None:
        bucketed = embeddings.withColumn(
            "bucket", hyperplane_bucket_np(vec_col, hyperplanes)
        )
    return lsh_probe(
        bucketed, hyperplanes, query_vec, k=k, hamming=hamming,
        id_col=id_col, vec_col=vec_col,
    )


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    max_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_centroids: list[Sequence[float]] | None = None,
    fit_sample: float | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means over an embedding column — the engine's
    iterative-algorithm pattern (repeated assign → re-center with the
    k×dim centroid state collected to the driver and re-broadcast each
    round; the data never leaves the cluster). Assignment is exact
    nearest-in-L2 (argmax dot − |c|²/2), so the Lloyd objective is
    non-increasing by construction.

    Deterministic: init = the first k vectors by id (seed-free,
    mirroring the fixed-centroid convention), ties broken by lowest
    centroid index. Empty clusters keep their previous centroid.
    Returns (assignments DataFrame, final centroids). At 100 TB this
    is the write-time clustering that feeds ``ivf_topk`` partitioning.

    ``fit_sample`` fits the centroids on a deterministic hash sample
    of the corpus (the standard billion-vector recipe: centroid
    quality converges long before the full corpus is seen) while the
    returned assignment still covers EVERY row — only the iterative
    re-center loop shrinks, the one linear pass at ingest doesn't.
    """
    if init_centroids is None:
        rows = (
            embeddings.orderBy(id_col).limit(k).select(vec_col).collect()
        )
        cents = [[float(x) for x in r[0]] for r in rows]
    else:
        cents = [[float(x) for x in c] for c in init_centroids]
    if len(cents) < k:
        raise ValueError(
            f"kmeans: need at least k={k} vectors to initialize, "
            f"got {len(cents)}"
        )

    dim = len(cents[0])
    fit_df = embeddings
    if fit_sample is not None and 0 < fit_sample < 1:
        # deterministic hash sample (no RNG state — same selection on
        # every run), mirroring operators/curation.py::mixture_sample
        fit_df = embeddings.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1000))
            < F.lit(int(round(fit_sample * 1000)))
        )
    assigned = None
    for _ in range(max_iter):
        # exact-L2 Lloyd assignment (argmax dot - |c|²/2): re-centered
        # means have diverging norms, where raw max-dot is neither L2
        # nor spherical and the objective can oscillate
        assigned = assign_clusters_np(fit_df, cents, vec_col=vec_col, l2=True)
        sums = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col).cast("array<double>"))
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        acc: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = r["s"]
            counts[r["cluster"]] = r["n"]
        cents = [
            [x / counts[c] for x in acc[c]] if c in acc else cents[c]
            for c in range(k)
        ]
    return (
        assign_clusters_np(embeddings, cents, vec_col=vec_col, l2=True),
        cents,
    )


def cosine_self_join_pairs(
    embeddings: DataFrame,
    centroids: list[Sequence[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, bucketed by IVF cluster:
    only vectors in the SAME cluster are compared (blocking), turning
    the O(N²) self-join into independent per-cluster blocks.

    Each block is scored with ONE Arrow-batched numpy matmul
    (``applyInPandas`` grouped map) instead of materializing the pair
    rows and paying an interpreted higher-order dot per pair — the
    round-1 formulation's dominant CPU cost. Only pairs at/above the
    threshold ever leave the Python worker. Shuffle = one hash
    partition of (id, vector) on the cluster key.

    At 100 TB the block size is bounded by the centroid count (pick
    k ≈ √N so blocks stay ~√N rows); the row-chunked matmul below
    keeps peak memory at chunk × block scores regardless of block
    size. Exactly duplicate vectors always share a cluster, so
    blocking loses no true duplicates at high thresholds.
    """
    thr = float(threshold)
    if assigned is None:
        # expression-form assignment (HOF dot + argmax): the map stage
        # before the cluster exchange stays pure JVM, so the operator
        # pays ONE Arrow crossing (the block matmul) instead of two —
        # same first-maximum tie-break and null/ragged→null-cluster
        # propagation as assign_clusters_np
        assigned = assign_clusters(embeddings, centroids, vec_col=vec_col)
    # NULL-cluster rows (null / wrong-dimension vectors, the
    # assignment's null propagation) pair with nothing — they would
    # otherwise collect into one NULL group whose np.array over a
    # None/ragged vector kills the whole job (the round-8
    # incremental_cosine_filter fix applied to the all-pairs sibling)
    assigned = assigned.filter(F.col("cluster").isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"), F.col("cluster")
    )

    def _block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["__id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf["__vec"].iloc[order]]
        )
        n = len(ids)
        out_a, out_b, out_c = [], [], []
        chunk = 1024  # bounds the score buffer at chunk×n doubles
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            scores = mat[lo:hi] @ mat.T  # (hi-lo, n)
            for i in range(lo, hi):
                row = scores[i - lo]
                js = np.nonzero(row[i + 1 :] >= thr)[0] + i + 1
                if js.size:
                    out_a.append(np.full(js.size, ids[i]))
                    out_b.append(ids[js])
                    out_c.append(row[js])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    # pair-id types follow the actual id column (the hardcoded "long"
    # crashed the Arrow return path for string/uuid ids)
    id_type = embeddings.schema[id_col].dataType.simpleString()
    return assigned.groupBy("cluster").applyInPandas(
        _block_pairs,
        schema=f"id_a {id_type}, id_b {id_type}, cosine double",
    )


def incremental_cosine_filter(
    batch: DataFrame,
    corpus: DataFrame | None,
    centroids: list[Sequence[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_assigned: DataFrame | None = None,
    gate: str = "arrow",
) -> DataFrame:
    """Batch-vs-corpus embedding near-dup gate — the daily-ingest
    decision table at the VECTOR layer (the cosine sibling of
    dedup.incremental_exact_filter / dedup_minhash_incremental): for
    every arriving vector, is a resident vector within cosine
    ``threshold``? Emits one row per batch vector:
    ``(vec_id, n_matches, best_cosine, keep)`` — ``best_cosine`` is
    the max cosine against ANY same-cluster resident (NULL when the
    cluster holds no residents), ``keep`` = no resident at/above the
    threshold.

    Two physical gates, same verdicts (pytest-pinned equal):

    - ``gate="arrow"`` (default, the 100 TB shape): the two sides are
      TAGGED and unioned, coarse-assigned against the frozen
      centroids in pure Catalyst, then grouped by cluster — each
      cluster scores with ONE numpy matmul (arrivals × residents),
      splitting the sides inside the pandas frame. One exchange and
      one Python crossing total (round 9; the round-7 cogroup paid
      three crossings and two exchanges). BLAS throughput makes this
      the winner once blocks carry real data.
    - ``gate="expr"`` (pure JVM, zero Python): cluster-blocked LEFT
      join (arrivals ⟕ residents on cluster) + higher-order dot per
      pair + per-arrival aggregate — the oracle's own formulation.
      Every pair pays an interpreted dim-step fold, so this loses to
      the matmul as B×R_c grows; it wins in the small-batch regime
      where the Arrow gate's cost is all worker spin-up (measured at
      sf0.1/x10 in SCALING.md "Cosine gate: expr vs arrow"). With
      dims ≤ 64 and bounded daily batches it is also the shape that
      lets a plan pin assert NO Python anywhere in the operator.

    The corpus is never self-joined and the batch never leaves its
    cluster block in either gate; at 100 TB the resident side is the
    bucketed serving layout (ann_ingest) whose cluster is already
    materialized, so a caller there feeds ``corpus_assigned`` frames
    and only the (small) daily batch pays the assignment (itself pure
    Catalyst). Exactly duplicate vectors always share a cluster, so
    blocking loses no true duplicates at high thresholds.
    """
    if gate not in ("arrow", "expr"):
        raise ValueError(f"unknown gate {gate!r}")
    thr = float(threshold)
    if gate == "expr":
        arr = assign_clusters(
            batch.select(F.col(id_col), F.col(vec_col)),
            centroids,
            vec_col=vec_col,
        ).select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__bvec"),
            F.col("cluster"),
        )
        res_src = (
            corpus_assigned
            if corpus_assigned is not None
            else assign_clusters(
                corpus.select(F.col(id_col), F.col(vec_col)),
                centroids,
                vec_col=vec_col,
            )
        )
        # null-cluster residents can never match (nothing cosines
        # against an unscorable vector); null-cluster ARRIVALS keep
        # their row because null join keys never match — the left
        # join leaves __rvec null, the dot folds to null, and the
        # aggregate lands on the same (0, NULL, keep) verdict the
        # Arrow gate emits for them
        res = res_src.filter(F.col("cluster").isNotNull()).select(
            F.col(vec_col).alias("__rvec"), F.col("cluster")
        )
        scored = arr.join(res, "cluster", "left").select(
            "__id", V.dot("__bvec", "__rvec").alias("__dot")
        )
        out = scored.groupBy("__id").agg(
            F.sum(
                F.when(F.col("__dot") >= thr, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_matches"),
            F.max("__dot").alias("best_cosine"),
        )
        return out.select(
            F.col("__id").alias("vec_id"),
            "n_matches",
            "best_cosine",
            (F.col("n_matches") == 0).alias("keep"),
        )
    if corpus_assigned is not None:
        # serving-layout path: the resident side already carries its
        # cluster column (read from the partitionBy(cluster) index the
        # ingest path maintains, or a session-resident artifact) — only
        # the small arriving batch pays the assignment, which is
        # exactly the steady-state cost profile at 100 TB. The batch
        # assignment is the pure-Catalyst expression form (HOF dot +
        # argmax — no UDF): the map stage before the cluster exchange
        # then contains NO Python at all, so the whole operator pays
        # exactly ONE Arrow crossing (the gate). np.argmax and
        # array_position-of-array_max share the first-maximum
        # tie-break, and both null and wrong-dimension vectors
        # propagate to a null cluster (zip_with pads with null), so
        # the assignment is interchangeable with assign_clusters_np.
        ab = assign_clusters(
            batch.select(F.col(id_col), F.col(vec_col)),
            centroids,
            vec_col=vec_col,
        )
        assigned = ab.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
            F.col("cluster"),
            F.lit(True).alias("__arriving"),
        ).unionByName(
            corpus_assigned.select(
                F.col(id_col).alias("__id"),
                F.col(vec_col).alias("__vec"),
                F.col("cluster"),
                F.lit(False).alias("__arriving"),
            )
        )
    else:
        tagged = batch.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
            F.lit(True).alias("__arriving"),
        ).unionByName(
            corpus.select(
                F.col(id_col).alias("__id"),
                F.col(vec_col).alias("__vec"),
                F.lit(False).alias("__arriving"),
            )
        )
        # expression-form assignment for the same one-Arrow-crossing
        # plan as the serving path (the gate is the only Python)
        assigned = assign_clusters(tagged, centroids, vec_col="__vec")
    # NULL-cluster rows (null / wrong-dimension vectors — the
    # assignment's promised null propagation) hash into ONE group and
    # must NOT reach the matmul: np.asarray over a None/ragged vector
    # raises and one bad arriving row would kill the whole gate job.
    # The gate detects the null-key group and verdicts its arriving
    # rows explicitly — (n_matches 0, best_cosine NULL, keep true),
    # the same verdict a resident-free cluster gets — while its
    # residents are ignored (nothing can cosine-match an unscorable
    # vector). Handled INSIDE the grouped pass rather than as a
    # filtered union branch: a union would re-evaluate the whole
    # scan+assign subtree for the bad rows (Catalyst shares exchanges,
    # not map subtrees), doubling the operator's fixed cost.

    def _gate(pdf: pd.DataFrame) -> pd.DataFrame:
        arriving = pdf["__arriving"].to_numpy()
        bat = pdf[arriving]
        if bat.empty:
            # dtype follows the actual id column (a string id would
            # otherwise come back int64 against the declared schema)
            return pd.DataFrame(
                {"vec_id": [], "n_matches": [], "best_cosine": [], "keep": []}
            ).astype(
                {
                    "vec_id": pdf["__id"].dtype,
                    "n_matches": "int64",
                    "best_cosine": "float64",
                    "keep": "bool",
                }
            )
        ids = bat["__id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        res = pdf[~arriving]
        if res.empty or pd.isna(pdf["cluster"]).all():
            # NULL (not NaN) best_cosine: pandas' float NaN would
            # arrive Spark-side as a non-null NaN and diverge from the
            # SQL MAX-over-no-rows NULL — the nullable dtype carries
            # true NA through Arrow. Covers both the resident-free
            # cluster and the null-key (unscorable vectors) group —
            # same verdict, and neither may touch a vector.
            return pd.DataFrame(
                {
                    "vec_id": ids,
                    "n_matches": np.zeros(len(ids), dtype="int64"),
                    "best_cosine": pd.array(
                        [pd.NA] * len(ids), dtype="Float64"
                    ),
                    "keep": np.ones(len(ids), dtype=bool),
                }
            )
        B = np.array(
            [np.asarray(v, dtype=np.float64) for v in bat["__vec"].iloc[order]]
        )
        C = np.array(
            [np.asarray(v, dtype=np.float64) for v in res["__vec"]]
        )
        n_out = np.empty(len(ids), dtype="int64")
        best = np.empty(len(ids), dtype="float64")
        chunk = 1024  # bounds the score buffer at chunk×|residents|
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            scores = B[lo:hi] @ C.T
            n_out[lo:hi] = (scores >= thr).sum(axis=1)
            best[lo:hi] = scores.max(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "n_matches": n_out,
                "best_cosine": best,
                "keep": n_out == 0,
            }
        )

    id_type = batch.schema[id_col].dataType.simpleString()
    return assigned.groupBy("cluster").applyInPandas(
        _gate,
        schema=(
            f"vec_id {id_type}, n_matches long, "
            "best_cosine double, keep boolean"
        ),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-scan ANN family
# ---------------------------------------------------------------------------

def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    max_iter: int = 10,
    sample_n: int = 65536,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ codebooks: split the vector into ``m`` subspaces and
    run L2 Lloyd's per subspace on a bounded driver-side sample —
    the standard recipe (FAISS trains on ~10⁵ vectors regardless of
    corpus size; codebook quality converges long before the corpus is
    seen). Deterministic: hash-ordered sample, first-k init, numpy
    argmin ties to the lowest centroid.

    Returns ``m`` codebooks of ``k`` centroids each (m × k × dim/m
    doubles — a few KB of driver state at any corpus scale).
    """
    sample = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    if not sample:
        raise ValueError("pq_train: no vectors to train on")
    X = np.asarray([[float(x) for x in r[1]] for r in sample], dtype=np.float64)
    dim = X.shape[1]
    assert dim % m == 0, (dim, m)
    d = dim // m
    books: list[list[list[float]]] = []
    for s in range(m):
        Xs = X[:, s * d:(s + 1) * d]
        C = Xs[: min(k, len(Xs))].copy()
        if len(C) < k:  # degenerate tiny corpus: pad with repeats
            C = np.vstack([C] * (k // len(C) + 1))[:k]
        for _ in range(max_iter):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(k):
                hit = Xs[a == c]
                if len(hit):
                    C[c] = hit.mean(axis=0)
        books.append([[float(x) for x in row] for row in C])
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Encode each vector as ``m`` small centroid ids (array<int>) —
    a write-time column like the IVF cluster id. At dim=64, m=8,
    k=16 the code is 8 bytes vs 256 bytes of float32: the scan that
    serves queries reads ~32× fewer vector bytes.

    Arrow-batched numpy: one (rows × k) distance matrix per subspace
    per batch; argmin ties to the lowest centroid id.
    """
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    d = B[0].shape[1]

    def _encode(batches):
        for pdf in batches:
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * d:(s + 1) * d]
                d2 = ((Xs[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: list(codes.tolist())}
            )

    # id type follows the actual id column (a hardcoded long crashes
    # the Arrow return path for string/uuid ids — same fix as
    # cosine_self_join_pairs)
    schema = StructType(
        [
            StructField(id_col, embeddings.schema[id_col].dataType),
            StructField(out_col, ArrayType(IntegerType())),
        ]
    )
    return embeddings.select(id_col, vec_col).mapInPandas(_encode, schema)


def pq_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    lut: list[list[float]] | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over PQ codes,
    entirely JVM-side: the per-subspace lookup table
    ``LUT[s][c] = query_s · centroid_{s,c}`` is a literal
    array<array<double>> (m × k doubles), and each row's score is m
    array lookups + adds inside whole-stage codegen — no Python, no
    join, and the scan reads only the 8-byte codes. Top-k plans as
    TakeOrderedAndProject. Approximation error is the quantization
    error of the reconstruction (classic PQ/ADC — Jégou et al. 2011).

    ``lut`` overrides the numpy-computed lookup table — the portable
    twin passes ``pq_lut`` (left-to-right accumulation, bit-matching
    DuckDB) so the SAME scoring expression serves both paths.
    ``round_to`` rounds the score BEFORE the top-k order (rounded
    score DESC, id ASC — the cross-engine total-order convention).
    """
    if lut is None:
        q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
        m = len(codebooks)
        d = len(codebooks[0][0])
        lut = [
            [float(q[s * d:(s + 1) * d] @ np.asarray(c)) for c in codebooks[s]]
            for s in range(m)
        ]
    else:
        m = len(lut)
    lut_col = V.lit_mat(lut)
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(lut_col, s + 1),
            F.element_at(F.col(code_col), s + 1) + 1,
        ),
    )
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        codes.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def ivfpq_topk(
    coded: DataFrame,
    centroids: list[Sequence[float]],
    codebooks: list[list[list[float]]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    cluster_col: str = "cluster",
    lut: list[list[float]] | None = None,
    round_to: int | None = None,
    l2: bool = False,
) -> DataFrame:
    """IVF-PQ: the standard billion-vector serving layout — coarse
    cluster pruning (scan nprobe/nlist of the table) composed with the
    compressed ADC scan (read 8×-smaller codes instead of vectors).

    ``coded`` carries BOTH write-time columns (cluster id + PQ code);
    at scale it is written ``partitionBy(cluster)`` so the ``isin``
    probe is partition pruning, and the pruned partitions are read
    code-only (the float vectors never leave the ingest path). The
    scoring expression is the same literal-LUT aggregate as
    ``pq_topk`` — whole-stage codegen, no Python, no join.
    """
    probe = probe_clusters(centroids, query_vec, nprobe, l2=l2)
    return pq_topk(
        coded.filter(F.col(cluster_col).isin(*probe)),
        codebooks,
        query_vec,
        k=k,
        id_col=id_col,
        code_col=code_col,
        lut=lut,
        round_to=round_to,
    )


def pq_refine_topk(
    coded: DataFrame,
    embeddings: DataFrame,
    centroids: list[Sequence[float]],
    codebooks: list[list[list[float]]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    refine: int = 4,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    cluster_col: str = "cluster",
    vec_col: str = "embedding",
    l2: bool = False,
) -> DataFrame:
    """IVF-PQ with exact re-ranking (the FAISS ``refine`` pattern):
    the compressed ADC scan shortlists ``k*refine`` candidates, then
    the true vectors of JUST the shortlist are fetched and re-scored
    exactly. Quantized distances collapse when true neighbors are
    tightly packed (the quantization error exceeds the inter-neighbor
    gaps), so raw IVF-PQ recall@k plateaus; re-ranking restores it
    while still reading the corpus code-only.

    Scale shape: the shortlist is ``k*refine`` ids (a broadcast), and
    the vector fetch is an id semi-join against the float table — at
    100 TB that table is bucketed by id, so the fetch is a point
    lookup per shortlist id, not a scan. Cost = ADC scan over
    nprobe/nlist of the codes + refine*k vector reads.
    """
    short = ivfpq_topk(
        coded, centroids, codebooks, query_vec,
        k=k * refine, nprobe=nprobe, id_col=id_col, code_col=code_col,
        cluster_col=cluster_col, l2=l2,
    )
    q = [float(x) for x in query_vec]
    qcol = V.lit_vec(q)
    return (
        embeddings.join(F.broadcast(short.select(id_col)), id_col, "left_semi")
        .select(F.col(id_col), V.dot(F.col(vec_col), qcol).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Portable PQ twin — oracle-certifiable fixed-grid codebooks
# ---------------------------------------------------------------------------
#
# ``pq_train`` is numpy Lloyd's: float codebooks whose values depend on
# fp summation order, so no SQL engine can replay them bit-for-bit. The
# portable twin swaps ONLY the quantizer inputs, keeping the serving
# plan identical (the certified part IS the layout):
#
# - codebooks / coarse centroids are a FIXED 1/16-grid — every value is
#   i/16 with |i| ≤ 4, exactly representable as a binary double AND as
#   a short decimal, so Spark literals (vectors.lit_mat) and DuckDB
#   ``::DOUBLE`` casts agree bit-for-bit;
# - sub-quantization is max-DOT (argmax of dot(sub, centroid), ties to
#   the lowest id) — the same inner-product rule as assign_clusters /
#   probe_clusters, already hash-certified against DuckDB's
#   list_dot_product in the IVF queries;
# - the ADC scan is the PRODUCTION ``pq_topk`` expression with the LUT
#   computed left-to-right (``pq_lut``) instead of via numpy dot.
#
# Same certification move as dedup_minhash_lsh_portable: the xxhash/fp
# production path stays for throughput, the portable twin proves the
# pipeline's join/score/top-k semantics on values.


def portable_pq_codebooks(
    m: int = 8, k: int = 16, d: int = 8
) -> list[list[list[float]]]:
    """Deterministic fixed-grid PQ codebooks (m × k × d values on the
    exact 1/16 grid, spanning the embedding fixtures' component range)
    — data-independent, so the oracle SQL can inline them at registry
    import time."""
    return [
        [
            [(((c * 131 + j * 31 + s * 17 + 7) % 9) - 4) / 16.0 for j in range(d)]
            for c in range(k)
        ]
        for s in range(m)
    ]


def portable_coarse_centroids(
    nlist: int = 8, dim: int = 64
) -> list[list[float]]:
    """Fixed-grid coarse (IVF) centroids on the same exact 1/16 grid."""
    return [
        [(((c * 37 + j * 11 + 3) % 9) - 4) / 16.0 for j in range(dim)]
        for c in range(nlist)
    ]


def pq_lut(
    codebooks: list[list[list[float]]], query_vec: Sequence[float]
) -> list[list[float]]:
    """ADC lookup table with LEFT-TO-RIGHT accumulation in pure Python
    doubles — bit-matching DuckDB's list_dot_product / list_reduce, so
    the literal LUT Spark scans with equals what the oracle recomputes
    in-query."""
    q = [float(x) for x in query_vec]
    m = len(codebooks)
    d = len(codebooks[0][0])
    lut: list[list[float]] = []
    for s in range(m):
        row = []
        for cvec in codebooks[s]:
            acc = 0.0
            for j in range(d):
                acc += q[s * d + j] * float(cvec[j])
            row.append(acc)
        lut.append(row)
    return lut


def pq_encode_catalyst(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Pure-Catalyst PQ encode: per subspace, dot the slice against
    each literal centroid and take the argmax (ties to the lowest
    centroid id — array_position returns the first maximum). No
    Python anywhere; at scale this runs once at ingest exactly like
    ``assign_clusters``, writing the 8-byte code column.

    Max-dot sub-quantization (not L2 argmin) so every accumulation is
    the already-certified ``vectors.dot`` left-to-right form; the
    numpy path (``pq_encode``) keeps the classic L2 quantizer."""
    m = len(codebooks)
    k = len(codebooks[0])
    d = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")

    def _sims(sub, book):
        # closure factory — Spark reads the lambda's arity, so the
        # captured columns must not appear as default parameters
        return lambda c: V.dot(sub, F.element_at(book, c + 1))

    codes = []
    for s in range(m):
        sub = F.slice(v, s * d + 1, d)
        book = V.lit_mat(codebooks[s])
        sims = F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)), _sims(sub, book)
        )
        codes.append(
            (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
        )
    return embeddings.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], F.array(*codes).alias(out_col)
    )

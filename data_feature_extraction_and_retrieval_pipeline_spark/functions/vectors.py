"""Vector column math (SURVEY.md §2.7 F11-F13).

The similarity dot stays JVM-side as a higher-order-function
expression. Spark evaluates HOF lambdas INTERPRETED (they do not
join whole-stage codegen), but the work never leaves the JVM and
needs no Arrow serialization of the vector column — and that trade
was measured, not guessed: scoring one query vector against the
embeddings table (64-dim) takes ~0.36 s for the HOF form vs ~0.75 s
for an Arrow-batched numpy ``pandas_udf``/``arrow_udf`` twin at 64×
the sf0.1 row count, because a linear-work dot transfers every
vector byte to Python for O(dim) flops. The numpy path wins only
where per-byte work is superlinear — the per-cluster block matmul in
``operators/similarity.py::cosine_self_join_pairs`` — or for wide
multi-query scoring (``dot_batch`` below).

Embeddings are stored L2-normalized (the reference normalizes at
extraction, extract_clip_features.py:30), so cosine similarity
reduces to a dot product.

Accumulation is forced to DOUBLE regardless of the stored FLOAT
element type: deterministic, and matches the DuckDB oracle's
``list_dot_product(a::DOUBLE[], b::DOUBLE[])``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F


def _as_double_array(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns (F12).

    Reference: client-side ``np.dot`` (search_with_segments.py:254-256)
    and Painless ``cosineSimilarity`` (search_test_image.py:63).
    """
    return F.aggregate(
        F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lit_vec(values) -> Column:
    """A literal ``array<double>`` column built from ONE JVM-parsed
    expression string instead of per-element ``F.lit`` conversion.

    ``F.lit([64 floats])`` costs ~80 ms of py4j round trips (one per
    element); the equivalent ``expr("array(…D, …D)")`` parses in ~2 ms.
    ``repr(float)`` is the shortest exact round-trip form and Spark's
    ``D`` suffix pins the literal to DOUBLE, so values are bit-identical
    to the ``F.lit`` path.
    """
    body = ", ".join(_double_literal(float(x)) for x in values)
    return F.expr(f"array({body})")


def _double_literal(x: float) -> str:
    if x != x:  # NaN
        return "cast('NaN' as double)"
    if x == float("inf"):
        return "cast('Infinity' as double)"
    if x == float("-inf"):
        return "cast('-Infinity' as double)"
    return f"{x!r}D"


def lit_mat(rows) -> Column:
    """Literal ``array<array<double>>`` via one parsed expression —
    the matrix twin of ``lit_vec`` (centroid/hyperplane tables)."""
    body = ", ".join(
        "array(" + ", ".join(_double_literal(float(x)) for x in r) + ")"
        for r in rows
    )
    return F.expr(f"array({body})")


# Applied-UDF memo: creating a pandas_udf column costs ~150-200 ms of
# cloudpickle + py4j per application. The closure depends only on the
# captured matrix and the input column name, so identical (matrix,
# column) pairs reuse the already-built Column within a session.
_UDF_COL_CACHE: dict[tuple, Column] = {}


def dot_batch(vec_col: Column | str, query_vecs) -> Column:
    """Arrow-batched numpy scores of a vector column against a MATRIX
    of literal query vectors — returns ``array<double>`` of one score
    per query, in query order.

    This is the vectorized twin the HOF `dot` can't express cheaply:
    Q queries amortize the one-time Arrow transfer of each row's
    vector across Q·dim flops of BLAS matmul, so it pulls ahead of Q
    separate HOF dots as Q grows (batch/multi-probe serving). For a
    single query vector the HOF form measured faster (module
    docstring) — prefer `dot` there.
    """
    from pyspark.sql.functions import pandas_udf

    Q = np.asarray([[float(x) for x in q] for q in query_vecs], dtype=np.float64)
    if isinstance(vec_col, str):
        key = ("dot_batch", Q.shape, Q.tobytes(), vec_col)
        cached = _UDF_COL_CACHE.get(key)
        if cached is not None:
            return cached
    else:
        key = None

    dim = Q.shape[1]

    @pandas_udf("array<double>")
    def _scores(v: pd.Series) -> pd.Series:
        arrs = v.to_numpy()
        if len(arrs) == 0:
            return pd.Series([], dtype=object)
        # null-tolerant like the HOF twin: a null or wrong-length
        # vector scores null for that ROW instead of aborting the
        # whole query with a concatenate/reshape error
        good = np.array(
            [a is not None and len(a) == dim for a in arrs], dtype=bool
        )
        if good.all():
            M = np.concatenate(arrs).reshape(len(arrs), -1).astype(np.float64)
            S = M @ Q.T  # (rows, n_queries)
            return pd.Series(list(S))
        out = np.empty(len(arrs), dtype=object)
        if good.any():
            M = np.stack(
                [np.asarray(a, dtype=np.float64) for a in arrs[good]]
            )
            out[good] = list(M @ Q.T)
        # bad rows yield an array of Q nulls — the SAME shape the HOF
        # twin produces (null dot per query), so downstream posexplode
        # emits identical row sets under either execution strategy
        nq = Q.shape[0]
        for i in np.nonzero(~good)[0]:
            out[i] = [None] * nq
        return pd.Series(out)

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    out = _scores(c)
    if key is not None:
        _UDF_COL_CACHE[key] = out
    return out


def sims_array(vec_col: Column | str, query_vecs, arrow: bool = True) -> Column:
    """``array<double>`` of the row vector's dot against Q literal
    query vectors, in query order — with the execution strategy chosen
    by the caller's VOLUME policy:

    - ``arrow=True`` → :func:`dot_batch` (numpy matmul). Pays a fixed
      per-query Arrow/worker launch cost (~0.2 s locally) that
      amortizes over large scans — the 100 TB path.
    - ``arrow=False`` → interpreted HOF dots over a literal matrix.
      Zero launch cost, JVM-side; wins when rows×dim is small (cached
      sub-MB tables), where the UDF's fixed cost dominates its BLAS
      advantage.

    Both accumulate in DOUBLE; results agree within the 1e-6 rounding
    every query applies before hashing.
    """
    if arrow:
        return dot_batch(vec_col, query_vecs)
    v = _as_double_array(vec_col)
    qmat = lit_mat(query_vecs)
    return F.transform(
        qmat,
        lambda q: F.aggregate(
            F.zip_with(v, q, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def l2_norm(v: Column | str) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(dot(v, v))


def l2_normalize(v: Column | str) -> Column:
    """v / ||v|| (F13 — extract_clip_features.py:30). Null-safe: a zero
    vector normalizes to itself rather than dividing by zero."""
    c = _as_double_array(v)
    n = l2_norm(c)
    return F.when(n > 0, F.transform(c, lambda x: x / n)).otherwise(c)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Full cosine similarity (for inputs NOT known to be normalized)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# Score calibration (SURVEY.md §1.4 / §2.7 F11) — the reference's exact,
# deliberately asymmetric score algebra, preserved for parity.
# ---------------------------------------------------------------------------


def calibrated_whole_score(sim: Column) -> Column:
    """ES script_score ``cosineSimilarity + 1.0`` → range 0..2
    (search_with_segments.py:159)."""
    return sim + F.lit(1.0)


def percentage_score(score: Column) -> Column:
    """Whole-image percentage ``(score / 2) * 100``
    (search_with_segments.py:459)."""
    return (score / F.lit(2.0)) * F.lit(100.0)


def segment_percentage_score(sim: Column) -> Column:
    """Segment percentage ``((sim + 1) / 2) * 100``
    (search_with_segments.py:286)."""
    return ((sim + F.lit(1.0)) / F.lit(2.0)) * F.lit(100.0)


def hybrid_score(
    whole_score: Column,
    segment_score: Column,
    whole_weight: float = 0.4,
    segment_weight: float = 0.6,
) -> Column:
    """Hybrid re-rank score (search_with_segments.py:419-436).

    NOTE the asymmetry kept on purpose: ``whole_score`` arrives shifted
    to 0..2 while ``segment_score`` is raw cosine in −1..1; a candidate
    with no segments contributes 0.0, not null.
    """
    return F.lit(whole_weight) * whole_score + F.lit(segment_weight) * F.coalesce(
        segment_score, F.lit(0.0)
    )

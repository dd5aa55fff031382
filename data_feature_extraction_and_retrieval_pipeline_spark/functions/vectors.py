"""Vector column math (SURVEY.md §2.7 F11-F13).

All similarity math stays JVM-side as higher-order-function
expressions — no Python round trip, no UDF serialization — so it
participates in whole-stage codegen and scales linearly with
executors. Embeddings are stored L2-normalized (the reference
normalizes at extraction, extract_clip_features.py:30), so cosine
similarity reduces to a dot product.

Accumulation is forced to DOUBLE regardless of the stored FLOAT
element type: deterministic, and matches the DuckDB oracle's
``list_dot_product(a::DOUBLE[], b::DOUBLE[])``.
"""

from __future__ import annotations

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

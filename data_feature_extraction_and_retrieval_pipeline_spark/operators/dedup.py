"""Deduplication suite for large-scale training-data pipelines.

Not present in the reference (its corpus is 14k curated photos) but a
first-class requirement at 100 TB. Four families:

- **exact**: hash-groupBy on a cheap fingerprint — one shuffle of
  (hash, id), never the payload.
- **n-gram Jaccard**: shingle → self-join on shingle → count common.
  Scales with colliding pairs, not O(N²); fully SQL-expressible so the
  DuckDB oracle can verify it exactly.
- **MinHash + LSH**: k independent min-hashes → band → bucket-join;
  candidate pairs verified with exact Jaccard. The 100 TB path — cost
  is O(N·k) plus bucket collisions.
- **SimHash**: 64-bit signature; near-dups share band keys.

All signatures use xxhash64 with distinct seeds — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import caching
from ..functions import text as X


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the lowest id per identical text.

    Groups on (length, xxhash64) — two cheap LONGs — rather than the
    raw text, so the shuffle carries ~16 bytes/row regardless of
    document size, and the fingerprint is ONE codegen'd hash call per
    row (the interpreted per-character rolling hash lives on only in
    the ``text_fingerprint`` oracle-parity query). Returns
    (id, group_size).
    """
    keyed = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("__len"),
        F.xxhash64(F.col(text_col)).alias("__fp"),
    )
    return (
        keyed.groupBy("__len", "__fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("group_size"))
        .select(id_col, "group_size")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by n-gram (word shingle) Jaccard ≥ threshold.

    shingles(A) ∩ shingles(B) via an equi-join on the shingle string;
    Jaccard = common / (|A| + |B| − common). Only documents sharing at
    least one shingle ever meet, and the pre-aggregated shingle lists
    keep the join input to one row per (doc, distinct shingle).
    """
    sh = df.select(
        F.col(id_col),
        F.explode(X.word_shingles(X.tokens(F.col(text_col)), n)).alias("shingle"),
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("size_b"))
    pairs = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
    )
    return pairs.select("id_a", "id_b", "jaccard")


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-dup candidates, verified with exact Jaccard.

    Stage 1: explode distinct shingles, project ``num_hashes``
    xxhash64 columns (plain projections → whole-stage codegen, NOT
    interpreted higher-order lambdas), groupBy-min per doc — map-side
    partial min, one narrow shuffle of (id, k longs).
    Stage 2: band the signature (rows = k/bands) into FLAT (band, key)
    scalar columns — a struct join key would defeat the hash-join
    planner and fall back to a cartesian compare — and self-join on
    the band key; docs sharing any band become candidate pairs.
    Only (id, band, key) rows ever shuffle here.
    Stage 3: exact n-gram Jaccard on the (small) candidate set, with
    the shingle arrays joined back by id.

    At 100 TB this is the dedup path: stage 2's shuffle is
    O(N · bands) tiny rows, versus the shingle join's O(collisions).
    """
    rows = num_hashes // bands
    # Built with SQL-text expressions (one JVM parse each) rather than
    # Column-API trees: this plan's wide projections cost ~1 s of py4j
    # round trips per construction the Column way, ~20 ms this way.
    # The parsed trees are identical — pinned by tests/test_dedup.py.
    sh = df.selectExpr(
        id_col,
        f"{X.word_shingles_sql(X.tokens_sql(text_col), n)} AS shingles",
    ).filter(F.size("shingles") > 0)
    # the shingle frame feeds three consumers (signatures + both sides
    # of the verify join); persist so the higher-order shingle build
    # runs once. At warehouse scale this intermediate is a written
    # (id, shingles) table, not an in-memory cache. Tracked so the
    # harness can drop it after the result materializes (caching.py).
    sh = caching.persist(sh)

    hashed = sh.selectExpr(id_col, "explode(shingles) AS s").selectExpr(
        id_col,
        *[f"xxhash64(s, {i}) AS h{i}" for i in range(num_hashes)],
    )
    sig = hashed.groupBy(id_col).agg(
        *[F.expr(f"min(h{i}) AS mh_{i}") for i in range(num_hashes)]
    )
    band_structs = ", ".join(
        "named_struct('band', {b}, 'key', hash({cols}))".format(
            b=b,
            cols=", ".join(f"mh_{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    banded = sig.selectExpr(id_col, f"inline(array({band_structs}))")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit SimHash per document: bit_j = 1 iff
    Σ_tokens sign(xxhash64(token) bit j) > 0.

    Plan shape: explode tokens → ONE xxhash64 per token (codegen) →
    64 codegen'd sum aggregations of ±1 votes → assemble the signature
    long. (The naive per-row formulation — 64 interpreted aggregate()
    lambdas over the token array — costs ~8 s in plan+eval overhead
    even on a few hundred docs; this shape is a plain single-shuffle
    aggregation.) Duplicate tokens vote multiply, matching the
    reference-style multiset semantics. Token-less documents drop out
    (no signature), which is what dedup wants anyway.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t"),
    ).filter(F.length("t") > 0)  # post-explode WHERE stays in codegen
    hashed = tok.select(F.col(id_col), F.xxhash64("t").alias("h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for j in range(64):
        bit = F.lit(1 << j if j < 63 else -(1 << 63)).cast("long")
        sig = sig + F.when(F.col(f"v{j}") > 0, bit).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup candidate buckets: documents sharing any
    16-bit band of their 64-bit simhash (≥1 identical band ⇒ hamming
    distance likely small). Returns (band, key, id) for bucket-join
    downstream."""
    sig = simhash_signatures(df, text_col=text_col, id_col=id_col)
    bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    )
    return banded.select(
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), F.col(id_col)
    )

"""Metadata ETL operators (SURVEY.md §2.2 P3-P7, §2.3 J3, §2.1 S12).

The reference runs four CSV→CSV rewrite scripts in a chain
(update_label_paths → filter_label_paths → clean_label_etiketler →
clean_and_fill_na); here the whole chain is ONE lazy DataFrame
pipeline that materializes a single cleaned table — Catalyst fuses
all the per-cell transforms into one projection over one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as X


def clean_metadata(
    df: DataFrame,
    string_cols: list[str] | None = None,
) -> DataFrame:
    """Full cleansing pass (clean_label_etiketler.py +
    clean_and_fill_na.py, fused).

    Every string cell: scrub the HTML screen-reader span (P6), then
    sentinel/empty → null (P5). Applied as one select over all
    columns — a single stage, no intermediate CSVs (S12 collapsed).
    """
    targets = set(
        string_cols
        if string_cols is not None
        else [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
    )
    out = []
    for f in df.schema.fields:
        if f.name in targets:
            c = X.strip_html_noise(F.col(f.name))
            out.append(X.sentinels_to_null(c).alias(f.name))
        else:
            out.append(F.col(f.name))
    return df.select(*out)


def prefix_split(
    df: DataFrame, col: str, prefix: str
) -> tuple[DataFrame, DataFrame]:
    """P3/P4 — complement partition on a string prefix
    (filter_label_paths.py:41-54 / create_label_test.py:38-53).

    Returns (matching, complement). Both are filters over the same
    scan; the predicate pushes down to the parquet reader.
    """
    pred = F.col(col).startswith(prefix)
    return df.filter(pred), df.filter(~pred | F.col(col).isNull())


def url_basename(col) -> F.Column:
    """F4 — URL → path basename (update_label_paths.py:7-16).

    ``urlparse(url).path`` then basename; here `parse_url` + split.
    """
    c = F.col(col) if isinstance(col, str) else col
    path = F.parse_url(c, F.lit("PATH"))
    return F.element_at(F.split(F.coalesce(path, c), "/"), -1)


def resolve_paths(
    metadata: DataFrame,
    file_listing: DataFrame,
    url_col: str = "source_url",
    listing_basename_col: str = "filename",
    listing_path_col: str = "path",
) -> DataFrame:
    """J3 — URL→local-path resolution (update_label_paths.py:73-108).

    The reference does a per-row ``Path.rglob`` over the dataset tree —
    O(rows × files). Here the file listing is scanned once and the
    resolution is one equi join on the basename; ``coalesce(found,
    original)`` keeps unresolved URLs (update-else-keep semantics).

    No broadcast hint on the listing: it is row-per-file and grows
    1:1 with the corpus, so the join must stay size-chosen — BHJ
    while the listing is small, sort-merge on the basename at 100×.
    """
    meta = metadata.withColumn("__basename", url_basename(url_col))
    # colliding basenames resolve to the lexicographically smallest
    # path — dropDuplicates would pick a partition-order-dependent row
    # (run-to-run nondeterminism, against the repo's tie-break rule)
    listing = (
        file_listing.select(
            F.col(listing_basename_col).alias("__basename"),
            F.col(listing_path_col).alias("__resolved"),
        )
        .groupBy("__basename")
        .agg(F.min("__resolved").alias("__resolved"))
    )
    return (
        meta.join(listing, "__basename", "left")
        .withColumn(url_col, F.coalesce(F.col("__resolved"), F.col(url_col)))
        .drop("__basename", "__resolved")
    )


def multiformat_timestamp(col) -> F.Column:
    """F15 — the ES mapping's three accepted date formats
    (upload_features_to_elasticsearch.py:40):
    ``yyyy-MM-dd HH:mm:ss || yyyy-MM-dd || epoch_millis``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.timestamp_millis(c.try_cast("long")),
    )

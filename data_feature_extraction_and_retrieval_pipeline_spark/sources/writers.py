"""Sinks (SURVEY.md §2.1 S5, S7-S12).

The reference's sinks are per-image JSON files and Elasticsearch bulk
uploads; the engine's canonical store is partitioned parquet (the
"index table"), with JSON export kept as an optional compatibility
sink. Upserts (S8) are expressed as join + coalesce + rewrite since
plain Spark has no MERGE INTO without a lakehouse format.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, functions as F

# Serializes the advisory-partition-size conf round-trip inside
# compact_shards(rebalance=True) — see the comment at the use site.
_REBALANCE_CONF_LOCK = threading.Lock()


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Append/overwrite sink (S7, S9) with a format axis.

    ``partition_by`` is the scale lever: at 100 TB the index tables are
    partitioned by a coarse key (e.g. ingest date) so queries prune
    whole directories. ``fmt`` selects the columnar container —
    parquet is the canonical store; ORC is the interchange sibling
    (same pushdown/pruning story through Spark's native vectorized ORC
    reader, different ecosystem). Both go through the identical
    DataFrameWriter path, so everything said about partitioning holds
    per-format.
    """
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_parquet_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """The canonical parquet index sink — see :func:`write_table`."""
    write_table(df, path, fmt="parquet", mode=mode, partition_by=partition_by)


def write_range_sorted(
    df: DataFrame,
    path: str,
    range_col: str,
    extra_sort_cols: tuple[str, ...] = (),
    num_files: int = 8,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Range-clustered sorted export — the scan-pruning layout for
    selective range predicates (the one-dimensional slice of what
    lakehouse OPTIMIZE ZORDER buys).

    ``repartitionByRange`` samples the column and assigns each output
    file a GLOBALLY DISJOINT value range; ``sortWithinPartitions``
    orders rows inside each file. Two pruning levers fall out at read
    time, both free: (a) parquet footer min/max statistics per file
    are tight and non-overlapping, so a pushed range predicate skips
    whole files; (b) row-group statistics inside the touched file are
    tight because the rows are sorted, so the reader skips most row
    groups of that file too. At 100 TB a predicate covering 1% of the
    key space reads ~1% of the bytes instead of scanning every file's
    every row group. The range exchange is one shuffle paid at write
    time — the same trade as bucketing, applied to ORDER instead of
    HASH.
    """
    out = df.repartitionByRange(num_files, F.col(range_col)).sortWithinPartitions(
        range_col, *extra_sort_cols
    )
    out.write.mode(mode).format(fmt).save(path)


def write_json_export(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON export sink (S5, S11) — compatibility with the reference's
    one-JSON-per-image layout (extract_clip_features.py:123-127),
    minus the one-file-per-row anti-pattern: Spark writes one file per
    partition."""
    df.write.mode(mode).json(path)


def write_sharded_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    shard_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Training-data export sink: JSONL shards with a bounded record
    count per file — the layout data-loader fleets consume (each
    worker streams a shard; bounded shards bound worker skew).

    Spark-first: ``maxRecordsPerFile`` makes the executors split
    output files at the bound with NO extra shuffle — don't
    repartition to force file counts. ``shard_by`` optionally
    partitions the directory layout by a coarse column (e.g. split or
    source) so loaders can subset by prefix; the column value moves
    into the directory name, Hive-style.
    """
    writer = df.write.mode(mode).option(
        "maxRecordsPerFile", max_records_per_file
    )
    if shard_by:
        writer = writer.partitionBy(shard_by)
    writer.json(path)


def write_binary_files(
    df: DataFrame,
    out_dir: str,
    filename_col: str = "filename",
    content_col: str = "content",
) -> int:
    """S6 — per-row binary file sink (the reference's segment-crop
    PNGs, SAM/sam_segment_clip_pipeline.py:260-268,363-381).

    Executor-side per-partition write — no driver collect, and ONE
    execution: each partition yields its file count, so the returned
    total comes from the same job that wrote the files (the round-1
    foreachPartition + count() shape ran the frame twice). NOTE:
    one-file-per-row is an export/compat path; the engine's canonical
    store keeps crops as a BinaryType column in parquet (small-files
    problem at 100 TB). Returns the number of files written. Rows
    whose filenames share a basename overwrite each other (last writer
    wins) — pre-deduplicate if source paths can collide on basename.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _write(rows):
        # executors run on machines where the driver's makedirs never
        # happened — ensure the target dir exists partition-side too
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for row in rows:
            name = os.path.basename(row[filename_col])
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(bytes(row[content_col] or b""))
            n += 1
        yield n

    part = df.select(filename_col, content_col)
    return int(part.rdd.mapPartitions(_write).sum())


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (S7 at co-location scale).

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT a shuffle — both sides are already hash-partitioned
    on disk. This is the 100 TB lever for repeated fact⋈fact joins
    (e.g. segments ⋈ images on image_id): pay the clustering once at
    write time, skip the exchange on every query.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def compact_shards(
    spark,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    fmt: str = "parquet",
    rebalance: bool = False,
) -> dict:
    """Small-file compaction — table maintenance for incrementally
    ingested stores (S7/S8 at steady state).

    Streaming ingest and per-batch upserts leave a long tail of tiny
    files; at 100 TB that tail dominates scan cost (a scheduler task
    per file, broken columnar runs, metadata pressure). Compaction
    rewrites a directory to ~``target_file_bytes`` files:

    - default (``rebalance=False``): ``coalesce(n)`` with n computed
      from the ACTUAL input byte size (Hadoop FileSystem listing, so
      it prices the real on-disk footprint, not row counts). Coalesce
      is narrow — each output task concatenates whole input files
      with NO shuffle, which is the right cost model when the input
      files are uniformly small (the ingest-tail case).
    - ``rebalance=True``: AQE rebalance (``hint("rebalance")``) —
      pays one shuffle but sizes every output file to the advisory
      target even when inputs are skewed (a few huge files + a tail
      of tiny ones). This is Spark's own OPTIMIZE-shaped path: AQE
      splits oversized shuffle partitions and merges undersized ones
      at runtime.

    At 100 TB, run per partition directory (compact only partitions
    the last ingest window touched) and swap the directory in under a
    view or manifest — the rewrite is idempotent, so a failed run
    leaves the source intact. Returns
    ``{files_in, bytes_in, files_out, target_files}``.
    """
    import math

    df = spark.read.format(fmt).load(in_path)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    total = 0
    files = df.inputFiles()
    for uri in files:
        p = jvm.org.apache.hadoop.fs.Path(uri)
        total += p.getFileSystem(conf).getFileStatus(p).getLen()
    n_out = max(1, math.ceil(total / float(target_file_bytes)))
    if rebalance:
        # The advisory-size set/write/restore must be ATOMIC per
        # session: the conf is session-global, so without the lock a
        # concurrent query observes the temporary value and two
        # concurrent rebalance compactions can clobber each other's
        # save/restore (the registry path is already serialized by its
        # side-effect lock; this covers direct facade callers too).
        # Session-scoped tuning like this is the one place a
        # cluster-side conf pin (per-job conf in the submit) beats the
        # runtime round-trip.
        with _REBALANCE_CONF_LOCK:
            prev = spark.conf.get(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", None
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                str(target_file_bytes),
            )
            try:
                df.hint("rebalance").write.mode("overwrite").format(fmt).save(
                    out_path
                )
            finally:
                if prev is not None:
                    spark.conf.set(
                        "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev
                    )
                else:
                    spark.conf.unset(
                        "spark.sql.adaptive.advisoryPartitionSizeInBytes"
                    )
    else:
        df.coalesce(n_out).write.mode("overwrite").format(fmt).save(out_path)
    files_out = len(spark.read.format(fmt).load(out_path).inputFiles())
    return {
        "files_in": len(files),
        "bytes_in": int(total),
        "files_out": files_out,
        "target_files": int(n_out),
    }


def upsert_parquet(
    existing: DataFrame,
    updates: DataFrame,
    key: str | list[str],
) -> DataFrame:
    """Bulk partial update (S8) as a DataFrame program.

    The reference merges new nested fields into live ES docs one
    ``_op_type:update`` action at a time
    (SAM/update_elasticsearch_with_segments.py:205-268). Distributed
    equivalent: full outer join on the key, new columns win via
    coalesce. Returns the merged frame; caller rewrites the table
    (or MERGEs if a lakehouse format is available).
    """
    keys = [key] if isinstance(key, str) else list(key)
    update_cols = [c for c in updates.columns if c not in keys]
    existing_cols = [c for c in existing.columns if c not in keys]
    upd = updates.select(*keys, *[F.col(c).alias(f"__u_{c}") for c in update_cols])
    merged = existing.join(upd, keys, "full_outer")
    out = []
    for c in existing_cols:
        if c in update_cols:
            out.append(F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c))
        else:
            out.append(F.col(c))
    for c in update_cols:
        if c not in existing_cols:
            out.append(F.col(f"__u_{c}").alias(c))
    return merged.select(*keys, *out)


def zorder_value(
    cols: tuple,
    mins: tuple,
    maxs: tuple,
    bits: int = 8,
):
    """Z-order (Morton) key as a pure Catalyst expression: each column
    is scaled to a ``bits``-bit integer against the write-time min/max
    (collected once — bounded driver state, like kmeans centroids),
    then the bits are interleaved so nearby (a, b) pairs get nearby z
    values. NULL scales to bucket 0.

    The interleave is a sum of shift/mask terms (ncols x bits of them)
    — whole-stage-codegen'd, no UDF."""
    ncols = len(cols)
    maxv = (1 << bits) - 1
    scaled = []
    for c, mn, mx in zip(cols, mins, maxs):
        span = float(mx) - float(mn)
        if span <= 0:
            scaled.append(F.lit(0).cast("long"))
            continue
        q = F.floor(
            (F.coalesce(F.col(c).cast("double"), F.lit(float(mn))) - F.lit(float(mn)))
            / F.lit(span)
            * F.lit(float(maxv))
        ).cast("long")
        scaled.append(F.least(F.lit(maxv).cast("long"), F.greatest(F.lit(0).cast("long"), q)))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, b).bitwiseAND(F.lit(1)).cast("long"),
                b * ncols + i,
            )
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    cols: tuple,
    bits: int = 8,
    num_files: int = 8,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered export — the MULTI-column data-skipping layout
    (lakehouse OPTIMIZE ZORDER): ``write_range_sorted`` makes ONE
    column's per-file min/max tight; interleaving the bits of two or
    more columns makes EVERY indexed column's per-file min/max tight
    at once, so a conjunctive predicate on any subset of them skips
    files and row groups. At 100 TB this is the difference between a
    2-D rectangle query reading ~its selectivity in bytes and reading
    every file that matches only one of the two predicates.

    One pass: a 1-row min/max aggregate per indexed column (driver
    state = 2 x ncols doubles), then the same range-shuffle +
    in-file sort as the 1-D writer, keyed on the Morton value. The z
    key is layout-only and not written."""
    stats = df.agg(
        *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    mins = [stats[f"mn_{i}"] for i in range(len(cols))]
    maxs = [stats[f"mx_{i}"] for i in range(len(cols))]
    z = zorder_value(tuple(cols), tuple(mins), tuple(maxs), bits=bits)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode(mode).format(fmt).save(path)

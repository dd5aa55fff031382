"""Sources (SURVEY.md §2.1 S1-S4).

Everything is a declarative `spark.read` so Catalyst gets column
pruning + predicate pushdown for free; at 100 TB these scans are the
dominant cost and the pushed filters/projections are what keep them
cheap (check `.explain()` → `PushedFilters:` / `ReadSchema:`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas


# Opt-in per-session cache of the canonical driver tables. The bench
# (and any steady-state serving process) reads the same ten immutable
# parquet tables for every query; re-building the scan + nanos
# conversion per query is pure overhead there. Keyed by (session id,
# normalized sf_dir, table) so distinct sessions / scale factors never
# alias. Only canonical tables (schemas.TABLES) are ever cached —
# ad-hoc paths (temp upsert outputs etc.) always re-read.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}
_CACHE_TABLES = False


def enable_table_cache(enabled: bool = True) -> None:
    """Turn on persist()-backed reuse of the canonical tables.

    At cluster scale the analogue is a warmed Spark SQL table cache
    (or simply the OS page cache over the parquet files); on local
    bench runs it removes the dominant fixed cost: re-scanning and
    re-deriving the timestamp conversion for every one of ~30 queries.
    """
    global _CACHE_TABLES
    _CACHE_TABLES = enabled
    if not enabled:
        for df in _TABLE_CACHE.values():
            try:
                df.unpersist()
            except Exception:
                pass
        _TABLE_CACHE.clear()


def load_table(
    spark: SparkSession, sf_dir: str, name: str, wide: bool = False
) -> DataFrame:
    """Read one driver-provided parquet table.

    TIMESTAMP(NANOS) columns (pandas datetime64[ns]) surface as LONG
    under ``spark.sql.legacy.parquet.nanosAsLong``; convert them back
    to timestamps here (integer ``div`` — a double division would lose
    precision on ns-epoch magnitudes). The expected nanos columns per
    table are known from the canonical schemas.
    """
    # Defensive session confs so the reader works under ANY
    # caller-provided session, not only our get_spark() sessions:
    # - TIMESTAMP(NANOS) parquet is unreadable without the legacy flag
    #   (PARQUET_TYPE_ILLEGAL);
    # - TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet (pandas naive
    #   datetimes) would otherwise surface as TIMESTAMP_NTZ under Spark
    #   4's inferTimestampNTZ default; with the session pinned to UTC,
    #   reading it as LTZ yields identical wall-clock values and keeps
    #   one timestamp type across the engine;
    # - timestamp→string formatting must be UTC to match the naive
    #   timestamps the DuckDB oracle sees.
    # All are runtime SQLConfs, safe to set per session.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    # The NTZ→LTZ cast below is value-preserving ONLY under a UTC
    # session; if the conf set above was rejected (locked-down caller
    # session), the cast would silently shift wall-clock values by the
    # host offset — verify instead of assuming.
    try:
        _tz_is_utc = spark.conf.get("spark.sql.session.timeZone") == "UTC"
    except Exception:
        _tz_is_utc = False
    # ``wide=True`` requests the cores-wide cached variant for scans
    # that do heavy JVM-side CPU work per row (deep shingle/regex
    # expressions): the byte-proportional partitioning below is right
    # for cheap scans and Arrow-UDF stages (fewer Python workers, fat
    # batches) but caps an expensive whole-stage-codegen projection at
    # ~8 threads on a 32-core session. Measured at sf0.1: contamination
    # 0.53→0.35 s, gopher rules 0.35→0.25 s wide, while the Arrow
    # kernels (quality, cosine dedup) LOSE 30-50% at 32 partitions —
    # hence two cached variants instead of one compromise width. Only
    # meaningful with the table cache on; otherwise it's a no-op so
    # correctness-gate plans keep their natural scan partitioning.
    cache_key = None
    if _CACHE_TABLES and name in schemas.TABLES:
        variant = "wide" if wide else "base"
        cache_key = (id(spark), sf_dir.rstrip("/"), name, variant)
        cached = _TABLE_CACHE.get(cache_key)
        if cached is not None:
            return cached
        # miss: evict entries whose session has been stopped (each
        # cached frame strong-refs its session, so without this a
        # multi-session process pins dead sessions forever —
        # indexes.py applies the same liveness pruning)
        for k, df in list(_TABLE_CACHE.items()):
            try:
                alive = df.sparkSession.sparkContext._jsc is not None
            except Exception:
                alive = False
            if not alive:
                _TABLE_CACHE.pop(k, None)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    expected = schemas.TABLES.get(name)
    if expected is not None:
        actual = {f.name: f.dataType.typeName() for f in df.schema.fields}
        for f in expected.fields:
            if f.dataType.typeName() == "timestamp":
                if actual.get(f.name) == "long":
                    df = df.withColumn(
                        f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000"))
                    )
                elif actual.get(f.name) == "timestamp_ntz":
                    # caller session that pre-read with NTZ inference on
                    if not _tz_is_utc:
                        raise RuntimeError(
                            f"cannot read {name}.{f.name}: session timezone "
                            "is not UTC and the conf could not be set — the "
                            "TIMESTAMP_NTZ→TIMESTAMP cast would shift values"
                        )
                    df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    if cache_key is not None:
        # Small parquet files arrive as ONE scan split (file size <
        # files.maxPartitionBytes), so without this every cached-table
        # consumer — including Arrow UDF stages — runs single-threaded
        # no matter how many cores the session has. But a flat
        # cores-wide repartition is just as wrong in the other
        # direction: every later scan of a 5k-row cached table pays 32
        # task launches for microseconds of work each. Size the cache
        # like a cluster sizes scan splits — proportional to bytes
        # (≈1 partition/MB of parquet here, the local analogue of
        # files.maxPartitionBytes) — with a parallelism floor for the
        # two tables that feed Arrow-kernel stages (documents,
        # embeddings), where per-partition Python workers do real CPU
        # work per row.
        target = spark.sparkContext.defaultParallelism
        try:
            import os as _os

            _p = f"{sf_dir.rstrip('/')}/{name}.parquet"
            if _os.path.isdir(_p):
                # Spark-written tables are DIRECTORIES of part files
                # (the synth scale corpora); getsize() on the dir is
                # ~4 KB and silently collapsed every cached table to
                # ONE partition — the whole x10 suite ran its cached
                # scans single-threaded until this summed the parts
                nbytes = sum(
                    e.stat().st_size
                    for e in _os.scandir(_p)
                    if e.name.endswith(".parquet")
                )
            else:
                nbytes = _os.path.getsize(_p)
        except OSError:
            nbytes = None
        if nbytes is not None:
            want = min(target, max(1, -(-nbytes // (1 << 20))))
        else:
            want = target
        if name in ("documents", "embeddings"):
            want = max(want, min(8, target))
        if wide:
            want = target
        if df.rdd.getNumPartitions() != want:
            df = df.repartition(want)
        df = df.persist()
        _TABLE_CACHE[cache_key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All ten driver tables keyed by name (lazy — just scan nodes)."""
    return {name: load_table(spark, sf_dir, name) for name in schemas.TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver tables as temp views for spark.sql()."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_csv_bom(
    spark: SparkSession,
    path: str,
    schema=None,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan with header + UTF-8 BOM handling (S2).

    The reference opens metadata CSVs with ``encoding='utf-8-sig'`` and
    one script matches a BOM-prefixed header by substring
    (upload_features_to_elasticsearch.py:78-86). Spark's CSV reader
    leaves the BOM glued to the first header name, so we normalize it
    away and canonicalize header names.
    """
    reader = (
        spark.read.option("header", True)
        .option("encoding", "UTF-8")
        .option("delimiter", delimiter)
        .option("multiLine", True)
        .option("escape", '"')
    )
    if schema is not None:
        df = reader.schema(schema).csv(path)
    else:
        df = reader.csv(path)
    first = df.columns[0]
    cleaned = first.lstrip("﻿")
    if cleaned != first:
        df = df.withColumnRenamed(first, cleaned)
    return df


def read_json_dir(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON feature-directory scan (S3).

    The reference globs one pretty-printed JSON file per image
    (upload_features_to_elasticsearch.py:142-158) — hence multiLine.
    An explicit schema avoids the double-pass inference scan, which
    matters when the directory holds millions of files.
    """
    reader = spark.read.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def select_rows(
    df: DataFrame,
    order_col: str,
    row_range: tuple[int, int] | None = None,
    sample_n: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """S4 — row-range / seeded-sample source selection
    (SAM/sam_segment_clip_pipeline.py:117-154): either a 1-based
    inclusive slice over a deterministic order, or a seeded random
    sample of n rows.

    The slice is a window ``row_number`` + ``between`` — exact parity
    with the reference's list slicing. The sample is
    ``orderBy(rand(seed)) limit n`` — deterministic per (seed, data)
    but NOT the same rows as Python's ``random.sample`` (documented
    divergence, SURVEY.md §2.1 S4).
    """
    from pyspark.sql import Window

    if (row_range is None) == (sample_n is None):
        raise ValueError("exactly one of row_range / sample_n required")
    if row_range is not None:
        lo, hi = row_range
        w = Window.orderBy(order_col)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn").between(lo, hi))
            .drop("__rn")
        )
    return df.orderBy(F.rand(seed), F.col(order_col)).limit(sample_n)


IMAGE_EXTENSIONS = ("jpg", "jpeg", "png", "gif")


def read_image_dir(
    spark: SparkSession,
    path: str,
    pattern: str | None = None,
    allowed_filenames: DataFrame | None = None,
) -> DataFrame:
    """Recursive binary image scan (S1).

    Mirrors ``process_images_folder`` (extract_clip_features.py:68-84):
    os.walk + extension filter + optional allow-list, but as a
    distributed binaryFile scan. The allow-list becomes a broadcast
    left-semi join on the basename — one hash join instead of a Python
    set probe per file.
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    df = reader.load(path)
    ext_re = "(?i)\\.(" + "|".join(IMAGE_EXTENSIONS) + ")$"
    df = df.filter(F.col("path").rlike(ext_re))
    df = df.withColumn("filename", F.element_at(F.split(F.col("path"), "/"), -1))
    if allowed_filenames is not None:
        # no broadcast hint: the allow-list is caller-supplied and may
        # itself be a corpus-scale listing — the semi-join stays
        # size-chosen (AQE picks BHJ when the distinct list is small)
        df = df.join(
            allowed_filenames.select("filename").distinct(),
            "filename",
            "left_semi",
        )
    return df

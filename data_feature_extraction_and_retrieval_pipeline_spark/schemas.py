"""Canonical schemas (SURVEY.md §1.2, FIXTURES.md).

The reference declares its schema once as an Elasticsearch index
mapping (``upload_features_to_elasticsearch.py:26-60``,
``SAM/setup_elasticsearch_sam.py:43-93``) and then re-coerces strings
row-at-a-time in ETL. Here every table has exactly one explicit
StructType; readers apply it at scan time so Catalyst can prune and
push down against a stable schema.
"""

from __future__ import annotations

from pyspark.sql import types as T

VECTOR = T.ArrayType(T.FloatType())

# ---------------------------------------------------------------------------
# Driver-provided synthetic tables (/root/testdata/sf*/ — TESTDATA.md)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", VECTOR),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Reference-shaped tables (FIXTURES.md §1-§5; ES mappings are the source
# of truth — upload_features_to_elasticsearch.py:26-60)
# ---------------------------------------------------------------------------

IMAGES = T.StructType(
    [
        T.StructField("image_path", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("galeri", T.StringType()),
        T.StructField("baslik", T.StringType()),
        T.StructField("editor", T.StringType()),
        T.StructField("olusturanlar", T.StringType()),
        T.StructField("kaynaklar", T.StringType()),
        T.StructField("turler", T.StringType()),
        T.StructField("konular", T.StringType()),
        T.StructField("idari_bolgeler", T.StringType()),   # comma-joined multi-value
        T.StructField("etiketler", T.StringType()),        # comma-joined multi-value
        T.StructField("lisans", T.StringType()),
        T.StructField("album_adi", T.StringType()),
        T.StructField("yayinlanma_tarihi", T.TimestampType()),
        T.StructField("tarih_en_erken", T.IntegerType()),
        T.StructField("tarih_en_gec", T.IntegerType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("yon", T.IntegerType()),
        T.StructField("aci", T.IntegerType()),
        T.StructField("mesafe", T.DoubleType()),
        T.StructField("source_url", T.StringType()),
    ]
)

IMAGE_EMBEDDINGS = T.StructType(
    [
        T.StructField("filename", T.StringType()),
        T.StructField("features", VECTOR),      # L2-normalized
        T.StructField("feature_dimension", T.IntegerType()),
    ]
)

TAG = T.StructType(
    [
        T.StructField("tag", T.StringType()),
        T.StructField("confidence", T.FloatType()),
    ]
)

# Flat per-segment layout (the canonical Spark layout; the reference's
# foto_atlas_sam index — SAM/upload_segments_to_elasticsearch.py:98-116)
SEGMENTS = T.StructType(
    [
        T.StructField("filename", T.StringType()),
        T.StructField("segment_id", T.IntegerType()),
        T.StructField("segment_area", T.IntegerType()),
        T.StructField("segment_bbox", T.ArrayType(T.FloatType())),
        T.StructField("stability_score", T.FloatType()),
        T.StructField("clip_features", VECTOR),            # L2-normalized
        T.StructField("whole_image_features", VECTOR),     # mean of image's segments
        T.StructField("tags", T.ArrayType(TAG)),
        T.StructField("tag_list", T.ArrayType(T.StringType())),
        T.StructField("has_architecture", T.BooleanType()),
        T.StructField("has_nature", T.BooleanType()),
        T.StructField("has_objects", T.BooleanType()),
        T.StructField("indexed_at", T.TimestampType()),
    ]
)

TAG_VOCAB = T.StructType(
    [
        T.StructField("tag", T.StringType()),
        T.StructField("category", T.StringType()),  # architecture | nature | objects
        T.StructField("tag_embedding", VECTOR),
    ]
)

# Multimodal blob table: opaque binary + typed metadata (images/audio/
# video are carried as bytes; decode happens in ml/ UDFs).
MEDIA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("length", T.LongType()),
        T.StructField("modification_time", T.TimestampType()),
    ]
)

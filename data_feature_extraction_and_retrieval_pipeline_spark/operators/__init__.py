from .retrieval import (  # noqa: F401
    bm25_topk,
    hybrid_search,
    knn,
    knn_batch,
    rrf_fuse,
    segment_search,
    tag_search,
)
from .etl import clean_metadata, prefix_split, url_basename  # noqa: F401
from .dedup import exact_dedup, ngram_jaccard_pairs, minhash_lsh_pairs, simhash_buckets  # noqa: F401
from .analytics import value_counts, explode_counts, histogram, group_stats  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    cosine_self_join_pairs,
    kmeans,
)
from .temporal import asof_join, funnel, retention_cohorts, sessionize  # noqa: F401
from .skew import salted_aggregate, salted_join  # noqa: F401
from .reports import dataset_report  # noqa: F401
from .multimodal import decode_image_meta, resize_plan, sample_frames  # noqa: F401

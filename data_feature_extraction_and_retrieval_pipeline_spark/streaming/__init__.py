from .ingest import (  # noqa: F401
    tumbling_window_counts,
    hopping_window_counts,
    streaming_tumbling_counts,
    incremental_ingest,
    incremental_upsert,
    weekly_activity_stream,
)
from .sessionize import sessionize_stream, make_sessionizer, SESSION_SCHEMA  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_stream,
    fingerprint_columns,
    minhash_collision_stream,
)
from .join import interval_join_stream  # noqa: F401
from .percolate import (  # noqa: F401
    StandingQuery,
    bm25_stats,
    bm25_stats_table,
    percolate,
    percolate_join,
    percolate_join_stream,
)
from .ann_ingest import (  # noqa: F401
    ann_assign_transform,
    ivfpq_ingest_transform,
    start_ann_ingest,
    start_ivfpq_ingest,
    centroid_staleness,
    recenter,
    recenter_compact,
)

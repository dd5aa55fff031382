from .ingest import tumbling_window_counts, streaming_tumbling_counts, incremental_ingest  # noqa: F401
from .sessionize import sessionize_stream, make_sessionizer, SESSION_SCHEMA  # noqa: F401

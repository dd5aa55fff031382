from .ingest import tumbling_window_counts, streaming_tumbling_counts, incremental_ingest  # noqa: F401

from .pipeline import (
    compact_bucket_store,
    dedup_stream,
    embedding_near_dup_sink,
    hist_state_sink,
    near_dup_filter_sink,
    merge_upsert_sink,
    read_parquet_stream,
    run_available_now,
    running_totals_stateful,
    session_event_counts,
    stream_stream_interval_join,
    windowed_event_counts,
)

__all__ = [
    "compact_bucket_store",
    "dedup_stream",
    "embedding_near_dup_sink",
    "hist_state_sink",
    "near_dup_filter_sink",
    "merge_upsert_sink",
    "read_parquet_stream",
    "run_available_now",
    "running_totals_stateful",
    "session_event_counts",
    "stream_stream_interval_join",
    "windowed_event_counts",
]

from dataux_spark.streaming.ops import (
    run_to_memory,
    session_window_agg,
    stateful_user_counter,
    streaming_dedup,
    streaming_incremental_neardup,
    streaming_rollup_ingest,
    streaming_url_dedup_ingest,
    merged_rollup,
    stream_events,
    stream_stream_join,
    streaming_ewma_anomalies,
    windowed_agg,
)

__all__ = [
    "stream_events",
    "windowed_agg",
    "session_window_agg",
    "stateful_user_counter",
    "streaming_dedup",
    "streaming_incremental_neardup",
    "streaming_rollup_ingest",
    "streaming_url_dedup_ingest",
    "merged_rollup",
    "stream_stream_join",
    "streaming_ewma_anomalies",
    "run_to_memory",
]

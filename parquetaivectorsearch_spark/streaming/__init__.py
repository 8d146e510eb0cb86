from parquetaivectorsearch_spark.streaming.vectors import (
    VEC_STREAM_SCHEMA,
    build_then_stream_rest,
    stream_ingest_ivf,
)
from parquetaivectorsearch_spark.streaming.events import (
    EVENTS_RAW_SCHEMA,
    read_event_stream,
    run_available_now,
    run_latest_state_upsert,
    session_counts,
    sliding_counts,
    stream_stream_join,
    streaming_dedup,
    tumbling_counts,
    type_distinct_hll,
    type_quantile_bottomk,
    type_heavy_hitters,
    user_running_totals,
)

__all__ = [
    "VEC_STREAM_SCHEMA",
    "build_then_stream_rest",
    "stream_ingest_ivf",
    "EVENTS_RAW_SCHEMA",
    "read_event_stream",
    "run_available_now",
    "run_latest_state_upsert",
    "session_counts",
    "sliding_counts",
    "stream_stream_join",
    "streaming_dedup",
    "tumbling_counts",
    "type_distinct_hll",
    "type_quantile_bottomk",
    "type_heavy_hitters",
    "user_running_totals",
]

from unifydb_spark.streaming.stream import (  # noqa: F401
    events_to_facts,
    interval_join,
    interval_join_sql,
    read_document_stream,
    read_event_stream,
    running_latest,
    session_metrics,
    stream_decontaminate,
    stream_dedup_state,
    stream_facts_to_store,
    user_stats_tws,
    windowed_metrics,
)

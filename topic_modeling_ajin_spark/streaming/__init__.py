from .pipelines import (
    click_purchase_attribution,
    hourly_event_counts,
    read_documents_stream,
    read_embeddings_stream,
    read_events_stream,
    run_to_memory,
    session_event_counts,
    sliding_type_counts,
    streaming_event_dedup,
    streaming_topic_assign,
    streaming_word_count,
    user_running_totals,
)

__all__ = [
    "click_purchase_attribution",
    "hourly_event_counts",
    "read_documents_stream",
    "read_embeddings_stream",
    "read_events_stream",
    "run_to_memory",
    "session_event_counts",
    "sliding_type_counts",
    "streaming_event_dedup",
    "streaming_topic_assign",
    "streaming_word_count",
    "user_running_totals",
]

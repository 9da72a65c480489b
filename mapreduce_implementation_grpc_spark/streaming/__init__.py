from .pipelines import (
    parquet_upsert_sink,
    streaming_anomaly_filter,
    streaming_curate,
    streaming_decontaminate,
    streaming_doc_chunks,
    streaming_pq_encode,
    streaming_dedup,
    streaming_event_counts,
    streaming_sessionize,
    streaming_signup_purchase_join,
    streaming_user_totals_stateful,
    streaming_word_count,
)

__all__ = [
    "parquet_upsert_sink",
    "streaming_anomaly_filter",
    "streaming_curate",
    "streaming_decontaminate",
    "streaming_doc_chunks",
    "streaming_pq_encode",
    "streaming_dedup",
    "streaming_event_counts",
    "streaming_sessionize",
    "streaming_signup_purchase_join",
    "streaming_user_totals_stateful",
    "streaming_word_count",
]

from .ops import (  # noqa: F401
    read_event_stream,
    sessionize_events,
    stream_dedup_exact,
    stream_dedup_minhash,
    stream_index_append,
    stream_prepare_corpus,
    windowed_event_counts,
)

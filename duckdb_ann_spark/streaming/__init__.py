from .ops import (  # noqa: F401
    read_event_stream,
    stream_index_append,
    windowed_event_counts,
)

from .incremental_stream import (  # noqa: F401
    sessionized_stream,
    streaming_refresh,
    windowed_counts_stream,
)

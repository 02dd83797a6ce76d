from .chunks import (  # noqa: F401
    dedup_events_within_watermark,
    session_event_counts,
    stream_chunks,
    stream_curated,
    windowed_event_counts,
)
from .stateful import (  # noqa: F401
    running_event_totals,
    streaming_paragraph_dedup,
)

from .chunks import stream_chunks, windowed_event_counts  # noqa: F401
from .stateful import running_event_totals  # noqa: F401

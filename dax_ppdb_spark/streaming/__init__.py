from .chunks import stream_chunks, windowed_event_counts  # noqa: F401

from .registry import (  # noqa: F401
    DIA_FORCED_SOURCE,
    DIA_OBJECT,
    DIA_SOURCE,
    EXPANDED_UPDATES,
    PPDB_REPLICA_CHUNK,
    UPDATES_RAW,
    ChunkStatus,
)

from .latest import latest_only  # noqa: F401
from .merge import merge_patch, merge_upsert  # noqa: F401
from .validity import fill_validity_end, rank_versions  # noqa: F401

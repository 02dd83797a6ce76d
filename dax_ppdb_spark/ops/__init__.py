from .latest import latest_only  # noqa: F401
from .merge import merge_patch, merge_upsert  # noqa: F401
from .updates import (  # noqa: F401
    apply_update_patches,
    build_patch,
    expand_updates,
    latest_updates,
    validate_update_targets,
)
from .validity import fill_validity_end, rank_versions  # noqa: F401

from .promote import Promoter  # noqa: F401
from .store import store_chunk  # noqa: F401

from .promote import Promoter  # noqa: F401
from .replicate import DirectoryApdbSource, Replicator  # noqa: F401
from .store import store_chunk  # noqa: F401
from .upload import ChunkUploader, ChunkUploadError  # noqa: F401

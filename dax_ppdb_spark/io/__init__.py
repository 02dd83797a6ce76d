from .parquet_io import read_excluding, write_manifest, write_parquet  # noqa: F401
from .table import ParquetTable  # noqa: F401

"""Config-file-driven factory for the pipeline components.

The reference builds every backend from a YAML file whose
``implementation_type`` key selects the config class, which in turn
selects the implementation (``ppdb_config.py:40-65`` ``from_uri`` →
``config_type_for_name``; ``_factory.py:64-92`` ``ppdb_from_config``).
Operators drive the tooling through such configs, not raw flags, so
the CLI accepts ``--config`` everywhere and this module is the single
place the dispatch lives.

Spark-first difference: there is one implementation (Spark DataFrames
over a parquet warehouse), so ``implementation_type: spark`` is the
only accepted type — but the dispatch shape (unknown types are a
``TypeError``, a missing key a ``LookupError``) matches the reference
so configs fail the same way.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping
from typing import Any

import yaml

__all__ = [
    "PpdbConfig",
    "SparkPipelineConfig",
    "config_type_for_name",
    "pipeline_from_config",
]


@dataclasses.dataclass
class PpdbConfig:
    """Base class for configuration types (``ppdb_config.py:37``)."""

    @classmethod
    def from_uri(cls, uri: str) -> "PpdbConfig":
        """Load a configuration object from a YAML file.

        Mirrors ``PpdbConfig.from_uri`` (``ppdb_config.py:40-65``):
        the ``implementation_type`` key picks the config class; the
        remaining keys are its fields.
        """
        with open(uri) as f:
            config_object = yaml.safe_load(f)
        if not isinstance(config_object, Mapping):
            raise TypeError("YAML configuration file does not represent valid object")
        config_dict: dict[str, Any] = dict(config_object)
        type_name = config_dict.pop("implementation_type", None)
        if not type_name:
            raise LookupError(
                "YAML configuration file does not have `implementation_type` key"
            )
        klass = config_type_for_name(type_name)
        known = {f.name for f in dataclasses.fields(klass)}
        unknown = sorted(set(config_dict) - known)
        if unknown:
            raise TypeError(f"Unknown configuration keys: {unknown}")
        return klass(**config_dict)


@dataclasses.dataclass
class SparkPipelineConfig(PpdbConfig):
    """Everything the replication/promotion pipeline needs.

    Field names follow the CLI flags (and the reference's option names,
    ``cli/options.py:106-125``) so a config file and a flag invocation
    read the same.
    """

    root: str | None = None
    # APDB export area: a chunk-directory landing path, or a live
    # database when prefixed ``jdbc:`` (io/jdbc.py) — mirroring the
    # reference's apdb-config option naming either backend.
    source: str | None = None
    jdbc_driver: str | None = None
    jdbc_chunk_table: str = "apdb_replica_chunks"
    jdbc_tables: tuple = ("DiaObject", "DiaSource", "DiaForcedSource")
    ledger: str | None = None
    export_root: str | None = None
    bucket: str | None = None
    min_wait_time: float = 300.0
    max_wait_time: float = 900.0
    check_interval: float = 360.0
    wait_interval: float = 30.0
    update: bool = False
    exit_on_error: bool = False
    schema: str | None = None
    prefix: str = "ppdb"
    # Parquet codec for exported chunks; accepts leveled zstd settings
    # (``zstd_lvl8``/``zstd_lvl15``), reference cli/options.py:205-213.
    parq_compression: str = "snappy"


def config_type_for_name(type_name: str) -> type[PpdbConfig]:
    """Return the config class for a short type name
    (``_factory.py:33-60``; "spark" is this package's one backend)."""
    if type_name == "spark":
        return SparkPipelineConfig
    raise TypeError(f"Unknown type name: {type_name}")


class SparkPipeline:
    """Factory bundle: the pipeline components built from one config
    (the Spark analog of ``ppdb_from_config``, ``_factory.py:64-92``).

    Components are built lazily so a config naming only a ledger can
    still drive ``list-chunks`` without a warehouse root.
    """

    def __init__(self, spark, config: SparkPipelineConfig) -> None:
        self.spark = spark
        self.config = config

    def promoter(self):
        from .pipeline.promote import Promoter

        if not self.config.root:
            raise ValueError("config has no `root` (PPDB warehouse)")
        return Promoter(self.spark, self.config.root)

    def ledger(self):
        from .ledger import Ledger

        path = self.config.ledger
        if not path:
            return self.promoter().ledger
        return Ledger(self.spark, path)

    def apdb_source(self):
        if not self.config.source:
            raise ValueError("config has no `source` (APDB export area)")
        if self.config.source.startswith("jdbc:"):
            from .io.jdbc import JdbcApdbSource

            return JdbcApdbSource(
                self.spark,
                self.config.source,
                chunk_table=self.config.jdbc_chunk_table,
                driver=self.config.jdbc_driver,
            )
        from .pipeline.replicate import DirectoryApdbSource

        return DirectoryApdbSource(self.config.source)

    def replicator(self, ledger=None):
        from .pipeline.replicate import Replicator

        return Replicator(
            self.spark,
            self.apdb_source(),
            ledger if ledger is not None else self.ledger(),
            min_wait_s=self.config.min_wait_time,
            max_wait_s=self.config.max_wait_time,
            update=self.config.update,
        )

    def uploader(self):
        from .pipeline.upload import ChunkUploader

        if not self.config.export_root or not self.config.bucket:
            raise ValueError("config needs `export_root` and `bucket` for upload")
        return ChunkUploader(
            self.ledger(),
            self.config.export_root,
            self.config.bucket,
            exit_on_error=self.config.exit_on_error,
        )


def pipeline_from_config(spark, config: PpdbConfig) -> SparkPipeline:
    """Build the component factory for a config object; unknown config
    types raise ``TypeError`` like ``ppdb_from_config``."""
    if type(config) is SparkPipelineConfig:
        return SparkPipeline(spark, config)
    raise TypeError(f"Unknown type of config object: {type(config)}")

"""dax_ppdb_spark — a PySpark-native re-expression of lsst/dax_ppdb.

The reference (github.com/lsst/dax_ppdb) is the LSST Prompt Products
Database replication system: it copies time-ordered "replica chunks" of
catalog data (DiaObject / DiaSource / DiaForcedSource) from an APDB
into a query-optimized PPDB, applying retroactive updates along the
way.  This package rebuilds every one of its query / data-processing
capabilities (see SURVEY.md §2) Spark-first:

- ``schema``   — StructType registry (reference: Felis YAML schemas).
- ``ops``      — the operator library: validity-interval fill, latest
  record dedup, pivot patch build, merges, anti-join replication diff,
  watermark gating — each a pure DataFrame -> DataFrame function.
- ``io``       — parquet read/write with column exclusion, manifest
  writer, atomic table swap (reference: _arrow.py, manifest.py).
- ``pipeline`` — store / promote / replicate orchestration
  (reference: replicator.py, chunk_promoter.py).
- ``llm``      — beyond-reference large-scale training-data operators:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  similarity search, text analysis, multimodal column plumbing.

Everything is vanilla PySpark (no Delta/Iceberg available in this
environment); mutation primitives (MERGE / atomic swap) are built from
join + coalesce + atomic directory swap in ``ops.merge`` / ``io.table``.
"""

__version__ = "0.1.0"

"""K-minimum-values (KMV) distinct-count sketch as DataFrame ops.

Spark ships HyperLogLog (``approx_count_distinct``) for one-shot
estimates, but its sketch state is opaque — you cannot store it in a
table and merge it later without the private ``hll_sketch_agg``
codepath.  KMV (Bar-Yossef et al., RANDOM 2002) is the classic
*transparent* mergeable sketch: keep the k smallest distinct hash
values; the estimate is ``(k-1) / kth_min`` of the normalized hash.
Because the sketch is just a sorted array<long> column, it can be

- written to parquet alongside daily rollups,
- merged across days/partitions with a flatten + re-min pass,
- audited/replayed by any engine (the hash is the md5-window family
  from :mod:`..llm.text`, bit-identical in DuckDB).

Scale shape: building sketches is one shuffle of the *distinct*
(key, hash) pairs (map-side partial distinct applies); per-key state
after ranking is capped at k longs, so no group can blow a task even
at billions of distinct values per key.  Merging shuffles only
n_keys * k longs — the whole point at 100 TB: sketch per
day-partition at write time, merge per month at read time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..llm.text import md5_long

__all__ = ["kmv_sketch", "kmv_merge", "kmv_estimate"]

# The hash family maps into [0, 2^32): md5_long parses 8 hex chars.
_HASH_SPACE = float(2**32)


def _k_smallest(df: DataFrame, keys: list[str], k: int) -> DataFrame:
    """Per key, the sorted array of the k smallest distinct ``h``."""
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        df.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    )


def kmv_sketch(
    df: DataFrame, keys: list[str], value: str, k: int = 64
) -> DataFrame:
    """Per-key KMV sketch of ``value``: ``keys..., kmv array<long>``.

    The value is hashed through the engine-portable md5 window (cast
    to string first so numeric and string inputs share one replayable
    hash family).
    """
    hashed = df.select(
        *keys, md5_long(F.col(value).cast("string")).alias("h")
    )
    return _k_smallest(hashed, keys, k)


def kmv_merge(df: DataFrame, keys: list[str], k: int = 64) -> DataFrame:
    """Merge per-key ``kmv`` sketch arrays (e.g. daily sketches into a
    monthly one): flatten, re-take the k smallest distinct."""
    exploded = df.select(*keys, F.explode("kmv").alias("h"))
    return _k_smallest(exploded, keys, k)


def kmv_estimate(kmv: Column, k: int = 64) -> Column:
    """Distinct-count estimate from a sketch array.

    Exact (= array size) while fewer than k distinct values were seen;
    otherwise the KMV estimator ``(k-1) * HASH_SPACE / kth_min``.
    """
    n = F.size(kmv)
    kth = F.element_at(kmv, k).cast("double")
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1) * _HASH_SPACE) / kth
    )

"""Key-skew diagnostics: measure the hot keys before they burn you.

Every shuffle-keyed operator in this package degrades the same way at
100 TB — one key owning a disproportionate share of rows turns one
task into the job's critical path.  AQE's skew-join splitting covers
sort-merge joins; it cannot split a window partition, a
``groupBy``-side hot key feeding a non-algebraic aggregate, or a
stateful-streaming key.  For those the fix is layout-time (salting —
:func:`dax_ppdb_spark.ops.latest.topk_per_key`'s two-phase plan — or
key-splitting), and the decision needs a MEASUREMENT, not a guess.

This module is that measurement:

- :func:`key_histogram` — the distributed per-key row-count relation
  (one map-side-combined aggregation, composable, never collected);
- :func:`skew_report` — a bounded driver-side summary (scalars + the
  top-N hot keys; the collect is ``top_n`` rows by construction);
- :func:`suggest_salt_buckets` — the salt factor that brings the
  hottest key's per-task share down to the average task's load.

Shape: one exchange on the key (with partial aggregation the map
output is one row per key per task); the per-key count relation is
persisted across the summary and top-N actions, so the input is
scanned once.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def key_histogram(df: DataFrame, keys: Sequence[str] | str) -> DataFrame:
    """Per-key row counts: the base relation every skew question reads.
    Map-side partial aggregation bounds the shuffle at one row per
    (key, map task)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))


@dataclass
class SkewReport:
    """Bounded summary of a key distribution (see :func:`skew_report`)."""

    n_rows: int
    n_keys: int
    mean: float
    p50: float
    p90: float
    p99: float
    max: int
    #: max/mean — 1.0 is perfectly uniform; >10 means the hottest key's
    #: task does 10x the average task's work on that stage
    skew_factor: float
    #: (key values..., n_rows) for the top-N keys, hottest first
    top_keys: list[tuple] = field(default_factory=list)

    def is_skewed(self, threshold: float = 5.0) -> bool:
        return self.skew_factor >= threshold


def skew_report(
    df: DataFrame, keys: Sequence[str] | str, top_n: int = 20
) -> SkewReport:
    """Profile the key distribution of ``df`` for shuffle planning.

    Two model-sized driver results: the scalar summary (one row) and
    the ``top_n`` hottest keys — the collect is bounded regardless of
    corpus size.  Percentiles are exact-ish (``approx_percentile``
    default accuracy) over the per-key counts, not the rows.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    # persist the histogram across the two actions (summary + top-N):
    # without it each action re-scans and re-shuffles the full input,
    # doubling the cost of the diagnostic on the corpus it is sizing
    hist = key_histogram(df, keys).persist()
    try:
        summary = hist.agg(
            F.sum("n_rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.mean("n_rows").alias("mean"),
            F.expr(
                "approx_percentile(n_rows, array(0.5, 0.9, 0.99))"
            ).alias("pct"),
            F.max("n_rows").alias("max"),
        ).head()
        top = [
            tuple(r)
            for r in hist.orderBy(F.col("n_rows").desc(), *keys).head(top_n)
        ]
    finally:
        hist.unpersist()
    mx = int(summary["max"] or 0)
    mean = float(summary["mean"] or 0.0)
    return SkewReport(
        n_rows=int(summary["n_rows"] or 0),
        n_keys=int(summary["n_keys"] or 0),
        mean=mean,
        p50=float(summary["pct"][0]) if summary["pct"] else 0.0,
        p90=float(summary["pct"][1]) if summary["pct"] else 0.0,
        p99=float(summary["pct"][2]) if summary["pct"] else 0.0,
        max=mx,
        skew_factor=(mx / mean) if mean > 0 else 0.0,
        top_keys=top,
    )


def scan_partition_histogram(df: DataFrame) -> DataFrame:
    """Rows per physical scan partition — the direct view of input
    balance (file splits, bucket files, coalesced scan tasks).  One
    map-side-combined aggregation keyed by ``spark_partition_id``;
    output is one row per task.

    Reading this AFTER a repartition/exchange shows the post-shuffle
    balance instead — the same question one stage later.
    """
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the plan's output (file sizes for
    a bare scan, selectivity-adjusted upstream of filters/joins) —
    the input to :func:`suggest_shuffle_partitions`.  Driver-side plan
    metadata; touches no data."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def suggest_shuffle_partitions(
    size_bytes: int,
    target_partition_bytes: int = 128 * 1024 * 1024,
    min_partitions: int = 1,
    max_partitions: int = 100_000,
) -> int:
    """``spark.sql.shuffle.partitions`` such that one shuffle
    partition of this relation lands near ``target_partition_bytes``
    (default 128 MB — comfortably in-memory per executor core, and the
    same default Spark uses for scan splits via
    ``spark.sql.files.maxPartitionBytes``).

    With AQE's partition coalescing ON (this package's session
    default), err HIGH: AQE merges small post-shuffle partitions for
    free, but cannot split an oversized one outside the skew-join
    path — so the cost of too many is near zero and the cost of too
    few is spill.
    """
    if size_bytes <= 0:
        return min_partitions
    return max(
        min_partitions,
        min(max_partitions, math.ceil(size_bytes / target_partition_bytes)),
    )


def suggest_salt_buckets(
    report: SkewReport, parallelism: int, threshold: float = 5.0
) -> int:
    """Salt-bucket count for the two-phase salted plans
    (:func:`~dax_ppdb_spark.ops.latest.topk_per_key` and kin).

    1 (no salting) while the hottest key is under ``threshold`` times
    the mean — salting costs a second aggregation pass, so it must
    earn its keep.  Above it, enough buckets that the hottest key's
    per-bucket slice shrinks to roughly the mean key's load, capped at
    ``parallelism`` (more buckets than tasks buys nothing).
    """
    if report.mean <= 0 or report.skew_factor < threshold:
        return 1
    return max(1, min(parallelism, math.ceil(report.max / report.mean)))

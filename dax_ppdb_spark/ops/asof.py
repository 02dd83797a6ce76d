"""As-of (point-in-time) join — an operator Spark lacks natively.

The PPDB data model is SCD-2 versioned, so "which version was valid at
time T" / "the latest right-side row at or before each left row's
time" is the natural lookup (e.g. associate a DiaSource with the
DiaObject version valid at its ``midpointMjdTai``; attribute a click
to the most recent prior purchase).

Spark-first composition (no native ASOF): equi-join on the key with a
range predicate, then keep the nearest right-side row per left row via
``max_by`` — one shuffle on the key, map-side partial aggregation, all
JVM expressions.  Left rows without a qualifying match re-enter
through a final broadcast-able join on a synthetic row id (left-outer
semantics, like pandas ``merge_asof`` / DuckDB ``ASOF JOIN``).  For
heavily versioned keys, bound the lookback with ``tolerance`` to keep
the per-key fan-out small — the same trick as range-bucketing an
interval join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def _row_hash(df: DataFrame, cols: Sequence[str]):
    """Deterministic 64-bit hash of a row's (hashable) columns.

    Used as an ordering tiebreaker so identical plans re-executed on a
    recomputed/shuffled source still pair the same rows — unlike
    ``monotonically_increasing_id``, whose values depend on physical
    partition layout and change across stage retries.  Map columns are
    excluded (Spark forbids hashing MapType); rows identical in every
    hashable column are interchangeable, so a swapped ordering between
    them cannot change the result.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    hashable = [c for c in cols if not isinstance(fields[c], MapType)]
    return F.xxhash64(*[F.col(c) for c in hashable]) if hashable else F.lit(0)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    tolerance: int | float | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the closest right row at-or-before
    (``backward``) or at-or-after (``forward``) its time, per key.

    Left rows with no match keep NULL right columns.  Right columns
    clashing with left names get ``suffix``; key columns appear once.
    ``tolerance`` bounds ``|left_time - right_time|``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    on = list(on)
    # A synthetic per-key row id pairs each candidate back to its left
    # row (the range join may duplicate left rows before the
    # reduction).  row_number over a deterministic ordering — not
    # monotonically_increasing_id — so a stage retry or a cached vs
    # recomputed upstream cannot mis-pair rows.  The window shares the
    # join's hash partitioning on the key, so it adds no extra shuffle.
    lid = "__asof_lid"
    lw = Window.partitionBy(*on).orderBy(
        F.col(left_time), _row_hash(left, left.columns)
    )
    left_tagged = left.withColumn(lid, F.row_number().over(lw))

    rename = {
        c: (c + suffix if c in left.columns and c not in on else c)
        for c in right.columns
    }
    r = right.select(*[F.col(c).alias(rename[c]) for c in right.columns])
    rt = rename[right_time]
    out_right = [rename[c] for c in right.columns if c not in on]

    # max_by ordering: nearest time first, then a deterministic row
    # hash so a tie on right_time always resolves to the same row.
    rhash = _row_hash(r, out_right)
    if direction == "backward":
        cond = F.col(rt) <= F.col(left_time)
        if tolerance is not None:
            cond = cond & (F.col(rt) >= F.col(left_time) - F.lit(tolerance))
        ordk = F.struct(F.col(rt).alias("t"), rhash.alias("h"))
    else:
        cond = F.col(rt) >= F.col(left_time)
        if tolerance is not None:
            cond = cond & (F.col(rt) <= F.col(left_time) + F.lit(tolerance))
        ordk = F.struct((-F.col(rt)).alias("t"), rhash.alias("h"))

    candidates = left_tagged.select(lid, left_time, *on).join(r, on, "inner").where(cond)
    nearest = candidates.groupBy(*on, lid).agg(
        F.max_by(F.struct(*[F.col(c) for c in out_right]), ordk).alias("__r")
    )
    return left_tagged.join(nearest, [*on, lid], "left").select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(c) for c in out_right],
    )

"""Range (point-in-interval) join — an operator Spark lacks natively.

A plain ``points JOIN intervals ON p BETWEEN lo AND hi`` has no equi
key, so Catalyst falls back to BroadcastNestedLoopJoin — O(P x I)
compares and a broadcast of a whole side; engines with dedicated range
joins (DuckDB's IEJoin, the reference's databases' index scans) beat
that easily.  The distributed shape that scales is bucketing: quantize
the domain into fixed-width buckets, explode each interval into every
bucket it overlaps, tag each point with its single bucket, hash-join
on the bucket id, then refine with the exact predicate.

Cost model: shuffle volume is O(P + I * span/width) and each point is
examined only against intervals sharing its bucket.  The right
``width`` is near the typical interval length: explosion factor ~
span/width + 1 stays small while buckets stay selective.  By default
the width is DERIVED from the data — a single sampled
``approx_percentile`` pass over the interval spans — so the operator
stays bucket-selective as the corpus grows instead of inheriting a
caller constant tuned for yesterday's density.  Skewed buckets (many
intervals over a hot range) are ordinary hash-join skew — AQE splits
them.

This generalizes the validity-interval model (``valid_at`` is the
broadcast-scalar special case; ``asof_join`` the nearest-edge
variant): use it to map measurements to calibration epochs, prices to
tolerance bands, events to sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_bucket_width(
    intervals: DataFrame, lo_col: str, hi_col: str
) -> float:
    """Derive a bucket width from the interval-span distribution.

    One sampled single-row aggregate (``approx_percentile`` — t-digest
    sketch, mergeable, single pass): width = the median span, falling
    back to the 99th percentile when the median is degenerate (mostly
    point intervals) and to 1.0 when every interval is a point (any
    width is then explosion-free; bucket occupancy is governed by the
    cap-free hash join + AQE).  Median-span buckets keep the per-
    interval explosion factor ~2 while staying selective, and — unlike
    a caller constant — keep holding as data density grows 10x/100x.
    """
    span = F.col(hi_col) - F.col(lo_col)
    row = intervals.agg(
        F.percentile_approx(span, F.array(F.lit(0.5), F.lit(0.99)), 1000).alias("p")
    ).first()
    p50, p99 = (float(v) if v is not None else 0.0 for v in (row["p"] or [0.0, 0.0]))
    if p50 > 0:
        return p50
    return p99 if p99 > 0 else 1.0


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (closed interval), without a nested-loop plan.

    ``width`` is the bucket size in domain units; ``None`` (default)
    derives it from the interval spans via :func:`auto_bucket_width`.
    The result is width-independent — only the plan changes.  Column
    names must not collide between the two inputs.  ``how`` may be
    ``inner`` or ``left`` (left keeps unmatched points with NULL
    interval columns).
    """
    if width is None:
        width = auto_bucket_width(intervals, lo_col, hi_col)
    if width <= 0:
        raise ValueError("width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")
    b = "__range_bucket"
    pb = points.withColumn(
        b, F.floor(F.col(point_col) / F.lit(width)).cast("long")
    )
    ib = intervals.withColumn(
        b,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(width)).cast("long"),
            )
        ),
    )
    refine = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    if how == "inner":
        return pb.join(ib, b).filter(refine).drop(b)
    # left: refine inside the join condition so unmatched points survive
    cond = (pb[b] == ib[b]) & refine
    return pb.join(ib, cond, "left").select(
        *[pb[c] for c in points.columns], *[ib[c] for c in intervals.columns]
    )

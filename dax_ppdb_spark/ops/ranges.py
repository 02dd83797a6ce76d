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
examined only against intervals sharing its bucket.  Pick ``width``
near the typical interval length: explosion factor ~ span/width + 1
stays small while buckets stay selective.  Skewed buckets (many
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


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (closed interval), without a nested-loop plan.

    ``width`` is the bucket size in domain units.  Column names must
    not collide between the two inputs.  ``how`` may be ``inner`` or
    ``left`` (left keeps unmatched points with NULL interval columns).
    """
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

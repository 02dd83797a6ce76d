"""Spatial index column — the ST_GEOGPOINT / clustering-key analog.

The reference computes a GEOGRAPHY ``geo_point = ST_GEOGPOINT(ra, dec)``
during promotion (``bigquery/chunk_promoter.py:211-215``) purely as a
BigQuery clustering key (``dataset_builder.py:250-253``).  Spark has no
geography type; the equivalent is a Z-order (Morton) pixel id over
quantized ``(ra, dec)`` used as a sort/cluster column so spatially
close rows co-locate in the same parquet row groups and min/max
statistics prune sky-region scans.

Built from shift/OR column expressions only — stays in whole-stage
codegen, no UDF.  16 bits per axis => ~0.005° cells, plenty for
row-group-level data skipping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _quantize(ra: Column, dec: Column, bits_per_axis: int) -> tuple[Column, Column]:
    """Grid coordinates: ra ([0,360)) and dec ([-90,90]) to integer
    cells in [0, 2^bits)."""
    scale = (1 << bits_per_axis) - 1
    x = F.least(
        F.lit(scale), F.floor(ra / F.lit(360.0) * F.lit(scale + 1)).cast("long")
    )
    y = F.least(
        F.lit(scale),
        F.floor((dec + F.lit(90.0)) / F.lit(180.0) * F.lit(scale + 1)).cast("long"),
    )
    return x, y


def _interleave(x: Column, y: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-bit grid coordinates.

    Disjoint bit positions => addition is bitwise OR (PySpark's `|`
    on Columns is logical, not bitwise).
    """
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(x, i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(y, i) % 2, 2 * i + 1)
        )
    return out


def zorder_index(ra: Column, dec: Column, bits_per_axis: int = 16) -> Column:
    """Morton-interleave quantized ra ([0,360)) and dec ([-90,90])."""
    x, y = _quantize(ra, dec, bits_per_axis)
    return _interleave(x, y, bits_per_axis)


def with_geo_point(df, ra_col: str = "ra", dec_col: str = "dec", out_col: str = "geo_point"):
    """P10/S10: add the computed clustering column during promotion."""
    return df.withColumn(out_col, zorder_index(F.col(ra_col), F.col(dec_col)))


def zorder_cell(geo_point: Column, level: int, bits_per_axis: int = 16) -> Column:
    """Coarse hierarchical cell id: the Z-order truncated to ``level``
    bits per axis (HEALPix-style nesting — every level-L cell contains
    exactly 4 level-(L+1) cells).

    Because Morton codes nest, a sky region at any resolution is a
    contiguous set of coarse cells => a range predicate on the sorted
    ``geo_point`` column, which parquet row-group min/max stats prune.
    Use for multi-resolution cone searches and for choosing partition
    granularity (coarse level for partitioning, full code for in-file
    sort).
    """
    if not 0 < level <= bits_per_axis:
        raise ValueError(f"level must be in (0, {bits_per_axis}]")
    return F.shiftright(geo_point, 2 * (bits_per_axis - level))


def _morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return out


def cells_for_box(
    ra_min: float,
    ra_max: float,
    dec_min: float,
    dec_max: float,
    level: int,
    bits_per_axis: int = 16,
) -> list[int]:
    """Driver-side: the level-``level`` Z-order cells covering a sky box.

    The query-planning half of the prune+refine pattern: these cell ids
    become an IN/range predicate on ``zorder_cell(geo_point, level)``
    that parquet min/max stats can skip on; the exact geometric filter
    then refines the survivors.  Matches ``zorder_cell(zorder_index(ra,
    dec), level)`` exactly because truncating a floor-quantization is
    the coarser floor-quantization.  (No RA wraparound handling — split
    the box at 0/360 first.)
    """
    scale = 1 << level
    x0 = max(0, min(scale - 1, int(ra_min / 360.0 * scale)))
    x1 = max(0, min(scale - 1, int(ra_max / 360.0 * scale)))
    y0 = max(0, min(scale - 1, int((dec_min + 90.0) / 180.0 * scale)))
    y1 = max(0, min(scale - 1, int((dec_max + 90.0) / 180.0 * scale)))
    return sorted(
        _morton(x, y, level)
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
    )


def cell_cover_predicate(
    ra: Column,
    dec: Column,
    ra_min: float,
    ra_max: float,
    dec_min: float,
    dec_max: float,
    level: int,
) -> Column:
    """Driver-side: a cheap per-row predicate for the cell-aligned
    bounding box of :func:`cells_for_box`'s cover.

    Every row whose cell is in the cover satisfies this predicate, so
    it is a strict SUPERSET pre-filter for the cell IN-list: cheap
    comparisons that discard the bulk of an unsorted scan before the
    (much wider) bit-interleave + set-membership expression runs on
    the survivors.  On the geo-sorted layout the same skip happens in
    storage via row-group stats; this is the compute-side twin for
    un-clustered inputs.

    Upper bounds are exclusive EXCEPT when the cover reaches the last
    cell of an axis: ``_quantize`` clamps the domain maxima (ra=360,
    dec=90) INTO that cell, so an exclusive comparison there would
    drop a row whose cell is in the cover — the comparison turns
    inclusive exactly when the quantizer's clamp applies.
    """
    scale = 1 << level
    x0 = max(0, min(scale - 1, int(ra_min / 360.0 * scale)))
    x1 = max(0, min(scale - 1, int(ra_max / 360.0 * scale)))
    y0 = max(0, min(scale - 1, int((dec_min + 90.0) / 180.0 * scale)))
    y1 = max(0, min(scale - 1, int((dec_max + 90.0) / 180.0 * scale)))
    ra_hi = (x1 + 1) * 360.0 / scale
    dec_hi = (y1 + 1) * 180.0 / scale - 90.0
    ra_upper = ra <= ra_hi if x1 == scale - 1 else ra < ra_hi
    dec_upper = dec <= dec_hi if y1 == scale - 1 else dec < dec_hi
    return (
        (ra >= x0 * 360.0 / scale)
        & ra_upper
        & (dec >= y0 * 180.0 / scale - 90.0)
        & dec_upper
    )


def crossmatch(
    left,
    right,
    radius_deg: float,
    level: int = 8,
    left_ra: str = "ra",
    left_dec: str = "dec",
    right_ra: str = "ra",
    right_dec: str = "dec",
    bits_per_axis: int = 16,
):
    """Catalog-to-catalog neighbor match: every (left, right) pair
    within ``radius_deg`` (planar small-angle distance) — the
    source-to-object association shape of the reference's data model
    (DiaSource -> DiaObject matching by position).

    Scale shape: each left row explodes into the 3x3 grid-cell
    neighborhood of its position; each right row carries its single
    cell; an equi-join on the (cx, cy) pair replaces the quadratic
    distance theta-join, and the exact radius refine runs only within
    neighborhoods.  The join key is the raw grid pair — no Morton
    interleave needed (that is a storage-sort concern, not a join
    concern), which keeps the expression tree small enough for
    whole-stage codegen.  Unclamped border neighbors simply never
    match, so each (left, right) pair appears exactly once.  Requires
    ``radius_deg`` <= one cell (360/2^level deg in ra, 180/2^level in
    dec) so no true match can sit outside the neighborhood — asserted
    here.  (No RA wraparound: planar treatment, same as the oracle.)

    Columns keep their input names; ambiguous names must be renamed by
    the caller.  Output adds ``dist_deg``.
    """
    cell_ra = 360.0 / (1 << level)
    cell_dec = 180.0 / (1 << level)
    if radius_deg > min(cell_ra, cell_dec):
        raise ValueError(
            f"radius {radius_deg} exceeds cell size at level {level}; raise level"
        )
    shift = bits_per_axis - level
    lx, ly = _quantize(F.col(left_ra), F.col(left_dec), bits_per_axis)
    l2 = (
        left.withColumn("__dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__cx", F.shiftright(lx, shift) + F.col("__dx"))
        .withColumn("__cy", F.shiftright(ly, shift) + F.col("__dy"))
        .drop("__dx", "__dy")
    )
    rx, ry = _quantize(F.col(right_ra), F.col(right_dec), bits_per_axis)
    r2 = right.withColumn("__cx", F.shiftright(rx, shift)).withColumn(
        "__cy", F.shiftright(ry, shift)
    )
    # plain multiplication, not pow(): bit-identical across engines,
    # so the DuckDB oracle reproduces dist_deg exactly
    dra = F.col(left_ra) - F.col(right_ra)
    ddec = F.col(left_dec) - F.col(right_dec)
    d2 = dra * dra + ddec * ddec
    return (
        l2.join(r2, ["__cx", "__cy"])
        .filter(d2 <= F.lit(radius_deg * radius_deg))
        .drop("__cx", "__cy")
        .withColumn("dist_deg", F.sqrt(d2))
    )

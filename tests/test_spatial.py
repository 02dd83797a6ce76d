"""Z-order spatial index: nesting, locality, and range-pruning
properties that make it a valid ST_GEOGPOINT-clustering replacement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dax_ppdb_spark.ops.spatial import with_geo_point, zorder_cell, zorder_index


def _sky(spark, pts):
    return with_geo_point(
        spark.createDataFrame(pts, "ra DOUBLE, dec DOUBLE")
    )


def test_zorder_distinct_and_bounded(spark):
    pts = [(ra * 10.0, dec * 10.0 - 90.0) for ra in range(10) for dec in range(10)]
    rows = _sky(spark, pts).collect()
    codes = [r.geo_point for r in rows]
    assert len(set(codes)) == len(codes)  # distinct cells -> distinct codes
    assert all(0 <= c < 1 << 32 for c in codes)


def test_zorder_locality(spark):
    """Nearby points share high bits: same coarse cell."""
    rows = _sky(
        spark, [(45.0, -30.0), (45.001, -30.001), (225.0, 60.0)]
    ).withColumn("cell", zorder_cell(F.col("geo_point"), level=8)).collect()
    near_a, near_b, far = rows
    assert near_a.cell == near_b.cell
    assert far.cell != near_a.cell


def test_zorder_cell_nesting(spark):
    """Every level-L cell id is the parent of its level-(L+1) ids."""
    df = _sky(spark, [(123.4, 5.6)])
    out = df.select(
        zorder_cell(F.col("geo_point"), 4).alias("c4"),
        zorder_cell(F.col("geo_point"), 5).alias("c5"),
    ).first()
    assert out.c5 >> 2 == out.c4


def test_zorder_cell_level_bounds(spark):
    df = _sky(spark, [(0.0, 0.0)])
    with pytest.raises(ValueError):
        df.select(zorder_cell(F.col("geo_point"), 0))
    with pytest.raises(ValueError):
        df.select(zorder_cell(F.col("geo_point"), 17))


def test_edge_coordinates_clamped(spark):
    rows = _sky(spark, [(359.999999, 89.999999), (0.0, -90.0)]).collect()
    assert all(0 <= r.geo_point < 1 << 32 for r in rows)


def test_cells_for_box_covers_refine_region(spark):
    """Prune + refine == plain refine: the coarse cell predicate must
    not drop any point inside the exact region."""
    from dax_ppdb_spark.ops.spatial import cells_for_box

    pts = [
        (48.0 + i * 0.37, -87.0 + j * 0.29)
        for i in range(12)
        for j in range(15)
    ]
    df = _sky(spark, pts).withColumn("cell", zorder_cell(F.col("geo_point"), 8))
    d2 = (F.col("ra") - 50.0) ** 2 + (F.col("dec") + 85.0) ** 2
    exact = df.filter(d2 <= 4.0)
    cells = cells_for_box(48.0, 52.0, -87.0, -83.0, level=8)
    pruned = exact.filter(F.col("cell").isin(cells))
    assert pruned.count() == exact.count() > 0


def test_cells_match_column_expression(spark):
    """cells_for_box quantization must agree with zorder_cell/zorder_index."""
    from dax_ppdb_spark.ops.spatial import cells_for_box

    pts = [(48.01, -86.99), (51.99, -83.01), (50.0, -85.0)]
    rows = (
        _sky(spark, pts)
        .withColumn("cell", zorder_cell(F.col("geo_point"), 8))
        .collect()
    )
    cells = set(cells_for_box(48.0, 52.0, -87.0, -83.0, level=8))
    assert all(r.cell in cells for r in rows)


def test_cells_for_box_property(spark):
    """Random boxes + random interior points: every point's coarse
    cell is in the box's cell cover (hypothesis-style sweep without
    per-example Spark jobs — quantization is replayed in Python)."""
    import random

    from dax_ppdb_spark.ops.spatial import _morton, cells_for_box

    rng = random.Random(42)
    for _ in range(200):
        ra0 = rng.uniform(0, 350)
        ra1 = ra0 + rng.uniform(0.01, 9)
        dec0 = rng.uniform(-90, 80)
        dec1 = dec0 + rng.uniform(0.01, 9)
        level = rng.choice([4, 6, 8, 10])
        cells = set(cells_for_box(ra0, ra1, dec0, dec1, level))
        for _ in range(5):
            ra = rng.uniform(ra0, min(ra1, 359.999999))
            dec = rng.uniform(dec0, min(dec1, 89.999999))
            x = min(65535, int(ra / 360.0 * 65536)) >> (16 - level)
            y = min(65535, int((dec + 90.0) / 180.0 * 65536)) >> (16 - level)
            assert _morton(x, y, level) in cells


def test_crossmatch_neighborhood_and_radius(spark):
    """Matches across cell borders (neighbor explode), excludes beyond
    radius, each pair exactly once, and the radius guard trips."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from dax_ppdb_spark.ops.spatial import crossmatch

    left = spark.createDataFrame(
        [(1, 10.0, 0.0), (2, 200.0, 45.0), (3, 0.01, -89.9)],
        "src_id LONG, src_ra DOUBLE, src_dec DOUBLE",
    )
    right = spark.createDataFrame(
        [
            (101, 10.2, 0.1),    # ~0.22 deg from src 1 -> match
            (102, 10.0, 0.9),    # 0.9 deg from src 1 -> no match at r=0.5
            (103, 200.05, 45.05),  # near src 2 -> match
            (104, 0.2, -89.8),   # near the dec/ra border, near src 3
        ],
        "obj_id LONG, obj_ra DOUBLE, obj_dec DOUBLE",
    )
    out = crossmatch(
        left, right, radius_deg=0.5,
        left_ra="src_ra", left_dec="src_dec",
        right_ra="obj_ra", right_dec="obj_dec",
    )
    pairs = sorted((r.src_id, r.obj_id) for r in out.collect())
    assert pairs == [(1, 101), (2, 103), (3, 104)]  # once each, no dups

    with pytest.raises(ValueError, match="exceeds cell size"):
        crossmatch(left, right, radius_deg=5.0,
                   left_ra="src_ra", left_dec="src_dec",
                   right_ra="obj_ra", right_dec="obj_dec")


def test_cell_cover_predicate_includes_domain_edge(spark):
    """The cover pre-filter must stay a strict superset of the cell
    IN-list at the domain maxima: _quantize clamps ra=360 / dec=90
    into the LAST cell, so the predicate's upper bound turns inclusive
    there instead of silently dropping a covered row."""
    from pyspark.sql import functions as F

    from dax_ppdb_spark.ops.spatial import (
        cell_cover_predicate,
        cells_for_box,
        zorder_cell,
        zorder_index,
    )

    rows = spark.createDataFrame(
        [(1, 360.0, 90.0), (2, 359.9, 89.9), (3, 350.0, 80.0)],
        "id LONG, ra DOUBLE, dec DOUBLE",
    )
    cells = cells_for_box(358.0, 360.0, 88.0, 90.0, level=8)
    in_cover = rows.withColumn(
        "cell", zorder_cell(zorder_index(F.col("ra"), F.col("dec")), level=8)
    ).filter(F.col("cell").isin(cells))
    pred = rows.filter(
        cell_cover_predicate(F.col("ra"), F.col("dec"), 358.0, 360.0, 88.0, 90.0, 8)
    )
    assert {r.id for r in in_cover.collect()} == {1, 2}
    # superset property: everything the IN-list keeps, the box keeps
    assert {r.id for r in pred.collect()} >= {1, 2}
    # interior boxes keep exclusive upper bounds (no over-matching a
    # whole extra cell row/column)
    interior = rows.filter(
        cell_cover_predicate(F.col("ra"), F.col("dec"), 340.0, 352.0, 70.0, 82.0, 8)
    )
    assert {r.id for r in interior.collect()} == {3}

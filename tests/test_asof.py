"""As-of join semantics: backward/forward, tolerance, no-match NULLs.

Cross-checked against DuckDB's native ASOF JOIN by the driver oracle
(`asof_attribution`); these pin the operator's edge behavior directly.
"""

from __future__ import annotations

import pytest

from dax_ppdb_spark.ops.asof import asof_join


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 205), (3, "b", 50), (4, "c", 10)],
        "id LONG, k STRING, t LONG",
    )
    right = spark.createDataFrame(
        [("a", 90, "a90"), ("a", 200, "a200"), ("a", 300, "a300"), ("b", 60, "b60")],
        "k STRING, rt LONG, tag STRING",
    )
    return left, right


def test_backward_picks_latest_at_or_before(spark):
    left, right = _sides(spark)
    out = {r.id: (r.rt, r.tag) for r in asof_join(
        left, right, on=["k"], left_time="t", right_time="rt").collect()}
    assert out[1] == (90, "a90")      # 90 <= 100 < 200
    assert out[2] == (200, "a200")    # latest at-or-before 205
    assert out[3] == (None, None)     # b's only row is at 60 > 50
    assert out[4] == (None, None)     # key c has no right rows


def test_forward_picks_earliest_at_or_after(spark):
    left, right = _sides(spark)
    out = {r.id: (r.rt, r.tag) for r in asof_join(
        left, right, on=["k"], left_time="t", right_time="rt",
        direction="forward").collect()}
    assert out[1] == (200, "a200")
    assert out[2] == (300, "a300")
    assert out[3] == (60, "b60")
    assert out[4] == (None, None)


def test_tolerance_bounds_lookback(spark):
    left, right = _sides(spark)
    out = {r.id: r.tag for r in asof_join(
        left, right, on=["k"], left_time="t", right_time="rt",
        tolerance=5).collect()}
    assert out[1] is None            # 100-90=10 > 5
    assert out[2] == "a200"          # 205-200=5 <= 5


def test_exact_time_match_included(spark):
    left, right = _sides(spark)
    exact = spark.createDataFrame([(9, "a", 200)], "id LONG, k STRING, t LONG")
    out = asof_join(exact, right, on=["k"], left_time="t", right_time="rt").first()
    assert out.tag == "a200"        # at-or-before is inclusive


def test_suffix_on_clashing_columns(spark):
    left = spark.createDataFrame([(1, "a", 10, "L")], "id LONG, k STRING, t LONG, v STRING")
    right = spark.createDataFrame([("a", 5, "R")], "k STRING, t LONG, v STRING")
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t").first()
    assert out.v == "L" and out.v_r == "R" and out.t == 10 and out.t_r == 5


def test_bad_direction_raises(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], left_time="t", right_time="rt",
                  direction="sideways")


def test_point_in_interval_join_semantics(spark):
    """Closed-interval matching, multi-match fan-out, left unmatched
    rows, and the width guard."""
    import pytest

    from dax_ppdb_spark.ops.ranges import point_in_interval_join

    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 99.0)], "pid LONG, x DOUBLE"
    )
    ivals = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 5.0, 6.0), (12, 10.0, 20.0)],
        "iid LONG, lo DOUBLE, hi DOUBLE",
    )
    inner = {(r.pid, r.iid) for r in point_in_interval_join(points, ivals, "x", "lo", "hi", 4.0).collect()}
    # x=5 in [0,10] and [5,6]; x=10 in [0,10] (closed) and [10,20]; x=99 nowhere
    assert inner == {(1, 10), (1, 11), (2, 10), (2, 12)}

    left = point_in_interval_join(points, ivals, "x", "lo", "hi", 4.0, how="left")
    rows = [(r.pid, r.iid) for r in left.collect()]
    assert (3, None) in rows and len(rows) == 5

    with pytest.raises(ValueError):
        point_in_interval_join(points, ivals, "x", "lo", "hi", 0.0)


def test_point_in_interval_auto_width_matches_explicit(spark):
    """width=None derives a positive bucket width from the interval
    spans; the RESULT is width-independent (only the plan changes),
    including for degenerate all-point intervals."""
    from dax_ppdb_spark.ops.ranges import auto_bucket_width, point_in_interval_join

    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 99.0)], "pid LONG, x DOUBLE"
    )
    ivals = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 5.0, 6.0), (12, 10.0, 20.0)],
        "iid LONG, lo DOUBLE, hi DOUBLE",
    )
    expect = {(r.pid, r.iid) for r in point_in_interval_join(
        points, ivals, "x", "lo", "hi", 4.0).collect()}
    auto = {(r.pid, r.iid) for r in point_in_interval_join(
        points, ivals, "x", "lo", "hi").collect()}
    assert auto == expect

    w = auto_bucket_width(ivals, "lo", "hi")
    assert w > 0

    # all-point intervals: median span 0 -> p99/1.0 fallback, join still works
    pts_only = spark.createDataFrame(
        [(20, 5.0, 5.0), (21, 99.0, 99.0)], "iid LONG, lo DOUBLE, hi DOUBLE"
    )
    assert auto_bucket_width(pts_only, "lo", "hi") > 0
    got = {(r.pid, r.iid) for r in point_in_interval_join(
        points, pts_only, "x", "lo", "hi").collect()}
    assert got == {(1, 20), (3, 21)}


def test_null_keys_and_times_never_match(spark):
    """SQL join semantics under the union-merge window shape: NULL
    keys do not match each other, a NULL left time attaches nothing,
    and NULL-key/NULL-time right rows are never anyone's match."""
    left = spark.createDataFrame(
        [(1, None, 100), (2, "a", None), (3, "a", 100)],
        "id LONG, k STRING, t LONG",
    )
    right = spark.createDataFrame(
        [(None, 90, "r_nullkey"), ("a", None, "r_nulltime"), ("a", 50, "r_ok")],
        "k STRING, rt LONG, tag STRING",
    )
    out = {r.id: r.tag for r in asof_join(
        left, right, on=["k"], left_time="t", right_time="rt").collect()}
    assert out == {1: None, 2: None, 3: "r_ok"}
    fwd = {r.id: r.tag for r in asof_join(
        left, right, on=["k"], left_time="t", right_time="rt",
        direction="forward").collect()}
    assert fwd == {1: None, 2: None, 3: None}


def test_right_tiebreak_picks_largest(spark):
    """right_tiebreak resolves same-instant right rows to the largest
    tiebreak tuple — equivalent to a GROUP BY time + MAX pre-reduce,
    but inside the one merge window."""
    left = spark.createDataFrame([(1, "a", 100)], "id LONG, k STRING, t LONG")
    right = spark.createDataFrame(
        [("a", 90, 5.0), ("a", 90, 9.0), ("a", 90, 1.0), ("a", 10, 99.0)],
        "k STRING, rt LONG, v DOUBLE",
    )
    out = asof_join(left, right, on=["k"], left_time="t", right_time="rt",
                    right_tiebreak=["v"]).first()
    assert (out.rt, out.v) == (90, 9.0)   # nearest instant, max value there
    fwd_left = spark.createDataFrame([(1, "a", 5)], "id LONG, k STRING, t LONG")
    out_f = asof_join(fwd_left, right, on=["k"], left_time="t", right_time="rt",
                      direction="forward", right_tiebreak=["v"]).first()
    assert (out_f.rt, out_f.v) == (10, 99.0)

"""Property-based equivalence for the custom join operators.

Each bucketed/windowed implementation must agree row-for-row with the
obvious brute-force computation on arbitrary inputs — the same
oracle-style pinning the DuckDB gate does, but over adversarial random
data (ties, empty sides, border values) instead of the fixed tables.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

ids = st.integers(min_value=0, max_value=6)
times = st.integers(min_value=0, max_value=50)


@settings(**SETTINGS)
@given(
    left=st.lists(st.tuples(ids, times), min_size=1, max_size=15, unique=True),
    right=st.lists(st.tuples(ids, times), max_size=15, unique=True),
)
def test_asof_backward_matches_bruteforce(spark, left, right):
    from dax_ppdb_spark.ops.asof import asof_join

    l_df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k LONG, t LONG, lrow LONG"
    )
    r_df = spark.createDataFrame(
        [(k, t, t * 10 + k) for k, t in right], "k LONG, rt LONG, payload LONG"
    )
    got = {
        (r.k, r.t, r.lrow): r.payload
        for r in asof_join(l_df, r_df, on=["k"], left_time="t", right_time="rt").collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, rt * 10 + rk) for rk, rt in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[(k, t, i)] == want


@settings(**SETTINGS)
@given(
    points=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=12,
        unique=True,
    ),
    ivals=st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.floats(min_value=0, max_value=40, allow_nan=False),
        ),
        max_size=12,
    ),
    width=st.sampled_from([0.7, 5.0, 33.0]),
)
def test_range_join_matches_bruteforce(spark, points, ivals, width):
    from dax_ppdb_spark.ops.ranges import point_in_interval_join

    p_df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(points)], "pid LONG, x DOUBLE"
    )
    i_df = spark.createDataFrame(
        [(j, lo, lo + span) for j, (lo, span) in enumerate(ivals)],
        "iid LONG, lo DOUBLE, hi DOUBLE",
    )
    got = {
        (r.pid, r.iid)
        for r in point_in_interval_join(p_df, i_df, "x", "lo", "hi", width).collect()
    }
    want = {
        (i, j)
        for i, x in enumerate(points)
        for j, (lo, span) in enumerate(ivals)
        if lo <= x <= lo + span
    }
    assert got == want


@settings(**SETTINGS)
@given(
    left=st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=359.9, allow_nan=False),
            st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
        ),
        min_size=1,
        max_size=10,
    ),
    right=st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=359.9, allow_nan=False),
            st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
        ),
        max_size=10,
    ),
)
def test_crossmatch_matches_bruteforce(spark, left, right):
    from dax_ppdb_spark.ops.spatial import crossmatch

    radius = 0.5
    l_df = spark.createDataFrame(
        [(i, ra, dec) for i, (ra, dec) in enumerate(left)],
        "src_id LONG, src_ra DOUBLE, src_dec DOUBLE",
    )
    r_df = spark.createDataFrame(
        [(j, ra, dec) for j, (ra, dec) in enumerate(right)],
        "obj_id LONG, obj_ra DOUBLE, obj_dec DOUBLE",
    )
    got = {
        (r.src_id, r.obj_id)
        for r in crossmatch(
            l_df, r_df, radius_deg=radius,
            left_ra="src_ra", left_dec="src_dec",
            right_ra="obj_ra", right_dec="obj_dec",
        ).collect()
    }
    want = {
        (i, j)
        for i, (ra1, d1) in enumerate(left)
        for j, (ra2, d2) in enumerate(right)
        if (ra1 - ra2) ** 2 + (d1 - d2) ** 2 <= radius * radius
    }
    assert got == want
